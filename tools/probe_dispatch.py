"""Isolate the relay's per-dispatch cost on the encode hot path.

Hypothesis (round-5): fused plan_and_emit compute is ~8 ms per
(2048, 1, 4096) chunk (dispatch-amortized scan measurement,
docs/hw_logs/r5), yet bench's device stage sits at ~32 ms/chunk -- the
difference is per-CALL client dispatch work that neither pipelines with
compute nor amortizes across in-flight calls on this 1-CPU host.

Measures, on identical pre-uploaded chunks:
  A. per-chunk Python dispatch loop (bench-style, <=3 in flight);
  B. one jitted lax.scan over all chunks (ONE dispatch);
  C. one chunk, synced (reference).

Usage: python tools/probe_dispatch.py [n_chunks] [F]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}  K={K} F={F}", flush=True)

    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()

    import jax.numpy as jnp

    from bench import make_raster
    from flac_raster_tpu.codec.encoder import (
        _BPS_CODES,
        _SAMPLE_RATE_CODES,
        EncoderConfig,
    )
    from flac_raster_tpu.codec.fast_encoder import _blocksize_header
    from flac_raster_tpu.ops.device_emit import plan_and_emit, worst_case_words

    N, C, bps = 4096, 1, 16
    cfg = EncoderConfig.from_level(5)
    bs_code, bs_tail_val, bs_tail_bits = _blocksize_header(N)
    kw = dict(
        blocksize=N, bps=bps, sr_code=_SAMPLE_RATE_CODES.get(44100, 0),
        bps_code=_BPS_CODES[bps], bs_code=bs_code,
        bs_tail_bits=bs_tail_bits, bs_tail_val=bs_tail_val,
        max_lpc_order=cfg.max_lpc_order, apodizations=cfg.apodizations,
        max_partition_order=min(cfg.max_partition_order, 6),
        use_lpc=cfg.use_lpc, zero_point=32768, mid_side=False,
    )
    n_words = worst_case_words(F, C, N, bps)
    raw_mb = K * F * N * C * 2 / 1e6

    size = int(np.ceil(np.sqrt(K * F * N)))
    data = make_raster(size).reshape(-1)[: K * F * N]
    xs_host = data.reshape(K, F, N)[:, :, None, :].astype(np.uint16)  # (K,F,C,N)

    def sync1(a):
        return np.asarray(a.ravel()[:1])

    # pre-upload
    xs = [jax.device_put(xs_host[i]) for i in range(K)]
    for x in xs:
        sync1(x)
    xstack = jax.device_put(xs_host)
    sync1(xstack)
    f0s = jnp.arange(K, dtype=jnp.int32) * F

    # --- A: per-chunk dispatch loop ---------------------------------------
    def loop_run():
        outs = [
            plan_and_emit(x, jnp.int32(i * F), n_words=n_words, **kw)
            for i, x in enumerate(xs)
        ]
        sync1(outs[-1]["words"])
        for o in outs:
            np.asarray(o["frame_bits"][:8])
        return outs

    # --- B: one scanned dispatch ------------------------------------------
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def scan_run(xst, f0):
        def step(carry, it):
            x, f = it
            out = plan_and_emit(x, f, n_words=n_words, **kw)
            return carry, (out["words"], out["frame_bits"], out["total_bits"])

        _, outs = jax.lax.scan(step, jnp.int32(0), (xst, f0))
        return outs

    def scan_go():
        w, fb, tb = scan_run(xstack, f0s)
        sync1(w)
        np.asarray(fb[:, :1])
        return w

    # warm both
    t0 = time.perf_counter(); loop_run(); print(f"warm loop {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter(); scan_go(); print(f"warm scan {time.perf_counter()-t0:.1f}s", flush=True)

    def best(fn, n=3):
        b = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return b

    tA = best(loop_run)
    tB = best(scan_go)
    out1 = plan_and_emit(xs[0], jnp.int32(0), n_words=n_words, **kw)
    sync1(out1["words"])
    tC = best(lambda: sync1(
        plan_and_emit(xs[0], jnp.int32(0), n_words=n_words, **kw)["words"]
    ))

    print(f"A per-chunk loop : {tA*1e3:8.1f} ms  {raw_mb/tA:7.0f} MB/s  ({tA*1e3/K:.1f} ms/chunk)")
    print(f"B scanned 1-call : {tB*1e3:8.1f} ms  {raw_mb/tB:7.0f} MB/s  ({tB*1e3/K:.1f} ms/chunk)")
    print(f"C single chunk   : {tC*1e3:8.1f} ms  {raw_mb/K/tC:7.0f} MB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
