"""Stage-resolved profile of the device encode path on the real TPU.

Times plan-only, fused plan_and_emit, and the pack stage implied by their
difference, on the same chunking bench.py uses.  Sync is a device-side
1-element slice pull (block_until_ready is a no-op on axon).

Usage: python tools/profile_encode.py [chunk_frames]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def sync(x):
    return np.asarray(x.ravel()[0:1])


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}  chunk={chunk}")

    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()

    import jax.numpy as jnp

    from flac_raster_tpu.codec.device_encoder import _PAGE_WORDS
    from flac_raster_tpu.codec.encoder import (
        _BPS_CODES, _SAMPLE_RATE_CODES, EncoderConfig,
    )
    from flac_raster_tpu.codec.fast_encoder import _blocksize_header
    from flac_raster_tpu.ops.device_codec import plan_blocks
    from flac_raster_tpu.ops.device_emit import plan_and_emit, worst_case_words

    blocksize, bps, level = 4096, 16, 5
    cfg = EncoderConfig.from_level(level)
    bs_code, bs_tail_val, bs_tail_bits = _blocksize_header(blocksize)
    static_kw = dict(
        blocksize=blocksize, bps=bps,
        sr_code=_SAMPLE_RATE_CODES.get(44100, 0), bps_code=_BPS_CODES[bps],
        bs_code=bs_code, bs_tail_bits=bs_tail_bits, bs_tail_val=bs_tail_val,
        max_lpc_order=cfg.max_lpc_order, apodizations=cfg.apodizations,
        max_partition_order=min(cfg.max_partition_order, 6),
        use_lpc=cfg.use_lpc, zero_point=32768, mid_side=False,
    )
    rng = np.random.default_rng(42)
    n = chunk * blocksize
    base = np.cumsum(rng.integers(-40, 41, n))
    x = (base - base.min() + rng.integers(0, 25, n)).astype(np.uint16)
    full = x.reshape(chunk, 1, blocksize)
    raw_mb = x.nbytes / 1e6

    n_words = worst_case_words(chunk, 1, blocksize, bps)
    n_words = ((n_words + _PAGE_WORDS - 1) // _PAGE_WORDS) * _PAGE_WORDS

    xd = jnp.asarray(full)
    sync(xd)

    # raw chunk upload rate (the r01 e2e accounting leaves ~3.5 s unexplained
    # at 134 MB -- if this row shows ~40 MB/s, upload is half the wall and
    # upload/readback overlap is the next e2e lever)
    up = np.ascontiguousarray(x.reshape(chunk, 1, blocksize))
    dt = timeit(lambda: sync(jnp.asarray(up) + jnp.uint16(0)))
    print(f"chunk upload ({raw_mb:.0f} MB)   : {dt*1e3:8.1f} ms  {raw_mb/dt:7.1f} MB/s")

    # plan-only
    xi = (xd.astype(jnp.int32) - 32768).reshape(chunk, blocksize)
    plan = plan_blocks(
        xi, blocksize=blocksize, bps=bps, max_lpc_order=cfg.max_lpc_order,
        max_partition_order=min(cfg.max_partition_order, 6),
        use_lpc=cfg.use_lpc, apodizations=cfg.apodizations,
    )
    sync(plan["subframe_bits"])
    dt = timeit(lambda: sync(
        plan_blocks(
            xi, blocksize=blocksize, bps=bps, max_lpc_order=cfg.max_lpc_order,
            max_partition_order=min(cfg.max_partition_order, 6),
            use_lpc=cfg.use_lpc, apodizations=cfg.apodizations,
        )["subframe_bits"]
    ))
    print(f"plan_blocks            : {dt*1e3:8.1f} ms  {raw_mb/dt:7.1f} MB/s raw")

    out = plan_and_emit(xd, jnp.int32(0), n_words=n_words, **static_kw)
    sync(out["words"])
    dt = timeit(lambda: sync(
        plan_and_emit(xd, jnp.int32(0), n_words=n_words, **static_kw)["words"]
    ))
    print(f"plan_and_emit (fused)  : {dt*1e3:8.1f} ms  {raw_mb/dt:7.1f} MB/s raw")

    # ---- plan sub-stages (separately compiled; sums can exceed the fused
    # plan time, the point is the RATIO between components) -----------------
    import functools

    from flac_raster_tpu.ops import device_codec as dc

    def t_named(name, fn, *args):
        f = jax.jit(fn)
        sync(f(*args))
        dt = timeit(lambda: sync(f(*args)))
        print(f"  {name:<21}: {dt*1e3:8.1f} ms")

    t_named("plan fixed-only", functools.partial(
        lambda a: plan_blocks(
            a, blocksize=blocksize, bps=bps, max_lpc_order=cfg.max_lpc_order,
            max_partition_order=min(cfg.max_partition_order, 6),
            use_lpc=False, apodizations=cfg.apodizations,
        )["subframe_bits"]), xi)
    idx = np.arange(blocksize, dtype=np.int32)
    t_named("rice_search x1 (o=2)", lambda a: dc._rice_search(
        dc._zigzag_u32(a), 2, blocksize, min(cfg.max_partition_order, 6),
        jnp.asarray(idx))[3], xi)
    t_named("fixed_residuals", lambda a: dc._fixed_residuals(a)[4], xi)

    w = jnp.asarray(dc.apodization_window(cfg.apodizations[0], blocksize))

    def autocorr(a):
        xf = a.astype(jnp.float32) * w[None, :]
        rl = [jnp.sum(xf * xf, axis=1)]
        for lag in range(1, cfg.max_lpc_order + 1):
            rl.append(jnp.sum(xf[:, lag:] * xf[:, : blocksize - lag], axis=1))
        return jnp.stack(rl, axis=1)

    rr = jax.jit(autocorr)(xi)
    sync(rr)
    t_named("autocorr+window", autocorr, xi)
    t_named("levinson_all", lambda r: dc._levinson_all(r)[1], rr)
    qc = jnp.ones((chunk, cfg.max_lpc_order), jnp.int32)
    t_named("lpc_residual (M-tap)", lambda a: dc._lpc_residual(
        a, qc, jnp.full((chunk,), 10, jnp.int32), cfg.max_lpc_order), xi)
    return 0


if __name__ == "__main__":
    sys.exit(main())
