"""Sweep pack-kernel tile constants on the real TPU.

For each (T_SUPER, T_SUB) config: recompute the consistent W_SUB_ROWS,
re-trace pack_tokens, verify byte-equality against the XLA scatter on a
small stream, then time a realistic 8.4M-token stream.  Run after a
hardware restore to pick constants; the winners go into ops/pallas_pack.

Usage: python tools/tune_pack.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def sync(x):
    return np.asarray(x.ravel()[0:1])


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}")

    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()

    import jax.numpy as jnp

    from flac_raster_tpu.ops import pallas_pack as pp
    from flac_raster_tpu.ops.device_emit import _scatter_tokens

    rng = np.random.default_rng(0)

    def stream(nt, slots=4096):
        lens = rng.integers(1, 18, nt).astype(np.int32)
        dead = rng.random(nt) < 0.1
        lens[dead] = 0
        gaps = np.zeros(nt, np.int64)
        gaps[slots - 1 :: slots] = 600
        starts = np.concatenate([[100], (lens[:-1] + gaps[:-1])]).cumsum()
        vals = (rng.integers(0, 1 << 17, nt) & ((1 << lens.astype(np.int64)) - 1)).astype(
            np.uint32
        )
        n_words = int(starts[-1] + lens[-1]) // 32 + 4
        return (
            jnp.asarray(vals), jnp.asarray(lens),
            jnp.asarray(starts.astype(np.int32)), n_words,
        )

    v_s, l_s, o_s, nw_s = stream(3 * 4096)
    ref_small = np.asarray(_scatter_tokens(jnp.zeros(nw_s, jnp.uint32), v_s, l_s, o_s))
    v_b, l_b, o_b, nw_b = stream(2048 * 4096)

    base = (pp.T_SUPER, pp.T_SUB, pp.W_SUB_ROWS)
    try:
        import os

        sup_list = tuple(
            int(s) for s in os.environ.get(
                "FRTPU_TUNE_SUPERS", "2048,4096,8192").split(",")
        )
        sub_list = tuple(
            int(s) for s in os.environ.get(
                "FRTPU_TUNE_SUBS", "32,64,128").split(",")
        )
        for t_super in sup_list:
            for t_sub in sub_list:
                rows = pp._sub_rows(t_sub, 4096)
                pp.T_SUPER, pp.T_SUB, pp.W_SUB_ROWS = t_super, t_sub, rows
                pp.pack_tokens.clear_cache()
                try:
                    out = np.asarray(
                        pp.pack_tokens(v_s, l_s, o_s, n_words=nw_s)
                    )
                    if not np.array_equal(out, ref_small):
                        print(f"T_SUPER={t_super} T_SUB={t_sub} rows={rows}: MISMATCH")
                        continue
                    sync(pp.pack_tokens(v_b, l_b, o_b, n_words=nw_b))
                    best = min(
                        _time(lambda: sync(pp.pack_tokens(v_b, l_b, o_b, n_words=nw_b)))
                        for _ in range(3)
                    )
                    rate = (2048 * 4096) / best / 1e6
                    print(f"T_SUPER={t_super} T_SUB={t_sub} rows={rows}: "
                          f"{best*1e3:7.1f} ms  {rate:6.0f} M tok/s")
                except Exception as exc:  # noqa: BLE001
                    print(f"T_SUPER={t_super} T_SUB={t_sub} rows={rows}: "
                          f"FAILED {type(exc).__name__}: {str(exc)[:90]}")
    finally:
        pp.T_SUPER, pp.T_SUB, pp.W_SUB_ROWS = base
        pp.pack_tokens.clear_cache()
    return 0


def _time(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())
