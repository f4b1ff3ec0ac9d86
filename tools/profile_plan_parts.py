"""Dispatch-amortized micro-profile of plan_blocks' sub-stages on the TPU.

The axon relay adds ~25 ms of dispatch overhead per executable call
(docs/PERFORMANCE.md), swamping the sub-millisecond real cost of each plan
sub-stage -- tools/profile_encode.py's one-call-per-stage table reads as a
flat wall of ~25 ms rows.  Every stage here therefore runs R times inside
ONE jitted program: a lax.scan over R perturbed copies of the input
(distinct operands defeat CSE, scan order serializes the iterations), with
a scalar carried through so no iteration is dead code.  Reported
per-iteration time = (t_stage - t_baseline) / R where the baseline scan
does only the per-iteration input read + scalar reduce.

Usage: python tools/profile_plan_parts.py [B] [R]
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}  B={B} R={R}")

    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()

    import jax.numpy as jnp

    from flac_raster_tpu.codec.encoder import EncoderConfig
    from flac_raster_tpu.ops import device_codec as dc
    from flac_raster_tpu.ops.device_codec import plan_blocks
    from flac_raster_tpu.ops.pallas_kernels import rice_cost_sums

    N, bps, level = 4096, 16, 5
    cfg = EncoderConfig.from_level(level)
    mpo = min(cfg.max_partition_order, 6)
    raw_mb = B * N * 2 / 1e6  # uint16-equivalent chunk size for MB/s rows

    rng = np.random.default_rng(42)
    base = np.cumsum(rng.integers(-40, 41, B * N))
    x = (base - base.min() + rng.integers(0, 25, B * N)).astype(np.int64)
    x = (x.astype(np.int32) - int(x.mean())).reshape(B, N)
    xd = jnp.asarray(x)
    sync(xd)

    # R perturbed copies, built on device (values stay well inside int16
    # range so every candidate behaves like the bench scene)
    xstack = xd[None, :, :] + jnp.arange(R, dtype=jnp.int32)[:, None, None]
    xstack = jax.jit(lambda a: a + 0)(xstack)
    sync(xstack)

    idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    w = jnp.asarray(dc.apodization_window(cfg.apodizations[0], N))

    def scan_time(name, body_scalar):
        """body_scalar: (B, N) int32 -> scalar float32/int32 (cast inside)."""

        @jax.jit
        def run(xs):
            def step(carry, xr):
                return carry + body_scalar(xr).astype(jnp.float32), None

            c, _ = jax.lax.scan(step, jnp.float32(0), xs)
            return c

        sync(run(xstack))
        dt = timeit(lambda: sync(run(xstack)))
        return name, dt

    rows = []

    def add(name, body_scalar):
        rows.append(scan_time(name, body_scalar))

    # --- baseline: read the iteration's input + scalar-reduce it ------------
    add("baseline (read+sum)", lambda a: jnp.sum(a))

    # --- fixed-residual chain (4 delta passes) -------------------------------
    add("fixed_residuals 0..4", lambda a: sum(
        jnp.sum(r) for r in dc._fixed_residuals(a)
    ))

    # --- Pallas cost kernel, one candidate -----------------------------------
    def kernel_one(a):
        z = dc._zigzag_u32(a)
        s, m = rice_cost_sums(z, parts=1 << mpo)
        return jnp.sum(s) + jnp.sum(m.astype(jnp.int32))

    add("rice kernel x1", kernel_one)

    # --- Pallas cost kernel, all 5 fixed candidates ---------------------------
    def kernel_five(a):
        acc = jnp.int32(0)
        for r in dc._fixed_residuals(a):
            s, m = rice_cost_sums(dc._zigzag_u32(r), parts=1 << mpo)
            acc = acc + jnp.sum(s) + jnp.sum(m.astype(jnp.int32))
        return acc

    add("rice kernel x5", kernel_five)

    # --- full _rice_search, one candidate (kernel + level tree + argmin) ----
    def search_one(a):
        z = dc._zigzag_u32(a)
        return jnp.sum(dc._rice_search(z, 2, N, mpo, idx)[3])

    add("rice_search x1 (o=2)", search_one)

    # --- full _rice_search for all 5 fixed orders ----------------------------
    def search_five(a):
        acc = jnp.int32(0)
        for o, r in enumerate(dc._fixed_residuals(a)):
            acc = acc + jnp.sum(dc._rice_search(dc._zigzag_u32(r), o, N, mpo, idx)[3])
        return acc

    add("rice_search x5 fixed", search_five)

    # --- LPC float stage pieces ----------------------------------------------
    def autocorr_scalar(a):
        xf = a.astype(jnp.float32) * w[None, :]
        rl = [jnp.sum(xf * xf, axis=1)]
        for lag in range(1, cfg.max_lpc_order + 1):
            rl.append(jnp.sum(xf[:, lag:] * xf[:, : N - lag], axis=1))
        return jnp.sum(jnp.stack(rl, axis=1))

    add("autocorr+window", autocorr_scalar)

    def lpc_analyze_scalar(a):
        bps_e = jnp.full((B,), bps, jnp.int32)
        order_arr, qc, shift, safe, r_lpc = dc._lpc_analyze(
            a, bps_e, cfg.max_lpc_order, 15, cfg.apodizations[0]
        )
        return jnp.sum(order_arr) + jnp.sum(qc) + jnp.sum(r_lpc)

    add("lpc_analyze (full)", lpc_analyze_scalar)

    # --- whole planner: fixed-only, then full ---------------------------------
    def plan_fixed(a):
        return jnp.sum(plan_blocks(
            a, blocksize=N, bps=bps, max_lpc_order=cfg.max_lpc_order,
            max_partition_order=mpo, use_lpc=False,
            apodizations=cfg.apodizations,
        )["subframe_bits"])

    add("plan_blocks fixed-only", plan_fixed)

    def plan_full(a):
        return jnp.sum(plan_blocks(
            a, blocksize=N, bps=bps, max_lpc_order=cfg.max_lpc_order,
            max_partition_order=mpo, use_lpc=cfg.use_lpc,
            apodizations=cfg.apodizations,
        )["subframe_bits"])

    add("plan_blocks full", plan_full)

    def plan_full_resid(a):
        """Summing subframe_bits alone lets XLA dead-code the residual
        select chain (emit's actual input); force it alive too."""
        p = plan_blocks(
            a, blocksize=N, bps=bps, max_lpc_order=cfg.max_lpc_order,
            max_partition_order=mpo, use_lpc=cfg.use_lpc,
            apodizations=cfg.apodizations,
        )
        return jnp.sum(p["subframe_bits"]) + jnp.sum(p["residual"]) + jnp.sum(p["ks"])

    add("plan_blocks full+resid", plan_full_resid)

    t_base = rows[0][1]
    print(f"{'stage':<26}{'total ms':>10}{'per-iter ms':>13}{'MB/s raw':>10}")
    for name, dt in rows:
        per = (dt - t_base) / R * 1e3
        rate = raw_mb / max(per / 1e3, 1e-9)
        if name.startswith("baseline"):
            print(f"{name:<26}{dt*1e3:>10.1f}{'':>13}{'':>10}")
        else:
            print(f"{name:<26}{dt*1e3:>10.1f}{per:>13.2f}{rate:>10.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
