"""Hardware sweep of Rice-cost kernel variants (dispatch-amortized).

profile_plan_parts.py measured the shipped ``rice_cost_sums`` at ~1.73 ms
per (2048, 4096) candidate on the v5e -- ~40x off the HBM speed-of-light
for its 33.5 MB read, i.e. VPU/layout/overhead-bound, and the planner runs
six of them (~10.5 of the ~14.5 ms plan stage).  This tool measures, on
the real chip, which lever actually moves it:

  * ``rows=N``   -- grid-step count (DMA/step overhead) via block_rows
  * ``maxonly``  -- lower bound: load + 1 cross-lane reduction
  * ``packed``   -- 6 reductions folded into 2 field-packed sums
                    (sum q <= 64*31 < 2^12; bit-plane sums <= 64 < 2^10)
  * ``diag``     -- skip the in-kernel 21-slot scatter (105 selects on
                    (rows, parts)); emit the 5 diagonal sums + k0 and
                    reconstruct the table in XLA where it fuses
  * ``pdiag``    -- packed + diag combined

Timing uses the same R-iteration lax.scan amortization as
tools/profile_plan_parts.py (25 ms relay dispatch floor otherwise).

Usage: python tools/sweep_cost_kernel.py [B] [R]
"""

from __future__ import annotations

import functools
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


KMAX = 20


def _flip_max_k0(zp):
    import jax
    import jax.numpy as jnp

    sign = jnp.uint32(0x80000000)
    zb = jax.lax.bitcast_convert_type(zp ^ sign, jnp.int32)
    mb = jnp.max(zb, axis=-1)
    zmax = jax.lax.bitcast_convert_type(mb, jnp.uint32) ^ sign
    k0 = jnp.zeros_like(mb)
    for j in range(5, 32):
        thr = jnp.int32((1 << j) - (1 << 31))
        k0 = k0 + (mb >= thr).astype(jnp.int32)
    return zmax, k0


def k_maxonly(z_ref, zmax_ref):
    import jax
    import jax.numpy as jnp

    sign = jnp.uint32(0x80000000)
    zp = z_ref[:]
    zb = jax.lax.bitcast_convert_type(zp ^ sign, jnp.int32)
    mb = jnp.max(zb, axis=-1)
    zmax_ref[:] = jax.lax.bitcast_convert_type(mb, jnp.uint32) ^ sign


def k_packed(z_ref, sums_ref, zmax_ref):
    import jax
    import jax.numpy as jnp

    zp = z_ref[:]
    zmax, k0 = _flip_max_k0(zp)
    zmax_ref[:] = zmax
    k0b = jnp.broadcast_to(k0.astype(jnp.uint32)[:, :, None], zp.shape)
    q = jax.lax.bitcast_convert_type(zp >> k0b, jnp.int32)
    f1 = q + ((q & 1) << 12) + (((q >> 1) & 1) << 22)
    # bit-planes b0..b3 only, matching the shipped kernel's field layout
    # (ops/pallas_kernels): the 5 diagonal sums need 4 subtractions
    f2 = ((q >> 2) & 1) + (((q >> 3) & 1) << 10)
    s1 = f1.sum(axis=-1)
    s2 = f2.sum(axis=-1)
    s0 = s1 & 0xFFF
    b0 = (s1 >> 12) & 0x3FF
    b1 = s1 >> 22
    b2 = s2 & 0x3FF
    b3 = s2 >> 10
    s_rel = [s0]
    for b in (b0, b1, b2, b3):
        s_rel.append((s_rel[-1] - b) >> 1)
    for k in range(KMAX + 1):
        dk = k - k0
        out = jnp.zeros_like(k0)
        for t in range(5):
            out = jnp.where(dk == t, s_rel[t], out)
        sums_ref[:, k, :] = out


def k_diag(z_ref, diag_ref, zmax_ref):
    import jax
    import jax.numpy as jnp

    zp = z_ref[:]
    zmax, k0 = _flip_max_k0(zp)
    zmax_ref[:] = zmax
    k0b = jnp.broadcast_to(k0.astype(jnp.uint32)[:, :, None], zp.shape)
    q = jax.lax.bitcast_convert_type(zp >> k0b, jnp.int32)
    s_rel = [q.sum(axis=-1)]
    for t in range(4):
        b = ((q >> t) & 1).sum(axis=-1)
        s_rel.append((s_rel[-1] - b) >> 1)
    for t in range(5):
        diag_ref[:, t, :] = s_rel[t]
    diag_ref[:, 5, :] = k0
    diag_ref[:, 6, :] = jnp.zeros_like(k0)
    diag_ref[:, 7, :] = jnp.zeros_like(k0)


def k_pdiag(z_ref, diag_ref, zmax_ref):
    import jax
    import jax.numpy as jnp

    zp = z_ref[:]
    zmax, k0 = _flip_max_k0(zp)
    zmax_ref[:] = zmax
    k0b = jnp.broadcast_to(k0.astype(jnp.uint32)[:, :, None], zp.shape)
    q = jax.lax.bitcast_convert_type(zp >> k0b, jnp.int32)
    f1 = q + ((q & 1) << 12) + (((q >> 1) & 1) << 22)
    # bit-planes b0..b3 only, matching the shipped kernel's field layout
    # (ops/pallas_kernels): the 5 diagonal sums need 4 subtractions
    f2 = ((q >> 2) & 1) + (((q >> 3) & 1) << 10)
    s1 = f1.sum(axis=-1)
    s2 = f2.sum(axis=-1)
    s0 = s1 & 0xFFF
    b0 = (s1 >> 12) & 0x3FF
    b1 = s1 >> 22
    b2 = s2 & 0x3FF
    b3 = (s2 >> 10) & 0x3FF
    s_rel = [s0]
    for b in (b0, b1, b2, b3):
        s_rel.append((s_rel[-1] - b) >> 1)
    for t in range(5):
        diag_ref[:, t, :] = s_rel[t]
    diag_ref[:, 5, :] = k0
    diag_ref[:, 6, :] = jnp.zeros_like(k0)
    diag_ref[:, 7, :] = jnp.zeros_like(k0)


def k_qonly(z_ref, diag_ref, zmax_ref):
    """Attribution probe: load + max + k0 + variable shift + ONE reduction."""
    import jax
    import jax.numpy as jnp

    zp = z_ref[:]
    zmax, k0 = _flip_max_k0(zp)
    zmax_ref[:] = zmax
    k0b = jnp.broadcast_to(k0.astype(jnp.uint32)[:, :, None], zp.shape)
    q = jax.lax.bitcast_convert_type(zp >> k0b, jnp.int32)
    s = q.sum(axis=-1)
    for t in range(8):
        diag_ref[:, t, :] = s


def k_qfix(z_ref, diag_ref, zmax_ref):
    """Attribution probe: like qonly but a CONSTANT shift (no per-elem k0)."""
    import jax
    import jax.numpy as jnp

    zp = z_ref[:]
    zmax, k0 = _flip_max_k0(zp)
    zmax_ref[:] = zmax
    q = jax.lax.bitcast_convert_type(zp >> jnp.uint32(5), jnp.int32)
    s = q.sum(axis=-1) + k0
    for t in range(8):
        diag_ref[:, t, :] = s


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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from flac_raster_tpu.ops import device_codec as dc
    from flac_raster_tpu.ops.pallas_kernels import rice_cost_sums

    N, parts = 4096, 64
    base = N // parts
    raw_mb = B * N * 2 / 1e6

    rng = np.random.default_rng(42)
    x = rng.integers(-300, 300, (B, N)).astype(np.int32)
    zd = jax.jit(dc._zigzag_u32)(jnp.asarray(x))
    sync(zd)
    zstack = jnp.where(
        jnp.arange(R, dtype=jnp.uint32)[:, None, None] > 0, zd[None] ^ jnp.uint32(1), zd[None]
    )
    zstack = jax.jit(lambda a: a + 0)(zstack)
    sync(zstack)

    def call_variant(kernel, rows, out_kind):
        z3shape = (B, parts, base)
        grid = (B // rows,)
        if out_kind == "max":
            out_specs = pl.BlockSpec((rows, parts), lambda i: (i, 0))
            out_shape = jax.ShapeDtypeStruct((B, parts), jnp.uint32)
        elif out_kind == "full":
            out_specs = (
                pl.BlockSpec((rows, KMAX + 1, parts), lambda i: (i, 0, 0)),
                pl.BlockSpec((rows, parts), lambda i: (i, 0)),
            )
            out_shape = (
                jax.ShapeDtypeStruct((B, KMAX + 1, parts), jnp.int32),
                jax.ShapeDtypeStruct((B, parts), jnp.uint32),
            )
        else:  # diag
            out_specs = (
                pl.BlockSpec((rows, 8, parts), lambda i: (i, 0, 0)),
                pl.BlockSpec((rows, parts), lambda i: (i, 0)),
            )
            out_shape = (
                jax.ShapeDtypeStruct((B, 8, parts), jnp.int32),
                jax.ShapeDtypeStruct((B, parts), jnp.uint32),
            )

        def run(z):
            z3 = z.reshape(z3shape)
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((rows, parts, base), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=out_specs,
                out_shape=out_shape,
            )(z3)

        return run

    def scan_time(name, body_scalar):
        @jax.jit
        def run(zs):
            def step(carry, zr):
                return carry + body_scalar(zr).astype(jnp.float32), None

            c, _ = jax.lax.scan(step, jnp.float32(0), zs)
            return c

        sync(run(zstack))
        dt = timeit(lambda: sync(run(zstack)))
        return name, dt

    rows_out = []

    def add(name, body):
        try:
            rows_out.append(scan_time(name, body))
        except Exception as e:  # noqa: BLE001
            print(f"{name:<28} FAILED: {type(e).__name__}: {str(e)[:120]}")

    add("baseline (read+sum)", lambda z: jnp.sum(
        jax.lax.bitcast_convert_type(z, jnp.int32)))

    def ship(rows):
        def body(z):
            s, m = rice_cost_sums(z, parts=parts, block_rows=rows)
            return jnp.sum(s) + jnp.sum(
                jax.lax.bitcast_convert_type(m, jnp.int32))
        return body

    add("shipped rows=8", ship(8))

    for name, kern in (
        ("qfix", k_qfix), ("qonly", k_qonly), ("diag", k_diag),
        ("pdiag", k_pdiag),
    ):
        fn = call_variant(kern, 8, "diag")
        add(f"{name} rows=8", lambda z, fn=fn: (
            lambda sm: jnp.sum(sm[0]) + jnp.sum(
                jax.lax.bitcast_convert_type(sm[1], jnp.int32)))(fn(z)))

    fn = call_variant(k_packed, 8, "full")
    add("packed rows=8", lambda z, fn=fn: (
        lambda sm: jnp.sum(sm[0]) + jnp.sum(
            jax.lax.bitcast_convert_type(sm[1], jnp.int32)))(fn(z)))

    t_base = rows_out[0][1]
    print(f"{'variant':<28}{'total ms':>10}{'per-iter ms':>13}{'MB/s raw':>10}")
    for name, dt in rows_out:
        per = (dt - t_base) / R * 1e3
        rate = raw_mb / max(per / 1e3, 1e-9)
        if name.startswith("baseline"):
            print(f"{name:<28}{dt*1e3:>10.1f}{'':>13}{'':>10}")
        else:
            print(f"{name:<28}{dt*1e3:>10.1f}{per:>13.2f}{rate:>10.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
