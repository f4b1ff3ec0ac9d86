"""Compare TPU gather forms: take_along_axis vs flat 1-D take vs Pallas DMA.

The decode kernel is gather-bound; this measures which lowering to use.
Usage: python tools/profile_gather.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def sync(x):
    # device-side slice FIRST: np.asarray on the full array would drag the
    # whole output through the ~20 MB/s tunnel and dominate every timing
    return np.asarray(x.ravel()[0:1])


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}")

    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, W, K = 512, 4096, 4096
    mat = jnp.asarray(rng.integers(0, 1 << 31, (B, W), dtype=np.int64).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, W, (B, K), dtype=np.int64).astype(np.int32))
    n = B * K

    f = jax.jit(lambda m, i: jnp.take_along_axis(m, i, axis=1))
    sync(f(mat, idx))
    dt = timeit(lambda: sync(f(mat, idx)))
    print(f"take_along_axis (B,K)     : {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} M/s")

    @jax.jit
    def flat_take(m, i):
        lane = jnp.arange(B, dtype=jnp.int32)[:, None] * W
        return jnp.take(m.reshape(-1), i + lane)

    sync(flat_take(mat, idx))
    dt = timeit(lambda: sync(flat_take(mat, idx)))
    print(f"flat 1-D take (B*K)       : {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} M/s")

    @jax.jit
    def flat_take_sorted(m, i):
        lane = jnp.arange(B, dtype=jnp.int32)[:, None] * W
        ii = jnp.sort(i, axis=1)
        return jnp.take(m.reshape(-1), ii + lane)

    sync(flat_take_sorted(mat, idx))
    dt = timeit(lambda: sync(flat_take_sorted(mat, idx)))
    print(f"flat take sorted-per-row  : {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} M/s (incl sort)")

    # 4-word windows per index, the _read96 pattern
    idx4 = idx[:, : K // 4]

    @jax.jit
    def taa_win4(m, i):
        ii = i[:, :, None] + jnp.arange(4, dtype=jnp.int32)[None, None, :]
        return jnp.take_along_axis(m, ii.reshape(B, -1), axis=1)

    sync(taa_win4(mat, idx4))
    dt = timeit(lambda: sync(taa_win4(mat, idx4)))
    print(f"taa 4-word windows        : {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} M/s")

    @jax.jit
    def flat_win4(m, i):
        lane = jnp.arange(B, dtype=jnp.int32)[:, None, None] * W
        ii = i[:, :, None] + jnp.arange(4, dtype=jnp.int32)[None, None, :] + lane
        return jnp.take(m.reshape(-1), ii)

    sync(flat_win4(mat, idx4))
    dt = timeit(lambda: sync(flat_win4(mat, idx4)))
    print(f"flat 4-word windows       : {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} M/s")

    # dynamic_slice in a scan: one window per lane per step (scan form)
    @jax.jit
    def ds_scan(m, i):
        def step(_, ic):
            w4 = jnp.take(m.reshape(-1), ic[:, None] + jnp.arange(4)[None, :])
            return None, w4.sum(axis=1)

        lane = jnp.arange(B, dtype=jnp.int32) * W
        _, out = jax.lax.scan(step, None, (i + lane[:, None]).T)
        return out

    sync(ds_scan(mat, idx4))
    dt = timeit(lambda: sync(ds_scan(mat, idx4)))
    print(f"scan of flat (B,4) takes  : {dt*1e3:8.1f} ms  {B*(K//4)/dt/1e6:7.1f} M idx/s")

    # Row-sliced gathers: reshape the per-lane buffer into aligned R-word
    # rows and gather WHOLE ROWS (XLA gather with slice_sizes=(1,R)).  If
    # the gather cost is per-ROW rather than per-element, a rice-scan window
    # read becomes ~3 row fetches instead of 13 element fetches -- and a
    # wider aligned window serves more codes per scan step on top.
    import functools

    for RW in (8, 16, 32):
        nrow = 3 if RW == 8 else 2  # rows covering a 13-word window + align
        # same TOTAL gathered elements as the element-variants (B*K): if the
        # cost is per-row, wall time shrinks ~RW-fold
        idx_r = idx[:, : K // (nrow * RW)]

        @functools.partial(jax.jit, static_argnames=())
        def row_take(m, i, RW=RW, nrow=nrow):
            m8 = m.reshape(B * (W // RW), RW)
            lane = (jnp.arange(B, dtype=jnp.int32) * (W // RW))[:, None, None]
            r0 = (i // RW)[:, :, None] + jnp.arange(nrow, dtype=jnp.int32)
            r0 = jnp.minimum(r0, W // RW - 1)
            return jnp.take(m8, (r0 + lane).reshape(-1), axis=0)

        nwin = idx_r.shape[1]
        sync(row_take(mat, idx_r))
        dt = timeit(lambda: sync(row_take(mat, idx_r)))
        nr = B * nwin * nrow
        print(
            f"row take {RW:3d}w x{nrow} rows  : {dt*1e3:8.1f} ms  "
            f"{nr/dt/1e6:7.1f} M rows/s  {nr*RW/dt/1e6:8.1f} M elem/s  "
            f"({nwin} windows/lane)"
        )

    # Pallas DMA window gather: one frame window per grid step
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NW = 512  # words per window

    def dma_kernel(offs_ref, body_ref, out_ref, vmem, sem):
        i = pl.program_id(0)
        off = offs_ref[i]
        cp = pltpu.make_async_copy(body_ref.at[pl.ds(off, NW)], vmem, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(vmem, out_ref.at[i], sem)
        cp2.start()
        cp2.wait()

    @jax.jit
    def pallas_windows(body, offs):
        return pl.pallas_call(
            dma_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, NW), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((NW,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(offs, body)

    body = jnp.asarray(rng.integers(0, 1 << 31, (1 << 22,), dtype=np.int64).astype(np.int32))
    woffs = jnp.asarray(
        np.sort(rng.integers(0, (1 << 22) - NW, B)).astype(np.int32)
    )
    try:
        sync(pallas_windows(body, woffs))
        dt = timeit(lambda: sync(pallas_windows(body, woffs)))
        mb = B * NW * 4 / 1e6
        print(f"pallas DMA windows        : {dt*1e3:8.1f} ms  {mb/dt:7.1f} MB/s ({mb:.1f} MB)")
    except Exception as e:  # noqa: BLE001
        print(f"pallas DMA windows        : FAILED {type(e).__name__}: {e}")

    # 2-D (rows, 128) DMA gather -- the production decode-window design
    # (ops/pallas_gather): 8-row-aligned starts satisfy Mosaic's dynamic
    # sublane-slice tiling rule that killed the 1-D version above
    from flac_raster_tpu.ops.pallas_gather import (
        ALIGN_ROWS, ROW_WORDS, gather_windows_dma,
    )

    OUT_ROWS = 40  # 5120-word windows: 4096-word payload + alignment slack
    R = (1 << 22) // ROW_WORDS
    body2d = jnp.asarray(
        rng.integers(0, 1 << 31, (R, ROW_WORDS), dtype=np.int64).astype(np.uint32)
    )
    row0_h = np.sort(
        rng.integers(0, (R - OUT_ROWS) // ALIGN_ROWS, B)
    ).astype(np.int32) * ALIGN_ROWS
    row0 = jnp.asarray(row0_h)
    try:
        win = gather_windows_dma(body2d, row0, out_rows=OUT_ROWS)
        sync(win)
        # value check on one lane against a host slice
        got = np.asarray(win[7]).reshape(OUT_ROWS, ROW_WORDS)
        exp = np.asarray(body2d[row0_h[7] : row0_h[7] + OUT_ROWS])
        ok = "values OK" if np.array_equal(got, exp) else "VALUES WRONG"
        dt = timeit(lambda: sync(gather_windows_dma(body2d, row0, out_rows=OUT_ROWS)))
        mb = B * OUT_ROWS * ROW_WORDS * 4 / 1e6
        print(
            f"pallas DMA 2-D (8-row)    : {dt*1e3:8.1f} ms  {mb/dt:7.1f} MB/s "
            f"({mb:.1f} MB)  {ok}"
        )
    except Exception as e:  # noqa: BLE001
        print(f"pallas DMA 2-D (8-row)    : FAILED {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
