"""Pallas TPU DMA window gather for the device decoder.

The decoder's first device stage slices each frame's compressed words out of
the uploaded body into a dense (frames, window) matrix so the Rice scan can
use small local indices.  As an XLA row gather (``codec/device_decoder.
_gather_windows_jit``) that stage costs ~23 ms per 512-frame chunk on v5e --
70% of the whole decode compute -- because XLA prices gathers per fetched
row (~2.8 M rows/s) regardless of row width.  The same movement is a plain
strided copy, so here each frame's window is ONE hardware DMA.

Mosaic constraints that shape the design (probed on this stack, see
tools/profile_gather.py and CLAUDE.md):

  * dynamic HBM slices of 1-D buffers must be 1024-element aligned, so the
    body is laid out 2-D as (rows, 128) uint32 words;
  * dynamic slices along the sublane (row) dimension must start and size on
    multiples of 8 rows -- callers align each frame's start DOWN to 8 rows
    (= 4096 bytes) and put the remainder in the frame's ``bit_base``;
  * per-step copies go HBM->VMEM->HBM (scratch bounce); both legs of step
    i+1 can only start after step i's wait, but at ~20 KB per window the
    copies are microseconds -- issue latency dominates and is ~10x cheaper
    than the XLA gather's row walk.

The kernel is layout-only (no arithmetic): output windows are byte-identical
to the XLA gather's modulo the coarser (8-row vs 32-word) alignment slack,
which the caller accounts for in ``bit_base``.  CPU/test meshes keep the
XLA path; interpret-mode tests pin the DMA path's equivalence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_windows_dma", "ALIGN_ROWS", "ROW_WORDS"]

ROW_WORDS = 128          # words per body row (512 bytes; the lane dimension)
ALIGN_ROWS = 8           # dynamic row starts/sizes must be multiples of this
ALIGN_BYTES = ALIGN_ROWS * ROW_WORDS * 4   # 4096


def _dma_kernel(row0_ref, body_ref, out_ref, vmem, sem_in, sem_out, *, out_rows):
    b = pl.program_id(0)
    r0 = row0_ref[b]
    cp_in = pltpu.make_async_copy(
        body_ref.at[pl.ds(r0, out_rows), :], vmem, sem_in
    )
    cp_in.start()
    cp_in.wait()
    cp_out = pltpu.make_async_copy(vmem, out_ref.at[b], sem_out)
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("out_rows", "interpret"))
def gather_windows_dma(body2d, row0, *, out_rows: int, interpret: bool = False):
    """Copy one ``(out_rows, 128)``-word window per frame out of the body.

    Args:
        body2d: (R, 128) uint32 big-endian words of the compressed body,
            zero-padded so every window stays in bounds
            (R >= max(row0) + out_rows; caller guarantees).
        row0: (B,) int32 window start rows, multiples of ALIGN_ROWS.
        out_rows: static window height, a multiple of ALIGN_ROWS.

    Returns:
        (B, out_rows * 128) uint32 windows, flattened to the (B, W) shape
        ops/device_decode.decode_frames_device consumes.
    """
    assert out_rows % ALIGN_ROWS == 0
    B = row0.shape[0]
    out = pl.pallas_call(
        functools.partial(_dma_kernel, out_rows=out_rows),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, ROW_WORDS), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((out_rows, ROW_WORDS), jnp.uint32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(row0, body2d)
    return out.reshape(B, out_rows * ROW_WORDS)
