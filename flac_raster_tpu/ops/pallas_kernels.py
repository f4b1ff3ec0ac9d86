"""Pallas TPU kernels for the encoder's hot inner loops.

The Rice parameter search is the planner's dominant compute: for every
block, every candidate predictor, every Rice parameter k and every finest
partition it needs ``sum(min(z >> k, clamp))`` and ``max(z)`` -- in pure XLA
that is KMAX+1 separate HBM passes over the residuals per candidate
(ops/device_codec._rice_search).  This kernel computes the whole
(k x partition) cost table and partition maxima in ONE pass over VMEM-resident
residuals: the block is loaded once, and all 21 shifted sums come from
registers (HBM traffic drops ~21x for this stage -- the pallas_guide.md
"load once, compute many" pattern).

Layout: grid over row-tiles of the (B, N) residual batch; each step loads a
(BLK_ROWS, N) tile, views it as (BLK_ROWS, PARTS, N // PARTS) finest
partitions, and reduces along the partition-local axis on the VPU.

Used by ops/device_codec when running on TPU; the jnp fallback remains the
reference implementation (bit-identical results, tested in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rice_cost_sums", "KMAX_KERNEL"]

KMAX_KERNEL = 20
_QCLAMP = 1 << 17


def _rice_cost_kernel(z_ref, sums_ref, zmax_ref):
    """One grid step: cost sums + maxima for a (BLK, parts, base) tile.

    Args:
        z_ref:    (BLK, parts, base) uint32 zigzag residuals in VMEM
                  (pre-reshaped outside the kernel -- Mosaic cannot shape-
                  cast 2D->3D vectors in-kernel).
        sums_ref: (BLK, KMAX+1, parts) int32 out.
        zmax_ref: (BLK, parts) uint32 out.
    """
    zp = z_ref[:]                                  # load once
    # Mosaic has no unsigned reductions: flip the sign bit so unsigned order
    # equals signed order, max in int32, then flip back.
    zb = jax.lax.bitcast_convert_type(zp ^ jnp.uint32(0x80000000), jnp.int32)
    mb = jnp.max(zb, axis=-1)
    zmax_ref[:] = jax.lax.bitcast_convert_type(mb, jnp.uint32) ^ jnp.uint32(0x80000000)
    for k in range(KMAX_KERNEL + 1):               # all sums from registers
        # clamp without unsigned min (Mosaic lacks arith.minui): bitcast to
        # int32 -- negative means q >= 2^31 > clamp -- then signed min+select
        qi = jax.lax.bitcast_convert_type(zp >> jnp.uint32(k), jnp.int32)
        q = jnp.where(qi < 0, jnp.int32(_QCLAMP), jnp.minimum(qi, _QCLAMP))
        sums_ref[:, k, :] = q.sum(axis=-1)


@functools.partial(
    jax.jit, static_argnames=("parts", "block_rows", "interpret")
)
def rice_cost_sums(
    z,
    *,
    parts: int = 64,
    block_rows: int = 8,
    interpret: bool = False,
):
    """Per-partition Rice cost sums and maxima for a batch of blocks.

    Args:
        z: (B, N) uint32 zigzag residuals (warmup positions pre-zeroed).
        parts: number of finest partitions (N must be divisible).
    Returns:
        sums (B, KMAX_KERNEL+1, parts) int32 -- sum(min(z >> k, clamp)),
        zmax (B, parts) uint32.
    """
    B, N = z.shape
    assert N % parts == 0
    base = N // parts
    rows = min(block_rows, B)
    while B % rows:
        rows -= 1
    grid = (B // rows,)
    z3 = z.reshape(B, parts, base)
    return pl.pallas_call(
        _rice_cost_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, parts, base), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, KMAX_KERNEL + 1, parts), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, parts), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, KMAX_KERNEL + 1, parts), jnp.int32),
            jax.ShapeDtypeStruct((B, parts), jnp.uint32),
        ),
        interpret=interpret,
    )(z3)
