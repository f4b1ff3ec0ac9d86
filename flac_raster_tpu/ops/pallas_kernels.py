"""Pallas TPU kernels for the encoder's hot inner loops.

The Rice parameter search is the planner's dominant compute: for every
block, every candidate predictor, every Rice parameter k and every finest
partition it needs ``sum(z >> k)`` and ``max(z)`` -- in pure XLA that is
KMAX+1 separate HBM passes over the residuals per candidate
(ops/device_codec._rice_search).  This kernel computes the whole
(k x partition) cost table and partition maxima in ONE pass over
VMEM-resident residuals.

Hardware profiling (tools/profile_plan_parts.py, v5e) showed the kernel is
VPU-compute-bound, not HBM-bound: 21 shifted clamped sums cost ~1.9 ms per
(2048, 4096) candidate and the planner runs six of them.  The 32-bit Rice
token cap (device_codec.MAX_RICE_TOKEN_BITS) makes almost all of that work
redundant:

  * a (k, partition) pair is only VALID when ``(zmax >> k) + 1 + k <= 32``,
    so every valid quotient obeys ``z >> k <= 31`` -- five bits;
  * for ``k < k0 := max(0, bitlen(zmax) - 5)`` the pair is provably invalid
    (``zmax >> k >= 32`` forces a token over the cap), and the caller masks
    its cost to _BIG without ever reading the sum;
  * for ``k >= k0`` the exact sums follow from ONE per-partition base sum
    plus the five bit-plane populations of the 5-bit quotients via
    ``S(k+1) = (S(k) - popbit_k) / 2``.

So the kernel does 6 cheap reductions (base sum + 5 bit planes) instead of
21 clamped ones and reconstructs the 21-slot table from (rows, parts)-sized
registers.  Contract: ``sums[:, k, :]`` equals the exact ``sum(z >> k)``
wherever ``k >= k0`` (superset of all valid pairs) and is 0 below -- the
pure-jnp fallback in device_codec._rice_search still computes clamped sums
everywhere, but the two agree bit-for-bit after the validity mask, which is
all the byte-identity invariant needs (tested in interpret mode and by
tools/tpu_selftest.py on hardware).

Layout: grid over row-tiles of the (B, N) residual batch; each step loads a
(BLK_ROWS, N) tile, views it as (BLK_ROWS, PARTS, N // PARTS) finest
partitions, and reduces along the partition-local axis on the VPU
(pre-reshaped outside the kernel -- Mosaic cannot shape-cast 2D->3D
vectors in-kernel; unsigned reductions and ``arith.minui`` are also
unavailable, hence the sign-flip max and int32 quotient math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rice_cost_sums", "KMAX_KERNEL"]

KMAX_KERNEL = 20
# The exact-reconstruction argument above needs every valid quotient to fit
# in 5 bits, i.e. a token cap <= 32.  device_codec asserts its
# MAX_RICE_TOKEN_BITS equals this at the call site.
TOKEN_CAP = 32


def _rice_cost_kernel(z_ref, sums_ref, zmax_ref):
    """One grid step: cost sums + maxima for a (BLK, parts, base) tile.

    Args:
        z_ref:    (BLK, parts, base) uint32 zigzag residuals in VMEM.
        sums_ref: (BLK, KMAX+1, parts) int32 out -- exact sum(z >> k) for
                  k >= k0(partition), 0 below (see module docstring).
        zmax_ref: (BLK, parts) uint32 out.
    """
    sign = jnp.uint32(0x80000000)
    zp = z_ref[:]                                  # load once
    # Mosaic has no unsigned reductions: flip the sign bit so unsigned order
    # equals signed order, max in int32, then flip back.
    zb = jax.lax.bitcast_convert_type(zp ^ sign, jnp.int32)
    mb = jnp.max(zb, axis=-1)                      # (BLK, parts) flipped max
    zmax_ref[:] = jax.lax.bitcast_convert_type(mb, jnp.uint32) ^ sign
    # k0 = max(0, bitlen(zmax) - 5), via flipped-threshold compares (no clz
    # needed; (BLK, parts)-sized, negligible)
    k0 = jnp.zeros_like(mb)
    for j in range(5, 32):
        thr = jnp.int32((1 << j) - (1 << 31))      # flip(2^j) as int32
        k0 = k0 + (mb >= thr).astype(jnp.int32)
    # 5-bit quotients at k0 (exact: zmax >> k0 <= 31); int32 from here on
    k0b = jnp.broadcast_to(k0.astype(jnp.uint32)[:, :, None], zp.shape)
    q = jax.lax.bitcast_convert_type(zp >> k0b, jnp.int32)
    # S(k0) and the recurrence S(k0+t+1) = (S(k0+t) - popbit_t(q)) / 2
    s_rel = [q.sum(axis=-1)]                       # <= base * 31, int32-safe
    for t in range(4):
        b = ((q >> t) & 1).sum(axis=-1)
        s_rel.append((s_rel[-1] - b) >> 1)
    # scatter the 5 live diagonals into the 21-slot table (tiny selects)
    for k in range(KMAX_KERNEL + 1):
        dk = k - k0                                # (BLK, parts)
        out = jnp.zeros_like(k0)
        for t in range(5):
            out = jnp.where(dk == t, s_rel[t], out)
        sums_ref[:, k, :] = out


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
        sums (B, KMAX_KERNEL+1, parts) int32 -- exact sum(z >> k) wherever
        ``(zmax >> k) + 1 + k <= TOKEN_CAP`` could hold (k >= k0, see module
        docstring), 0 elsewhere;
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
