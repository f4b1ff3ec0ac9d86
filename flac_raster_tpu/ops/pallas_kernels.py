"""Pallas TPU kernels for the encoder's hot inner loops.

The Rice parameter search is the planner's dominant compute: for every
block, every candidate predictor, every Rice parameter k and every finest
partition it needs ``sum(z >> k)`` and ``max(z)`` -- in pure XLA that is
KMAX+1 separate HBM passes over the residuals per candidate
(ops/device_codec._rice_search).  This kernel computes everything the
(k x partition) cost table needs in ONE pass over VMEM-resident residuals.

The 32-bit Rice token cap (device_codec.MAX_RICE_TOKEN_BITS) collapses the
work:

  * a (k, partition) pair is only VALID when ``(zmax >> k) + 1 + k <= 32``,
    so every valid quotient obeys ``z >> k <= 31`` -- five bits;
  * for ``k < k0 := max(0, bitlen(zmax) - 5)`` the pair is provably invalid
    (``zmax >> k >= 32`` forces a token over the cap), and the caller masks
    its cost to _BIG without ever reading the sum;
  * for ``k >= k0`` the exact sums follow from ONE per-partition base sum
    plus the four low bit-plane populations of the 5-bit quotients via
    ``S(k+1) = (S(k) - popbit_k) / 2`` (and S(k) == 0 for k >= k0 + 5,
    since z < 2^(k0+5));

so five diagonal values S(k0)..S(k0+4) plus k0 determine the whole table.

Hardware attribution (tools/sweep_cost_kernel.py, v5e, (2048, 4096)
candidate): load + one cross-lane max reduce is ~0.07 ms -- the shipped
cost was all in the extra reduction passes and the in-kernel 21-slot
table scatter (105 (rows, parts) selects + 21 stores per tile).  This
version therefore

  * folds the six reductions into TWO field-packed sums when the partition
    base fits the fields (sum q <= base*31 < 2^12 and bit-plane sums
    <= base < 2^10, i.e. base <= 128 -- always true for the codec's
    N=4096 / parts=64): f1 = q | b0<<12 | b1<<22, f2 = b2 | b3<<10;
  * emits only the 5 diagonal sums + k0 as a (rows, 8, parts) block and
    reconstructs the 21-slot table OUTSIDE the kernel with five XLA
    selects that fuse into the caller's cost/validity arithmetic.

Measured 0.85 ms vs 1.87 ms for the previous full-table kernel (2.2x);
six candidates run per plan_blocks call, so this is ~6 ms off the ~14.5 ms
plan stage per (2048, 4096) chunk.

Contract (unchanged): ``sums[:, k, :]`` equals the exact ``sum(z >> k)``
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
unavailable, hence the sign-flip max and int32 quotient math).  Larger
row blocks measured SLOWER (maxonly 0.07 ms at rows=8 vs 0.37 at 128);
keep the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rice_cost_sums", "rice_cost_sums_hp", "KMAX_KERNEL"]

KMAX_KERNEL = 20
# The exact-reconstruction argument above needs every valid quotient to fit
# in 5 bits, i.e. a token cap <= 32.  device_codec asserts its
# MAX_RICE_TOKEN_BITS equals this at the call site.
TOKEN_CAP = 32


def _rice_diag_kernel(packed, z_ref, diag_ref, zmax_ref):
    """One grid step: diagonal cost sums + maxima for a (BLK, parts, base) tile.

    Args:
        packed: static -- use the two field-packed reductions (base <= 128).
        z_ref:    (BLK, parts, base) uint32 zigzag residuals in VMEM.
        diag_ref: (BLK, 8, parts) int32 out -- rows 0..4 are S(k0+t) =
                  exact sum(z >> (k0+t)), row 5 is k0, rows 6..7 zero.
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
    if packed:
        # field-packed: sum q in [0:12), popbit0 in [12:22), popbit1 in
        # [22:32) of f1; popbit2/popbit3 in [0:10)/[10:20) of f2.  No field
        # overflows for base <= 128 (sums <= 128*31 < 2^12, pops <= 128).
        f1 = q + ((q & 1) << 12) + (((q >> 1) & 1) << 22)
        f2 = ((q >> 2) & 1) + (((q >> 3) & 1) << 10)
        s1 = f1.sum(axis=-1)
        s2 = f2.sum(axis=-1)
        s0 = s1 & 0xFFF
        pops = [(s1 >> 12) & 0x3FF, s1 >> 22, s2 & 0x3FF, s2 >> 10]
    else:
        s0 = q.sum(axis=-1)                        # <= base * 31, int32-safe
        pops = [((q >> t) & 1).sum(axis=-1) for t in range(4)]
    s_rel = [s0]
    for b in pops:
        s_rel.append((s_rel[-1] - b) >> 1)
    for t in range(5):
        diag_ref[:, t, :] = s_rel[t]
    diag_ref[:, 5, :] = k0
    diag_ref[:, 6, :] = jnp.zeros_like(k0)
    diag_ref[:, 7, :] = jnp.zeros_like(k0)


def _rice_diag_kernel_hp(packed, z_ref, diag_ref, zmax_ref):
    """Half-partition, transposed-layout variant of ``_rice_diag_kernel``.

    Block layout (BLK, base, hp): the reduction axis rides SUBLANES and the
    128 half-partitions fill every lane, so the ~14-op per-element chain
    (flip, quotient, field packing) runs at full VPU width -- the shipped
    (BLK, parts=64, base=64) layout pads 64 lanes to 128 and wastes half
    the machine on exactly those ops.  Reductions over axis=-2 are the
    cheap sublane direction.  Fields pack as in the base<=128 path (base
    here is 32: sum q <= 32*31 < 2^12, pops <= 32 < 2^10).
    """
    sign = jnp.uint32(0x80000000)
    zp = z_ref[:]                                  # (BLK, base, 128)
    zb = jax.lax.bitcast_convert_type(zp ^ sign, jnp.int32)
    mb = jnp.max(zb, axis=-2)                      # (BLK, 128) flipped max
    zmax_ref[:] = jax.lax.bitcast_convert_type(mb, jnp.uint32) ^ sign
    k0 = jnp.zeros_like(mb)
    for j in range(5, 32):
        thr = jnp.int32((1 << j) - (1 << 31))
        k0 = k0 + (mb >= thr).astype(jnp.int32)
    k0b = jnp.broadcast_to(k0.astype(jnp.uint32)[:, None, :], zp.shape)
    q = jax.lax.bitcast_convert_type(zp >> k0b, jnp.int32)
    if packed:  # base <= 128: fields cannot overflow (see v1 kernel)
        f1 = q + ((q & 1) << 12) + (((q >> 1) & 1) << 22)
        f2 = ((q >> 2) & 1) + (((q >> 3) & 1) << 10)
        s1 = f1.sum(axis=-2)
        s2 = f2.sum(axis=-2)
        s0 = s1 & 0xFFF
        pops = [(s1 >> 12) & 0x3FF, s1 >> 22, s2 & 0x3FF, s2 >> 10]
    else:
        s0 = q.sum(axis=-2)
        pops = [((q >> t) & 1).sum(axis=-2) for t in range(4)]
    s_rel = [s0]
    for b in pops:
        s_rel.append((s_rel[-1] - b) >> 1)
    for t in range(5):
        diag_ref[:, t, :] = s_rel[t]
    diag_ref[:, 5, :] = k0
    diag_ref[:, 6, :] = jnp.zeros_like(k0)
    diag_ref[:, 7, :] = jnp.zeros_like(k0)


@functools.partial(
    jax.jit, static_argnames=("parts", "block_rows", "interpret")
)
def rice_cost_sums_hp(
    z,
    *,
    parts: int = 64,
    block_rows: int = 8,
    interpret: bool = False,
):
    """Drop-in for ``rice_cost_sums`` via 2*parts transposed half-partitions.

    Splits every finest partition into two halves laid out as (B, base/2,
    2*parts) -- halves on LANES (all 128 used), samples on sublanes -- runs
    the diagonal kernel per half, reconstructs each half's 21-slot table in
    XLA and folds half pairs.  Exactness: a partition's sum at k is the sum
    of its halves' sums at k, each half's table is exact for k >= its own
    k0h, and k0h <= the full partition's k0 -- so every entry the caller's
    zmax validity mask keeps is exact, which is all the byte-identity
    contract needs (entries below the full partition's k0 may be partial
    sums rather than 0; the mask discards them).
    """
    B, N = z.shape
    hp = 2 * parts
    assert N % hp == 0
    base = N // hp
    zt = z.reshape(B, hp, base).swapaxes(1, 2)     # (B, base, hp)
    rows = min(block_rows, B)
    while B % rows:
        rows -= 1
    diag, zmax_h = pl.pallas_call(
        functools.partial(_rice_diag_kernel_hp, base <= 128),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, base, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, 8, hp), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, hp), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 8, hp), jnp.int32),
            jax.ShapeDtypeStruct((B, hp), jnp.uint32),
        ),
        interpret=interpret,
    )(zt)
    k0 = diag[:, 5, :]
    dk = (
        jax.lax.broadcasted_iota(jnp.int32, (1, KMAX_KERNEL + 1, 1), 1)
        - k0[:, None, :]
    )
    sums_h = jnp.zeros((B, KMAX_KERNEL + 1, hp), jnp.int32)
    for t in range(5):
        sums_h = jnp.where(dk == t, diag[:, t, :][:, None, :], sums_h)
    sums = sums_h[:, :, 0::2] + sums_h[:, :, 1::2]
    zmax = jnp.maximum(zmax_h[:, 0::2], zmax_h[:, 1::2])
    return sums, zmax


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
    diag, zmax = pl.pallas_call(
        functools.partial(_rice_diag_kernel, base <= 128),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, parts, base), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, 8, parts), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, parts), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 8, parts), jnp.int32),
            jax.ShapeDtypeStruct((B, parts), jnp.uint32),
        ),
        interpret=interpret,
    )(z3)
    # reconstruct the 21-slot table outside the kernel: S(k) = S(k0 + dk)
    # for dk in [0, 4], 0 for k >= k0 + 5 (z < 2^(k0+5)) and 0 (masked
    # invalid) below k0.  Five selects on (B, KMAX+1, parts) that XLA fuses
    # into the caller's cost + validity arithmetic.
    k0 = diag[:, 5, :]
    dk = (
        jax.lax.broadcasted_iota(jnp.int32, (1, KMAX_KERNEL + 1, 1), 1)
        - k0[:, None, :]
    )
    sums = jnp.zeros((B, KMAX_KERNEL + 1, parts), jnp.int32)
    for t in range(5):
        sums = jnp.where(dk == t, diag[:, t, :][:, None, :], sums)
    return sums, zmax
