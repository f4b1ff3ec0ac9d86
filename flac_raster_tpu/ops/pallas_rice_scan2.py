"""Mosaic (Pallas TPU) kernel: the decoder's WHOLE Rice chain scan.

Second-generation kernel.  ops/pallas_rice_scan (the group-step kernel)
moved one scan step's realign + code group on-chip but left the per-step
row gather, a (B, words) -> (words, B) transpose, and the carry re-assembly
in XLA -- and measured 64.9 ms/chunk vs the XLA scan's 60.8 on v5e: the
per-step glue ate the in-kernel gain.  This kernel removes ALL per-step
XLA work by running the entire scan as ONE Pallas program:

* grid = (lane_tiles, n_steps), steps innermost.  The per-lane bit windows
  ride a (rows, 32, lanes) block whose index map is constant in the step
  dimension, so Mosaic fetches each lane tile's windows into VMEM ONCE and
  every scan step reads them on-chip.
* the scan carry (bit position, Rice k, error flag) lives in VMEM scratch,
  initialised at step 0 (``pl.when``) and persisting across the sequential
  step iterations of a tile.
* the per-lane dynamic row fetch becomes a masked reduction over the
  window's row dimension (dynamic-offset VMEM *reads* kernel-fault on this
  stack -- repo CLAUDE.md; masked reduction is the documented cure), in
  int32 (Mosaic has no unsigned vector reductions).
* decoded zigzags stream out through the normal output-block pipeline --
  one (group, lanes) block per step, no in-kernel dynamic stores.

Per extraction the kernel decodes ``group`` codes (group = largest multiple
of 8 with group*37 <= (nrow*32 - 31)*32 - 31 bits: every code is bounded at
37 bits by the TOK32 planner cap, see device_codec.MAX_RICE_TOKEN_BITS),
shifting the aligned window left in registers between codes exactly like
ops/device_decode.rice_step -- the arithmetic is bit-identical (asserted in
interpret mode by tests/test_pallas_rice_scan.py on the CPU mesh and on
hardware by tools/tpu_selftest.py).

The reference has no counterpart: it decodes through libFLAC's sequential
host bitreader (reference ``converter.py:181-182``; SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rice_scan_full", "scan2_params"]

_RW = 32          # words per window row (matches device_decode._RW)
_META_ROWS = 8    # int32 meta rows (7 used)
_OUT_ROWS = 8     # int32 result rows (3 used)


def _clz32(x):
    """Branchless count-leading-zeros of uint32 x; clz(0) == 32 like XLA."""
    n = jnp.zeros(x.shape, jnp.int32)
    y = x
    for s in (16, 8, 4, 2, 1):
        top0 = (y >> jnp.uint32(32 - s)) == 0
        n = n + jnp.where(top0, jnp.int32(s), jnp.int32(0))
        y = jnp.where(top0, y << jnp.uint32(s), y)
    return jnp.where(x == 0, jnp.int32(32), n)


def _take_bits(v32, nbits):
    """Top ``nbits`` (0..31) of a 32-bit read; nbits may be 0 (-> 0).

    int32 clamp: Mosaic has no ``arith.minui`` lowering (repo CLAUDE.md).
    """
    nb = jnp.minimum(nbits, 31).astype(jnp.uint32)
    shifted = (v32 >> jnp.uint32(1)) >> (jnp.uint32(31) - nb)
    return jnp.where(nbits == 0, jnp.uint32(0), shifted)


def _scan_kernel(nrow, group, align_words, R,
                 win_ref, meta_ref, zs_ref, mo_ref, state):
    """One grid step: extract+realign a row window, decode ``group`` codes.

    Args:
        win_ref: (R, 32, L) int32 -- the lane tile's windows, words split
            into R rows of 32; resident in VMEM across all steps (index map
            constant in the step grid dim).
        meta_ref: (_META_ROWS, L) int32 -- per-lane constants: 0 rstart,
            1 err-in (0/1), 2 is_rice, 3 order, 4 n_codes, 5 pbits,
            6 psize_mask.
        zs_ref: (group, L) uint32 out -- this step's decoded zigzags.
        mo_ref: (_OUT_ROWS, L) int32 out -- 0 end bit pos, 1 k, 2 err.
        state: (8, L) int32 VMEM scratch -- 0 cpos, 1 k, 2 err; carried
            across the sequential step iterations of one lane tile.
    """
    s_idx = pl.program_id(1)

    @pl.when(s_idx == 0)
    def _init():
        state[0:1, :] = meta_ref[0:1, :]
        state[1:2, :] = jnp.zeros_like(meta_ref[0:1, :])
        state[2:3, :] = meta_ref[1:2, :]

    cpos = state[0:1, :]
    k = state[1:2, :]
    err = state[2:3, :] != 0
    is_rice = meta_ref[2:3, :] != 0
    order = meta_ref[3:4, :]
    n_codes = meta_ref[4:5, :]
    pbits = meta_ref[5:6, :]
    psm = meta_ref[6:7, :]
    escape = (jnp.int32(1) << pbits.astype(jnp.uint32)) - 1
    L = cpos.shape[1]

    # ---- per-lane row extraction: masked reduction over the row dim ------
    wi = cpos >> 5
    r0 = jnp.clip(wi >> 5, 0, R - nrow)            # _RW == 32
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, 1, L), 0)
    win = win_ref[:]
    rows = [
        jnp.sum(jnp.where(iota_r == (r0 + jr)[None, :, :], win, 0), axis=0)
        for jr in range(nrow)
    ]
    wa = jnp.concatenate(rows, axis=0).astype(jnp.uint32)  # (nrow*32, L)

    def shl_words(arr, nw):
        z = jnp.zeros((nw, L), jnp.uint32)
        return jnp.concatenate([arr[nw:], z], axis=0)

    # word realign (staged shifts on woff's bits), then bit align to cpos.
    # After each stage at most ``rem`` more words (+1 for the bit stage)
    # can still shift in, so the tail rows beyond align_words+1+rem+1 are
    # dead and sliced off -- the stage shifts shrink 64->52->44->... rows.
    woff = wi - (r0 << 5)
    rem = 31
    s = 16
    while s:
        wa = jnp.where((woff & s) != 0, shl_words(wa, s), wa)
        rem -= s
        wa = wa[: align_words + 1 + rem + 1]
        s >>= 1
    sh = (cpos & 31).astype(jnp.uint32)
    w1 = shl_words(wa, 1)
    wa = (wa << sh) | ((w1 >> jnp.uint32(1)) >> (jnp.uint32(31) - sh))
    wa = wa[: align_words + 1]

    def shl_bits(arr, n_bits):
        """Per-lane left shift by n_bits (< 64): 1-word + sub-word stage."""
        a1 = shl_words(arr, 1)
        nw1 = n_bits >= 32
        base = jnp.where(nw1, a1, arr)
        base_n = jnp.where(nw1, shl_words(a1, 1), a1)
        nb = (n_bits & 31).astype(jnp.uint32)
        return (base << nb) | (
            (base_n >> jnp.uint32(1)) >> (jnp.uint32(31) - nb)
        )

    # ---- the code group (identical dataflow to device_decode.rice_step) --
    j0 = s_idx * group
    adv = jnp.zeros((1, L), jnp.int32)
    for g in range(group):
        j = j0 + g
        jj = order + j
        active = is_rice & (j < n_codes)
        boundary = active & ((j == 0) | ((jj & psm) == 0))
        pb = jnp.where(boundary, pbits, 0)
        a, b, c = wa[0:1], wa[1:2], wa[2:3]
        k_new = _take_bits(a, pbits).astype(jnp.int32)
        err = err | (boundary & (k_new == escape))
        k = jnp.where(boundary, k_new, k)
        # consume the (optional) partition parameter (pb <= 5 < 32)
        pbu = pb.astype(jnp.uint32)
        tp = jnp.uint32(31) - pbu
        a, b = (
            (a << pbu) | ((b >> jnp.uint32(1)) >> tp),
            (b << pbu) | ((c >> jnp.uint32(1)) >> tp),
        )
        q = jnp.where(a == 0, 32 + _clz32(b), _clz32(a))
        err = err | (active & (q + 1 + k > 32))
        q = jnp.minimum(q, 31)
        s2 = q + 1
        lo = jnp.minimum(s2, 31).astype(jnp.uint32)
        w1 = (a << lo) | ((b >> jnp.uint32(1)) >> (jnp.uint32(31) - lo))
        rem = _take_bits(jnp.where(s2 <= 31, w1, b), k)
        z = (q.astype(jnp.uint32) << k.astype(jnp.uint32)) | rem
        zs_ref[g : g + 1, :] = jnp.where(active, z, jnp.uint32(0))
        n_bits = jnp.where(active, pb + q + 1 + k, 0)
        adv = adv + n_bits
        if g < group - 1:
            # Triangle shrink: codes g+1..group-1 reference at most
            # 37*(group-2-g) + 96 bits past the new cursor (37 = TOK32 max
            # incl. partition parameter, 96 = the 3-word a/b/c read), so
            # the rows beyond that are dead -- the shift window shrinks
            # linearly across the group, roughly halving shift work.
            # (Corrupt streams can consume >37 bits/code; they flag ``err``
            # and the caller host-falls-back, so truncated reads are fine.)
            need = -(-(37 * (group - 2 - g) + 96) // 32)
            wa = shl_bits(wa[: need + 2], n_bits)[: need]

    cpos = cpos + adv
    state[0:1, :] = cpos
    state[1:2, :] = k
    erri = jnp.where(err, jnp.int32(1), jnp.int32(0))
    state[2:3, :] = erri
    mo_ref[0:1, :] = cpos
    mo_ref[1:2, :] = k
    mo_ref[2:3, :] = erri
    for r in range(3, _OUT_ROWS):
        mo_ref[r : r + 1, :] = jnp.zeros((1, L), jnp.int32)


def scan2_params(W: int, nrow: "int | None" = None):
    """Resolve (nrow, group, lane_tile) for a (B, W)-word window batch.

    group is the largest multiple of 8 with group*37 <= align_words*32 - 31
    (TOK32 bounds a code at 37 bits incl. the 5-bit partition parameter);
    the multiple-of-8 keeps the zs output block sublane-aligned.  lane_tile
    caps the VMEM-resident window block at ~4 MB (sweepable via
    FRTPU_SCAN2_LANES).  Returns None if the kernel can't run this shape.
    """
    if W % _RW:
        return None
    if nrow is None:
        nrow = int(os.environ.get("FRTPU_SCAN2_NROW", "3"))
    if W // _RW < nrow:
        return None
    align_words = nrow * _RW - (_RW - 1)
    group = ((align_words * 32 - 31) // 37) & ~7
    if group <= 0:
        return None
    lt_env = os.environ.get("FRTPU_SCAN2_LANES")
    if lt_env:
        lane_tile = int(lt_env)
    else:
        budget = 4 * 1024 * 1024
        lane_tile = 128
        while lane_tile * 2 * W * 4 <= budget and lane_tile < 1024:
            lane_tile *= 2
    if W * lane_tile * 4 > 12 * 1024 * 1024:
        return None  # window block would not fit VMEM even at 128 lanes
    return nrow, group, lane_tile


@functools.partial(
    jax.jit,
    static_argnames=("N", "nrow", "group", "lane_tile", "interpret"),
)
def rice_scan_full(
    words, rstart, err, is_rice, order, n_codes, pbits, psm,
    *, N: int, nrow: int, group: int, lane_tile: int,
    interpret: bool = False,
):
    """Run the whole Rice chain scan on-chip for a (B, W) window batch.

    Args:
        words: (B, W) uint32 -- per-lane bit windows (W % 32 == 0).
        rstart: (B,) int32 -- bit position of the first residual code.
        err: (B,) bool -- error accumulator in.
        is_rice/order/n_codes/pbits/psm: (B,) int32 per-lane constants.
    Returns:
        zs (B, N) uint32 zigzags, rend (B,) int32 end positions,
        err (B,) bool.
    """
    B, W = words.shape
    R = W // _RW
    align_words = nrow * _RW - (_RW - 1)
    n_steps = -(-N // group)

    Bp = -(-B // lane_tile) * lane_tile
    if Bp != B:
        pad = Bp - B
        words = jnp.pad(words, ((0, pad), (0, 0)))
        rstart, order, n_codes, pbits, psm = (
            jnp.pad(v, (0, pad)) for v in (rstart, order, n_codes, pbits, psm)
        )
        err, is_rice = (
            jnp.pad(v, (0, pad), constant_values=False) for v in (err, is_rice)
        )

    # (B, W) -> (R, 32, B): words on (rows, word-in-row), lanes minor.  One
    # XLA relayout per batch; int32 view because the in-kernel extraction
    # is a masked SUM (Mosaic has no unsigned reductions) -- exactly one
    # row matches per lane, so the sum IS the row, bit pattern preserved.
    win3 = jax.lax.bitcast_convert_type(
        words.reshape(Bp, R, _RW), jnp.int32
    ).transpose(1, 2, 0)

    meta = jnp.zeros((_META_ROWS, Bp), jnp.int32)
    rows = [rstart, jnp.where(err, 1, 0), jnp.where(is_rice, 1, 0),
            order, n_codes, pbits, psm]
    meta = meta.at[: len(rows), :].set(jnp.stack(rows).astype(jnp.int32))

    grid = (Bp // lane_tile, n_steps)
    zs, mo = pl.pallas_call(
        functools.partial(_scan_kernel, nrow, group, align_words, R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, _RW, lane_tile), lambda t, s: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_META_ROWS, lane_tile), lambda t, s: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((group, lane_tile), lambda t, s: (s, t)),
            pl.BlockSpec((_OUT_ROWS, lane_tile), lambda t, s: (0, t)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps * group, Bp), jnp.uint32),
            jax.ShapeDtypeStruct((_OUT_ROWS, Bp), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((8, lane_tile), jnp.int32)],
        interpret=interpret,
    )(win3, meta)
    return zs[:N, :B].T, mo[0, :B], mo[2, :B] != 0
