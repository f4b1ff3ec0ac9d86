"""Mosaic (Pallas TPU) bitstream packing kernel for the sample-token stream.

Replaces the two per-sample XLA scatter-adds in ops/device_emit with a
VMEM-resident reduction.  Measured on v5e (docs/PERFORMANCE.md): XLA TPU
scatter is element-rate bound at ~82M tokens/s regardless of hints, which
made emission the device-side bottleneck (~62 MB/s raw-equivalent for
plan_and_emit vs ~400 MB/s for planning alone).  This kernel turns packing
into dense VPU compare/select/reduce work over on-chip windows -- the only
HBM traffic is the token fields in and each output word written once.

Algorithm (all sizes static):

  * tokens are split into SUPER-tiles of ``T_SUPER`` consecutive tokens (one
    sequential grid step each) and SUB-tiles of ``T_SUB`` tokens;
  * a sub-tile's tokens land in a bounded word window: FLAC token pitch is
    <= 32 bits (planner cap: q+1+k <= MAX_RICE_TOKEN_BITS; verbatim:
    bps <= 27) plus a bounded inter-subframe gap, so ``T_SUB`` tokens span
    < W_SUB words;
  * for each sub-tile the kernel computes ``out[w] = sum_t [lw_t == w]*c0_t
    + [lw_t == w-1]*c1_t`` as a (T_SUB, W_ROWS, 128) compare/select/reduce
    (disjoint bit ranges make integer add equal OR), then accumulates it
    into the super-tile's (R, 128) VMEM window at a 128-word-aligned row;
  * each grid step DMAs its whole window to the output at its aligned start
    word.  Consecutive windows overlap; the TPU grid is sequential, every
    word a tile writes beyond its ownership is rewritten (complete) by the
    next tile, and the single shared boundary row is handed to the next
    step through a persistent VMEM carry (same accumulate-across-grid
    pattern as pallas_guide.md's matmul accumulator);
  * the output buffer is donated zeros (``input_output_aliases``), so words
    no window covers -- the zero runs of long unary quotients -- stay zero.

Byte-exactness: the kernel's integer arithmetic is identical to
``device_emit._scatter_tokens``; ``tests/test_pallas_pack.py`` asserts
equality in interpret mode on randomized streams and through the full
encoder.  The reference encoder has no counterpart for any of this -- it
delegates packing to libFLAC's sequential bitwriter (reference
``converter.py:139-154``, SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pack_tokens", "T_SUPER", "T_SUB", "MAX_TOKEN_BITS"]

T_SUPER = 4096          # tokens per grid step
# Per-token compare work is one test against every word-slot of its
# sub-tile window, i.e. ~(T_SUB span + gap/alignment overhead) slots, so
# SMALLER sub-tiles cost less until the fixed ~192-word gap+align overhead
# dominates: T_SUB=64 -> 2-row window (256 slots/token) vs 128 -> 3 rows
# (384) vs 256 -> 4 rows (512).
T_SUB = 64              # tokens per inner reduction
W_SUB_ROWS = 2          # sub-window rows of 128 words (256 words)
GAP_BITS = 1024         # bound on non-sample bits between consecutive tokens
# start-to-start bound within a subframe: the planners enforce
# q + 1 + k <= device_codec.MAX_RICE_TOKEN_BITS (= 32) on every Rice token
# and verbatim pitch is bps <= 27; tightening this from 64 cut the kernel's
# compare window from 4 rows to 3
MAX_PITCH_BITS = 32
MAX_TOKEN_BITS = 31     # every token value must fit 31 bits (callers: <= 27)


def _sub_rows(tokens: int, slots_per_group: int) -> int:
    """Window rows needed by ``tokens`` consecutive tokens + 128-alignment."""
    crossings = -(-tokens // slots_per_group) + 1
    span_words = (tokens * MAX_PITCH_BITS + crossings * GAP_BITS + 31) // 32
    return -(-(span_words + 128) // 128)


def _pack_kernel2(R: int, n_sub: int,
                  w0_ref, c0_ref, c1_ref, first_ref, nxt_ref, zeros_ref,
                  out_ref, window, carry, sem):
    """One-compare sub-tile variant of ``_pack_kernel`` (the TPU default).

    v1 compares every token against BOTH 128-lane rows of a 128-word-ALIGNED
    sub-window (256 slots/token, two masks).  This version keys each
    sub-tile's window to its FIRST TOKEN'S WORD instead: the amortized
    start-to-start pitch bound (sum of pitches telescopes to the sub-tile's
    total bits <= T_SUB*MAX_PITCH_BITS + GAP_BITS + MAX_PITCH_BITS) keeps
    every relative word index under 128, so ONE (T_SUB, 128) compare builds
    the mask, both word-contributions reduce under the SAME mask, the c1
    spill is a static roll-by-one (the wrap lane is provably zero), and the
    compact row lands in the aligned super-window via a dynamic lane roll +
    two masked row adds -- ~2.5x less VPU work per token than v1.
    """
    i = pl.program_id(0)
    first0 = first_ref[0, 0, 0]
    s_sup = first0 & ~jnp.int32(127)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    window[...] = jnp.zeros_like(window)
    window[0:1, :] = carry[0:1, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for j in range(n_sub):
        bj = first_ref[0, 0, j]
        d = bj - s_sup
        r = d >> 7
        l = d & 127
        lwj = w0_ref[0, :, j : j + 1] - bj          # (T_SUB, 1), in [0, ~99]
        m = lwj == lane                              # ONE compare
        c0j = c0_ref[0, :, j : j + 1]
        c1j = c1_ref[0, :, j : j + 1]
        s0 = jnp.where(m, c0j, 0).sum(axis=0, keepdims=True)   # (1, 128)
        s1 = jnp.where(m, c1j, 0).sum(axis=0, keepdims=True)
        # c1 of token at rel-word w belongs at w+1: static roll by one.  The
        # wrapped element s1[127] is zero by the span bound (lw <= ~99).
        comb = s0 + pltpu.roll(s1, 1, axis=1)
        # place words [bj, bj+128) at lane offset l of rows r, r+1
        rolled = pltpu.roll(comb, l, axis=1)         # dynamic lane roll
        row0 = jnp.where(lane >= l, rolled, 0)
        row1 = jnp.where(lane < l, rolled, 0)
        window[pl.ds(r, 2), :] += jnp.concatenate([row0, row1], axis=0)

    s_nxt = nxt_ref[0, 0, 0] & ~jnp.int32(127)
    r_c = jnp.clip((s_nxt - s_sup) >> 7, 0, R - 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    carry[0:1, :] = jnp.sum(
        jnp.where(row_ids == r_c, window[...], 0), axis=0, keepdims=True
    )
    dma = pltpu.make_async_copy(window, out_ref.at[pl.ds(s_sup >> 7, R), :], sem)
    dma.start()
    dma.wait()


def _pack_kernel(R: int, n_sub: int,
                 w0_ref, c0_ref, c1_ref, base_ref, nxt_ref, zeros_ref,
                 out_ref, window, carry, sem):
    i = pl.program_id(0)
    s_sup = base_ref[0, 0, 0]

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    window[...] = jnp.zeros_like(window)
    window[0:1, :] = carry[0:1, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for j in range(n_sub):
        bj = base_ref[0, 0, j]
        row_off = (bj - s_sup) >> 7
        lwj = w0_ref[0, :, j : j + 1] - bj          # (T_SUB, 1) sublane vec
        c0j = c0_ref[0, :, j : j + 1]
        c1j = c1_ref[0, :, j : j + 1]
        rows = []
        for r in range(W_SUB_ROWS):
            wid = lane + (r << 7)                    # (1, 128) lane vec
            m0 = lwj == wid                          # (T_SUB, 128)
            m1 = lwj == wid - 1
            contrib = jnp.where(m0, c0j, 0) + jnp.where(m1, c1j, 0)
            rows.append(contrib.sum(axis=0, keepdims=True))
        window[pl.ds(row_off, W_SUB_ROWS), :] += jnp.concatenate(rows, axis=0)

    s_nxt = nxt_ref[0, 0, 0]
    r_c = jnp.clip((s_nxt - s_sup) >> 7, 0, R - 1)
    # extract window row r_c as a masked reduction: dynamic-offset VMEM
    # *reads* kernel-fault on this TPU stack (dynamic RMW is fine) -- see
    # docs/PERFORMANCE.md Mosaic-limitations table
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    carry[0:1, :] = jnp.sum(
        jnp.where(row_ids == r_c, window[...], 0), axis=0, keepdims=True
    )
    dma = pltpu.make_async_copy(window, out_ref.at[pl.ds(s_sup >> 7, R), :], sem)
    dma.start()
    dma.wait()


@functools.partial(
    jax.jit, static_argnames=("n_words", "slots_per_group", "interpret", "version")
)
def pack_tokens(vals, lens, offs, *, n_words: int, slots_per_group: int = 4096,
                interpret: bool = False, version: str | None = None):
    """Pack a monotone token stream into a zeroed uint32 word buffer.

    Drop-in equal to ``device_emit._scatter_tokens(zeros(n_words), ...)``.

    Preconditions (guaranteed by plan_and_emit's layout, see module doc):
      * flattened ``offs`` non-decreasing, token bit ranges disjoint;
      * every token length <= MAX_TOKEN_BITS;
      * within any run of consecutive token slots the start-to-start pitch
        is <= MAX_PITCH_BITS except at most one crossing per
        ``slots_per_group`` slots of <= GAP_BITS extra bits.

    Args:
        vals/lens/offs: any shape (flattened); uint32/int32/int32.
        n_words: static output length.
        slots_per_group: token slots per subframe (the emitter's blocksize N).
    Returns:
        (n_words,) uint32.
    """
    v = vals.ravel().astype(jnp.uint32)
    l = lens.ravel().astype(jnp.int32)
    o = offs.ravel().astype(jnp.int32)
    nt = v.shape[0]
    if nt == 0:
        return jnp.zeros((n_words,), jnp.uint32)
    pad = (-nt) % T_SUPER
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)])
        l = jnp.concatenate([l, jnp.zeros((pad,), jnp.int32)])
        o = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (pad,))])
    nt += pad
    n_tiles = nt // T_SUPER
    n_sub = T_SUPER // T_SUB

    # token field prep (fused XLA elementwise; same arithmetic as
    # _scatter_tokens): word index + the two word-local contributions
    live_mask = (jnp.uint32(1) << jnp.clip(l, 0, 31).astype(jnp.uint32)) - 1
    live_mask = jnp.where(l >= 32, jnp.uint32(0xFFFFFFFF), live_mask)
    vm = v & live_mask
    end = o + l
    w0 = o >> 5
    sh = (w0 + 1) * 32 - end
    shl = jnp.clip(sh, 0, 31).astype(jnp.uint32)
    shr = jnp.clip(-sh, 0, 31).astype(jnp.uint32)
    c0 = jnp.where(sh >= 0, vm << shl, vm >> shr)
    c1 = jnp.where(sh < 0, vm << jnp.clip(32 + sh, 0, 31).astype(jnp.uint32),
                   jnp.uint32(0))

    # (tiles, T_SUB, n_sub): sub-tile j of tile i lives in column j, so the
    # kernel reads token vectors as (T_SUB, 1) sublane columns -- no
    # in-kernel lane->sublane relayout (Mosaic transposes are the risk; the
    # XLA transpose here is one fused pass over HBM)
    def cols(x):
        return x.reshape(n_tiles, n_sub, T_SUB).swapaxes(1, 2)

    w0_t = cols(w0)
    c0_t = cols(jax.lax.bitcast_convert_type(c0, jnp.int32))
    c1_t = cols(jax.lax.bitcast_convert_type(c1, jnp.int32))
    sub_first = w0.reshape(n_tiles, n_sub, T_SUB)[:, :, 0]
    sub_base = sub_first & ~jnp.int32(127)
    next_start = jnp.concatenate([sub_base[1:, 0], sub_base[-1:, 0]])

    R = _sub_rows(T_SUPER, slots_per_group) + W_SUB_ROWS + 1
    R = -(-R // 8) * 8  # sublane-aligned scratch rows
    rows_total = -(-n_words // 128) + R + 1
    zeros = jnp.zeros((rows_total, 128), jnp.int32)

    # v2 (one-compare sub-windows) needs every sub-tile's relative word span
    # + the c1 spill to fit 128 lanes; the amortized pitch bound gives
    # T_SUB*MAX_PITCH + one GAP crossing + one trailing token.
    v2_span = (T_SUB * MAX_PITCH_BITS + GAP_BITS + MAX_PITCH_BITS + 31) // 32
    if version is None:  # trace-time env default; tests pass it explicitly
        version = os.environ.get("FRTPU_PACK", "v2")
    use_v2 = version == "v2" and v2_span + 1 < 128

    if use_v2:
        nf = jnp.concatenate([sub_first[1:, 0], sub_first[-1:, 0]])
        out = pl.pallas_call(
            functools.partial(_pack_kernel2, R, n_sub),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, T_SUB, n_sub), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T_SUB, n_sub), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T_SUB, n_sub), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_sub), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((rows_total, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.VMEM((8, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            input_output_aliases={5: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(w0_t, c0_t, c1_t, sub_first[:, None, :], nf[:, None, None], zeros)
        return jax.lax.bitcast_convert_type(out, jnp.uint32).reshape(-1)[:n_words]

    out = pl.pallas_call(
        functools.partial(_pack_kernel, R, n_sub),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, T_SUB, n_sub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_SUB, n_sub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_SUB, n_sub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_sub), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows_total, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(w0_t, c0_t, c1_t, sub_base[:, None, :], next_start[:, None, None], zeros)

    return jax.lax.bitcast_convert_type(out, jnp.uint32).reshape(-1)[:n_words]
