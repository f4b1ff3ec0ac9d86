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
    two masked row adds -- ~2.5x less VPU compare/select work per token
    than v1 on paper.

    MEASURED SLOWER on the v5e (r5, tools/probe_dispatch.py: +19 ms per
    (2048, 4096) chunk vs v1): the per-sub-tile DYNAMIC lane rolls and the
    dynamic two-row RMW dominate -- Mosaic lowers a dynamic rotate as a
    full lane crossbar per call, 128k of them per chunk.  Kept selectable
    via FRTPU_PACK=v2 as a measured negative result; v1 stays the default.
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


def _pack_kernel3(R: int, n_sub: int,
                  w0_ref, c0_ref, c1_ref, base_ref, nxt_ref, zeros_ref,
                  out_ref, window, carry, sem):
    """One-modular-compare variant of ``_pack_kernel`` (same windows).

    v1 spends 4 (T_SUB, 128) compares + 4 selects per sub-tile (2 aligned
    window rows x masks for the token word and its spill).  Here ONE
    modular compare ``(lw & 127) == lane`` serves both rows -- row
    membership moves into (T_SUB, 1) COLUMN masks (tiny; the spill's row is
    split at lw < 127 since it lives at lw+1), and the c1 spill becomes a
    static per-row roll-by-one.  The rolls are exact: row0's wrapped lane
    would need lw & 127 == 127 with lw < 127 (empty), and row1's wrapped
    lane is precisely the lw == 127 token whose spill belongs at word 128 =
    row1 lane 0 (lw == 255 sits above the 226-word span bound).
    ~1.9x less VPU work per token;
    byte-identical by construction (integer sums over the same disjoint
    contributions).
    """
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
        lwj = w0_ref[0, :, j : j + 1] - bj          # (T_SUB, 1) in [0, 226]
        c0j = c0_ref[0, :, j : j + 1]
        c1j = c1_ref[0, :, j : j + 1]
        r0c0 = jnp.where(lwj < 128, c0j, 0)          # column masks (tiny)
        r1c0 = c0j - r0c0
        r0c1 = jnp.where(lwj < 127, c1j, 0)          # spill row: lw+1 < 128
        r1c1 = c1j - r0c1
        m = (lwj & 127) == lane                      # ONE (T_SUB, 128) compare
        s0r0 = jnp.where(m, r0c0, 0).sum(axis=0, keepdims=True)
        s0r1 = jnp.where(m, r1c0, 0).sum(axis=0, keepdims=True)
        s1r0 = jnp.where(m, r0c1, 0).sum(axis=0, keepdims=True)
        s1r1 = jnp.where(m, r1c1, 0).sum(axis=0, keepdims=True)
        row0 = s0r0 + pltpu.roll(s1r0, 1, axis=1)
        row1 = s0r1 + pltpu.roll(s1r1, 1, axis=1)
        window[pl.ds(row_off, 2), :] += jnp.concatenate([row0, row1], axis=0)

    s_nxt = nxt_ref[0, 0, 0]
    r_c = jnp.clip((s_nxt - s_sup) >> 7, 0, R - 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    carry[0:1, :] = jnp.sum(
        jnp.where(row_ids == r_c, window[...], 0), axis=0, keepdims=True
    )
    dma = pltpu.make_async_copy(window, out_ref.at[pl.ds(s_sup >> 7, R), :], sem)
    dma.start()
    dma.wait()


def _pack_kernel4(R: int, n_sub: int,
                  w0_ref, cl_ref, base_ref, nxt_ref, zeros_ref,
                  out_ref, window, carry, sem):
    """MXU variant: one-hot masks once, contributions via batched matmul.

    v1's inner loop spends ~10 vector ops per (token, window-slot) pair --
    4 compares, 4 selects, 2 adds -- plus 2 sublane reductions per
    sub-tile.  Here the two one-hot masks (token word, spill word) are
    built ONCE as (n_sub, T_SUB, 128) f32 tensors and the per-window sums
    become TWO batched (n_sub, 4, T_SUB) x (n_sub, T_SUB, 128) matmuls on
    the MXU; the 16-bit lo/hi field split keeps every product and f32
    accumulation exact (disjoint bit ranges: field sums cannot exceed
    65535).  Recombination back to int32 rows is whole-tensor work; only
    the 2-row window RMW remains a per-sub-tile loop.

    Inputs: w0_ref (1, n_sub, T_SUB) int32 SUB-BASE-RELATIVE word indices
    (TRANSPOSED layout vs v1 -- tokens on lanes, lw precomputed in XLA);
    cl_ref (1, n_sub, 8, T_SUB) f32 field rows
    [c0lo_r0, c0hi_r0, c0lo_r1, c0hi_r1, c1lo_r0, c1hi_r0, c1lo_r1,
    c1hi_r1] with the rowN masks pre-applied in XLA.
    """
    i = pl.program_id(0)
    s_sup = base_ref[0, 0, 0]

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    window[...] = jnp.zeros_like(window)
    window[0:1, :] = carry[0:1, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (n_sub, 1, 128), 2)
    lw = w0_ref[0][:, :, None]                       # (n_sub, T_SUB, 1), [0,226]
    # modular one-hots over the 128-lane compare width; the window ROW a
    # contribution belongs to (lw < 128 vs >= 128, and lw+1 for the spill)
    # is pre-split into cl's field rows in XLA
    m0 = ((lw & 127) == lane).astype(jnp.float32)    # token word one-hot
    m1 = (((lw + 1) & 127) == lane).astype(jnp.float32)  # spill one-hot
    cl = cl_ref[0]                                   # (n_sub, 8, T_SUB)
    o0 = jax.lax.dot_general(                        # (n_sub, 4, 128)
        cl[:, :4, :], m0,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o1 = jax.lax.dot_general(
        cl[:, 4:, :], m1,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    oi = (o0 + o1).astype(jnp.int32)                 # fields stay disjoint
    rows0 = oi[:, 0, :] + (oi[:, 1, :] << 16)        # (n_sub, 128)
    rows1 = oi[:, 2, :] + (oi[:, 3, :] << 16)
    for j in range(n_sub):
        row_off = (base_ref[0, 0, j] - s_sup) >> 7
        window[pl.ds(row_off, 2), :] += jnp.concatenate(
            [rows0[j : j + 1, :], rows1[j : j + 1, :]], axis=0
        )

    s_nxt = nxt_ref[0, 0, 0]
    r_c = jnp.clip((s_nxt - s_sup) >> 7, 0, R - 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    carry[0:1, :] = jnp.sum(
        jnp.where(row_ids == r_c, window[...], 0), axis=0, keepdims=True
    )
    dma = pltpu.make_async_copy(window, out_ref.at[pl.ds(s_sup >> 7, R), :], sem)
    dma.start()
    dma.wait()


def _pack_kernel5(R: int, n_sub: int,
                  w0_ref, c0_ref, c1_ref, base_ref, nxt_ref, zeros_ref,
                  out_ref, window, carry, sem):
    """v1 with modular masks: 2 compares/sub-tile instead of 4.

    Same aligned 2-row windows and select/add/reduce structure as v1, but
    the two compares are modular -- m0 keys the token word's lane
    (lw & 127), m1 the spill word's ((lw+1) & 127) -- and window-ROW
    membership moves into (T_SUB, 1) column masks (lw < 128 for the token,
    lw < 127 for its spill, i.e. lw+1 < 128).  No rolls (v3's lesson:
    Mosaic lane rolls cost ~50 cycles each), no matmuls (v4's lesson:
    tiny batched dots lower poorly); just two fewer (T_SUB, 128) compares
    and two fewer adds per sub-tile than v1.
    """
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
        lwj = w0_ref[0, :, j : j + 1] - bj          # (T_SUB, 1) in [0, 226]
        c0j = c0_ref[0, :, j : j + 1]
        c1j = c1_ref[0, :, j : j + 1]
        r0c0 = jnp.where(lwj < 128, c0j, 0)          # column masks (tiny)
        r1c0 = c0j - r0c0
        r0c1 = jnp.where(lwj < 127, c1j, 0)
        r1c1 = c1j - r0c1
        m0 = (lwj & 127) == lane                     # (T_SUB, 128)
        m1 = ((lwj + 1) & 127) == lane
        row0 = (jnp.where(m0, r0c0, 0) + jnp.where(m1, r0c1, 0)).sum(
            axis=0, keepdims=True)
        row1 = (jnp.where(m0, r1c0, 0) + jnp.where(m1, r1c1, 0)).sum(
            axis=0, keepdims=True)
        window[pl.ds(row_off, 2), :] += jnp.concatenate([row0, row1], axis=0)

    s_nxt = nxt_ref[0, 0, 0]
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
        version = os.environ.get("FRTPU_PACK", "v1")
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

    if version == "v4":
        w0_r = w0.reshape(n_tiles, n_sub, T_SUB)       # tokens on lanes
        sb_col = sub_base[:, :, None]                   # (tiles, n_sub, 1)
        lw = w0_r - sb_col
        r0 = lw < 128
        r0s = lw < 127                                  # spill row: lw+1 < 128
        c0i = jax.lax.bitcast_convert_type(c0, jnp.int32).reshape(
            n_tiles, n_sub, T_SUB)
        c1i = jax.lax.bitcast_convert_type(c1, jnp.int32).reshape(
            n_tiles, n_sub, T_SUB)
        lo0, hi0 = c0i & 0xFFFF, (c0i >> 16) & 0xFFFF
        lo1, hi1 = c1i & 0xFFFF, (c1i >> 16) & 0xFFFF
        z = jnp.int32(0)
        cl = jnp.stack([
            jnp.where(r0, lo0, z), jnp.where(r0, hi0, z),
            jnp.where(r0, z, lo0), jnp.where(r0, z, hi0),
            jnp.where(r0s, lo1, z), jnp.where(r0s, hi1, z),
            jnp.where(r0s, z, lo1), jnp.where(r0s, z, hi1),
        ], axis=2).astype(jnp.float32)                  # (tiles, n_sub, 8, T_SUB)
        out = pl.pallas_call(
            functools.partial(_pack_kernel4, R, n_sub),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, n_sub, T_SUB), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_sub, 8, T_SUB), lambda i: (i, 0, 0, 0),
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
            input_output_aliases={4: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(lw, cl, sub_base[:, None, :], next_start[:, None, None], zeros)
        return jax.lax.bitcast_convert_type(out, jnp.uint32).reshape(-1)[:n_words]

    kern = {"v3": _pack_kernel3, "v5": _pack_kernel5}.get(version, _pack_kernel)
    out = pl.pallas_call(
        functools.partial(kern, R, n_sub),
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
