"""Mosaic (Pallas TPU) kernel for the decoder's Rice chain scan step.

The decode kernel's dominant cost is the Rice residual chain
(ops/device_decode: a ``lax.scan`` whose step realigns an ``nrow``-row
window and decodes ``group`` consecutive codes with register shifts between
codes).  On v5e the XLA formulation runs at ~230 M codes/s and the cost is
INSENSITIVE to window width (nrow=2/3/4 within 10%, tools/sweep_decode.py)
and to layout (the transposed variant of tools/profile_rice_scan.py
measured the same) -- i.e. it is bound by per-op overhead/materialization
between the ~350 small HLO ops of a step, not by ALU work (an ALU-bound
estimate is ~30x faster).  This kernel runs ONE step's realign + whole
code group as a single VMEM-resident program: the window stays on-chip
across all ``group`` codes, every op is a dense VPU shift/select over a
(words, lanes) block, and the only HBM traffic is the gathered rows in and
the decoded codes out.

MEASURED OUTCOME (v5e, 2048-frame stereo chunk, 2026-08-19): 64.9 ms/chunk
vs the XLA row scan's 60.8 -- the per-step glue that stays in XLA (row
gather, the (B, words) -> (words, B) transpose, meta re-assembly) plus ~150
kernel launches eat the in-kernel savings.  The XLA scan therefore remains
the default engine everywhere (``FRTPU_DECODE_SCAN=pallas`` selects this
kernel for A/B); the follow-up that wins is moving the WHOLE scan loop into
one Pallas program (window resident in VMEM across steps, zero per-step
XLA ops) -- see ops/pallas_rice_scan2.

The per-lane row GATHER stays in XLA (measured ~4 ms of the 36 ms step
total): each scan step gathers ``nrow`` aligned 32-word rows per lane,
transposes to (words, lanes) -- words on sublanes, lanes on the 128-lane
axis, so nothing pads to the 128-lane minimum -- and calls this kernel.

Arithmetic is bit-identical to device_decode's ``rice_step`` (asserted in
interpret mode by tests/test_pallas_rice_scan.py and verified on a real
v5e 2026-08-19): same staged word realign, same take-bits/clz
dataflow, same error flags (escape partitions, tokens over the TOK32 cap).
``lax.clz`` is not relied on in-kernel: a 5-stage branchless shift chain
computes clz with clz(0) == 32 exactly like XLA's semantics.

The reference has no counterpart: it decodes through libFLAC's sequential
host bitreader (reference ``converter.py:181-182``; SURVEY.md §2.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rice_group_step"]

_META_ROWS = 16  # int32 meta rows in (sublane-aligned; 11 used)
_OUT_ROWS = 8    # int32 result rows out (3 used)


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

    The clamp runs on int32: Mosaic has no ``arith.minui`` lowering (an
    unsigned vector min kernel-faults at compile -- repo CLAUDE.md), and
    ``nbits`` is a small non-negative int32 anyway.
    """
    nb = jnp.minimum(nbits, 31).astype(jnp.uint32)
    shifted = (v32 >> jnp.uint32(1)) >> (jnp.uint32(31) - nb)
    return jnp.where(nbits == 0, jnp.uint32(0), shifted)


def _rice_scan_kernel(group, align_words, w_rows, win_ref, meta_ref,
                      zs_ref, mo_ref):
    """Realign one gathered row window and decode ``group`` codes.

    Args:
        win_ref: (w_rows, L) uint32 -- per-lane gathered rows, transposed.
        meta_ref: (_META_ROWS, L) int32 -- per-lane state/constants:
            0 woff (word offset of cpos within the gathered rows), 1 sh
            (cpos & 31), 2 k carry, 3 err carry (0/1), 4 is_rice, 5 jj
            (order + j0), 6 n_rel (n_codes - j0), 7 is_first (j0 == 0),
            8 pbits, 9 psize_mask.
        zs_ref: (group rounded to 8, L) uint32 out -- decoded zigzags.
        mo_ref: (_OUT_ROWS, L) int32 out -- 0 adv (bits consumed), 1 k,
            2 err.
    """
    win = win_ref[:]
    woff = meta_ref[0:1, :]
    sh = meta_ref[1:2, :].astype(jnp.uint32)
    k = meta_ref[2:3, :]
    err = meta_ref[3:4, :] != 0
    is_rice = meta_ref[4:5, :] != 0
    jj = meta_ref[5:6, :]
    n_rel = meta_ref[6:7, :]
    is_first = meta_ref[7:8, :] != 0
    pbits = meta_ref[8:9, :]
    psm = meta_ref[9:10, :]
    escape = (jnp.int32(1) << pbits.astype(jnp.uint32)) - 1

    L = win.shape[1]

    def shl_words(arr, nw):
        z = jnp.zeros((nw, L), jnp.uint32)
        return jnp.concatenate([arr[nw:], z], axis=0)

    # word-granularity realign: staged shifts on woff's bits (identical to
    # device_decode.rice_step's select chain, words on the sublane axis)
    s = 16
    while s:
        win = jnp.where((woff & s) != 0, shl_words(win, s), win)
        s >>= 1
    # bit-granularity align to cpos
    w1 = shl_words(win, 1)
    win = (win << sh) | ((w1 >> jnp.uint32(1)) >> (jnp.uint32(31) - sh))
    wa = win[: align_words + 1]

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

    adv = jnp.zeros((1, L), jnp.int32)
    for g in range(group):
        active = is_rice & (g < n_rel)
        if g == 0:
            boundary = active & (is_first | ((jj & psm) == 0))
        else:
            boundary = active & (((jj + g) & psm) == 0)
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
            wa = shl_bits(wa, n_bits)

    mo_ref[0:1, :] = adv
    mo_ref[1:2, :] = k
    mo_ref[2:3, :] = jnp.where(err, jnp.int32(1), jnp.int32(0))
    for r in range(3, _OUT_ROWS):
        mo_ref[r : r + 1, :] = jnp.zeros((1, L), jnp.int32)
    gpad = zs_ref.shape[0]
    for g in range(group, gpad):
        zs_ref[g : g + 1, :] = jnp.zeros((1, L), jnp.uint32)


def _lane_tile(L: int) -> int:
    for lt in (2048, 1024, 512, 256, 128):
        if L % lt == 0:
            return lt
    return L


@functools.partial(
    jax.jit, static_argnames=("group", "align_words", "interpret")
)
def rice_group_step(
    rows_t, woff, sh, k, err, is_rice, jj, n_rel, is_first, pbits, psm,
    *, group: int, align_words: int, interpret: bool = False,
):
    """Decode one scan step's code group for all lanes on the VPU.

    Args:
        rows_t: (w_rows, L) uint32 -- gathered rows, words on sublanes.
            w_rows must be a multiple of 8; L a multiple of 128 (callers
            pad lanes with is_rice=False, which decode to z=0 / adv=0).
        woff/sh: (L,) int32 -- word offset of cpos within the rows and
            cpos & 31 (the realign parameters).
        k/err/is_rice/jj/n_rel/is_first/pbits/psm: (L,) per-lane carry and
            constants (see _rice_scan_kernel).
    Returns:
        zs (group, L) uint32, adv (L,) int32, k' (L,) int32, err' (L,) bool.
    """
    w_rows, L0 = rows_t.shape
    assert w_rows % 8 == 0, w_rows
    is_first = jnp.broadcast_to(is_first, (L0,))
    L = -(-L0 // 128) * 128
    if L != L0:
        # pad lanes to the 128-lane tile; padded lanes carry is_rice=False
        # so they decode to z=0 / adv=0 and never flag err
        pad = L - L0
        rows_t = jnp.pad(rows_t, ((0, 0), (0, pad)))
        woff, sh, k, jj, n_rel, pbits, psm = (
            jnp.pad(v, (0, pad)) for v in (woff, sh, k, jj, n_rel, pbits, psm)
        )
        err, is_rice, is_first = (
            jnp.pad(v, (0, pad), constant_values=False)
            for v in (err, is_rice, is_first)
        )
    gpad = -(-group // 8) * 8
    meta = jnp.zeros((_META_ROWS, L), jnp.int32)
    rows = [woff, sh, k, jnp.where(err, 1, 0), jnp.where(is_rice, 1, 0),
            jj, n_rel, jnp.where(is_first, 1, 0), pbits, psm]
    meta = meta.at[: len(rows), :].set(jnp.stack(rows).astype(jnp.int32))
    lt = _lane_tile(L)
    grid = (L // lt,)
    zs, mo = pl.pallas_call(
        functools.partial(_rice_scan_kernel, group, align_words, w_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((w_rows, lt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_META_ROWS, lt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((gpad, lt), lambda i: (0, i)),
            pl.BlockSpec((_OUT_ROWS, lt), lambda i: (0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((gpad, L), jnp.uint32),
            jax.ShapeDtypeStruct((_OUT_ROWS, L), jnp.int32),
        ),
        interpret=interpret,
    )(rows_t, meta)
    return zs[:group, :L0], mo[0, :L0], mo[1, :L0], mo[2, :L0] != 0
