"""Rice (exp-Golomb) residual coding: zigzag map, parameter search, and a
fully vectorized decoder.

FLAC residual coding (what libFLAC does inside ``FLAC__stream_encoder``,
SURVEY.md §2.2): residuals are zigzag-folded to unsigned, then each value is
written as ``q`` zero bits, a one bit, and the low ``k`` bits, where
``q = z >> k``.  A partition's parameter ``k`` is chosen to minimize total
bits; a 5-bit "escape" writes the partition verbatim.

Decoding a Rice stream looks inherently serial (each code's start depends on
the previous code's length), but it parallelizes: the positions of 1-bits are
the only candidate terminators, and after a terminator exactly ``k`` payload
bits are skipped.  So the terminator chain is

    j_{i+1} = first one-bit index past (ones[j_i] + k)

which is a pointer-jump chain over the sorted one-positions.  With binary
lifting (log2(n) gather passes) the whole chain -- hence every quotient and
remainder -- is recovered with O(n log n) vectorized work and no sequential
scan.  A partition of n codes with parameter k contains at most n*(k+1)
one-bits, which bounds the jump-table window, keeping per-partition work
linear in its bit length.  The same algorithm drives the device decoder.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "zigzag",
    "unzigzag",
    "best_rice_param",
    "encode_rice_tokens",
    "decode_rice_vectorized",
]

MAX_RICE_PARAM_4 = 14  # 4-bit parameter codes 0..14, 15 = escape
MAX_RICE_PARAM_5 = 30  # 5-bit parameter codes 0..30, 31 = escape


def zigzag(res: np.ndarray) -> np.ndarray:
    """Fold signed residuals to unsigned: 0,-1,1,-2,2.. -> 0,1,2,3,4..."""
    res = res.astype(np.int64, copy=False)
    return ((res << 1) ^ (res >> 63)).astype(np.uint64)


def unzigzag(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64, copy=False)
    return ((z >> np.uint64(1)).astype(np.int64)) ^ -(z & np.uint64(1)).astype(np.int64)


def best_rice_param(z: np.ndarray, max_param: int = MAX_RICE_PARAM_4) -> tuple[int, int]:
    """Exact best k for one partition. Returns (k, total_bits)."""
    z = z.astype(np.uint64, copy=False)
    n = z.size
    best_k, best_bits = 0, None
    for k in range(max_param + 1):
        bits = n * (k + 1) + int((z >> np.uint64(k)).sum())
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k, int(best_bits)


def encode_rice_tokens(z: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Token stream (values, lengths) for a partition: one token per sample.

    Token = unary quotient (q zeros + terminating 1) followed by the k low
    bits, i.e. value ``(1 << k) | (z & (2^k - 1))`` with length ``q + 1 + k``.
    The encoder guarantees q + 1 + k <= 64 by escaping partitions that would
    produce longer codes (codec/encoder.py).
    """
    z = z.astype(np.uint64, copy=False)
    k64 = np.uint64(k)
    q = z >> k64
    rem = z & ((np.uint64(1) << k64) - np.uint64(1)) if k else np.zeros_like(z)
    values = (np.uint64(1) << k64) | rem
    lengths = q.astype(np.int64) + 1 + k
    return values, lengths


def decode_rice_vectorized(
    bits: np.ndarray,
    start_bit: int,
    n: int,
    k: int,
    ones: np.ndarray | None = None,
) -> tuple[np.ndarray, int]:
    """Decode ``n`` Rice(k) codes from ``bits`` starting at ``start_bit``.

    Args:
        bits: uint8 0/1 array (MSB-first unpacked stream bytes).
        start_bit: absolute bit offset of the first code.
        n: number of codes.
        k: Rice parameter.
        ones: optional precomputed sorted positions of all 1-bits in ``bits``
            (pass this when decoding many partitions of the same stream).

    Returns:
        (signed residuals int64 array, bit offset one past the last code)
    """
    if n == 0:
        return np.zeros(0, dtype=np.int64), start_bit
    if ones is None:
        ones = np.flatnonzero(bits).astype(np.int64)
    lo = int(np.searchsorted(ones, start_bit, side="left"))
    # A partition holds exactly n terminators plus at most n*k remainder
    # one-bits, so this window always covers the whole partition.
    hi = min(lo + n * (k + 1) + 1, ones.size)
    window = ones[lo:hi]
    if window.size < n:
        raise ValueError("corrupt Rice stream: not enough terminator bits")

    m = window.size
    # jump[j]: index of the first one-bit strictly past window[j] + k
    jump = np.searchsorted(window, window + np.int64(k) + 1, side="left").astype(np.int64)
    levels = max(1, (n - 1).bit_length()) if n > 1 else 0
    out = np.zeros(n, dtype=np.int64)  # chain starts at window[0] (== first one >= start)
    steps = np.arange(n, dtype=np.int64)
    cur_jump = jump
    for lvl in range(levels):
        take = ((steps >> lvl) & 1).astype(bool)
        if take.any():
            idx = np.minimum(out[take], m - 1)
            out[take] = cur_jump[idx]
        if lvl + 1 < levels:
            cur_jump = cur_jump[np.minimum(cur_jump, m - 1)]
    if int(out.max()) >= m:
        raise ValueError("corrupt Rice stream: terminator chain ran off the window")

    term = window[out]  # absolute terminator bit positions
    prev_end = np.empty(n, dtype=np.int64)
    prev_end[0] = start_bit
    prev_end[1:] = term[:-1] + 1 + k
    q = term - prev_end
    if (q < 0).any():
        raise ValueError("corrupt Rice stream: negative quotient")
    if k:
        from .bitpack import read_kbits_at

        rem = read_kbits_at(bits, term + 1, k)
    else:
        rem = np.zeros(n, dtype=np.int64)
    z = (q.astype(np.uint64) << np.uint64(k)) | rem.astype(np.uint64)
    end_bit = int(term[-1]) + 1 + k
    return unzigzag(z), end_bit
