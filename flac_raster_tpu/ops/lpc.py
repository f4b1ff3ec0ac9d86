"""Linear-predictive coding: windowed autocorrelation, Levinson-Durbin,
coefficient quantization, exact integer residuals, and batched restore.

Matches the behavioral contract of libFLAC's LPC stage at compression level 5
(tukey(0.5) apodization, max order 8, qlp precision 15 -- reference
``docs/sonos-pyflac.txt:6932``, SURVEY.md §7 step 4) without copying its
implementation.  Coefficient *quality* only affects compression ratio;
round-trip exactness is guaranteed by the integer residual/restore pair, so
the device path is free to use float32 autocorrelation.

Restore is the only sequentially-dependent computation in FLAC decode (an
integer IIR with a truncating shift).  It is batched across subframes: one
Python-level loop over sample index, vectorized over all subframes of the
stream -- the same shape used by the lax.scan device implementation.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "tukey_window",
    "autocorrelation",
    "levinson_durbin",
    "quantize_lpc_coeffs",
    "lpc_residual",
    "lpc_restore_batch",
]

MAX_QLP_PRECISION = 15
MAX_QLP_SHIFT = 15  # 5-bit signed shift field, libFLAC never uses negatives


def tukey_window(n: int, alpha: float = 0.5) -> np.ndarray:
    """Tukey (tapered cosine) window, libFLAC level-5's apodization."""
    if n == 1:
        return np.ones(1)
    t = np.linspace(0.0, 1.0, n)
    w = np.ones(n)
    edge = alpha / 2.0
    lo = t < edge
    hi = t >= 1.0 - edge
    w[lo] = 0.5 * (1.0 + np.cos(np.pi * (2.0 * t[lo] / alpha - 1.0)))
    w[hi] = 0.5 * (1.0 + np.cos(np.pi * (2.0 * t[hi] / alpha - 2.0 / alpha + 1.0)))
    return w


def autocorrelation(x: np.ndarray, max_lag: int, window: np.ndarray | None = None) -> np.ndarray:
    """Autocorrelation r[0..max_lag] of the (windowed) signal, float64."""
    xf = x.astype(np.float64, copy=False)
    if window is not None:
        xf = xf * window
    n = xf.size
    r = np.empty(max_lag + 1)
    for lag in range(max_lag + 1):
        r[lag] = np.dot(xf[: n - lag], xf[lag:]) if lag < n else 0.0
    return r


def levinson_durbin(r: np.ndarray, order: int) -> tuple[np.ndarray, float]:
    """Solve the Toeplitz normal equations; returns (lpc coeffs, pred error)."""
    err = float(r[0])
    if err <= 0.0:
        return np.zeros(order), 0.0
    a = np.zeros(0)
    for i in range(order):
        acc = r[i + 1] - (np.dot(a, r[i:0:-1]) if i else 0.0)
        k = acc / err
        a = np.append(a - k * a[::-1], k)
        err *= 1.0 - k * k
        if err <= 0.0:
            a = np.append(a, np.zeros(order - i - 1))
            break
    return a, err


def quantize_lpc_coeffs(
    coeffs: np.ndarray, precision: int = MAX_QLP_PRECISION
) -> tuple[np.ndarray, int]:
    """Quantize float LPC coefficients to integers with a common shift.

    Returns (int32 coeffs, shift) with each |qcoeff| < 2^(precision-1) and
    0 <= shift <= 15.  Uses error-feedback rounding so quantization noise
    does not accumulate across taps.
    """
    cmax = float(np.max(np.abs(coeffs))) if coeffs.size else 0.0
    if cmax <= 0.0:
        return np.zeros(coeffs.size, dtype=np.int32), 0
    headroom = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(MAX_QLP_SHIFT, headroom))
    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))
    q = np.empty(coeffs.size, dtype=np.int32)
    err = 0.0
    scale = float(1 << shift)
    for i, c in enumerate(coeffs):
        val = c * scale + err
        qi = int(np.clip(round(val), qmin, qmax))
        err = val - qi
        q[i] = qi
    return q, shift


def lpc_residual(x: np.ndarray, qcoeffs: np.ndarray, shift: int) -> np.ndarray:
    """Exact integer LPC residual: r[i] = x[i] - ((sum_j c_j * x[i-1-j]) >> shift).

    The arithmetic shift (floor) matches the FLAC spec; all accumulation is
    int64 (32-bit samples x 15-bit coeffs x order 32 stays within range).
    """
    x = x.astype(np.int64, copy=False)
    order = qcoeffs.size
    n = x.size
    if n <= order:
        return np.zeros(0, dtype=np.int64)
    acc = np.zeros(n - order, dtype=np.int64)
    for j, c in enumerate(qcoeffs.astype(np.int64)):
        acc += c * x[order - 1 - j : n - 1 - j]
    pred = acc >> np.int64(shift)
    return x[order:] - pred


def lpc_restore_batch(
    warmups: np.ndarray,
    residuals: np.ndarray,
    qcoeffs: np.ndarray,
    shifts: np.ndarray,
    lengths: np.ndarray,
) -> np.ndarray:
    """Restore many LPC subframes at once.

    Args:
        warmups: (b, order) int64 -- first ``order`` samples of each subframe.
        residuals: (b, max_len - order) int64, right-padded with zeros.
        qcoeffs: (b, order) int64 quantized coefficients.
        shifts: (b,) int64.
        lengths: (b,) actual subframe lengths (padding region is garbage).

    Returns:
        (b, max_len) int64 signals.
    """
    b, order = warmups.shape
    max_res = residuals.shape[1]
    n = order + max_res
    x = np.zeros((b, n), dtype=np.int64)
    x[:, :order] = warmups
    c = qcoeffs.astype(np.int64)
    sh = shifts.astype(np.int64)[:, None]
    for i in range(order, n):
        hist = x[:, i - order : i][:, ::-1]  # x[i-1], x[i-2], ...
        pred = np.sum(c * hist, axis=1, keepdims=True) >> sh
        x[:, i] = residuals[:, i - order] + pred[:, 0]
    return x
