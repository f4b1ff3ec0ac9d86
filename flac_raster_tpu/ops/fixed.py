"""Fixed polynomial predictors (FLAC orders 0-4): residual + exact inverse.

The fixed order-d residual is the d-th finite difference of the signal;
restoring is d nested integrations (cumulative sums) seeded from the warmup
samples' difference pyramid -- O(d * n) vectorized work with no sequential
scan, unlike libFLAC's per-sample loop (SURVEY.md §2.2).
All math is int64: differences of 32-bit samples at order 4 need up to 37
bits, and 4096-term cumsums add at most 12 more.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fixed_residual", "fixed_restore", "FIXED_COEFFS"]

# Prediction coefficients (applied to x[i-1], x[i-2], ...) per order.
FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    """Residual r[i] = Delta^order x[i] for i >= order (length n - order)."""
    r = x.astype(np.int64, copy=False)
    for _ in range(order):
        r = np.diff(r)
    return r


def fixed_restore(warmup: np.ndarray, residual: np.ndarray, order: int) -> np.ndarray:
    """Invert ``fixed_residual``: reconstruct the full signal (int64).

    Args:
        warmup: the first ``order`` samples (verbatim from the subframe).
        residual: Delta^order x for indices order..n-1.
        order: 0..4.
    """
    warmup = warmup.astype(np.int64, copy=False)
    if order == 0:
        return residual.astype(np.int64, copy=False)
    # Difference pyramid of the warmup: pyr[d] = Delta^d warmup
    pyr = [warmup]
    for _ in range(order - 1):
        pyr.append(np.diff(pyr[-1]))
    # Integrate from Delta^order down to Delta^0, seeding each level with the
    # last known value of that level from the warmup pyramid.
    cur = residual.astype(np.int64, copy=False)
    for d in range(order - 1, -1, -1):
        seed = pyr[d][-1]
        cur = seed + np.cumsum(cur)
    return np.concatenate([warmup, cur])
