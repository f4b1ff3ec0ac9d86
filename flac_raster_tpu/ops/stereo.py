"""Inter-channel (stereo) decorrelation for 2-channel streams.

libFLAC's ``-m`` mode (on at levels 1-2 and 4-8, reference preset table
``docs/sonos-pyflac.txt:6910-6937``) plans all four FLAC channel
assignments per frame -- independent L/R, left/side, right/side, mid/side
-- and keeps the cheapest by exact bit count.  Raster workloads hit this
through correlated band pairs and through the float64 bit-split mode,
which always produces 2-channel streams.

The transform set (FLAC spec):
    mid  = (L + R) >> 1          (floor; the dropped LSB rides in side)
    side = L - R                 (one extra bit of range: bps+1)

This module hosts the assignment tables and the numpy variant builder /
plan selector shared by the host encoders; the device emitter
(ops/device_emit) implements the identical selection with jnp gathers.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "CHAN_CODES",
    "SLOT0_VARIANT",
    "SLOT1_VARIANT",
    "build_variants",
    "assignment_totals",
    "select_plans",
    "midside_ok",
]

# variant index: 0=L 1=R 2=M 3=S
# assignment index: 0=LR 1=LS 2=RS 3=MS
CHAN_CODES = np.array([1, 8, 9, 10], np.int64)
SLOT0_VARIANT = np.array([0, 0, 3, 2], np.int64)  # L, L, S, M
SLOT1_VARIANT = np.array([1, 3, 1, 3], np.int64)  # R, S, R, S


def midside_ok(channels: int, bps: int, mid_side: bool, device: bool = False) -> bool:
    """Whether mid-side search applies: 2 channels and a side channel
    (bps+1) the target pipeline can carry -- <= 32 on host (every emitted
    token stays within one uint32+carry), <= MAX_DEVICE_BPS on device."""
    if channels != 2 or not mid_side:
        return False
    if device:
        from .device_codec import MAX_DEVICE_BPS

        return bps + 1 <= MAX_DEVICE_BPS
    return bps + 1 <= 32


def build_variants(frames_lr: np.ndarray) -> np.ndarray:
    """(F, 2, N) int64 L/R frames -> (F, 4, N) int64 [L, R, mid, side]."""
    L = frames_lr[:, 0]
    R = frames_lr[:, 1]
    return np.stack([L, R, (L + R) >> 1, L - R], axis=1)


def assignment_totals(bits4: np.ndarray) -> np.ndarray:
    """(F, 4) per-variant subframe bits -> (F, 4) per-assignment totals."""
    bL, bR, bM, bS = bits4[:, 0], bits4[:, 1], bits4[:, 2], bits4[:, 3]
    return np.stack([bL + bR, bL + bS, bS + bR, bM + bS], axis=1)


def select_plans(
    plan4: dict, variants: np.ndarray, bps: int
) -> tuple[dict, np.ndarray, np.ndarray, np.ndarray]:
    """Pick the cheapest assignment per frame and gather slot plans.

    Args:
        plan4: planner output with leading dim F*4 reshaped to (F, 4, ...).
        variants: (F, 4, N) int64 candidate channel signals.
        bps: nominal stream bit depth.
    Returns:
        (plan_fc with (F, 2, ...) leading dims, x_sel (F, 2, N),
         chan_code (F,), ch_bps (F, 2))
    """
    bits4 = plan4["subframe_bits"].reshape(variants.shape[0], 4)
    a = assignment_totals(bits4).argmin(axis=1)  # (F,)
    s0 = SLOT0_VARIANT[a]
    s1 = SLOT1_VARIANT[a]
    F = variants.shape[0]
    rows = np.arange(F)
    plan_fc = {}
    for key, val in plan4.items():
        v = np.asarray(val).reshape((F, 4) + np.asarray(val).shape[1:])
        plan_fc[key] = np.stack([v[rows, s0], v[rows, s1]], axis=1)
    x_sel = np.stack([variants[rows, s0], variants[rows, s1]], axis=1)
    chan_code = CHAN_CODES[a]
    ch_bps = np.stack([bps + (s0 == 3), bps + (s1 == 3)], axis=1).astype(np.int64)
    return plan_fc, x_sel, chan_code, ch_bps
