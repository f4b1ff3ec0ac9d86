"""Raster dtype <-> PCM sample mapping.

Two families of mappings:

* **minmax** -- bit-for-bit the reference's semantics
  (``normalization.py:126-253``): map data through [-1, 1] to +/-32767
  (16-bit) or +/-8388607 ("24-bit", stored as 32 bps exactly like pyflac
  does -- SURVEY.md Q2), truncating cast, NaN->0, zero-range guard.  Kept for
  interop with reference-produced files and to reproduce its CLI behavior.

* **lossless** (this framework's default) -- exact bijections per dtype, the
  "consciously fix" path of SURVEY.md Q1:
    - uint8/int8/uint16/int16 -> signed-shift to 16-bit PCM (exact)
    - uint32/int32            -> signed-shift to 32-bit PCM (exact)
    - float32                 -> order-preserving bit map to int32 (exact,
      NaN payloads preserved; monotone so smooth data stays predictable)
    - float64                 -> order-preserving bit map to int64, split
      hi/lo into TWO int32 channels per band (exact)

Everything is pure elementwise math on arrays -- on device these fuse into
the encode kernel; this module is the numpy reference used by the host path
and by tests.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Tuple

import numpy as np

logger = logging.getLogger("flac_raster_tpu.normalization")

__all__ = [
    "NormalizationParams",
    "calculate_audio_params",
    "normalize_to_audio",
    "denormalize_from_audio",
    "estimate_precision_loss",
    "normalize_lossless",
    "denormalize_lossless",
    "MODE_MINMAX",
    "MODE_SHIFT",
    "MODE_FLOAT32_BITS",
    "MODE_FLOAT64_BITS",
]

MODE_MINMAX = "minmax"
MODE_SHIFT = "shift"
MODE_FLOAT32_BITS = "float32_bits"
MODE_FLOAT64_BITS = "float64_bits"


@dataclass
class NormalizationParams:
    """Parameters for reversible normalization.

    Field set is a superset of the reference's dataclass
    (``normalization.py:27-56``) so its JSON round-trips; ``mode`` /
    ``zero_point`` / ``channels_per_band`` are this framework's additions
    (absent for reference-produced files, which default to minmax).
    """

    data_min: float
    data_max: float
    original_dtype: str
    bits_per_sample: int
    scale_factor: int
    mode: str = MODE_MINMAX
    zero_point: int = 0
    channels_per_band: int = 1

    def to_dict(self) -> dict:
        return {
            "data_min": self.data_min,
            "data_max": self.data_max,
            "original_dtype": self.original_dtype,
            "bits_per_sample": self.bits_per_sample,
            "scale_factor": self.scale_factor,
            "mode": self.mode,
            "zero_point": self.zero_point,
            "channels_per_band": self.channels_per_band,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "NormalizationParams":
        return cls(
            data_min=d["data_min"],
            data_max=d["data_max"],
            original_dtype=d["original_dtype"],
            bits_per_sample=d["bits_per_sample"],
            scale_factor=d.get("scale_factor", 32767),
            mode=d.get("mode", MODE_MINMAX),
            zero_point=d.get("zero_point", 0),
            channels_per_band=d.get("channels_per_band", 1),
        )


def calculate_audio_params(data: np.ndarray, dtype: np.dtype) -> Tuple[int, int]:
    """(sample_rate, bits_per_sample) -- reference-compatible tiers
    (``normalization.py:78-123``): bit depth by dtype class, cosmetic sample
    rate by pixel count."""
    dtype = np.dtype(dtype)
    if dtype in (np.uint8, np.int8, np.uint16, np.int16):
        bits_per_sample = 16
    else:
        bits_per_sample = 24

    if data.ndim >= 2:
        total_pixels = data.shape[-2] * data.shape[-1]
    else:
        total_pixels = data.size
    if total_pixels < 1_000_000:
        sample_rate = 44100
    elif total_pixels < 10_000_000:
        sample_rate = 48000
    elif total_pixels < 100_000_000:
        sample_rate = 96000
    else:
        sample_rate = 192000
    return sample_rate, bits_per_sample


def normalize_to_audio(
    data: np.ndarray,
    bits_per_sample: int,
    data_min: float | None = None,
    data_max: float | None = None,
) -> Tuple[np.ndarray, NormalizationParams]:
    """Reference-exact minmax normalization (``normalization.py:126-202``):
    data -> [-1,1] -> truncated ints at +/-scale_factor."""
    original_dtype = str(data.dtype)
    if data_min is None:
        data_min = float(np.nanmin(data))
    if data_max is None:
        data_max = float(np.nanmax(data))
    if data_max <= data_min:
        logger.warning("data has no range (min=%s max=%s)", data_min, data_max)
        data_range = 1.0
    else:
        data_range = data_max - data_min

    norm = 2.0 * (data.astype(np.float64) - data_min) / data_range - 1.0
    norm = np.clip(norm, -1.0, 1.0)
    nan_mask = np.isnan(norm)
    if nan_mask.any():
        logger.warning("found %d NaN values, replacing with 0", int(nan_mask.sum()))
        norm[nan_mask] = 0.0

    if bits_per_sample == 16:
        scale_factor = 32767
        audio = (norm * scale_factor).astype(np.int16)
    elif bits_per_sample == 24:
        scale_factor = 8388607
        audio = (norm * scale_factor).astype(np.int32)
    else:
        scale_factor = 2147483647
        audio = (norm * scale_factor).astype(np.int32)

    params = NormalizationParams(
        data_min=data_min,
        data_max=data_max,
        original_dtype=original_dtype,
        bits_per_sample=bits_per_sample,
        scale_factor=scale_factor,
        mode=MODE_MINMAX,
    )
    return audio, params


def denormalize_from_audio(
    audio_data: np.ndarray,
    params: NormalizationParams,
    soundfile_compat: bool = False,
) -> np.ndarray:
    """Invert minmax normalization.

    ``soundfile_compat=True`` reproduces the reference's decode byte-for-byte
    (its decoder receives floats scaled by 2^(bps-1) from libsndfile and
    divides by 1.0 -- ``normalization.py:228-230`` + SURVEY.md Q1), which is
    the right mode when reading files the *reference* wrote.  The default
    uses the true encode-time scale factor (exact inverse of our own
    minmax-mode files).
    """
    if np.issubdtype(audio_data.dtype, np.floating):
        scale_factor = 1.0
    elif soundfile_compat:
        scale_factor = 32768.0 if audio_data.dtype == np.int16 else 2147483648.0
        if audio_data.dtype == np.int32 and params.scale_factor == 8388607:
            # reference "24-bit" path: ints are +/-8388607 but libsndfile
            # scales by 2^31; mirror that quirk only in compat mode
            scale_factor = 2147483648.0
    elif audio_data.dtype == np.int16:
        scale_factor = 32767.0
    else:
        scale_factor = float(params.scale_factor)

    norm = audio_data.astype(np.float64) / scale_factor
    data_range = params.data_max - params.data_min
    out = (norm + 1.0) / 2.0 * data_range + params.data_min
    original_dtype = np.dtype(params.original_dtype)
    if np.issubdtype(original_dtype, np.integer):
        return np.round(out).astype(original_dtype)
    return out.astype(original_dtype)


def estimate_precision_loss(
    original_dtype: np.dtype,
    data_min: float,
    data_max: float,
    bits_per_sample: int,
) -> dict:
    """Quantization-error estimate, reference-compatible
    (``normalization.py:256-303``).  Note: the lossless modes below have zero
    error by construction; this applies to minmax mode only."""
    dtype = np.dtype(original_dtype)
    data_range = data_max - data_min
    if bits_per_sample == 16:
        levels = 65534
    elif bits_per_sample == 24:
        levels = 16777214
    else:
        levels = 4294967294
    max_error = data_range / levels
    rel = (max_error / data_range) * 100 if data_range > 0 else 0.0
    is_lossless = False
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        is_lossless = (info.max - info.min) <= levels
    return {
        "max_absolute_error": max_error,
        "relative_error_percent": rel,
        "quantization_levels": levels,
        "is_lossless": is_lossless,
        "bits_per_sample": bits_per_sample,
    }


# ---------------------------------------------------------------------------
# Exact lossless modes
# ---------------------------------------------------------------------------

_SHIFT_SPECS = {
    np.dtype(np.uint8): (16, 1 << 7),
    np.dtype(np.int8): (16, 0),
    np.dtype(np.uint16): (16, 1 << 15),
    np.dtype(np.int16): (16, 0),
    np.dtype(np.uint32): (32, 1 << 31),
    np.dtype(np.int32): (32, 0),
}


def _float_bits_fold(u: np.ndarray, sign_shift: int) -> np.ndarray:
    """Order-preserving involution on float bit patterns (sign-magnitude ->
    two's-complement-ish).  Applying it twice is the identity."""
    sign = (u >> np.uint64(sign_shift)).astype(bool) if u.dtype == np.uint64 else (
        (u >> np.uint32(sign_shift)).astype(bool)
    )
    flip = np.array((1 << sign_shift) - 1, dtype=u.dtype)
    return np.where(sign, u ^ flip, u)


def normalize_lossless(
    data: np.ndarray,
) -> Tuple[np.ndarray, NormalizationParams]:
    """Exact dtype -> PCM mapping.  Input shape (..., bands) interleaved or
    any shape for single band; output has the same leading shape with the
    channel axis possibly doubled (float64).

    Returns int16-compatible or int32 samples (as int32) plus params.
    """
    dt = np.dtype(data.dtype)
    stats_min = float(np.nanmin(data)) if data.size else 0.0
    stats_max = float(np.nanmax(data)) if data.size else 0.0

    if dt in _SHIFT_SPECS:
        bps, zero = _SHIFT_SPECS[dt]
        audio = (data.astype(np.int64) - zero).astype(np.int32)
        params = NormalizationParams(
            data_min=stats_min, data_max=stats_max, original_dtype=str(dt),
            bits_per_sample=bps, scale_factor=1, mode=MODE_SHIFT, zero_point=zero,
        )
        return audio, params

    if dt == np.float32:
        u = data.view(np.uint32)
        folded = _float_bits_fold(u, 31)
        audio = folded.view(np.int32)
        params = NormalizationParams(
            data_min=stats_min, data_max=stats_max, original_dtype="float32",
            bits_per_sample=32, scale_factor=1, mode=MODE_FLOAT32_BITS,
        )
        return audio, params

    if dt == np.float64:
        u = data.view(np.uint64)
        folded = _float_bits_fold(u, 63)
        hi = ((folded >> np.uint64(32)).astype(np.uint32) ^ np.uint32(1 << 31)).view(np.int32)
        lo = (folded.astype(np.uint32) ^ np.uint32(1 << 31)).view(np.int32)
        audio = np.stack([hi, lo], axis=-1).reshape(*data.shape[:-1], -1) if data.ndim > 1 else np.stack([hi, lo], axis=-1)
        params = NormalizationParams(
            data_min=stats_min, data_max=stats_max, original_dtype="float64",
            bits_per_sample=32, scale_factor=1, mode=MODE_FLOAT64_BITS,
            channels_per_band=2,
        )
        return audio, params

    raise ValueError(f"unsupported dtype for lossless normalization: {dt}")


def denormalize_lossless(audio: np.ndarray, params: NormalizationParams) -> np.ndarray:
    """Exact inverse of ``normalize_lossless``."""
    dt = np.dtype(params.original_dtype)
    if params.mode == MODE_SHIFT:
        return (audio.astype(np.int64) + params.zero_point).astype(dt)
    if params.mode == MODE_FLOAT32_BITS:
        u = audio.astype(np.int32).view(np.uint32)
        return _float_bits_fold(u, 31).view(np.float32)
    if params.mode == MODE_FLOAT64_BITS:
        pairs = audio.reshape(*audio.shape[:-1], -1, 2)
        hi = (pairs[..., 0].astype(np.int32).view(np.uint32) ^ np.uint32(1 << 31)).astype(np.uint64)
        lo = (pairs[..., 1].astype(np.int32).view(np.uint32) ^ np.uint32(1 << 31)).astype(np.uint64)
        folded = (hi << np.uint64(32)) | lo
        return _float_bits_fold(folded, 63).view(np.float64)
    raise ValueError(f"not a lossless mode: {params.mode}")
