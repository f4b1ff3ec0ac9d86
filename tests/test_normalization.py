"""Property tests per dtype -- the unit coverage the reference lacks for its
codec math (SURVEY.md §4)."""

import numpy as np
import pytest

from flac_raster_tpu.ops.normalization import (
    NormalizationParams,
    calculate_audio_params,
    denormalize_from_audio,
    denormalize_lossless,
    estimate_precision_loss,
    normalize_lossless,
    normalize_to_audio,
)

ALL_DTYPES = [np.uint8, np.int8, np.uint16, np.int16, np.uint32, np.int32,
              np.float32, np.float64]


def _full_range_sample(dtype, rng, n=2000):
    if np.issubdtype(dtype, np.floating):
        vals = rng.normal(0, 1e6, n).astype(dtype)
        vals[:8] = [0.0, -0.0, np.nan, np.inf, -np.inf, 1e-30, -1.5, 2.25]
        return vals
    info = np.iinfo(dtype)
    vals = rng.integers(info.min, info.max, n, endpoint=True).astype(dtype)
    vals[0], vals[1] = info.min, info.max  # extremes always present
    return vals


@pytest.mark.parametrize("dtype", ALL_DTYPES)
def test_lossless_bitexact_roundtrip(dtype, rng):
    """The Q1 fix: EVERY dtype round-trips bit-exactly, including full-range
    ints and float NaN payloads -- cases where the reference is lossy."""
    data = _full_range_sample(dtype, rng).reshape(-1, 2)
    audio, params = normalize_lossless(data)
    assert audio.dtype == np.int32
    back = denormalize_lossless(audio, params)
    assert back.dtype == data.dtype
    assert np.array_equal(back.view(np.uint8), data.view(np.uint8))  # incl. NaN bits


def test_lossless_16bit_fits_bps(rng):
    data = _full_range_sample(np.uint16, rng)
    audio, params = normalize_lossless(data)
    assert params.bits_per_sample == 16
    assert audio.min() >= -32768 and audio.max() <= 32767


def test_lossless_float64_doubles_channels(rng):
    data = rng.normal(0, 1, (100, 3)).astype(np.float64)
    audio, params = normalize_lossless(data)
    assert params.channels_per_band == 2
    assert audio.shape == (100, 6)


def test_minmax_reference_semantics(rng):
    """Truncating cast, +/-32767 scaling -- exact parity with reference
    normalization.py:126-202."""
    x = rng.integers(-500, 12000, (5000,)).astype(np.int16)
    audio, p = normalize_to_audio(x, 16)
    dmin, dmax = float(x.min()), float(x.max())
    expect = ((2.0 * (x.astype(np.float64) - dmin) / (dmax - dmin) - 1.0) * 32767).astype(np.int16)
    assert np.array_equal(audio, expect)
    assert p.scale_factor == 32767 and p.mode == "minmax"


def test_minmax_zero_range_guard():
    x = np.full(100, 7, dtype=np.int16)
    audio, p = normalize_to_audio(x, 16)
    assert (audio == -32767).all()  # 2*(x-min)/1 - 1 == -1
    back = denormalize_from_audio(audio, p)
    assert np.array_equal(back, x)


def test_minmax_nan_replacement():
    x = np.array([1.0, np.nan, 3.0])
    audio, p = normalize_to_audio(x, 16)
    assert audio[1] == 0  # NaN -> center


def test_minmax_exact_inverse_roundtrip(rng):
    x = rng.integers(0, 255, 4000).astype(np.uint8)
    audio, p = normalize_to_audio(x, 16)
    assert np.array_equal(denormalize_from_audio(audio, p), x)


def test_soundfile_compat_matches_reference_decode_math(rng):
    """Reading reference-produced streams must reproduce ITS decode output
    (int16/2^15 float semantics), not our exact inverse."""
    x = rng.integers(0, 3000, 1000).astype(np.uint16)
    audio, p = normalize_to_audio(x, 16)
    got = denormalize_from_audio(audio, p, soundfile_compat=True)
    rng_ = float(p.data_max - p.data_min)
    expect = np.round(
        ((audio.astype(np.float64) / 32768.0) + 1) / 2 * rng_ + p.data_min
    ).astype(np.uint16)
    assert np.array_equal(got, expect)


def test_calculate_audio_params_tiers():
    small = np.zeros((100, 100), np.int16)
    assert calculate_audio_params(small, np.int16) == (44100, 16)
    assert calculate_audio_params(small, np.uint8)[1] == 16
    assert calculate_audio_params(small, np.float32)[1] == 24
    big = np.zeros((1, 4000, 4000), np.uint16)  # 16 MP
    assert calculate_audio_params(big, np.uint16)[0] == 96000


def test_estimate_precision_loss_parity():
    r = estimate_precision_loss(np.uint8, 0.0, 255.0, 16)
    assert r["is_lossless"] is True
    assert r["quantization_levels"] == 65534
    r = estimate_precision_loss(np.uint32, 0.0, 1e9, 24)
    assert r["is_lossless"] is False


def test_params_dict_roundtrip():
    p = NormalizationParams(0.0, 10.0, "uint16", 16, 1, mode="shift", zero_point=32768)
    q = NormalizationParams.from_dict(p.to_dict())
    assert q == p
    # reference-style dict (no mode keys) defaults to minmax
    legacy = NormalizationParams.from_dict(
        {"data_min": 0, "data_max": 1, "original_dtype": "int16", "bits_per_sample": 16}
    )
    assert legacy.mode == "minmax" and legacy.scale_factor == 32767
