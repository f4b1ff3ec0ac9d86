"""Codec round-trip tests.

Mirrors the reference's real correctness gate (CLI round-trips in CI,
reference ``.github/workflows/ci.yml:46-56``) but at the codec layer, plus
what the reference lacks per SURVEY.md §4: property tests per dtype and
cross-validation against libFLAC-produced files.
"""

import numpy as np
import pytest

from flac_raster_tpu.codec.decoder import decode_flac, md5_of_samples
from flac_raster_tpu.codec.encoder import encode_flac
from flac_raster_tpu.ops.fixed import fixed_residual, fixed_restore
from flac_raster_tpu.ops.lpc import (
    levinson_durbin,
    lpc_residual,
    lpc_restore_batch,
    quantize_lpc_coeffs,
    tukey_window,
    autocorrelation,
)


def _roundtrip(audio, bps, level=5, **kw):
    blob = encode_flac(audio, 44100, bps, compression_level=level, **kw)
    dec = decode_flac(blob, verify_crc=True, verify_md5=True)
    assert np.array_equal(dec.samples.astype(np.int64), np.atleast_2d(audio.T).T.astype(np.int64))
    return blob, dec


def test_roundtrip_smooth_int16(rng):
    t = np.arange(20000)
    x = (3000 * np.sin(t / 50) + rng.normal(0, 30, t.size)).astype(np.int32)[:, None]
    blob, _ = _roundtrip(x, 16)
    assert len(blob) < x.size * 2  # actually compresses smooth data


def test_roundtrip_multichannel(rng):
    x = rng.integers(-2000, 2000, (10000, 6)).astype(np.int32)
    _roundtrip(x, 16)


def test_roundtrip_8_channels(rng):
    x = rng.integers(-100, 100, (5000, 8)).astype(np.int32)
    _roundtrip(x, 16)


def test_roundtrip_32bps(rng):
    x = rng.integers(-(2**31), 2**31, (6000, 1), dtype=np.int64).astype(np.int32)
    _roundtrip(x, 32)


def test_roundtrip_constant_and_short():
    x = np.full((5000, 1), -1234, dtype=np.int32)
    blob, _ = _roundtrip(x, 16)
    assert len(blob) < 1000  # constant subframes
    _roundtrip(np.arange(5, dtype=np.int32)[:, None], 16)  # shorter than a block
    _roundtrip(np.zeros((1, 1), np.int32), 16)


def test_roundtrip_partial_last_block(rng):
    x = rng.integers(-500, 500, (4096 * 2 + 777, 2)).astype(np.int32)
    _roundtrip(x, 16)


@pytest.mark.parametrize("level", [0, 1, 3, 5, 8])
def test_roundtrip_levels(rng, level):
    x = (1000 * np.sin(np.arange(9000) / 20)).astype(np.int32)[:, None]
    _roundtrip(x, 16, level=level)


def test_streaminfo_fields(rng):
    x = rng.integers(-300, 300, (9000, 2)).astype(np.int32)
    blob = encode_flac(x, 48000, 16)
    dec = decode_flac(blob)
    si = dec.streaminfo
    assert si.total_samples == 9000
    assert si.channels == 2
    assert si.bits_per_sample == 16
    assert si.sample_rate == 48000
    assert si.md5 == md5_of_samples(x, 16)
    assert si.min_framesize > 0 and si.max_framesize >= si.min_framesize


def test_vorbis_comments_roundtrip(rng):
    x = rng.integers(-10, 10, (100, 1)).astype(np.int32)
    blob = encode_flac(x, 44100, 16, comments={"GEOSPATIAL_CRS": "EPSG:4326", "A": "b=c"})
    dec = decode_flac(blob)
    assert dec.comments["GEOSPATIAL_CRS"] == ["EPSG:4326"]
    assert dec.comments["A"] == ["b=c"]


def test_decode_libflac_file_matches_reference_normalization(ref_rgb_flac, ref_rgb_tif):
    """Cross-validation: a real libFLAC 1.4.3 file decodes bit-perfectly."""
    from PIL import Image

    dec = decode_flac(ref_rgb_flac.read_bytes(), verify_crc=True)
    im = np.array(Image.open(ref_rgb_tif))
    x = im.reshape(-1, 3).astype(np.float64)
    dmin, dmax = x.min(), x.max()
    audio = ((2 * (x - dmin) / (dmax - dmin) - 1) * 32767).astype(np.int16)
    assert np.array_equal(dec.samples.astype(np.int64), audio.astype(np.int64))


def test_beats_or_matches_libflac_level5_ratio(ref_rgb_flac, ref_rgb_tif):
    """Compression-ratio parity with libFLAC -5 (BASELINE.md target)."""
    from PIL import Image

    im = np.array(Image.open(ref_rgb_tif))
    x = im.reshape(-1, 3).astype(np.float64)
    audio = ((2 * (x - x.min()) / (x.max() - x.min()) - 1) * 32767).astype(np.int32)
    blob = encode_flac(audio, 44100, 16, compression_level=5)
    assert len(blob) <= ref_rgb_flac.stat().st_size * 1.02


def test_fixed_predictor_roundtrip(rng):
    x = rng.integers(-(2**20), 2**20, 3000)
    for order in range(5):
        res = fixed_residual(x, order)
        got = fixed_restore(x[:order], res, order)
        assert np.array_equal(got, x)


def test_lpc_residual_restore_roundtrip(rng):
    x = (5000 * np.sin(np.arange(4096) / 17) + rng.normal(0, 10, 4096)).astype(np.int64)
    r = autocorrelation(x, 8, tukey_window(4096))
    coeffs, _ = levinson_durbin(r, 8)
    qc, shift = quantize_lpc_coeffs(coeffs)
    res = lpc_residual(x, qc, shift)
    assert np.abs(res).mean() < np.abs(np.diff(x)).mean() * 2  # actually predicts
    sig = lpc_restore_batch(
        x[:8][None], res[None], qc.astype(np.int64)[None],
        np.array([shift]), np.array([4096]),
    )
    assert np.array_equal(sig[0], x)
