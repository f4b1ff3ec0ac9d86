"""Native subframe emitter (bitpack.cpp emit_subframes_c) exactness.

The native sequential bit writer must produce the same packed stream as
the vectorized numpy token emitter (codec/fast_encoder._emit_chunk's
scatter path): same Rice partitions, same verbatim samples, same layout.
FRTPU_NATIVE_EMIT=0 forces the numpy path for the comparison.
"""

import numpy as np
import pytest

from flac_raster_tpu import native
from flac_raster_tpu.codec.decoder import decode_flac
from flac_raster_tpu.codec.fast_encoder import encode_flac_fast

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _ab(monkeypatch, x, level, bps=16):
    monkeypatch.setenv("FRTPU_NATIVE_EMIT", "0")
    ref = encode_flac_fast(x, 44100, bps, compression_level=level)
    monkeypatch.setenv("FRTPU_NATIVE_EMIT", "1")
    got = encode_flac_fast(x, 44100, bps, compression_level=level)
    return ref, got


@pytest.mark.parametrize("level", [0, 2, 5, 8])
@pytest.mark.parametrize("channels", [1, 2])
def test_stream_bytes_match_numpy_emitter(level, channels, monkeypatch):
    rng = np.random.default_rng(level * 10 + channels)
    n = 4096 * 3 + 777  # includes a scalar tail frame
    x = (
        np.cumsum(rng.integers(-60, 60, (n, channels)), axis=0) % 50000
        - 25000
    ).astype(np.int32)
    ref, got = _ab(monkeypatch, x, level)
    assert got == ref
    d = decode_flac(got, verify_crc=True)
    assert np.array_equal(d.samples.reshape(-1, channels), x)


def test_verbatim_and_constant_subframes(monkeypatch):
    rng = np.random.default_rng(3)
    # full-range noise forces verbatim; a constant stretch forces constant
    x = rng.integers(-32768, 32767, (4096 * 3, 1)).astype(np.int32)
    x[4096 : 2 * 4096] = 1234
    ref, got = _ab(monkeypatch, x, 5)
    assert got == ref
    d = decode_flac(got, verify_crc=True)
    assert np.array_equal(d.samples.reshape(-1, 1), x)


def test_bit_accounting_mismatch_raises(monkeypatch):
    # corrupting the planner's exact bit count must raise, not emit garbage
    from flac_raster_tpu.codec import fast_encoder

    monkeypatch.setenv("FRTPU_NATIVE_EMIT", "1")
    rng = np.random.default_rng(4)
    x = (
        np.cumsum(rng.integers(-60, 60, (4096 * 2, 1)), axis=0) % 20000
        - 10000
    ).astype(np.int32)

    orig = fast_encoder._plan_frames_chunk

    def corrupt(*args, **kwargs):
        plan, x_emit, chan_code, ch_bps = orig(*args, **kwargs)
        plan["subframe_bits"] = plan["subframe_bits"] + 1
        return plan, x_emit, chan_code, ch_bps

    monkeypatch.setattr(fast_encoder, "_plan_frames_chunk", corrupt)
    with pytest.raises(AssertionError, match="bit mismatch"):
        encode_flac_fast(x, 44100, 16, compression_level=5)


def test_wide_streams_fall_back_to_numpy(monkeypatch):
    # bps 25 mid-side side channel is 26 <= 27: still native; bps > 26
    # planner output is int64, which must route to the numpy emitter
    monkeypatch.setenv("FRTPU_NATIVE_EMIT", "1")
    rng = np.random.default_rng(5)
    x = (
        np.cumsum(rng.integers(-(1 << 20), 1 << 20, (4096 * 2, 1)), axis=0)
        % (1 << 31)
        - (1 << 30)
    ).astype(np.int64)
    blob = encode_flac_fast(x, 44100, 32, compression_level=5)
    d = decode_flac(blob, verify_crc=True)
    assert np.array_equal(d.samples.reshape(-1, 1), x)
