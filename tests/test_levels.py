"""Honest compression levels 7-8 (VERDICT round-1 weak item #3).

EncoderConfig.from_level sets max_lpc_order=12 and extra apodization windows
for levels 7-8 (libFLAC preset -l/-A columns, reference
``sonos-pyflac.txt:6910-6937``); the planners must actually honor them --
previously the fast/device paths silently clamped to order 8 / one window.
"""

import numpy as np
import pytest

from flac_raster_tpu.codec.decoder import decode_flac
from flac_raster_tpu.codec.encoder import EncoderConfig, encode_flac
from flac_raster_tpu.codec.fast_encoder import encode_flac_fast


def _tonal(n=40960, channels=1):
    rng = np.random.default_rng(3)
    t = np.arange(n)
    x = (
        8000 * np.sin(t / 7.3)
        + 4000 * np.sin(t / 3.1)
        + 2000 * np.sin(t / 17.7)
        + rng.normal(0, 12, n)
    ).astype(np.int32)
    if channels == 1:
        return x[:, None]
    return np.stack([x] + [
        (x + rng.integers(-3, 4, n)).astype(np.int32) for _ in range(channels - 1)
    ], axis=1)


def test_config_levels_7_8_extend_search():
    c5, c7, c8 = (EncoderConfig.from_level(v) for v in (5, 7, 8))
    assert c5.max_lpc_order == 8 and len(c5.apodizations) == 1
    assert c7.max_lpc_order == 12 and len(c7.apodizations) >= 2
    assert c8.max_lpc_order == 12 and len(c8.apodizations) >= 3


@pytest.mark.parametrize("encode", [encode_flac, encode_flac_fast],
                         ids=["scalar", "fast"])
def test_level8_beats_level5_on_tonal(encode):
    x = _tonal()
    s5 = encode(x, 44100, 16, 5)
    s8 = encode(x, 44100, 16, 8)
    assert len(s8) < len(s5), (len(s8), len(s5))
    for blob in (s5, s8):
        d = decode_flac(blob, verify_crc=True, verify_md5=True)
        assert np.array_equal(d.samples, x)


def test_order12_actually_emitted():
    """A strongly tonal signal must produce at least one order>8 LPC
    subframe at level 8 (the search space really widened)."""
    x = _tonal(16384)
    blob = encode_flac_fast(x, 44100, 16, 8)
    # subframe header byte follows the frame header; scan for LPC type
    # codes with order > 8: type = 0b100000 | (order-1), so order 9..12
    # map to 0x28..0x2B (<<1 in the byte with the wasted-bit flag 0)
    found = set()
    buf = blob
    for i in range(len(buf) - 1):
        b = buf[i]
        if (b >> 1) >= 0x28 and (b >> 1) <= 0x2B and (b & 1) == 0:
            found.add(((b >> 1) & 0x1F) + 1)
    assert found, "no order>8 LPC subframe found at level 8"


def test_level8_device_matches_fast():
    from flac_raster_tpu.codec.device_encoder import encode_flac_device

    x = _tonal(4096 * 3 + 50, channels=2)
    dev = encode_flac_device(x, 44100, 16, 8)
    fast = encode_flac_fast(x, 44100, 16, 8)
    assert dev == fast
    assert np.array_equal(decode_flac(dev, verify_md5=True).samples, x)


def test_level8_wide_host_planner(rng):
    """bps 32 routes to the host planner; order 12 + windows there too."""
    base = np.cumsum(rng.integers(-1000, 1000, 9000)).astype(np.int64)
    x = np.clip(base * 1201, -(2**31), 2**31 - 1).astype(np.int32)[:, None]
    s8 = encode_flac_fast(x, 44100, 32, 8)
    d = decode_flac(s8, verify_crc=True, verify_md5=True)
    assert np.array_equal(d.samples.astype(np.int64), x.astype(np.int64))
