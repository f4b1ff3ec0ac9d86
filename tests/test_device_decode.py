"""Device decode path (VERDICT round-1 missing #4).

decode_flac_device must return device-resident samples byte-exact vs the
host decoder on every fixture class, use the FRTP layout index for parallel
frame decode, and fall back to the host decoder for foreign/unsupported
streams.
"""

import numpy as np
import pytest

from flac_raster_tpu.codec.decoder import decode_flac
from flac_raster_tpu.codec.device_decoder import decode_flac_device
from flac_raster_tpu.codec.encoder import encode_flac
from flac_raster_tpu.codec.fast_encoder import encode_flac_fast
from flac_raster_tpu.models.flac_format import parse_flac_metadata, parse_layout_block

N = 256


def _check(blob, expected):
    dev = decode_flac_device(blob, verify_crc=True, verify_md5=True)
    got = np.asarray(dev.samples)
    assert np.array_equal(got.astype(np.int64), expected.astype(np.int64))
    import jax

    assert isinstance(dev.samples, jax.Array)
    return dev


def test_layout_block_written_and_parsed(rng):
    from flac_raster_tpu.models.flac_format import LAYOUT_FLAG_TOK32

    x = rng.integers(-100, 100, (N * 3 + 50, 1)).astype(np.int32)
    blob = encode_flac_fast(x, 44100, 16, 5, blocksize=N)
    _, blocks, _ = parse_flac_metadata(blob)
    layout = parse_layout_block(blocks)
    assert layout is not None and layout.sizes.size == 4  # 3 full + tail
    assert int(layout.sizes.sum()) == len(blob) - parse_flac_metadata(blob)[2]
    assert layout.version == 2 and (layout.flags & LAYOUT_FLAG_TOK32)


def test_layout_v2_subframe_bits(rng):
    """2-channel streams carry per-frame subframe bit lengths that chain to
    the frame body size."""
    x = np.cumsum(rng.integers(-40, 41, (N * 3, 2)), axis=0).astype(np.int32)
    blob = encode_flac_fast(x, 44100, 16, 5, blocksize=N)
    si, blocks, _ = parse_flac_metadata(blob)
    layout = parse_layout_block(blocks)
    assert layout.sub_bits is not None and layout.sub_bits.shape == (3, 1)
    assert (layout.sub_bits > 0).all()
    # subframe 0 must end inside the frame body
    assert (layout.sub_bits[:, 0] < layout.sizes[:3] * 8).all()


@pytest.mark.parametrize("channels", [1, 2, 3, 8])
def test_device_decode_matches_host(rng, channels):
    n = N * 5 + 77
    base = np.cumsum(rng.integers(-50, 51, (n, channels)), axis=0)
    x = np.clip(base, -30000, 30000).astype(np.int32)
    blob = encode_flac_fast(x, 44100, 16, 5, blocksize=N)
    _check(blob, x)


@pytest.mark.parametrize("level", [0, 2, 5, 8])
def test_device_decode_levels(rng, level):
    n = N * 4
    t = np.arange(n)
    x = (500 * np.sin(t / 9.0) + rng.normal(0, 4, n)).astype(np.int32)[:, None]
    blob = encode_flac_fast(x, 44100, 16, level, blocksize=N)
    _check(blob, x)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_device_decode_bit_depths(rng, bps):
    lim = 1 << (bps - 1)
    x = rng.integers(-lim, lim, (N * 3, 2)).astype(np.int64)
    blob = encode_flac_fast(x, 44100, bps, 5, blocksize=N)
    _check(blob, x)


def test_device_decode_subframe_kinds(rng):
    """Constant, verbatim (noise), fixed, and LPC subframes in one stream."""
    parts = [
        np.full(N, 42),                                  # constant
        rng.integers(-30000, 30000, N),                  # noise -> verbatim-ish
        np.cumsum(rng.integers(-3, 4, N)),               # smooth -> fixed/lpc
        (1000 * np.sin(np.arange(N) / 5.0)).astype(int), # tonal -> lpc
    ]
    x = np.concatenate(parts).astype(np.int32)[:, None]
    blob = encode_flac_fast(x, 44100, 16, 5, blocksize=N)
    _check(blob, x)


@pytest.mark.parametrize("channels,bps", [(1, 8), (2, 16), (3, 12), (2, 24)])
def test_device_decode_row_gather_mode(rng, monkeypatch, channels, bps):
    """The row-sliced rice-scan gather (the TPU default) must match the
    element-gather mode byte for byte on every stream class.  On the CPU
    mesh the auto mode picks element gathers, so force row mode through
    the env knob."""
    monkeypatch.setenv("FRTPU_DECODE_ROW", "1")
    lim = 1 << (bps - 1)
    parts = [
        np.full(N, -7),                                       # constant
        rng.integers(-lim, lim, N),                           # verbatim-ish
        np.clip(np.cumsum(rng.integers(-3, 4, N)), -lim, lim - 1),
        (lim // 30 * np.sin(np.arange(N) / 5.0)).astype(int), # tonal -> lpc
    ]
    x = np.concatenate(parts).astype(np.int32)
    x = np.stack([np.roll(x, 3 * c) for c in range(channels)], axis=1)
    blob = encode_flac_fast(x, 44100, bps, 5, blocksize=N)
    _check(blob, x)


@pytest.mark.parametrize("channels,bps", [(1, 16), (2, 16), (2, 24)])
def test_device_decode_dma_gather_mode(rng, monkeypatch, channels, bps):
    """The Pallas DMA window gather (the TPU default window source) must
    decode byte-exactly: windows start 8-row (4096 B) aligned with the
    frame's sub-window offset carried in bit_base, so this exercises the
    large-bit_base corner the XLA path (128 B alignment) never reaches.
    Interpreter mode runs the kernel's copy semantics on the CPU mesh."""
    monkeypatch.setenv("FRTPU_DECODE_DMA", "interpret")
    lim = 1 << (bps - 1)
    parts = [
        np.full(N, 9),
        rng.integers(-lim, lim, N),
        np.clip(np.cumsum(rng.integers(-3, 4, N)), -lim, lim - 1),
        (lim // 30 * np.sin(np.arange(N) / 5.0)).astype(int),
    ]
    x = np.concatenate(parts).astype(np.int32)
    x = np.stack([np.roll(x, 3 * c) for c in range(channels)], axis=1)
    blob = encode_flac_fast(x, 44100, bps, 5, blocksize=N)
    # odd chunking makes consecutive chunks share 4096 B body stripes
    dev = decode_flac_device(blob, verify_crc=True, chunk_frames=3)
    assert np.array_equal(np.asarray(dev.samples).astype(np.int64),
                          x.astype(np.int64))
    # ranged decode re-bases byte_lo to a 4096 B boundary
    dev_r = decode_flac_device(blob, sample_range=(N * 2 + 5, N + 7))
    assert np.array_equal(np.asarray(dev_r.samples).astype(np.int64),
                          x[N * 2 + 5 : N * 3 + 12].astype(np.int64))


def test_device_decode_scalar_encoder_stream(rng):
    x = np.cumsum(rng.integers(-9, 10, (N * 2 + 13, 2)), axis=0).astype(np.int32)
    blob = encode_flac(x, 44100, 16, 5, blocksize=N)
    _check(blob, x)


@pytest.mark.parametrize("bs", [64, 128, 512])
def test_device_decode_small_blocksizes(rng, bs):
    """Blocksizes at/near the eligibility floor: the grouped Rice scan's
    step padding (codes per step does not divide N) must stay exact."""
    x = np.cumsum(rng.integers(-20, 21, (bs * 3 + 5, 2)), axis=0).astype(np.int32)
    blob = encode_flac_fast(x, 44100, 16, 5, blocksize=bs)
    _check(blob, x)


def test_device_decode_big_blocksize(rng):
    x = np.cumsum(rng.integers(-9, 10, (4096 * 2 + 5, 2)), axis=0).astype(np.int32)
    blob = encode_flac_fast(x, 44100, 16, 5)
    _check(blob, x)


def test_device_decode_heavy_tail(rng):
    """Heavy-tailed residuals push Rice tokens toward the 32-bit planner cap
    (q+1+k == MAX_RICE_TOKEN_BITS at the extremes); decode must stay exact."""
    n = N * 6
    x = rng.normal(0, 30, (n, 2))
    spikes = rng.random((n, 2)) < 0.01
    x = np.where(spikes, rng.normal(0, 20000, (n, 2)), x)
    x = np.clip(x, -32768, 32767).astype(np.int32)
    blob = encode_flac_fast(x, 44100, 16, 5, blocksize=N)
    _check(blob, x)


def test_device_decode_max_quotient_tokens(rng):
    """A lone extreme spike in an otherwise tiny-residual block forces a
    maximal quotient under the capped k of its partition."""
    x = rng.integers(-3, 4, (N * 2, 1)).astype(np.int32)
    x[N // 2, 0] = 30000
    x[N + 17, 0] = -29999
    blob = encode_flac_fast(x, 44100, 16, 5, blocksize=N)
    _check(blob, x)


def test_foreign_stream_falls_back(ref_rgb_flac):
    """Reference libFLAC fixture has no layout block: host fallback, still a
    device array, still bit-exact."""
    blob = ref_rgb_flac.read_bytes()
    host = decode_flac(blob, verify_crc=True)
    dev = decode_flac_device(blob, verify_crc=True)
    assert np.array_equal(np.asarray(dev.samples), host.samples)


class TestRangeDecode:
    """Random access through the FRTP layout index: host + device."""

    def _fixture(self, rng, channels=2, n=N * 5 + 77):
        base = np.cumsum(rng.integers(-40, 41, (n, channels)), axis=0)
        x = np.clip(base, -30000, 30000).astype(np.int32)
        return x, encode_flac_fast(x, 44100, 16, 5, blocksize=N)

    @pytest.mark.parametrize(
        "start,count",
        [
            (0, N),                      # first frame exactly
            (N - 3, 7),                  # frame boundary crossing
            (N * 2 + 5, N + 11),         # interior, unaligned
            (N * 5 - 2, 60),             # crosses into the tail frame
            (N * 5 + 70, 7),             # tail only
            (0, N * 5 + 77),             # everything
            (123, 0),                    # empty
        ],
    )
    def test_host_range(self, rng, start, count):
        from flac_raster_tpu.codec.decoder import decode_flac_range

        x, blob = self._fixture(rng)
        dec = decode_flac_range(blob, start, count)
        assert np.array_equal(dec.samples, x[start : start + count])
        assert dec.streaminfo.total_samples == x.shape[0]  # original metadata

    def test_host_range_open_end(self, rng):
        from flac_raster_tpu.codec.decoder import decode_flac_range

        x, blob = self._fixture(rng)
        dec = decode_flac_range(blob, N * 3 + 9)
        assert np.array_equal(dec.samples, x[N * 3 + 9 :])

    def test_host_range_out_of_bounds(self, rng):
        from flac_raster_tpu.codec.decoder import decode_flac_range

        x, blob = self._fixture(rng)
        with pytest.raises(ValueError):
            decode_flac_range(blob, x.shape[0] - 3, 10)

    def test_host_range_foreign_stream(self, ref_rgb_flac):
        """No layout index: falls back to full decode + slice."""
        from flac_raster_tpu.codec.decoder import decode_flac, decode_flac_range

        blob = ref_rgb_flac.read_bytes()
        full = decode_flac(blob)
        dec = decode_flac_range(blob, 1000, 500)
        assert np.array_equal(dec.samples, full.samples[1000:1500])

    @pytest.mark.parametrize(
        "start,count",
        [(N + 3, N * 2), (N * 5 - 2, 60), (0, 5), (N * 5 + 70, 7)],
    )
    def test_device_range(self, rng, start, count):
        x, blob = self._fixture(rng)
        dev = decode_flac_device(blob, sample_range=(start, count))
        assert np.array_equal(np.asarray(dev.samples), x[start : start + count])

    def test_device_range_md5_rejected(self, rng):
        x, blob = self._fixture(rng)
        with pytest.raises(ValueError):
            decode_flac_device(blob, verify_md5=True, sample_range=(0, 5))


def test_corrupt_frame_raises(rng):
    x = np.cumsum(rng.integers(-9, 10, (N * 3, 1)), axis=0).astype(np.int32)
    blob = bytearray(encode_flac_fast(x, 44100, 16, 5, blocksize=N))
    _, _, start = parse_flac_metadata(bytes(blob))
    blob[start + 40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac_device(bytes(blob), verify_crc=True)


def test_32bps_falls_back(rng):
    x = rng.integers(-(2**31), 2**31, (N * 2, 1), dtype=np.int64).astype(np.int32)
    blob = encode_flac_fast(x, 44100, 32, 5, blocksize=N)
    dev = decode_flac_device(blob)  # bps > device width -> host fallback
    assert np.array_equal(np.asarray(dev.samples), x)


def test_layout_block_overflow_degrades_gracefully():
    """A decode index too large for a 24-bit APPLICATION block must degrade
    (drop subframe detail, then the index) rather than abort the encode."""
    from flac_raster_tpu.models.flac_format import (
        LAYOUT_FLAG_TOK32,
        StreamInfo,
        build_flac_header,
        parse_flac_metadata,
        parse_layout_block,
    )

    si = StreamInfo(
        min_blocksize=N, max_blocksize=N, min_framesize=10, max_framesize=20,
        sample_rate=44100, channels=2, bits_per_sample=16,
        total_samples=N * 3_000_000,
    )
    big = np.full(3_000_000, 16, np.int64)
    subs = np.full((3_000_000, 1), 100, np.int64)
    # v2 with subframe detail would be ~24 MB: detail must be dropped but
    # the sizes index (12 MB) still fits
    hdr = build_flac_header(si, frame_sizes=big, sub_bits=subs,
                            layout_flags=LAYOUT_FLAG_TOK32)
    layout = parse_layout_block(parse_flac_metadata(bytes(hdr) )[1])
    assert layout is not None and layout.sub_bits is None
    assert layout.flags & LAYOUT_FLAG_TOK32
    # sizes alone beyond the 24-bit budget: the index is omitted entirely
    huge = np.full(5_000_000, 16, np.int64)
    hdr2 = build_flac_header(si, frame_sizes=huge)
    assert parse_layout_block(parse_flac_metadata(bytes(hdr2))[1]) is None


def test_range_decode_random_configs(rng):
    """Property fuzz: decode_flac_range == full decode slice across random
    stream shapes and windows."""
    from flac_raster_tpu.codec.decoder import decode_flac_range

    for _ in range(6):
        bs = int(rng.choice([64, 256, 1024]))
        ch = int(rng.integers(1, 4))
        n = int(rng.integers(bs, bs * 6)) + int(rng.integers(0, bs))
        level = int(rng.choice([0, 2, 5]))
        x = np.cumsum(rng.integers(-60, 61, (n, ch)), axis=0)
        x = np.clip(x, -30000, 30000).astype(np.int32)
        blob = encode_flac_fast(x, 44100, 16, level, blocksize=bs)
        s0 = int(rng.integers(0, n))
        cnt = int(rng.integers(0, n - s0 + 1))
        dec = decode_flac_range(blob, s0, cnt)
        assert np.array_equal(dec.samples, x[s0 : s0 + cnt]), (bs, ch, n, s0, cnt)


def test_device_range_on_ineligible_stream(ref_rgb_flac):
    """sample_range must be honored even when the stream lacks the v2 index
    (host fallback): the returned rows are the window, not the full file."""
    blob = ref_rgb_flac.read_bytes()
    host = decode_flac(blob, verify_crc=True)
    dev = decode_flac_device(blob, sample_range=(1000, 300))
    got = np.asarray(dev.samples)
    assert got.shape[0] == 300
    assert np.array_equal(got, host.samples[1000:1300])
