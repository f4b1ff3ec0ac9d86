import numpy as np
import pytest

from flac_raster_tpu.ops.bitpack import BitReader, bits_of, pack_tokens, read_kbits_at


def _pack_ref(values, lengths) -> bytes:
    """Naive bit-string reference packer."""
    s = "".join(format(int(v) & ((1 << int(l)) - 1), f"0{int(l)}b") for v, l in zip(values, lengths) if l)
    s += "0" * ((-len(s)) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


@pytest.mark.parametrize("n", [1, 7, 100, 5000])
def test_pack_tokens_matches_reference(rng, n):
    lengths = rng.integers(0, 65, n)
    values = rng.integers(0, 2**63, n, dtype=np.uint64)
    got = pack_tokens(values, lengths.astype(np.int64))
    assert got == _pack_ref(values, lengths)


def test_pack_empty():
    assert pack_tokens(np.zeros(0, np.uint64), np.zeros(0, np.int64)) == b""


def test_bitreader_roundtrip(rng):
    lengths = rng.integers(1, 57, 200)
    values = [int(v) & ((1 << int(l)) - 1) for v, l in zip(rng.integers(0, 2**62, 200, dtype=np.uint64), lengths)]
    packed = pack_tokens(np.array(values, dtype=np.uint64), lengths.astype(np.int64))
    br = BitReader(packed)
    for v, l in zip(values, lengths):
        assert br.read_uint(int(l)) == v


def test_read_kbits_at(rng):
    data = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    bits = bits_of(data)
    br = BitReader(data)
    positions, expected = [], []
    pos = 3
    while pos + 11 < len(bits):
        br.seek_bits(pos)
        expected.append(br.read_uint(11))
        positions.append(pos)
        pos += 13
    got = read_kbits_at(bits, np.array(positions), 11)
    assert got.tolist() == expected


def test_signed_reads():
    packed = pack_tokens(np.array([0b111111101, 0b011], dtype=np.uint64), np.array([9, 3]))
    br = BitReader(packed)
    assert br.read_sint(9) == -3
    assert br.read_sint(3) == 3


def test_native_rice_terminator_on_window_bit64():
    """Unary terminator exactly on the last bit of a fresh byte-aligned
    64-bit window: the cached Rice loop's `acc << (lead+1)` would be a
    64-bit shift (UB) without its guard (native/bitpack.cpp)."""
    native = pytest.importorskip("flac_raster_tpu.native")
    if not native.available():
        pytest.skip("native library unavailable")
    # [2b method=0][4b porder=0][4b k=0] then 2 codes (blocksize 4, order 2):
    #   code 1: q=5  -> bits 10..15 = 000001           (pos -> 16)
    #   code 2: q=119: zeros 16..71 drain the first window to a refill at
    #           the byte-aligned pos=72 (nacc=64), then 63 zeros + the
    #           terminator at bit 135 == bit 64 of that fresh window
    buf = np.zeros(24, np.uint8)
    buf[1] = 0x01          # bits 8..15 = 00000001 (k nibble 0, then 000001)
    buf[16] = 0x01         # bit 135 set
    res, end = native.decode_residual(buf, 0, 4, 2)
    assert end == 136
    assert res.tolist() == [-3, -60]  # zigzag(5), zigzag(119)
