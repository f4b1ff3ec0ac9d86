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
