import numpy as np
import pytest

from flac_raster_tpu.ops.bitpack import bits_of, pack_tokens
from flac_raster_tpu.ops.rice import (
    best_rice_param,
    decode_rice_vectorized,
    encode_rice_tokens,
    unzigzag,
    zigzag,
)


def test_zigzag_roundtrip(rng):
    res = rng.integers(-(2**35), 2**35, 1000)
    assert np.array_equal(unzigzag(zigzag(res)), res)
    assert zigzag(np.array([0, -1, 1, -2, 2])).tolist() == [0, 1, 2, 3, 4]


@pytest.mark.parametrize("k", [0, 1, 5, 14])
def test_rice_roundtrip(rng, k):
    res = rng.integers(-(2 ** (k + 3)), 2 ** (k + 3), 500)
    z = zigzag(res)
    values, lengths = encode_rice_tokens(z, k)
    packed = pack_tokens(values, lengths)
    bits = bits_of(packed)
    got, end = decode_rice_vectorized(bits, 0, res.size, k)
    assert np.array_equal(got, res)
    assert end == int(lengths.sum())


def test_rice_roundtrip_with_offset_and_trailing_data(rng):
    res = rng.integers(-50, 50, 300)
    z = zigzag(res)
    values, lengths = encode_rice_tokens(z, 3)
    # prepend 13 bits of ones, append junk
    values = np.concatenate([[0x1FFF], values, [0xABCD]])
    lengths = np.concatenate([[13], lengths, [16]]).astype(np.int64)
    packed = pack_tokens(values.astype(np.uint64), lengths)
    bits = bits_of(packed)
    got, end = decode_rice_vectorized(bits, 13, res.size, 3)
    assert np.array_equal(got, res)
    assert end == 13 + int(lengths[1:-1].sum())


def test_rice_single_sample():
    z = zigzag(np.array([7]))
    values, lengths = encode_rice_tokens(z, 2)
    bits = bits_of(pack_tokens(values, lengths))
    got, end = decode_rice_vectorized(bits, 0, 1, 2)
    assert got.tolist() == [7]


def test_best_rice_param_is_exact_argmin(rng):
    z = zigzag(rng.integers(-1000, 1000, 256))
    k, bits = best_rice_param(z)
    costs = [256 * (kk + 1) + int((z >> np.uint64(kk)).sum()) for kk in range(15)]
    assert bits == min(costs)
    assert costs[k] == bits
