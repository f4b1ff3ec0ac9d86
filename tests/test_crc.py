import numpy as np

from flac_raster_tpu.ops.crc import crc8, crc16, crc8_rows, crc16_rows


def _crc_ref(data: bytes, poly: int, width: int) -> int:
    """Bit-at-a-time reference implementation."""
    crc = 0
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for b in data:
        crc ^= b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
    return crc


def test_crc8_known_vectors():
    assert crc8(b"") == 0
    for data in [b"\x00", b"\xff", b"123456789", bytes(range(50))]:
        assert crc8(data) == _crc_ref(data, 0x07, 8)


def test_crc16_small_matches_reference(rng):
    for n in [0, 1, 2, 7, 64, 300]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert crc16(data) == _crc_ref(data, 0x8005, 16)


def test_crc16_large_vectorized_path(rng):
    data = rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes()
    assert crc16(data) == _crc_ref(data, 0x8005, 16)


def test_crc_rows_left_padding_invariant(rng):
    msgs = [rng.integers(0, 256, n, dtype=np.uint8) for n in (3, 10, 17)]
    width = max(len(m) for m in msgs)
    mat = np.zeros((len(msgs), width), dtype=np.uint8)
    for i, m in enumerate(msgs):
        mat[i, width - len(m):] = m
    r16 = crc16_rows(mat)
    r8 = crc8_rows(mat)
    for i, m in enumerate(msgs):
        assert int(r16[i]) == _crc_ref(m.tobytes(), 0x8005, 16)
        assert int(r8[i]) == _crc_ref(m.tobytes(), 0x07, 8)
