"""Malformed / hostile FLAC input must raise, never corrupt memory.

Regression coverage for the native decoder's bounds checks
(native/bitpack.cpp decode_subframe / decode_frames_c): a crafted frame
header can claim an LPC order longer than its block or a channel count
that disagrees with STREAMINFO; both previously wrote past heap buffers.
The reference delegates this hardening to libFLAC; here the native C++
fast path and the Python walk must each reject the same inputs.
"""

import numpy as np
import pytest

from flac_raster_tpu.codec.decoder import decode_flac
from flac_raster_tpu.codec.encoder import encode_flac
from flac_raster_tpu.models.flac_format import StreamInfo, build_flac_header
from flac_raster_tpu.ops.crc import crc8, crc16


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _header(channels=1, bps=16, total=1, blocksize=1) -> bytes:
    si = StreamInfo(
        min_blocksize=blocksize, max_blocksize=blocksize,
        min_framesize=0, max_framesize=0, sample_rate=44100,
        channels=channels, bits_per_sample=bps, total_samples=total,
    )
    return bytes(build_flac_header(si))


def _frame_header_bits(bw: _BitWriter, chan_code: int, bs_code: int = 6,
                       bs_tail=(0, 8)) -> None:
    bw.write(0x3FFE, 14)  # sync
    bw.write(0, 1)        # reserved
    bw.write(0, 1)        # fixed blocksize
    bw.write(bs_code, 4)
    bw.write(0, 4)        # sample rate: from STREAMINFO
    bw.write(chan_code, 4)
    bw.write(0, 3)        # sample size: from STREAMINFO
    bw.write(0, 1)        # reserved
    bw.write(0, 8)        # coded frame number 0
    if bs_code == 6:
        bw.write(bs_tail[0], bs_tail[1])


def _with_header_crc8(bw: _BitWriter) -> _BitWriter:
    hdr = bw.tobytes()
    bw.write(crc8(np.frombuffer(hdr, np.uint8)), 8)
    return bw


def test_lpc_order_exceeds_blocksize_rejected():
    """The ADVICE PoC: blocksize 1 (bs_code 6, tail 0) + subframe type 63
    (LPC order 32).  32 warmup samples must NOT be written into a 1-slot
    buffer; both decode paths raise instead of crashing."""
    bw = _BitWriter()
    _frame_header_bits(bw, chan_code=0, bs_code=6, bs_tail=(0, 8))
    _with_header_crc8(bw)
    bw.write(0, 1)     # subframe padding bit
    bw.write(63, 6)    # LPC order 32
    bw.write(0, 1)     # no wasted bits
    for _ in range(300):  # plenty of bytes to read warmups/coeffs from
        bw.write(0, 8)
    blob = _header(channels=1, bps=16, total=1, blocksize=1) + bw.tobytes()
    with pytest.raises(ValueError):
        decode_flac(blob, verify_crc=False)


def test_fixed_order_exceeds_blocksize_rejected():
    bw = _BitWriter()
    _frame_header_bits(bw, chan_code=0, bs_code=6, bs_tail=(1, 8))  # bs=2
    _with_header_crc8(bw)
    bw.write(0, 1)
    bw.write(12, 6)    # fixed order 4 > blocksize 2
    bw.write(0, 1)
    for _ in range(300):
        bw.write(0, 8)
    blob = _header(channels=1, bps=16, total=2, blocksize=2) + bw.tobytes()
    with pytest.raises(ValueError):
        decode_flac(blob, verify_crc=False)


def test_channel_count_mismatch_rejected():
    """Frame claims 8 channels but STREAMINFO says 1: interleave would run
    out of the caller-sized output buffer."""
    bw = _BitWriter()
    _frame_header_bits(bw, chan_code=7, bs_code=6, bs_tail=(63, 8))
    _with_header_crc8(bw)
    for _ in range(200):
        bw.write(0, 8)
    blob = _header(channels=1, bps=16, total=64, blocksize=64) + bw.tobytes()
    with pytest.raises(ValueError):
        decode_flac(blob, verify_crc=False)


def test_reserved_channel_assignment_rejected():
    bw = _BitWriter()
    _frame_header_bits(bw, chan_code=11, bs_code=6, bs_tail=(63, 8))
    _with_header_crc8(bw)
    for _ in range(200):
        bw.write(0, 8)
    blob = _header(channels=2, bps=16, total=64, blocksize=64) + bw.tobytes()
    with pytest.raises(ValueError):
        decode_flac(blob, verify_crc=False)


def test_mutation_fuzz_never_crashes(rng):
    """Deterministic byte-flip fuzz over a real encoded stream: every mutant
    either still decodes or raises a Python exception -- the process must
    survive all of them (heap safety)."""
    x = (1000 * np.sin(np.arange(9000) / 30)).astype(np.int32)[:, None]
    blob = bytearray(encode_flac(x, 44100, 16, compression_level=5))
    n = len(blob)
    for _ in range(300):
        pos = int(rng.integers(0, n))
        old = blob[pos]
        blob[pos] = int(rng.integers(0, 256))
        try:
            decode_flac(bytes(blob), verify_crc=True, verify_md5=True)
        except Exception:
            pass
        blob[pos] = old

    # truncations at every tail length of the last 200 bytes
    for cut in range(1, 200):
        try:
            decode_flac(bytes(blob[: n - cut]), verify_crc=True)
        except Exception:
            pass
