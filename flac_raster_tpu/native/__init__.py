"""Native (C++) host runtime: fast bitstream packer + CRC patcher.

Compiled on first import with the system compiler and cached next to the
source; everything degrades gracefully to the numpy implementations
(ops/bitpack.py, ops/crc.py) when no compiler is available, so the package
stays importable anywhere.  ctypes keeps the binding layer dependency-free
(no pybind11 in this environment).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger("flac_raster_tpu.native")

__all__ = [
    "available",
    "pack_tokens_native",
    "crc8_patch",
    "crc16_patch",
    "decode_residual",
    "crc16_spans",
    "plan_rice",
    "emit_subframes",
]

_HERE = Path(__file__).parent
_SRCS = (_HERE / "bitpack.cpp", _HERE / "plan.cpp")
_LIB_PATH = _HERE / "libfrtpu.so"
_STAMP_PATH = _HERE / "libfrtpu.so.sha256"
_lib = None


def _src_digest() -> str:
    h = hashlib.sha256()
    for src in _SRCS:
        h.update(src.read_bytes())
    return h.hexdigest()


def _build() -> bool:
    cxx = os.environ.get("CXX", "g++")
    base = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17",
            *map(str, _SRCS), "-o", str(_LIB_PATH)]
    # the library is always built on the machine that runs it (content-hash
    # gated), so -march=native is safe and vectorizes the CRC/Rice loops;
    # retried without it for compilers that reject the flag
    for cmd in ([*base[:2], "-march=native", *base[2:]], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            _STAMP_PATH.write_text(_src_digest())
            return True
        except Exception as exc:  # pragma: no cover - depends on toolchain
            last = exc
    logger.warning("native build failed (%s); using numpy fallback", last)
    return False


def _is_current() -> bool:
    # Reuse is gated on a content hash of the C++ source, not mtimes: git
    # checkouts do not preserve mtimes, so an mtime check could silently load
    # a stale (or unreviewed prebuilt) binary after the source changed.
    if not _LIB_PATH.exists() or not _STAMP_PATH.exists():
        return False
    try:
        return _STAMP_PATH.read_text().strip() == _src_digest()
    except OSError:  # pragma: no cover
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _is_current():
        if not _build():
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:  # pragma: no cover
        _lib = False
        return _lib
    lib.pack_tokens_c.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    lib.crc8_patch_spans_c.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.crc16_patch_spans_c.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.decode_residual_c.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.decode_residual_c.restype = ctypes.c_int64
    lib.crc16_spans_check_c.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint16),
    ]
    lib.decode_frames_c.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.decode_frames_c.restype = ctypes.c_int64
    lib.lpc_restore_c.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _i32p = ctypes.POINTER(ctypes.c_int32)
    lib.plan_rice_i32_c.argtypes = [
        _i32p, _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, _i32p, _i32p, _i32p, _i32p,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p,
        _i32p, _i32p, _i32p,
    ]
    lib.emit_subframes_c.argtypes = [
        _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    lib.emit_subframes_c.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return bool(_load())


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def pack_tokens_native(
    values: np.ndarray,
    lengths: np.ndarray,
    offsets: np.ndarray,
    total_bits: int,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """Scatter-OR tokens into a zeroed byte buffer; returns uint8 array.

    Single linear pass in C (vs numpy's per-element ufunc.at dispatch).
    ``out`` may be a preallocated zeroed uint8 buffer to OR into.
    """
    lib = _load()
    assert lib, "native library unavailable"
    values = np.ascontiguousarray(values, dtype=np.uint64)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n_bytes = (int(total_bits) + 7) // 8
    if out is None:
        out = np.zeros(n_bytes + 8, dtype=np.uint8)  # +8 slack for 9-byte writes
    lib.pack_tokens_c(
        _ptr(values, ctypes.c_uint64), _ptr(lengths, ctypes.c_int64),
        _ptr(offsets, ctypes.c_int64), len(values),
        _ptr(out, ctypes.c_uint8), len(out),
    )
    return out[:n_bytes]


def crc8_patch(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> None:
    """For each span, write crc8(buf[start:start+len]) at buf[start+len]."""
    lib = _load()
    assert lib, "native library unavailable"
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    lib.crc8_patch_spans_c(
        _ptr(buf, ctypes.c_uint8), _ptr(starts, ctypes.c_int64),
        _ptr(lens, ctypes.c_int64), len(starts),
    )


def crc16_patch(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> None:
    """For each span, write big-endian crc16 at buf[start+len : start+len+2]."""
    lib = _load()
    assert lib, "native library unavailable"
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    lib.crc16_patch_spans_c(
        _ptr(buf, ctypes.c_uint8), _ptr(starts, ctypes.c_int64),
        _ptr(lens, ctypes.c_int64), len(starts),
    )


def decode_residual(
    buf: np.ndarray, bit_pos: int, blocksize: int, order: int
) -> tuple[np.ndarray, int]:
    """Decode one subframe's full residual section (native sequential loop).

    Args:
        buf: uint8 array of the whole stream.
        bit_pos: absolute bit offset of the residual coding method field.
    Returns:
        (residuals int64 (blocksize-order,), new absolute bit offset)
    Raises:
        ValueError on malformed/truncated input.
    """
    lib = _load()
    assert lib, "native library unavailable"
    out = np.empty(blocksize - order, dtype=np.int64)
    end = lib.decode_residual_c(
        _ptr(buf, ctypes.c_uint8), buf.size * 8, bit_pos,
        blocksize, order, _ptr(out, ctypes.c_int64),
    )
    if end < 0:
        raise ValueError(
            "corrupt Rice stream"
            if end == -2
            else "invalid residual coding parameters"
        )
    return out, int(end)


def crc16_spans(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """CRC-16 of each span (verification side; no patching)."""
    lib = _load()
    assert lib, "native library unavailable"
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    out = np.empty(len(starts), dtype=np.uint16)
    lib.crc16_spans_check_c(
        _ptr(buf, ctypes.c_uint8), _ptr(starts, ctypes.c_int64),
        _ptr(lens, ctypes.c_int64), len(starts), _ptr(out, ctypes.c_uint16),
    )
    return out


def lpc_restore(warmups, residuals, qcoeffs, shifts):
    """Batched native LPC restore; mirrors ops/lpc.lpc_restore_batch."""
    lib = _load()
    assert lib, "native library unavailable"
    warmups = np.ascontiguousarray(warmups, dtype=np.int64)
    residuals = np.ascontiguousarray(residuals, dtype=np.int64)
    qcoeffs = np.ascontiguousarray(qcoeffs, dtype=np.int64)
    shifts = np.ascontiguousarray(shifts, dtype=np.int64)
    b, order = warmups.shape
    max_len = order + residuals.shape[1]
    out = np.empty((b, max_len), dtype=np.int64)
    lib.lpc_restore_c(
        _ptr(warmups, ctypes.c_int64), _ptr(residuals, ctypes.c_int64),
        _ptr(qcoeffs, ctypes.c_int64), _ptr(shifts, ctypes.c_int64),
        b, order, max_len, _ptr(out, ctypes.c_int64),
    )
    return out


def plan_rice(
    x: np.ndarray,
    bps_e: np.ndarray,
    max_po: int,
    lpc: tuple | None,
    precision: int,
    order_slots: int,
) -> dict:
    """Integer remainder of plan_blocks (native/plan.cpp); see
    ops/native_planner for the jitted float stage that feeds ``lpc``.

    Args:
        x: (B, N) int32 sample blocks.
        bps_e: (B,) int32 effective bit depths.
        lpc: None, or (r_lpc (W,B,N) i32, order_arr (W,B) i32,
             qc (W,B,qslots) i32, shift (W,B) i32, safe (W,B) u8).
    Returns:
        plan dict matching ops/device_codec.plan_blocks (int32 numpy).
    """
    lib = _load()
    assert lib, "native library unavailable"
    x = np.ascontiguousarray(x, dtype=np.int32)
    B, N = x.shape
    bps_e = np.ascontiguousarray(bps_e, dtype=np.int32)
    i32 = ctypes.c_int32
    if lpc is None:
        W, qslots = 0, 1
        null_i32 = ctypes.POINTER(i32)()
        r_lpc_p = order_p = qc_p = shift_p = null_i32
        safe_p = ctypes.POINTER(ctypes.c_uint8)()
    else:
        r_lpc, order_arr, qc, shift, safe = (
            np.ascontiguousarray(a, dtype=d)
            for a, d in zip(lpc, (np.int32,) * 4 + (np.uint8,))
        )
        W, qslots = qc.shape[0], qc.shape[2]
        r_lpc_p, order_p, qc_p, shift_p = (
            _ptr(a, i32) for a in (r_lpc, order_arr, qc, shift)
        )
        safe_p = _ptr(safe, ctypes.c_uint8)
    out = {
        k: np.empty(shape, np.int32)
        for k, shape in (
            ("kind", B), ("order", B), ("method", B), ("po", B),
            ("ks", (B, 64)), ("shift", B), ("qcoeffs", (B, order_slots)),
            ("residual", (B, N)), ("subframe_bits", B), ("const_value", B),
        )
    }
    lib.plan_rice_i32_c(
        _ptr(x, i32), _ptr(bps_e, i32), B, N, max_po, W,
        r_lpc_p, order_p, qc_p, shift_p, safe_p,
        qslots, precision, order_slots,
        *(_ptr(out[k], i32) for k in (
            "kind", "order", "method", "po", "ks", "shift", "qcoeffs",
            "residual", "subframe_bits", "const_value",
        )),
    )
    out["precision"] = np.full(B, precision, np.int32)
    return out


def emit_subframes(
    x: np.ndarray,
    resid: np.ndarray,
    kind: np.ndarray,
    order: np.ndarray,
    method: np.ndarray,
    po: np.ndarray,
    ks: np.ndarray,
    ch_bps: np.ndarray,
    start_bits: np.ndarray,
    expect_bits: np.ndarray,
    buf: np.ndarray,
    total_bits: int,
) -> int:
    """OR every subframe's payload (Rice partitions / verbatim samples)
    into ``buf`` (see bitpack.cpp emit_subframes_c).

    Returns -1 on success, else the first subframe index whose emitted bit
    count disagrees with the planner's exact accounting.
    """
    lib = _load()
    assert lib, "native library unavailable"
    i32 = ctypes.c_int32
    a32 = [
        np.ascontiguousarray(a, dtype=np.int32)
        for a in (x, resid, kind, order, method, po, ks, ch_bps)
    ]
    starts = np.ascontiguousarray(start_bits, dtype=np.int64)
    expects = np.ascontiguousarray(expect_bits, dtype=np.int64)
    S, N = a32[0].shape
    return int(
        lib.emit_subframes_c(
            *(_ptr(a, i32) for a in a32),
            _ptr(starts, ctypes.c_int64), _ptr(expects, ctypes.c_int64),
            S, N, _ptr(buf, ctypes.c_uint8), total_bits,
        )
    )


def decode_frames(
    buf: np.ndarray,
    start_byte: int,
    expected_samples: int,
    channels: int,
    bits_per_sample: int,
):
    """Decode every frame of a stream in one native pass.

    Returns (samples (expected, channels) int32, frame_starts, frame_sizes)
    or None when the native decoder cannot handle the stream (the caller
    falls back to the Python decoder, which also produces precise errors).
    """
    lib = _load()
    assert lib, "native library unavailable"
    out = np.empty((expected_samples, channels), dtype=np.int32)
    cap = expected_samples // 16 + 4
    starts = np.empty(cap, dtype=np.int64)
    sizes = np.empty(cap, dtype=np.int64)
    n_frames = np.zeros(1, dtype=np.int64)
    total = lib.decode_frames_c(
        _ptr(buf, ctypes.c_uint8), buf.size, start_byte,
        expected_samples, channels, bits_per_sample,
        _ptr(out, ctypes.c_int32), _ptr(starts, ctypes.c_int64),
        _ptr(sizes, ctypes.c_int64), cap, _ptr(n_frames, ctypes.c_int64),
    )
    if total != expected_samples or n_frames[0] > cap:
        return None
    nf = int(n_frames[0])
    return out, starts[:nf], sizes[:nf]
