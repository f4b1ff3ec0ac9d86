"""Device-resident FLAC encoder: plan + emit + pack on device, download
only compressed words.

The full-device sibling of codec/fast_encoder.py (identical output bytes,
tested): planning (ops/device_codec) and bitstream assembly (ops/device_emit)
run in one jit program per chunk; the host receives

  * ``total_bits``  -- a scalar,
  * ``frame_bits``  -- (F,) int32 for CRC span layout,
  * the used prefix of the word buffer, pulled in fixed-size pages
    (static-shape slices; the worst-case tail of the buffer never moves),

then byteswaps to big-endian, patches CRC8/16 with the native C pass
(native/bitpack.cpp), and writes STREAMINFO/metadata.  Device->host traffic
is ~compressed_size + O(F) instead of ~2x raw (samples back + plan), which
is the decisive win both on PCIe and on this environment's tunneled TPU.
"""

from __future__ import annotations

import logging
import time

import numpy as np

logger = logging.getLogger("flac_raster_tpu.device_encoder")

import jax.numpy as jnp

import functools

import jax

from ..models.flac_format import (
    LAYOUT_FLAG_TOK32,
    StreamInfo,
    build_flac_header,
)
from ..ops.device_emit import plan_and_emit, worst_case_words
from .decoder import md5_of_samples
from .encoder import _BPS_CODES, _SAMPLE_RATE_CODES, EncoderConfig
from .fast_encoder import _blocksize_header, _emit_tail_frame
from ..ops.device_codec import MAX_DEVICE_BPS

__all__ = ["encode_flac_device"]

_PAGE_WORDS = 1 << 18  # 1 MB pages for device->host pulls


@functools.partial(jax.jit, static_argnames=("f_pad", "N", "C"))
def _rows_to_fcn(x_rows, *, f_pad: int, N: int, C: int):
    """(rows, C) sample rows -> zero-padded (f_pad, C, N) frame tensor.

    Runs ON DEVICE so the host never materializes the transposed copy --
    the old host-side ascontiguousarray(transpose) walked the whole raster
    once on this environment's single slow CPU core, and the per-chunk pad
    concats copied again.  Upload stays the raw contiguous row slice.
    """
    rows = x_rows.shape[0]
    x = jnp.zeros((f_pad * N, C), x_rows.dtype)
    x = jax.lax.dynamic_update_slice(x, x_rows, (0, 0)) if rows != f_pad * N \
        else x_rows
    return x.reshape(f_pad, N, C).transpose(0, 2, 1)


def _patch_crcs(buf: np.ndarray, frame_bits: np.ndarray, hdr_bits: np.ndarray) -> None:
    """Patch per-frame CRC8 (header) and CRC16 (frame) in place."""
    from .. import native

    frame_start = (np.cumsum(frame_bits) - frame_bits) >> 3
    hdr_len = hdr_bits >> 3
    fr_len = (frame_bits >> 3) - 2
    if native.available():
        native.crc8_patch(buf, frame_start, hdr_len)
        native.crc16_patch(buf, frame_start, fr_len)
        return
    from ..ops.crc import crc16, crc8

    for s, hl, fl in zip(frame_start.tolist(), hdr_len.tolist(), fr_len.tolist()):
        buf[s + hl] = crc8(buf[s : s + hl].tobytes())
        c = crc16(buf[s : s + fl].tobytes())
        buf[s + fl] = c >> 8
        buf[s + fl + 1] = c & 0xFF


def _utf8_nbytes(fi: np.ndarray) -> np.ndarray:
    thr = np.array([0x80, 0x800, 0x10000, 0x200000, 0x4000000], np.int64)
    return np.sum(fi[:, None] >= thr[None, :], axis=1) + 1


def encode_flac_device(
    samples: np.ndarray,
    sample_rate: int,
    bits_per_sample: int,
    compression_level: int = 5,
    blocksize: int = 4096,
    comments: dict[str, str] | None = None,
    vendor: str = "flac-raster-tpu",
    compute_md5: bool = True,
    padding: int = 0,
    plan_chunk_frames: int = 2048,
    zero_point: int = 0,
) -> bytes:
    """Encode int samples (n, channels) to FLAC, fully on device.

    Output bytes are identical to encode_flac_fast's (same planner, same
    layout arithmetic); only the execution placement differs.

    Args:
        zero_point: when nonzero (or when samples have a narrow unsigned
            dtype), the lossless shift normalization runs IN-GRAPH -- pass
            raw uint16/uint8/int16/int8 rasters directly and halve the
            host->device upload.  samples - zero_point must fit
            bits_per_sample.
    """
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if not 1 <= channels <= 8:
        raise ValueError("FLAC supports 1..8 channels")
    if bits_per_sample not in _BPS_CODES:
        raise ValueError(f"unsupported bits_per_sample {bits_per_sample}")
    n_full = n // blocksize
    if (
        n_full == 0
        or bits_per_sample > MAX_DEVICE_BPS
        or (blocksize & (blocksize - 1)) != 0
        or blocksize % 64 != 0
    ):
        host_samples = (
            samples.astype(np.int64) - zero_point if zero_point else samples
        )
        from .fast_encoder import encode_flac_fast

        return encode_flac_fast(
            host_samples, sample_rate, bits_per_sample, compression_level,
            blocksize, comments, vendor, compute_md5, padding,
        )
    # keep per-chunk worst-case bits < 2^31 (int32 offsets in-graph)
    max_frames = (1 << 30) // (channels * blocksize * (bits_per_sample + 2))
    plan_chunk_frames = max(1, min(plan_chunk_frames, max_frames))

    lo = -(1 << (bits_per_sample - 1))
    hi = (1 << (bits_per_sample - 1)) - 1
    smp = samples
    if zero_point:
        # shift fast lane: the dtype endpoints must be safe because the
        # subtraction happens in-graph on the raw upload
        info = np.iinfo(samples.dtype)
        if info.min - zero_point < lo or info.max - zero_point > hi:
            raise ValueError("dtype range exceeds bits_per_sample under zero_point")
    else:
        # match encode_flac_fast's drop-in contract: check the ACTUAL sample
        # range, not the dtype's (int64/int16 data that fits bps is fine)
        if smp.min() < lo or smp.max() > hi:
            raise ValueError("samples exceed bits_per_sample range")
        if smp.dtype != np.int32:
            smp = smp.astype(np.int32)

    cfg = EncoderConfig.from_level(compression_level)
    from ..ops.stereo import midside_ok

    use_ms = midside_ok(channels, bits_per_sample, cfg.mid_side, device=True)
    sr_code = _SAMPLE_RATE_CODES.get(sample_rate, 0)
    bps_code = _BPS_CODES[bits_per_sample]
    bs_code, bs_tail_val, bs_tail_bits = _blocksize_header(blocksize)

    rows = smp[: n_full * blocksize]  # (F*N, C) contiguous view, any int dtype

    static_kw = dict(
        blocksize=blocksize,
        bps=bits_per_sample,
        sr_code=sr_code,
        bps_code=bps_code,
        bs_code=bs_code,
        bs_tail_bits=bs_tail_bits,
        bs_tail_val=bs_tail_val,
        max_lpc_order=cfg.max_lpc_order,
        apodizations=cfg.apodizations,
        max_partition_order=min(cfg.max_partition_order, 6),
        use_lpc=cfg.use_lpc,
        mid_side=use_ms,
    )

    # Pipeline: dispatch up to _INFLIGHT chunks ahead (jax dispatch is async),
    # then drain results -- device compute of chunk i+1 overlaps the host's
    # readback + CRC pass of chunk i.
    bounds = [
        (c0, min(c0 + plan_chunk_frames, n_full))
        for c0 in range(0, n_full, plan_chunk_frames)
    ]
    inflight: list[tuple[int, int, dict]] = []
    chunks: list[bytes] = []
    sizes: list[np.ndarray] = []
    subs: list[np.ndarray] = []

    from ..utils.profiling import restore_cpu_affinity, tame_device_client_threads

    restore_cpu_affinity()
    tame_device_client_threads()
    debug = logger.isEnabledFor(logging.DEBUG)

    # Uploads are staged one chunk ahead on a DAEMON producer thread: if
    # host->device transfer blocks (backend-dependent; the dev tunnel moves
    # ~raw_size at ~40 MB/s), it overlaps the previous chunk's drain work
    # instead of serializing inside dispatch.  A daemon thread (not a
    # ThreadPoolExecutor) so a transfer that hangs on a dead backend can
    # never wedge interpreter exit via concurrent.futures' atexit join;
    # the bounded queue keeps exactly one upload staged ahead.
    import queue
    import threading

    from ..utils.profiling import protect_current_thread

    up_q: queue.Queue = queue.Queue(maxsize=1)
    up_cancel = threading.Event()

    def _upload_producer() -> None:
        protect_current_thread()  # keep full priority vs the spinners
        try:
            for c0_, c1_ in bounds:
                # contiguous row slice uploads copy-free
                x = jax.device_put(rows[c0_ * blocksize : c1_ * blocksize])
                while not up_cancel.is_set():
                    try:
                        up_q.put(x, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if up_cancel.is_set():
                    return
        except BaseException as exc:  # noqa: BLE001 -- re-raised by consumer
            try:
                up_q.put(exc, timeout=5)
            except queue.Full:
                pass

    def dispatch(c0: int, c1: int, xr_dev) -> dict:
        t0 = time.perf_counter() if debug else 0.0
        Fc = c1 - c0
        f_pad = min(1 << max(0, (Fc - 1)).bit_length(), plan_chunk_frames)
        # pad + (F,N,C)->(F,C,N) relayout happen in-graph (_rows_to_fcn)
        xc = _rows_to_fcn(xr_dev, f_pad=f_pad, N=blocksize, C=channels)
        n_words = worst_case_words(
            f_pad, channels, blocksize, bits_per_sample + (1 if use_ms else 0)
        )
        n_words = ((n_words + _PAGE_WORDS - 1) // _PAGE_WORDS) * _PAGE_WORDS
        out = plan_and_emit(
            xc, jnp.int32(c0), n_words=n_words,
            zero_point=zero_point, **static_kw
        )
        if debug:
            logger.debug("dispatch f%d..%d: %.3fs", c0, c1, time.perf_counter() - t0)
        return out

    def start_drain(c0: int, c1: int, out: dict) -> tuple:
        """Sync on the cheap per-frame outputs and KICK OFF the big word
        pull as an async device->host copy; the tunnel transfer then
        overlaps the previous chunk's CRC pass and the next chunk's device
        compute instead of blocking the main thread."""
        tame_device_client_threads()  # client threads spawn lazily
        t0 = time.perf_counter() if debug else 0.0
        Fc = c1 - c0
        frame_bits = np.asarray(out["frame_bits"][:Fc])
        # padded frames emit past the real frames' total bits; truncate there
        total_bits = int(frame_bits.sum())
        used_words = (total_bits + 31) // 32
        # pull the used prefix in one bucketed slice; buckets are {1, 1.5} x
        # powers of two pages, so overfetch is <= 33% (was <= 100% with pure
        # powers of two) while compiled slice shapes stay O(log n)
        used_pages = (used_words + _PAGE_WORDS - 1) // _PAGE_WORDS
        n_pages = out["words"].shape[0] // _PAGE_WORDS
        p2 = 1 << max(0, (used_pages - 1)).bit_length()
        if p2 > 2 and used_pages <= (p2 * 3) // 4:
            p2 = (p2 * 3) // 4
        p2 = min(max(p2, 1), n_pages)
        words_dev = out["words"][: p2 * _PAGE_WORDS]
        try:
            words_dev.copy_to_host_async()
        except Exception:  # noqa: BLE001 -- a backend without the hint
            pass           # still materializes in finish_drain
        sub_dev = out["subframe_bits"][:Fc, :-1]
        if debug:
            logger.debug(
                "start_drain f%d..%d: sync %.3fs, async pull of %.1f MB",
                c0, c1, time.perf_counter() - t0, p2 * _PAGE_WORDS * 4 / 1e6,
            )
        return (c0, c1, frame_bits, words_dev, sub_dev)

    def finish_drain(state: tuple) -> None:
        c0, c1, frame_bits, words_dev, sub_dev = state
        t0 = time.perf_counter() if debug else 0.0
        words = np.asarray(words_dev)
        if debug:
            logger.debug(
                "finish_drain f%d..%d: wait %.3fs", c0, c1,
                time.perf_counter() - t0,
            )
        n_bytes = (int(frame_bits.sum()) + 7) // 8
        buf = np.frombuffer(
            words.astype(">u4", copy=False).tobytes(), np.uint8
        )[:n_bytes].copy()
        fi = np.arange(c0, c1)
        hdr_bits = 32 + _utf8_nbytes(fi) * 8 + bs_tail_bits
        _patch_crcs(buf, frame_bits.astype(np.int64), hdr_bits.astype(np.int64))
        chunks.append(buf.tobytes())
        sizes.append((frame_bits >> 3).astype(np.int64))
        subs.append(np.asarray(sub_dev).astype(np.int64))

    _INFLIGHT = 3
    started: tuple | None = None

    def advance_drain() -> None:
        nonlocal started
        nxt = start_drain(*inflight.pop(0))
        if started is not None:
            finish_drain(started)
        started = nxt

    if bounds:
        threading.Thread(
            target=_upload_producer, daemon=True, name="frtpu-up"
        ).start()
    try:
        for c0, c1 in bounds:
            xr_dev = up_q.get()
            if isinstance(xr_dev, BaseException):
                raise xr_dev
            inflight.append((c0, c1, dispatch(c0, c1, xr_dev)))
            if len(inflight) >= _INFLIGHT:
                advance_drain()
        while inflight:
            advance_drain()
        if started is not None:
            finish_drain(started)
    finally:
        # unblock a producer waiting on the full queue, then let it exit
        up_cancel.set()
        try:
            up_q.get_nowait()
        except queue.Empty:
            pass

    if n_full * blocksize < n:
        tail = smp[n_full * blocksize :].astype(np.int64) - zero_point
        chunks.append(
            _emit_tail_frame(tail, n_full, bits_per_sample, sr_code, bps_code, cfg)
        )
        sizes.append(np.array([len(chunks[-1])], np.int64))
        subs.append(np.zeros((1, channels - 1), np.int64))

    all_sizes = np.concatenate(sizes)
    all_subs = np.concatenate(subs) if channels > 1 else None
    md5 = (
        md5_of_samples(samples.astype(np.int64) - zero_point, bits_per_sample)
        if compute_md5
        else b"\x00" * 16
    )
    streaminfo = StreamInfo(
        min_blocksize=blocksize,
        max_blocksize=blocksize,
        min_framesize=int(all_sizes.min()),
        max_framesize=int(all_sizes.max()),
        sample_rate=sample_rate,
        channels=channels,
        bits_per_sample=bits_per_sample,
        total_samples=n,
        md5=md5,
    )
    header = build_flac_header(streaminfo, comments, vendor, padding,
                               frame_sizes=all_sizes, sub_bits=all_subs,
                               layout_flags=LAYOUT_FLAG_TOK32)
    return bytes(header) + b"".join(chunks)
