"""Batched FLAC encoder: device block planning + vectorized array emission.

The reference encodes through libFLAC's sequential bitwriter one 4096-sample
block at a time (``converter.py:153``, SURVEY.md §3.1 hot loop #2).  Here the
whole stream is encoded as a handful of array programs:

  1. **Plan** (device, jit): ops/device_codec.plan_blocks chooses predictor,
     Rice partitioning, and exact bit counts for every block at once.
  2. **Layout** (host, vectorized): every token's absolute bit offset is
     *computed arithmetically* from the plan's exact bit counts -- frame
     starts are a cumsum of frame sizes, subframe starts a cumsum of
     subframe sizes, sample offsets a cumsum of token lengths plus the
     Rice-parameter prefix ``pbits * (partition_index + 1)``.  No sequential
     bitwriter exists at all.
  3. **Pack** (host, vectorized): all tokens scatter-OR into the output
     buffer in one ``pack_tokens`` call per chunk (ops/bitpack.py).
  4. **Patch**: frame CRC8/CRC16 are computed for all frames in a chunk in
     one table-driven batch pass (ops/crc.py) and written in place.

Output is spec-conformant FLAC, decoded bit-exactly by codec/decoder.py and
byte-compatible with the reference toolchain's readers.  The tail frame (a
partial block) and sub-block streams reuse the scalar reference encoder
(codec/encoder.py), which shares all format logic.

Stream structure notes: fixed-blocksize stream, independent channels (no
mid-side -- raster bands are not stereo audio), wasted-bits never used.
"""

from __future__ import annotations

import numpy as np

from ..models.flac_format import StreamInfo, build_flac_header
from ..ops.bitpack import pack_tokens
from ..ops.crc import crc8_rows, crc16_rows
from ..ops.device_codec import (
    KIND_CONSTANT,
    KIND_FIXED,
    KIND_LPC,
    KIND_VERBATIM,
    MAX_DEVICE_BPS,
    make_planner,
)
from .decoder import md5_of_samples
from .encoder import (
    _BLOCKSIZE_CODES,
    _BPS_CODES,
    _SAMPLE_RATE_CODES,
    EncoderConfig,
    _emit_subframe,
    _plan_subframe,
    _TokenSink,
    _utf8_coded_number,
    encode_flac,
)

__all__ = ["encode_flac_fast", "encode_flac_batch"]


def _default_planner(blocksize: int, bps: int, cfg: "EncoderConfig"):
    """Device planner for narrow samples; numpy host planner for bps > 26.

    With more than one visible device the block batch is sharded across all
    of them (blocks are independent, so this is pure data parallelism --
    SURVEY.md §2.4's block-parallel mapping); padding in the callers keeps
    batch sizes divisible.
    """
    if bps > MAX_DEVICE_BPS:
        from ..ops.host_planner import plan_blocks_host

        def planner(blocks):
            return plan_blocks_host(
                blocks,
                blocksize=blocksize,
                bps=bps,
                max_lpc_order=min(cfg.max_lpc_order, 8),
                max_partition_order=min(cfg.max_partition_order, 6),
                use_lpc=cfg.use_lpc,
            )

        return planner
    base = make_planner(
        blocksize=blocksize,
        bps=bps,
        max_lpc_order=min(cfg.max_lpc_order, 8),
        max_partition_order=min(cfg.max_partition_order, 6),
        use_lpc=cfg.use_lpc,
    )
    import jax

    devs = jax.devices()
    if len(devs) <= 1:
        return base
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(devs), ("blocks",))
    shard = NamedSharding(mesh, P("blocks"))

    def sharded_planner(blocks):
        n_dev = len(devs)
        B = blocks.shape[0]
        pad = (-B) % n_dev
        if pad:
            blocks = np.concatenate(
                [blocks, np.zeros((pad, blocks.shape[1]), blocks.dtype)]
            )
        import jax.numpy as jnp

        plan = base(jax.device_put(jnp.asarray(blocks), shard))
        if pad:
            plan = {k: v[:B] for k, v in plan.items()}
        return plan

    return sharded_planner

_UTF8_THRESHOLDS = np.array(
    [0x80, 0x800, 0x10000, 0x200000, 0x4000000, 0x80000000], dtype=np.int64
)
_UTF8_PREFIX = np.array([0x00, 0xC0, 0xE0, 0xF0, 0xF8, 0xFC], dtype=np.int64)


def _utf8_tokens(frame_numbers: np.ndarray):
    """Vectorized FLAC UTF-8-style frame-number coding.

    Args:
        frame_numbers: (F,) int64 frame indices (< 2^31).
    Returns:
        values (F, 6) uint64, lengths (F, 6) int64 (0 for unused slots),
        n_bytes (F,) int64.
    """
    fi = frame_numbers.astype(np.int64)
    n_bytes = np.searchsorted(_UTF8_THRESHOLDS, fi, side="right") + 1  # (F,)
    j = np.arange(6)[None, :]
    nb = n_bytes[:, None]
    used = j < nb
    # continuation shift for byte j: 6 * (n_bytes - 1 - j)
    shift = np.maximum(6 * (nb - 1 - j), 0)
    payload = fi[:, None] >> shift
    first = j == 0
    vals = np.where(
        first,
        _UTF8_PREFIX[nb.clip(1, 6) - 1] | payload,
        0x80 | (payload & 0x3F),
    )
    vals = np.where(used, vals, 0)
    lens = np.where(used, 8, 0)
    return vals.astype(np.uint64), lens.astype(np.int64), n_bytes


def _blocksize_header(blocksize: int) -> tuple[int, int, int]:
    """(bs_code, tail_value, tail_bits) for a full frame of ``blocksize``."""
    if blocksize in _BLOCKSIZE_CODES:
        return _BLOCKSIZE_CODES[blocksize], 0, 0
    if blocksize <= 256:
        return 6, blocksize - 1, 8
    return 7, blocksize - 1, 16


class _Group:
    """Accumulates token arrays (values, lengths, absolute bit offsets)."""

    def __init__(self):
        self.v: list[np.ndarray] = []
        self.l: list[np.ndarray] = []
        self.o: list[np.ndarray] = []

    def add(self, values, lengths, offsets):
        self.v.append(np.ascontiguousarray(values, dtype=np.uint64).ravel())
        self.l.append(np.ascontiguousarray(lengths, dtype=np.int64).ravel())
        self.o.append(np.ascontiguousarray(offsets, dtype=np.int64).ravel())

    def pack_array(self, total_bits: int) -> np.ndarray:
        """Pack to a mutable uint8 array (native C packer when available)."""
        v = np.concatenate(self.v)
        l = np.concatenate(self.l)
        o = np.concatenate(self.o)
        # zero-length tokens may carry garbage offsets; neutralize them
        o = np.where(l > 0, o, 0)
        from .. import native

        if native.available():
            return native.pack_tokens_native(v, l, o, total_bits)
        return np.frombuffer(pack_tokens(v, l, o, total_bits), np.uint8).copy()


def _emit_chunk(
    x: np.ndarray,
    plan: dict,
    frame0: int,
    blocksize: int,
    bps: int,
    sr_code: int,
    bps_code: int,
) -> tuple[bytes, np.ndarray]:
    """Emit one chunk of full frames.

    Args:
        x: (F, C, N) int64 original samples.
        plan: planner output arrays reshaped to (F, C, ...), numpy.
        frame0: absolute index of the first frame in this chunk.
    Returns:
        (packed bytes for the chunk, per-frame byte sizes (F,))
    """
    F, C, N = x.shape
    log2n = N.bit_length() - 1
    assert (1 << log2n) == N, "full-frame path requires power-of-two blocksize"

    kind = plan["kind"].astype(np.int64)
    order = plan["order"].astype(np.int64)
    method = plan["method"].astype(np.int64)
    po = plan["po"].astype(np.int64)
    ks = plan["ks"].astype(np.int64)          # (F, C, 64)
    precision = plan["precision"].astype(np.int64)
    shift = plan["shift"].astype(np.int64)
    qcoeffs = plan["qcoeffs"].astype(np.int64)  # (F, C, 8)
    sf_bits = plan["subframe_bits"].astype(np.int64)
    residual = plan["residual"].astype(np.int64)  # (F, C, N)

    is_rice = (kind == KIND_FIXED) | (kind == KIND_LPC)
    is_lpc = kind == KIND_LPC
    is_verb = kind == KIND_VERBATIM
    is_const = kind == KIND_CONSTANT
    bpsmask = np.uint64((1 << bps) - 1)

    # ---- frame/subframe layout (pure arithmetic) --------------------------
    utf8_v, utf8_l, n_bytes = _utf8_tokens(np.arange(frame0, frame0 + F))
    bs_code, bs_tail_val, bs_tail_bits = _blocksize_header(blocksize)
    hdr_bits = 32 + n_bytes * 8 + bs_tail_bits          # (F,) before crc8
    body_bits = sf_bits.sum(axis=1)                     # (F,)
    raw = hdr_bits + 8 + body_bits
    pad = (-raw) % 8
    frame_bits = raw + pad + 16
    frame_start = np.zeros(F, np.int64)
    np.cumsum(frame_bits[:-1], out=frame_start[1:])
    total_bits = int(frame_start[-1] + frame_bits[-1]) if F else 0

    sf_excl = np.zeros((F, C), np.int64)
    np.cumsum(sf_bits[:, :-1], axis=1, out=sf_excl[:, 1:])
    sf_start = (frame_start + hdr_bits + 8)[:, None] + sf_excl  # (F, C)

    lpcmeta_bits = np.where(is_lpc, 4 + 5 + order * precision, 0)
    payload_base = np.where(is_rice, 8 + order * bps + lpcmeta_bits + 6, 8)
    pbits = 4 + method

    g = _Group()

    # ---- frame header ------------------------------------------------------
    hdr32 = (
        (0b11111111111110 << 18)
        | (bs_code << 12)
        | (sr_code << 8)
        | ((C - 1) << 4)
        | (bps_code << 1)
    )
    g.add(np.full(F, hdr32, np.uint64), np.full(F, 32, np.int64), frame_start)
    g.add(utf8_v, utf8_l, frame_start[:, None] + 32 + np.arange(6)[None, :] * 8)
    if bs_tail_bits:
        g.add(
            np.full(F, bs_tail_val, np.uint64),
            np.full(F, bs_tail_bits, np.int64),
            frame_start + 32 + n_bytes * 8,
        )
    # crc8 / crc16 are zero in the packed buffer and patched afterwards.

    # ---- subframe headers ----------------------------------------------------
    type_code = np.select(
        [is_const, is_verb, kind == KIND_FIXED, is_lpc],
        [0, 1, 0b001000 | order, 0b100000 | np.maximum(order - 1, 0)],
    )
    g.add((type_code.astype(np.uint64)) << np.uint64(1), np.full((F, C), 8, np.int64), sf_start)

    # warmup samples (fixed + lpc)
    j8 = np.arange(8)
    wu_used = (j8[None, None, :] < order[:, :, None]) & is_rice[:, :, None]
    wu_vals = (x[:, :, :8].astype(np.int64) & np.int64((1 << bps) - 1)).astype(np.uint64)
    g.add(
        np.where(wu_used, wu_vals, 0),
        np.where(wu_used, bps, 0),
        sf_start[:, :, None] + 8 + j8[None, None, :] * bps,
    )

    # lpc meta: precision-1 (4), shift (5), qcoeffs (order x precision)
    lpc_base = sf_start + 8 + order * bps
    g.add(
        np.where(is_lpc, precision - 1, 0).astype(np.uint64),
        np.where(is_lpc, 4, 0),
        lpc_base,
    )
    g.add(
        np.where(is_lpc, shift & 0x1F, 0).astype(np.uint64),
        np.where(is_lpc, 5, 0),
        lpc_base + 4,
    )
    cf_used = (j8[None, None, :] < order[:, :, None]) & is_lpc[:, :, None]
    prec_mask = (np.int64(1) << precision) - 1
    cf_vals = (qcoeffs & prec_mask[:, :, None]).astype(np.uint64)
    g.add(
        np.where(cf_used, cf_vals, 0),
        np.where(cf_used, precision[:, :, None], 0),
        lpc_base[:, :, None] + 9 + j8[None, None, :] * precision[:, :, None],
    )

    # residual coding method + partition order (6 bits)
    g.add(
        np.where(is_rice, (method << 4) | po, 0).astype(np.uint64),
        np.where(is_rice, 6, 0),
        lpc_base + lpcmeta_bits,
    )

    # constant value
    g.add(
        np.where(is_const, x[:, :, 0] & np.int64((1 << bps) - 1), 0).astype(np.uint64),
        np.where(is_const, bps, 0),
        sf_start + 8,
    )

    # ---- sample tokens -------------------------------------------------------
    i = np.arange(N)[None, None, :]
    part = i >> (log2n - po)[:, :, None]                    # (F, C, N)
    k = np.take_along_axis(ks, part, axis=2)                # (F, C, N)
    z = ((residual << 1) ^ (residual >> 63)).astype(np.uint64)
    ku = k.astype(np.uint64)
    q = (z >> ku).astype(np.int64)
    in_resid = i >= order[:, :, None]
    rice_tok = is_rice[:, :, None] & in_resid
    L = np.where(rice_tok, q + 1 + k, np.where(is_verb[:, :, None], bps, 0))
    vals = np.where(
        rice_tok,
        (np.uint64(1) << ku) | (z & ((np.uint64(1) << ku) - np.uint64(1))),
        (x & np.int64((1 << bps) - 1)).astype(np.uint64),
    )
    E = np.zeros_like(L)
    np.cumsum(L[:, :, :-1], axis=2, out=E[:, :, 1:])        # exclusive cumsum
    sample_off = (
        sf_start[:, :, None]
        + payload_base[:, :, None]
        + np.where(rice_tok, pbits[:, :, None] * (part + 1), 0)
        + E
    )
    g.add(vals, L, sample_off)

    # rice partition-parameter tokens
    p64 = np.arange(64)[None, None, :]
    p_used = (p64 < (np.int64(1) << po)[:, :, None]) & is_rice[:, :, None]
    sp = np.minimum(p64 << (log2n - po)[:, :, None], N - 1)  # partition start sample
    Ep = np.take_along_axis(E, sp, axis=2)
    k_off = sf_start[:, :, None] + payload_base[:, :, None] + pbits[:, :, None] * p64 + Ep
    g.add(
        np.where(p_used, ks, 0).astype(np.uint64),
        np.where(p_used, pbits[:, :, None], 0),
        k_off,
    )

    # consistency: computed layout must match the planner's exact bit counts
    sf_total = payload_base + np.where(is_rice, (pbits << po), 0) + E[:, :, -1] + L[:, :, -1]
    sf_expected = np.where(is_const, 8 + bps, sf_bits)
    if not np.array_equal(np.where(is_const, 8 + bps, sf_total), sf_expected):
        bad = np.argwhere(np.where(is_const, 8 + bps, sf_total) != sf_expected)
        raise AssertionError(f"emitter/planner bit mismatch at {bad[:4]}")

    buf = g.pack_array(total_bits)

    # ---- CRC patching --------------------------------------------------------
    from .. import native

    fs_byte = frame_start >> 3
    hdr_len = (hdr_bits >> 3).astype(np.int64)
    fr_len = ((frame_bits >> 3) - 2).astype(np.int64)
    if native.available():
        native.crc8_patch(buf, fs_byte, hdr_len)
        native.crc16_patch(buf, fs_byte, fr_len)
        return buf.tobytes(), (frame_bits >> 3)

    hmax = int(hdr_len.max())
    hmat = np.zeros((F, hmax), np.uint8)
    for fidx in range(F):
        s, ln = int(fs_byte[fidx]), int(hdr_len[fidx])
        hmat[fidx, hmax - ln :] = buf[s : s + ln]
    h8 = crc8_rows(hmat)
    for fidx in range(F):
        buf[int(fs_byte[fidx] + hdr_len[fidx])] = int(h8[fidx])

    fmax = int(fr_len.max())
    fmat = np.zeros((F, fmax), np.uint8)
    for fidx in range(F):
        s, ln = int(fs_byte[fidx]), int(fr_len[fidx])
        fmat[fidx, fmax - ln :] = buf[s : s + ln]
    f16 = crc16_rows(fmat)
    for fidx in range(F):
        e = int(fs_byte[fidx] + fr_len[fidx])
        buf[e] = int(f16[fidx]) >> 8
        buf[e + 1] = int(f16[fidx]) & 0xFF

    return buf.tobytes(), (frame_bits >> 3)


def _emit_tail_frame(
    x_tail: np.ndarray,
    frame_number: int,
    bps: int,
    sr_code: int,
    bps_code: int,
    cfg: EncoderConfig,
) -> bytes:
    """Scalar emission of the final partial frame (shares encoder.py logic)."""
    from ..ops.crc import crc16 as crc16_one, crc8 as crc8_one

    bs, channels = x_tail.shape
    sink = _TokenSink()
    sink.put(0b11111111111110, 14)
    sink.put(0, 1)
    sink.put(0, 1)
    if bs in _BLOCKSIZE_CODES:
        code, tail = _BLOCKSIZE_CODES[bs], None
    elif bs <= 256:
        code, tail = 6, (bs - 1, 8)
    else:
        code, tail = 7, (bs - 1, 16)
    sink.put(code, 4)
    sink.put(sr_code, 4)
    sink.put(channels - 1, 4)
    sink.put(bps_code, 3)
    sink.put(0, 1)
    for val, nbits in _utf8_coded_number(frame_number):
        sink.put(val, nbits)
    if tail is not None:
        sink.put(*tail)
    hdr_end = sink.bit_pos // 8
    sink.put(0, 8)  # crc8 placeholder
    for ci in range(channels):
        xc = x_tail[:, ci].astype(np.int64)
        plan = _plan_subframe(xc, bps, cfg)
        _emit_subframe(sink, plan, xc, bps)
    padb = (-sink.bit_pos) % 8
    if padb:
        sink.put(0, padb)
    body = bytearray(sink.pack())
    body[hdr_end] = crc8_one(bytes(body[:hdr_end]))
    c16 = crc16_one(bytes(body))
    return bytes(body) + bytes([c16 >> 8, c16 & 0xFF])


def encode_flac_fast(
    samples: np.ndarray,
    sample_rate: int,
    bits_per_sample: int,
    compression_level: int = 5,
    blocksize: int = 4096,
    comments: dict[str, str] | None = None,
    vendor: str = "flac-raster-tpu",
    compute_md5: bool = True,
    padding: int = 0,
    planner=None,
    plan_chunk_frames: int = 1024,
) -> bytes:
    """Encode int samples (n, channels) to FLAC via the device planner.

    Drop-in replacement for codec.encoder.encode_flac (same output contract;
    the byte stream may differ -- both are valid FLAC that decode to the same
    samples).  Falls back to the scalar encoder for streams shorter than one
    block or wider than MAX_DEVICE_BPS bits.

    Args:
        planner: optional ``fn(blocks (B, N) int32) -> plan`` override (e.g.
            a pre-jitted/sharded planner from parallel/).
        plan_chunk_frames: frames planned+emitted per chunk (bounds memory).
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
        or (blocksize & (blocksize - 1)) != 0
        or blocksize % 64 != 0
    ):
        return encode_flac(
            samples, sample_rate, bits_per_sample, compression_level,
            blocksize, comments, vendor, compute_md5, padding,
        )
    lo = -(1 << (bits_per_sample - 1))
    hi = (1 << (bits_per_sample - 1)) - 1
    smp = samples.astype(np.int64, copy=False)
    if smp.min() < lo or smp.max() > hi:
        raise ValueError("samples exceed bits_per_sample range")

    cfg = EncoderConfig.from_level(compression_level)
    wide = bits_per_sample > MAX_DEVICE_BPS
    if planner is None:
        planner = _default_planner(blocksize, bits_per_sample, cfg)
    sr_code = _SAMPLE_RATE_CODES.get(sample_rate, 0)
    bps_code = _BPS_CODES[bits_per_sample]
    block_dtype = np.int64 if wide else np.int32

    # (n, C) -> (F, C, N) full blocks
    full = smp[: n_full * blocksize].reshape(n_full, blocksize, channels)
    full = np.ascontiguousarray(full.transpose(0, 2, 1))  # (F, C, N)

    chunks: list[bytes] = []
    sizes: list[np.ndarray] = []
    for c0 in range(0, n_full, plan_chunk_frames):
        c1 = min(c0 + plan_chunk_frames, n_full)
        xc = full[c0:c1]
        Fc = c1 - c0
        blocks = xc.reshape(Fc * channels, blocksize).astype(block_dtype)
        # Pad the batch to a power-of-two bucket so jit compiles only
        # O(log(max_chunk)) distinct shapes instead of one per file size.
        B = blocks.shape[0]
        b_pad = 1 << max(0, (B - 1)).bit_length()
        if b_pad != B:
            blocks = np.concatenate(
                [blocks, np.zeros((b_pad - B, blocksize), block_dtype)], axis=0
            )
        plan_dev = planner(blocks)
        plan = {
            key: np.asarray(val)[:B].reshape(
                (Fc, channels) + np.asarray(val).shape[1:]
            )
            for key, val in plan_dev.items()
        }
        data, fsizes = _emit_chunk(
            xc, plan, c0, blocksize, bits_per_sample, sr_code, bps_code
        )
        chunks.append(data)
        sizes.append(fsizes)

    if n_full * blocksize < n:
        tail = smp[n_full * blocksize :]
        chunks.append(
            _emit_tail_frame(tail, n_full, bits_per_sample, sr_code, bps_code, cfg)
        )
        sizes.append(np.array([len(chunks[-1])], np.int64))

    all_sizes = np.concatenate(sizes)
    md5 = md5_of_samples(samples.astype(np.int32), bits_per_sample) if compute_md5 else b"\x00" * 16
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
    header = build_flac_header(streaminfo, comments, vendor, padding)
    return bytes(header) + b"".join(chunks)


def encode_flac_batch(
    samples_batch: np.ndarray,
    sample_rate: int,
    bits_per_sample: int,
    compression_level: int = 5,
    blocksize: int = 4096,
    comments_list=None,
    vendor: str = "flac-raster-tpu",
    compute_md5: bool = True,
    planner=None,
    plan_chunk_blocks: int = 4096,
) -> list[bytes]:
    """Encode a batch of same-shaped streams with ONE device planning pass.

    This is the tile-data-parallel entry point (SURVEY.md §2.4): all tiles'
    blocks are planned in a single batched program (sharded across the mesh
    by parallel/tile_engine when more than one device is visible), and only
    the per-tile byte assembly runs on host.

    Args:
        samples_batch: (T, n, channels) int samples.
        comments_list: optional per-tile VORBIS comment dicts (len T).
    Returns:
        list of T complete FLAC streams.
    """
    samples_batch = np.asarray(samples_batch)
    if samples_batch.ndim == 2:
        samples_batch = samples_batch[:, :, None]
    T, n, channels = samples_batch.shape
    if comments_list is None:
        comments_list = [None] * T
    n_full = n // blocksize
    if (
        T == 0
        or n_full == 0
        or (blocksize & (blocksize - 1)) != 0
        or blocksize % 64 != 0
    ):
        return [
            encode_flac(
                samples_batch[t], sample_rate, bits_per_sample,
                compression_level, blocksize, comments_list[t], vendor,
                compute_md5,
            )
            for t in range(T)
        ]

    cfg = EncoderConfig.from_level(compression_level)
    if planner is None:
        planner = _default_planner(blocksize, bits_per_sample, cfg)
    sr_code = _SAMPLE_RATE_CODES.get(sample_rate, 0)
    bps_code = _BPS_CODES[bits_per_sample]
    block_dtype = np.int64 if bits_per_sample > MAX_DEVICE_BPS else np.int32

    smp = samples_batch.astype(np.int64, copy=False)
    full = smp[:, : n_full * blocksize].reshape(T, n_full, blocksize, channels)
    full = np.ascontiguousarray(full.transpose(0, 1, 3, 2))  # (T, F, C, N)
    blocks_per_tile = n_full * channels
    all_blocks = full.reshape(T * blocks_per_tile, blocksize).astype(block_dtype)

    # one batched planning pass, chunked + bucketed to bound memory/compiles
    plan_parts: dict[str, list[np.ndarray]] = {}
    B_total = all_blocks.shape[0]
    step = max(plan_chunk_blocks, blocks_per_tile)
    for b0 in range(0, B_total, step):
        b1 = min(b0 + step, B_total)
        blocks = all_blocks[b0:b1]
        B = blocks.shape[0]
        b_pad = 1 << max(0, (B - 1)).bit_length()
        if b_pad != B:
            blocks = np.concatenate(
                [blocks, np.zeros((b_pad - B, blocksize), block_dtype)], axis=0
            )
        plan_dev = planner(blocks)
        for key, val in plan_dev.items():
            plan_parts.setdefault(key, []).append(np.asarray(val)[:B])
    plan_all = {
        key: np.concatenate(parts).reshape(
            (T, n_full, channels) + parts[0].shape[1:]
        )
        for key, parts in plan_parts.items()
    }

    out: list[bytes] = []
    for t in range(T):
        plan_t = {key: val[t] for key, val in plan_all.items()}
        data, fsizes = _emit_chunk(
            full[t], plan_t, 0, blocksize, bits_per_sample, sr_code, bps_code
        )
        chunks = [data]
        sizes = [fsizes]
        if n_full * blocksize < n:
            tail = smp[t, n_full * blocksize :]
            chunks.append(
                _emit_tail_frame(tail, n_full, bits_per_sample, sr_code, bps_code, cfg)
            )
            sizes.append(np.array([len(chunks[-1])], np.int64))
        all_sizes = np.concatenate(sizes)
        md5 = (
            md5_of_samples(samples_batch[t].astype(np.int32), bits_per_sample)
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
        header = build_flac_header(streaminfo, comments_list[t], vendor)
        out.append(bytes(header) + b"".join(chunks))
    return out
