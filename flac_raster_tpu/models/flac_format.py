"""FLAC container model: metadata blocks (STREAMINFO, VORBIS_COMMENT, PADDING).

The reference writes these through libFLAC and then *rewrites* the file with
mutagen to inject GEOSPATIAL_* comments (reference ``converter.py:263-327``,
``spatial_encoder.py:309-407``) -- which is how its spatial format acquired
the offset-staleness bug noted in SURVEY.md §2.3 Q3.  Here the container is a
first-class model: headers (including all geospatial comments) are built
up-front at encode time, so tile byte offsets never move after the fact.

Format facts (FLAC spec / RFC 9639):
  * stream = b"fLaC" + metadata blocks + frames
  * metadata block header: 1 bit last-flag, 7 bits type, 24-bit big-endian
    payload length.  Types: 0 STREAMINFO, 1 PADDING, 4 VORBIS_COMMENT.
  * STREAMINFO payload is 34 bytes (fields below).
  * VORBIS_COMMENT payload is little-endian length-prefixed UTF-8 strings.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

__all__ = [
    "StreamInfo",
    "MetadataBlock",
    "parse_flac_metadata",
    "build_flac_header",
    "serialize_vorbis_comments",
    "parse_vorbis_comments",
    "BLOCK_STREAMINFO",
    "BLOCK_APPLICATION",
    "serialize_layout_block",
    "parse_layout_block",
    "LAYOUT_APP_ID",
    "BLOCK_PADDING",
    "BLOCK_VORBIS_COMMENT",
    "FLAC_MAGIC",
]

FLAC_MAGIC = b"fLaC"
BLOCK_STREAMINFO = 0
BLOCK_PADDING = 1
BLOCK_APPLICATION = 2
BLOCK_VORBIS_COMMENT = 4


@dataclass
class StreamInfo:
    min_blocksize: int
    max_blocksize: int
    min_framesize: int
    max_framesize: int
    sample_rate: int
    channels: int
    bits_per_sample: int
    total_samples: int
    md5: bytes = b"\x00" * 16

    def to_bytes(self) -> bytes:
        v = 0
        v = (v << 16) | self.min_blocksize
        v = (v << 16) | self.max_blocksize
        v = (v << 24) | self.min_framesize
        v = (v << 24) | self.max_framesize
        v = (v << 20) | self.sample_rate
        v = (v << 3) | (self.channels - 1)
        v = (v << 5) | (self.bits_per_sample - 1)
        v = (v << 36) | self.total_samples
        return v.to_bytes(18, "big") + (self.md5 + b"\x00" * 16)[:16]

    @classmethod
    def from_bytes(cls, data: bytes) -> "StreamInfo":
        if len(data) < 34:
            raise ValueError("STREAMINFO must be 34 bytes")
        v = int.from_bytes(data[:18], "big")
        total_samples = v & ((1 << 36) - 1)
        v >>= 36
        bps = (v & 31) + 1
        v >>= 5
        channels = (v & 7) + 1
        v >>= 3
        sample_rate = v & ((1 << 20) - 1)
        v >>= 20
        max_framesize = v & ((1 << 24) - 1)
        v >>= 24
        min_framesize = v & ((1 << 24) - 1)
        v >>= 24
        max_blocksize = v & 0xFFFF
        v >>= 16
        min_blocksize = v & 0xFFFF
        return cls(
            min_blocksize=min_blocksize,
            max_blocksize=max_blocksize,
            min_framesize=min_framesize,
            max_framesize=max_framesize,
            sample_rate=sample_rate,
            channels=channels,
            bits_per_sample=bps,
            total_samples=total_samples,
            md5=data[18:34],
        )


@dataclass
class MetadataBlock:
    block_type: int
    data: bytes
    is_last: bool = False


def serialize_vorbis_comments(
    comments: dict[str, str], vendor: str = "flac-raster-tpu"
) -> bytes:
    """VORBIS_COMMENT payload.  NOTE: lengths are little-endian (unlike the
    rest of FLAC)."""
    out = bytearray()
    vb = vendor.encode("utf-8")
    out += struct.pack("<I", len(vb)) + vb
    out += struct.pack("<I", len(comments))
    for key, value in comments.items():
        entry = f"{key}={value}".encode("utf-8")
        out += struct.pack("<I", len(entry)) + entry
    return bytes(out)


def parse_vorbis_comments(data: bytes) -> tuple[str, dict[str, list[str]]]:
    """Parse a VORBIS_COMMENT payload -> (vendor, {KEY: [values...]}).

    Keys are upper-cased (vorbis keys are case-insensitive); repeated keys
    accumulate, matching mutagen's list-valued access in the reference
    (``converter.py:358``)."""
    pos = 0
    (vlen,) = struct.unpack_from("<I", data, pos)
    pos += 4
    vendor = data[pos : pos + vlen].decode("utf-8", errors="replace")
    pos += vlen
    (count,) = struct.unpack_from("<I", data, pos)
    pos += 4
    comments: dict[str, list[str]] = {}
    for _ in range(count):
        (elen,) = struct.unpack_from("<I", data, pos)
        pos += 4
        entry = data[pos : pos + elen].decode("utf-8", errors="replace")
        pos += elen
        if "=" in entry:
            key, value = entry.split("=", 1)
            comments.setdefault(key.upper(), []).append(value)
    return vendor, comments


def parse_flac_metadata(data: bytes) -> tuple[StreamInfo, list[MetadataBlock], int]:
    """Parse the metadata section of a FLAC stream.

    Returns (streaminfo, all blocks, byte offset of the first audio frame).
    Tolerates truncated buffers that contain at least the full metadata
    section (used for the remote 1 MB metadata prefetch path, reference
    ``spatial_encoder.py:450``).
    """
    if data[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    blocks: list[MetadataBlock] = []
    streaminfo: StreamInfo | None = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata section")
        hdr = data[pos]
        is_last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        payload = data[pos + 4 : pos + 4 + length]
        if len(payload) < length:
            raise ValueError("truncated FLAC metadata block")
        blocks.append(MetadataBlock(btype, payload, is_last))
        if btype == BLOCK_STREAMINFO:
            streaminfo = StreamInfo.from_bytes(payload)
        pos += 4 + length
        if is_last:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    return streaminfo, blocks, pos


LAYOUT_APP_ID = b"FRTP"
_LAYOUT_MAX_FRAMES = ((1 << 24) - 16) // 4  # must fit a 24-bit block length


def serialize_layout_block(frame_sizes) -> bytes:
    """APPLICATION payload carrying per-frame byte sizes (the decode index).

    Standard FLAC decoders skip APPLICATION blocks; ours uses the index to
    decode frames in parallel on device (ops/device_decode) and to serve
    random access without walking the stream.  Layout: 4-byte id ``FRTP``,
    u8 version, u8 flags, u16 reserved, u32 frame count, u32 BE sizes.
    """
    import numpy as np

    sizes = np.asarray(frame_sizes, dtype=">u4")
    return (
        LAYOUT_APP_ID
        + bytes([1, 0, 0, 0])
        + len(sizes).to_bytes(4, "big")
        + sizes.tobytes()
    )


def parse_layout_block(blocks) -> "np.ndarray | None":
    """Extract per-frame byte sizes from the FRTP APPLICATION block."""
    import numpy as np

    for b in blocks:
        if b.block_type == BLOCK_APPLICATION and b.data[:4] == LAYOUT_APP_ID:
            if len(b.data) < 12 or b.data[4] != 1:
                return None
            count = int.from_bytes(b.data[8:12], "big")
            arr = np.frombuffer(b.data[12 : 12 + 4 * count], dtype=">u4")
            if arr.size != count:
                return None
            return arr.astype(np.int64)
    return None


def build_flac_header(
    streaminfo: StreamInfo,
    comments: dict[str, str] | None = None,
    vendor: str = "flac-raster-tpu",
    padding: int = 0,
    frame_sizes=None,
) -> bytes:
    """Serialize magic + metadata blocks.  The VORBIS_COMMENT (with all
    GEOSPATIAL_* fields) is written up-front, before any frame bytes exist,
    which is what makes spatial byte offsets stable (fixes SURVEY.md Q3a).
    ``frame_sizes`` adds the FRTP layout APPLICATION block (decode index)."""
    out = bytearray(FLAC_MAGIC)
    blocks: list[tuple[int, bytes]] = [(BLOCK_STREAMINFO, streaminfo.to_bytes())]
    if comments is not None:
        blocks.append((BLOCK_VORBIS_COMMENT, serialize_vorbis_comments(comments, vendor)))
    if frame_sizes is not None and 0 < len(frame_sizes) <= _LAYOUT_MAX_FRAMES:
        blocks.append((BLOCK_APPLICATION, serialize_layout_block(frame_sizes)))
    if padding > 0:
        blocks.append((BLOCK_PADDING, b"\x00" * padding))
    for i, (btype, payload) in enumerate(blocks):
        is_last = i == len(blocks) - 1
        out.append((0x80 if is_last else 0) | btype)
        out += len(payload).to_bytes(3, "big")
        out += payload
    return bytes(out)
