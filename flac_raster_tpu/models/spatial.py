"""Spatial FLAC format: tiled encoding with an embedded byte-range index.

Reference counterparts: ``spatial_encoder.py:34-567`` (SpatialFrame,
SpatialIndex, SpatialFLACEncoder, SpatialFLACStreamer).  Same format on disk:
row-major fixed-size tile grid (edge tiles clipped), each tile an independent
complete FLAC stream, streams concatenated, index + raster metadata embedded
as VORBIS_COMMENT of the FIRST stream (index = base64(gzip(JSON)) under
GEOSPATIAL_SPATIAL_INDEX).

Design fix (SURVEY.md Q3a): the reference records byte offsets *before*
mutagen rewrites the first stream's header, so every offset after the first
header is stale in real files (observable in the shipped
``test_data/sample_dem.flac``).  Here the first tile's header is rebuilt with
the final index plus a PADDING block sized so the header length is fixed
*before* offsets are computed -- offsets never move, and files stay readable
by the reference's streamer.

Per-tile independent normalization (Q4) is preserved: every tile carries its
own GEOSPATIAL_* metadata and min/max.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from ..io.geo import Affine, Window
from ..io.geotiff import open_geotiff
from ..models.flac_format import build_flac_header, parse_flac_metadata
from ..models.metadata import pack_spatial_index, unpack_spatial_index
from ..ops.normalization import calculate_audio_params

logger = logging.getLogger("flac_raster_tpu.spatial")

__all__ = [
    "SpatialFrame",
    "SpatialIndex",
    "SpatialFLACEncoder",
    "SpatialFLACStreamer",
    "compute_tile_grid",
    "tile_bbox",
]

METADATA_PREFETCH_BYTES = 1_048_576  # reference spatial_encoder.py:450


def encode_tiles_batched(
    conv,
    data: np.ndarray,
    tiles: List[Tuple[int, int, int, int]],
    crs,
    transform: Affine,
    nodata,
    compression_level: int,
) -> List[bytes]:
    """Encode a tile grid with batched device planning.

    Tiles are grouped by shape (interior tiles form one large group; clipped
    edge tiles form up to three smaller groups) and each group is encoded in
    a single batched device pass (converter.encode_array_batch) -- the
    tile-data-parallel replacement for the reference's sequential per-tile
    temp-file loop (``spatial_encoder.py:196-245``).
    """
    groups: Dict[Tuple[int, int], List[int]] = {}
    for i, (row_off, col_off, th, tw) in enumerate(tiles):
        groups.setdefault((th, tw), []).append(i)
    blobs: List[bytes | None] = [None] * len(tiles)
    for (th, tw), members in groups.items():
        stack = np.stack(
            [
                data[
                    :,
                    tiles[i][0] : tiles[i][0] + th,
                    tiles[i][1] : tiles[i][1] + tw,
                ]
                for i in members
            ]
        )
        transforms = [
            transform.translated(tiles[i][1], tiles[i][0]) for i in members
        ]
        bounds_list = [
            list(tile_bbox(tiles[i][0], tiles[i][1], th, tw, transform))
            for i in members
        ]
        group_blobs = conv.encode_array_batch(
            stack,
            crs=crs,
            transforms=transforms,
            bounds_list=bounds_list,
            nodata=nodata,
            compression_level=compression_level,
        )
        for i, blob in zip(members, group_blobs):
            blobs[i] = blob
    return blobs  # type: ignore[return-value]


class SpatialFrame:
    """One tile: geographic bbox, pixel window, byte extent
    (reference ``spatial_encoder.py:34-64``)."""

    def __init__(
        self,
        frame_id: int,
        bbox: Tuple[float, float, float, float],
        window: Window,
        byte_offset: int = 0,
        byte_size: int = 0,
    ):
        self.frame_id = frame_id
        self.bbox = bbox
        self.window = window
        self.byte_offset = byte_offset
        self.byte_size = byte_size

    def to_dict(self) -> Dict:
        return {
            "frame_id": self.frame_id,
            "bbox": list(self.bbox),
            "window": {
                "row_off": self.window.row_off,
                "col_off": self.window.col_off,
                "height": self.window.height,
                "width": self.window.width,
            },
            "byte_offset": self.byte_offset,
            "byte_size": self.byte_size,
        }

    @classmethod
    def from_dict(cls, d: Dict) -> "SpatialFrame":
        w = d["window"]
        return cls(
            d["frame_id"],
            tuple(d["bbox"]),
            Window(w["col_off"], w["row_off"], w["width"], w["height"]),
            d.get("byte_offset", 0),
            d.get("byte_size", 0),
        )


class SpatialIndex:
    """Tile index with bbox queries (reference ``spatial_encoder.py:67-96``)."""

    def __init__(self, frames: List[SpatialFrame], crs, transform: Affine):
        self.frames = frames
        self.crs = crs
        self.transform = transform
        self.total_bytes = sum(f.byte_size for f in frames)

    def query_bbox(self, bbox: Tuple[float, float, float, float]) -> List[SpatialFrame]:
        """Strict-inequality open-interval intersection (SURVEY.md Q7)."""
        xmin, ymin, xmax, ymax = bbox
        out = []
        for f in self.frames:
            fxmin, fymin, fxmax, fymax = f.bbox
            if xmin < fxmax and xmax > fxmin and ymin < fymax and ymax > fymin:
                out.append(f)
        return out

    def to_dict(self) -> Dict:
        return {
            "crs": str(self.crs),
            "transform": list(self.transform),
            "frames": [f.to_dict() for f in self.frames],
        }

    @classmethod
    def from_dict(cls, data: Dict) -> "SpatialIndex":
        frames = [SpatialFrame.from_dict(fd) for fd in data["frames"]]
        # reference indices serialize rasterio's 9-element affine (the
        # projective row 0,0,1 included); only the first 6 carry information
        return cls(frames, data.get("crs"), Affine(*data["transform"][:6]))


def compute_tile_grid(height: int, width: int, tile_size: int) -> List[Tuple[int, int, int, int]]:
    """Row-major (row_off, col_off, tile_h, tile_w) grid, edge tiles clipped
    (reference ``spatial_encoder.py:110-121``)."""
    tiles = []
    for row_start in range(0, height, tile_size):
        for col_start in range(0, width, tile_size):
            tiles.append((
                row_start,
                col_start,
                min(tile_size, height - row_start),
                min(tile_size, width - col_start),
            ))
    return tiles


def tile_bbox(
    row_off: int, col_off: int, height: int, width: int, transform: Affine
) -> Tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) of a pixel window under an affine transform
    (reference ``spatial_encoder.py:123-131``)."""
    xmin, ymax = transform * (col_off, row_off)
    xmax, ymin = transform * (col_off + width, row_off + height)
    return (xmin, ymin, xmax, ymax)


class SpatialFLACEncoder:
    """Tile-parallel spatial FLAC encoder.

    The reference loops tiles sequentially through a temp-file pipeline
    (``spatial_encoder.py:196-245``); here each tile is encoded in memory
    via the converter's array entry point -- and the batched device path can
    encode the whole tile grid concurrently (parallel.tile_engine).
    """

    def __init__(self, tile_size: int = 512, lossless: bool = True):
        self.tile_size = tile_size
        self.lossless = lossless
        self.frames: List[SpatialFrame] = []

    def encode_spatial_flac(
        self,
        tiff_path,
        flac_path,
        compression_level: int = 5,
        enable_streaming: bool = True,
    ) -> SpatialIndex:
        from ..converter import RasterFLACConverter

        tiff_path, flac_path = Path(tiff_path), Path(flac_path)
        conv = RasterFLACConverter(lossless=self.lossless)
        with open_geotiff(tiff_path) as src:
            transform = src.transform
            crs = src.crs
            height, width = src.height, src.width
            nodata = src.nodata
            count = src.count
            dtype = str(src.dtype)
            data = src.read()
            global_min = float(np.nanmin(data))
            global_max = float(np.nanmax(data))

        tiles = compute_tile_grid(height, width, self.tile_size)
        logger.info("encoding %d tiles of %dx%d", len(tiles), self.tile_size, self.tile_size)

        self.frames = []
        for i, (row_off, col_off, th, tw) in enumerate(tiles):
            window = Window(col_off, row_off, tw, th)
            bbox = tile_bbox(row_off, col_off, th, tw, transform)
            self.frames.append(SpatialFrame(i, bbox, window))
        blobs = encode_tiles_batched(
            conv, data, tiles, crs, transform, nodata, compression_level
        )

        body = self._assemble(
            blobs, crs, transform, height, width, count, dtype,
            global_min, global_max, len(tiles),
        )
        flac_path.write_bytes(body)
        index = SpatialIndex(self.frames, crs, transform)
        logger.info("wrote %s: %d tiles, %d bytes", flac_path, len(tiles), len(body))
        return index

    def _assemble(
        self, blobs, crs, transform, height, width, count, dtype,
        global_min, global_max, num_tiles,
    ) -> bytes:
        """Concatenate tile streams with the index embedded in tile 0's
        header at a *stabilized* length, so recorded offsets are final."""
        si0, blocks0, fs0 = parse_flac_metadata(blobs[0])
        frames0 = blobs[0][fs0:]
        # recover tile-0 comments as an ordered single-value dict
        from ..models.flac_format import BLOCK_VORBIS_COMMENT, parse_vorbis_comments

        comments0: Dict[str, str] = {}
        vendor = "flac-raster-tpu"
        for b in blocks0:
            if b.block_type == BLOCK_VORBIS_COMMENT:
                vendor, parsed = parse_vorbis_comments(b.data)
                comments0 = {k: v[0] for k, v in parsed.items()}
        comments0["GEOSPATIAL_SPATIAL_TILING"] = "true"
        comments0["GEOSPATIAL_TILE_SIZE"] = str(self.tile_size)
        comments0["GEOSPATIAL_NUM_TILES"] = str(num_tiles)
        # spatial files advertise the GLOBAL raster shape/range in tile 0
        comments0["GEOSPATIAL_WIDTH"] = str(width)
        comments0["GEOSPATIAL_HEIGHT"] = str(height)
        comments0["GEOSPATIAL_COUNT"] = str(count)
        comments0["GEOSPATIAL_DTYPE"] = dtype
        comments0["GEOSPATIAL_DATA_MIN"] = repr(global_min)
        comments0["GEOSPATIAL_DATA_MAX"] = repr(global_max)

        def layout(header_len: int) -> SpatialIndex:
            offset = 0
            sizes = [header_len + len(frames0)] + [len(b) for b in blobs[1:]]
            for f, size in zip(self.frames, sizes):
                f.byte_offset = offset
                f.byte_size = size
                offset += size
            return SpatialIndex(self.frames, crs, transform)

        # pass 1: provisional header to learn its approximate size
        provisional = layout(8192)
        c = dict(comments0)
        c["GEOSPATIAL_SPATIAL_INDEX"] = pack_spatial_index(provisional.to_dict())
        base_len = len(build_flac_header(si0, c, vendor))
        slack = 512
        for _ in range(3):
            target = base_len + slack
            final_index = layout(target)
            c = dict(comments0)
            c["GEOSPATIAL_SPATIAL_INDEX"] = pack_spatial_index(final_index.to_dict())
            core = build_flac_header(si0, c, vendor)
            pad = target - len(core) - 4  # 4 = PADDING block header
            if pad >= 0:
                header0 = build_flac_header(si0, c, vendor, padding=pad)
                assert len(header0) == target
                return header0 + frames0 + b"".join(blobs[1:])
            slack += 1024  # index grew past the slack; retry larger
        raise RuntimeError("spatial index size failed to stabilize")


class SpatialFLACStreamer:
    """Range-request client for spatial FLAC files (local / HTTP / cloud).

    Reference parity (``spatial_encoder.py:410-567``): 1 MB metadata
    prefetch for remote files, gzip+base64 index decode, ``.spatial.json``
    sidecar fallback, sorted+merged byte ranges, strict bbox semantics.
    No mutagen: the embedded index is read with this framework's own FLAC
    metadata parser.
    """

    def __init__(self, flac_path):
        from ..io.remote import is_remote_url

        self.flac_path = flac_path
        self.is_remote = isinstance(flac_path, str) and is_remote_url(flac_path)
        self.is_url = self.is_remote  # reference back-compat alias
        self._remote_file = None
        self.spatial_index = self._load_spatial_index()

    def _metadata_blob(self) -> bytes:
        if self.is_remote:
            from ..io.remote import RemoteFile

            if self._remote_file is None:
                self._remote_file = RemoteFile(self.flac_path)
            return self._remote_file.read_range(0, METADATA_PREFETCH_BYTES - 1)
        return Path(self.flac_path).read_bytes()

    def _load_spatial_index(self) -> SpatialIndex:
        try:
            blob = self._metadata_blob()
            _, blocks, _ = parse_flac_metadata(blob)
            from ..models.flac_format import BLOCK_VORBIS_COMMENT, parse_vorbis_comments

            encoded = None
            for b in blocks:
                if b.block_type == BLOCK_VORBIS_COMMENT:
                    _, comments = parse_vorbis_comments(b.data)
                    vals = comments.get("GEOSPATIAL_SPATIAL_INDEX")
                    if vals:
                        encoded = vals[0]
            if encoded is None:
                raise ValueError("no embedded spatial index found")
            data = unpack_spatial_index(encoded)
        except Exception as e:  # noqa: BLE001 -- sidecar fallback, like reference
            logger.warning("failed to read embedded metadata: %s", e)
            index_path = Path(str(self.flac_path)).with_suffix(".spatial.json")
            if not index_path.exists():
                raise FileNotFoundError(
                    f"spatial index not found in FLAC metadata or sidecar: {index_path}"
                ) from e
            data = json.loads(index_path.read_text())
        return SpatialIndex.from_dict(data)

    def get_byte_ranges_for_bbox(
        self, bbox: Tuple[float, float, float, float]
    ) -> List[Tuple[int, int]]:
        """Inclusive byte ranges for tiles intersecting bbox, sorted and
        merged when contiguous/overlapping (reference
        ``spatial_encoder.py:517-539``)."""
        ranges = [
            (f.byte_offset, f.byte_offset + f.byte_size - 1)
            for f in self.spatial_index.query_bbox(bbox)
            if f.byte_size > 0
        ]
        ranges.sort()
        merged: List[Tuple[int, int]] = []
        for start, end in ranges:
            if merged and start <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], end))
            else:
                merged.append((start, end))
        return merged

    def stream_bbox_data(self, bbox: Tuple[float, float, float, float]) -> bytes:
        ranges = self.get_byte_ranges_for_bbox(bbox)
        return b"".join(self._read_ranges(ranges))

    def decode_bbox(self, bbox: Tuple[float, float, float, float]):
        """Decode all intersecting tiles -> list of (frame, (bands,h,w) array).

        New capability vs the reference (which only returns raw bytes):
        tiles are independent FLAC streams, so they decode directly.  Tile
        byte ranges are fetched concurrently (RemoteFile.read_many), then
        decoded in index order.
        """
        from ..converter import RasterFLACConverter

        conv = RasterFLACConverter()
        frames = self.spatial_index.query_bbox(bbox)
        blobs = self._read_ranges(
            [(f.byte_offset, f.byte_offset + f.byte_size - 1) for f in frames]
        )
        out = []
        for f, blob in zip(frames, blobs):
            data, _meta = conv.decode_bytes(
                blob, override_dims=(f.window.width, f.window.height)
            )
            out.append((f, data))
        return out

    def decode_bbox_device(self, bbox: Tuple[float, float, float, float]):
        """decode_bbox, but tiles decode AND denormalize on device.

        The intersecting tiles' byte ranges are fetched concurrently, then
        decoded in ONE sharded mesh program when more than one device is
        visible (parallel/decode_mesh; per-tile device decode otherwise)
        and inverse-normalized in-graph (ops/device_normalize) -- the
        rasters never visit the host.  Returns the same
        ``list[(frame, (bands, h, w) array)]`` as decode_bbox with the
        arrays device-resident (float64 rasters: exact host arrays).
        """
        from ..converter import RasterFLACConverter
        from ..ops.device_normalize import device_denorm_supported

        conv = RasterFLACConverter()
        frames = self.spatial_index.query_bbox(bbox)
        blobs = self._read_ranges(
            [(f.byte_offset, f.byte_offset + f.byte_size - 1) for f in frames]
        )
        if not frames:
            return []
        import jax

        if len(jax.local_devices()) > 1 and len(blobs) > 1:
            from ..parallel.decode_mesh import decode_flac_batch_mesh

            decs = decode_flac_batch_mesh(blobs, verify_crc=False)
        else:
            from ..codec.device_decoder import decode_flac_device

            decs = [decode_flac_device(b, verify_crc=False) for b in blobs]
        out = []
        for f, dec, blob in zip(frames, decs, blobs):
            meta = conv._load_meta(dec.comments, None)
            if meta is None:
                raise ValueError("tile carries no geospatial metadata")
            dims = (f.window.width, f.window.height)
            if not device_denorm_supported(meta.get("normalization")):
                data, _ = conv.decode_bytes(blob, override_dims=dims)
            else:
                data, _ = conv._denormalize_device_stream(
                    dec, meta, override_dims=dims
                )
            out.append((f, data))
        return out

    def iter_bbox_to_device(self, bbox: Tuple[float, float, float, float]):
        """Stream intersecting tiles onto the default jax device.

        Yields ``(frame, device_array)`` with a one-tile-ahead pipeline:
        tile byte ranges are fetched concurrently up front, then while the
        consumer works on tile ``i``, tile ``i+1`` is being decoded on a
        worker thread and its ``jax.device_put`` transfer is in flight —
        the double-buffered hand-off keeps the device fed instead of
        alternating fetch/decode/transfer/compute (SURVEY.md §2.4's
        host-side async fan-out, reference ``spatial_encoder.py:549-567``
        did all three serially).
        """
        import jax

        from ..converter import RasterFLACConverter
        from ..io.remote import _shared_executor

        conv = RasterFLACConverter()
        frames = self.spatial_index.query_bbox(bbox)
        blobs = self._read_ranges(
            [(f.byte_offset, f.byte_offset + f.byte_size - 1) for f in frames]
        )

        def prepare(f: SpatialFrame, blob: bytes):
            data, _ = conv.decode_bytes(
                blob, override_dims=(f.window.width, f.window.height)
            )
            return f, jax.device_put(data)  # transfer proceeds asynchronously

        pool = _shared_executor()
        nxt = pool.submit(prepare, frames[0], blobs[0]) if frames else None
        for i in range(len(frames)):
            cur = nxt
            if i + 1 < len(frames):
                nxt = pool.submit(prepare, frames[i + 1], blobs[i + 1])
            yield cur.result()

    def _read_ranges(self, ranges: List[Tuple[int, int]]) -> List[bytes]:
        """Fetch inclusive byte ranges: concurrent fan-out when remote,
        positioned reads when local."""
        if not ranges:
            return []
        if self.is_remote:
            from ..io.remote import RemoteFile

            if self._remote_file is None:
                self._remote_file = RemoteFile(self.flac_path)
            return self._remote_file.read_many(ranges)
        def pread_full(fd: int, n: int, off: int) -> bytes:
            # os.pread may legally return short (NFS, EINTR); loop to n
            # bytes and fail loudly at EOF instead of yielding a truncated
            # tile blob that mis-decodes downstream
            parts = []
            while n > 0:
                b = os.pread(fd, n, off)
                if not b:
                    raise EOFError(
                        f"{self.flac_path}: EOF at {off}, "
                        f"{n} bytes of range still unread"
                    )
                parts.append(b)
                off += len(b)
                n -= len(b)
            return b"".join(parts)

        with open(self.flac_path, "rb") as f:
            fd = f.fileno()
            return [
                pread_full(fd, end - start + 1, start) for start, end in ranges
            ]

    def _read_span(self, offset: int, size: int) -> bytes:
        return self._read_ranges([(offset, offset + size - 1)])[0]
