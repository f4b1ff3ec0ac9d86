"""Self-contained GeoTIFF/COG reader/writer.

The reference delegates all raster I/O to GDAL via rasterio (SURVEY.md §2.2);
this framework owns the format instead.  Scope (driven by what the reference
round-trips in CI plus real GDAL output): classic TIFF **and BigTIFF**, both
byte orders, striped and tiled layouts, chunky and planar configs,
uncompressed / DEFLATE / LZW (+ horizontal-predictor) / PackBits / ZSTD /
LZMA (+ JPEG/WEBP via PIL when present), all raster dtypes uint8..float64,
windowed reads, the multi-IFD overview chain COGs carry, and the GeoTIFF tag
set (ModelPixelScale/Tiepoint/Transformation, GeoKeyDirectory EPSG codes,
GDAL_NODATA).

Reads go through a ``ByteSource`` so the SAME parser serves in-memory blobs,
local files (no whole-file load -- BigTIFF-friendly), and remote range-cached
access (io/async_reader.py fetches exactly the header + intersecting chunks).

Writer emits classic TIFF or BigTIFF, chunky, striped or tiled, uncompressed
/ DEFLATE / ZSTD, with GeoTIFF tags -- readable by GDAL and by this reader.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .geo import Affine, BoundingBox, Window, bounds_of, crs_to_epsg

__all__ = [
    "GeoTiffReader",
    "open_geotiff",
    "write_geotiff",
    "GeoTiffError",
    "ByteSource",
    "MemorySource",
    "FileSource",
    "RangeCacheSource",
    "NeedRange",
]


class GeoTiffError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Byte sources
# ---------------------------------------------------------------------------

class ByteSource:
    """Minimal random-access byte provider the reader parses through."""

    def read_at(self, off: int, size: int) -> bytes:  # pragma: no cover
        raise NotImplementedError

    def size(self) -> int | None:
        """Total size when known (None for lazily-discovered remotes)."""
        return None

    def close(self) -> None:
        pass


class MemorySource(ByteSource):
    def __init__(self, buf: bytes):
        self._buf = bytes(buf)

    def read_at(self, off: int, size: int) -> bytes:
        return self._buf[off : off + size]

    def size(self) -> int:
        return len(self._buf)


class FileSource(ByteSource):
    """Seek/read over an open file -- BigTIFFs never fully materialize."""

    def __init__(self, path):
        self._f = open(path, "rb")
        self._size = self._f.seek(0, 2)

    def read_at(self, off: int, size: int) -> bytes:
        self._f.seek(off)
        return self._f.read(size)

    def size(self) -> int:
        return self._size

    def close(self) -> None:
        self._f.close()


class NeedRange(Exception):
    """Raised by RangeCacheSource on a cache miss; carries the byte range the
    caller must fetch (io/async_reader.py catches it, does a ranged GET, and
    retries -- the sync parser itself never blocks on the network)."""

    def __init__(self, offset: int, size: int):
        super().__init__(f"need bytes [{offset}, {offset + size})")
        self.offset = offset
        self.size = size


class RangeCacheSource(ByteSource):
    """ByteSource over a sparse set of fetched ranges.

    ``insert`` adds fetched spans; ``read_at`` serves from cache or raises
    :class:`NeedRange`.  Adjacent/overlapping spans are merged so membership
    checks stay O(log n).
    """

    def __init__(self, total_size: int | None = None):
        self._spans: list[tuple[int, bytes]] = []  # sorted by offset, disjoint
        self._total = total_size

    def set_size(self, n: int) -> None:
        self._total = n

    def size(self) -> int | None:
        return self._total

    def insert(self, off: int, data: bytes) -> None:
        import bisect

        spans = self._spans
        i = bisect.bisect_right([s[0] for s in spans], off)
        # merge with predecessor / successors that touch [off, off+len)
        new_off, new_end, parts = off, off + len(data), [(off, data)]
        if i > 0 and spans[i - 1][0] + len(spans[i - 1][1]) >= off:
            i -= 1
            p_off, p_data = spans[i]
            new_off = p_off
            parts.insert(0, (p_off, p_data))
        j = i
        while j < len(spans) and spans[j][0] <= new_end:
            s_off, s_data = spans[j]
            new_end = max(new_end, s_off + len(s_data))
            parts.append((s_off, s_data))
            j += 1
        merged = bytearray(new_end - new_off)
        for p_off, p_data in parts:
            merged[p_off - new_off : p_off - new_off + len(p_data)] = p_data
        self._spans[i:j] = [(new_off, bytes(merged))]

    def has(self, off: int, size: int) -> bool:
        try:
            self.read_at(off, size)
            return True
        except NeedRange:
            return False

    def read_at(self, off: int, size: int) -> bytes:
        if self._total is not None:
            size = min(size, max(0, self._total - off))
        if size <= 0:
            return b""
        for s_off, s_data in self._spans:
            if s_off <= off and off + size <= s_off + len(s_data):
                return s_data[off - s_off : off - s_off + size]
        raise NeedRange(off, size)

    def cached_bytes(self) -> int:
        return sum(len(d) for _, d in self._spans)


# TIFF tag ids
T_WIDTH, T_HEIGHT = 256, 257
T_BITSPERSAMPLE, T_COMPRESSION, T_PHOTOMETRIC = 258, 259, 262
T_STRIPOFFSETS, T_SAMPLESPERPIXEL, T_ROWSPERSTRIP, T_STRIPBYTECOUNTS = 273, 277, 278, 279
T_PLANARCONFIG, T_PREDICTOR = 284, 317
T_TILEWIDTH, T_TILELENGTH, T_TILEOFFSETS, T_TILEBYTECOUNTS = 322, 323, 324, 325
T_SAMPLEFORMAT = 339
T_MODELPIXELSCALE, T_MODELTIEPOINT, T_MODELTRANSFORMATION = 33550, 33922, 34264
T_GEOKEYDIRECTORY, T_GEODOUBLEPARAMS, T_GEOASCIIPARAMS = 34735, 34736, 34737
T_GDAL_NODATA = 42113

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8,
               16: 8, 17: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d", 16: "Q", 17: "q"}

# (sample_format, bits) -> numpy dtype; sample_format 1=uint 2=int 3=float
_DTYPES = {
    (1, 8): np.uint8, (1, 16): np.uint16, (1, 32): np.uint32,
    (2, 8): np.int8, (2, 16): np.int16, (2, 32): np.int32,
    (3, 32): np.float32, (3, 64): np.float64,
}
_DTYPE_TO_SF = {np.dtype(v): k for k, v in _DTYPES.items()}

COMPRESSION_NONE, COMPRESSION_LZW, COMPRESSION_DEFLATE_OLD, COMPRESSION_DEFLATE = 1, 5, 32946, 8
COMPRESSION_PACKBITS = 32773
COMPRESSION_JPEG = 7
COMPRESSION_LZMA = 34925
COMPRESSION_ZSTD = 50000
COMPRESSION_WEBP = 50001
T_JPEGTABLES = 347
T_SUBFILETYPE = 254


def _lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-flavor LZW (MSB-first, early code-size change)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    code_size = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= code_size:
            code = (buf >> (nbits - code_size)) & ((1 << code_size) - 1)
            nbits -= code_size
            if code == 256:  # clear
                table = table[:258]
                code_size = 9
                prev = None
                continue
            if code == 257:  # end of information
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) + 1 >= (1 << code_size) and code_size < 12:
                code_size += 1
            if len(out) >= max_out:
                return bytes(out)
    return bytes(out)


def _lzw_encode(raw: bytes) -> bytes:
    """TIFF-flavor LZW encode (MSB-first, early code-size change) — exact
    inverse discipline of ``_lzw_decode``; emits a clear code when the
    12-bit table fills, like libtiff."""
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal buf, nbits
        buf = (buf << size) | code
        nbits += size
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, code_size = 258, 9
    emit(256, code_size)  # clear
    w = b""
    for b in raw:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        table[wc] = next_code
        next_code += 1
        # The decoder reconstructs each add one code later, so its table
        # length equals next_code-1 here; its early-change rule
        # (len+1 >= 1<<cs after the append) maps to next_code >= 1<<cs.
        if next_code >= (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code == 4095:
            emit(256, code_size)
            table = {bytes([i]): i for i in range(256)}
            next_code, code_size = 258, 9
        w = bytes([b])
    if w:
        emit(table[w], code_size)
        # No add here, so the decoder's append for this code catches it up
        # (len == next_code); mirror its possible width bump before EOI.
        if next_code >= (1 << code_size) - 1 and code_size < 12:
            code_size += 1
    emit(257, code_size)  # end of information
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(raw: bytes, row_bytes: int | None = None) -> bytes:
    """PackBits encode; TIFF packs each row independently, so compression
    never crosses a row boundary."""
    step = row_bytes or len(raw) or 1
    out = bytearray()
    for r0 in range(0, len(raw), step):
        row = raw[r0 : r0 + step]
        i, n = 0, len(row)
        while i < n:
            j = i
            while j + 1 < n and row[j + 1] == row[i] and j - i < 127:
                j += 1
            run = j - i + 1
            if run >= 2:
                out.append(257 - run)
                out.append(row[i])
                i = j + 1
                continue
            lit0 = i
            i += 1
            while i < n and i - lit0 < 128:
                if i + 2 < n and row[i] == row[i + 1] == row[i + 2]:
                    break
                i += 1
            out.append(i - lit0 - 1)
            out += row[lit0:i]
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < max_out:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            out += data[i : i + 1] * (257 - h)
            i += 1
    return bytes(out)


def _undo_predictor2(block: np.ndarray) -> np.ndarray:
    """Horizontal differencing predictor: cumulative sum along rows.

    block shape: (rows, cols, samples) with native integer dtype; TIFF
    predictor arithmetic is modular in the sample width.
    """
    return np.cumsum(block, axis=1, dtype=block.dtype)


def _undo_float_predictor(
    payload: bytes, rows: int, row_items: int, itemsize: int, endian: str
) -> bytes:
    """TIFF predictor 3 (floating-point horizontal differencing, TechNote 3).

    Each row stores its values split into ``itemsize`` byte planes (plane 0 =
    most significant byte), the whole row byte-differenced.  Undo = modular
    cumsum over the row's bytes, then reassemble items from the planes in the
    file's byte order.
    """
    b = np.frombuffer(payload, np.uint8).reshape(rows, itemsize * row_items)
    b = np.cumsum(b, axis=1, dtype=np.uint8)
    planes = b.reshape(rows, itemsize, row_items)
    ordered = planes.transpose(0, 2, 1)  # (rows, items, bytes) MSB-first
    if endian == "<":
        ordered = ordered[:, :, ::-1]
    return np.ascontiguousarray(ordered).tobytes()


@dataclass
class _IfdEntry:
    tag: int
    type: int
    count: int
    values: tuple


class GeoTiffReader:
    """Windowed GeoTIFF reader with a rasterio-like surface.

    Usage mirrors the reference call sites (``converter.py:73-85``):

        with open_geotiff(path) as src:
            data = src.read()                 # (bands, h, w)
            tile = src.read(window=Window(...))
            t = src.window_transform(window)
    """

    def __init__(self, path_or_bytes=None, *, source: ByteSource | None = None,
                 ifd_index: int = 0):
        if source is not None:
            self._src = source
            self.name = "<source>"
            self._owns_source = False
        elif isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
            self._src = MemorySource(bytes(path_or_bytes))
            self.name = "<memory>"
            self._owns_source = True
        else:
            self._src = FileSource(path_or_bytes)
            self.name = str(path_or_bytes)
            self._owns_source = True
        self._ifd_index = ifd_index
        self._parse()

    # -- context manager -------------------------------------------------
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def close(self):
        if getattr(self, "_owns_source", False):
            self._src.close()

    # -- parsing ----------------------------------------------------------
    def _parse(self):
        head = self._src.read_at(0, 16)
        if len(head) < 8:
            raise GeoTiffError("file too small for a TIFF header")
        order = head[:2]
        if order == b"II":
            self._e = "<"
        elif order == b"MM":
            self._e = ">"
        else:
            raise GeoTiffError("not a TIFF (bad byte-order mark)")
        magic, ifd_off = struct.unpack(self._e + "HI", head[2:8])
        self._bigtiff = False
        if magic == 43:  # BigTIFF
            self._bigtiff = True
            offsize, _zero, ifd_off = struct.unpack(self._e + "HHQ", head[4:16])
            if offsize != 8:
                raise GeoTiffError("unsupported BigTIFF offset size")
        elif magic != 42:
            raise GeoTiffError("not a TIFF (bad magic)")
        # Walk the IFD chain: IFD0 is the full-resolution image; COG
        # overviews follow as further IFDs (reduced-resolution subfiles).
        self._ifd_offsets = [ifd_off]
        self._tags, next_off = self._read_ifd(ifd_off)
        for _ in range(self._ifd_index):
            if not next_off:
                raise GeoTiffError(f"no IFD at index {self._ifd_index}")
            self._ifd_offsets.append(next_off)
            self._tags, next_off = self._read_ifd(next_off)
        self._next_ifd_offset = next_off
        self._interpret()

    def _read_ifd(self, off: int) -> tuple[dict[int, _IfdEntry], int]:
        src, e = self._src, self._e
        tags: dict[int, _IfdEntry] = {}
        if self._bigtiff:
            (count,) = struct.unpack(e + "Q", src.read_at(off, 8))
            entry_size, pos = 20, off + 8
        else:
            (count,) = struct.unpack(e + "H", src.read_at(off, 2))
            entry_size, pos = 12, off + 2
        block = src.read_at(pos, count * entry_size + (8 if self._bigtiff else 4))
        if len(block) < count * entry_size:
            raise GeoTiffError("truncated IFD")
        for i in range(count):
            epos = i * entry_size
            if self._bigtiff:
                tag, typ, cnt = struct.unpack_from(e + "HHQ", block, epos)
                inline = block[epos + 12 : epos + 20]
            else:
                tag, typ, cnt = struct.unpack_from(e + "HHI", block, epos)
                inline = block[epos + 8 : epos + 12]
            size = _TYPE_SIZES.get(typ)
            if size is None:
                continue
            total = size * cnt
            inline_cap = 8 if self._bigtiff else 4
            if total <= inline_cap:
                raw = inline[:total]
            else:
                (voff,) = struct.unpack(e + ("Q" if self._bigtiff else "I"), inline)
                raw = src.read_at(voff, total)
            tags[tag] = _IfdEntry(tag, typ, cnt, self._decode_values(typ, cnt, raw))
        npos = count * entry_size
        if self._bigtiff:
            (next_off,) = struct.unpack_from(e + "Q", block, npos)
        else:
            (next_off,) = struct.unpack_from(e + "I", block, npos)
        return tags, int(next_off)

    def _decode_values(self, typ: int, cnt: int, raw: bytes) -> tuple:
        e = self._e
        if typ == 2:  # ASCII
            return (raw.split(b"\x00")[0].decode("ascii", errors="replace"),)
        if typ in (5, 10):  # RATIONAL
            fmt = "I" if typ == 5 else "i"
            vals = struct.unpack(e + fmt * (2 * cnt), raw)
            return tuple(vals[2 * i] / (vals[2 * i + 1] or 1) for i in range(cnt))
        if typ == 7:  # UNDEFINED
            return (raw,)
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:
            return ()
        return struct.unpack(e + fmt * cnt, raw)

    def _tag(self, tag: int, default=None):
        ent = self._tags.get(tag)
        if ent is None:
            return default
        return ent.values[0] if len(ent.values) == 1 else ent.values

    def _tag_tuple(self, tag: int, default=()) -> tuple:
        ent = self._tags.get(tag)
        return ent.values if ent is not None else default

    def _interpret(self):
        self.width = int(self._tag(T_WIDTH))
        self.height = int(self._tag(T_HEIGHT))
        self.count = int(self._tag(T_SAMPLESPERPIXEL, 1))
        bits = self._tag_tuple(T_BITSPERSAMPLE, (8,) * self.count)
        if isinstance(bits, int):
            bits = (bits,)
        sf = self._tag_tuple(T_SAMPLEFORMAT, (1,) * self.count)
        if isinstance(sf, int):
            sf = (sf,)
        if len(set(bits)) != 1 or len(set(sf)) != 1:
            raise GeoTiffError("mixed per-band sample formats unsupported")
        key = (int(sf[0]), int(bits[0]))
        if key not in _DTYPES:
            raise GeoTiffError(f"unsupported sample format/bits {key}")
        self.dtype = np.dtype(_DTYPES[key])
        self.compression = int(self._tag(T_COMPRESSION, 1))
        self.predictor = int(self._tag(T_PREDICTOR, 1))
        self.planar = int(self._tag(T_PLANARCONFIG, 1))
        self.subfile_type = int(self._tag(T_SUBFILETYPE, 0))
        jt = self._tag(T_JPEGTABLES)
        self._jpeg_tables = bytes(jt) if isinstance(jt, (bytes, bytearray)) else b""
        self.tiled = T_TILEOFFSETS in self._tags
        if self.tiled:
            self.tile_width = int(self._tag(T_TILEWIDTH))
            self.tile_height = int(self._tag(T_TILELENGTH))
            self._chunk_offsets = self._tag_tuple(T_TILEOFFSETS)
            self._chunk_counts = self._tag_tuple(T_TILEBYTECOUNTS)
        else:
            self.rows_per_strip = int(self._tag(T_ROWSPERSTRIP, self.height))
            self._chunk_offsets = self._tag_tuple(T_STRIPOFFSETS)
            self._chunk_counts = self._tag_tuple(T_STRIPBYTECOUNTS)
        # geo tags
        self.transform = self._geo_transform()
        self.crs = self._geo_crs()
        nod = self._tag(T_GDAL_NODATA)
        self.nodata = None
        if nod is not None:
            try:
                self.nodata = float(str(nod).strip())
            except ValueError:
                self.nodata = None

    def _geo_transform(self) -> Affine:
        mt = self._tag_tuple(T_MODELTRANSFORMATION)
        if len(mt) >= 16:
            return Affine(mt[0], mt[1], mt[3], mt[4], mt[5], mt[7])
        scale = self._tag_tuple(T_MODELPIXELSCALE)
        tie = self._tag_tuple(T_MODELTIEPOINT)
        if len(scale) >= 2 and len(tie) >= 6:
            sx, sy = scale[0], scale[1]
            i, j, _, x, y, _ = tie[:6]
            return Affine(sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)
        return Affine.identity()

    def _geo_crs(self) -> str | None:
        gkd = self._tag_tuple(T_GEOKEYDIRECTORY)
        if len(gkd) < 4:
            return None
        n_keys = gkd[3]
        keys = {}
        for i in range(1, n_keys + 1):
            kid, loc, cnt, val = gkd[4 * i : 4 * i + 4]
            keys[kid] = (loc, cnt, val)
        # 1024 GTModelType: 1 projected, 2 geographic; 3072/2048 hold the code
        for key_id in (3072, 2048):
            if key_id in keys:
                loc, cnt, val = keys[key_id]
                if loc == 0 and 0 < val < 65535:
                    return f"EPSG:{val}"
        if 1026 in keys:  # GTCitation fallback
            loc, cnt, val = keys[1026]
            if loc == T_GEOASCIIPARAMS:
                ascii_params = self._tag(T_GEOASCIIPARAMS, "")
                return str(ascii_params)[val : val + cnt].rstrip("|") or None
        return None

    # -- rasterio-like surface -------------------------------------------
    @property
    def bounds(self) -> BoundingBox:
        return bounds_of(self.transform, self.width, self.height)

    @property
    def dtypes(self) -> tuple:
        return (str(self.dtype),) * self.count

    @property
    def meta(self) -> dict:
        return {
            "driver": "GTiff",
            "width": self.width,
            "height": self.height,
            "count": self.count,
            "dtype": str(self.dtype),
            "crs": self.crs,
            "transform": self.transform,
            "nodata": self.nodata,
        }

    def window_transform(self, window: Window) -> Affine:
        return self.transform.translated(window.col_off, window.row_off)

    # -- COG overview chain -------------------------------------------------
    def overview_count(self) -> int:
        """Number of reduced-resolution IFDs following this one."""
        n = 0
        off = self._next_ifd_offset
        while off:
            _, off = self._read_ifd(off)
            n += 1
        return n

    def overview(self, level: int) -> "GeoTiffReader":
        """Open overview ``level`` (0 = first reduced resolution) as a reader
        sharing this reader's byte source."""
        return GeoTiffReader(source=self._src,
                             ifd_index=self._ifd_index + 1 + level)

    def read(self, indexes=None, window: Window | None = None) -> np.ndarray:
        """Read raster data as (bands, h, w); a single index returns (h, w).

        ``indexes`` is 1-based like rasterio.
        """
        if window is None:
            window = Window(0, 0, self.width, self.height)
        single = isinstance(indexes, int)
        if indexes is None:
            band_list = list(range(self.count))
        elif single:
            band_list = [indexes - 1]
        else:
            band_list = [i - 1 for i in indexes]
        out = np.empty((len(band_list), window.height, window.width), dtype=self.dtype)
        if self.tiled:
            self._read_tiled(out, band_list, window)
        else:
            self._read_striped(out, band_list, window)
        return out[0] if single else out

    # chunk decode --------------------------------------------------------
    def _decode_chunk(self, idx: int, rows: int, cols: int, samples: int) -> np.ndarray:
        off = self._chunk_offsets[idx]
        cnt = self._chunk_counts[idx]
        raw = self._src.read_at(off, cnt)
        itemsize = self.dtype.itemsize
        expected = rows * cols * samples * itemsize
        if self.compression == COMPRESSION_NONE:
            payload = raw
        elif self.compression in (COMPRESSION_DEFLATE, COMPRESSION_DEFLATE_OLD):
            payload = zlib.decompress(raw)
        elif self.compression == COMPRESSION_LZW:
            payload = _lzw_decode(raw, expected)
        elif self.compression == COMPRESSION_PACKBITS:
            payload = _packbits_decode(raw, expected)
        elif self.compression == COMPRESSION_ZSTD:
            try:
                import zstandard
            except ImportError as e:  # pragma: no cover
                raise GeoTiffError("ZSTD TIFF requires the zstandard module") from e
            payload = zstandard.ZstdDecompressor().decompress(
                raw, max_output_size=expected
            )
        elif self.compression == COMPRESSION_LZMA:
            import lzma

            payload = lzma.decompress(raw)
        elif self.compression in (COMPRESSION_JPEG, COMPRESSION_WEBP):
            payload = self._decode_image_chunk(raw, rows, cols, samples)
        else:
            raise GeoTiffError(f"unsupported TIFF compression {self.compression}")
        if len(payload) < expected:
            payload = payload + b"\x00" * (expected - len(payload))
        if self.predictor == 3:
            payload = _undo_float_predictor(
                payload[:expected], rows, cols * samples, itemsize, self._e
            )
        arr = np.frombuffer(payload[:expected], dtype=self.dtype.newbyteorder(self._e))
        arr = arr.astype(self.dtype).reshape(rows, cols, samples)
        if self.predictor == 2:
            arr = _undo_predictor2(arr)
        return arr

    def _decode_image_chunk(self, raw: bytes, rows: int, cols: int,
                            samples: int) -> bytes:
        """JPEG/WEBP tile decode via PIL (lossy codecs GDAL writes in COGs)."""
        try:
            import io as _io

            from PIL import Image
        except ImportError as e:  # pragma: no cover
            raise GeoTiffError("JPEG/WEBP TIFF requires Pillow") from e
        if self.compression == COMPRESSION_JPEG and self._jpeg_tables:
            # merge abbreviated stream with the shared JPEGTables block
            tables = self._jpeg_tables
            if raw[:2] == b"\xff\xd8" and tables[:2] == b"\xff\xd8":
                raw = tables[:-2] + raw[2:]
        img = Image.open(_io.BytesIO(raw))
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        out = np.zeros((rows, cols, samples), dtype=self.dtype)
        r = min(rows, arr.shape[0])
        c = min(cols, arr.shape[1])
        s = min(samples, arr.shape[2])
        out[:r, :c, :s] = arr[:r, :c, :s]
        # native byte order already; hand back raw little/big-endian bytes
        return out.astype(self.dtype.newbyteorder(self._e)).tobytes()

    def chunk_ranges_for_window(
        self, window: Window | None = None, indexes=None
    ) -> list[tuple[int, int]]:
        """Byte ranges (offset, size) of every strip/tile a windowed read
        touches -- the COG access pattern for remote readers: fetch exactly
        these (plus the header) instead of the whole file.  Mirrors reference
        ``async_reader.py:117-135`` capability (window -> ranged reads)."""
        if window is None:
            window = Window(0, 0, self.width, self.height)
        if isinstance(indexes, int):
            bands = [indexes - 1]
        elif indexes is None:
            bands = list(range(self.count))
        else:
            bands = [i - 1 for i in indexes]
        idxs: set[int] = set()
        if self.tiled:
            tw, th = self.tile_width, self.tile_height
            tiles_x = (self.width + tw - 1) // tw
            tiles_y = (self.height + th - 1) // th
            per_band = tiles_x * tiles_y
            col0, col1 = window.col_off, window.col_off + window.width
            row0, row1 = window.row_off, window.row_off + window.height
            for ty in range(row0 // th, (row1 - 1) // th + 1):
                for tx in range(col0 // tw, (col1 - 1) // tw + 1):
                    tidx = ty * tiles_x + tx
                    if self.planar == 1:
                        idxs.add(tidx)
                    else:
                        idxs.update(b * per_band + tidx for b in bands)
        else:
            rps = self.rows_per_strip
            per_band = (self.height + rps - 1) // rps
            row0, row1 = window.row_off, window.row_off + window.height
            for strip in range(row0 // rps, (row1 - 1) // rps + 1):
                if self.planar == 1:
                    idxs.add(strip)
                else:
                    idxs.update(b * per_band + strip for b in bands)
        return sorted(
            (int(self._chunk_offsets[i]), int(self._chunk_counts[i]))
            for i in idxs
        )

    def _read_striped(self, out: np.ndarray, bands: list[int], w: Window) -> None:
        rps = self.rows_per_strip
        strips_per_band = (self.height + rps - 1) // rps
        row0, row1 = w.row_off, w.row_off + w.height
        for strip_row in range(row0 // rps, (row1 - 1) // rps + 1):
            r_lo = strip_row * rps
            r_hi = min(r_lo + rps, self.height)
            rows = r_hi - r_lo
            # overlap with window
            o_lo = max(r_lo, row0)
            o_hi = min(r_hi, row1)
            if o_lo >= o_hi:
                continue
            if self.planar == 1:
                chunk = self._decode_chunk(strip_row, rows, self.width, self.count)
                for oi, b in enumerate(bands):
                    out[oi, o_lo - row0 : o_hi - row0, :] = chunk[
                        o_lo - r_lo : o_hi - r_lo, w.col_off : w.col_off + w.width, b
                    ]
            else:
                for oi, b in enumerate(bands):
                    chunk = self._decode_chunk(
                        b * strips_per_band + strip_row, rows, self.width, 1
                    )
                    out[oi, o_lo - row0 : o_hi - row0, :] = chunk[
                        o_lo - r_lo : o_hi - r_lo, w.col_off : w.col_off + w.width, 0
                    ]

    def _read_tiled(self, out: np.ndarray, bands: list[int], w: Window) -> None:
        tw, th = self.tile_width, self.tile_height
        tiles_x = (self.width + tw - 1) // tw
        tiles_y = (self.height + th - 1) // th
        tiles_per_band = tiles_x * tiles_y
        col0, col1 = w.col_off, w.col_off + w.width
        row0, row1 = w.row_off, w.row_off + w.height
        for ty in range(row0 // th, (row1 - 1) // th + 1):
            for tx in range(col0 // tw, (col1 - 1) // tw + 1):
                r_lo, c_lo = ty * th, tx * tw
                o_rlo, o_rhi = max(r_lo, row0), min(r_lo + th, row1)
                o_clo, o_chi = max(c_lo, col0), min(c_lo + tw, col1)
                if o_rlo >= o_rhi or o_clo >= o_chi:
                    continue
                tidx = ty * tiles_x + tx
                if self.planar == 1:
                    chunk = self._decode_chunk(tidx, th, tw, self.count)
                    for oi, b in enumerate(bands):
                        out[oi, o_rlo - row0 : o_rhi - row0, o_clo - col0 : o_chi - col0] = chunk[
                            o_rlo - r_lo : o_rhi - r_lo, o_clo - c_lo : o_chi - c_lo, b
                        ]
                else:
                    for oi, b in enumerate(bands):
                        chunk = self._decode_chunk(
                            b * tiles_per_band + tidx, th, tw, 1
                        )
                        out[oi, o_rlo - row0 : o_rhi - row0, o_clo - col0 : o_chi - col0] = chunk[
                            o_rlo - r_lo : o_rhi - r_lo, o_clo - c_lo : o_chi - c_lo, 0
                        ]


def open_geotiff(path) -> GeoTiffReader:
    return GeoTiffReader(path)


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

def _geokey_directory(crs: str | None) -> tuple[list[int], str]:
    """Build GeoKeyDirectory shorts + ascii params for an EPSG CRS string."""
    epsg = crs_to_epsg(crs)
    ascii_params = ""
    keys: list[tuple[int, int, int, int]] = []
    if epsg is not None:
        geographic = 4000 <= epsg < 5000 or epsg == 4326
        model = 2 if geographic else 1
        keys.append((1024, 0, 1, model))  # GTModelType
        keys.append((1025, 0, 1, 1))  # GTRasterType = PixelIsArea
        if geographic:
            keys.append((2048, 0, 1, epsg))
        else:
            keys.append((3072, 0, 1, epsg))
    elif crs:
        citation = str(crs) + "|"
        keys.append((1024, 0, 1, 32767))
        keys.append((1026, T_GEOASCIIPARAMS, len(citation), 0))
        ascii_params = citation
    header = [1, 1, 0, len(keys)]
    for k in keys:
        header.extend(k)
    return header, ascii_params


def write_geotiff(
    path,
    data: np.ndarray,
    crs: str | None = None,
    transform: Affine | None = None,
    nodata: float | None = None,
    compress: str | None = None,
    tiled: bool = False,
    tile_size: int = 256,
    bigtiff: bool = False,
    overviews: int = 0,
) -> None:
    """Write (bands, h, w) or (h, w) data as a GeoTIFF.

    Chunky, little-endian, striped by default.  Options: DEFLATE/ZSTD
    compression, tiling, BigTIFF (required once offsets pass 4 GB), and
    ``overviews`` reduced-resolution IFDs (2x nearest-neighbor pyramid, the
    COG layout GDAL emits -- readable back via ``GeoTiffReader.overview``).
    """
    data = np.asarray(data)
    if data.ndim == 2:
        data = data[None]
    dt = np.dtype(data.dtype)
    if dt not in _DTYPE_TO_SF:
        raise GeoTiffError(f"unsupported dtype {dt}")
    sf, bits = _DTYPE_TO_SF[dt]

    comp_code = COMPRESSION_NONE
    if compress:
        c = compress.lower()
        if c in ("deflate", "zlib"):
            comp_code = COMPRESSION_DEFLATE
        elif c == "zstd":
            try:
                import zstandard  # noqa: F401
            except ImportError as e:  # pragma: no cover
                raise GeoTiffError("ZSTD write requires the zstandard module") from e
            comp_code = COMPRESSION_ZSTD
        elif c == "lzw":
            comp_code = COMPRESSION_LZW
        elif c == "packbits":
            comp_code = COMPRESSION_PACKBITS
        elif c not in ("none",):
            raise GeoTiffError(f"unsupported write compression {compress}")

    def _compress(raw: bytes, row_bytes: int | None = None) -> bytes:
        if comp_code == COMPRESSION_DEFLATE:
            return zlib.compress(raw, 6)
        if comp_code == COMPRESSION_ZSTD:
            import zstandard

            return zstandard.ZstdCompressor(level=9).compress(raw)
        if comp_code == COMPRESSION_LZW:
            return _lzw_encode(raw)
        if comp_code == COMPRESSION_PACKBITS:
            return _packbits_encode(raw, row_bytes)
        return raw

    # ---- image pyramid ----
    images = [data]
    for _ in range(overviews):
        prev = images[-1]
        if prev.shape[1] < 2 or prev.shape[2] < 2:
            break
        images.append(np.ascontiguousarray(prev[:, ::2, ::2]))

    def build_chunks(img: np.ndarray) -> tuple[list[bytes], int | None]:
        count, height, width = img.shape
        chunky = np.ascontiguousarray(np.moveaxis(img, 0, -1))  # (h, w, bands)
        chunks: list[bytes] = []
        if tiled:
            tw = th = tile_size
            for ty in range((height + th - 1) // th):
                for tx in range((width + tw - 1) // tw):
                    block = np.zeros((th, tw, count), dtype=dt)
                    r0, c0 = ty * th, tx * tw
                    r1, c1 = min(r0 + th, height), min(c0 + tw, width)
                    block[: r1 - r0, : c1 - c0] = chunky[r0:r1, c0:c1]
                    chunks.append(_compress(
                        block.astype(dt.newbyteorder("<")).tobytes(),
                        tw * count * dt.itemsize,
                    ))
            return chunks, None
        target = max(1, (1 << 16) // max(1, width * count * dt.itemsize))
        rps = min(height, max(1, target))
        row_bytes = width * count * dt.itemsize
        for r0 in range(0, height, rps):
            r1 = min(r0 + rps, height)
            chunks.append(_compress(
                chunky[r0:r1].astype(dt.newbyteorder("<")).tobytes(), row_bytes
            ))
        return chunks, rps

    off_typ = 16 if bigtiff else 4  # LONG8 vs LONG
    off_tag = T_TILEOFFSETS if tiled else T_STRIPOFFSETS
    cnt_tag = T_TILEBYTECOUNTS if tiled else T_STRIPBYTECOUNTS

    def build_entries(img: np.ndarray, level: int, chunks: list[bytes],
                      rps: int | None) -> list[tuple[int, int, tuple]]:
        count, height, width = img.shape
        entries: list[tuple[int, int, tuple]] = []

        def add(tag, typ, values):
            if not isinstance(values, (tuple, list)):
                values = (values,)
            entries.append((tag, typ, tuple(values)))

        if level > 0:
            add(T_SUBFILETYPE, 4, 1)  # reduced-resolution subfile
        add(T_WIDTH, 4, width)
        add(T_HEIGHT, 4, height)
        add(T_BITSPERSAMPLE, 3, (bits,) * count)
        add(T_COMPRESSION, 3, comp_code)
        add(T_PHOTOMETRIC, 3, 1 if count == 1 else 2 if count == 3 else 1)
        add(T_SAMPLESPERPIXEL, 3, count)
        add(T_PLANARCONFIG, 3, 1)
        add(T_SAMPLEFORMAT, 3, (sf,) * count)
        if count not in (1, 3):
            add(338, 3, (0,) * (count - 1) if count > 1 else (0,))
        if tiled:
            add(T_TILEWIDTH, 3, tile_size)
            add(T_TILELENGTH, 3, tile_size)
        else:
            add(T_ROWSPERSTRIP, 4, rps)
        if level == 0:
            if transform is not None:
                if transform.is_rectilinear:
                    add(T_MODELPIXELSCALE, 12, (transform.a, -transform.e, 0.0))
                    add(T_MODELTIEPOINT, 12,
                        (0.0, 0.0, 0.0, transform.c, transform.f, 0.0))
                else:
                    add(
                        T_MODELTRANSFORMATION, 12,
                        (transform.a, transform.b, 0.0, transform.c,
                         transform.d, transform.e, 0.0, transform.f,
                         0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0),
                    )
            gkd, ascii_params = _geokey_directory(crs)
            if len(gkd) > 4:
                add(T_GEOKEYDIRECTORY, 3, tuple(gkd))
            if ascii_params:
                add(T_GEOASCIIPARAMS, 2, ascii_params)
            if nodata is not None:
                nod = (str(int(nodata)) if float(nodata).is_integer()
                       else repr(float(nodata)))
                add(T_GDAL_NODATA, 2, nod)
        elif nodata is not None:
            nod = (str(int(nodata)) if float(nodata).is_integer()
                   else repr(float(nodata)))
            add(T_GDAL_NODATA, 2, nod)
        # placeholder offsets; same encoded size as the real ones
        add(off_tag, off_typ, (0,) * len(chunks))
        add(cnt_tag, off_typ, tuple(len(ch) for ch in chunks))
        entries.sort(key=lambda t: t[0])
        return entries

    def encode_values(typ: int, values: tuple) -> bytes:
        if typ == 2:
            return values[0].encode("ascii") + b"\x00"
        fmt = _TYPE_FMT[typ]
        return struct.pack("<" + fmt * len(values), *values)

    if bigtiff:
        header_size, entry_size, inline_cap = 16, 20, 8
        count_size, ptr_size, off_fmt = 8, 8, "Q"
    else:
        header_size, entry_size, inline_cap = 8, 12, 4
        count_size, ptr_size, off_fmt = 2, 4, "I"

    per_image: list[tuple[list, list]] = []
    for level, img in enumerate(images):
        chunks, rps = build_chunks(img)
        per_image.append((build_entries(img, level, chunks, rps), chunks))

    # ---- layout: header | [IFD_i + externals_i]* | chunk data ----
    pos = header_size
    ifd_offsets: list[int] = []
    ext_bases: list[int] = []
    for entries, _ in per_image:
        ifd_offsets.append(pos)
        pos += count_size + entry_size * len(entries) + ptr_size
        ext_bases.append(pos)
        for tag, typ, values in entries:
            raw = encode_values(typ, values)
            if len(raw) > inline_cap:
                pos += len(raw) + (len(raw) % 2)
    data_start = pos

    # per-image chunk offsets, data laid out image-major
    chunk_offsets: list[list[int]] = []
    for _, chunks in per_image:
        offs = []
        for c in chunks:
            offs.append(pos)
            pos += len(c)
        chunk_offsets.append(offs)
    if not bigtiff and pos > 0xFFFFFFFF:
        raise GeoTiffError("file exceeds 4 GB; write with bigtiff=True")

    # patch real offsets into the placeholder entries
    for (entries, _), offs in zip(per_image, chunk_offsets):
        for i, (tag, typ, values) in enumerate(entries):
            if tag == off_tag:
                entries[i] = (tag, typ, tuple(offs))

    # ---- emit ----
    out = bytearray()
    if bigtiff:
        out += b"II" + struct.pack("<HHHQ", 43, 8, 0, header_size)
    else:
        out += b"II" + struct.pack("<HI", 42, header_size)
    for idx, (entries, _) in enumerate(per_image):
        assert len(out) == ifd_offsets[idx], (len(out), ifd_offsets[idx])
        out += struct.pack("<" + ("Q" if bigtiff else "H"), len(entries))
        # first pass: sizes of externals in entry order
        ext_pos = ext_bases[idx]
        fields = []
        externals: list[bytes] = []
        for tag, typ, values in entries:
            raw = encode_values(typ, values)
            count_v = len(values) if typ != 2 else len(raw)
            if bigtiff:
                head = struct.pack("<HHQ", tag, typ, count_v)
            else:
                head = struct.pack("<HHI", tag, typ, count_v)
            if len(raw) <= inline_cap:
                fields.append(head + raw.ljust(inline_cap, b"\x00"))
            else:
                fields.append(head + struct.pack("<" + off_fmt, ext_pos))
                externals.append(raw if len(raw) % 2 == 0 else raw + b"\x00")
                ext_pos += len(raw) + (len(raw) % 2)
        out += b"".join(fields)
        next_ifd = ifd_offsets[idx + 1] if idx + 1 < len(per_image) else 0
        out += struct.pack("<" + off_fmt, next_ifd)
        out += b"".join(externals)
    assert len(out) == data_start, (len(out), data_start)
    with open(path, "wb") as f:
        f.write(bytes(out))
        for _, chunks in per_image:
            for c in chunks:
                f.write(c)
