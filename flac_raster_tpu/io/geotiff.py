"""Self-contained GeoTIFF reader/writer.

The reference delegates all raster I/O to GDAL via rasterio (SURVEY.md §2.2);
this framework owns the format instead.  Scope (driven by what the reference
round-trips in CI plus real GDAL output): classic TIFF, both byte orders,
striped and tiled layouts, chunky and planar configs, uncompressed / DEFLATE
/ LZW (+ horizontal-predictor), all raster dtypes uint8..float64, windowed
reads, and the GeoTIFF tag set (ModelPixelScale/Tiepoint/Transformation,
GeoKeyDirectory EPSG codes, GDAL_NODATA).

Writer emits classic TIFF, chunky, striped or tiled, uncompressed or DEFLATE,
with GeoTIFF tags -- readable by GDAL and by this reader.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .geo import Affine, BoundingBox, Window, bounds_of, crs_to_epsg

__all__ = ["GeoTiffReader", "open_geotiff", "write_geotiff", "GeoTiffError"]


class GeoTiffError(ValueError):
    pass


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

    def __init__(self, path_or_bytes):
        if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
            self._buf = bytes(path_or_bytes)
            self.name = "<memory>"
        else:
            self._buf = Path(path_or_bytes).read_bytes()
            self.name = str(path_or_bytes)
        self._parse()

    # -- context manager -------------------------------------------------
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def close(self):
        pass

    # -- parsing ----------------------------------------------------------
    def _parse(self):
        buf = self._buf
        if len(buf) < 8:
            raise GeoTiffError("file too small for a TIFF header")
        order = buf[:2]
        if order == b"II":
            self._e = "<"
        elif order == b"MM":
            self._e = ">"
        else:
            raise GeoTiffError("not a TIFF (bad byte-order mark)")
        magic, ifd_off = struct.unpack(self._e + "HI", buf[2:8])
        self._bigtiff = False
        if magic == 43:  # BigTIFF
            self._bigtiff = True
            offsize, _zero, ifd_off = struct.unpack(self._e + "HHQ", buf[4:16])
            if offsize != 8:
                raise GeoTiffError("unsupported BigTIFF offset size")
        elif magic != 42:
            raise GeoTiffError("not a TIFF (bad magic)")
        self._tags = self._read_ifd(ifd_off)
        self._interpret()

    def _read_ifd(self, off: int) -> dict[int, _IfdEntry]:
        buf, e = self._buf, self._e
        tags: dict[int, _IfdEntry] = {}
        if self._bigtiff:
            (count,) = struct.unpack_from(e + "Q", buf, off)
            entry_size, pos = 20, off + 8
        else:
            (count,) = struct.unpack_from(e + "H", buf, off)
            entry_size, pos = 12, off + 2
        for i in range(count):
            if self._bigtiff:
                tag, typ, cnt = struct.unpack_from(e + "HHQ", buf, pos)
                inline = buf[pos + 12 : pos + 20]
            else:
                tag, typ, cnt = struct.unpack_from(e + "HHI", buf, pos)
                inline = buf[pos + 8 : pos + 12]
            pos += entry_size
            size = _TYPE_SIZES.get(typ)
            if size is None:
                continue
            total = size * cnt
            inline_cap = 8 if self._bigtiff else 4
            if total <= inline_cap:
                raw = inline[:total]
            else:
                (voff,) = struct.unpack(e + ("Q" if self._bigtiff else "I"), inline)
                raw = buf[voff : voff + total]
            tags[tag] = _IfdEntry(tag, typ, cnt, self._decode_values(typ, cnt, raw))
        return tags

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
        raw = self._buf[off : off + cnt]
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
        else:
            raise GeoTiffError(f"unsupported TIFF compression {self.compression}")
        if len(payload) < expected:
            payload = payload + b"\x00" * (expected - len(payload))
        arr = np.frombuffer(payload[:expected], dtype=self.dtype.newbyteorder(self._e))
        arr = arr.astype(self.dtype).reshape(rows, cols, samples)
        if self.predictor == 2:
            arr = _undo_predictor2(arr)
        elif self.predictor == 3:
            # float predictor: bytes were split into planes and differenced
            raise GeoTiffError("floating-point predictor (3) not supported yet")
        return arr

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
) -> None:
    """Write (bands, h, w) or (h, w) data as a classic GeoTIFF (chunky,
    little-endian, striped by default; optional DEFLATE and tiling)."""
    data = np.asarray(data)
    if data.ndim == 2:
        data = data[None]
    count, height, width = data.shape
    dt = np.dtype(data.dtype)
    if dt not in _DTYPE_TO_SF:
        raise GeoTiffError(f"unsupported dtype {dt}")
    sf, bits = _DTYPE_TO_SF[dt]
    chunky = np.ascontiguousarray(np.moveaxis(data, 0, -1))  # (h, w, bands)

    comp_code = COMPRESSION_NONE
    if compress:
        c = compress.lower()
        if c in ("deflate", "zlib"):
            comp_code = COMPRESSION_DEFLATE
        elif c not in ("none",):
            raise GeoTiffError(f"unsupported write compression {compress}")

    chunks: list[bytes] = []
    if tiled:
        tw = th = tile_size
        tiles_x = (width + tw - 1) // tw
        tiles_y = (height + th - 1) // th
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                block = np.zeros((th, tw, count), dtype=dt)
                r0, c0 = ty * th, tx * tw
                r1, c1 = min(r0 + th, height), min(c0 + tw, width)
                block[: r1 - r0, : c1 - c0] = chunky[r0:r1, c0:c1]
                raw = block.astype(dt.newbyteorder("<")).tobytes()
                chunks.append(zlib.compress(raw, 6) if comp_code != 1 else raw)
    else:
        target = max(1, (1 << 16) // max(1, width * count * dt.itemsize))
        rps = min(height, max(1, target))
        for r0 in range(0, height, rps):
            r1 = min(r0 + rps, height)
            raw = chunky[r0:r1].astype(dt.newbyteorder("<")).tobytes()
            chunks.append(zlib.compress(raw, 6) if comp_code != 1 else raw)

    # ---- assemble tags ----
    entries: list[tuple[int, int, tuple]] = []  # (tag, type, values)

    def add(tag, typ, values):
        if not isinstance(values, (tuple, list)):
            values = (values,)
        entries.append((tag, typ, tuple(values)))

    add(T_WIDTH, 4, width)
    add(T_HEIGHT, 4, height)
    add(T_BITSPERSAMPLE, 3, (bits,) * count)
    add(T_COMPRESSION, 3, comp_code)
    add(T_PHOTOMETRIC, 3, 1 if count == 1 else 2 if count == 3 else 1)
    add(T_SAMPLESPERPIXEL, 3, count)
    add(T_PLANARCONFIG, 3, 1)
    add(T_SAMPLEFORMAT, 3, (sf,) * count)
    if count not in (1, 3):
        # ExtraSamples: declare additional bands as unspecified
        add(338, 3, (0,) * (count - 1) if count > 1 else (0,))
    if tiled:
        add(T_TILEWIDTH, 3, tile_size)
        add(T_TILELENGTH, 3, tile_size)
    else:
        add(T_ROWSPERSTRIP, 4, rps)
    if transform is not None:
        if transform.is_rectilinear:
            add(T_MODELPIXELSCALE, 12, (transform.a, -transform.e, 0.0))
            add(T_MODELTIEPOINT, 12, (0.0, 0.0, 0.0, transform.c, transform.f, 0.0))
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
        nod = str(int(nodata)) if float(nodata).is_integer() else repr(float(nodata))
        add(T_GDAL_NODATA, 2, nod)

    # chunk offset/count tags get placeholder values fixed up below
    off_tag = T_TILEOFFSETS if tiled else T_STRIPOFFSETS
    cnt_tag = T_TILEBYTECOUNTS if tiled else T_STRIPBYTECOUNTS
    add(off_tag, 4, (0,) * len(chunks))
    add(cnt_tag, 4, tuple(len(c) for c in chunks))

    entries.sort(key=lambda t: t[0])

    def encode_values(typ: int, values: tuple) -> bytes:
        if typ == 2:
            s = values[0].encode("ascii") + b"\x00"
            return s
        fmt = _TYPE_FMT[typ]
        return struct.pack("<" + fmt * len(values), *values)

    # layout: header(8) + ifd + external values + chunk data
    ifd_size = 2 + 12 * len(entries) + 4
    pos_external = 8 + ifd_size
    external: list[bytes] = []
    inline_fields: list[bytes] = []
    locations: dict[int, int] = {}  # tag -> absolute offset of its value block
    for tag, typ, values in entries:
        raw = encode_values(typ, values)
        count_v = len(values) if typ != 2 else len(raw)
        if len(raw) <= 4:
            inline_fields.append(struct.pack("<HHI", tag, typ, count_v) + raw.ljust(4, b"\x00"))
        else:
            locations[tag] = pos_external
            inline_fields.append(
                struct.pack("<HHII", tag, typ, count_v, pos_external)
            )
            external.append(raw)
            pos_external += len(raw)
            if pos_external % 2:
                external.append(b"\x00")
                pos_external += 1

    data_start = pos_external
    # compute chunk offsets
    offsets = []
    p = data_start
    for c in chunks:
        offsets.append(p)
        p += len(c)

    # rewrite the offsets tag now that positions are known
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, 8)
    out += struct.pack("<H", len(entries))
    for fld, (tag, typ, values) in zip(inline_fields, entries):
        if tag == off_tag:
            raw = struct.pack("<" + "I" * len(offsets), *offsets)
            if len(raw) <= 4:
                fld = struct.pack("<HHI", tag, typ, len(offsets)) + raw.ljust(4, b"\x00")
            else:
                fld = struct.pack("<HHII", tag, typ, len(offsets), locations[tag])
        out += fld
    out += struct.pack("<I", 0)  # next IFD
    for tag, typ, values in entries:
        if tag not in locations:
            continue
        if tag == off_tag:
            out += struct.pack("<" + "I" * len(offsets), *offsets)
        else:
            raw = encode_values(typ, values)
            out += raw
        if len(out) % 2:
            out += b"\x00"
    assert len(out) == data_start, (len(out), data_start)
    for c in chunks:
        out += c
    Path(path).write_bytes(bytes(out))
