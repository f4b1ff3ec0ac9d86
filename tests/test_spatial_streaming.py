"""Spatial + streaming format tests, mirroring the reference's test focus
(tests/test_http_range_streaming.py): index integrity, bbox->range mapping,
range merging, bandwidth efficiency, and mocked HTTP range requests."""

import json
from pathlib import Path
from unittest.mock import MagicMock, patch

import numpy as np
import pytest

from flac_raster_tpu.converter import RasterFLACConverter
from flac_raster_tpu.io.geo import Affine
from flac_raster_tpu.io.geotiff import open_geotiff, write_geotiff
from flac_raster_tpu.models.spatial import SpatialFLACEncoder, SpatialFLACStreamer
from flac_raster_tpu.models.streaming import (
    create_streaming_flac,
    load_streaming_index,
    read_streaming_tile,
)


@pytest.fixture
def raster_tif(tmp_path, rng):
    data = rng.integers(-1000, 3000, (1, 300, 400)).astype(np.int16)
    p = tmp_path / "r.tif"
    write_geotiff(p, data, crs="EPSG:4326",
                  transform=Affine.from_origin(-105.5, 40.5, 0.001, 0.001))
    return p, data


@pytest.fixture
def spatial_flac(tmp_path, raster_tif):
    p, data = raster_tif
    out = tmp_path / "s.flac"
    enc = SpatialFLACEncoder(tile_size=128)
    index = enc.encode_spatial_flac(p, out)
    return out, index, data


def test_spatial_index_offsets_are_exact(spatial_flac):
    """The Q3a fix: every recorded offset points at an actual fLaC magic and
    the sizes tile the file exactly."""
    out, index, data = spatial_flac
    blob = out.read_bytes()
    pos = 0
    for f in index.frames:
        assert f.byte_offset == pos
        assert blob[f.byte_offset : f.byte_offset + 4] == b"fLaC"
        pos += f.byte_size
    assert pos == len(blob)


def test_spatial_tiles_decode_exact(spatial_flac):
    out, index, data = spatial_flac
    blob = out.read_bytes()
    conv = RasterFLACConverter()
    for f in index.frames:
        chunk = blob[f.byte_offset : f.byte_offset + f.byte_size]
        tile, _ = conv.decode_bytes(chunk, override_dims=(f.window.width, f.window.height))
        w = f.window
        assert np.array_equal(
            tile, data[:, w.row_off : w.row_off + w.height, w.col_off : w.col_off + w.width]
        )


def test_streamer_loads_embedded_index(spatial_flac):
    out, index, _ = spatial_flac
    st = SpatialFLACStreamer(out)
    assert len(st.spatial_index.frames) == len(index.frames)
    assert st.spatial_index.total_bytes == out.stat().st_size


def test_bbox_query_semantics(spatial_flac):
    out, index, _ = spatial_flac
    st = SpatialFLACStreamer(out)
    # whole raster -> all tiles
    all_ranges = st.get_byte_ranges_for_bbox((-105.5, 40.2, -105.1, 40.5))
    assert sum(e - s + 1 for s, e in all_ranges) == out.stat().st_size
    # tiny box inside tile 0
    one = st.get_byte_ranges_for_bbox((-105.49, 40.49, -105.48, 40.48 + 0.02))
    assert len(one) == 1
    total_one = sum(e - s + 1 for s, e in one)
    assert total_one < out.stat().st_size * 0.4  # bandwidth efficiency
    # open-interval: box touching only the shared edge intersects nothing
    edge_x = -105.5 + 0.001 * 128
    none = st.get_byte_ranges_for_bbox((edge_x, 40.6, edge_x, 40.7))
    assert none == []


def test_range_merging(spatial_flac):
    out, _, _ = spatial_flac
    st = SpatialFLACStreamer(out)
    ranges = st.get_byte_ranges_for_bbox((-105.5, 40.2, -105.1, 40.5))
    # contiguous tiles merge into one range covering the file
    assert len(ranges) == 1


def test_stream_bbox_data_local(spatial_flac):
    out, index, _ = spatial_flac
    st = SpatialFLACStreamer(out)
    data = st.stream_bbox_data((-105.49, 40.49, -105.48, 40.5))
    assert data[:4] == b"fLaC"


def test_decode_bbox(spatial_flac):
    out, index, data = spatial_flac
    st = SpatialFLACStreamer(out)
    tiles = st.decode_bbox((-105.49, 40.49, -105.45, 40.45))
    assert tiles
    for f, tile in tiles:
        w = f.window
        assert np.array_equal(
            tile, data[:, w.row_off : w.row_off + w.height, w.col_off : w.col_off + w.width]
        )


def test_sidecar_fallback(tmp_path, spatial_flac):
    out, index, _ = spatial_flac
    # a file with no embedded index but a sidecar
    stripped = tmp_path / "bare.flac"
    stripped.write_bytes(b"\x00not-flac")
    (tmp_path / "bare.spatial.json").write_text(json.dumps(index.to_dict()))
    st = SpatialFLACStreamer(stripped)
    assert len(st.spatial_index.frames) == len(index.frames)


def test_remote_streamer_mocked_http(spatial_flac):
    """Reference test pattern: @patch requests, replay local bytes, assert
    the exact 1 MB metadata prefetch header."""
    out, index, _ = spatial_flac
    blob = out.read_bytes()
    seen_headers = []

    def fake_get(url, headers=None, timeout=None):
        seen_headers.append(headers)
        m = MagicMock()
        rng = headers["Range"].split("=")[1]
        a, b = rng.split("-")
        m.status_code = 206
        m.content = blob[int(a) : int(b) + 1]
        return m

    def fake_head(url, timeout=None):
        m = MagicMock()
        m.headers = {"content-length": str(len(blob)), "accept-ranges": "bytes"}
        m.raise_for_status = lambda: None
        return m

    with patch("requests.get", side_effect=fake_get), \
         patch("requests.head", side_effect=fake_head):
        st = SpatialFLACStreamer("https://example.com/data.flac")
        assert seen_headers[0]["Range"] == "bytes=0-1048575"
        ranges = st.get_byte_ranges_for_bbox((-105.49, 40.49, -105.48, 40.5))
        got = st.stream_bbox_data((-105.49, 40.49, -105.48, 40.5))
        assert got == blob[ranges[0][0] : ranges[0][1] + 1]


# ---------------------------------------------------------------------------
# streaming container
# ---------------------------------------------------------------------------

def test_streaming_container_roundtrip(tmp_path, raster_tif):
    p, data = raster_tif
    out = tmp_path / "stream.flac"
    sindex = create_streaming_flac(p, out, tile_size=128)
    loaded = load_streaming_index(out)
    assert loaded.meta["width"] == 400 and loaded.meta["height"] == 300
    assert len(loaded.frames) == len(sindex.frames) == 3 * 4
    conv = RasterFLACConverter()
    for frame in loaded.frames:
        blob = read_streaming_tile(out, loaded, frame)
        assert blob[:4] == b"fLaC"
        tile, _ = conv.decode_bytes(blob)
        w = frame["window"]
        assert np.array_equal(
            tile,
            data[:, w["row_off"] : w["row_off"] + w["height"],
                 w["col_off"] : w["col_off"] + w["width"]],
        )


def test_streaming_offsets_relative_to_data_section(tmp_path, raster_tif):
    """Absolute position = 4 + index_size + byte_offset (reference
    cli.py:297-299); first tile's offset is zero."""
    p, _ = raster_tif
    out = tmp_path / "stream.flac"
    create_streaming_flac(p, out, tile_size=128)
    loaded = load_streaming_index(out)
    assert loaded.frames[0]["byte_offset"] == 0
    blob = out.read_bytes()
    for frame in loaded.frames:
        start, end = loaded.absolute_range(frame)
        assert blob[start : start + 4] == b"fLaC"
        assert end < len(blob)


def test_cloud_url_public_endpoint_fallback():
    """s3://, gs:// work without obstore via unsigned HTTPS endpoints."""
    from unittest.mock import MagicMock, patch

    from flac_raster_tpu.io.remote import RemoteFile, cloud_url_to_https

    assert cloud_url_to_https("s3://bkt/a/b.flac") == "https://bkt.s3.amazonaws.com/a/b.flac"
    assert cloud_url_to_https("gs://bkt/x.flac") == "https://storage.googleapis.com/bkt/x.flac"

    payload = bytes(range(256))
    def fake_head(url, timeout=10):
        m = MagicMock()
        m.headers = {"content-length": str(len(payload)), "accept-ranges": "bytes"}
        m.raise_for_status = lambda: None
        assert url == "https://bkt.s3.amazonaws.com/a/b.flac"
        return m
    def fake_get(url, headers=None, timeout=60):
        a, b = map(int, headers["Range"].split("=")[1].split("-"))
        m = MagicMock(); m.status_code = 206; m.content = payload[a:b+1]
        return m
    with patch("requests.head", side_effect=fake_head), \
         patch("requests.get", side_effect=fake_get):
        rf = RemoteFile("s3://bkt/a/b.flac")
        assert rf.read_range(4, 7) == payload[4:8]
