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


@pytest.fixture(scope="module")
def raster_tif(tmp_path_factory):
    rng = np.random.default_rng(1234)
    data = rng.integers(-1000, 3000, (1, 300, 400)).astype(np.int16)
    p = tmp_path_factory.mktemp("raster") / "r.tif"
    write_geotiff(p, data, crs="EPSG:4326",
                  transform=Affine.from_origin(-105.5, 40.5, 0.001, 0.001))
    return p, data


# Module scope: the spatial encode costs ~45 s of jit compiles on the CPU
# mesh and every consumer only reads the artifacts — pay it once.
@pytest.fixture(scope="module")
def spatial_flac(tmp_path_factory, raster_tif):
    p, data = raster_tif
    out = tmp_path_factory.mktemp("spatial") / "s.flac"
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


def _fake_session(blob, seen_headers=None, barrier=None):
    """requests.Session stand-in replaying ``blob`` for ranged GETs."""
    session = MagicMock()

    def fake_get(url, headers=None, timeout=None):
        if seen_headers is not None:
            seen_headers.append(headers)
        if barrier is not None:
            barrier.wait()  # raises BrokenBarrierError unless N GETs overlap
        m = MagicMock()
        a, b = headers["Range"].split("=")[1].split("-")
        m.status_code = 206
        m.content = blob[int(a) : int(b) + 1]
        m.headers = {"Content-Range": f"bytes {a}-{b}/{len(blob)}"}
        return m

    def fake_head(url, timeout=None):
        m = MagicMock()
        m.headers = {"content-length": str(len(blob)), "accept-ranges": "bytes"}
        m.raise_for_status = lambda: None
        return m

    session.get.side_effect = fake_get
    session.head.side_effect = fake_head
    return session


def test_remote_streamer_mocked_http(spatial_flac):
    """Reference test pattern: replay local bytes through a fake session,
    assert the exact 1 MB metadata prefetch header."""
    out, index, _ = spatial_flac
    blob = out.read_bytes()
    seen_headers = []
    session = _fake_session(blob, seen_headers)

    with patch("flac_raster_tpu.io.remote.create_session", return_value=session):
        st = SpatialFLACStreamer("https://example.com/data.flac")
        assert seen_headers[0]["Range"] == "bytes=0-1048575"
        ranges = st.get_byte_ranges_for_bbox((-105.49, 40.49, -105.48, 40.5))
        got = st.stream_bbox_data((-105.49, 40.49, -105.48, 40.5))
        assert got == blob[ranges[0][0] : ranges[0][1] + 1]


def test_streamer_remote_ranges_fetched_concurrently(spatial_flac):
    """A multi-range bbox fetch must put every range in flight at once:
    each fake GET blocks on a barrier sized to the range count, so the test
    deadlocks (BrokenBarrierError) if the streamer fetches sequentially."""
    import threading

    out, index, _ = spatial_flac
    blob = out.read_bytes()
    st = SpatialFLACStreamer(out)  # index from the local file
    st.is_remote = True
    # one column, two rows -> two byte ranges separated by the row stride
    bbox = (-105.49, 40.5 - 0.001 * 250, -105.48, 40.5)
    ranges = st.get_byte_ranges_for_bbox(bbox)
    assert len(ranges) >= 2, "fixture bbox must span non-adjacent tiles"

    barrier = threading.Barrier(len(ranges), timeout=15)
    session = _fake_session(blob, barrier=barrier)
    with patch("flac_raster_tpu.io.remote.create_session", return_value=session):
        from flac_raster_tpu.io.remote import RemoteFile

        st._remote_file = RemoteFile("https://example.com/data.flac")
        got = st.stream_bbox_data(bbox)
    expect = b"".join(blob[s : e + 1] for s, e in ranges)
    assert got == expect


def test_read_many_order_and_fallback_200():
    """read_many preserves input order; a 200 response (server ignoring
    Range) degrades to slicing the full body, like the reference."""
    from flac_raster_tpu.io.remote import RemoteFile

    payload = bytes(range(256)) * 4
    session = _fake_session(payload)
    rf = RemoteFile("https://example.com/x.bin", session=session)
    got = rf.read_many([(512, 515), (0, 3), (100, 101)])
    assert got == [payload[512:516], payload[0:4], payload[100:102]]

    full = MagicMock()
    m = MagicMock()
    m.status_code = 200
    m.content = payload
    full.get.return_value = m
    rf2 = RemoteFile("https://example.com/x.bin", session=full)
    assert rf2.read_range(5, 9) == payload[5:10]
    assert rf2.file_size == len(payload)  # size learned from the 200 body


def test_read_many_200_server_downloads_body_once():
    """Against a server that does not advertise ranges (and ignores them),
    a multi-range read_many must probe with ONE request and serve the rest
    from the cached body — not fan N concurrent full-object downloads
    (review finding, round 3)."""
    from flac_raster_tpu.io.remote import RemoteFile

    payload = bytes(range(256)) * 8
    session = MagicMock()
    gets = []

    def fake_get(url, headers=None, timeout=None):
        gets.append(headers)
        m = MagicMock()
        m.status_code = 200  # server ignores Range entirely
        m.content = payload
        return m

    def fake_head(url, timeout=None):
        m = MagicMock()
        m.headers = {"content-length": str(len(payload))}  # no accept-ranges
        m.raise_for_status = lambda: None
        return m

    session.get.side_effect = fake_get
    session.head.side_effect = fake_head
    rf = RemoteFile("https://example.com/x.bin", session=session)
    ranges = [(512, 515), (0, 3), (100, 101), (2000, 2001)]
    got = rf.read_many(ranges)
    assert got == [payload[s : e + 1] for s, e in ranges]
    assert len(gets) == 1, f"expected 1 probe GET, saw {len(gets)}"
    # later calls never touch the network again
    assert rf.read_many([(5, 6), (7, 8)]) == [payload[5:7], payload[7:9]]
    assert len(gets) == 1


def test_read_many_advertised_ranges_fan_out_fully():
    """A server advertising Accept-Ranges gets the full concurrent fan-out
    (no serialized probe), and the 206s mark range support observed."""
    from flac_raster_tpu.io.remote import RemoteFile

    payload = bytes(range(256)) * 4
    session = _fake_session(payload)
    rf = RemoteFile("https://example.com/x.bin", session=session)
    assert rf._supports_range is not True
    ranges = [(0, 3), (512, 515), (40, 44)]
    assert rf.read_many(ranges) == [payload[s : e + 1] for s, e in ranges]
    assert rf._supports_range is True
    assert session.get.call_count == len(ranges)  # no extra range requests


def test_obstore_branch_with_injected_store():
    """Credentialed cloud path: an injected object store (obstore-compatible)
    serves get_range / get_ranges / head — exercises the branch the image
    can't reach for lack of obstore."""
    from flac_raster_tpu.io.remote import RemoteFile

    payload = bytes(range(256))

    class FakeStore:
        def __init__(self):
            self.range_calls = []
            self.ranges_calls = []

        def get_range(self, key, start, end):  # end exclusive, obstore-style
            assert key == "a/b.flac"
            self.range_calls.append((start, end))
            return payload[start:end]

        def get_ranges(self, key, starts, ends):
            assert key == "a/b.flac"
            self.ranges_calls.append((tuple(starts), tuple(ends)))
            return [payload[s:e] for s, e in zip(starts, ends)]

        def head(self, key):
            m = MagicMock()
            m.size = len(payload)
            return m

        def get(self, key):
            return payload

    store = FakeStore()
    rf = RemoteFile("s3://bkt/a/b.flac", store=store)
    assert rf.read_range(4, 7) == payload[4:8]
    assert store.range_calls == [(4, 8)]
    assert rf.read_many([(0, 1), (10, 19)]) == [payload[0:2], payload[10:20]]
    assert store.ranges_calls == [((0, 10), (2, 20))]
    assert rf.file_size == len(payload)
    assert rf.read_all() == payload


def test_iter_bbox_to_device(spatial_flac):
    """Double-buffered tile ingest: frames arrive as device arrays, values
    exact."""
    out, index, data = spatial_flac
    st = SpatialFLACStreamer(out)
    bbox = (-105.49, 40.49, -105.45, 40.45)
    expected = {f.frame_id for f in st.spatial_index.query_bbox(bbox)}
    seen = set()
    for f, tile in st.iter_bbox_to_device(bbox):
        seen.add(f.frame_id)
        w = f.window
        assert np.array_equal(
            np.asarray(tile),
            data[:, w.row_off : w.row_off + w.height, w.col_off : w.col_off + w.width],
        )
    assert seen == expected


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
    session = MagicMock()
    def fake_get(url, headers=None, timeout=60):
        assert url == "https://bkt.s3.amazonaws.com/a/b.flac"
        a, b = map(int, headers["Range"].split("=")[1].split("-"))
        m = MagicMock(); m.status_code = 206; m.content = payload[a:b+1]
        m.headers = {}
        return m
    session.get.side_effect = fake_get
    rf = RemoteFile("s3://bkt/a/b.flac", session=session)
    assert rf.url == "https://bkt.s3.amazonaws.com/a/b.flac"
    assert rf.read_range(4, 7) == payload[4:8]


def test_decode_bbox_device(spatial_flac):
    """Device ingest for bbox queries: mesh-decoded (>1 device on the test
    mesh), device-denormalized tiles must be bit-exact vs the host path
    and device-resident."""
    import jax

    out, index, data = spatial_flac
    st = SpatialFLACStreamer(out)
    bbox = (-105.5, 40.2, -105.1, 40.5)  # whole raster -> every tile
    host_tiles = st.decode_bbox(bbox)
    dev_tiles = st.decode_bbox_device(bbox)
    assert len(dev_tiles) == len(host_tiles) > 1
    for (fh, th), (fd, td) in zip(host_tiles, dev_tiles):
        assert fh is fd or fh.window == fd.window
        assert isinstance(td, jax.Array)
        got = np.asarray(td)
        assert got.dtype == th.dtype
        assert np.array_equal(got, th)
