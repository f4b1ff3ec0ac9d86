import numpy as np
import pytest

from flac_raster_tpu.io.geo import Affine, Window
from flac_raster_tpu.io.geotiff import open_geotiff, write_geotiff

REF = "/root/reference/test_data"


@pytest.mark.parametrize("name,shape,dtype,crs", [
    ("sample_dem.tif", (1, 512, 512), "int16", "EPSG:4326"),
    ("sample_rgb.tif", (3, 256, 256), "uint8", "EPSG:4326"),
    ("sample_multispectral.tif", (6, 200, 200), "uint8", "EPSG:4326"),
])
def test_read_reference_fixtures(name, shape, dtype, crs):
    import pathlib

    p = pathlib.Path(REF) / name
    if not p.exists():
        pytest.skip("reference data missing")
    with open_geotiff(p) as src:
        data = src.read()
        assert data.shape == shape
        assert str(data.dtype) == dtype
        assert src.crs == crs
        assert src.transform.a > 0 and src.transform.e < 0


def test_values_match_pil():
    import pathlib

    p = pathlib.Path(REF) / "sample_dem.tif"
    if not p.exists():
        pytest.skip("reference data missing")
    from PIL import Image

    ours = open_geotiff(p).read()[0]
    theirs = np.array(Image.open(p))
    assert np.array_equal(ours.astype(np.int64), theirs.astype(np.int64))


def test_windowed_read_matches_full():
    import pathlib

    p = pathlib.Path(REF) / "sample_rgb.tif"
    if not p.exists():
        pytest.skip("reference data missing")
    src = open_geotiff(p)
    full = src.read()
    w = Window(33, 71, 100, 50)
    win = src.read(window=w)
    assert np.array_equal(win, full[:, 71:121, 33:133])
    # single band, 1-based index
    band2 = src.read(indexes=2, window=w)
    assert np.array_equal(band2, full[1, 71:121, 33:133])


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16, np.int32,
                                   np.uint32, np.float32, np.float64])
@pytest.mark.parametrize("kw", [
    {},
    {"compress": "deflate"},
    {"tiled": True, "tile_size": 16, "compress": "deflate"},
    {"compress": "lzw"},
    {"tiled": True, "tile_size": 16, "compress": "lzw"},
    {"compress": "packbits"},
    {"tiled": True, "tile_size": 16, "compress": "packbits"},
])
def test_write_read_roundtrip(tmp_path, rng, dtype, kw):
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(0, 100, (2, 37, 53)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        data = rng.integers(info.min, info.max, (2, 37, 53)).astype(dtype)
    t = Affine.from_origin(-120.0, 37.0, 0.01, 0.01)
    path = tmp_path / "t.tif"
    write_geotiff(path, data, crs="EPSG:4326", transform=t, nodata=None, **kw)
    with open_geotiff(path) as back:
        assert np.array_equal(back.read(), data)
        assert back.crs == "EPSG:4326"
        assert tuple(back.transform) == tuple(t)


def test_nodata_roundtrip(tmp_path):
    data = np.zeros((1, 4, 4), dtype=np.int16)
    write_geotiff(tmp_path / "n.tif", data, nodata=-9999)
    assert open_geotiff(tmp_path / "n.tif").nodata == -9999.0


def test_window_transform():
    import pathlib

    p = pathlib.Path(REF) / "sample_dem.tif"
    if not p.exists():
        pytest.skip("reference data missing")
    src = open_geotiff(p)
    wt = src.window_transform(Window(100, 200, 10, 10))
    x, y = wt * (0, 0)
    x2, y2 = src.transform * (100, 200)
    assert (x, y) == (x2, y2)


def test_lzw_packbits_codec_fuzz(rng):
    """Raw encoder<->decoder round-trip across adversarial payloads: long
    runs (table churn / run packing), random bytes (literal paths), and a
    size sweep crossing the LZW code-width bumps and the 12-bit table
    reset."""
    from flac_raster_tpu.io.geotiff import (
        _lzw_decode,
        _lzw_encode,
        _packbits_decode,
        _packbits_encode,
    )

    payloads = [
        b"",
        b"\x00",
        b"\xab" * 5000,
        bytes(rng.integers(0, 256, 70000, dtype=np.uint8)),  # forces table reset
        bytes(rng.integers(0, 4, 9001, dtype=np.uint8)),     # dense repeats
        np.arange(300, dtype=np.uint8).tobytes() * 40,
    ]
    for size in (1, 7, 255, 256, 257, 511, 512, 1024, 4093, 4095):
        payloads.append(bytes(rng.integers(0, 16, size, dtype=np.uint8)))
    for raw in payloads:
        assert _lzw_decode(_lzw_encode(raw), len(raw)) == raw
        assert _packbits_decode(_packbits_encode(raw), len(raw)) == raw
        assert _packbits_decode(_packbits_encode(raw, 64), len(raw)) == raw
