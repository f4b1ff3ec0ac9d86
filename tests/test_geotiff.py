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
