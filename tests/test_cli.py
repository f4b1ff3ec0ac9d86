"""CLI end-to-end tests (the reference gates correctness on CLI round-trips
in CI, ci.yml:46-66)."""

import json

import numpy as np
import pytest

from flac_raster_tpu.cli import main
from flac_raster_tpu.io.geo import Affine
from flac_raster_tpu.io.geotiff import open_geotiff, write_geotiff


@pytest.fixture
def tif(tmp_path, rng):
    data = rng.integers(0, 2000, (1, 200, 260)).astype(np.int16)
    p = tmp_path / "in.tif"
    write_geotiff(p, data, crs="EPSG:4326",
                  transform=Affine.from_origin(-105.5, 40.5, 0.001, 0.001))
    return p, data


def test_convert_roundtrip(tmp_path, tif):
    p, data = tif
    flac = tmp_path / "out.flac"
    assert main(["convert", str(p), "-o", str(flac)]) == 0
    back = tmp_path / "back.tif"
    assert main(["convert", str(flac), "-o", str(back)]) == 0
    assert np.array_equal(open_geotiff(back).read(), data)


def test_force_guard(tmp_path, tif):
    p, _ = tif
    flac = tmp_path / "out.flac"
    assert main(["convert", str(p), "-o", str(flac)]) == 0
    assert main(["convert", str(p), "-o", str(flac)]) == 1  # exists, no --force
    assert main(["convert", str(p), "-o", str(flac), "--force"]) == 0


def test_unsupported_format(tmp_path):
    bad = tmp_path / "x.png"
    bad.write_bytes(b"nope")
    assert main(["convert", str(bad)]) == 1


def test_missing_input():
    assert main(["convert", "/nonexistent/file.tif"]) == 1


def test_info(tmp_path, tif, capsys):
    p, _ = tif
    flac = tmp_path / "out.flac"
    main(["convert", str(p), "-o", str(flac)])
    assert main(["info", str(flac)]) == 0
    out = capsys.readouterr().out
    assert "260 x 200" in out and "EPSG:4326" in out
    assert main(["info", str(p)]) == 0


def test_streaming_and_extract(tmp_path, tif, capsys):
    p, data = tif
    s = tmp_path / "s.flac"
    assert main(["convert", str(p), "--streaming", "-t", "128", "-o", str(s)]) == 0
    out_tif = tmp_path / "tile.tif"
    assert main(["extract", str(s), "-o", str(out_tif), "--tile-id", "1"]) == 0
    tile = open_geotiff(out_tif).read()
    assert np.array_equal(tile, data[:, 0:128, 128:256])
    # center and last selection modes
    assert main(["extract", str(s), "-o", str(tmp_path / "c.tif"), "--center"]) == 0
    assert main(["extract", str(s), "-o", str(tmp_path / "l.tif"), "--last"]) == 0
    last = open_geotiff(tmp_path / "l.tif").read()
    assert np.array_equal(last, data[:, 128:200, 256:260])
    # bbox with negative coords (argparse normalization)
    assert main(["extract", str(s), "-o", str(tmp_path / "b.tif"),
                 "-b", "-105.49,40.49,-105.48,40.5"]) == 0
    # no selector -> error
    assert main(["extract", str(s), "-o", str(tmp_path / "x.tif")]) == 1
    # unknown tile id -> error
    assert main(["extract", str(s), "-o", str(tmp_path / "x.tif"), "--tile-id", "99"]) == 1


def test_query_and_export(tmp_path, tif):
    p, _ = tif
    sp = tmp_path / "sp.flac"
    assert main(["convert", str(p), "--spatial", "-t", "128", "-o", str(sp)]) == 0
    out_json = tmp_path / "ranges.json"
    assert main(["query", str(sp), "-b", "-105.49,40.49,-105.48,40.5",
                 "-o", str(out_json)]) == 0
    ranges = json.loads(out_json.read_text())
    assert ranges["total_bytes"] > 0 and len(ranges["ranges"]) >= 1


def test_compare_command(tmp_path, tif):
    p, _ = tif
    flac = tmp_path / "f.flac"
    back = tmp_path / "b.tif"
    main(["convert", str(p), "-o", str(flac)])
    main(["convert", str(flac), "-o", str(back)])
    export = tmp_path / "cmp.json"
    assert main(["compare", str(p), str(back), "-e", str(export)]) == 0
    results = json.loads(export.read_text())
    assert results["arrays_equal"] is True
    assert main(["compare", str(p), "/nonexistent.tif"]) == 1


def test_minmax_flag(tmp_path, tif):
    p, data = tif
    flac = tmp_path / "mm.flac"
    assert main(["convert", str(p), "--minmax", "-o", str(flac)]) == 0
    back = tmp_path / "mmback.tif"
    assert main(["convert", str(flac), "-o", str(back)]) == 0
    assert np.array_equal(open_geotiff(back).read(), data)


def test_extract_rows_plain_flac(tmp_path, tif):
    """--rows extracts a raster row window from a PLAIN whole-raster FLAC
    through the FRTP decode index (new vs the reference, which needs the
    tiled containers for windowed access)."""
    p, data = tif
    flac = tmp_path / "whole.flac"
    assert main(["convert", str(p), "-o", str(flac)]) == 0
    out = tmp_path / "win.tif"
    assert main(["extract", str(flac), "-o", str(out), "--rows", "50:40"]) == 0
    with open_geotiff(out) as src:
        win = src.read()
        assert np.array_equal(win, data[:, 50:90])
        # origin shifted down by 50 pixels
        assert abs(src.transform.f - (40.5 - 0.001 * 50)) < 1e-9
    assert main(["extract", str(flac), "-o", str(out), "--rows", "bad"]) == 1
    assert main(["extract", str(flac), "-o", str(out), "--rows", "190:40"]) == 1
