#!/usr/bin/env python3
"""Generate synthetic geospatial test rasters.

Counterpart of the reference's ``examples/create_test_data.py`` (DEM int16
512^2, RGB uint8 256^2 x3, multispectral uint8 200^2 x6 -- reference
``create_test_data.py:13,52,95``) using this framework's own GeoTIFF writer
(no rasterio/GDAL).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from flac_raster_tpu.io.geo import Affine
from flac_raster_tpu.io.geotiff import write_geotiff


def create_dem_sample(filename="sample_dem.tif", size=(512, 512)) -> Path:
    """DEM-like int16 elevation with multi-scale terrain + noise."""
    height, width = size
    rng = np.random.default_rng(42)
    x = np.linspace(0, 20, width)
    y = np.linspace(0, 20, height)
    X, Y = np.meshgrid(x, y)
    elevation = (
        1000
        + 300 * np.sin(X * 0.5) * np.cos(Y * 0.3)
        + 150 * np.sin(X * 1.2) * np.sin(Y * 1.1)
        + 50 * rng.random((height, width))
    ).astype(np.int16)
    transform = Affine(0.001, 0.0, -105.5, 0.0, -0.001, 40.5)
    write_geotiff(filename, elevation[None], crs="EPSG:4326", transform=transform)
    return Path(filename)


def create_rgb_sample(filename="sample_rgb.tif", size=(256, 256)) -> Path:
    """RGB uint8 with gradients and shapes."""
    height, width = size
    rng = np.random.default_rng(7)
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    r = (xx * 255 / width).astype(np.uint8)
    g = (yy * 255 / height).astype(np.uint8)
    b = ((np.sin(xx / 17.0) * np.cos(yy / 13.0) * 0.5 + 0.5) * 255).astype(np.uint8)
    rgb = np.stack([r, g, b]).clip(1, 255).astype(np.uint8)
    rgb += rng.integers(0, 2, rgb.shape, dtype=np.uint8)
    transform = Affine(0.0005, 0.0, -122.5, 0.0, -0.0005, 37.8)
    write_geotiff(filename, rgb, crs="EPSG:4326", transform=transform)
    return Path(filename)


def create_multispectral_sample(
    filename="sample_multispectral.tif", size=(200, 200), bands: int = 6
) -> Path:
    """Multispectral uint8: correlated bands like a satellite sensor."""
    height, width = size
    rng = np.random.default_rng(11)
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    base = 100 + 60 * np.sin(xx / 23.0) * np.cos(yy / 31.0)
    data = np.stack(
        [
            (base * (0.6 + 0.1 * b) + rng.normal(0, 4, base.shape)).clip(0, 255)
            for b in range(bands)
        ]
    ).astype(np.uint8)
    transform = Affine(0.01, 0.0, 10.0, 0.0, -0.01, 50.0)
    write_geotiff(filename, data, crs="EPSG:4326", transform=transform)
    return Path(filename)


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("test_data")
    out.mkdir(parents=True, exist_ok=True)
    for fn in (
        create_dem_sample(out / "sample_dem.tif"),
        create_rgb_sample(out / "sample_rgb.tif"),
        create_multispectral_sample(out / "sample_multispectral.tif"),
    ):
        print(f"wrote {fn} ({fn.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
