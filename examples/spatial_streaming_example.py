#!/usr/bin/env python3
"""Spatial streaming walkthrough (reference ``spatial_streaming_example.py``).

Builds a streaming container, loads its index with the 4-byte + JSON access
pattern, queries tiles by bbox, and extracts one tile -- the "Netflix for
geospatial data" flow (reference README.md:8, SURVEY.md §3.3-3.5).
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from flac_raster_tpu import RasterFLACConverter
from flac_raster_tpu.models.streaming import (
    create_streaming_flac,
    load_streaming_index,
    read_streaming_tile,
)
from create_test_data import create_dem_sample


def main() -> None:
    tmp = Path(tempfile.mkdtemp(prefix="flac_raster_streaming_"))
    tif = create_dem_sample(tmp / "dem.tif")
    container = tmp / "dem_streaming.flac"

    sindex = create_streaming_flac(tif, container, tile_size=128)
    frames = sindex.meta["frames"]
    print(f"container: {container.stat().st_size} bytes, {len(frames)} tiles")
    print(f"index overhead: {sindex.header_size} bytes")

    sindex2 = load_streaming_index(container)
    assert len(sindex2.meta["frames"]) == len(frames)

    # bbox query: which tiles intersect the north-west quarter?
    t = sindex.meta["transform"]
    west, north = t[2], t[5]
    bbox = (west, north + 256 * t[4], west + 256 * t[0], north)
    hits = [
        f for f in frames
        if not (
            f["bbox"][2] <= bbox[0] or f["bbox"][0] >= bbox[2]
            or f["bbox"][3] <= bbox[1] or f["bbox"][1] >= bbox[3]
        )
    ]
    total = container.stat().st_size
    fetched = sum(f["byte_size"] for f in hits)
    print(f"bbox query: {len(hits)} tiles, {fetched} bytes "
          f"({100 * (1 - fetched / total):.1f}% bandwidth saved)")

    # extract the first hit as a standalone GeoTIFF
    blob = read_streaming_tile(container, sindex, hits[0])
    conv = RasterFLACConverter()
    data, meta = conv.decode_bytes(blob)
    print(f"extracted tile {hits[0]['frame_id']}: shape {data.shape}, "
          f"dtype {data.dtype}, crs {meta.get('crs')}")
    assert data.shape == (1, 128, 128)
    print(f"artifacts in {tmp}")


if __name__ == "__main__":
    main()
