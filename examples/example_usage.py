#!/usr/bin/env python3
"""API walkthrough (counterpart of reference ``examples/example_usage.py``).

Round-trips every sample raster through FLAC and verifies bit-exactness.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from flac_raster_tpu import RasterFLACConverter, compare_tiffs
from create_test_data import (
    create_dem_sample,
    create_multispectral_sample,
    create_rgb_sample,
)


def main() -> None:
    tmp = Path(tempfile.mkdtemp(prefix="flac_raster_example_"))
    conv = RasterFLACConverter()
    for make in (create_dem_sample, create_rgb_sample, create_multispectral_sample):
        tif = make(tmp / f"{make.__name__.split('_')[1]}.tif")
        flac = tif.with_suffix(".flac")
        back = tif.with_name(tif.stem + "_back.tif")
        conv.tiff_to_flac(tif, flac)
        conv.flac_to_tiff(flac, back)
        result = compare_tiffs(tif, back)
        status = "EXACT" if result["arrays_equal"] else "DIFFERS"
        ratio = tif.stat().st_size / flac.stat().st_size
        print(f"{tif.name}: {ratio:.2f}x compression, round-trip {status}")
        assert result["arrays_equal"]
    print(f"artifacts in {tmp}")


if __name__ == "__main__":
    main()
