#!/usr/bin/env python3
"""Dev entry point (reference ``main.py:5-8`` parity): ``python main.py ...``."""

from flac_raster_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
