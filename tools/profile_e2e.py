"""Per-chunk phase timing of the device encode pipeline on the real TPU.

Encodes the bench raster twice (warm, then timed with DEBUG logs) and
prints the per-chunk upload/dispatch/drain breakdown.
"""

from __future__ import annotations

import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SIZE = int(os.environ.get("FRTPU_BENCH_SIZE", 8192))


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_raster
    from flac_raster_tpu.converter import RasterFLACConverter
    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()
    conv = RasterFLACConverter(lossless=True, compute_md5=False)
    data = make_raster(SIZE)[None]
    print("warmup...", flush=True)
    conv.encode_array(data[:, :, : (2048 * 4096) // SIZE])
    conv.encode_array(data)

    logging.basicConfig(stream=sys.stderr, level=logging.WARNING,
                        format="%(relativeCreated)8.0fms %(message)s")
    logging.getLogger("flac_raster_tpu.device_encoder").setLevel(logging.DEBUG)
    print("timed...", flush=True)
    t0 = time.perf_counter()
    blob = conv.encode_array(data)
    dt = time.perf_counter() - t0
    print(f"e2e: {dt:6.2f}s  {data.nbytes/1e6/dt:7.2f} MB/s  ({len(blob)/1e6:.1f} MB out)",
          flush=True)


if __name__ == "__main__":
    main()
