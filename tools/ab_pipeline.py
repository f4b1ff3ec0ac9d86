"""A/B the encode pipeline schedules on the real TPU, interleaved to cancel
link-rate drift: for each round, run every (pipeline, chunk_frames) combo
once on the bench raster and print its wall time.  Report min + median.

Usage: python tools/ab_pipeline.py [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SIZE = int(os.environ.get("FRTPU_BENCH_SIZE", 8192))
COMBOS = [
    ("alt", 2048),
    ("duplex", 2048),
    ("alt", 4096),
    ("duplex", 4096),
]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from bench import make_raster
    from flac_raster_tpu.converter import RasterFLACConverter
    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()
    conv = RasterFLACConverter(lossless=True, compute_md5=False)
    data = make_raster(SIZE)[None]
    raw_mb = data.nbytes / 1e6

    times: dict[tuple, list[float]] = {c: [] for c in COMBOS}
    # warm every combo's executables once
    for pipe, chunk in COMBOS:
        os.environ["FRTPU_PIPELINE"] = pipe
        os.environ["FRTPU_CHUNK_FRAMES"] = str(chunk)
        conv.encode_array(data[:, :, : (chunk * 4096) // SIZE])
    os.environ["FRTPU_PIPELINE"] = "alt"
    conv.encode_array(data)  # allocator warm at full size

    for r in range(rounds):
        for pipe, chunk in COMBOS:
            os.environ["FRTPU_PIPELINE"] = pipe
            os.environ["FRTPU_CHUNK_FRAMES"] = str(chunk)
            t0 = time.perf_counter()
            blob = conv.encode_array(data)
            dt = time.perf_counter() - t0
            times[(pipe, chunk)].append(dt)
            print(f"r{r} {pipe:6s} chunk={chunk}: {dt:6.2f}s  "
                  f"{raw_mb/dt:6.2f} MB/s", flush=True)
    print("---", flush=True)
    for combo, ts in times.items():
        print(f"{combo[0]:6s} chunk={combo[1]}: best {raw_mb/min(ts):6.2f} "
              f"median {raw_mb/statistics.median(ts):6.2f} MB/s", flush=True)
    os.environ.pop("FRTPU_CHUNK_FRAMES", None)
    blob = conv.encode_array(data)
    back, _ = conv.decode_bytes(blob)
    assert np.array_equal(back, data), "round-trip failed"
    print("round-trip OK", flush=True)


if __name__ == "__main__":
    main()
