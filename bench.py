"""Benchmark: raster -> FLAC encode throughput (bit-exact, level 5).

Workload: Sentinel-2-like single-band uint16 terrain raster (BASELINE.md's
headline scene is B04 10980^2 uint16; this uses a synthetic field of the
same statistical character, sized to keep bench wall-time sane).  The
pipeline measured is the full encode_array path: lossless normalization ->
device block planning (JAX, on whatever platform is active -- the real TPU
chip under the driver) -> vectorized host emission + pack.

Baseline: the reference (single-threaded libFLAC 1.4.3 via pyflac) publishes
no throughput numbers (SURVEY.md §6); 40 MB/s is a representative libFLAC -5
encode rate for 16-bit PCM on one CPU core, used as the fixed denominator so
vs_baseline is comparable across rounds.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MBPS = 40.0
SIZE = 8192  # pixels per side


def make_raster(size: int) -> np.ndarray:
    """Synthetic terrain: smooth multiscale field + sensor noise, uint16."""
    rng = np.random.default_rng(42)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    field = (
        8000.0 * np.sin(xx / 901.0) * np.cos(yy / 677.0)
        + 3000.0 * np.sin((xx + yy) / 269.0)
        + 500.0 * np.sin(xx / 31.0) * np.sin(yy / 47.0)
    )
    field += rng.normal(0, 12.0, field.shape)
    field -= field.min()
    return field.astype(np.uint16)


def main() -> None:
    import jax

    # persistent compile cache: tunnel TPU compiles are minutes; cache makes
    # repeated bench runs measure compute, not the compiler
    jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flac_raster_tpu.converter import RasterFLACConverter

    conv = RasterFLACConverter(lossless=True, compute_md5=False)

    data = make_raster(SIZE)[None]
    # warmups: one full-size chunk compiles the executables, then one full
    # pass warms the allocator/page tables -- the timed pass measures
    # steady-state serving throughput
    conv.encode_array(data[:, :, : (2048 * 4096) // SIZE])
    conv.encode_array(data)
    raw_mb = data.nbytes / 1e6

    t0 = time.perf_counter()
    blob = conv.encode_array(data)
    dt = time.perf_counter() - t0

    # bit-exact round-trip gate: a fast-but-wrong encode must not score
    back, _ = conv.decode_bytes(blob)
    assert back.dtype == data.dtype and np.array_equal(back, data), "round-trip failed"

    mbps = raw_mb / dt
    print(
        json.dumps(
            {
                "metric": "encode_throughput_uint16_level5",
                "value": round(mbps, 2),
                "unit": "MB/s",
                "vs_baseline": round(mbps / BASELINE_MBPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
