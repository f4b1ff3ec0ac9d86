"""Sweep the full-scan Pallas kernel's static knobs on the real TPU.

Builds one device-encoded fixture, then times decode_frames_device with
scan_impl=pallas2 across FRTPU_SCAN2_NROW x FRTPU_SCAN2_LANES combos (the
env is re-read per call because resolution happens outside the jit), with
the XLA scan as the baseline row.  Outputs one line per combo; every combo
asserts bit-equality against the XLA result.

Usage: python tools/sweep_scan2.py [frames] [chunk_frames]
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def sync(x):
    return np.asarray(x.ravel()[0:1])


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}", flush=True)

    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()

    import jax.numpy as jnp

    from flac_raster_tpu.codec.device_encoder import encode_flac_device
    from flac_raster_tpu.codec import device_decoder as drv
    from flac_raster_tpu.models.flac_format import (
        parse_flac_metadata, parse_layout_block,
    )
    from flac_raster_tpu.ops import device_decode as dd

    rng = np.random.default_rng(42)
    N, C = 4096, 2
    total = frames * N
    base = np.cumsum(rng.integers(-40, 41, (total, 1)), axis=0)
    s = np.clip(
        base + rng.integers(-800, 800, (total, C)), -32768, 32767
    ).astype(np.int32)
    t0 = time.perf_counter()
    blob = encode_flac_device(s, 44100, 16, 5)
    print(f"fixture {len(blob)/1e6:.1f} MB in {time.perf_counter()-t0:.0f}s",
          flush=True)

    # one chunk's windows, exactly like profile_decode
    si, blocks, frame_start = parse_flac_metadata(blob)
    layout = parse_layout_block(blocks)
    arr = np.frombuffer(blob, np.uint8)
    sizes = np.asarray(layout.sizes, np.int64)
    offsets = frame_start + np.concatenate([[0], np.cumsum(sizes)])
    full_frames = si.total_samples // N
    fi = np.arange(full_frames, dtype=np.int64)
    hdr_bits_all = (
        32 + drv._utf8_len_bytes(fi) * 8 + drv._bs_tail_bits(N) + 8
    ).astype(np.int32)
    body_len = 1 << max(8, (len(arr) + 4 * dd._WIN_SLACK_WORDS - 1).bit_length())
    body = np.zeros(body_len, np.uint8)
    body[: len(arr)] = arr
    body_w = jnp.asarray(drv._body_words_host(body))
    sync(body_w)
    B = min(chunk, full_frames)
    maxW = 1 << max(
        5,
        (drv._WROW + (int(sizes[:full_frames].max()) + 3) // 4
         + dd._WIN_SLACK_WORDS - 1).bit_length(),
    )
    gather = drv._GATHER_CACHE.setdefault(maxW, drv._gather_windows_jit(maxW))
    offs = offsets[:B]
    bb_np = ((offs & (4 * drv._WROW - 1)) * 8).astype(np.int32)
    sf_rel = np.zeros((B, C), np.int64)
    sf_rel[:, 0] = hdr_bits_all[:B]
    if C > 1:
        sf_rel[:, 1:] = sf_rel[:, :1] + np.cumsum(layout.sub_bits[:B], axis=1)
    sf = jnp.asarray((sf_rel + bb_np[:, None]).astype(np.int32))
    bb = jnp.asarray(bb_np)
    windows = gather(body_w, jnp.asarray((offs >> 7).astype(np.int32)))
    sync(windows)
    chunk_mb = B * N * C * 2 / 1e6

    def run(**kw):
        o, err = dd.decode_frames_device(windows, bb, sf, C=C, bps=16, N=N,
                                         row_gather=True, **kw)
        return o

    ref = np.asarray(run(scan_impl="xla"))
    dt = timeit(lambda: sync(run(scan_impl="xla")))
    print(f"xla row baseline        : {dt*1e3:7.1f} ms  "
          f"{chunk_mb/dt:7.1f} MB/s raw", flush=True)

    nrows = tuple(int(v) for v in os.environ.get(
        "SWEEP_NROWS", "2,3,4,6,8").split(","))
    lanes_list = tuple(int(v) for v in os.environ.get(
        "SWEEP_LANES", "128,256").split(","))
    for nrow in nrows:
        for lanes in lanes_list:
            os.environ["FRTPU_SCAN2_NROW"] = str(nrow)
            os.environ["FRTPU_SCAN2_LANES"] = str(lanes)
            try:
                out = np.asarray(run(scan_impl="pallas2"))
            except Exception as e:
                print(f"pallas2 nrow={nrow} L={lanes}: FAIL "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            ok = np.array_equal(out, ref)
            dt = timeit(lambda: sync(run(scan_impl="pallas2")))
            print(f"pallas2 nrow={nrow} L={lanes}: {dt*1e3:7.1f} ms  "
                  f"{chunk_mb/dt:7.1f} MB/s raw  "
                  f"{'bit-OK' if ok else 'MISMATCH'}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
