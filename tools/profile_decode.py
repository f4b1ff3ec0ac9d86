"""Stage-resolved profile of the device decode path on the real TPU.

Times each stage of codec/device_decoder + ops/device_decode separately:
upload, window gather, next-one table, subframe parse (Rice chain scan),
and the full decode_frames_device, plus end-to-end decode_flac_device.
Synchronization is by host readback of a tiny slice (axon gotcha:
block_until_ready is a no-op -- see repo CLAUDE.md).

Usage: python tools/profile_decode.py [frames] [chunk_frames]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def sync(x):
    # device-side slice FIRST: np.asarray on the full array would drag the
    # whole output through the ~20 MB/s tunnel and dominate every timing
    return np.asarray(x.ravel()[0:1])


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}")

    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()

    import jax.numpy as jnp

    from flac_raster_tpu.codec.fast_encoder import encode_flac_fast
    from flac_raster_tpu.codec.device_decoder import decode_flac_device

    rng = np.random.default_rng(42)
    N = 4096
    C = 2
    total = frames * N
    base = np.cumsum(rng.integers(-40, 41, (total, 1)), axis=0)
    s = np.clip(base + rng.integers(-800, 800, (total, C)), -32768, 32767).astype(
        np.int32
    )
    raw_mb = s.nbytes / 2 / 1e6  # int16-equivalent raw size
    t0 = time.perf_counter()
    # FRTPU_FIXTURE=device builds the fixture with the device encoder --
    # same stream family (FRTP v2 index, TOK32) but minutes faster than the
    # host path on this box; use it for env-knob sweep sessions where the
    # fixture is rebuilt once per process
    if __import__("os").environ.get("FRTPU_FIXTURE") == "device":
        from flac_raster_tpu.codec.device_encoder import encode_flac_device

        blob = encode_flac_device(s, 44100, 16, 5)
        enc_kind = "device"
    else:
        blob = encode_flac_fast(s, 44100, 16, 5)
        enc_kind = "host"
    print(f"fixture: {frames} frames, raw {raw_mb:.1f} MB -> "
          f"{len(blob)/1e6:.1f} MB compressed ({enc_kind} encode "
          f"{time.perf_counter()-t0:.1f}s)")

    # ---- end-to-end (includes host CRC pass + per-chunk dispatch) ----------
    dec = decode_flac_device(blob, verify_crc=True, chunk_frames=chunk)
    sync(dec.samples)
    dt = timeit(lambda: sync(decode_flac_device(blob, verify_crc=True,
                                                chunk_frames=chunk).samples))
    print(f"e2e decode_flac_device     : {dt*1e3:8.1f} ms  {raw_mb/dt:7.1f} MB/s raw")

    dt = timeit(lambda: sync(decode_flac_device(blob, verify_crc=False,
                                                chunk_frames=chunk).samples))
    print(f"e2e (no CRC)               : {dt*1e3:8.1f} ms  {raw_mb/dt:7.1f} MB/s raw")

    # ---- stage timings on one chunk ---------------------------------------
    from flac_raster_tpu.models.flac_format import parse_flac_metadata, parse_layout_block
    from flac_raster_tpu.codec import device_decoder as drv
    from flac_raster_tpu.ops import device_decode as dd

    buf = blob
    si, blocks, frame_start = parse_flac_metadata(buf)
    layout = parse_layout_block(blocks)
    arr = np.frombuffer(buf, np.uint8)
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

    words_host = drv._body_words_host(body)
    dt = timeit(lambda: sync(jnp.asarray(words_host)))
    print(f"upload body ({body_len/1e6:.1f} MB)     : {dt*1e3:8.1f} ms  {raw_mb/dt:7.1f} MB/s raw-equiv")
    body_w = jnp.asarray(words_host)
    sync(body_w)

    B = min(chunk, full_frames)
    maxW = 1 << max(
        5,
        (
            drv._WROW
            + (int(sizes[:full_frames].max()) + 3) // 4
            + dd._WIN_SLACK_WORDS
            - 1
        ).bit_length(),
    )
    gather = drv._GATHER_CACHE.setdefault(maxW, drv._gather_windows_jit(maxW))
    offs = offsets[:B]
    row0 = jnp.asarray((offs >> 7).astype(np.int32))
    bb_np = ((offs & (4 * drv._WROW - 1)) * 8).astype(np.int32)
    bb = jnp.asarray(bb_np)
    sf_rel = np.zeros((B, C), np.int64)
    sf_rel[:, 0] = hdr_bits_all[:B]
    if C > 1:
        sf_rel[:, 1:] = sf_rel[:, :1] + np.cumsum(layout.sub_bits[:B], axis=1)
    sf = jnp.asarray((sf_rel + bb_np[:, None]).astype(np.int32))
    windows = gather(body_w, row0)
    sync(windows)
    n_chunks = (full_frames + B - 1) // B
    dt = timeit(lambda: sync(gather(body_w, row0)))
    print(f"gather windows (B={B}, {maxW} words): {dt*1e3:8.1f} ms/chunk x{n_chunks}")

    # Pallas DMA window gather A/B (the TPU-default window source)
    from flac_raster_tpu.ops import pallas_gather as pg

    interp = jax.default_backend() == "cpu"
    win_words = (
        pg.ALIGN_ROWS * pg.ROW_WORDS
        + (int(sizes[:full_frames].max()) + 3) // 4
        + dd._WIN_SLACK_WORDS
    )
    out_rows = -(-win_words // pg.ROW_WORDS)
    out_rows = (out_rows + pg.ALIGN_ROWS - 1) & ~(pg.ALIGN_ROWS - 1)
    dma_len = max(
        body_len, ((int(offs.max()) & ~4095) + out_rows * 4 * pg.ROW_WORDS)
    )
    dma_len = -(-dma_len // 4096) * 4096
    body_d = np.zeros(dma_len, np.uint8)
    body_d[: len(arr)] = arr
    body2d = jnp.asarray(drv._body_words_host(body_d).reshape(-1, pg.ROW_WORDS))
    sync(body2d)
    row0_d = jnp.asarray(((offs >> 12) * pg.ALIGN_ROWS).astype(np.int32))
    win_d = pg.gather_windows_dma(body2d, row0_d, out_rows=out_rows, interpret=interp)
    sync(win_d)
    dt = timeit(lambda: sync(
        pg.gather_windows_dma(body2d, row0_d, out_rows=out_rows, interpret=interp)
    ))
    print(f"gather windows DMA (B={B}, {out_rows * pg.ROW_WORDS} words): "
          f"{dt*1e3:8.1f} ms/chunk x{n_chunks}")

    # full frame decode kernel A/B: Pallas scan vs XLA row-gather vs element
    chunk_mb = B * N * C * 2 / 1e6
    variants = [
        ("row ", dict(row_gather=True, scan_impl="xla")),
        ("elem", dict(row_gather=False, scan_impl="xla")),
    ]
    if jax.default_backend() != "cpu":
        variants.insert(0, ("plls", dict(row_gather=True, scan_impl="pallas")))
        variants.insert(0, ("pls2", dict(row_gather=True, scan_impl="pallas2")))
    out = None
    for label, kw in variants:
        o, err = dd.decode_frames_device(windows, bb, sf, C=C, bps=16, N=N, **kw)
        if out is None:
            out = np.asarray(o)
        else:
            assert np.array_equal(np.asarray(o), out), f"mode mismatch: {label}"
        dt = timeit(
            lambda: sync(
                dd.decode_frames_device(
                    windows, bb, sf, C=C, bps=16, N=N, **kw
                )[0]
            )
        )
        print(f"decode_frames_device ({label}): {dt*1e3:8.1f} ms/chunk  "
              f"{chunk_mb/dt:7.1f} MB/s raw ({chunk_mb:.1f} MB/chunk)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
