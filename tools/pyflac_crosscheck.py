"""Cross-validate repo-produced FLAC files against the reference toolchain.

The reference delegates its codec contract to libFLAC (reference
``converter.py:139-154``, decode ``:181-182`` via pyflac).  Our suite
validates the OTHER direction (we decode a real libFLAC file bit-exactly,
``tests/test_codec.py``), but "spec-conformant FLAC" stays self-certified
until libFLAC itself decodes OUR files.  This box has no pyflac/soundfile;
the GitHub CI runner does (see ``.github/workflows/ci.yml`` flac-interop
job), and ``tests/test_pyflac_interop.py`` runs the same checks locally
when the libraries are importable.

Matrix (VERDICT r3 #4): every compression level 0-8, mid-side stereo,
32 bps, odd true-bps (12), 3-channel, a spatial tile, and a streaming tile.
For every file the assertion is: the reference toolchain's decoded samples
== OUR decoder's samples == the original input.

Decoder choice per stream: pyflac's FileDecoder (the reference's exact
decode path) raises for bits-per-sample outside {16, 32}
(``/root/reference/docs/sonos-pyflac.txt:1829-1830``), so odd-bps lossless
streams are decoded with soundfile/libsndfile instead (also a libFLAC
wrapper; the reference's own decode detour, SURVEY.md §2.2).

``--baseline OUT.json`` additionally encodes the EXACT bench workload
(bench.make_raster(8192), zero-point-32768 int16 mono, level 5, blocksize
4096) with pyflac/libFLAC -5 and records the byte size -- committed as
``test_data/libflac5_baseline.json`` it turns bench.py's
``ratio_vs_libflac5`` into a measured gate instead of the 40 MB/s stand-in
(VERDICT r3 #5).

Usage:
    python tools/pyflac_crosscheck.py [workdir]
    python tools/pyflac_crosscheck.py --baseline test_data/libflac5_baseline.json
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _signal(n: int, channels: int, bps: int, seed: int = 0) -> np.ndarray:
    """Deterministic smooth-plus-noise test signal, (n, channels) int32."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    amp = (1 << (bps - 1)) - 1
    out = np.empty((n, channels), np.int64)
    for c in range(channels):
        base = 0.6 * np.sin(t / (50.0 + 13 * c)) + 0.3 * np.sin(t / (7.0 + c))
        noise = rng.normal(0, 0.004, n)
        out[:, c] = np.clip(np.round((base + noise) * amp), -amp - 1, amp)
    return out.astype(np.int32)


def build_matrix(workdir: Path) -> list[dict]:
    """Write the cross-check file matrix; return [{name, path, samples, bps}]."""
    from flac_raster_tpu.codec.fast_encoder import encode_flac_fast

    workdir.mkdir(parents=True, exist_ok=True)
    cases: list[dict] = []

    def add(name: str, blob: bytes, samples: np.ndarray, bps: int) -> None:
        p = workdir / f"{name}.flac"
        p.write_bytes(blob)
        cases.append({"name": name, "path": p, "samples": samples, "bps": bps})

    # every compression level, 16-bit mono (reference flag -c 0..8)
    mono = _signal(3 * 4096 + 777, 1, 16, seed=1)
    for level in range(9):
        add(f"level{level}_mono16",
            encode_flac_fast(mono, 44100, 16, compression_level=level), mono, 16)

    # mid-side stereo (levels 1-2 and 4-8 run the 4-assignment search)
    left = _signal(2 * 4096 + 123, 1, 16, seed=2)[:, 0]
    right = (left + _signal(left.shape[0], 1, 10, seed=3)[:, 0]).astype(np.int32)
    np.clip(right, -(1 << 15), (1 << 15) - 1, out=right)
    stereo = np.stack([left, right], axis=1)
    add("midside_stereo16", encode_flac_fast(stereo, 48000, 16, 5), stereo, 16)

    # 32 bps (host int64 planner lane; BASELINE config #3's storage width)
    s32 = (_signal(4096 + 55, 2, 24, seed=4).astype(np.int64) * 199) \
        .clip(-(1 << 31), (1 << 31) - 1).astype(np.int32)
    add("wide_stereo32", encode_flac_fast(s32, 44100, 32, 5), s32, 32)

    # odd true-bps (lossless shift mode writes honest widths; pyflac can't
    # decode these -- soundfile lane)
    s12 = _signal(4096 + 300, 1, 12, seed=5)
    add("truebps12_mono", encode_flac_fast(s12, 44100, 12, 5), s12, 12)

    # multichannel (reference Q6: up to 8 channels)
    s3 = _signal(4096, 3, 16, seed=6)
    add("threechannel16", encode_flac_fast(s3, 44100, 16, 5), s3, 16)

    # spatial + streaming tiles: container-extracted tile payloads must be
    # self-contained FLAC that libFLAC accepts (reference Q3 formats)
    from flac_raster_tpu.codec.decoder import decode_flac
    from flac_raster_tpu.io.geo import Affine
    from flac_raster_tpu.io.geotiff import write_geotiff
    from flac_raster_tpu.models.spatial import SpatialFLACEncoder
    from flac_raster_tpu.models.streaming import create_streaming_flac, load_streaming_index

    rng = np.random.default_rng(9)
    tif_data = (1000 * np.sin(np.arange(256)[:, None] / 17.0)
                + 900 * np.cos(np.arange(256)[None, :] / 23.0)
                + rng.integers(-40, 40, (256, 256))).astype(np.int16)[None]
    tif = workdir / "grid.tif"
    write_geotiff(tif, tif_data,
                  transform=Affine(0.01, 0, -100.0, 0, -0.01, 41.0),
                  crs="EPSG:4326")

    sp = workdir / "grid_spatial.flac"
    enc = SpatialFLACEncoder(tile_size=128)
    index = enc.encode_spatial_flac(tif, sp)
    fr = index.frames[0]
    blob = sp.read_bytes()[fr.byte_offset: fr.byte_offset + fr.byte_size]
    dec = decode_flac(blob, verify_crc=True)
    add("spatial_tile", blob, dec.samples, dec.streaminfo.bits_per_sample)

    st = workdir / "grid_streaming.flac"
    create_streaming_flac(tif, st, tile_size=128)
    sindex = load_streaming_index(st)
    a, b = sindex.absolute_range(sindex.frames[0])
    sbytes = st.read_bytes()[a: b + 1]
    sdec = decode_flac(sbytes, verify_crc=True)
    add("streaming_tile", sbytes, sdec.samples, sdec.streaminfo.bits_per_sample)

    return cases


def decode_reference(path: Path, bps: int) -> np.ndarray:
    """Decode with the reference toolchain; return (n, channels) int32.

    pyflac (the reference's decoder, 16/32 bps only) when possible, else
    soundfile.  Raises ImportError when neither library is present.
    """
    if bps in (16, 32):
        try:
            import pyflac

            floats, _sr = pyflac.FileDecoder(str(path)).process()
            if floats.ndim == 1:
                floats = floats[:, None]
            scale = float(1 << (bps - 1))
            ints = np.round(floats * scale).astype(np.int64)
            return ints.astype(np.int32)
        except ImportError:
            pass
    import soundfile as sf

    raw, _sr = sf.read(str(path), dtype="int32", always_2d=True)
    # libsndfile left-justifies sub-32-bit FLAC samples in the int32 container
    return (raw >> (32 - bps)).astype(np.int32)


def run_crosscheck(workdir: Path) -> int:
    from flac_raster_tpu.codec.decoder import decode_flac

    cases = build_matrix(workdir)
    failures = 0
    for case in cases:
        ours = decode_flac(case["path"].read_bytes(), verify_crc=True).samples
        theirs = decode_reference(case["path"], case["bps"])
        ok_ours = np.array_equal(np.asarray(ours), case["samples"])
        ok_ref = np.array_equal(theirs, np.asarray(case["samples"]))
        status = "OK" if (ok_ours and ok_ref) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status:4s} {case['name']:20s} bps={case['bps']:2d} "
              f"ours={'=' if ok_ours else '!'} libflac={'=' if ok_ref else '!'}")
    print(f"{len(cases) - failures}/{len(cases)} cross-checks passed")
    return 1 if failures else 0


def write_baseline(out: Path) -> int:
    """Encode the exact bench workload with pyflac/libFLAC -5; record bytes."""
    import pyflac

    from bench import make_raster

    raster = make_raster(8192)
    samples = (raster.astype(np.int32) - 32768).astype(np.int16).reshape(-1, 1)
    chunks: list[bytes] = []

    def cb(buf, n_bytes, n_samples, frame):
        chunks.append(bytes(buf))

    enc = pyflac.StreamEncoder(write_callback=cb, sample_rate=44100,
                               compression_level=5, blocksize=4096)
    enc.process(samples)
    enc.finish()
    n = sum(len(c) for c in chunks)
    payload = {
        "workload": "bench.make_raster(8192) uint16 terrain, zero-point-32768 "
                    "int16 mono, blocksize 4096",
        "encoder": "pyflac StreamEncoder level 5 (libFLAC)",
        "libflac5_bytes": n,
        "raw_bytes": samples.nbytes,
        "pyflac_version": getattr(pyflac, "__version__", "unknown"),
    }
    out.write_text(json.dumps(payload, indent=2) + "\n")
    print(json.dumps(payload, indent=2))
    return 0


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(sys.argv) > 1 and sys.argv[1] == "--baseline":
        sys.exit(write_baseline(Path(sys.argv[2])))
    wd = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    sys.exit(run_crosscheck(wd))
