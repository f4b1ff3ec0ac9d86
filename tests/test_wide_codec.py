"""Device lane for wide (32-bps) samples: ops/wide_codec (VERDICT r3 #3).

Contracts tested on the CPU mesh:
  * plan_blocks_wide is decision-identical to ops/host_planner (every plan
    field, every candidate class: const / fixed / LPC / verbatim, both the
    level-5 and level-7/8 search configs);
  * encode_flac_device == encode_flac_fast bytes at bps 32 (the same
    byte-identity invariant the narrow lane holds);
  * decode_flac_device returns exact samples for wide streams, including
    random-access ranges;
  * converter.encode_array_device handles float32 (in-graph bit fold,
    NaN/inf/-0.0 preserved), uint32 (zero_point 2^31 as uint32 wraparound)
    and int32 end-to-end, byte-identical to the host path except the
    (documented) unset MD5 field.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from flac_raster_tpu.codec.device_decoder import decode_flac_device
from flac_raster_tpu.codec.device_encoder import encode_flac_device
from flac_raster_tpu.codec.fast_encoder import encode_flac_fast
from flac_raster_tpu.converter import RasterFLACConverter
from flac_raster_tpu.ops.host_planner import plan_blocks_host
from flac_raster_tpu.ops.wide_codec import plan_blocks_wide

N = 512  # blocksize: small keeps XLA:CPU compiles fast; >= 64, power of 2


def _cases(n: int) -> list[np.ndarray]:
    rng = np.random.default_rng(0)
    t = np.arange(n)
    return [
        # smooth full-scale (LPC)
        (1.5e9 * np.sin(t / 150.0) + 2e8 * np.sin(t / 17.0)).astype(np.int64),
        # small amplitude (fixed orders)
        (1000 * np.sin(t / 50.0) + rng.integers(-5, 5, n)).astype(np.int64),
        # constant
        np.full(n, -123456789, np.int64),
        # full-range noise (verbatim; order-1 residuals exceed 2^31)
        rng.integers(-(1 << 31), 1 << 31, n).astype(np.int64),
        # mid-scale noise
        rng.integers(-(1 << 20), 1 << 20, n).astype(np.int64),
        # step through 2^30 (stresses the pair borrow chains)
        np.concatenate(
            [np.zeros(n // 2, np.int64), np.full(n - n // 2, 1 << 30, np.int64)]
        ),
        # extreme ramp incl. INT32_MIN
        np.linspace(-(1 << 31), (1 << 31) - 1, n).astype(np.int64),
        # float32 bit patterns (what the fold mode feeds the codec)
        (np.sin(t / 300.0) * 1e6).astype(np.float32).view(np.int32).astype(np.int64),
    ]


@pytest.mark.parametrize(
    "max_lpc_order,apodizations",
    [(8, ("tukey(0.5)",)), (12, ("tukey(0.5)", "tukey(0.25)"))],
    ids=["level5", "level8"],
)
def test_wide_planner_matches_host_planner(max_lpc_order, apodizations):
    x = np.stack(_cases(N))
    kw = dict(
        blocksize=N, bps=32, max_lpc_order=max_lpc_order,
        max_partition_order=6, use_lpc=True, apodizations=apodizations,
    )
    hp = plan_blocks_host(x, **kw)
    wp = plan_blocks_wide(jnp.asarray(x.astype(np.int32)), **kw)
    for key, hval in hp.items():
        assert np.array_equal(
            np.asarray(hval).astype(np.int64),
            np.asarray(wp[key]).astype(np.int64),
        ), f"plan field {key} diverged"


def _wide_signal(n: int, channels: int = 1, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    cols = []
    for c in range(channels):
        x = (
            1.2e9 * np.sin(t / (200.0 + 31 * c))
            + 3e7 * np.sin(t / (13.0 + c))
            + rng.integers(-1000, 1000, n)
        )
        cols.append(np.clip(x, -(1 << 31), (1 << 31) - 1).astype(np.int32))
    return np.stack(cols, axis=1)


def test_device_encode_bytes_identical_wide():
    x = _wide_signal(5 * N + 77)
    h = encode_flac_fast(x, 44100, 32, compression_level=5, blocksize=N)
    d = encode_flac_device(x, 44100, 32, compression_level=5, blocksize=N)
    assert h == d


def test_device_encode_bytes_identical_wide_stereo():
    x = _wide_signal(4 * N + 9, channels=2, seed=3)
    h = encode_flac_fast(x, 44100, 32, compression_level=5, blocksize=N)
    d = encode_flac_device(x, 44100, 32, compression_level=5, blocksize=N)
    assert h == d


def test_device_decode_wide_exact_and_ranged():
    x = _wide_signal(6 * N + 123, channels=2, seed=4)
    blob = encode_flac_fast(x, 44100, 32, compression_level=5, blocksize=N)
    dec = decode_flac_device(blob, verify_crc=True)
    assert np.array_equal(np.asarray(dec.samples), x)
    s0, cnt = 2 * N + 50, 3 * N // 2
    sub = decode_flac_device(blob, verify_crc=True, sample_range=(s0, cnt))
    assert np.array_equal(np.asarray(sub.samples), x[s0 : s0 + cnt])


def test_encode_array_device_float32_fold():
    conv = RasterFLACConverter(lossless=True)
    rng = np.random.default_rng(5)
    f32 = (np.sin(np.arange(96 * 128).reshape(96, 128) / 300.0) * 1e5
           + rng.normal(0, 10, (96, 128))).astype(np.float32)
    f32[3, 7] = np.nan
    f32[10, 20] = -np.inf
    f32[0, 0] = -0.0
    blob_d = conv.encode_array_device(jnp.asarray(f32))
    blob_h = conv.encode_array(f32)
    # identical bytes except STREAMINFO's MD5 (unset on the egress path)
    assert len(blob_d) == len(blob_h)
    diff = [i for i, (a, b) in enumerate(zip(blob_h, blob_d)) if a != b]
    assert diff and all(26 <= i < 42 for i in diff)
    data, _ = conv.decode_bytes(blob_d)
    assert data.dtype == np.float32
    assert np.array_equal(data[0], f32, equal_nan=True)
    # device ingest (decode + in-graph denorm) returns the raster exactly
    arr, _ = conv.decode_bytes_device(blob_d)
    assert np.array_equal(np.asarray(arr)[0], f32, equal_nan=True)


@pytest.mark.parametrize("dtype", [np.uint32, np.int32], ids=["uint32", "int32"])
def test_encode_array_device_32bit_ints(dtype):
    conv = RasterFLACConverter(lossless=True)
    rng = np.random.default_rng(6)
    t = np.arange(80 * 128).reshape(80, 128)
    if dtype is np.uint32:
        data = (t.astype(np.uint32) * 7919
                + (rng.integers(0, 1000, t.shape)).astype(np.uint32))
    else:
        data = (np.sin(t / 100.0) * 2e9).astype(np.int32)
    blob = conv.encode_array_device(jnp.asarray(data))
    back, _ = conv.decode_bytes(blob)
    assert back.dtype == dtype
    assert np.array_equal(back[0], data)


def test_encode_array_device_float64_split():
    """float64 egress (VERDICT r4 #3): only the hi/lo bit split runs on
    host; planning/emission rides the wide device lane.  Byte-identical to
    the host path (MD5 field aside), NaN/inf/-0.0 exact both ways."""
    conv = RasterFLACConverter(lossless=True)
    rng = np.random.default_rng(7)
    t = np.arange(70 * 128).reshape(70, 128)
    f64 = (np.sin(t / 200.0) * 1e10 + rng.normal(0, 1, t.shape)).astype(np.float64)
    f64[1, 2] = np.nan
    f64[2, 3] = np.inf
    f64[3, 4] = -np.inf
    f64[0, 0] = -0.0
    blob_d = conv.encode_array_device(f64)
    blob_h = conv.encode_array(f64)
    assert len(blob_d) == len(blob_h)
    diff = [i for i, (a, b) in enumerate(zip(blob_h, blob_d)) if a != b]
    assert diff and all(26 <= i < 42 for i in diff)  # only the unset MD5
    # opt-in MD5 closes even that gap
    assert conv.encode_array_device(f64, compute_md5=True) == blob_h
    # host decode and device decode (wide lane + host recombine) both exact
    data, _ = conv.decode_bytes(blob_d)
    assert data.dtype == np.float64
    assert np.array_equal(data[0], f64, equal_nan=True)
    arr, _ = conv.decode_bytes_device(blob_d)
    assert isinstance(arr, np.ndarray) and arr.dtype == np.float64
    assert np.array_equal(arr[0], f64, equal_nan=True)


def test_encode_array_device_opt_in_md5():
    """compute_md5=True on the device-resident lanes patches the true PCM
    hash into STREAMINFO -- bytes become fully identical to encode_array's
    (VERDICT r4 #7: no silently-unset MD5 unless the caller chose it)."""
    conv = RasterFLACConverter(lossless=True)
    rng = np.random.default_rng(8)
    data = rng.integers(0, 60000, (64, 128)).astype(np.uint16)
    blob_d = conv.encode_array_device(jnp.asarray(data), compute_md5=True)
    blob_h = conv.encode_array(data)
    assert blob_d == blob_h
    # and the hash verifies on decode
    from flac_raster_tpu.codec.decoder import decode_flac

    dec = decode_flac(blob_d, verify_crc=True, verify_md5=True)
    assert dec.streaminfo.md5 != b"\x00" * 16
