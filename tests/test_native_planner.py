"""Native host planner (ops/native_planner + native/plan.cpp) exactness.

The native planner must be BYTE-IDENTICAL to the XLA planner on CPU: the
float stage is the same traced program (device_codec.analyze_lpc_windows)
and the integer stage is an operation-for-operation C++ replica.  These
tests assert plan-dict equality field-by-field and whole-stream byte
equality across levels, dtypes, stereo modes, and per-block bit depths.

Reference context: the reference delegates this role to libFLAC's C core
(SURVEY.md §2.2); here it is a first-party native stage under the same
exact-bit-accounting contract as the XLA and host planners.
"""

import numpy as np
import pytest

from flac_raster_tpu import native
from flac_raster_tpu.codec.fast_encoder import encode_flac_fast
from flac_raster_tpu.ops.device_codec import make_planner
from flac_raster_tpu.ops.native_planner import make_native_planner

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _streams(rng, B, N):
    return {
        "walk": (
            np.cumsum(rng.integers(-80, 80, (B, N)), axis=1) % 50000 - 25000
        ).astype(np.int32),
        "noise": rng.integers(-32768, 32767, (B, N)).astype(np.int32),
        "const": np.full((B, N), -5, np.int32),
        "silence+noise": np.where(
            np.arange(N)[None] < N // 2,
            0,
            rng.integers(-100, 100, (B, N)),
        ).astype(np.int32),
        "loud": (
            np.cumsum(rng.integers(-30000, 30000, (B, N)), axis=1) % 65000
            - 32500
        ).astype(np.int32),
    }


@pytest.mark.parametrize(
    "cfg",
    [
        dict(max_lpc_order=8, use_lpc=True, apodizations=("tukey(0.5)",)),
        dict(max_lpc_order=0, use_lpc=False, apodizations=()),
        dict(
            max_lpc_order=12,
            use_lpc=True,
            apodizations=("tukey(0.5)", "tukey(0.25)"),
        ),
    ],
    ids=["level5", "fixed-only", "level8-two-windows"],
)
def test_plan_dict_matches_xla(cfg):
    rng = np.random.default_rng(7)
    B, N = 32, 4096
    xla = make_planner(blocksize=N, bps=16, max_partition_order=6, **cfg)
    nat = make_native_planner(blocksize=N, bps=16, max_partition_order=6, **cfg)
    assert nat is not None
    for name, x in _streams(rng, B, N).items():
        a = {k: np.asarray(v) for k, v in xla(x).items()}
        b = nat(x)
        assert set(a) == set(b)
        for k in a:
            assert np.array_equal(a[k], b[k]), f"{name}: field {k} differs"


def test_plan_dict_matches_xla_per_block_bps():
    # mid-side planning mixes bps and bps+1 subframes via bps_arr
    rng = np.random.default_rng(8)
    B, N = 32, 4096
    x = (np.cumsum(rng.integers(-80, 80, (B, N)), axis=1) % 50000 - 25000)
    x = x.astype(np.int32)
    bps_arr = np.where(np.arange(B) % 4 == 3, 17, 16).astype(np.int32)
    xla = make_planner(blocksize=N, bps=17)
    nat = make_native_planner(blocksize=N, bps=17)
    a = {k: np.asarray(v) for k, v in xla(x, bps_arr).items()}
    b = nat(x, bps_arr)
    for k in a:
        assert np.array_equal(a[k], b[k]), f"field {k} differs"


def test_plan_dict_matches_xla_small_blocksize():
    # blocksize 256 exercises the max_partition_order adjustment loop
    rng = np.random.default_rng(9)
    B, N = 16, 256
    x = (np.cumsum(rng.integers(-50, 50, (B, N)), axis=1) % 4000 - 2000)
    x = x.astype(np.int32)
    xla = make_planner(blocksize=N, bps=16)
    nat = make_native_planner(blocksize=N, bps=16)
    a = {k: np.asarray(v) for k, v in xla(x).items()}
    b = nat(x)
    for k in a:
        assert np.array_equal(a[k], b[k]), f"field {k} differs"


def test_wide_bps_returns_none():
    assert make_native_planner(blocksize=4096, bps=32) is None


@pytest.mark.parametrize("level", [0, 2, 5, 8])
@pytest.mark.parametrize("channels", [1, 2])
def test_stream_bytes_match_xla_planner(level, channels):
    # whole-stream equality through encode_flac_fast, including the
    # mid-side variant search and the tail frame.  The native planner is
    # passed explicitly: under the multi-device test mesh the default
    # planner is the sharded XLA one, so this asserts native == mesh-XLA.
    from flac_raster_tpu.codec.encoder import EncoderConfig
    from flac_raster_tpu.ops.stereo import midside_ok

    rng = np.random.default_rng(level * 10 + channels)
    n = 4096 * 3 + 777
    base = np.cumsum(rng.integers(-60, 60, (n, channels)), axis=0)
    x = (base % 50000 - 25000).astype(np.int32)

    cfg = EncoderConfig.from_level(level)
    nominal = 17 if midside_ok(channels, 16, cfg.mid_side) else 16
    nat = make_native_planner(
        blocksize=4096,
        bps=nominal,
        max_lpc_order=cfg.max_lpc_order,
        apodizations=cfg.apodizations,
        max_partition_order=min(cfg.max_partition_order, 6),
        use_lpc=cfg.use_lpc,
    )
    assert nat is not None
    ref = encode_flac_fast(x, 44100, 16, compression_level=level)
    got = encode_flac_fast(x, 44100, 16, compression_level=level, planner=nat)
    assert got == ref
