"""Pallas Rice-scan kernel bit-identity (ops/pallas_rice_scan[2]).

Two Mosaic engines exist as alternatives to the XLA rice_step formulation:
the group-step kernel (FRTPU_DECODE_SCAN=pallas, one kernel call per scan
step) and the full-scan kernel (=pallas2, the whole chain in one Pallas
program with VMEM-resident windows).  On the CPU test mesh they run under
the Pallas interpreter (scan_impl="interpret"/"interpret2"); every case
must decode bit-identically to the pure-XLA scan AND to the original
samples.  The reference decodes through libFLAC's sequential host
bitreader (reference converter.py:181-182) -- no counterpart kernel
exists there.
"""

import numpy as np
import pytest

from flac_raster_tpu.codec.fast_encoder import encode_flac_fast
from flac_raster_tpu.codec.device_decoder import decode_flac_device

N = 256


def _roundtrip(x, bps, level, monkeypatch, engine="interpret"):
    blob = encode_flac_fast(x, 44100, bps, level, blocksize=N)
    monkeypatch.setenv("FRTPU_DECODE_ROW", "1")
    monkeypatch.setenv("FRTPU_DECODE_SCAN", engine)
    dev = decode_flac_device(blob, verify_crc=True, verify_md5=True)
    got = np.asarray(dev.samples)
    assert np.array_equal(got.astype(np.int64), x.astype(np.int64))
    # and identical to the XLA scan engine on the same stream
    monkeypatch.setenv("FRTPU_DECODE_SCAN", "xla")
    ref = np.asarray(decode_flac_device(blob, verify_crc=True).samples)
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("channels", [1, 3])
def test_pallas_scan_matches_host(rng, channels, monkeypatch):
    n = N * 5 + 77  # tail frame exercises the partial-block host path too
    base = np.cumsum(rng.integers(-50, 51, (n, channels)), axis=0)
    x = np.clip(base, -30000, 30000).astype(np.int32)
    _roundtrip(x, 16, 5, monkeypatch)


@pytest.mark.parametrize("level", [0, 8])
def test_pallas_scan_levels(rng, level, monkeypatch):
    """Level sweep covers fixed orders, LPC, and partition-order extremes."""
    t = np.arange(N * 4)
    x = (500 * np.sin(t / 9.0) + rng.normal(0, 4, N * 4)).astype(np.int32)[:, None]
    _roundtrip(x, 16, level, monkeypatch)


@pytest.mark.parametrize("bps", [8, 24])
def test_pallas_scan_bit_depths(rng, bps, monkeypatch):
    lim = 1 << (bps - 1)
    x = rng.integers(-lim, lim, (N * 3, 2)).astype(np.int64)
    _roundtrip(x, bps, 5, monkeypatch)


def test_pallas_scan_constant_verbatim(rng, monkeypatch):
    """Constant + verbatim subframes: inactive Rice lanes must stay inert."""
    x = np.zeros((N * 3, 2), np.int32)
    x[:N] = 1234  # constant block
    x[N : 2 * N] = rng.integers(-32000, 32000, (N, 2))  # near-verbatim noise
    _roundtrip(x, 16, 5, monkeypatch)


def test_pallas_scan_kernel_unit(rng, monkeypatch):
    """Direct kernel-vs-XLA unit check on a mid-side stereo stream."""
    n = N * 4
    left = np.cumsum(rng.integers(-30, 31, n))
    right = left + rng.integers(-5, 6, n)
    x = np.clip(np.stack([left, right], 1), -30000, 30000).astype(np.int32)
    _roundtrip(x, 16, 5, monkeypatch)


@pytest.mark.parametrize(
    "case", ["midside", "tail3ch", "bps24", "constverb", "bps32"]
)
def test_pallas_scan2_full(rng, case, monkeypatch):
    """Full-scan kernel (pallas2): same coverage classes, one engine run."""
    if case == "midside":
        n = N * 4
        left = np.cumsum(rng.integers(-30, 31, n))
        right = left + rng.integers(-5, 6, n)
        x = np.clip(np.stack([left, right], 1), -30000, 30000).astype(np.int32)
        bps = 16
    elif case == "tail3ch":
        base = np.cumsum(rng.integers(-50, 51, (N * 5 + 77, 3)), axis=0)
        x = np.clip(base, -30000, 30000).astype(np.int32)
        bps = 16
    elif case == "bps24":
        x = rng.integers(-(1 << 23), 1 << 23, (N * 3, 2)).astype(np.int64)
        bps = 24
    elif case == "bps32":
        # the wide lane (bps > 26): int64 host planner + device f32 fold
        base = np.cumsum(rng.integers(-(1 << 20), 1 << 20, (N * 3, 1)), axis=0)
        x = np.clip(base, -(1 << 31), (1 << 31) - 1).astype(np.int64)
        bps = 32
    else:
        x = np.zeros((N * 3, 2), np.int32)
        x[:N] = 1234
        x[N : 2 * N] = rng.integers(-32000, 32000, (N, 2))
        bps = 16
    _roundtrip(x, bps, 5, monkeypatch, engine="interpret2")
