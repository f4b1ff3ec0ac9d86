"""Mosaic packing kernel (ops/pallas_pack) vs the XLA scatter reference.

Runs the kernel in interpret mode on the CPU test mesh; byte-for-byte
equality with device_emit._scatter_tokens is the contract that keeps the
device encoder's output identical whichever emission path runs.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from flac_raster_tpu.ops.device_emit import _scatter_tokens
from flac_raster_tpu.ops.pallas_pack import MAX_TOKEN_BITS, pack_tokens


def _random_stream(rng, nt, slots, max_len=27, dead_frac=0.15):
    """Monotone disjoint token stream honoring pack_tokens' preconditions."""
    from flac_raster_tpu.ops.pallas_pack import MAX_PITCH_BITS

    assert max_len <= MAX_TOKEN_BITS
    vals = np.zeros(nt, np.uint32)
    lens = np.zeros(nt, np.int32)
    offs = np.zeros(nt, np.int64)
    pos = int(rng.integers(0, 200))
    for t in range(nt):
        if rng.random() < dead_frac:
            offs[t] = pos  # dead slot, keeps offsets monotone
            continue
        length = int(rng.integers(1, max_len + 1))
        gap = (
            int(rng.integers(0, MAX_PITCH_BITS - length + 1))
            if rng.random() < 0.5 and length < MAX_PITCH_BITS
            else 0
        )
        if t % slots == slots - 1:
            gap += int(rng.integers(0, 900))  # subframe-crossing gap
        pos += gap
        offs[t] = pos
        lens[t] = length
        vals[t] = rng.integers(0, 1 << length)
        pos += length
    n_words = pos // 32 + 4
    return vals, lens, offs.astype(np.int32), n_words


@pytest.mark.parametrize("version", ["v1", "v2", "v3", "v4", "v5"])
@pytest.mark.parametrize(
    "nt,slots,seed",
    [
        (4096, 4096, 0),          # exactly one super-tile
        (2 * 4096 + 1234, 4096, 1),  # padding + carry handoff
        (5000, 64, 2),            # dense crossings (small blocksize)
        (300, 4096, 3),           # sub-super-tile stream
    ],
)
def test_pack_matches_scatter(nt, slots, seed, version):
    rng = np.random.default_rng(seed)
    vals, lens, offs, n_words = _random_stream(rng, nt, slots)
    ref = np.asarray(
        _scatter_tokens(
            jnp.zeros(n_words, jnp.uint32),
            jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs),
        )
    )
    out = np.asarray(
        pack_tokens(
            jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs),
            n_words=n_words, slots_per_group=slots, interpret=True,
            version=version,
        )
    )
    mism = np.nonzero(ref != out)[0]
    assert mism.size == 0, f"first mismatch word {mism[:8]} of {n_words}"


def test_pack_all_dead_tokens():
    """Constant subframes: every token dead -> all-zero buffer."""
    nt = 4096
    vals = np.zeros(nt, np.uint32)
    lens = np.zeros(nt, np.int32)
    offs = np.full(nt, 12345, np.int32)
    out = np.asarray(
        pack_tokens(
            jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs),
            n_words=1024, slots_per_group=4096, interpret=True,
        )
    )
    assert not out.any()


@pytest.mark.parametrize("version", ["v1", "v2", "v3", "v4", "v5"])
def test_pack_dense_one_bit_tokens(version):
    """Worst-case density: adjacent 1-bit tokens (32 per word)."""
    nt = 4096
    vals = np.ones(nt, np.uint32)
    lens = np.ones(nt, np.int32)
    offs = np.arange(nt, dtype=np.int32) + 7
    n_words = (nt + 7 + 31) // 32 + 2
    ref = np.asarray(
        _scatter_tokens(
            jnp.zeros(n_words, jnp.uint32),
            jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs),
        )
    )
    out = np.asarray(
        pack_tokens(
            jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs),
            n_words=n_words, slots_per_group=4096, interpret=True,
            version=version,
        )
    )
    assert np.array_equal(ref, out)


@pytest.mark.parametrize("version", ["v1", "v2", "v3", "v4", "v5"])
def test_pack_max_pitch_stream(version):
    """Amortized-worst-case pitch: back-to-back 32-bit spans (the planner
    cap's extreme) plus a GAP_BITS crossing per slot group -- pins the v2
    single-row span bound."""
    from flac_raster_tpu.ops.pallas_pack import GAP_BITS, MAX_PITCH_BITS

    nt, slots = 2 * 4096, 4096
    vals = np.full(nt, 0x7FFFFFF, np.uint32)
    lens = np.full(nt, 27, np.int32)          # <= MAX_TOKEN_BITS
    pitches = np.full(nt, MAX_PITCH_BITS, np.int64)
    pitches[slots::slots] += GAP_BITS - MAX_PITCH_BITS + 27  # crossing gap
    offs = (np.cumsum(pitches) - pitches[0]).astype(np.int32)
    n_words = int(offs[-1] + 64) // 32 + 4
    ref = np.asarray(
        _scatter_tokens(
            jnp.zeros(n_words, jnp.uint32),
            jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs),
        )
    )
    out = np.asarray(
        pack_tokens(
            jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs),
            n_words=n_words, slots_per_group=slots, interpret=True,
            version=version,
        )
    )
    assert np.array_equal(ref, out)


class TestEmitIntegration:
    """plan_and_emit with the pack kernel == the XLA scatter path, bytewise."""

    @pytest.mark.parametrize("mid_side", [False, True])
    def test_plan_and_emit_identical(self, mid_side):
        from flac_raster_tpu.codec.encoder import _BPS_CODES, _SAMPLE_RATE_CODES
        from flac_raster_tpu.codec.fast_encoder import _blocksize_header
        from flac_raster_tpu.ops import device_codec as dc
        from flac_raster_tpu.ops import device_emit
        from flac_raster_tpu.ops.device_emit import plan_and_emit, worst_case_words

        rng = np.random.default_rng(7)
        F, C, N = 3, 2, 4096
        base = np.cumsum(rng.integers(-50, 50, (F, 1, N)), axis=-1)
        x = np.clip(
            base + rng.integers(-5000, 5000, (F, C, N)), -32768, 32767
        ).astype(np.int32)
        # one constant subframe and one noisy (verbatim-prone) subframe
        x[1, 0] = 42
        x[2, 1] = rng.integers(-32768, 32768, N)
        bs_code, bs_tail_val, bs_tail_bits = _blocksize_header(N)
        kw = dict(
            blocksize=N, bps=16, sr_code=_SAMPLE_RATE_CODES[44100],
            bps_code=_BPS_CODES[16], bs_code=bs_code,
            bs_tail_bits=bs_tail_bits, bs_tail_val=bs_tail_val,
            max_lpc_order=8, max_partition_order=6, use_lpc=True,
            n_words=worst_case_words(F, C, N, 17), mid_side=mid_side,
        )
        xj = jnp.asarray(x)
        ref = plan_and_emit(xj, jnp.int32(0), **kw)
        dc.FORCE_PALLAS_INTERPRET = True
        plan_and_emit.clear_cache()
        try:
            out = plan_and_emit(xj, jnp.int32(0), **kw)
        finally:
            dc.FORCE_PALLAS_INTERPRET = False
            plan_and_emit.clear_cache()
        assert np.array_equal(np.asarray(ref["frame_bits"]), np.asarray(out["frame_bits"]))
        assert np.array_equal(np.asarray(ref["words"]), np.asarray(out["words"]))
