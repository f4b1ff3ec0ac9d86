"""Attribute + attack the row-mode Rice scan cost on the real TPU.

profile_decode_parts (2026-08-19, v5e, B=2048 N=4096) pinned the decode
kernel's real compute almost entirely on the Rice chain scan (IIR ~2 ms,
residual place ~0.2 ms, 512-step empty scan at the dispatch floor).  This
tool times the SHIPPED row-mode scan dataflow (ops/device_decode.rice_step,
synthetic plan inputs) against surgical variants to split the remaining
cost and test one layout hypothesis:

  base     -- the shipped dataflow, with ONE deliberate deviation: the
              partition parameter is clamped (k = min(k_new, 14)) so the
              random synthetic words can't drive k past the token cap; the
              shipped rice_step keeps k_new and relies on its escape /
              oversize err flags instead.  Bit advances therefore differ
              slightly from production on random inputs; the instruction
              mix is otherwise identical.
  noga     -- per-lane row gather replaced by a static slice: isolates the
              window-fetch cost from the shift chain.
  T        -- window kept TRANSPOSED (words on the sublane axis, lanes on
              the 128-lane axis).  The shipped (B, 66) window pads its
              minor dim to 128 lanes, so every per-code window shift pays
              128 columns for 66 live words; transposed, the same data is
              (66, B) = 9 sublane tiles with zero pad waste.
  Tshrink  -- transposed + per-code shrinking width: after code g only
              ceil(37*(group-1-g)/32)+1 words can still be read, so the
              shift chain's live width decays 66 -> 3 across the group
              (physically real on the sublane axis, a no-op on the padded
              lane axis).

Synthetic inputs (random words, all-Rice lanes, order 0) keep the exact
instruction mix; outputs are discarded.  Not a correctness tool -- the
variants' z outputs DO match base (asserted on the first rep) since the
arithmetic is identical.

Usage: python tools/profile_rice_scan.py [B] [N] [nrow]
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

_RW = 32


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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    nrow = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax

    if __import__("os").environ.get("FRTPU_SCAN_CPU"):
        jax.config.update("jax_platforms", "cpu")  # correctness smoke
    jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}  B={B} N={N} nrow={nrow}")

    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()

    import jax.numpy as jnp

    W = 4096
    row_words = nrow * _RW
    align_words = row_words - (_RW - 1)
    group = (align_words * 32 - 31) // 37
    n_steps = -(-N // group)
    print(f"group={group} codes/step, {n_steps} steps")

    rng = np.random.default_rng(0)
    words_np = rng.integers(0, 1 << 32, (B, W), dtype=np.uint64).astype(np.uint32)
    words = jnp.asarray(words_np)

    def make_scan(variant: str):
        @jax.jit
        def scan(words, start):
            is_rice = jnp.ones((B,), bool)
            order = jnp.zeros((B,), jnp.int32)
            pbits = jnp.full((B,), 4, jnp.int32)
            escape = jnp.full((B,), 15, jnp.int32)
            psize_mask = jnp.full((B,), 63, jnp.int32)
            n_codes = jnp.full((B,), N, jnp.int32)
            m_rows = words.reshape(B * (W // _RW), _RW)
            lane_rows = jnp.arange(B, dtype=jnp.int32) * (W // _RW)
            iota_nrow = jnp.arange(nrow, dtype=jnp.int32)
            transposed = variant in ("T", "Tshrink")

            def _word_shl(arr, nwords):
                z = jnp.zeros((B, nwords), jnp.uint32)
                return jnp.concatenate([arr[:, nwords:], z], axis=1)

            def _arr_shl_bits(arr, n_bits):
                a1 = _word_shl(arr, 1)
                nw1 = (n_bits >= 32)[:, None]
                base = jnp.where(nw1, a1, arr)
                base_n = jnp.where(nw1, _word_shl(a1, 1), a1)
                nb = (n_bits & 31).astype(jnp.uint32)[:, None]
                return (base << nb) | (
                    (base_n >> jnp.uint32(1)) >> (jnp.uint32(31) - nb)
                )

            # transposed helpers: arr is (K, B), per-lane scalars broadcast
            # along axis 0 (words), which is the SUBLANE axis on TPU
            def _word_shl_t(arr, nwords):
                z = jnp.zeros((nwords, B), jnp.uint32)
                return jnp.concatenate([arr[nwords:], z], axis=0)

            def _arr_shl_bits_t(arr, n_bits):
                a1 = _word_shl_t(arr, 1)
                nw1 = (n_bits >= 32)[None, :]
                base = jnp.where(nw1, a1, arr)
                base_n = jnp.where(nw1, _word_shl_t(a1, 1), a1)
                nb = (n_bits & 31).astype(jnp.uint32)[None, :]
                return (base << nb) | (
                    (base_n >> jnp.uint32(1)) >> (jnp.uint32(31) - nb)
                )

            def rice_step(carry, j0):
                cpos, k, cerr = carry
                wi = cpos >> 5
                r0 = jnp.clip(wi // _RW, 0, W // _RW - nrow)
                if variant == "noga":
                    rows = jnp.broadcast_to(
                        words[:, None, :row_words].reshape(B, nrow, _RW),
                        (B, nrow, _RW),
                    )
                else:
                    rows = jnp.take(
                        m_rows,
                        (r0[:, None] + iota_nrow[None, :]) + lane_rows[:, None],
                        axis=0,
                    )
                wa = rows.reshape(B, row_words)
                woff = wi - r0 * _RW
                if transposed:
                    wa = wa.T  # (row_words, B)
                    s = _RW >> 1
                    while s:
                        wa = jnp.where(
                            ((woff & s) != 0)[None, :], _word_shl_t(wa, s), wa
                        )
                        s >>= 1
                    sh = (cpos & 31).astype(jnp.uint32)[None, :]
                    wa = (wa << sh) | (
                        (_word_shl_t(wa, 1) >> jnp.uint32(1))
                        >> (jnp.uint32(31) - sh)
                    )
                    wa = wa[: align_words + 1]
                else:
                    s = _RW >> 1
                    while s:
                        wa = jnp.where(
                            ((woff & s) != 0)[:, None], _word_shl(wa, s), wa
                        )
                        s >>= 1
                    sh = (cpos & 31).astype(jnp.uint32)[:, None]
                    wa = (wa << sh) | (
                        (_word_shl(wa, 1) >> jnp.uint32(1))
                        >> (jnp.uint32(31) - sh)
                    )
                    wa = wa[:, : align_words + 1]
                outs = []
                for g in range(group):
                    j = j0 + g
                    active = is_rice & (j < n_codes)
                    boundary = active & ((j == 0) | ((j & psize_mask) == 0))
                    pb = jnp.where(boundary, pbits, 0)
                    if transposed:
                        a, b, c = wa[0], wa[1], wa[2]
                    else:
                        a, b, c = wa[:, 0], wa[:, 1], wa[:, 2]
                    nbk = jnp.asarray(pbits, jnp.uint32)
                    k_new = (
                        (a >> jnp.uint32(1))
                        >> (jnp.uint32(31) - jnp.minimum(nbk, 31))
                    ).astype(jnp.int32)
                    cerr = cerr | (boundary & (k_new == escape))
                    k = jnp.where(boundary, jnp.minimum(k_new, 14), k)
                    pbu = pb.astype(jnp.uint32)
                    tp = jnp.uint32(31) - pbu
                    a, b = (
                        (a << pbu) | ((b >> jnp.uint32(1)) >> tp),
                        (b << pbu) | ((c >> jnp.uint32(1)) >> tp),
                    )
                    q = jnp.where(
                        a == 0,
                        32 + jax.lax.clz(b).astype(jnp.int32),
                        jax.lax.clz(a).astype(jnp.int32),
                    )
                    cerr = cerr | (active & (q + 1 + k > 32))
                    q = jnp.minimum(q, 31)
                    s2 = q + 1
                    lo = jnp.minimum(s2, 31).astype(jnp.uint32)
                    w1 = (a << lo) | ((b >> jnp.uint32(1)) >> (jnp.uint32(31) - lo))
                    ku = k.astype(jnp.uint32)
                    rem = (
                        (jnp.where(s2 <= 31, w1, b) >> jnp.uint32(1))
                        >> (jnp.uint32(31) - jnp.minimum(ku, 31))
                    )
                    rem = jnp.where(ku == 0, jnp.uint32(0), rem)
                    z = (q.astype(jnp.uint32) << ku) | rem
                    outs.append(jnp.where(active, z, jnp.uint32(0)))
                    n_bits = jnp.where(active, pb + q + 1 + k, 0)
                    cpos = cpos + n_bits
                    if g < group - 1:
                        if variant == "Tshrink":
                            keep = (37 * (group - 1 - g) + 31) // 32 + 1
                            keep = min(keep + 2, wa.shape[0])
                            wa = _arr_shl_bits_t(wa[:keep], n_bits)
                        elif transposed:
                            wa = _arr_shl_bits_t(wa, n_bits)
                        else:
                            wa = _arr_shl_bits(wa, n_bits)
                return (cpos, k, cerr), jnp.stack(outs)

            (cend, _, err), zs = jax.lax.scan(
                rice_step,
                (start, jnp.zeros(B, jnp.int32), jnp.zeros(B, bool)),
                jnp.arange(n_steps, dtype=jnp.int32) * group,
            )
            return zs.reshape(n_steps * group, B)[:N].T, cend

        return scan

    # ---- the REAL _parse_subframe on crafted fixed-order-2 streams ---------
    # (valid header + residual method/po; random code bits).  The delta vs
    # the pure-scan 'base' variant is the pre/post-scan cost inside the
    # shipped kernel (header/warmup/coeff per-lane bit reads, IIR restore,
    # residual place).
    from flac_raster_tpu.ops import device_decode as dd

    crafted = words_np.copy()
    crafted[:, 0] = (0x14 << 24) | (crafted[:, 0] & 0xFFFFFF)  # fixed, order 2
    # bits 8..13 of word 1: method=0 (2 bits), po=4 (4 bits)
    crafted[:, 1] = (crafted[:, 1] & ~np.uint32(0x3F << 18)) | np.uint32(0x4 << 18)
    crafted_d = jnp.asarray(crafted)
    eb = jnp.full((B,), 16, jnp.int32)
    zero_pos = jnp.zeros((B,), jnp.int32)
    zero_err = jnp.zeros((B,), bool)

    @jax.jit
    def full_parse(w):
        sig, end, err = dd._parse_subframe(
            w, zero_pos, eb, zero_err, N=N, row_gather=True, nrow=nrow
        )
        return sig

    sync(full_parse(crafted_d))
    dt = timeit(lambda: sync(full_parse(crafted_d)))
    codes = B * N
    print(f"full _parse_subframe     : {dt*1e3:8.1f} ms  {codes/dt/1e6:6.1f} M codes/s")

    start = jnp.zeros((B,), jnp.int32)
    ref = None
    for variant in ("base", "noga", "T", "Tshrink"):
        fn = make_scan(variant)
        out, cend = fn(words, start)
        if variant == "base":
            ref = out
        elif variant != "noga" and ref is not None:
            same = bool(np.asarray(jnp.array_equal(out, ref)))
            assert same, f"{variant} diverged from base"
        dt = timeit(lambda: sync(fn(words, start)[0]))
        print(
            f"{variant:8s}: {dt*1e3:8.1f} ms  {codes/dt/1e6:6.1f} M codes/s"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
