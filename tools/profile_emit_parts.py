"""Dispatch-amortized micro-profile of the EMIT half on the TPU.

Same methodology as tools/profile_plan_parts.py: every stage runs R times
inside one jitted lax.scan over R perturbed copies of the plan fields (the
25 ms relay dispatch floor otherwise swamps the per-stage cost).  The plan
inputs are stacked and scanned-over so XLA cannot hoist any stage work out
of the loop as loop-invariant.

Stages replay the exact dataflow of ops/device_emit.plan_and_emit's emit
half (single-channel, no mid-side -- the bench configuration).

Usage: python tools/profile_emit_parts.py [F] [R]
"""

from __future__ import annotations

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
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}  F={F} R={R}")

    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()

    import jax.numpy as jnp

    from bench import make_raster
    from flac_raster_tpu.codec.encoder import EncoderConfig
    from flac_raster_tpu.ops.device_codec import (
        KIND_FIXED,
        KIND_LPC,
        KIND_VERBATIM,
        plan_blocks,
    )
    from flac_raster_tpu.ops.device_emit import (
        _exclusive_cumsum_last,
        _scatter_tokens,
        plan_and_emit,
        worst_case_words,
    )
    from flac_raster_tpu.ops.pallas_pack import pack_tokens

    N, C, bps = 4096, 1, 16
    cfg = EncoderConfig.from_level(5)
    mpo = min(cfg.max_partition_order, 6)
    log2n = N.bit_length() - 1
    n_words = worst_case_words(F, C, N, bps)
    raw_mb = F * N * 2 / 1e6

    size = int(np.ceil(np.sqrt(F * N)))
    data = make_raster(size).reshape(-1)[: F * N]
    x = jnp.asarray((data.astype(np.int32) - 32768).reshape(F, N))

    plan = jax.jit(lambda xx: plan_blocks(
        xx, blocksize=N, bps=bps, max_lpc_order=cfg.max_lpc_order,
        max_partition_order=mpo, use_lpc=cfg.use_lpc,
        apodizations=cfg.apodizations,
    ))(x)
    sync(plan["subframe_bits"])

    # R perturbed copies of every field a stage touches.  Perturbations keep
    # each field in its valid domain (ks/po/kind untouched; residual +/- 1
    # keeps |r| small so q stays bench-like).
    r_iota = jnp.arange(R, dtype=jnp.int32)

    def stack(v, perturb):
        s = jnp.broadcast_to(v[None], (R,) + v.shape)
        if perturb:
            s = s + r_iota.reshape((R,) + (1,) * v.ndim) % 2
        return jax.jit(lambda a: a + 0)(s)

    xs = {
        "residual": stack(plan["residual"].reshape(F, C, N), True),
        "x": stack(x.reshape(F, C, N), True),
        "ks": stack(plan["ks"].reshape(F, C, 64), False),
        "po": stack(plan["po"].reshape(F, C), False),
        "order": stack(plan["order"].reshape(F, C), False),
        "kind": stack(plan["kind"].reshape(F, C), False),
        "sf_bits": stack(plan["subframe_bits"].reshape(F, C), False),
    }
    for v in xs.values():
        sync(v)

    def scan_time(name, body_scalar):
        @jax.jit
        def run(stacked):
            def step(carry, it):
                return carry + body_scalar(it).astype(jnp.float32), None

            c, _ = jax.lax.scan(step, jnp.float32(0), stacked)
            return c

        sync(run(xs))
        dt = timeit(lambda: sync(run(xs)))
        return name, dt

    rows = []

    def add(name, body):
        try:
            rows.append(scan_time(name, body))
        except Exception as e:  # noqa: BLE001
            print(f"{name:<26} FAILED: {type(e).__name__}: {str(e)[:110]}")

    add("baseline (read+sum)", lambda it: jnp.sum(it["residual"]))

    def kfields(it):
        """The shipped micro-partition gather + broadcast."""
        po = it["po"]
        M = 1 << mpo
        sub = N >> mpo
        mi = jax.lax.broadcasted_iota(jnp.int32, (F, C, M), 2)
        partM = mi >> jnp.maximum(mpo - po, 0)[:, :, None]
        kM = jnp.take_along_axis(it["ks"][:, :, :M], partM, axis=2)
        part = jnp.broadcast_to(
            partM[:, :, :, None], (F, C, M, sub)).reshape(F, C, N)
        k = jnp.broadcast_to(
            kM[:, :, :, None], (F, C, M, sub)).reshape(F, C, N)
        return part, k

    add("k gather+broadcast", lambda it: sum(jnp.sum(v) for v in kfields(it)))

    def tokmath(it):
        part, k = kfields(it)
        residual, kind, order = it["residual"], it["kind"], it["order"]
        i = jax.lax.broadcasted_iota(jnp.int32, (F, C, N), 2)
        ku = k.astype(jnp.uint32)
        z = ((residual.astype(jnp.uint32) << 1)
             ^ (residual >> 31).astype(jnp.uint32))
        q = (z >> ku).astype(jnp.int32)
        is_rice = (kind == KIND_FIXED) | (kind == KIND_LPC)
        rice_tok = is_rice[:, :, None] & (i >= order[:, :, None])
        L = jnp.where(rice_tok, q + 1 + k, 0)
        rem = z & ((jnp.uint32(1) << ku) - jnp.uint32(1))
        tok_v = jnp.where(rice_tok, (jnp.uint32(1) << ku) | rem, jnp.uint32(0))
        tok_l = L
        return rice_tok, part, k, q, tok_v, tok_l, L

    add("+ token math", lambda it: (
        lambda t: jnp.sum(t[4].astype(jnp.int32)) + jnp.sum(t[5]))(tokmath(it)))

    add("+ E cumsum (MXU)", lambda it: (
        lambda t: jnp.sum(_exclusive_cumsum_last(t[6])))(tokmath(it)))

    def full_tok(it):
        rice_tok, part, k, q, tok_v, tok_l, L = tokmath(it)
        E = _exclusive_cumsum_last(L)
        # Synthetic frame spacing must stay UNDER the worst-case bit budget
        # n_words*32/F (~16.5 bits/token at bps 16): an earlier 20-bit/token
        # spacing pushed the last fifth of the stream past n_words, so the
        # pack kernel's window DMAs ran out of bounds and the stage read 4x
        # slower than the in-graph truth (r5 attribution confusion).
        base = E + jnp.where(rice_tok, 5 * (part + 1), 0) + 12 * (
            jax.lax.broadcasted_iota(jnp.int32, (F, 1, 1), 0) * N
        )
        tok_o = jnp.where(rice_tok, base + q, base)
        return tok_v, tok_l, tok_o

    add("+ tok fields (pre-pack)", lambda it: (
        lambda t: jnp.sum(t[0].astype(jnp.int32)) + jnp.sum(t[2]))(full_tok(it)))

    add("+ pack_tokens", lambda it: (
        lambda t: jnp.sum(pack_tokens(
            t[0], t[1], t[2], n_words=n_words, slots_per_group=N)))(
        full_tok(it)))

    def header(it):
        """Realistic merged header stream: same slot counts/shapes as
        plan_and_emit (F-level 9 slots; per-subframe 8+12+12+64 = 97ish)."""
        sf_bits = it["sf_bits"]
        order, kind, po, ks = it["order"], it["kind"], it["po"], it["ks"]
        frame_start = (jnp.cumsum(sf_bits.sum(axis=1))
                       - sf_bits.sum(axis=1)) + 48 * jnp.arange(F)
        sf_start = frame_start[:, None] + 40
        j8 = jax.lax.broadcasted_iota(jnp.int32, (F, C, 12), 2)
        wu = jnp.minimum(j8, jnp.maximum(order - 1, 0)[:, :, None])
        p64 = jax.lax.broadcasted_iota(jnp.int32, (F, C, 64), 2)
        pc = jnp.minimum(p64, (jnp.int32(1) << po)[:, :, None] - 1)
        vs = [
            jnp.broadcast_to(jnp.uint32(0xAB), (F, C, 1)),
            (wu + 1).astype(jnp.uint32),
            (wu + 2).astype(jnp.uint32),
            ks.astype(jnp.uint32),
        ]
        ls = [
            jnp.full((F, C, 1), 8, jnp.int32),
            jnp.where(j8 < order[:, :, None], 16, 0),
            jnp.where(j8 < order[:, :, None], 15, 0),
            jnp.where(p64 <= pc, 5, 0),
        ]
        os_ = [
            sf_start[:, :, None],
            sf_start[:, :, None] + 8 + j8 * 16,
            sf_start[:, :, None] + 8 + 200 + j8 * 15,
            sf_start[:, :, None] + 8 + 400 + pc * 37,
        ]
        mv = jnp.concatenate(vs, axis=2).reshape(F, -1)
        ml = jnp.concatenate(ls, axis=2).reshape(F, -1)
        mo = jnp.concatenate(os_, axis=2).reshape(F, -1)
        words = jnp.zeros(n_words, jnp.uint32)
        return _scatter_tokens(words, mv, ml, mo)

    add("header merged scatter", lambda it: jnp.sum(
        jax.lax.bitcast_convert_type(header(it), jnp.int32)))

    def fused(it):
        out = plan_and_emit(
            it["x"], jnp.int32(0), blocksize=N, bps=bps, sr_code=9,
            bps_code=4, bs_code=12, max_lpc_order=cfg.max_lpc_order,
            max_partition_order=mpo, use_lpc=cfg.use_lpc,
            n_words=n_words, apodizations=cfg.apodizations,
        )
        return out["total_bits"]

    # summing only total_bits lets XLA dead-code the whole word buffer
    # (header scatter, final add) -- keep the DCE'd row for comparison but
    # report the honest one too
    add("plan_and_emit (dce)", fused)

    def fused_words(it):
        out = plan_and_emit(
            it["x"], jnp.int32(0), blocksize=N, bps=bps, sr_code=9,
            bps_code=4, bs_code=12, max_lpc_order=cfg.max_lpc_order,
            max_partition_order=mpo, use_lpc=cfg.use_lpc,
            n_words=n_words, apodizations=cfg.apodizations,
        )
        return out["total_bits"] + jnp.sum(
            jax.lax.bitcast_convert_type(out["words"], jnp.int32)
        )

    add("plan_and_emit (full)", fused_words)

    t_base = rows[0][1]
    print(f"{'stage':<26}{'total ms':>10}{'per-iter ms':>13}{'MB/s raw':>10}")
    for name, dt in rows:
        per = (dt - t_base) / R * 1e3
        rate = raw_mb / max(per / 1e3, 1e-9)
        if name.startswith("baseline"):
            print(f"{name:<26}{dt*1e3:>10.1f}{'':>13}{'':>10}")
        else:
            print(f"{name:<26}{dt*1e3:>10.1f}{per:>13.2f}{rate:>10.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
