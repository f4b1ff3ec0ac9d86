"""Stage-resolved timing of the EMIT half of plan_and_emit on the real TPU.

Replays the exact dataflow of ops/device_emit.plan_and_emit (single-channel,
no mid-side -- the bench configuration) piece by piece on a real plan, so
the ~(fused - plan - pack) gap can be attributed to specific ops.

Usage: python tools/profile_emit.py [chunk_frames]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(x):
    return np.asarray(x.ravel()[0:1])


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    N, C, bps = 4096, 1, 16
    from bench import make_raster
    from flac_raster_tpu.codec.encoder import EncoderConfig
    from flac_raster_tpu.ops.device_codec import plan_blocks
    from flac_raster_tpu.ops.device_emit import (
        _exclusive_cumsum_last,
        _scatter_tokens,
        worst_case_words,
    )
    from flac_raster_tpu.ops.pallas_pack import pack_tokens
    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()
    print(f"backend: {jax.default_backend()}  F={F}", flush=True)
    cfg = EncoderConfig.from_level(5)

    size = int(np.ceil(np.sqrt(F * N)))
    data = make_raster(size).reshape(-1)[: F * N]
    x = jnp.asarray((data.astype(np.int32) - 32768).reshape(F, N))

    plan = jax.jit(lambda xx: plan_blocks(
        xx, blocksize=N, bps=bps, max_lpc_order=cfg.max_lpc_order,
        max_partition_order=min(cfg.max_partition_order, 6),
        use_lpc=cfg.use_lpc, apodizations=cfg.apodizations,
    ))(x)
    plan = {k: jax.device_put(v) for k, v in plan.items()}
    sync(plan["subframe_bits"])
    raw_mb = F * N * 2 / 1e6
    log2n = N.bit_length() - 1
    n_words = worst_case_words(F, C, N, bps)

    ks = plan["ks"].reshape(F, 1, 64)
    po = plan["po"].reshape(F, 1)
    order = plan["order"].reshape(F, 1)
    kind = plan["kind"].reshape(F, 1)
    residual = plan["residual"].reshape(F, 1, N)
    xc = x.reshape(F, 1, N)

    from flac_raster_tpu.ops.device_codec import KIND_FIXED, KIND_LPC, KIND_VERBATIM

    # --- stage: k broadcast (take_along_axis of ks by partition) ----------
    @jax.jit
    def stage_k(ks, po):
        i = jax.lax.broadcasted_iota(jnp.int32, (F, C, N), 2)
        part = i >> (log2n - po)[:, :, None]
        k = jnp.take_along_axis(ks, part, axis=2)
        return k.sum()

    print(f"  k gather (take_along) : {timeit(lambda: stage_k(ks, po))*1e3:8.1f} ms", flush=True)

    # --- stage: zigzag + q/rem token math ---------------------------------
    @jax.jit
    def stage_tok(ks, po, order, kind, residual, xc):
        i = jax.lax.broadcasted_iota(jnp.int32, (F, C, N), 2)
        part = i >> (log2n - po)[:, :, None]
        k = jnp.take_along_axis(ks, part, axis=2)
        ku = k.astype(jnp.uint32)
        z = (residual.astype(jnp.uint32) << 1) ^ (residual >> 31).astype(jnp.uint32)
        q = (z >> ku).astype(jnp.int32)
        is_rice = (kind == KIND_FIXED) | (kind == KIND_LPC)
        rice_tok = is_rice[:, :, None] & (i >= order[:, :, None])
        L = jnp.where(rice_tok, q + 1 + k, 0)
        rem = z & ((jnp.uint32(1) << ku) - jnp.uint32(1))
        tok_v = jnp.where(rice_tok, (jnp.uint32(1) << ku) | rem, 0)
        return tok_v.astype(jnp.uint32).sum() + L.sum()

    print(f"  + token math          : {timeit(lambda: stage_tok(ks, po, order, kind, residual, xc))*1e3:8.1f} ms", flush=True)

    # --- stage: exclusive cumsum (MXU) ------------------------------------
    L_host = None

    @jax.jit
    def stage_L(ks, po, order, kind, residual):
        i = jax.lax.broadcasted_iota(jnp.int32, (F, C, N), 2)
        part = i >> (log2n - po)[:, :, None]
        k = jnp.take_along_axis(ks, part, axis=2)
        ku = k.astype(jnp.uint32)
        z = (residual.astype(jnp.uint32) << 1) ^ (residual >> 31).astype(jnp.uint32)
        q = (z >> ku).astype(jnp.int32)
        is_rice = (kind == KIND_FIXED) | (kind == KIND_LPC)
        rice_tok = is_rice[:, :, None] & (i >= order[:, :, None])
        return jnp.where(rice_tok, q + 1 + k, 0)

    Ldev = stage_L(ks, po, order, kind, residual)
    sync(Ldev)

    @jax.jit
    def stage_E(L):
        return _exclusive_cumsum_last(L).sum()

    print(f"  E cumsum (MXU) alone  : {timeit(lambda: stage_E(Ldev))*1e3:8.1f} ms", flush=True)

    @jax.jit
    def stage_E_xla(L):
        return (jnp.cumsum(L, axis=-1) - L).sum()

    print(f"  E cumsum (XLA scan)   : {timeit(lambda: stage_E_xla(Ldev))*1e3:8.1f} ms", flush=True)

    # --- stage: pack kernel alone (known ~30ms) ---------------------------
    @jax.jit
    def stage_pack(ks, po, order, kind, residual, xc):
        i = jax.lax.broadcasted_iota(jnp.int32, (F, C, N), 2)
        part = i >> (log2n - po)[:, :, None]
        k = jnp.take_along_axis(ks, part, axis=2)
        ku = k.astype(jnp.uint32)
        z = (residual.astype(jnp.uint32) << 1) ^ (residual >> 31).astype(jnp.uint32)
        q = (z >> ku).astype(jnp.int32)
        is_rice = (kind == KIND_FIXED) | (kind == KIND_LPC)
        rice_tok = is_rice[:, :, None] & (i >= order[:, :, None])
        L = jnp.where(rice_tok, q + 1 + k, 0)
        E = _exclusive_cumsum_last(L)
        rem = z & ((jnp.uint32(1) << ku) - jnp.uint32(1))
        tok_v = jnp.where(rice_tok, (jnp.uint32(1) << ku) | rem, jnp.uint32(0))
        tok_l = jnp.where(rice_tok, 1 + k, 0)
        base = E + 40 * jax.lax.broadcasted_iota(jnp.int32, (F, 1, 1), 0)
        tok_o = jnp.where(rice_tok, base + q, base)
        return pack_tokens(tok_v, tok_l, tok_o, n_words=n_words, slots_per_group=N)

    print(f"  token math+E+pack     : {timeit(lambda: stage_pack(ks, po, order, kind, residual, xc))*1e3:8.1f} ms", flush=True)

    # --- stage: header scatters on realistic shapes -----------------------
    @jax.jit
    def stage_hdr(sf_bits):
        words = jnp.zeros(n_words, jnp.uint32)
        fs = jnp.cumsum(sf_bits.sum(axis=1)) * 0 + 64 * jax.lax.iota(jnp.int32, F)
        for rep in range(10):
            words = _scatter_tokens(
                words, jnp.full((F,), 0xAB, jnp.uint32),
                jnp.full((F,), 8, jnp.int32), fs + rep * 8)
        return words

    print(f"  10x (F,) scatters     : {timeit(lambda: stage_hdr(plan['subframe_bits'].reshape(F, 1)))*1e3:8.1f} ms", flush=True)
    print(f"  raw {raw_mb:.1f} MB; fused plan_and_emit reference: see profile_encode", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
