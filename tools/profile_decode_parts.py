"""Micro-profile the pieces of ops/device_decode on the real TPU.

Builds standalone jit programs from the kernel's building blocks (Rice
chain scan, IIR restore scan, residual placement, window reads) so each
cost is visible in isolation.  Synthetic inputs; not a correctness tool.

Usage: python tools/profile_decode_parts.py [B] [N]
"""

from __future__ import annotations

import functools
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}  B={B} N={N}")

    from flac_raster_tpu.utils.profiling import tame_device_client_threads

    tame_device_client_threads()

    import jax.numpy as jnp

    from flac_raster_tpu.ops import device_decode as dd

    rng = np.random.default_rng(0)
    W = 4096
    words = jnp.asarray(rng.integers(0, 1 << 32, (B, W), dtype=np.uint64).astype(np.uint32))
    M = dd.DEVICE_DECODE_MAX_ORDER
    U = 8  # per-code scan unroll (the pre-group design)

    # ---- Rice chain scan only ---------------------------------------------
    @jax.jit
    def rice_only(words, start):
        is_rice = jnp.ones((B,), bool)
        order = jnp.zeros((B,), jnp.int32)
        pbits = jnp.full((B,), 4, jnp.int32)
        escape = jnp.full((B,), 15, jnp.int32)
        psize_mask = jnp.full((B,), 255, jnp.int32)
        n_codes = jnp.full((B,), N, jnp.int32)

        def one_code(cpos, k, cerr, j):
            active = is_rice & (j < n_codes)
            boundary = active & ((j == 0) | (((order + j) & psize_mask) == 0))
            pb = jnp.where(boundary, pbits, 0)
            a, b, c = dd._read96(words, cpos)
            k_new = dd._take_bits(a, pbits).astype(jnp.int32)
            cerr = cerr | (boundary & (k_new == escape))
            k = jnp.where(boundary, jnp.minimum(k_new, 14), k)
            pbu = pb.astype(jnp.uint32)
            t = jnp.uint32(31) - pbu
            a, b = (
                (a << pbu) | ((b >> jnp.uint32(1)) >> t),
                (b << pbu) | ((c >> jnp.uint32(1)) >> t),
            )
            q = jnp.where(
                a == 0,
                32 + jax.lax.clz(b).astype(jnp.int32),
                jax.lax.clz(a).astype(jnp.int32),
            )
            q = jnp.minimum(q, 63)
            s2 = q + 1
            lo = jnp.clip(s2, 0, 31).astype(jnp.uint32)
            w1 = (a << lo) | ((b >> jnp.uint32(1)) >> (jnp.uint32(31) - lo))
            w2 = b << jnp.clip(s2 - 32, 0, 31).astype(jnp.uint32)
            rem = dd._take_bits(jnp.where(s2 <= 31, w1, w2), k)
            z = (q.astype(jnp.uint32) << k.astype(jnp.uint32)) | rem
            cpos = jnp.where(active, jnp.minimum(cpos + pb + q + 1 + k, W * 32 - 128), cpos)
            return cpos, k, cerr, jnp.where(active, z, jnp.uint32(0))

        n_steps = -(-N // U)

        def step(carry, j0):
            cpos, k, cerr = carry
            outs = []
            for u in range(U):
                cpos, k, cerr, z = one_code(cpos, k, cerr, j0 + u)
                outs.append(z)
            return (cpos, k, cerr), jnp.stack(outs)

        (cend, _, err), zs = jax.lax.scan(
            step,
            (start, jnp.zeros(B, jnp.int32), jnp.zeros(B, bool)),
            jnp.arange(n_steps, dtype=jnp.int32) * U,
        )
        return zs.reshape(n_steps * U, B)[:N].T, cend, err

    start = jnp.zeros((B,), jnp.int32)
    sync(rice_only(words, start)[0])
    dt = timeit(lambda: sync(rice_only(words, start)[0]))
    codes = B * N
    print(f"rice scan ({codes/1e6:.1f}M codes)  : {dt*1e3:8.1f} ms  "
          f"{codes/dt/1e6:6.1f} M codes/s")

    # ---- IIR restore scan only --------------------------------------------
    UI = dd._IIR_UNROLL

    @jax.jit
    def iir_only(res, warm, coefs, order, shift_eff):
        def iir_step(w, inputs):
            res_u, warm_u, i0 = inputs
            xs = []
            for u in range(UI):
                acc = jnp.sum(w * coefs, axis=1)
                x_i = jnp.where(i0 + u < order, warm_u[u], res_u[u] + (acc >> shift_eff))
                w = jnp.concatenate([x_i[:, None], w[:, :-1]], axis=1)
                xs.append(x_i)
            return w, jnp.stack(xs)

        n_pad = -(-N // UI)
        Np = n_pad * UI
        res_t = jnp.pad(res.T, ((0, Np - N), (0, 0))).reshape(n_pad, UI, B)
        warm_t = jnp.pad(warm.T, ((0, Np - M), (0, 0))).reshape(n_pad, UI, B)
        _, xs = jax.lax.scan(
            iir_step,
            jnp.zeros((B, M), jnp.int32),
            (res_t, warm_t, jnp.arange(n_pad, dtype=jnp.int32) * UI),
        )
        return xs.reshape(Np, B)[:N].T

    res = jnp.asarray(rng.integers(-100, 100, (B, N), dtype=np.int64).astype(np.int32))
    warm = jnp.asarray(rng.integers(-100, 100, (B, M), dtype=np.int64).astype(np.int32))
    coefs = jnp.asarray(rng.integers(-50, 50, (B, M), dtype=np.int64).astype(np.int32))
    order = jnp.full((B,), 8, jnp.int32)
    shift_eff = jnp.full((B,), 5, jnp.int32)
    sync(iir_only(res, warm, coefs, order, shift_eff))
    dt = timeit(lambda: sync(iir_only(res, warm, coefs, order, shift_eff)))
    print(f"iir scan ({B*N/1e6:.1f}M samples): {dt*1e3:8.1f} ms  "
          f"{B*N/dt/1e6:6.1f} M samples/s")

    # ---- residual placement (take_along_axis shift + unzigzag) -------------
    @jax.jit
    def place_only(zs, order):
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
        src = jnp.clip(iota_n - order[:, None], 0, N - 1)
        zres = jnp.take_along_axis(zs, src, axis=1)
        res = ((zres >> jnp.uint32(1)).astype(jnp.int32)) ^ -(
            (zres & jnp.uint32(1)).astype(jnp.int32)
        )
        return jnp.where(iota_n >= order[:, None], res, 0)

    zs = jnp.asarray(rng.integers(0, 1000, (B, N), dtype=np.int64).astype(np.uint32))
    sync(place_only(zs, order))
    dt = timeit(lambda: sync(place_only(zs, order)))
    print(f"residual place            : {dt*1e3:8.1f} ms")

    # ---- (B, N) bit-gather (the verbatim/warmup read pattern) --------------
    @jax.jit
    def read2d_only(words, pos0):
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
        vpos = pos0[:, None] + iota_n * 17
        return dd._read32_2d(words, vpos)

    sync(read2d_only(words, start))
    dt = timeit(lambda: sync(read2d_only(words, start)))
    print(f"(B,N) bit-gather          : {dt*1e3:8.1f} ms")

    # ---- PROTOTYPE: grouped rice scan (G codes per (B,TW)-word take) -------
    def make_grouped_rice(TW, G, max_code_bits):
        def grouped(words, start):
            is_rice = jnp.ones((B,), bool)
            order = jnp.zeros((B,), jnp.int32)
            pbits = jnp.full((B,), 4, jnp.int32)
            psize_mask = jnp.full((B,), 255, jnp.int32)
            n_codes = jnp.full((B,), N, jnp.int32)
            Wn = words.shape[1]
            iota_tw = jnp.arange(TW, dtype=jnp.int32)

            def step(carry, j0):
                cpos, k, cerr = carry
                wi = jnp.clip(cpos >> 5, 0, Wn - TW)
                win = jnp.take_along_axis(
                    words, wi[:, None] + iota_tw[None, :], axis=1
                )  # (B, TW)
                w = [win[:, t] for t in range(TW)]
                # pre-align: shift whole window left by cpos & 31
                sh = (cpos & 31).astype(jnp.uint32)
                t31 = jnp.uint32(31) - sh
                w = [
                    (w[t] << sh) | ((w[t + 1] >> jnp.uint32(1)) >> t31)
                    for t in range(TW - 1)
                ]
                outs = []
                for g in range(G):
                    j = j0 + g
                    active = is_rice & (j < n_codes)
                    boundary = active & (
                        (j == 0) | (((order + j) & psize_mask) == 0)
                    )
                    pb = jnp.where(boundary, pbits, 0)
                    k_new = dd._take_bits(w[0], pbits).astype(jnp.int32)
                    k = jnp.where(boundary, jnp.minimum(k_new, 14), k)
                    # consume pb
                    pbu = pb.astype(jnp.uint32)
                    tp = jnp.uint32(31) - pbu
                    a = (w[0] << pbu) | ((w[1] >> jnp.uint32(1)) >> tp)
                    b = (w[1] << pbu) | ((w[2] >> jnp.uint32(1)) >> tp)
                    q = jnp.where(
                        a == 0,
                        32 + jax.lax.clz(b).astype(jnp.int32),
                        jax.lax.clz(a).astype(jnp.int32),
                    )
                    q = jnp.minimum(q, max_code_bits - 1)
                    s2 = q + 1
                    lo = jnp.clip(s2, 0, 31).astype(jnp.uint32)
                    w1 = (a << lo) | ((b >> jnp.uint32(1)) >> (jnp.uint32(31) - lo))
                    w2 = b << jnp.clip(s2 - 32, 0, 31).astype(jnp.uint32)
                    rem = dd._take_bits(jnp.where(s2 <= 31, w1, w2), k)
                    z = (q.astype(jnp.uint32) << k.astype(jnp.uint32)) | rem
                    outs.append(jnp.where(active, z, jnp.uint32(0)))
                    n = jnp.where(active, pb + q + 1 + k, 0)
                    cpos = cpos + n
    # noqa: E501 (prototype)
                    if g < G - 1:
                        # shift window left by n (n <= 5 + max_code_bits);
                        # constant length, zero-fill past the end (timing
                        # prototype -- the real kernel sizes TW exactly)
                        nw = (n >> 5).astype(jnp.int32)  # 0..2
                        nb = (n & 31).astype(jnp.uint32)
                        tb = jnp.uint32(31) - nb
                        L = len(w)
                        zero = jnp.zeros_like(w[0])

                        def gw(i):
                            return w[i] if i < L else zero

                        w = [
                            (
                                jnp.where(
                                    nw == 0, gw(t),
                                    jnp.where(nw == 1, gw(t + 1), gw(t + 2)),
                                ) << nb
                            )
                            | (
                                (
                                    jnp.where(
                                        nw == 0, gw(t + 1),
                                        jnp.where(nw == 1, gw(t + 2), gw(t + 3)),
                                    ) >> jnp.uint32(1)
                                ) >> tb
                            )
                            for t in range(L)
                        ]
                return (cpos, k, cerr), jnp.stack(outs)

            n_steps = -(-N // G)
            (cend, _, err), zs = jax.lax.scan(
                step,
                (start, jnp.zeros(B, jnp.int32), jnp.zeros(B, bool)),
                jnp.arange(n_steps, dtype=jnp.int32) * G,
            )
            return zs.reshape(n_steps * G, B)[:N].T, cend, err

        return jax.jit(grouped)

    for TW, G, mcb in [(13, 5, 64), (13, 9, 32), (16, 6, 64), (24, 10, 64)]:
        fn = make_grouped_rice(TW, G, mcb)
        sync(fn(words, start)[0])
        dt = timeit(lambda: sync(fn(words, start)[0]))
        print(f"grouped rice TW={TW:2d} G={G:2d} cb={mcb}: {dt*1e3:8.1f} ms  "
              f"{codes/dt/1e6:6.1f} M codes/s")

    # ---- PROTOTYPE: register-list IIR (no concat) --------------------------
    @jax.jit
    def iir_regs(res, warm, coefs, order, shift_eff):
        cs = [coefs[:, m] for m in range(M)]
        ws = [warm[:, m] for m in range(M)]

        def iir_step(carry, inputs):
            w = list(carry)
            res_u, warm_u, i0 = inputs
            xs = []
            for u in range(UI):
                acc = w[0] * cs[0]
                for m in range(1, M):
                    acc = acc + w[m] * cs[m]
                x_i = jnp.where(
                    i0 + u < order, warm_u[u], res_u[u] + (acc >> shift_eff)
                )
                w = [x_i] + w[:-1]
                xs.append(x_i)
            return tuple(w), jnp.stack(xs)

        n_pad = -(-N // UI)
        Np = n_pad * UI
        res_t = jnp.pad(res.T, ((0, Np - N), (0, 0))).reshape(n_pad, UI, B)
        warm_t = jnp.pad(warm.T, ((0, Np - M), (0, 0))).reshape(n_pad, UI, B)
        _, xs = jax.lax.scan(
            iir_step,
            tuple(jnp.zeros((B,), jnp.int32) for _ in range(M)),
            (res_t, warm_t, jnp.arange(n_pad, dtype=jnp.int32) * UI),
        )
        return xs.reshape(Np, B)[:N].T

    sync(iir_regs(res, warm, coefs, order, shift_eff))
    dt = timeit(lambda: sync(iir_regs(res, warm, coefs, order, shift_eff)))
    print(f"iir regs ({B*N/1e6:.1f}M samples): {dt*1e3:8.1f} ms  "
          f"{B*N/dt/1e6:6.1f} M samples/s")

    # ---- PROTOTYPE: residual place via 13-way static-shift select ----------
    @jax.jit
    def place_select(zs, order):
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
        out = jnp.zeros_like(zs)
        for o in range(M + 1):
            shifted = jnp.pad(zs, ((0, 0), (o, 0)))[:, :N] if o else zs
            out = jnp.where(order[:, None] == o, shifted, out)
        res = ((out >> jnp.uint32(1)).astype(jnp.int32)) ^ -(
            (out & jnp.uint32(1)).astype(jnp.int32)
        )
        return jnp.where(iota_n >= order[:, None], res, 0)

    sync(place_select(zs, order))
    dt = timeit(lambda: sync(place_select(zs, order)))
    print(f"residual place (select)   : {dt*1e3:8.1f} ms")

    # ---- scan-step overhead floor (empty-body scan, same step count) -------
    @jax.jit
    def empty_scan(x):
        def step(carry, _):
            return carry + 1, carry[:1]

        c, ys = jax.lax.scan(step, x, None, length=-(-N // U))
        return c

    sync(empty_scan(start))
    dt = timeit(lambda: sync(empty_scan(start)))
    print(f"empty {-(-N // U)}-step scan     : {dt*1e3:8.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
