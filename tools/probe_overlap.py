"""Probe the axon relay's transfer semantics: is jax.device_put blocking?
Does copy_to_host_async overlap with dispatch/compute?  Can an upload and a
readback proceed concurrently over the tunnel?

Run on the real TPU only (no args).  Prints one line per probe.
"""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/frtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flac_raster_tpu.utils.profiling import tame_device_client_threads

tame_device_client_threads()

MB = 1 << 20
N = 32 * MB // 2  # 32 MB of uint16


def sync1(x) -> None:
    np.asarray(jax.device_get(x.ravel()[:1]))


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    host = np.random.default_rng(0).integers(0, 1 << 15, N, dtype=np.uint16)

    # warm a trivial jit so dispatch paths are hot
    f = jax.jit(lambda x: x * 2 + 1)
    d0 = jax.device_put(host[: 1 * MB])
    sync1(f(d0))

    # --- probe 1: device_put blocking? -------------------------------
    t0 = time.perf_counter()
    d = jax.device_put(host)
    t_put = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync1(d * 1)  # force materialization on device
    t_sync = time.perf_counter() - t0
    print(f"device_put(32MB) returned in {t_put*1e3:8.1f} ms; "
          f"use-sync took {t_sync*1e3:8.1f} ms "
          f"({'ASYNC' if t_put < t_sync else 'BLOCKING'})", flush=True)

    # --- probe 2: copy_to_host_async overlap -------------------------
    dev = jax.device_put(host)
    sync1(dev * 1)
    t0 = time.perf_counter()
    try:
        dev.copy_to_host_async()
        t_kick = time.perf_counter() - t0
        time.sleep(0.0)
        t0 = time.perf_counter()
        out = np.asarray(dev)
        t_wait = time.perf_counter() - t0
        print(f"copy_to_host_async kicked in {t_kick*1e3:8.1f} ms; "
              f"asarray after took {t_wait*1e3:8.1f} ms", flush=True)
    except Exception as exc:  # noqa: BLE001
        print("copy_to_host_async unsupported:", exc, flush=True)

    # does the async copy make progress while the host thread sleeps?
    dev2 = jax.device_put(host)
    sync1(dev2 * 1)
    t_all0 = time.perf_counter()
    try:
        dev2.copy_to_host_async()
    except Exception:  # noqa: BLE001
        pass
    time.sleep(1.0)  # if truly async, transfer finishes during the sleep
    t0 = time.perf_counter()
    np.asarray(dev2)
    t_after_sleep = time.perf_counter() - t0
    print(f"asarray after 1s sleep: {t_after_sleep*1e3:8.1f} ms "
          f"(vs {t_wait*1e3:.1f} ms cold) -> "
          f"{'PROGRESSES IN BACKGROUND' if t_after_sleep < 0.5 * t_wait else 'NO BACKGROUND PROGRESS'}",
          flush=True)

    # --- probe 3: upload while a readback is in flight ----------------
    devA = jax.device_put(host)
    sync1(devA * 1)
    res: dict = {}

    def reader() -> None:
        t0 = time.perf_counter()
        np.asarray(devA)
        res["read_s"] = time.perf_counter() - t0

    def writer() -> None:
        t0 = time.perf_counter()
        dB = jax.device_put(host)
        sync1(dB * 1)
        res["write_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    th1 = threading.Thread(target=reader)
    th2 = threading.Thread(target=writer)
    th1.start(); th2.start(); th1.join(); th2.join()
    t_both = time.perf_counter() - t0
    print(f"concurrent 32MB read + 32MB write: wall {t_both:6.2f}s "
          f"(read {res['read_s']:.2f}s, write {res['write_s']:.2f}s) -> "
          f"{'FULL-DUPLEX' if t_both < 0.75 * (res['read_s'] + res['write_s']) else 'SERIALIZED'}",
          flush=True)

    # --- probe 4: does device compute overlap a big readback? ---------
    big = jax.jit(lambda x: (x.astype(jnp.float32) @ jnp.ones((4096, 4096), jnp.float32)).sum())
    m = jax.device_put(np.ones((4096, 4096), np.float32))
    sync1(big(m[:, :]))  # warm
    t0 = time.perf_counter(); sync1(big(m)); t_mm = time.perf_counter() - t0
    devC = jax.device_put(host); sync1(devC * 1)
    t0 = time.perf_counter()
    r = big(m)  # dispatched async
    np.asarray(devC)  # big readback on main thread
    sync1(r)
    t_both2 = time.perf_counter() - t0
    print(f"compute({t_mm*1e3:.0f}ms) + 32MB readback({res['read_s']:.2f}s): "
          f"wall {t_both2:6.2f}s -> "
          f"{'OVERLAPS' if t_both2 < 0.75 * (t_mm + res['read_s']) else 'SERIALIZED'}",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
