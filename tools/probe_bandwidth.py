"""Clean tunnel bandwidth measurement: upload, download, and concurrent.

Fresh buffers per iteration (no transfer caching), warm compiled slice ops,
1-element pulls as the force/sync.  Run on the real TPU.
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
SZ = int(os.environ.get("PROBE_MB", 32)) * MB


def fresh(i: int) -> np.ndarray:
    a = np.empty(SZ, np.uint8)
    a[:8] = i  # defeat any content caching cheaply
    return a


@jax.jit
def _touch(x):
    return x[:1] + jnp.uint8(0)


def force_up(x_dev) -> None:
    np.asarray(_touch(x_dev))


def main() -> None:
    print("backend:", jax.devices()[0].platform, "size", SZ // MB, "MB", flush=True)
    # warm
    d = jax.device_put(fresh(0)); force_up(d)

    # upload (device_put + force), 3 reps
    for rep in range(3):
        h = fresh(rep + 1)
        t0 = time.perf_counter()
        d = jax.device_put(h)
        force_up(d)
        dt = time.perf_counter() - t0
        print(f"upload   rep{rep}: {dt:6.2f}s  {SZ/MB/dt:7.1f} MB/s", flush=True)

    # download: np.asarray of a device buffer (fresh buffer each time)
    devs = []
    for rep in range(3):
        dd = jax.device_put(fresh(10 + rep)); force_up(dd)
        devs.append(dd)
    for rep, dd in enumerate(devs):
        t0 = time.perf_counter()
        np.asarray(dd)
        dt = time.perf_counter() - t0
        print(f"download rep{rep}: {dt:6.2f}s  {SZ/MB/dt:7.1f} MB/s", flush=True)

    # concurrent: one uploader thread + one downloader thread
    dd = jax.device_put(fresh(20)); force_up(dd)
    h = fresh(21)
    res = {}

    def up() -> None:
        t0 = time.perf_counter()
        x = jax.device_put(h); force_up(x)
        res["up"] = time.perf_counter() - t0

    def down() -> None:
        t0 = time.perf_counter()
        np.asarray(dd)
        res["down"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    a, b = threading.Thread(target=up), threading.Thread(target=down)
    a.start(); b.start(); a.join(); b.join()
    wall = time.perf_counter() - t0
    print(f"concurrent: wall {wall:6.2f}s (up {res['up']:.2f}s, down {res['down']:.2f}s) "
          f"aggregate {2*SZ/MB/wall:7.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
