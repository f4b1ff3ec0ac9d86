"""Worker process for the multi-host test (launched by test_multihost.py).

Simulates one host of a jax.distributed job on localhost (Gloo backend,
CPU devices) per SURVEY.md §4's no-hardware strategy.
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    prefix = sys.argv[4]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from flac_raster_tpu.parallel.multihost import (
        encode_tiles_multihost,
        init_multihost,
        write_sharded_streaming_container,
    )

    got_pid, got_n = init_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert (got_pid, got_n) == (pid, nproc), (got_pid, got_n)

    # deterministic workload shared by every process and by the test parent
    rng = np.random.default_rng(7)
    T, n, C = 5, 256 * 2 + 37, 1
    tiles = np.cumsum(rng.integers(-9, 10, (T, n, C)), axis=1).astype(np.int32)

    blobs, sizes, offsets, sl = encode_tiles_multihost(
        tiles, 44100, 16, compression_level=5, blocksize=256
    )
    frames_meta = [
        {
            "frame_id": i,
            "bbox": [0.0, 0.0, 1.0, 1.0],
            "window": {"col_off": 0, "row_off": 0, "width": n, "height": 1},
        }
        for i in range(T)
    ]
    write_sharded_streaming_container(
        prefix, {"width": n, "height": 1, "bands": C},
        frames_meta, blobs, sizes, offsets, sl,
    )

    # ---- decode mirror: assemble once, every host decodes ITS slice with
    # its local mesh and verifies values against the shared workload --------
    from jax.experimental import multihost_utils

    from flac_raster_tpu.parallel.multihost import (
        assemble_sharded_container,
        decode_container_tiles_multihost,
    )

    multihost_utils.sync_global_devices("parts-written")
    assembled = f"{prefix}.assembled.flac"
    if pid == 0:
        assemble_sharded_container(prefix, nproc, assembled)
    multihost_utils.sync_global_devices("assembled")
    decs, dsl = decode_container_tiles_multihost(assembled, verify_crc=True)
    assert (dsl.start, dsl.stop) == (sl.start, sl.stop)
    decode_ok = all(
        np.array_equal(np.asarray(d.samples), tiles[sl.start + i])
        for i, d in enumerate(decs)
    )

    with open(f"{prefix}.out{pid}.json", "w") as f:
        json.dump({
            "pid": pid,
            "slice": [sl.start, sl.stop],
            "sizes": sizes.tolist(),
            "offsets": offsets.tolist(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices()),
            "decode_ok": bool(decode_ok),
            "decoded_tiles": len(decs),
        }, f)


if __name__ == "__main__":
    main()
