"""Multi-host (DCN) tile dispatch (SURVEY.md §2.4's last row).

Launches N real coordinated processes on localhost (jax.distributed with
the Gloo CPU backend), each encoding a disjoint tile slice with its local
devices; the only cross-host traffic is the per-tile size allgather that
builds the global index.  The assembled sharded container must be
byte-identical to a single-process encode of the same batch.
"""

import json
import socket
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def mh_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    prefix = tmp / "scene"
    port = _free_port()
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_mh_worker.py"),
             str(p), str(nproc), str(port), str(prefix)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO),
        )
        for p in range(nproc)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, (out[-1000:], err[-2000:])
        outs.append(json.loads(Path(f"{prefix}.out{i}.json").read_text()))
    return prefix, nproc, outs


def test_index_agrees_across_hosts(mh_run):
    prefix, nproc, outs = mh_run
    assert outs[0]["sizes"] == outs[1]["sizes"]
    assert outs[0]["offsets"] == outs[1]["offsets"]
    # global view spans both processes' devices; tiles were split evenly
    for o in outs:
        assert o["global_devices"] == nproc * o["local_devices"]
    assert outs[0]["slice"] == [0, 3] and outs[1]["slice"] == [3, 5]


def test_assembled_container_matches_single_process(mh_run):
    prefix, nproc, outs = mh_run
    from flac_raster_tpu.codec.decoder import decode_flac
    from flac_raster_tpu.codec.fast_encoder import encode_flac_batch
    from flac_raster_tpu.parallel.multihost import assemble_sharded_container

    out = prefix.parent / "assembled.flac"
    assemble_sharded_container(prefix, nproc, out)
    blob = out.read_bytes()

    index_size = int.from_bytes(blob[:4], "big")
    index = json.loads(blob[4 : 4 + index_size])
    frames = index["frames"]
    assert [f["byte_size"] for f in frames] == outs[0]["sizes"]

    # the same deterministic workload, encoded single-process
    rng = np.random.default_rng(7)
    T, n, C = 5, 256 * 2 + 37, 1
    tiles = np.cumsum(rng.integers(-9, 10, (T, n, C)), axis=1).astype(np.int32)
    single = encode_flac_batch(tiles, 44100, 16, 5, blocksize=256)

    header = 4 + index_size
    for i, f in enumerate(frames):
        a = header + f["byte_offset"]
        tile = blob[a : a + f["byte_size"]]
        assert tile == single[i], f"tile {i} differs from single-process bytes"
        dec = decode_flac(tile, verify_crc=True, verify_md5=True)
        assert np.array_equal(dec.samples, tiles[i])


def test_decode_mirror_per_host(mh_run):
    """Each host decoded ITS slice of the assembled container with its
    local mesh (decode_container_tiles_multihost) and verified values
    against the shared workload -- no cross-host traffic."""
    prefix, nproc, outs = mh_run
    total = 0
    for out in outs:
        assert out["decode_ok"], f"host {out['pid']} decode mismatch"
        assert out["decoded_tiles"] == out["slice"][1] - out["slice"][0]
        total += out["decoded_tiles"]
    assert total == 5  # every tile decoded exactly once across hosts
