"""Mesh-parallel tile encode step: shard_map over (tiles, blocks).

This is the TPU-native replacement for the reference's sequential per-tile
loop (``spatial_encoder.py:196-245``, ``cli.py:553-622`` -- SURVEY.md §3.3):
a whole batch of tiles is planned in one pjit/shard_map program, with

  * FLAC block planning (ops/device_codec.plan_blocks) running fully
    device-parallel -- blocks of one tile spread over the ``blocks`` mesh
    axis, different tiles over the ``tiles`` axis;
  * exact per-frame/per-tile byte sizes computed in-graph (the same
    arithmetic layout the host emitter uses);
  * the spatial byte-range index built collectively: ``psum`` of frame
    bytes over ``blocks``, ``all_gather`` of tile sizes over ``tiles``,
    exclusive prefix sum for the offsets.

``make_tile_step`` returns the compiled step; ``plan_tile_batch`` is the
host-facing wrapper used by converter.encode_array_batch when a mesh is
active.  The step is also the framework's ``dryrun_multichip`` payload
(__graft_entry__.py): it is the "full training step" equivalent -- the
complete sharded compute graph of the flagship workload.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
try:  # moved out of experimental in newer jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.device_codec import plan_blocks
from .mesh import tile_mesh

__all__ = ["make_tile_step", "frame_bytes_from_subframe_bits"]


def _utf8_bits_jnp(fi):
    """Frame-number UTF-8 length in bits (matches fast_encoder._utf8_tokens).

    Exact int32 comparison; supports frame indices < 2^26 (a 256 GB tile at
    blocksize 4096) -- far beyond any real tile. Larger streams use the host
    emitter's full-range path.
    """
    thresholds = jnp.asarray(
        np.array([0x80, 0x800, 0x10000, 0x200000, 0x4000000], np.int32)
    )
    n_bytes = jnp.sum(fi[..., None] >= thresholds, axis=-1) + 1
    return n_bytes.astype(jnp.int32) * 8


def frame_bytes_from_subframe_bits(sf_bits, frame_idx, bs_tail_bits: int = 0):
    """Exact frame byte size from per-channel subframe bits.

    Args:
        sf_bits: (..., F, C) int32 exact subframe sizes.
        frame_idx: (..., F) int32 absolute frame numbers.
    Returns:
        (..., F) int32 byte size of each frame (header + body + pad + crc16).
    """
    hdr_bits = 32 + _utf8_bits_jnp(frame_idx) + bs_tail_bits
    raw = hdr_bits + 8 + sf_bits.sum(axis=-1)
    pad = (-raw) % 8
    return (raw + pad + 16) // 8


def make_tile_step(
    mesh=None,
    *,
    blocksize: int = 4096,
    bps: int = 16,
    compression_level: int = 5,
):
    """Build the sharded tile-plan step.

    Returns:
        fn(tiles_pcm (T, F, C, N) int32) -> dict with
          subframe_bits (T, F, C), frame_bytes (T, F),
          tile_body_bytes (T,), offsets (T,)  [exclusive prefix over tiles]
        T must divide the ``tiles`` mesh axis, F the ``blocks`` axis.
    """
    if mesh is None:
        mesh = tile_mesh()
    from ..codec.encoder import EncoderConfig

    cfg = EncoderConfig.from_level(compression_level)
    plan_kw = dict(
        blocksize=blocksize,
        bps=bps,
        max_lpc_order=min(cfg.max_lpc_order, 8),
        max_partition_order=min(cfg.max_partition_order, 6),
        use_lpc=cfg.use_lpc,
    )

    def local_step(tiles):  # (tT, tF, C, N) local shard
        tT, tF, C, N = tiles.shape
        blocks = tiles.reshape(tT * tF * C, N)
        plan = plan_blocks(blocks, **plan_kw)
        sf_bits = plan["subframe_bits"].reshape(tT, tF, C)
        # absolute frame index of local frames within their tile
        blk_pos = jax.lax.axis_index("blocks")
        fidx = blk_pos * tF + jax.lax.broadcasted_iota(jnp.int32, (tT, tF), 1)
        fbytes = frame_bytes_from_subframe_bits(sf_bits, fidx)
        tile_local = fbytes.sum(axis=1)                         # (tT,)
        tile_body = jax.lax.psum(tile_local, "blocks")          # (tT,)
        all_tiles = jax.lax.all_gather(tile_body, "tiles", tiled=True)  # (T,)
        offsets_all = jnp.cumsum(all_tiles) - all_tiles         # exclusive
        t_pos = jax.lax.axis_index("tiles")
        offsets = jax.lax.dynamic_slice_in_dim(offsets_all, t_pos * tT, tT)
        return sf_bits, fbytes, tile_body, offsets

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("tiles", "blocks", None, None),),
        out_specs=(
            P("tiles", "blocks", None),
            P("tiles", "blocks"),
            P("tiles"),
            P("tiles"),
        ),
    )

    @jax.jit
    def step(tiles):
        sf_bits, fbytes, tile_body, offsets = sharded(tiles)
        return {
            "subframe_bits": sf_bits,
            "frame_bytes": fbytes,
            "tile_body_bytes": tile_body,
            "offsets": offsets,
        }

    return step
