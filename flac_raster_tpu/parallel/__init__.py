from .decode_mesh import decode_flac_batch_mesh
from .mesh import Mesh, NamedSharding, P, tile_mesh, tile_sharding
from .tile_engine import frame_bytes_from_subframe_bits, make_tile_step

__all__ = [
    "Mesh",
    "NamedSharding",
    "P",
    "tile_mesh",
    "tile_sharding",
    "make_tile_step",
    "frame_bytes_from_subframe_bits",
    "decode_flac_batch_mesh",
]
