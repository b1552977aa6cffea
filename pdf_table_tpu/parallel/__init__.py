from .mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate_params,
    pad_to_multiple,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate_params",
    "pad_to_multiple",
]
