from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    pad_batch_to_devices,
    replicate,
    replicated,
    shard_batch,
)
from .sample_parallel import (
    SAMPLE_AXIS,
    make_mesh_2d,
    make_sharded_inference_fn,
)

__all__ = [
    "DATA_AXIS",
    "SAMPLE_AXIS",
    "batch_sharding",
    "make_mesh",
    "make_mesh_2d",
    "make_sharded_inference_fn",
    "pad_batch_to_devices",
    "replicate",
    "replicated",
    "shard_batch",
]
