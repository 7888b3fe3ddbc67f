"""Device-mesh and sharding helpers: the framework's communication layer.

The reference is single-GPU with no distributed support of any kind
(SURVEY.md §2.7 — no torch.distributed/NCCL/MPI anywhere).  The TPU-native
equivalent is batch data parallelism over a 1-D `data` mesh: batches are
sharded along `data`, parameters are replicated, and XLA inserts the
gradient all-reduce (psum over ICI) automatically from the sharding
annotations.  TP/PP/SP are intentionally out of scope — a ~15M-param
CNN+MLP+flow stack does not warrant them (SURVEY.md §2.7) — but the helpers
are written against arbitrary mesh shapes so larger meshes (e.g. pods,
data×model) compose later.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a pytree of arrays with the leading dim sharded over `data`."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (parameters, optimizer state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_devices(batch, n_devices: int):
    """Pad the leading dim of every array so it divides the device count
    (eval tails); returns (padded_batch, valid_mask)."""
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(batch)
    b = leaves[0].shape[0]
    padded_b = ((b + n_devices - 1) // n_devices) * n_devices
    pad = padded_b - b

    def pad_leaf(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    mask = jnp.arange(padded_b) < b
    return jax.tree_util.tree_map(pad_leaf, batch), mask
