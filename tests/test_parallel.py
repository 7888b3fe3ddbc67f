"""Mesh/sharding helper tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humaniflow_tpu.parallel import (
    batch_sharding,
    make_mesh,
    pad_batch_to_devices,
    replicate,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


def test_shard_batch_places_on_data_axis(mesh):
    batch = {"x": jnp.arange(16.0).reshape(16, 1), "y": jnp.ones((16, 3))}
    sharded = shard_batch(batch, mesh)
    for leaf in jax.tree_util.tree_leaves(sharded):
        assert leaf.sharding == batch_sharding(mesh)
        # 8 shards of 2 rows each
        assert len(leaf.addressable_shards) == 8
        assert leaf.addressable_shards[0].data.shape[0] == 2


def test_replicate(mesh):
    params = {"w": jnp.ones((4, 4))}
    rep = replicate(params, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_pad_batch_to_devices():
    batch = {"x": jnp.ones((5, 3))}
    padded, mask = pad_batch_to_devices(batch, 4)
    assert padded["x"].shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(mask), [1, 1, 1, 1, 1, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(padded["x"][:5]), 1.0)
    np.testing.assert_allclose(np.asarray(padded["x"][5:]), 0.0)


def test_sharded_computation_matches_single(mesh):
    """A jitted reduction over a sharded batch equals the unsharded result
    (XLA inserts the collective from the sharding)."""
    x = jnp.arange(32.0).reshape(16, 2)
    f = jax.jit(lambda a: jnp.sum(a**2))
    want = float(f(x))
    got = float(f(shard_batch({"x": x}, mesh)["x"]))
    assert got == pytest.approx(want)
