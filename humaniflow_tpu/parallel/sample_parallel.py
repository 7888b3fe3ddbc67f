"""Sample-axis parallelism for distribution inference.

Distribution inference draws N (≈100) SMPL samples per image and reduces
them to per-vertex uncertainty; the sample axis is embarrassingly parallel
and, unlike data parallelism, shrinks LATENCY per batch, not just
throughput.  This module runs the flagship inference program over a 2-D
``(data, sample)`` mesh:

* encoder + AR flow forward: batch sharded over ``data`` (GSPMD);
* the SMPL-samples/moments stage: resharded so the N axis splits over
  ``sample`` — each shard reduces its local samples with the fused Pallas
  moments kernel (models/pallas_lbs.py) and a single ``psum`` over the
  ``sample`` axis (ICI) combines the per-image (Σx, Σx²) moments.  Moments
  are sums, so the collective is exact.

The reference has no distributed support at all (SURVEY.md §2.7); the 1-D
data-parallel layer lives in parallel/mesh.py.  A ~15M-param model does not
need tensor/pipeline parallelism, but the sample axis is a real second
sharding dimension for the serving path; ``__graft_entry__.dryrun_multichip``
exercises this program on the driver's virtual mesh.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.smpl import SMPLModel, smpl_forward, smpl_vertex_moments

DATA_AXIS = "data"
SAMPLE_AXIS = "sample"


def make_mesh_2d(n_data: int, n_sample: int) -> Mesh:
    """A (data, sample) mesh over the first n_data * n_sample devices."""
    devices = np.array(jax.devices()[: n_data * n_sample]).reshape(
        n_data, n_sample
    )
    return Mesh(devices, (DATA_AXIS, SAMPLE_AXIS))


def make_sharded_inference_fn(
    model,
    smpl: SMPLModel,
    mesh: Mesh,
    num_samples: int = 100,
):
    """Jitted distribution inference over a (data, sample) mesh.

    proxy (B, wh, wh, 18) → (point-estimate vertices (B, V, 3),
    per-vertex variance (B, V)).  B must divide the ``data`` axis size and
    num_samples the ``sample`` axis size.
    """
    n_sample_shards = mesh.shape[SAMPLE_AXIS]
    assert num_samples % n_sample_shards == 0, (
        f"num_samples={num_samples} must divide the sample axis "
        f"({n_sample_shards})"
    )
    sample_spec = NamedSharding(mesh, P(DATA_AXIS, SAMPLE_AXIS))
    data_spec = NamedSharding(mesh, P(DATA_AXIS))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, SAMPLE_AXIS),
            P(DATA_AXIS, SAMPLE_AXIS),
            P(DATA_AXIS, SAMPLE_AXIS),
        ),
        out_specs=P(DATA_AXIS),
    )
    def _local_moments(shp, pose, glob):
        lb, ln = shp.shape[:2]
        mom = smpl_vertex_moments(
            smpl,
            shp.reshape(lb * ln, -1),
            pose.reshape(lb * ln, 23, 3, 3),
            glob.reshape(lb * ln, 3, 3),
            num_groups=lb,
        )
        # per-image moments are sums over the (sharded) sample axis — one
        # exact psum over ICI completes them on every sample shard
        return jax.lax.psum(mom, SAMPLE_AXIS)

    @jax.jit
    def infer(params, proxy, key):
        proxy = jax.lax.with_sharding_constraint(proxy, data_spec)
        out = model.apply(
            params, proxy, key=key, num_samples=num_samples,
            use_shape_mode_for_samples=True,
        )
        b = proxy.shape[0]
        shp = jax.lax.with_sharding_constraint(out["shape_samples"], sample_spec)
        pose = jax.lax.with_sharding_constraint(
            out["pose_rotmats_samples"], sample_spec
        )
        glob = jax.lax.with_sharding_constraint(
            jnp.broadcast_to(
                out["glob_rotmat"][:, None], (b, num_samples, 3, 3)
            ),
            sample_spec,
        )
        mom = _local_moments(shp, pose, glob)
        s1 = mom[:, 0] / num_samples
        s2 = mom[:, 1] / num_samples
        vertex_var = jnp.maximum(s2 - s1 * s1, 0.0).sum(axis=1)  # (B, V)
        point_est = smpl_forward(
            smpl, out["shape_mode"], out["pose_rotmats_point_est"],
            out["glob_rotmat"],
        )
        return point_est["vertices"], vertex_var

    return infer
