"""Learning-dynamics tests: the SO(3) flow fits a known target density, and
the full model overfits one synthetic batch — the 'it actually trains'
checks the reference never had."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from scipy.spatial.transform import Rotation as R

from humaniflow_tpu.flows import SO3FlowDistribution, create_conditional_norm_flow

CTX = 8


def _target_rotations(n, rng_seed=0, spread=0.3):
    """Rotations concentrated around a fixed rotation (rotvec noise)."""
    rng = np.random.default_rng(rng_seed)
    base = np.array([0.5, -0.3, 0.8])
    vecs = base + rng.normal(scale=spread, size=(n, 3))
    return R.from_rotvec(vecs).as_matrix().astype(np.float32)


def test_so3_flow_fits_target_density():
    flow = create_conditional_norm_flow(
        event_dim=3, context_dim=CTX, num_transforms=2,
        transform_type="spline_coupling", transform_hidden_dims=(32, 32),
        permute_type="permute", radial_tanh_radius=1.5 * math.pi,
        base_dist_std=0.6, count_bins=8, bound=1.5 * math.pi,
    )
    dist = SO3FlowDistribution(flow=flow, support_radius=1.5 * math.pi)
    params = dist.init(jax.random.PRNGKey(0))

    rots = jnp.asarray(_target_rotations(256))
    ctx = jnp.zeros((256, CTX))

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def nll(p):
            return -jnp.mean(dist.log_prob(p, rots, ctx))

        loss, grads = jax.value_and_grad(nll)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(120):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))

    assert np.isfinite(losses).all()
    # NLL must drop substantially (random init ≈ broad density over SO(3))
    assert losses[-1] < losses[0] - 1.0, (losses[0], losses[-1])

    # samples concentrate near the target rotation
    samples = dist.sample(params, jax.random.PRNGKey(1), ctx[:1], (200,))
    sv = R.from_matrix(np.asarray(samples[:, 0])).as_rotvec()
    base = np.array([0.5, -0.3, 0.8])
    mean_dist = np.linalg.norm(sv - base, axis=-1).mean()
    assert mean_dist < 0.8, mean_dist  # untrained flow gives ~2.0


def test_model_overfits_single_batch():
    """~60 Adam steps on one fixed synthetic batch: total loss and pose NLL
    must decrease substantially (full train-step path: encoder, heads, AR
    flows, teacher forcing, J2D reprojection)."""
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl
    from humaniflow_tpu.pipelines.train_step import make_train_step

    IMG, B = 32, 4
    cfg = get_humaniflow_cfg_defaults()
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    smpl = synthetic_smpl(num_verts=64)

    rng = np.random.default_rng(0)
    rot = R.random(B * 24, random_state=0).as_matrix().astype(np.float32)
    batch = {
        "proxy": jnp.asarray(rng.normal(size=(B, IMG, IMG, 18)), jnp.float32),
        "pose_rotmats": jnp.asarray(rot[: B * 23].reshape(B, 23, 3, 3)),
        "glob_rotmats": jnp.asarray(rot[B * 23 :].reshape(B, 3, 3)),
        "shape": jnp.asarray(rng.normal(scale=0.5, size=(B, 10)), jnp.float32),
        "joints2D": jnp.asarray(rng.uniform(0, IMG, size=(B, 17, 2)), jnp.float32),
        "joints2D_vis": jnp.ones((B, 17), jnp.float32),
    }
    opt = optax.adam(1e-3)
    step = jax.jit(
        make_train_step(model, smpl, cfg.LOSS, opt, img_wh=IMG, num_j2d_samples=2)
    )
    opt_state = opt.init(params)

    first = None
    key = jax.random.PRNGKey(1)
    for i in range(60):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, batch, sub)
        if i == 0:
            first = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}

    assert last["total"] < 0.5 * first["total"], (first["total"], last["total"])
    assert last["pose_nll"] < first["pose_nll"] - 1.0
    assert last["nan_skipped"] == 0.0
