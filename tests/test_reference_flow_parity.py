"""Execution-level parity against the reference's REAL flow stack and full
HumaniflowModel forward.

pyro/smplx are not installed, so tests/pyro17_stub.py registers a faithful
pyro-1.7 surface (spline math = torch port of the validated numpy oracle,
module naming = pyro 1.7 source) and then the REFERENCE'S OWN code runs:

* `create_conditional_norm_flow` — the real composition
  (`/root/reference/models/norm_flows/pyro_conditional_norm_flow.py:22-119`):
  cyclic Permutes, ConditionalSplineCoupling, ScaledRadialTanhTransform;
* every file under `/root/reference/models/norm_flows/` (the reference's own
  transforms incl. `SO3ExpCompactTransform` and the 3-branch
  `LocalDiffeoTransformedDistribution.log_prob`,
  local_diffeo_transformed_distribution.py:84-143);
* the full `HumaniflowModel.forward`
  (`/root/reference/models/humaniflow_model.py:200-340`) — encoder → fc
  heads → ancestor-conditioned AR loop, deterministic paths (point estimate
  + teacher-forced log-likelihood).

The real `state_dict()` of the real composition is converted with
`utils/convert_torch.py` and outputs are asserted equal.  Combined with
tests/test_reference_parity.py (resnet/HRNet/Canny/crop/heatmaps/
Procrustes), this makes every deterministic component of the
checkpoint-conversion path output-verified in-environment; the only
remaining unexercised surface is pyro's own class internals, which stay
pinned by tests/test_pyro_oracle.py.
"""

import math
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import pyro17_stub  # noqa: E402

pyro17_stub.install()

pytest.importorskip("models.norm_flows.pyro_conditional_norm_flow")

from humaniflow_tpu.configs.defaults import ModelConfig  # noqa: E402
from humaniflow_tpu.models import HumaniflowModel  # noqa: E402
from humaniflow_tpu.models.smpl import SMPL_PARENTS  # noqa: E402
from humaniflow_tpu.utils.convert_torch import (  # noqa: E402
    convert_humaniflow_checkpoint,
)

B = 2
IMG = 64


def _ref_model_cfg():
    """The reference production MODEL config
    (/root/reference/configs/humaniflow_config.py:8-23 — yacs is not
    installed, so the same values as a namespace; they equal our
    configs.defaults.ModelConfig)."""
    cfg = ModelConfig()
    nf = types.SimpleNamespace(
        CONTEXT_DIM=cfg.NORM_FLOW.CONTEXT_DIM,
        NUM_TRANSFORMS=cfg.NORM_FLOW.NUM_TRANSFORMS,
        TRANSFORM_TYPE=cfg.NORM_FLOW.TRANSFORM_TYPE,
        TRANSFORM_NN_HIDDEN_DIMS=list(cfg.NORM_FLOW.TRANSFORM_NN_HIDDEN_DIMS),
        NUM_SPLINE_SEGMENTS=cfg.NORM_FLOW.NUM_SPLINE_SEGMENTS,
        PERMUTE_TYPE=cfg.NORM_FLOW.PERMUTE_TYPE,
        PERMUTE_NN_HIDDEN_DIMS=cfg.NORM_FLOW.PERMUTE_NN_HIDDEN_DIMS,
        COMPACT_SUPPORT_RADIUS=cfg.NORM_FLOW.COMPACT_SUPPORT_RADIUS,
        BASE_DIST_STD=cfg.NORM_FLOW.BASE_DIST_STD,
    )
    assert abs(nf.COMPACT_SUPPORT_RADIUS - 1.5 * math.pi) < 1e-9
    return types.SimpleNamespace(
        NUM_IN_CHANNELS=cfg.NUM_IN_CHANNELS,
        NUM_RESNET_LAYERS=cfg.NUM_RESNET_LAYERS,
        INPUT_SHAPE_GLOB_CAM_FEATS_DIM=cfg.INPUT_SHAPE_GLOB_CAM_FEATS_DIM,
        NUM_SMPL_BETAS=cfg.NUM_SMPL_BETAS,
        NORM_FLOW=nf,
    ), cfg


def _random_rotmats(n, seed):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, 3, 3)))
    det = np.linalg.det(q)
    q[det < 0] = -q[det < 0]
    return q.astype(np.float32)


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)


@pytest.fixture(scope="module")
def ref_and_jax_models():
    from models.humaniflow_model import HumaniflowModel as RefHumaniflowModel

    ref_cfg, our_cfg = _ref_model_cfg()
    torch.manual_seed(0)
    tm = RefHumaniflowModel(
        device="cpu", model_cfg=ref_cfg, smpl_parents=list(SMPL_PARENTS)
    )
    # non-trivial BN stats so the converter's mean/var mapping is exercised
    g = torch.Generator()
    g.manual_seed(1)
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.2)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)
    tm.eval()

    model = HumaniflowModel(our_cfg)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_humaniflow_checkpoint(sd, model)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return tm, model, params


def test_flow_composition_forward_parity(ref_and_jax_models):
    """The reference's own flow composition (Permute → spline coupling →
    Permute → spline coupling → radial tanh,
    pyro_conditional_norm_flow.py:121-127) vs our flow factory forward, on
    random base samples — per part, with the real converted weights."""
    tm, model, params = ref_and_jax_models
    rng = np.random.default_rng(2)

    from models.norm_flows.pyro_conditional_norm_flow import (
        forward_trans_conditional_norm_flow,
    )

    for part in (0, 7, 22):  # no-ancestor, mid-chain, deepest (wrist) part
        base = rng.normal(scale=0.6, size=(B, 3)).astype(np.float32)
        ctx = rng.normal(size=(B, model.cfg.NORM_FLOW.CONTEXT_DIM)).astype(
            np.float32
        )
        with torch.no_grad():
            want = forward_trans_conditional_norm_flow(
                transforms=tm.pose_so3flow_transforms[part],
                base_sample=torch.tensor(base),
                context=torch.tensor(ctx),
            ).numpy()

        flow_p = model._part_flow_params(params, (part,))
        got = model.flow.forward(
            flow_p, jnp.asarray(base)[:, None, :], jnp.asarray(ctx)[:, None, :]
        )[:, 0, :]
        assert _rel_err(got, want) < 5e-5, f"part {part}"


def test_so3_pushforward_log_prob_parity(ref_and_jax_models):
    """The reference's 3-branch SO(3) pushforward log_prob — its OWN
    LocalDiffeoTransformedDistribution + SO3ExpCompactTransform running on
    real torch — vs our SO3FlowDistribution.log_prob, same converted
    weights, same rotations."""
    tm, model, params = ref_and_jax_models
    rng = np.random.default_rng(3)

    rots = _random_rotmats(B, 4)
    for part in (0, 7, 22):
        ctx = rng.normal(size=(B, model.cfg.NORM_FLOW.CONTEXT_DIM)).astype(
            np.float32
        )
        with torch.no_grad():
            want = (
                tm.pose_SO3flow_dists[part]
                .condition(torch.tensor(ctx))
                .log_prob(torch.tensor(rots).double())  # loss casts,
                # humaniflow_loss.py:27
                .numpy()
            )
        got = model.so3_log_prob_per_part(
            params, part, jnp.asarray(rots), jnp.asarray(ctx)
        )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=2e-4, atol=2e-3, err_msg=f"part {part}"
        )


def test_so3_log_prob_parity_near_pi(ref_and_jax_models):
    """Same comparison at the numerically hard angles (SURVEY §7 hard-part
    #1): θ ≈ π (the xset/logsumexp branch boundary), θ ≈ 0, and θ just
    inside the 1.5π support radius."""
    from scipy.spatial.transform import Rotation

    tm, model, params = ref_and_jax_models
    rng = np.random.default_rng(21)

    axes = rng.normal(size=(4, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    thetas = np.array([np.pi - 1e-3, np.pi - 1e-5, 1e-4, 0.95 * 1.5 * np.pi])
    rots = Rotation.from_rotvec(axes * thetas[:, None]).as_matrix().astype(
        np.float32
    )
    ctx = rng.normal(size=(4, model.cfg.NORM_FLOW.CONTEXT_DIM)).astype(
        np.float32
    )
    part = 7
    with torch.no_grad():
        want = (
            tm.pose_SO3flow_dists[part]
            .condition(torch.tensor(ctx))
            .log_prob(torch.tensor(rots).double())
            .numpy()
        )
    got = np.asarray(
        model.so3_log_prob_per_part(
            params, part, jnp.asarray(rots), jnp.asarray(ctx)
        )
    )
    assert np.isfinite(got).all() and np.isfinite(want).all()
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-3)


def test_whole_model_deterministic_forward_parity(ref_and_jax_models):
    """Full reference HumaniflowModel.forward (compute_point_est +
    compute_for_loglik, num_samples=0 — the deterministic train-path
    forward, humaniflow_model.py:200-340) vs our model.apply +
    pose_log_prob with the converted real state_dict."""
    tm, model, params = ref_and_jax_models
    rng = np.random.default_rng(5)

    x = rng.normal(size=(B, 18, IMG, IMG)).astype(np.float32)
    shape_t = rng.normal(scale=0.5, size=(B, 10)).astype(np.float32)
    pose_R = _random_rotmats(B * 23, 6).reshape(B, 23, 3, 3)
    glob_R = _random_rotmats(B, 7)

    with torch.no_grad():
        ref_out = tm(
            torch.tensor(x),
            compute_point_est=True,
            num_samples=0,
            compute_for_loglik=True,
            shape_for_loglik=torch.tensor(shape_t),
            pose_R_for_loglik=torch.tensor(pose_R),
            glob_R_for_loglik=torch.tensor(glob_R),
        )
        ref_logprobs = torch.stack(
            [
                d.log_prob(torch.tensor(pose_R[:, i]).double())
                for i, d in enumerate(
                    ref_out["conditioned_pose_SO3flow_dists_for_loglik"]
                )
            ],
            dim=1,
        ).numpy()  # (B, 23)

    out = model.apply(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        key=jax.random.PRNGKey(0),
        compute_point_est=True,
        num_samples=0,
        compute_for_loglik=True,
        shape_for_loglik=jnp.asarray(shape_t),
        pose_R_for_loglik=jnp.asarray(pose_R),
        glob_R_for_loglik=jnp.asarray(glob_R),
        train=False,
    )
    got_logprobs = model.pose_log_prob(
        params, jnp.asarray(pose_R), out["pose_flow_contexts_for_loglik"]
    )

    assert _rel_err(out["cam_wp"], ref_out["cam_wp"].numpy()) < 2e-4
    assert _rel_err(out["glob_rotmat"], ref_out["glob_rotmat"].numpy()) < 2e-4
    assert _rel_err(out["shape_mode"], ref_out["shape_mode"].numpy()) < 2e-4
    assert (
        _rel_err(out["shape_log_std"], ref_out["shape_log_std"].numpy()) < 2e-4
    )
    assert (
        _rel_err(
            out["pose_axisangle_point_est"],
            ref_out["pose_axisangle_point_est"].numpy(),
        )
        < 5e-4
    )
    assert (
        _rel_err(
            out["pose_rotmats_point_est"],
            ref_out["pose_rotmats_point_est"].numpy(),
        )
        < 5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_logprobs), ref_logprobs, rtol=2e-4, atol=5e-3
    )


def test_reference_loss_execution_parity(ref_and_jax_models):
    """The reference's REAL HumaniflowLoss
    (/root/reference/losses/humaniflow_loss.py:5-79) — per-part pose NLL
    through the real conditioned SO(3) dists, shape NLL, visible-joints2D
    MSE, glob MSE, reference weights — vs our fused humaniflow_loss on the
    same converted weights and identical inputs."""
    tm, model, params = ref_and_jax_models
    rng = np.random.default_rng(11)

    from losses.humaniflow_loss import HumaniflowLoss as RefLoss

    from humaniflow_tpu.configs.defaults import LossConfig
    from humaniflow_tpu.losses.humaniflow_loss import humaniflow_loss

    loss_cfg = LossConfig()
    # reference LOSS cfg (configs/humaniflow_config.py:92-104) as namespace
    ref_loss_cfg = types.SimpleNamespace(
        REDUCTION=loss_cfg.REDUCTION,
        APPLY_POINT_EST_LOSS=loss_cfg.APPLY_POINT_EST_LOSS,
        WEIGHTS=types.SimpleNamespace(
            POSE=loss_cfg.WEIGHTS.POSE,
            SHAPE=loss_cfg.WEIGHTS.SHAPE,
            JOINTS2D=loss_cfg.WEIGHTS.JOINTS2D,
            GLOB_ROTMATS=loss_cfg.WEIGHTS.GLOB_ROTMATS,
        ),
    )
    img_wh = 256
    ref_loss = RefLoss(ref_loss_cfg, img_wh)

    x = rng.normal(size=(B, 18, IMG, IMG)).astype(np.float32)
    shape_t = rng.normal(scale=0.5, size=(B, 10)).astype(np.float32)
    pose_R = _random_rotmats(B * 23, 12).reshape(B, 23, 3, 3)
    glob_R = _random_rotmats(B, 13)
    n_s = 3
    j2d_pred = rng.uniform(-1, 1, size=(B, n_s, 17, 2)).astype(np.float32)
    j2d_tgt = rng.uniform(0, img_wh, size=(B, 17, 2)).astype(np.float32)
    j2d_vis = (rng.uniform(size=(B, 17)) > 0.3)
    glob_pred = _random_rotmats(B, 14)

    with torch.no_grad():
        ref_out = tm(
            torch.tensor(x),
            compute_point_est=False,
            num_samples=0,
            compute_for_loglik=True,
            shape_for_loglik=torch.tensor(shape_t),
            pose_R_for_loglik=torch.tensor(pose_R),
            glob_R_for_loglik=torch.tensor(glob_R),
        )
        want = float(
            ref_loss(
                target_dict={
                    "pose_params_rotmats": torch.tensor(pose_R),
                    "shape_params": torch.tensor(shape_t),
                    "joints2D": torch.tensor(j2d_tgt),
                    "joints2D_vis": torch.tensor(j2d_vis),
                    "glob_rotmats": torch.tensor(glob_R),
                },
                pred_dict={
                    "pose_dist": ref_out[
                        "conditioned_pose_SO3flow_dists_for_loglik"
                    ],
                    "shape_dist": ref_out["shape_dist_for_loglik"],
                    "joints2D": torch.tensor(j2d_pred),
                    "glob_rotmats": torch.tensor(glob_pred),
                },
            )
        )

    out = model.apply(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        key=jax.random.PRNGKey(0),
        compute_point_est=False,
        num_samples=0,
        compute_for_loglik=True,
        shape_for_loglik=jnp.asarray(shape_t),
        pose_R_for_loglik=jnp.asarray(pose_R),
        glob_R_for_loglik=jnp.asarray(glob_R),
        train=False,
    )
    pose_lp = model.pose_log_prob(
        params, jnp.asarray(pose_R), out["pose_flow_contexts_for_loglik"]
    )
    got, breakdown = humaniflow_loss(
        loss_cfg, img_wh,
        pred={
            "pose_log_probs": pose_lp,
            "shape_mode": out["shape_mode"],
            "shape_log_std": out["shape_log_std"],
            "joints2D": jnp.asarray(j2d_pred),
            "glob_rotmats": jnp.asarray(glob_pred),
        },
        target={
            "shape_params": jnp.asarray(shape_t),
            "joints2D": jnp.asarray(j2d_tgt),
            "joints2D_vis": jnp.asarray(j2d_vis),
            "glob_rotmats": jnp.asarray(glob_R),
        },
    )
    np.testing.assert_allclose(float(got), want, rtol=2e-4)


def test_batchnorm_flow_variant_parity():
    """EXEC parity for the NORM_FLOW.BATCH_NORM=on flow variant — the one
    config-reachable flow path without execution-level evidence through r3.

    The REFERENCE'S OWN factory with batch_norm=True
    (pyro_conditional_norm_flow.py:77-78: a pyro `trans.BatchNorm` between
    each permute and coupling) runs under the stub; its real module-list
    `state_dict()` (incl. γ/β and non-trivial moving stats) goes through
    `convert_flow_transforms`, then:
      * forward (base→data) equality,
      * eval-mode log_prob equality (inverse chain + log-dets through BN),
      * training-mode EMA-stat update parity: pyro's `_inverse` updates
        moving_mean/moving_variance with the UNBIASED batch stats and
        feeds batch-normalised values downstream — our
        `update_batchnorm_stats` must land on identical buffers for BOTH
        BN layers (the deep one only matches if the chain values match).
    """
    from models.norm_flows.pyro_conditional_norm_flow import (
        create_conditional_norm_flow as ref_create,
        forward_trans_conditional_norm_flow,
    )

    from humaniflow_tpu.flows import (
        FlowBatchNorm,
        create_conditional_norm_flow,
    )
    from humaniflow_tpu.utils.convert_torch import convert_flow_transforms

    ctx_dim, radius, std = 6, 1.5 * math.pi, 0.84
    torch.manual_seed(3)
    dist, modules, ref_transforms = ref_create(
        device="cpu", event_dim=3, context_dim=ctx_dim, num_transforms=2,
        transform_type="spline_coupling", transform_hidden_dims=[32, 16],
        permute_type="permute", batch_norm=True,
        radial_tanh_radius=radius, base_dist_std=std,
    )
    # non-trivial BN parameters and running stats
    g = torch.Generator()
    g.manual_seed(4)
    with torch.no_grad():
        for name, p in modules.named_parameters():
            if name.endswith(("gamma", "beta")):
                p.add_(torch.randn(p.shape, generator=g) * 0.3)
        for name, buf in modules.named_buffers():
            if name.endswith("moving_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.4)
            elif name.endswith("moving_variance"):
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)
    modules.eval()

    flow = create_conditional_norm_flow(
        event_dim=3, context_dim=ctx_dim, num_transforms=2,
        transform_type="spline_coupling", transform_hidden_dims=(32, 16),
        permute_type="permute", batch_norm=True,
        radial_tanh_radius=radius, base_dist_std=std,
    )
    assert flow.has_batch_norm
    sd = {k: v.detach().numpy() for k, v in modules.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_flow_transforms(sd, flow)
    )

    rng = np.random.default_rng(9)
    n = 16
    base = rng.normal(scale=0.6, size=(n, 3)).astype(np.float32)
    ctx = rng.normal(size=(n, ctx_dim)).astype(np.float32)

    # ---- forward (base→data): BN runs its de-normalising _call direction
    with torch.no_grad():
        want_y = forward_trans_conditional_norm_flow(
            transforms=ref_transforms,
            base_sample=torch.tensor(base),
            context=torch.tensor(ctx),
        ).numpy()
    got_y = np.asarray(flow.forward(params, jnp.asarray(base), jnp.asarray(ctx)))
    assert _rel_err(got_y, want_y) < 5e-5

    # ---- eval-mode log_prob: inverse chain + BN log-dets (moving stats)
    with torch.no_grad():
        want_lp = (
            dist.condition(torch.tensor(ctx))
            .log_prob(torch.tensor(want_y))
            .numpy()
        )
    got_lp = np.asarray(flow.log_prob(params, jnp.asarray(want_y), jnp.asarray(ctx)))
    np.testing.assert_allclose(got_lp, want_lp, rtol=2e-4, atol=2e-4)

    # ---- training-mode EMA-stat update parity
    modules.train()
    with torch.no_grad():
        dist.condition(torch.tensor(ctx)).log_prob(torch.tensor(want_y))
    new_params = flow.update_batchnorm_stats(
        params, jnp.asarray(want_y), jnp.asarray(ctx)
    )
    bn_slots = [
        i for i, t in enumerate(flow.transforms) if isinstance(t, FlowBatchNorm)
    ]
    bn_modules = [m for m in modules if type(m).__name__ == "BatchNorm"]
    assert len(bn_slots) == len(bn_modules) == 2
    for slot, mod in zip(bn_slots, bn_modules):
        p = new_params[f"transform_{slot}"]
        np.testing.assert_allclose(
            np.asarray(p["moving_mean"]), mod.moving_mean.numpy(),
            rtol=1e-5, atol=1e-6, err_msg=f"transform_{slot} mean",
        )
        np.testing.assert_allclose(
            np.asarray(p["moving_var"]), mod.moving_variance.numpy(),
            rtol=1e-5, atol=1e-6, err_msg=f"transform_{slot} var",
        )
        # stats actually moved
        assert not np.allclose(
            np.asarray(p["moving_mean"]),
            np.asarray(params[f"transform_{slot}"]["moving_mean"]),
        )


def test_stub_spline_matches_numpy_oracle():
    """The torch stub's spline (what the reference code runs on) agrees with
    the f64 numpy oracle that pins our JAX spline — closing the triangle
    stub == oracle == JAX."""
    import pyro_oracle

    rng = np.random.default_rng(8)
    event, k, bound = 2, 8, 4.0
    x = rng.uniform(-5, 5, size=(6, event)).astype(np.float64)
    w = pyro_oracle._softmax(rng.normal(size=(6, event, k)))
    h = pyro_oracle._softmax(rng.normal(size=(6, event, k)))
    d = pyro_oracle._softplus(rng.normal(size=(6, event, k - 1)))
    lam = pyro_oracle._sigmoid(rng.normal(size=(6, event, k)))

    want_y, want_lad = pyro_oracle.monotonic_rational_spline(
        x, w, h, d, lam, bound=bound
    )
    got_y, got_lad = pyro17_stub._monotonic_rational_spline(
        torch.tensor(x), torch.tensor(w), torch.tensor(h), torch.tensor(d),
        torch.tensor(lam), bound=bound,
    )
    np.testing.assert_allclose(got_y.numpy(), want_y, rtol=1e-12, atol=1e-12)
    inside = (x >= -bound) & (x <= bound)
    np.testing.assert_allclose(
        got_lad.numpy()[inside], want_lad[inside], rtol=1e-10, atol=1e-12
    )
