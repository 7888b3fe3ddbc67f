"""Fused AR-level Pallas kernel (flows/pallas_level.py, VERDICT r4 item 2).

The kernel collapses one depth level's whole flow stack (permutes + spline
coupling hypernets + LRS splines + radial tanh) into ONE Pallas program,
replacing ~40 fused XLA ops per level in the dispatch-bound AR loop
(models/humaniflow.py::_autoregress).  On CPU it runs in interpret mode —
numerics-identical to the Mosaic path up to float reassociation in the knot
cumsum (triangular matmul vs sequential adds) and MXU accumulation order.

Parity contract: flow_forward_level == ConditionalFlow.forward to ~1e-5 abs
on in-support inputs, including the mode (z=0), out-of-support tails
(identity region of the spline), and EVERY depth level's part count.

Reference capability: models/humaniflow_model.py:286-311 (the sequential
per-part pyro flow loop the fused AR pass replaces).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
from humaniflow_tpu.flows import pallas_level
from humaniflow_tpu.models import HumaniflowModel

requires_tpu = pytest.mark.skipif(
    os.environ.get("HFT_TEST_ON_TPU") != "1",
    reason="needs the real TPU chip (HFT_TEST_ON_TPU=1)",
)

_INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def model_and_params():
    cfg = get_humaniflow_cfg_defaults()
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 18))
    return model, params


def test_supports_default_flow(model_and_params):
    model, _ = model_and_params
    assert pallas_level.supports_flow(model.flow)


def test_unsupported_flows_rejected():
    from humaniflow_tpu.flows.factory import create_conditional_norm_flow

    # additive coupling: no spline stack to fuse
    add = create_conditional_norm_flow(
        event_dim=3, context_dim=8, num_transforms=2,
        transform_type="additive_coupling",
    )
    assert not pallas_level.supports_flow(add)
    # wrong event dim
    d2 = create_conditional_norm_flow(
        event_dim=2, context_dim=8, num_transforms=2,
        transform_type="spline_coupling",
    )
    assert not pallas_level.supports_flow(d2)


def _level_parity(model, params, level_idx, rows, seed, std=0.6):
    parts = model.levels[level_idx]
    p = len(parts)
    flow = model.flow
    flow_p = model._part_flow_params(params, parts)
    c = model.cfg.NORM_FLOW.CONTEXT_DIM
    z = jax.random.normal(jax.random.PRNGKey(seed), (rows, p, 3)) * std
    ctx = jax.random.normal(jax.random.PRNGKey(seed + 1), (rows, p, c))
    ref = flow.forward(flow_p, z, ctx)
    packed = pallas_level.pack_level_weights(flow, flow_p)
    out = pallas_level.flow_forward_level(
        flow, packed, z, ctx, interpret=_INTERPRET
    )
    return np.asarray(out), np.asarray(ref)


def test_level_forward_matches_xla_path(model_and_params):
    model, params = model_and_params
    out, ref = _level_parity(model, params, level_idx=3, rows=300, seed=5)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_every_level_part_count(model_and_params):
    """Each depth level has a different part count — grid dim 0 varies."""
    model, params = model_and_params
    for li in range(len(model.levels)):
        out, ref = _level_parity(model, params, level_idx=li, rows=64,
                                 seed=10 + li)
        np.testing.assert_allclose(out, ref, atol=1e-5, err_msg=f"level {li}")


def test_mode_and_tail_inputs(model_and_params):
    """z=0 (the point-estimate path) and |z| >> bound (the spline's identity
    region + radial-tanh compactification) hit every branch of the in-kernel
    select chains."""
    model, params = model_and_params
    parts = model.levels[3]
    p = len(parts)
    flow = model.flow
    flow_p = model._part_flow_params(params, parts)
    c = model.cfg.NORM_FLOW.CONTEXT_DIM
    z = jnp.concatenate([
        jnp.zeros((4, p, 3)),
        jnp.full((4, p, 3), 10.0),
        jnp.full((4, p, 3), -10.0),
    ])
    ctx = jax.random.normal(jax.random.PRNGKey(7), (12, p, c))
    ref = flow.forward(flow_p, z, ctx)
    packed = pallas_level.pack_level_weights(flow, flow_p)
    out = pallas_level.flow_forward_level(
        flow, packed, z, ctx, interpret=_INTERPRET
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_row_padding_and_leading_shape(model_and_params):
    """rows not a multiple of ROW_BLOCK are zero-padded; leading batch dims
    (B, N) reshape round-trips exactly."""
    model, params = model_and_params
    parts = model.levels[2]
    p = len(parts)
    flow = model.flow
    flow_p = model._part_flow_params(params, parts)
    c = model.cfg.NORM_FLOW.CONTEXT_DIM
    z = jax.random.normal(jax.random.PRNGKey(3), (3, 7, p, 3)) * 0.5
    ctx = jax.random.normal(jax.random.PRNGKey(4), (3, 7, p, c))
    ref = flow.forward(flow_p, z, ctx)
    packed = pallas_level.pack_level_weights(flow, flow_p)
    out = pallas_level.flow_forward_level(
        flow, packed, z, ctx, interpret=_INTERPRET
    )
    assert out.shape == (3, 7, p, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_whole_model_ar_parity_fused_vs_xla(model_and_params, monkeypatch):
    """The integration point: _autoregress with HFT_FUSED_LEVEL=1 (interpret
    on CPU) equals the XLA path at 1e-4 — samples, point estimate, and the
    downstream shape/glob heads all consume the fused output."""
    model, params = model_and_params
    proxy = jax.random.normal(jax.random.PRNGKey(11), (2, 32, 32, 18))
    key = jax.random.PRNGKey(12)

    monkeypatch.setenv("HFT_FUSED_LEVEL", "0")
    ref = jax.device_get(model.apply(params, proxy, key=key, num_samples=3))
    monkeypatch.setenv("HFT_FUSED_LEVEL", "1")
    out = jax.device_get(model.apply(params, proxy, key=key, num_samples=3))

    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], atol=2e-4,
            err_msg=f"fused-level AR diverged on output '{k}'",
        )


@requires_tpu
def test_tpu_mosaic_matches_xla_path(model_and_params):
    """Real-chip Mosaic compile + execute: the kernel's TPU lowering (not
    interpret mode) matches the XLA path on a full-size row block."""
    model, params = model_and_params
    out, ref = _level_parity(model, params, level_idx=3, rows=1024, seed=21)
    np.testing.assert_allclose(out, ref, atol=2e-5)
