"""Pyro-1.7.0 parity: the JAX spline stack vs a pure-numpy transcription.

Retires SURVEY.md §7 hard-part #2 ("pyro spline semantics must be re-derived
from pyro 1.7.0 behaviour, not guessed") without the external checkpoint:
`tests/pyro_oracle.py` transcribes pyro's `_monotonic_rational_spline`
(order='linear'), `SplineCoupling.spline_op` and `ConditionalDenseNN` into
float64 numpy, and these tests pin the JAX implementations against it to
1e-9 in x64 (far below the 1e-5 gate) over randomized parameters, boundary
bins, knot edges, and out-of-support inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_oracle as oracle

BOUND = 3.0
K = 8  # count_bins (reference default, humaniflow_config.py:17)


def _raw_spline_params(rng, shape, k=K):
    return (
        rng.normal(scale=2.0, size=shape + (k,)),
        rng.normal(scale=2.0, size=shape + (k,)),
        rng.normal(scale=2.0, size=shape + (k - 1,)),
        rng.normal(scale=2.0, size=shape + (k,)),
    )


def _edge_inputs(rng, n):
    """Inputs stressing every branch: interior, boundary knots, just
    inside/outside the support, far outside."""
    return np.concatenate([
        rng.uniform(-BOUND, BOUND, size=n),
        np.array([-BOUND, BOUND, -BOUND + 1e-7, BOUND - 1e-7,
                  -BOUND - 1e-7, BOUND + 1e-7, -10.0, 10.0, 0.0]),
    ])


@pytest.fixture(scope="module")
def x64():
    with jax.enable_x64(True):
        yield


class TestSplineVsPyroOracle:
    def _compare(self, inverse):
        from humaniflow_tpu.flows.spline import monotonic_rational_spline

        rng = np.random.default_rng(0 if not inverse else 1)
        w_raw, h_raw, d_raw, l_raw = _raw_spline_params(rng, (64, 2))
        x = _edge_inputs(rng, 64 * 2 - 9).reshape(64, 2)

        # oracle takes pyro-caller-normalised params
        ow = oracle._softmax(w_raw)
        oh = oracle._softmax(h_raw)
        od = oracle._softplus(d_raw)
        ol = oracle._sigmoid(l_raw)
        y_ref, ld_ref = oracle.monotonic_rational_spline(
            x, ow, oh, od, ol, inverse=inverse, bound=BOUND
        )
        y, ld = monotonic_rational_spline(
            jnp.asarray(x), jnp.asarray(w_raw), jnp.asarray(h_raw),
            jnp.asarray(d_raw), jnp.asarray(l_raw), inverse=inverse, bound=BOUND,
        )
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-9, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(ld), ld_ref, atol=1e-9, rtol=1e-9)

    def test_forward_matches(self, x64):
        self._compare(inverse=False)

    def test_inverse_matches(self, x64):
        self._compare(inverse=True)

    def test_roundtrip_through_oracle(self, x64):
        """JAX forward → oracle inverse reproduces the input: the two
        implementations agree as FUNCTIONS, not just pointwise."""
        from humaniflow_tpu.flows.spline import monotonic_rational_spline

        rng = np.random.default_rng(2)
        w_raw, h_raw, d_raw, l_raw = _raw_spline_params(rng, (128,))
        x = rng.uniform(-BOUND, BOUND, size=128)
        y, ld = monotonic_rational_spline(
            jnp.asarray(x)[:, None][..., 0],  # keep (128,) event-elementwise
            jnp.asarray(w_raw), jnp.asarray(h_raw),
            jnp.asarray(d_raw), jnp.asarray(l_raw), bound=BOUND,
        )
        x_back, ld_inv = oracle.monotonic_rational_spline(
            np.asarray(y), oracle._softmax(w_raw), oracle._softmax(h_raw),
            oracle._softplus(d_raw), oracle._sigmoid(l_raw),
            inverse=True, bound=BOUND,
        )
        np.testing.assert_allclose(x_back, x, atol=1e-8)
        # log|dx/dy| == -log|dy/dx|
        np.testing.assert_allclose(ld_inv, -np.asarray(ld), atol=1e-8)


class TestDenseNNVsPyroOracle:
    def test_hypernet_matches(self, x64):
        from humaniflow_tpu.flows.dense_nn import apply_dense_nn, init_dense_nn

        rng = np.random.default_rng(3)
        split, ctx_dim, hidden = 1, 64, (64, 32, 32)
        param_dims = (2 * K, 2 * K, 2 * (K - 1), 2 * K)
        params = init_dense_nn(jax.random.PRNGKey(0), split, ctx_dim, hidden, param_dims)
        # torch-layout (out, in) weights for the oracle
        layers = [
            (np.asarray(params[f"layer_{i}"]["kernel"]).T,
             np.asarray(params[f"layer_{i}"]["bias"]))
            for i in range(len(params))
        ]
        x = rng.normal(size=(5, split))
        context = rng.normal(size=(5, ctx_dim))
        ours = apply_dense_nn(params, jnp.asarray(x), jnp.asarray(context), param_dims)
        ref = oracle.conditional_dense_nn(layers, x, context, param_dims)
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(np.asarray(a), b, atol=1e-9, rtol=1e-9)


class TestSplineCouplingVsPyroOracle:
    def _setup(self, seed):
        from humaniflow_tpu.flows.transforms import ConditionalSplineCoupling

        spec = ConditionalSplineCoupling(
            input_dim=3, context_dim=64, hidden_dims=(64, 32, 32),
            count_bins=K, bound=BOUND,
        )
        params = spec.init(jax.random.PRNGKey(seed))
        layers = [
            (np.asarray(params["hypernet"][f"layer_{i}"]["kernel"]).T,
             np.asarray(params["hypernet"][f"layer_{i}"]["bias"]))
            for i in range(len(params["hypernet"]))
        ]
        return spec, params, layers

    def test_forward_matches(self, x64):
        spec, params, layers = self._setup(4)
        rng = np.random.default_rng(5)
        x = np.concatenate([
            rng.uniform(-BOUND, BOUND, size=(60, 3)),
            np.array([[0.3, -BOUND, BOUND], [0.1, 5.0, -5.0]]),
        ])
        context = rng.normal(size=(62, 64))
        y, ld = spec.forward(params, jnp.asarray(x), jnp.asarray(context))
        y_ref, lad_ref = oracle.spline_coupling_call(
            x, context, layers, split_dim=1, count_bins=K, bound=BOUND
        )
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-8)
        np.testing.assert_allclose(np.asarray(ld), lad_ref.sum(-1), atol=1e-8)
        # the VERDICT gate: ≤1e-5
        assert np.max(np.abs(np.asarray(y) - y_ref)) < 1e-5

    def test_inverse_matches(self, x64):
        spec, params, layers = self._setup(6)
        rng = np.random.default_rng(7)
        y = rng.uniform(-BOUND, BOUND, size=(40, 3))
        context = rng.normal(size=(40, 64))
        x, ld = spec.inverse(params, jnp.asarray(y), jnp.asarray(context))
        x_ref, lad_ref = oracle.spline_coupling_call(
            y, context, layers, split_dim=1, count_bins=K, bound=BOUND, inverse=True
        )
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-8)
        # ours returns log|dy/dx| (negated inverse lad); oracle returns log|dx/dy|
        np.testing.assert_allclose(np.asarray(ld), -lad_ref.sum(-1), atol=1e-8)


def test_f32_production_dtype_close_to_oracle():
    """The f32 path (production TPU dtype) stays within float32 noise of the
    f64 oracle away from bin edges."""
    from humaniflow_tpu.flows.spline import monotonic_rational_spline

    rng = np.random.default_rng(8)
    w_raw, h_raw, d_raw, l_raw = _raw_spline_params(rng, (256,))
    x = rng.uniform(-0.9 * BOUND, 0.9 * BOUND, size=256)
    y, _ = monotonic_rational_spline(
        jnp.asarray(x, jnp.float32), jnp.asarray(w_raw, jnp.float32),
        jnp.asarray(h_raw, jnp.float32), jnp.asarray(d_raw, jnp.float32),
        jnp.asarray(l_raw, jnp.float32), bound=BOUND,
    )
    y_ref, _ = oracle.monotonic_rational_spline(
        x, oracle._softmax(w_raw), oracle._softmax(h_raw),
        oracle._softplus(d_raw), oracle._sigmoid(l_raw), bound=BOUND,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=5e-5)
