"""Minimal, faithful test-only stand-in for the pyro-1.7.0 (and smplx)
surface imported by the reference flow stack — neither is installed here.

Purpose: let the REFERENCE'S OWN code run.  With these modules registered,
`/root/reference`'s `create_conditional_norm_flow`, every file under
`models/norm_flows/`, and the full `HumaniflowModel.forward` import and
execute on CPU torch, so tests/test_reference_flow_parity.py can take real
`state_dict()`s from the real composition and assert output equality
against the JAX stack + converter.

Faithfulness sources:
* spline math is a torch port of tests/pyro_oracle.py — the numpy
  transcription of pyro 1.7.0's `_monotonic_rational_spline`
  (order='linear') already pinned against the JAX flow library at 1e-9;
* module/parameter NAMING follows pyro 1.7.0's public source
  (`ConditionalDenseNN.layers` ModuleList, `SplineCoupling.nn`), so the
  reference state dicts carry the real key structure
  (`pose_so3flow_transform_modules.{m}.nn.layers.{l}.weight` — exactly what
  utils/convert_torch.py maps);
* `smplx.lbs.batch_rodrigues` re-states the standard SMPL-X Rodrigues
  formula (including its `rot_vecs + 1e-8` norm regularisation).

What this CANNOT prove: bit-level fidelity of pyro's internal classes
themselves — that stays pinned by the numpy oracle (tests/test_pyro_oracle).
Only the surface the reference's config system can reach is implemented
(spline_coupling + permute + radial-tanh + BatchNorm); the affine/masked
transform helpers raise if reached.
"""

import sys
import types

import torch
import torch.nn.functional as F
from torch.distributions import Transform, constraints

# --------------------------------------------------------------- dense NNs


class ConditionalDenseNN(torch.nn.Module):
    """pyro.nn.ConditionalDenseNN (pyro 1.7): ReLU MLP over
    concat([context, x], -1) — context FIRST — with the final layer split
    into param_dims slices.  Parameter naming: `layers.{i}.weight/bias`."""

    def __init__(self, input_dim, context_dim, hidden_dims, param_dims=(1, 1),
                 nonlinearity=None):
        super().__init__()
        self.input_dim = input_dim
        self.context_dim = context_dim
        self.hidden_dims = hidden_dims
        self.param_dims = list(param_dims)
        self.count_params = len(self.param_dims)
        self.output_multiplier = sum(self.param_dims)
        ends = []
        total = 0
        for d in self.param_dims:
            total += d
            ends.append(total)
        self.starts = [e - d for e, d in zip(ends, self.param_dims)]
        self.ends = ends
        layers = [torch.nn.Linear(input_dim + context_dim, hidden_dims[0])]
        for i in range(1, len(hidden_dims)):
            layers.append(torch.nn.Linear(hidden_dims[i - 1], hidden_dims[i]))
        layers.append(torch.nn.Linear(hidden_dims[-1], self.output_multiplier))
        self.layers = torch.nn.ModuleList(layers)
        self.f = nonlinearity if nonlinearity is not None else torch.nn.ReLU()

    def forward(self, x, context):
        context = context.expand(x.size()[:-1] + (context.size(-1),))
        return self._forward(torch.cat([context, x], dim=-1))

    def _forward(self, h):
        for layer in self.layers[:-1]:
            h = self.f(layer(h))
        h = self.layers[-1](h)
        if self.count_params == 1:
            return h
        return tuple(h[..., s:e] for s, e in zip(self.starts, self.ends))


class DenseNN(ConditionalDenseNN):
    """pyro.nn.DenseNN: the unconditional variant (context_dim = 0)."""

    def __init__(self, input_dim, hidden_dims, param_dims=(1, 1),
                 nonlinearity=None):
        super().__init__(input_dim, 0, hidden_dims, param_dims=param_dims,
                         nonlinearity=nonlinearity)

    def forward(self, x):
        return self._forward(x)


# ------------------------------------------------- conditional base classes


class ConditionalDistribution:
    def condition(self, context):
        raise NotImplementedError


class ConstantConditionalDistribution(ConditionalDistribution):
    def __init__(self, base_dist):
        self.base_dist = base_dist

    def condition(self, context):
        return self.base_dist


class ConditionalTransform:
    def condition(self, context):
        raise NotImplementedError


class ConstantConditionalTransform(ConditionalTransform):
    def __init__(self, transform):
        self.transform = transform

    def condition(self, context):
        return self.transform


class ConditionalTransformModule(ConditionalTransform, torch.nn.Module):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)


class TransformModule(Transform, torch.nn.Module):
    """pyro.distributions.torch_transform.TransformModule."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)

    def __hash__(self):
        return super(torch.nn.Module, self).__hash__()


class ConditionalTransformedDistribution(ConditionalDistribution):
    def __init__(self, base_dist, transforms):
        self.base_dist = (
            base_dist
            if isinstance(base_dist, ConditionalDistribution)
            else ConstantConditionalDistribution(base_dist)
        )
        self.transforms = [
            t if isinstance(t, ConditionalTransform)
            else ConstantConditionalTransform(t)
            for t in transforms
        ]

    def condition(self, context):
        base = self.base_dist.condition(context)
        transforms = [t.condition(context) for t in self.transforms]
        return torch.distributions.TransformedDistribution(
            base, transforms, validate_args=False
        )

    def clear_cache(self):
        pass


# ------------------------------------------------------------- transforms


class Permute(Transform):
    """pyro.distributions.transforms.Permute: volume-preserving axis
    permutation on the event dim."""

    bijective = True
    volume_preserving = True
    domain = constraints.real_vector
    codomain = constraints.real_vector
    event_dim = 1

    def __init__(self, permutation, *, dim=-1, cache_size=1):
        super().__init__(cache_size=cache_size)
        assert dim == -1, "stub supports dim=-1 (the reference usage)"
        self.permutation = permutation
        self.dim = dim

    @property
    def inv_permutation(self):
        result = torch.empty_like(self.permutation, dtype=torch.long)
        result[self.permutation] = torch.arange(
            self.permutation.size(0), dtype=torch.long,
            device=self.permutation.device,
        )
        return result

    def _call(self, x):
        return x.index_select(self.dim, self.permutation)

    def _inverse(self, y):
        return y.index_select(self.dim, self.inv_permutation)

    def log_abs_det_jacobian(self, x, y):
        return torch.zeros(
            x.size()[: -self.event_dim], dtype=x.dtype, device=x.device
        )

    def with_cache(self, cache_size=1):
        return self


class BatchNorm(TransformModule):
    """pyro.distributions.transforms.BatchNorm (pyro 1.7,
    pyro/distributions/transforms/batch_norm.py): flow batch-norm à la
    Dinh et al.  Elementwise (event_dim 0); _call is the base→data
    direction (DE-normalise with moving stats), _inverse is the usual
    normalisation and — in training mode — EMA-updates the moving stats
    from the batch (torch `Tensor.var` default: UNBIASED).  The log-det
    reported is log|dy/dx| = −log(γ̂/√(var+ε)) per element."""

    domain = constraints.real
    codomain = constraints.real
    bijective = True
    event_dim = 0

    def __init__(self, input_dim, momentum=0.1, epsilon=1e-5):
        super().__init__(cache_size=1)
        self.input_dim = input_dim
        self.momentum = momentum
        self.epsilon = epsilon
        self.gamma = torch.nn.Parameter(torch.ones(input_dim))
        self.beta = torch.nn.Parameter(torch.zeros(input_dim))
        self.register_buffer("moving_mean", torch.zeros(input_dim))
        self.register_buffer("moving_variance", torch.ones(input_dim))

    @property
    def constrained_gamma(self):
        return F.relu(self.gamma) + 1e-6

    def _call(self, x):
        return (x - self.beta) / self.constrained_gamma * torch.sqrt(
            self.moving_variance + self.epsilon
        ) + self.moving_mean

    def _inverse(self, y):
        if self.training:
            mean, var = y.mean(0), y.var(0)
            with torch.no_grad():
                self.moving_mean.mul_(1 - self.momentum).add_(mean * self.momentum)
                self.moving_variance.mul_(1 - self.momentum).add_(var * self.momentum)
        else:
            mean, var = self.moving_mean, self.moving_variance
        return (y - mean) * self.constrained_gamma / torch.sqrt(
            var + self.epsilon
        ) + self.beta

    def log_abs_det_jacobian(self, x, y):
        if self.training:
            var = torch.var(y, dim=0, keepdim=True)
        else:
            var = self.moving_variance
        return -torch.log(self.constrained_gamma / torch.sqrt(var + self.epsilon))


def _searchsorted(sorted_sequence, input_values):
    return (input_values[..., None] >= sorted_sequence).sum(dim=-1) - 1


def _select_bins(x, idx):
    idx = idx.clamp(min=0, max=x.size(-1) - 1)
    x = x.expand(idx.shape[:-1] + (x.shape[-1],))
    return x.gather(-1, idx).squeeze(-1)


def _calculate_knots(lengths, lower, upper):
    knots = torch.cumsum(lengths, dim=-1)
    knots = torch.cat([torch.zeros_like(knots[..., :1]), knots], dim=-1)
    knots = (upper - lower) * knots + lower
    knots[..., 0] = lower
    knots[..., -1] = upper
    lengths = knots[..., 1:] - knots[..., :-1]
    return lengths, knots


def _monotonic_rational_spline(
    inputs, widths, heights, derivatives, lambdas,
    inverse=False, bound=3.0,
    min_bin_width=1e-3, min_bin_height=1e-3, min_derivative=1e-3,
    min_lambda=0.025, eps=1e-6,
):
    """Torch port of tests/pyro_oracle.monotonic_rational_spline (pyro 1.7
    `_monotonic_rational_spline`, order='linear' branch).  Takes NORMALISED
    params; applies the internal min-floors; identity outside ±bound."""
    num_bins = widths.size(-1)
    left, right = -bound, bound
    bottom, top = -bound, bound
    inside = (inputs >= left) & (inputs <= right)

    widths = min_bin_width + (1.0 - min_bin_width * num_bins) * widths
    heights = min_bin_height + (1.0 - min_bin_height * num_bins) * heights
    derivatives = min_derivative + derivatives

    widths, cumwidths = _calculate_knots(widths, left, right)
    heights, cumheights = _calculate_knots(heights, bottom, top)

    pad = derivatives.new_full(derivatives.shape[:-1] + (1,), 1.0 - min_derivative)
    derivatives = torch.cat([pad, derivatives, pad], dim=-1)

    bin_idx = _searchsorted(
        (cumheights if inverse else cumwidths) + eps, inputs
    )[..., None]

    input_widths = _select_bins(widths, bin_idx)
    input_cumwidths = _select_bins(cumwidths, bin_idx)
    input_cumheights = _select_bins(cumheights, bin_idx)
    input_delta = _select_bins(heights / widths, bin_idx)
    input_derivatives = _select_bins(derivatives, bin_idx)
    input_derivatives_plus_one = _select_bins(derivatives[..., 1:], bin_idx)
    input_heights = _select_bins(heights, bin_idx)

    lambdas = (1.0 - 2.0 * min_lambda) * lambdas + min_lambda
    input_lambdas = _select_bins(lambdas, bin_idx)

    wa = 1.0
    wb = torch.sqrt(input_derivatives / input_derivatives_plus_one) * wa
    wc = (
        input_lambdas * wa * input_derivatives
        + (1.0 - input_lambdas) * wb * input_derivatives_plus_one
    ) / input_delta

    ya = input_cumheights
    yb = input_heights + input_cumheights
    yc = ((1.0 - input_lambdas) * wa * ya + input_lambdas * wb * yb) / (
        (1.0 - input_lambdas) * wa + input_lambdas * wb
    )

    if inverse:
        lo = (inputs <= yc).to(inputs.dtype)
        hi = 1.0 - lo
        numerator = (input_lambdas * wa * (ya - inputs)) * lo + (
            (wc - input_lambdas * wb) * inputs + input_lambdas * wb * yb - wc * yc
        ) * hi
        denominator = ((wc - wa) * inputs + wa * ya - wc * yc) * lo + (
            (wc - wb) * inputs + wb * yb - wc * yc
        ) * hi
        theta = numerator / denominator
        spline_out = theta * input_widths + input_cumwidths
        derivative_numerator = (
            wa * wc * input_lambdas * (yc - ya) * lo
            + wb * wc * (1.0 - input_lambdas) * (yb - yc) * hi
        ) * input_widths
        spline_lad = torch.log(derivative_numerator) - 2.0 * torch.log(
            denominator.abs()
        )
    else:
        theta = (inputs - input_cumwidths) / input_widths
        lo = (theta <= input_lambdas).to(inputs.dtype)
        hi = 1.0 - lo
        numerator = (wa * ya * (input_lambdas - theta) + wc * yc * theta) * lo + (
            wc * yc * (1.0 - theta) + wb * yb * (theta - input_lambdas)
        ) * hi
        denominator = (wa * (input_lambdas - theta) + wc * theta) * lo + (
            wc * (1.0 - theta) + wb * (theta - input_lambdas)
        ) * hi
        spline_out = numerator / denominator
        derivative_numerator = (
            wa * wc * input_lambdas * (yc - ya) * lo
            + wb * wc * (1.0 - input_lambdas) * (yb - yc) * hi
        ) / input_widths
        spline_lad = torch.log(derivative_numerator) - 2.0 * torch.log(
            denominator.abs()
        )

    outputs = torch.where(inside, spline_out, inputs)
    logabsdet = torch.where(inside, spline_lad, torch.zeros_like(inputs))
    return outputs, logabsdet


class SplineCoupling(TransformModule):
    """pyro.distributions.transforms.spline_coupling.SplineCoupling, the
    identity=True path (the reference always sets identity=True,
    conditional_spline_coupling_transform.py:78): x1 passes through and,
    with the conditioned hypernet, parameterises the spline on x2."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True
    event_dim = 1

    def __init__(self, input_dim, split_dim, hypernet, count_bins=8,
                 bound=3.0, order="linear", identity=False):
        super().__init__(cache_size=1)
        if not identity or order != "linear":
            raise RuntimeError(
                "pyro17_stub.SplineCoupling implements the reference "
                "configuration only (identity=True, order='linear')"
            )
        self.input_dim = input_dim
        self.split_dim = split_dim
        self.nn = hypernet
        self.count_bins = count_bins
        self.bound = bound
        self.order = order
        self.identity = identity

    def spline_op(self, x2, x1, **kwargs):
        w, h, d, l = self.nn(x1)
        shape = w.shape[:-1]
        event_dim = self.input_dim - self.split_dim
        k = self.count_bins
        w = torch.softmax(w.reshape(shape + (event_dim, k)), dim=-1)
        h = torch.softmax(h.reshape(shape + (event_dim, k)), dim=-1)
        d = F.softplus(d.reshape(shape + (event_dim, k - 1)))
        l = torch.sigmoid(l.reshape(shape + (event_dim, k)))
        return _monotonic_rational_spline(
            x2, w, h, d, l, bound=self.bound, **kwargs
        )

    def _call(self, x):
        x1, x2 = x[..., : self.split_dim], x[..., self.split_dim:]
        y2, log_detJ = self.spline_op(x2, x1)
        self._cache_log_detJ = log_detJ
        return torch.cat([x1, y2], dim=-1)

    def _inverse(self, y):
        y1, y2 = y[..., : self.split_dim], y[..., self.split_dim:]
        x2, log_detJ = self.spline_op(y2, y1, inverse=True)
        self._cache_log_detJ = -log_detJ
        return torch.cat([y1, x2], dim=-1)

    def log_abs_det_jacobian(self, x, y):
        x_old, y_old = self._cached_x_y
        if x is not x_old or y is not y_old:
            self(x)
        return self._cache_log_detJ.sum(-1)


def _not_stubbed(name):
    def _raise(*args, **kwargs):
        raise RuntimeError(
            f"pyro17_stub: {name} is outside the reference's production "
            "configuration and is not stubbed"
        )
    return _raise


# ------------------------------------------------------------------ smplx


def batch_rodrigues(rot_vecs, epsilon=1e-8, **kwargs):
    """smplx.lbs.batch_rodrigues: axis-angle (N, 3) → rotation matrices
    (N, 3, 3), with SMPL-X's `rot_vecs + 1e-8` norm regularisation."""
    batch_size = rot_vecs.shape[0]
    device, dtype = rot_vecs.device, rot_vecs.dtype
    angle = torch.norm(rot_vecs + 1e-8, dim=1, keepdim=True)
    rot_dir = rot_vecs / angle
    cos = torch.unsqueeze(torch.cos(angle), dim=1)
    sin = torch.unsqueeze(torch.sin(angle), dim=1)
    rx, ry, rz = torch.split(rot_dir, 1, dim=1)
    zeros = torch.zeros((batch_size, 1), dtype=dtype, device=device)
    K = torch.cat(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], dim=1
    ).view((batch_size, 3, 3))
    ident = torch.eye(3, dtype=dtype, device=device).unsqueeze(dim=0)
    return ident + sin * K + (1 - cos) * torch.bmm(K, K)


# ---------------------------------------------------------------- install


def install():
    """Register the fake `pyro` / `smplx` modules in sys.modules.  Safe to
    call repeatedly; a real pyro installation is never overwritten."""
    if "pyro" in sys.modules and not getattr(
        sys.modules["pyro"], "__pyro17_stub__", False
    ):
        return  # real pyro present

    pyro = types.ModuleType("pyro")
    pyro.__pyro17_stub__ = True

    nn_mod = types.ModuleType("pyro.nn")
    nn_mod.ConditionalDenseNN = ConditionalDenseNN
    nn_mod.DenseNN = DenseNN

    dist_mod = types.ModuleType("pyro.distributions")
    dist_mod.Normal = torch.distributions.Normal
    dist_mod.Independent = torch.distributions.Independent
    dist_mod.constraints = constraints
    dist_mod.ConditionalDistribution = ConditionalDistribution
    dist_mod.ConstantConditionalDistribution = ConstantConditionalDistribution
    dist_mod.ConditionalTransform = ConditionalTransform
    dist_mod.ConditionalTransformModule = ConditionalTransformModule
    dist_mod.ConditionalTransformedDistribution = ConditionalTransformedDistribution
    dist_mod.TransformModule = TransformModule

    cond_mod = types.ModuleType("pyro.distributions.conditional")
    cond_mod.ConditionalDistribution = ConditionalDistribution
    cond_mod.ConstantConditionalDistribution = ConstantConditionalDistribution
    cond_mod.ConditionalTransform = ConditionalTransform
    cond_mod.ConstantConditionalTransform = ConstantConditionalTransform
    cond_mod.ConditionalTransformModule = ConditionalTransformModule
    cond_mod.ConditionalTransformedDistribution = ConditionalTransformedDistribution

    tt_mod = types.ModuleType("pyro.distributions.torch_transform")
    tt_mod.TransformModule = TransformModule

    trans_mod = types.ModuleType("pyro.distributions.transforms")
    trans_mod.Permute = Permute
    trans_mod.BatchNorm = BatchNorm
    trans_mod.conditional_affine_coupling = _not_stubbed(
        "conditional_affine_coupling"
    )
    trans_mod.conditional_affine_autoregressive = _not_stubbed(
        "conditional_affine_autoregressive"
    )
    trans_mod.conditional_spline_autoregressive = _not_stubbed(
        "conditional_spline_autoregressive"
    )

    sc_mod = types.ModuleType("pyro.distributions.transforms.spline_coupling")
    sc_mod.SplineCoupling = SplineCoupling

    pyro.nn = nn_mod
    pyro.distributions = dist_mod
    dist_mod.conditional = cond_mod
    dist_mod.torch_transform = tt_mod
    dist_mod.transforms = trans_mod
    trans_mod.spline_coupling = sc_mod

    sys.modules["pyro"] = pyro
    sys.modules["pyro.nn"] = nn_mod
    sys.modules["pyro.distributions"] = dist_mod
    sys.modules["pyro.distributions.conditional"] = cond_mod
    sys.modules["pyro.distributions.torch_transform"] = tt_mod
    sys.modules["pyro.distributions.transforms"] = trans_mod
    sys.modules["pyro.distributions.transforms.spline_coupling"] = sc_mod

    if "smplx" not in sys.modules:
        smplx = types.ModuleType("smplx")
        lbs_mod = types.ModuleType("smplx.lbs")
        lbs_mod.batch_rodrigues = batch_rodrigues
        smplx.lbs = lbs_mod
        sys.modules["smplx"] = smplx
        sys.modules["smplx.lbs"] = lbs_mod
