"""Conditional normalizing-flow factory + flow-level sample/log_prob.

Capability parity with the reference's flow factory
(models/norm_flows/pyro_conditional_norm_flow.py:21): base
Independent-Normal(0, σ²I) → per block [permute | linear-PLU] →
conditional coupling (spline/additive/affine) → final radial-tanh
compactification.  Unlike the reference (pyro module objects with
stateful caching), this is a pure functional spec: one `ConditionalFlow`
object holds static config; parameters are a plain dict pytree that can be
stacked along a body-part axis and vmapped.
"""

import math
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .autoregressive import (
    ConditionalAffineAutoregressive,
    ConditionalSplineAutoregressive,
    FlowBatchNorm,
)
from .transforms import (
    ConditionalAdditiveCoupling,
    ConditionalAffineCoupling,
    ConditionalLinearPLU,
    ConditionalSplineCoupling,
    LinearPLU,
    Permute,
    ScaledRadialTanh,
)


@dataclass(frozen=True)
class ConditionalFlow:
    """A conditional flow on R^event_dim: z ~ N(0, σ²I) → transforms → y."""

    transforms: Tuple
    event_dim: int
    base_dist_std: float

    def init(self, key):
        keys = jax.random.split(key, max(len(self.transforms), 1))
        return {
            f"transform_{i}": t.init(keys[i]) for i, t in enumerate(self.transforms)
        }

    def forward(self, params, base_sample, context):
        """Push base samples through all transforms (reference:
        forward_trans_conditional_norm_flow, pyro_conditional_norm_flow.py:120).
        Returns y only."""
        x = base_sample
        for i, t in enumerate(self.transforms):
            x, _ = t.forward(params[f"transform_{i}"], x, context)
        return x

    def sample(self, params, key, context, sample_shape: Tuple[int, ...] = ()):
        """rsample: base normal sample pushed through the transforms.

        context: (..., C); sample_shape prepends dims, broadcast against the
        context batch shape like torch's rsample(sample_shape)."""
        batch_shape = context.shape[:-1]
        z = (
            jax.random.normal(
                key, sample_shape + batch_shape + (self.event_dim,), context.dtype
            )
            * self.base_dist_std
        )
        return self.forward(params, z, context)

    def log_prob(self, params, y, context):
        """Inverse through all transforms; Normal base log-prob minus the
        accumulated forward log-dets."""
        x = y
        total_ld = jnp.zeros(y.shape[:-1], y.dtype)
        for i in reversed(range(len(self.transforms))):
            x, ld = self.transforms[i].inverse(params[f"transform_{i}"], x, context)
            total_ld = total_ld + ld
        var = self.base_dist_std**2
        base_lp = jnp.sum(
            -0.5 * (x * x) / var - 0.5 * math.log(2 * math.pi * var), axis=-1
        )
        return base_lp - total_ld

    @property
    def has_batch_norm(self) -> bool:
        return any(isinstance(t, FlowBatchNorm) for t in self.transforms)

    def update_batchnorm_stats(self, params, y, context=None):
        """Update every FlowBatchNorm layer's running statistics from a
        training batch: run the inverse (density-direction) chain and feed
        each BN layer the value it normalises.  Returns new params (pure —
        the stats live in the params pytree).  No-op without BN layers.

        Note: the SO(3) pushforward's preimage set is handled upstream by
        scoring the principal log-map branch (pyro updates stats on every
        xset branch it inverts; the principal branch is the dominant one
        inside the compact support)."""
        if not self.has_batch_norm:
            return params
        new_params = dict(params)
        x = y
        for i in reversed(range(len(self.transforms))):
            t = self.transforms[i]
            p = params[f"transform_{i}"]
            if isinstance(t, FlowBatchNorm):
                # pyro training-mode _inverse: EMA-update the stats AND
                # continue the chain with the batch-normalised values
                new_params[f"transform_{i}"], x = t.update_stats(p, x)
            else:
                x, _ = t.inverse(p, x, context)
        return new_params

    def mode_estimate(self, params, context):
        """Push the base-distribution mode (0) through the flow — the
        reference's pose point estimate (humaniflow_model.py:296)."""
        zero = jnp.zeros(context.shape[:-1] + (self.event_dim,), context.dtype)
        return self.forward(params, zero, context)


def create_conditional_norm_flow(
    event_dim: int,
    context_dim: int,
    num_transforms: int,
    transform_type: str = "spline_coupling",
    transform_hidden_dims: Sequence[int] = (64, 32, 32),
    permute_type: Optional[str] = "permute",
    permute_hidden_dims: Optional[Sequence[int]] = None,
    batch_norm: bool = False,
    radial_tanh_radius: Optional[float] = None,
    base_dist_std: float = 1.0,
    count_bins: int = 8,
    bound: float = 3.0,
) -> ConditionalFlow:
    """Build the flow spec (reference: pyro_conditional_norm_flow.py:21).

    Permutations cycle through the cyclic shifts of range(event_dim), exactly
    as the reference's itertools.cycle construction (:46-47).
    """
    assert transform_type in (
        "spline_coupling",
        "spline_masked",
        "additive_coupling",
        "affine_coupling",
        "affine_masked",
    ), f"transform_type {transform_type} not supported"
    transforms = []
    idx = list(range(event_dim))
    for i in range(num_transforms):
        if permute_type is not None:
            k = i % event_dim
            perm = tuple(idx[k:] + idx[:k])
            if permute_type == "permute":
                transforms.append(Permute(perm))
            elif permute_type == "linear_plu":
                transforms.append(LinearPLU(input_dim=event_dim, permutation=perm))
            elif permute_type == "conditional_linear_plu":
                transforms.append(
                    ConditionalLinearPLU(
                        input_dim=event_dim,
                        context_dim=context_dim,
                        hidden_dims=tuple(permute_hidden_dims or (event_dim * 10,) * 2),
                        permutation=perm,
                    )
                )
            else:
                raise ValueError(f"permute_type {permute_type} not supported")
        if batch_norm:
            transforms.append(FlowBatchNorm(input_dim=event_dim))
        if transform_type == "spline_coupling":
            transforms.append(
                ConditionalSplineCoupling(
                    input_dim=event_dim,
                    context_dim=context_dim,
                    hidden_dims=tuple(transform_hidden_dims),
                    count_bins=count_bins,
                    bound=bound,
                )
            )
        elif transform_type == "additive_coupling":
            transforms.append(
                ConditionalAdditiveCoupling(
                    input_dim=event_dim,
                    context_dim=context_dim,
                    hidden_dims=tuple(transform_hidden_dims),
                )
            )
        elif transform_type == "affine_coupling":
            transforms.append(
                ConditionalAffineCoupling(
                    input_dim=event_dim,
                    context_dim=context_dim,
                    hidden_dims=tuple(transform_hidden_dims),
                )
            )
        elif transform_type == "affine_masked":
            transforms.append(
                ConditionalAffineAutoregressive(
                    input_dim=event_dim,
                    context_dim=context_dim,
                    hidden_dims=tuple(transform_hidden_dims),
                )
            )
        elif transform_type == "spline_masked":
            transforms.append(
                ConditionalSplineAutoregressive(
                    input_dim=event_dim,
                    context_dim=context_dim,
                    hidden_dims=tuple(transform_hidden_dims),
                    count_bins=count_bins,
                    bound=bound,
                )
            )
    if radial_tanh_radius is not None:
        transforms.append(ScaledRadialTanh(radius=radial_tanh_radius))
    return ConditionalFlow(
        transforms=tuple(transforms),
        event_dim=event_dim,
        base_dist_std=base_dist_std,
    )
