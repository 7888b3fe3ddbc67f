"""SO(3) pushforward of an so(3)≅R³ conditional flow.

Capability parity with the reference's
`ConditionalLocalDiffeoTransformedDistribution` over
`[ToTransform(f32→f64), SO3ExpCompactTransform]`
(models/norm_flows/local_diffeo_transformed_distribution.py:84-142,
models/norm_flows/transforms/so3_exp_transform.py:15-50), redesigned for TPU:

* The reference recursively inverts a transform list per preimage branch and
  asserts on NaNs at every step.  Here the full preimage set
  {log R} ∪ {±2π-shifted} is batched along one leading axis of size 3 and
  scored by the flow in a single fused pass, then logsumexp-reduced — no
  recursion, no f64 (the f32-safe `ops.so3` log map replaces the reference's
  float64 requirement).
* Out-of-support branches contribute -inf via masking, exactly like the
  reference's masked xset (so3_exp_transform.py:39-41).
"""

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.so3 import (
    so3_exp,
    so3_log,
    so3_log_abs_det_jacobian,
    so3_xset,
)
from .factory import ConditionalFlow

_NEG_INF = -1e30  # used instead of -inf so masked branches cannot yield NaN
                  # gradients through logsumexp


@dataclass(frozen=True)
class SO3FlowDistribution:
    """Distribution over SO(3) = exp_* (flow over so(3) with compact support)."""

    flow: ConditionalFlow
    support_radius: float = 1.5 * math.pi

    def init(self, key):
        return self.flow.init(key)

    def sample(self, params, key, context, sample_shape=()):
        """rsample rotation matrices: flow sample on so(3) → exp map.

        :return: (*sample_shape, *context.shape[:-1], 3, 3)
        """
        x = self.flow.sample(params, key, context, sample_shape)
        return so3_exp(x)

    def mode_rotmat(self, params, context):
        """Rotation at the flow's base-mode (the reference's point estimate)."""
        return so3_exp(self.flow.mode_estimate(params, context))

    def log_prob(self, params, rotmat, context):
        """log p(R | context) with the 3-branch preimage logsumexp.

        :param rotmat: (..., 3, 3); :param context: (..., C)
        :return: (...) log-probability
        """
        x = so3_log(rotmat)  # primary preimage (..., 3)
        xset = so3_xset(x, 1)  # (2, ..., 3) shifted preimages
        branches = jnp.concatenate([x[None], xset], axis=0)  # (3, ..., 3)

        norms = jnp.linalg.norm(branches, axis=-1)
        in_support = norms < self.support_radius
        # Out-of-support branches are masked; zero them so the flow inverse
        # sees benign values (reference: xset.masked_fill_, so3_exp_transform.py:40)
        safe = jnp.where(in_support[..., None], branches, jnp.zeros_like(branches))

        # One fused scoring pass over the 3 preimage branches.
        ctx = jnp.broadcast_to(context, (3,) + context.shape)
        flow_lp = self.flow.log_prob(params, safe, ctx)  # (3, ...)
        exp_ld = so3_log_abs_det_jacobian(safe)  # (3, ...)

        terms = jnp.where(in_support, flow_lp - exp_ld, _NEG_INF)
        return jax.scipy.special.logsumexp(terms, axis=0)
