"""Hypernetwork MLPs for conditional flow transforms.

Functional equivalent of pyro's `ConditionalDenseNN` / `DenseNN`
(used by the reference's flow factory, pyro_conditional_norm_flow.py:82-106):
ReLU MLP over concat([context, x]) (context FIRST — this ordering is load
bearing for checkpoint conversion from the reference's pyro weights), final
linear layer split into the requested param_dims.

Parameters are plain dicts of stacked arrays so that the 23 per-body-part
hypernets can be stacked along a leading axis and evaluated as single batched
matmuls on the MXU (see models/humaniflow.py).
"""

from typing import Sequence

import jax
import jax.numpy as jnp


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    both weight and bias (matches the reference's initial distribution)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (fan_in**0.5)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"kernel": w, "bias": b}


def init_dense_nn(
    key,
    input_dim: int,
    context_dim: int,
    hidden_dims: Sequence[int],
    param_dims: Sequence[int],
    dtype=jnp.float32,
):
    """Initialise a (conditional) dense hypernet.  input_dim may be 0 for a
    context-only net (pyro DenseNN)."""
    out_dim = sum(param_dims)
    dims = [input_dim + context_dim] + list(hidden_dims) + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"layer_{i}": _linear_init(keys[i], dims[i], dims[i + 1], dtype)
        for i in range(len(dims) - 1)
    }


def apply_dense_nn(params, x, context, param_dims: Sequence[int]):
    """Apply hypernet.  x may be None for context-only nets.

    Weights may carry an extra leading stacking axis (P, in, out) — matmuls
    broadcast over it as long as inputs carry a matching leading axis.
    Returns a tuple of arrays split per param_dims (or a single array if one).
    """
    if x is None:
        h = context
    else:
        context = jnp.broadcast_to(context, x.shape[:-1] + context.shape[-1:])
        h = jnp.concatenate([context, x], axis=-1)  # context FIRST (pyro)
    n_layers = len(params)
    for i in range(n_layers):
        layer = params[f"layer_{i}"]
        # "...i,...io->...o": contracts the feature dim while right-aligned
        # broadcasting matches a stacked (P, in, out) kernel against inputs
        # carrying a part axis (..., P, in) — one batched MXU matmul across
        # batch × samples × parts.  HIGHEST precision: these tiny hypernet
        # matmuls feed log-densities where TPU bf16 default noise (~1e-3)
        # breaks invertibility/parity; the cost is negligible next to convs.
        h = (
            jnp.einsum(
                "...i,...io->...o", h, layer["kernel"],
                precision=jax.lax.Precision.HIGHEST,
            )
            + layer["bias"]
        )
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    if len(param_dims) == 1:
        return h
    splits = []
    start = 0
    for d in param_dims:
        splits.append(h[..., start : start + d])
        start += d
    return tuple(splits)
