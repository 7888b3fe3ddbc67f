"""Fused Pallas TPU kernel for one AR depth level's flow forward pass.

VERDICT r4 item 2 asked for a measured answer to the AR dispatch bound: the
8-level autoregressive loop in `models/humaniflow.py` is op-issue bound
(~600 small fused XLA ops across the levels, ~3.2 ms at B·N=3200 — see
docs/DESIGN.md "Inference model_forward split").  This module collapses one
level's whole transform stack

    [Permute | spline-coupling hypernet MLP | LRS spline x2 | radial tanh]

into ONE Pallas program per (part, row-block) so a level executes as a
single kernel instead of ~40 fused XLA ops.  Forward (sampling) direction
only — `log_det` is discarded by `ConditionalFlow.forward`, so the kernel
never computes it; the inverse/log-prob path keeps the XLA implementation.

Layout: everything runs TRANSPOSED, activations (features, rows) instead of
(rows, features).  Spline bin parameters then live on (K=8, rows) tiles —
8 sublanes × Rb lanes = 4 vregs per vector op at Rb=512 — and bin search /
softmax / gathers become sublane reductions, instead of (rows, 8) tiles
that pad 8 lanes to 128 (16× the vector work).  The hypernet matmuls are
computed as Wᵀ·xᵀ on the MXU at HIGHEST precision (parity with the XLA
path's HIGHEST einsums; these matmuls feed densities where bf16 noise is
visible).  The output layer's columns are re-ordered and padded OUTSIDE the
kernel into eight 8-row groups ([w₀ w₁ h₀ h₁ d₀ d₁ l₀ l₁], d padded 7→8)
so every in-kernel slice is sublane-aligned.

Semantics match flows/spline.py::monotonic_rational_spline (forward) and
flows/transforms.py::ScaledRadialTanh bit-for-bit in structure; float
reassociation differs only in the knot cumsum (triangular-ones matmul vs
sequential adds) and the MXU accumulation order — measured agreement with
the XLA path is ~1e-6 relative (tests/test_pallas_level.py).

Reference capability: models/humaniflow_model.py:286-311 (the sequential
per-part pyro flow loop this whole stack replaces).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spline import (
    EPS,
    MIN_BIN_HEIGHT,
    MIN_BIN_WIDTH,
    MIN_DERIVATIVE,
    MIN_LAMBDA,
    _BOUNDARY_DERIV,
)
from .transforms import ConditionalSplineCoupling, Permute, ScaledRadialTanh

ROW_BLOCK = 512
_K = 8  # count_bins the kernel is specialised to (the shipped default)


def supports_flow(flow) -> bool:
    """True when the flow matches the fused kernel's specialisation:
    event_dim 3, blocks of [Permute, ConditionalSplineCoupling(count_bins=8,
    split 1+2)] and an optional trailing ScaledRadialTanh."""
    ts = flow.transforms
    if flow.event_dim != 3 or not ts:
        return False
    i = 0
    n_couplings = 0
    while i < len(ts) and not isinstance(ts[i], ScaledRadialTanh):
        if not isinstance(ts[i], Permute):
            return False
        if i + 1 >= len(ts) or not isinstance(ts[i + 1], ConditionalSplineCoupling):
            return False
        c = ts[i + 1]
        if c.count_bins != _K or c._split != 1 or c.input_dim != 3:
            return False
        if len(c.hidden_dims) < 1:
            return False
        i += 2
        n_couplings += 1
    if i == len(ts):
        return n_couplings > 0  # no compactification (radius None)
    return i == len(ts) - 1 and isinstance(ts[i], ScaledRadialTanh)


def _plan(flow):
    """Static structure: [(perm, transform_index), ...], radius or None."""
    blocks = []
    radius = None
    i = 0
    ts = flow.transforms
    while i < len(ts):
        if isinstance(ts[i], ScaledRadialTanh):
            radius = ts[i].radius
            break
        blocks.append((ts[i].permutation, i + 1, ts[i + 1]))
        i += 2
    return blocks, radius


# output-layer column re-order: [w(16) h(16) d(14) l(16)] (dim-major inside
# each block) → eight sublane-aligned 8-row groups [w0 w1 h0 h1 d0 d1 l0 l1]
# with the 7-wide d blocks padded to 8.  Index -1 selects the zero column
# appended in pack_level_weights (python wrap-around); the pad row's value
# is never read — the in-kernel interior-derivative row 7 is overwritten by
# the boundary constant before any select can reach it.
def _reorder_cols() -> np.ndarray:
    src = []
    for j in range(2):
        src += list(range(8 * j, 8 * j + 8))  # w dim j
    for j in range(2):
        src += list(range(16 + 8 * j, 24 + 8 * j))  # h dim j
    for j in range(2):
        src += list(range(32 + 7 * j, 32 + 7 * j + 7))  # d dim j (7 wide)
        src += [-1]
    for j in range(2):
        src += list(range(46 + 8 * j, 54 + 8 * j))  # l dim j
    return np.asarray(src, np.int32)


_COL_SRC = _reorder_cols()


def pack_level_weights(flow, flow_params):
    """Per-level kernel weight pytree from one-hot-selected flow params.

    :param flow_params: the flow param dict with a leading part axis (P,)
        (output of HumaniflowModel._part_flow_params).
    :return: list per coupling of [Wt..., bt...] arrays:
        Wt_l: (P, out, in) transposed kernels; bt_l: (P, out, 1) biases.
        The final layer is column-reordered/padded to 64 outputs.
    """
    blocks, _ = _plan(flow)
    packed = []
    for _, ti, c in blocks:
        hyper = flow_params[f"transform_{ti}"]["hypernet"]
        n_layers = len(hyper)
        ws, bs = [], []
        for li in range(n_layers):
            k = hyper[f"layer_{li}"]["kernel"]  # (P, in, out)
            b = hyper[f"layer_{li}"]["bias"]  # (P, out)
            if li == n_layers - 1:
                # reorder + zero-pad columns to the aligned 64-wide layout
                zero_k = jnp.zeros_like(k[..., :1])
                k = jnp.concatenate([k, zero_k], axis=-1)[..., _COL_SRC]
                zero_b = jnp.zeros_like(b[..., :1])
                b = jnp.concatenate([b, zero_b], axis=-1)[..., _COL_SRC]
            ws.append(jnp.swapaxes(k, -1, -2))  # (P, out, in)
            bs.append(b[..., None])  # (P, out, 1)
        packed.append((tuple(ws), tuple(bs)))
    return packed


def _spline_fwd_t(x, w_un, h_un, d_un, l_un, bound):
    """Transposed LRS spline forward: x (1, Rb); params (8, Rb).

    Mirrors flows/spline.py::monotonic_rational_spline(inverse=False) with
    wa ≡ 1 folded in and no logabsdet."""
    f32 = jnp.float32
    inside = (x >= -bound) & (x <= bound)
    xc = jnp.clip(x, -bound, bound)

    def knots(unnorm, min_frac):
        m = jnp.max(unnorm, axis=0, keepdims=True)
        e = jnp.exp(unnorm - m)
        s = jnp.sum(e, axis=0, keepdims=True)
        sizes = min_frac + (1.0 - min_frac * _K) * (e / s)
        # cumulative via triangular-ones matmul (sublane cumsum); built from
        # iota in-kernel — pallas kernels cannot capture array constants
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (_K, _K), 0)
            >= jax.lax.broadcasted_iota(jnp.int32, (_K, _K), 1)
        ).astype(jnp.float32)
        cum = jax.lax.dot_general(
            tri, sizes, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
        )
        k = 2.0 * bound * cum - bound
        row = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        k = jnp.where(row == _K - 1, jnp.full_like(k, bound), k)  # exact top
        kprev = jnp.concatenate([k[_K - 1:], k[: _K - 1]], axis=0)
        kprev = jnp.where(row == 0, jnp.full_like(k, -bound), kprev)
        widths = k - kprev  # == knot diffs after endpoint pinning
        # k[i] = knot_{i+1}; kprev[i] = knot_i; knot_0 = -bound
        return widths, k, kprev

    widths, kw, kw_prev = knots(w_un, MIN_BIN_WIDTH)
    heights, kh, kh_prev = knots(h_un, MIN_BIN_HEIGHT)

    # bin index over the 9 width-knots [-bound, kw...]
    ge0 = (xc >= (-bound + EPS)).astype(jnp.int32)
    ge = jnp.sum((xc >= (kw + EPS)).astype(jnp.int32), axis=0, keepdims=True)
    idx = jnp.clip(ge0 + ge - 1, 0, _K - 1)  # (1, Rb)
    row = jax.lax.broadcasted_iota(jnp.int32, (_K,) + x.shape[1:], 0)
    onehot = (row == idx).astype(f32)  # (8, Rb)

    def take(a):
        return jnp.sum(a * onehot, axis=0, keepdims=True)

    in_w = take(widths)
    in_cw = take(kw_prev)  # cumwidths[bin] — same float the XLA path gathers
    in_h = take(heights)
    in_ch = take(kh_prev)
    in_delta = take(heights / widths)

    interior = MIN_DERIVATIVE + jax.nn.softplus(d_un)  # rows 0..6 valid
    interior = jnp.where(
        row == _K - 1, jnp.full_like(interior, _BOUNDARY_DERIV), interior
    )
    in_d1 = take(interior)  # derivatives[bin+1] (row 7 = boundary const)
    shifted = jnp.concatenate([interior[_K - 1:], interior[: _K - 1]], axis=0)
    in_d = jnp.where(idx == 0, _BOUNDARY_DERIV, take(shifted))

    lam = (1.0 - 2.0 * MIN_LAMBDA) * jax.nn.sigmoid(take(l_un)) + MIN_LAMBDA

    wb = jnp.sqrt(in_d / in_d1)
    wc = (lam * in_d + (1.0 - lam) * wb * in_d1) / in_delta
    ya = in_ch
    yb = in_h + in_ch
    yc = ((1.0 - lam) * ya + lam * wb * yb) / ((1.0 - lam) + lam * wb)

    theta = (xc - in_cw) / in_w
    lo = theta <= lam
    numerator = jnp.where(
        lo,
        ya * (lam - theta) + wc * yc * theta,
        wc * yc * (1.0 - theta) + yb * wb * (theta - lam),
    )
    denominator = jnp.where(
        lo,
        (lam - theta) + wc * theta,
        wc * (1.0 - theta) + wb * (theta - lam),
    )
    return jnp.where(inside, numerator / denominator, x)


def _make_level_kernel(blocks, radius, layer_sizes):
    """blocks: [(perm, ti, coupling), ...]; layer_sizes: per coupling list of
    (out, in) shapes (static, for ref unpacking)."""
    n_c = len(blocks)
    n_w = sum(len(s) for s in layer_sizes)

    def kernel(ctx_ref, z_ref, *rest):
        refs = list(rest)
        w_refs = refs[: 2 * n_w]  # interleaved per layer: Wt, bt
        out_ref = refs[2 * n_w]

        ctx = ctx_ref[0]  # (C, Rb)
        xs = [z_ref[0, 0:1], z_ref[0, 1:2], z_ref[0, 2:3]]
        wi = 0
        for ci, (perm, _, coupling) in enumerate(blocks):
            xs = [xs[perm[0]], xs[perm[1]], xs[perm[2]]]
            h = jnp.concatenate([ctx, xs[0]], axis=0)  # context FIRST
            n_layers = len(layer_sizes[ci])
            for li in range(n_layers):
                wt = w_refs[wi][0]  # (out, in)
                bt = w_refs[wi + 1][0]  # (out, 1)
                wi += 2
                h = (
                    jax.lax.dot_general(
                        wt, h, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )
                    + bt
                )
                if li < n_layers - 1:
                    h = jnp.maximum(h, 0.0)
            # h: (64, Rb) = [w0 w1 h0 h1 d0 d1 l0 l1] 8-row groups
            b = float(coupling.bound)
            y1 = _spline_fwd_t(xs[1], h[0:8], h[16:24], h[32:40], h[48:56], b)
            y2 = _spline_fwd_t(xs[2], h[8:16], h[24:32], h[40:48], h[56:64], b)
            xs = [xs[0], y1, y2]

        if radius is not None:
            r = float(radius)
            nsq = xs[0] * xs[0] + xs[1] * xs[1] + xs[2] * xs[2]
            small = nsq < 1e-14
            norm = jnp.sqrt(jnp.where(small, jnp.ones_like(nsq), nsq))
            scale = jnp.where(
                small, jnp.ones_like(norm), jnp.tanh(norm / r) * r / norm
            )
            xs = [x * scale for x in xs]
        out_ref[0] = jnp.concatenate(xs, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("flow", "interpret"))
def flow_forward_level(flow, packed_weights, z, ctx, interpret: bool = False):
    """Fused forward pass of one level's flows: z, ctx → x.

    :param flow: the static ConditionalFlow spec (must satisfy
        `supports_flow`).
    :param packed_weights: from `pack_level_weights` (leading part axis P).
    :param z: (..., P, 3) base samples; :param ctx: (..., P, C) contexts.
    :return: (..., P, 3) transformed samples == flow.forward(params, z, ctx)
        to ~1e-6 (different float reassociation in cumsum/matmul).
    """
    blocks, radius = _plan(flow)
    lead = z.shape[:-2]
    p = z.shape[-2]
    c = ctx.shape[-1]
    rows = int(np.prod(lead)) if lead else 1

    z2 = z.reshape((rows, p, 3))
    ctx2 = ctx.reshape((rows, p, c))
    rpad = -(-rows // ROW_BLOCK) * ROW_BLOCK
    if rpad != rows:
        z2 = jnp.pad(z2, ((0, rpad - rows), (0, 0), (0, 0)))
        ctx2 = jnp.pad(ctx2, ((0, rpad - rows), (0, 0), (0, 0)))
    z_t = z2.transpose(1, 2, 0)  # (P, 3, Rpad)
    ctx_t = ctx2.transpose(1, 2, 0)  # (P, C, Rpad)

    flat_w = []
    layer_sizes = []
    for ws, bs in packed_weights:
        sizes = []
        for wt, bt in zip(ws, bs):
            flat_w += [wt, bt]
            sizes.append(tuple(wt.shape[-2:]))
        layer_sizes.append(tuple(sizes))

    grid = (p, rpad // ROW_BLOCK)
    in_specs = [
        pl.BlockSpec((1, c, ROW_BLOCK), lambda pi, ri: (pi, 0, ri)),
        pl.BlockSpec((1, 3, ROW_BLOCK), lambda pi, ri: (pi, 0, ri)),
    ]
    for a in flat_w:
        in_specs.append(
            pl.BlockSpec(
                (1,) + a.shape[1:], lambda pi, ri: (pi, 0, 0)
            )
        )
    out = pl.pallas_call(
        _make_level_kernel(blocks, radius, layer_sizes),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3, ROW_BLOCK), lambda pi, ri: (pi, 0, ri)),
        out_shape=jax.ShapeDtypeStruct((p, 3, rpad), jnp.float32),
        interpret=interpret,
    )(ctx_t, z_t, *flat_w)
    x = out.transpose(2, 0, 1)[:rows]  # (rows, P, 3)
    return x.reshape(lead + (p, 3))
