"""Decompose one AR depth level's cost on TPU — the fused-kernel win budget.

VERDICT r4 item 2: the claim that a fused per-level Pallas kernel would win
<=2 ms on the 13.4 ms inference headline was accounting, not measurement.
This script measures, at headline sample scale (rows = B*(N+1) = 3232):

  level_full      one whole AR level: part contexts + flow-param select +
                  flow.forward + so3_exp + one-hot buffer blends
  level_ctx       _part_contexts alone (ancestor einsum + stacked dense)
  level_select    _part_flow_params alone (one-hot tensordot tree)
  level_flow      flow.forward alone (2x spline coupling + permutes +
                  radial tanh) given precomputed ctx + selected params
  level_exp_blend so3_exp + the two one-hot buffer blends
  ar_full_8       the full 8-level _autoregress (the real composition)

Every stage is its own jit; through the tunnel each dispatch adds ~0.5 ms,
so the per-stage numbers are upper bounds and `ar_full_8` minus overlap is
the ground truth.  Ratios size the Pallas prototype's best case: the fused
kernel can remove everything in level_flow (+ possibly level_select), but
not the level-to-level sequential dependency.

Usage: python scripts/profile_ar_level.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 32
N = 100  # fused pass rows = B * (N + 1)


def timed(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.models import HumaniflowModel

    cfg = get_humaniflow_cfg_defaults()
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 18))

    rows = B * (N + 1)
    isgc = jax.random.normal(
        jax.random.PRNGKey(1), (B, N + 1, model.isgc_dim), jnp.float32
    )
    key = jax.random.PRNGKey(2)

    # mid-tree level: index 3 (as many parts as most levels)
    for li, parts in enumerate(model.levels):
        print(f"level {li}: parts {parts}")
    parts = model.levels[3]
    P = len(parts)
    rot_buf = jax.random.normal(
        jax.random.PRNGKey(3), (B, N + 1, model.num_bodyparts, 3, 3), jnp.float32
    )
    z = (
        jax.random.normal(jax.random.PRNGKey(4), (B, N + 1, P, 3), jnp.float32)
        * model.flow.base_dist_std
    )

    results = {}

    ctx_fn = jax.jit(lambda p, i, r: model._part_contexts(p, parts, i, r))
    results["level_ctx"] = timed(ctx_fn, params, isgc, rot_buf)
    ctx = jax.block_until_ready(ctx_fn(params, isgc, rot_buf))

    sel_fn = jax.jit(lambda p: model._part_flow_params(p, parts))
    results["level_select"] = timed(sel_fn, params)
    flow_p = jax.block_until_ready(sel_fn(params))

    flow_fn = jax.jit(lambda fp, zz, cc: model.flow.forward(fp, zz, cc))
    results["level_flow"] = timed(flow_fn, flow_p, z, ctx)
    x = jax.block_until_ready(flow_fn(flow_p, z, ctx))

    def exp_blend(xx, so3_buf, rbuf):
        from humaniflow_tpu.ops.so3 import so3_exp

        r = so3_exp(xx)
        parts_arr = np.asarray(parts)
        oh = jnp.asarray(model.part_onehot[parts_arr])
        covered = jnp.asarray(model.part_onehot[parts_arr].sum(0))
        hi = jax.lax.Precision.HIGHEST
        so3_buf = so3_buf * (1.0 - covered[:, None]) + jnp.einsum(
            "...pc,pj->...jc", xx, oh, precision=hi
        )
        rbuf = rbuf * (1.0 - covered[:, None, None]) + jnp.einsum(
            "...pab,pj->...jab", r, oh, precision=hi
        )
        return so3_buf, rbuf

    so3_buf = jnp.zeros((B, N + 1, model.num_bodyparts, 3), jnp.float32)
    results["level_exp_blend"] = timed(jax.jit(exp_blend), x, so3_buf, rot_buf)

    def one_level(p, i, rbuf, zz):
        c = model._part_contexts(p, parts, i, rbuf)
        fp = model._part_flow_params(p, parts)
        xx = model.flow.forward(fp, zz, c)
        sb = jnp.zeros(i.shape[:-1] + (model.num_bodyparts, 3), jnp.float32)
        return exp_blend(xx, sb, rbuf)

    results["level_full"] = timed(jax.jit(one_level), params, isgc, rot_buf, z)

    ar_fn = jax.jit(
        lambda p, i, k: model._autoregress(p, i, key=k, zero_sample0=True)
    )
    results["ar_full_8"] = timed(ar_fn, params, isgc, key, n=30)

    # hypernet matmul floor: the 4-layer stacked dense at (rows, P) twice
    def hypernets(fp, cc, x1):
        from humaniflow_tpu.flows.dense_nn import apply_dense_nn

        outs = []
        for i, t in enumerate(model.flow.transforms):
            pk = f"transform_{i}"
            if hasattr(t, "_spline_params"):
                outs.append(
                    apply_dense_nn(fp[pk]["hypernet"], x1, cc, t.param_dims)[0]
                )
        return outs

    x1 = z[..., :1]
    results["hypernets_only"] = timed(jax.jit(hypernets), flow_p, ctx, x1)

    print(f"\nrows = {rows}, level parts = {P}")
    for k, v in results.items():
        print(f"  {k:16s} {v:7.3f} ms")
    lf = results["level_full"]
    print(
        f"\n  8 x level_full = {8 * lf:.2f} ms (vs ar_full_8 "
        f"{results['ar_full_8']:.2f} — difference is per-dispatch overhead "
        "+ XLA cross-level scheduling)"
    )


if __name__ == "__main__":
    main()
