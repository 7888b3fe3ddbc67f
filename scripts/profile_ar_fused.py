"""Fused-level Pallas kernel vs XLA AR loop on TPU (VERDICT r4 item 2).

Measures at headline sample scale (rows = B*(N+1) = 3232):
  flow_xla     one level's flow.forward (XLA op-by-op), jitted alone
  flow_fused   the same level through flows/pallas_level.flow_forward_level
  ar_xla_8     full 8-level _autoregress, HFT_FUSED_LEVEL=0
  ar_fused_8   full 8-level _autoregress, HFT_FUSED_LEVEL=1
  parity       max |ar_fused - ar_xla| on the sampled so3 vecs

Usage: python scripts/profile_ar_fused.py
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
N = 100


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
    from humaniflow_tpu.flows import pallas_level
    from humaniflow_tpu.models import HumaniflowModel

    cfg = get_humaniflow_cfg_defaults()
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 18))

    rows = B * (N + 1)
    isgc = jax.random.normal(
        jax.random.PRNGKey(1), (B, N + 1, model.isgc_dim), jnp.float32
    )
    key = jax.random.PRNGKey(2)
    results = {}

    parts = model.levels[3]
    p = len(parts)
    c = cfg.MODEL.NORM_FLOW.CONTEXT_DIM
    flow_p = jax.block_until_ready(
        jax.jit(lambda q: model._part_flow_params(q, parts))(params)
    )
    z = (
        jax.random.normal(jax.random.PRNGKey(4), (B, N + 1, p, 3), jnp.float32)
        * model.flow.base_dist_std
    )
    ctx = jax.random.normal(
        jax.random.PRNGKey(5), (B, N + 1, p, c), jnp.float32
    )

    flow_xla = jax.jit(lambda fp, zz, cc: model.flow.forward(fp, zz, cc))
    results["flow_xla"] = timed(flow_xla, flow_p, z, ctx)
    ref = jax.block_until_ready(flow_xla(flow_p, z, ctx))

    def fused(fp, zz, cc):
        packed = pallas_level.pack_level_weights(model.flow, fp)
        return pallas_level.flow_forward_level(model.flow, packed, zz, cc)

    fused_j = jax.jit(fused)
    results["flow_fused"] = timed(fused_j, flow_p, z, ctx)
    out = jax.block_until_ready(fused_j(flow_p, z, ctx))
    level_err = float(jnp.abs(out - ref).max())

    ar = lambda q, i, k: model._autoregress(q, i, key=k, zero_sample0=True)
    os.environ["HFT_FUSED_LEVEL"] = "0"
    ar_xla = jax.jit(ar)
    results["ar_xla_8"] = timed(ar_xla, params, isgc, key, n=30)
    so3_ref, rot_ref = jax.block_until_ready(ar_xla(params, isgc, key))

    os.environ["HFT_FUSED_LEVEL"] = "1"
    ar_fused = jax.jit(lambda q, i, k: model._autoregress(
        q, i, key=k, zero_sample0=True))
    results["ar_fused_8"] = timed(ar_fused, params, isgc, key, n=30)
    so3_f, rot_f = jax.block_until_ready(ar_fused(params, isgc, key))

    print(f"\nrows = {rows}, level parts = {p}")
    for k, v in results.items():
        print(f"  {k:12s} {v:7.3f} ms")
    print(f"  one-level parity max|Δ| = {level_err:.2e}")
    print(f"  AR parity     max|Δso3| = {float(jnp.abs(so3_f - so3_ref).max()):.2e}"
          f"  max|Δrot| = {float(jnp.abs(rot_f - rot_ref).max()):.2e}")


if __name__ == "__main__":
    main()
