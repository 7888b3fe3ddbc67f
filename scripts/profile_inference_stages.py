"""Per-stage TPU profiling of the distribution-inference model_forward.

Splits bench.py's 6.8 ms `model_forward` half (B=32, N=100 — the headline
benchmark's non-SMPL portion) into separately-jitted stages so the AR flow
loop gets the same measured decomposition the train step and synth pipeline
already have (VERDICT r3 item 4).  Stage jit boundaries add ~0.5 ms
dispatch overhead each through the tunneled chip — ratios are what matter.

Stages:
  encoder        ResNet-18 over the (B, 256, 256, 18) proxy
  heads          fc1 + cam/glob/shape heads (input_feats given)
  point_est_ar   8-level AR mode-estimate pass at batch B (heads incl.)
  samples_ar     8-level AR rsample pass at batch B·N=3200 (heads incl.)
  ar_cum_L       samples AR truncated to the first L depth levels —
                 per-level marginal cost of the stacked flow evaluation
  full           the shipped fused model_forward (bench.py stage_ms ref)

Usage:  python scripts/profile_inference_stages.py   (runs on the TPU)
"""

import copy
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
IMG = 256


def timed(fn, *args, n=30):
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
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    proxy = jax.random.normal(jax.random.PRNGKey(1), (B, IMG, IMG, 18))
    key = jax.random.PRNGKey(2)

    results = {}

    encoder = jax.jit(
        lambda p, x: model.encoder.apply(p["encoder"], x, train=False)
    )
    results["encoder"] = timed(encoder, params, proxy)
    feats = jax.block_until_ready(encoder(params, proxy))

    heads = jax.jit(
        lambda p, f, k: model.apply(
            p, input_feats=f, key=k, compute_point_est=False, num_samples=0
        )["cam_wp"]
    )
    results["heads"] = timed(heads, params, feats, key)

    pe = jax.jit(
        lambda p, f, k: model.apply(
            p, input_feats=f, key=k, compute_point_est=True, num_samples=0
        )["pose_rotmats_point_est"]
    )
    results["point_est_ar"] = timed(pe, params, feats, key)

    samples = jax.jit(
        lambda p, f, k: model.apply(
            p, input_feats=f, key=k, compute_point_est=False, num_samples=N,
            use_shape_mode_for_samples=True,
        )["pose_rotmats_samples"]
    )
    results["samples_ar"] = timed(samples, params, feats, key)

    # marginal per-level cost: truncate the depth-level list
    for lvl in range(1, len(model.levels) + 1):
        m = copy.copy(model)
        m.levels = model.levels[:lvl]
        fn = jax.jit(
            lambda p, f, k, m=m: m.apply(
                p, input_feats=f, key=k, compute_point_est=False,
                num_samples=N, use_shape_mode_for_samples=True,
            )["pose_rotmats_samples"]
        )
        results[f"ar_cum_{lvl}"] = timed(fn, params, feats, key, n=15)

    full = jax.jit(
        lambda p, x, k: model.apply(
            p, x, key=k, num_samples=N, use_shape_mode_for_samples=True
        )["pose_rotmats_samples"]
    )
    results["full"] = timed(full, params, proxy, key)

    print(f"\nInference model_forward stage profile (B={B}, N={N}, TPU)")
    for k, v in results.items():
        print(f"  {k:>14s}: {v:7.2f} ms")
    lvls = [results[f"ar_cum_{i}"] for i in range(1, len(model.levels) + 1)]
    marg = [lvls[0]] + [b - a for a, b in zip(lvls, lvls[1:])]
    parts_per_level = [len(p) for p in model.levels]
    print("  per-level marginal ms (parts):")
    for i, (m_, np_) in enumerate(zip(marg, parts_per_level)):
        print(f"    level {i}: {m_:6.2f} ms  ({np_} parts)")


if __name__ == "__main__":
    main()
