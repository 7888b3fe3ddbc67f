"""Benchmark: 100-sample pose/shape distribution inference per image.

The reference's headline capability (predict/predict_humaniflow.py with
num_samples, README.md:88) run as ONE jitted graph: proxy → HumaniflowModel
(point estimate + N=100 hierarchical samples) → SMPL vertices for every
sample → per-vertex directional variance.  The reference does this as a
per-image Python loop over pyro distribution objects at batch size 1; here
it is a single compiled XLA program at batch 32.

Prints one JSON line: images/sec/chip for full 100-sample distribution
inference.  vs_baseline is vs the reference repo's published numbers — it
publishes none (BASELINE.md), so 1.0 is reported until a measured torch
baseline exists.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# XLA compiles on the (single-core) host; cache them across runs/rounds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 32
NUM_SAMPLES = 100
IMG = 256
NUM_VERTS = 6890  # real SMPL vertex count


def main():
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.models import HumaniflowModel, smpl_forward, synthetic_smpl

    cfg = get_humaniflow_cfg_defaults()
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    smpl = synthetic_smpl(num_verts=NUM_VERTS)

    @jax.jit
    def distribution_inference(params, proxy, key):
        out = model.apply(
            params, proxy, key=key, num_samples=NUM_SAMPLES,
            use_shape_mode_for_samples=True,
        )
        b = proxy.shape[0]
        flat = smpl_forward(
            smpl,
            out["shape_samples"].reshape(b * NUM_SAMPLES, -1),
            out["pose_rotmats_samples"].reshape(b * NUM_SAMPLES, 23, 3, 3),
            jnp.broadcast_to(
                out["glob_rotmat"][:, None], (b, NUM_SAMPLES, 3, 3)
            ).reshape(b * NUM_SAMPLES, 3, 3),
        )
        verts = flat["vertices"].reshape(b, NUM_SAMPLES, NUM_VERTS, 3)
        mean = verts.mean(axis=1, keepdims=True)
        vertex_var = ((verts - mean) ** 2).mean(axis=1).sum(axis=-1)  # (B, V)
        point_est = smpl_forward(
            smpl, out["shape_mode"], out["pose_rotmats_point_est"], out["glob_rotmat"]
        )
        return point_est["vertices"], vertex_var

    proxy = jax.random.normal(jax.random.PRNGKey(1), (BATCH, IMG, IMG, 18))

    # warmup/compile
    out = distribution_inference(params, proxy, jax.random.PRNGKey(2))
    jax.block_until_ready(out)

    # Enough queued iterations to fill the async dispatch pipeline — through
    # the axon tunnel, per-call dispatch overhead is ~6 ms at 10 queued calls
    # but ~0.5 ms at 100 (see docs/DESIGN.md measurement methodology).
    n_iters = 50
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = distribution_inference(params, proxy, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    images_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "distribution_inference_100samples",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": 1.0,
                "detail": {
                    "batch": BATCH,
                    "num_samples": NUM_SAMPLES,
                    "latency_ms_per_batch": round(dt * 1000, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
