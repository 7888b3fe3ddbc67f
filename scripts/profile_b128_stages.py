"""B=128 distribution-inference stage split + moments-precision experiment.

VERDICT r4 item 8: max throughput has been flat at ~2,790 img/s across
r3/r4 with no stage split at that batch.  This profiles the B=128 serving
batch the same way bench.py splits B=32 — encoder / fused model_forward /
SMPL+moments over B·N=12,800 bodies — and measures the candidate fix for
the dominant stage: `smpl_vertex_moments` runs its dots at
Precision.HIGHEST (6 bf16 MXU passes — the validated accuracy floor for
single-pass summation, models/pallas_lbs.py), so a DEFAULT-precision
(1-pass) variant is nominally 6x cheaper on the MXU; the question is what
vertex/moment error it costs vs the f64 oracle (reference capability:
per-sample SMPL forwards feeding mean/var reconstruction,
/root/reference/predict/predict_humaniflow.py:163-176).

Usage:  python scripts/profile_b128_stages.py   (runs on the TPU)
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

B = 128
N = 100
IMG = 256


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl
    from humaniflow_tpu.models.smpl import smpl_vertex_moments

    cfg = get_humaniflow_cfg_defaults()
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    smpl = synthetic_smpl(num_verts=6890)
    proxy = jax.random.normal(jax.random.PRNGKey(1), (B, IMG, IMG, 18))
    key = jax.random.PRNGKey(2)

    results = {}

    encoder = jax.jit(
        lambda p, x: model.encoder.apply(p["encoder"], x, train=False)
    )
    results["encoder"] = timed(encoder, params, proxy)

    @jax.jit
    def model_forward(p, x, k):
        return model.apply(
            p, x, key=k, num_samples=N, use_shape_mode_for_samples=True
        )

    out = jax.block_until_ready(model_forward(params, proxy, key))
    results["model_forward"] = timed(model_forward, params, proxy, key)

    shp = out["shape_samples"].reshape(B * N, -1)
    pose = out["pose_rotmats_samples"].reshape(B * N, 23, 3, 3)
    glob = jnp.broadcast_to(
        out["glob_rotmat"][:, None], (B, N, 3, 3)
    ).reshape(B * N, 3, 3)

    @jax.jit
    def moments_high(shp, pose, glob):
        return smpl_vertex_moments(smpl, shp, pose, glob, num_groups=B)

    results[f"smpl_moments_x{B * N}"] = timed(moments_high, shp, pose, glob)

    print(f"\nB={B} N={N} distribution-inference stage split (TPU)")
    for k, v in results.items():
        print(f"  {k:>22s}: {v:8.2f} ms")

    # ---- scaling check vs the B·N=3200 measurements ----
    # the moments precision ladder is already measured at 3200 bodies
    # (models/pallas_lbs.py table: HIGHEST 7.3 ms / 0.0006 mm, DEFAULT
    # 4.4 ms / 0.64-12 mm unusable, bf16x2/x3 compensation SLOWER from
    # per-dot issue overhead).  What B=128 adds: whether the fused kernel
    # scales linearly to 12,800 bodies (grid 4x) or amortises further.
    t3200 = timed(
        jax.jit(lambda s, p, g: smpl_vertex_moments(
            smpl, s, p, g, num_groups=32)),
        shp[: 32 * N], pose[: 32 * N], glob[: 32 * N],
    )
    print(f"  moments @3200 bodies  : {t3200:8.2f} ms  "
          f"(x4 linear = {4 * t3200:.2f} ms)")


if __name__ == "__main__":
    main()
