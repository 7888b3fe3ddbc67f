"""Train-render cap sweep on TPU: culling × (live_cap, k_max).

Back-face culling roughly halves the binned rasterizer's live candidate
count on body meshes, which lets the live-prefix coefficient gather cap
(`binned_live_cap`, the largest single term of the fused train render —
~31 ms/batch at the r3 defaults) and the per-strip window capacity
(`binned_k_max`) shrink with it.  This sweep measures the fused
synth-data program (pipelines/train.py make_synth_data_fn, B=72, 256² —
the exact training configuration) for each cap combination and reports
overflow, so the shipped defaults are measured, not guessed.

Overflow margins are sized by scripts/profile_overflow_margin.py at the
TRUE training distribution (shape σ=1.25, cam tz ∈ [2, 3], poses to
σ=0.8): live_cap=28672 is the smallest FACE_CHUNK multiple with zero
content (live_cap) drops over 3456 draws; k_max drops only z-occluded
far faces on this z-ordered path (label impact bounded by
tests/test_binned_rasterizer.py::test_binned_agreement_at_training_scale).

Usage:  python scripts/profile_render_caps.py   (runs on the TPU)
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

B = 72
IMG = 256


def timed(fn, *args, n=15):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.models import synthetic_smpl
    from humaniflow_tpu.pipelines.train import make_synth_data_fn
    from humaniflow_tpu.render import TexturedIUVRenderer

    cfg = get_humaniflow_cfg_defaults()
    cfg.TRAIN.BATCH_SIZE = B
    smpl = synthetic_smpl(num_verts=6890)

    rng = np.random.default_rng(0)
    pose = jnp.asarray(rng.normal(scale=0.3, size=(B, 72)), jnp.float32)
    texture = jnp.asarray(rng.uniform(size=(B, 1200, 800, 3)), jnp.float32)
    background = jnp.asarray(rng.uniform(size=(B, IMG, IMG, 3)), jnp.float32)
    k1 = jax.random.PRNGKey(3)

    combos = [
        # r3 shipped defaults (no culling)
        dict(binned_cull=False, binned_live_cap=49152, binned_k_max=896),
        # culling alone
        dict(binned_cull=True, binned_live_cap=49152, binned_k_max=896),
        # culling + tightened caps
        dict(binned_cull=True, binned_live_cap=28672, binned_k_max=640),
        dict(binned_cull=True, binned_live_cap=24576, binned_k_max=512),
        # shipped: smallest zero-content-drop live_cap at the true
        # training distribution (profile_overflow_margin.py)
        dict(binned_cull=True, binned_live_cap=28672, binned_k_max=512),
    ]
    print(f"device: {jax.devices()[0]}  B={B} img={IMG}")
    for kw in combos:
        renderer = TexturedIUVRenderer(
            img_wh=IMG, projection_type="perspective",
            focal_length=cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH, render_rgb=True,
            rasterizer="binned", texture_sampling="face", emit_uv=False,
            **kw,
        )
        synth = make_synth_data_fn(cfg, smpl, renderer)
        dt = timed(lambda s=synth: s(k1, pose, texture, background)["proxy"])
        tag = ("cull" if kw["binned_cull"] else "    ")
        print(
            f"  {tag} live_cap={kw['binned_live_cap']:>6d} "
            f"k_max={kw['binned_k_max']:>4d}: {dt * 1e3:7.2f} ms/batch"
        )


if __name__ == "__main__":
    main()
