"""Overflow-margin sweep for the culled train-render caps on TPU.

The tightened caps (`binned_live_cap=24576, binned_k_max=512`,
scripts/run_train.py) were originally stress-tested at σ=0.8 poses — but
the synth pipeline samples its OWN shapes at SHAPE_STD=1.25 and camera
tz ∈ [2.0, 3.0] (configs/defaults.py), so the binding margin is set by
the shape/camera draws inside `make_synth_data_fn`, not the pose input.
This sweep sizes each cap against that true distribution by isolating
the overflow sources (binned_rasterizer._bin_faces):

  * k_max   — per-strip window; z-ordered near-to-far, so its overflow
              drops only the FARTHEST (occluded) faces.  Probed with
              live_cap huge.
  * live_cap — prefix coefficient gather; the sort is strip-major, so
              its overflow drops ALL content in the BOTTOM image strips
              (visible artifacts).  Probed with k_max huge.
  * tall/row_cand — faces spanning >6 row-strips.  Probed with both huge.

Each probe runs N_BATCH fresh synth batches (B=72 → thousands of
shape/cam draws) at training-like (σ=0.3) and harder-than-training
(σ=0.8) pose inputs and reports the total and max per-batch overflow.

Usage:  python scripts/profile_overflow_margin.py   (runs on the TPU)
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
N_BATCH = 24
BIG_LIVE = 98304
BIG_K = 1536


def main():
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.models import synthetic_smpl
    from humaniflow_tpu.pipelines.train import make_synth_data_fn
    from humaniflow_tpu.render import TexturedIUVRenderer

    cfg = get_humaniflow_cfg_defaults()
    cfg.TRAIN.BATCH_SIZE = B
    smpl = synthetic_smpl(num_verts=6890)

    rng = np.random.default_rng(0)
    texture = jnp.asarray(rng.uniform(size=(B, 1200, 800, 3)), jnp.float32)
    background = jnp.asarray(rng.uniform(size=(B, IMG, IMG, 3)), jnp.float32)
    poses = {
        sig: jnp.asarray(rng.normal(scale=sig, size=(B, 72)), jnp.float32)
        for sig in (0.3, 0.8)
    }

    combos = [
        ("tall only", BIG_LIVE, BIG_K),
        ("k_max 384", BIG_LIVE, 384),
        ("k_max 512", BIG_LIVE, 512),
        ("k_max 640", BIG_LIVE, 640),
        ("k_max 896", BIG_LIVE, 896),
        ("live 16384", 16384, BIG_K),
        ("live 20480", 20480, BIG_K),
        ("live 24576", 24576, BIG_K),
        ("live 28672", 28672, BIG_K),
        ("live 32768", 32768, BIG_K),
        ("shipped 24576/512", 24576, 512),
    ]
    print(f"device: {jax.devices()[0]}  B={B} img={IMG} batches={N_BATCH}")
    for tag, live, k in combos:
        renderer = TexturedIUVRenderer(
            img_wh=IMG, projection_type="perspective",
            focal_length=cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH, render_rgb=True,
            rasterizer="binned", texture_sampling="face", emit_uv=False,
            binned_cull=True, binned_live_cap=live, binned_k_max=k,
            emit_overflow=True,
        )
        synth = make_synth_data_fn(cfg, smpl, renderer)
        for sig, pose in poses.items():
            t0 = time.perf_counter()
            ovs = []
            for i in range(N_BATCH):
                out = synth(jax.random.PRNGKey(i), pose, texture, background)
                ovs.append(out["binning_overflow"])
            ovs = np.asarray(jax.device_get(jnp.stack(ovs)))
            dt = (time.perf_counter() - t0) / N_BATCH
            print(
                f"  {tag:>18s} σ={sig}: total={int(ovs.sum()):>7d} "
                f"max/batch={int(ovs.max()):>6d} nonzero={int((ovs > 0).sum()):>2d}/{N_BATCH}"
                f"  ({dt * 1e3:6.1f} ms/batch)"
            )


if __name__ == "__main__":
    main()
