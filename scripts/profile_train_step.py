"""Per-stage TPU profiling of the fused training step.

Splits make_train_step's program (pipelines/train_step.py:158-188) into
separately-jitted stages at the training configuration (B=72, 256²) so the
36 ms step time gets the same measured decomposition the synth pipeline has
(scripts/profile_synth_stages.py).  Stage jit boundaries add dispatch
overhead vs the fused program — ratios are what matter.

Stages:
  fwd_model       model.apply with loglik teacher-forcing + 8 j2d samples
  fwd_pose_lp     pose_log_prob on the teacher-forced contexts
  fwd_j2d         SMPL + projection for point-est + 8 sample bodies
  fwd_loss_total  full loss_fn forward (all of the above + loss maths)
  bwd             value_and_grad of loss_fn minus fwd_loss_total
  optim           Adam update + NaN-guard select (step minus value_and_grad)
  step_fused      the shipped fused program (bench.py's step_ms analogue)

Usage:  python scripts/profile_train_step.py  (runs on the TPU)
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


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import optax

    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.losses.humaniflow_loss import humaniflow_loss
    from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl
    from humaniflow_tpu.pipelines.train import make_optimizer
    from humaniflow_tpu.pipelines.train_step import (
        make_train_step,
        predict_joints2d,
    )

    cfg = get_humaniflow_cfg_defaults()
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    smpl = synthetic_smpl(num_verts=6890)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    rotm = np.linalg.qr(rng.normal(size=(B * 24, 3, 3)))[0].astype(np.float32)
    det = np.linalg.det(rotm)
    rotm[det < 0] = -rotm[det < 0]
    batch = {
        "proxy": jnp.asarray(rng.normal(size=(B, IMG, IMG, 18)), jnp.float32),
        "pose_rotmats": jnp.asarray(rotm[: B * 23].reshape(B, 23, 3, 3)),
        "glob_rotmats": jnp.asarray(rotm[B * 23 :].reshape(B, 3, 3)),
        "shape": jnp.asarray(rng.normal(size=(B, 10)), jnp.float32),
        "joints2D": jnp.asarray(rng.uniform(0, IMG, size=(B, 17, 2)), jnp.float32),
        "joints2D_vis": jnp.ones((B, 17), jnp.float32),
    }
    key = jax.random.PRNGKey(3)
    n_samples = cfg.LOSS.NUM_J2D_SAMPLES

    # ---- stage: model forward (teacher-forced loglik + samples + point est)
    @jax.jit
    def fwd_model(params, batch, key):
        return model.apply(
            params, batch["proxy"], key=key,
            compute_point_est=True, num_samples=n_samples,
            compute_for_loglik=True,
            shape_for_loglik=batch["shape"],
            pose_R_for_loglik=batch["pose_rotmats"],
            glob_R_for_loglik=batch["glob_rotmats"],
            train=True,
        )

    out = jax.block_until_ready(fwd_model(params, batch, key))
    t_fwd_model = timed(fwd_model, params, batch, key)

    # ---- stage: pose log-prob on teacher-forced contexts
    ctx = out["pose_flow_contexts_for_loglik"]

    @jax.jit
    def fwd_pose_lp(params, pose_R, ctx):
        return model.pose_log_prob(params, pose_R, ctx)

    t_pose_lp = timed(fwd_pose_lp, params, batch["pose_rotmats"], ctx)

    # ---- stage: j2d heads (point est + samples → SMPL → project)
    @jax.jit
    def fwd_j2d(out, batch):
        pe = predict_joints2d(
            smpl, out["shape_mode"], out["pose_rotmats_point_est"],
            out["glob_rotmat"], out["cam_wp"],
        )
        s = predict_joints2d(
            smpl, out["shape_samples"], out["pose_rotmats_samples"],
            out["glob_rotmat"], out["cam_wp"],
        )
        return jnp.concatenate([pe[:, None], s], axis=1)

    t_j2d = timed(fwd_j2d, out, batch)

    # ---- stage: full loss forward (fused, no grad)
    step = make_train_step(model, smpl, cfg.LOSS, optimizer, img_wh=IMG)

    def loss_only(params, batch, key):
        o = model.apply(
            params, batch["proxy"], key=key,
            compute_point_est=True, num_samples=n_samples,
            compute_for_loglik=True,
            shape_for_loglik=batch["shape"],
            pose_R_for_loglik=batch["pose_rotmats"],
            glob_R_for_loglik=batch["glob_rotmats"],
            train=True,
        )
        pose_lp = model.pose_log_prob(
            params, batch["pose_rotmats"], o["pose_flow_contexts_for_loglik"]
        )
        j2d_pe = predict_joints2d(
            smpl, o["shape_mode"], o["pose_rotmats_point_est"],
            o["glob_rotmat"], o["cam_wp"],
        )
        j2d_s = predict_joints2d(
            smpl, o["shape_samples"], o["pose_rotmats_samples"],
            o["glob_rotmat"], o["cam_wp"],
        )
        pred = {
            "pose_log_probs": pose_lp,
            "shape_mode": o["shape_mode"],
            "shape_log_std": o["shape_log_std"],
            "joints2D": jnp.concatenate([j2d_pe[:, None], j2d_s], axis=1),
            "glob_rotmats": o["glob_rotmat"],
        }
        target = {
            "shape_params": batch["shape"],
            "joints2D": batch["joints2D"],
            "joints2D_vis": batch["joints2D_vis"],
            "glob_rotmats": batch["glob_rotmats"],
        }
        total, _ = humaniflow_loss(cfg.LOSS, IMG, pred, target)
        return total

    loss_j = jax.jit(loss_only)
    t_loss_fwd = timed(loss_j, params, batch, key)

    vag = jax.jit(lambda p, b, k: jax.value_and_grad(loss_only)(p, b, k))
    t_vag = timed(vag, params, batch, key)

    step_j = jax.jit(step)
    t_step = timed(step_j, params, opt_state, batch, key)

    flops = None
    try:
        cost = step_j.lower(params, opt_state, batch, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass

    print(f"device: {jax.devices()[0]}")
    print(f"B={B}, img={IMG}, j2d samples={n_samples}")
    print(f"fwd_model        {t_fwd_model * 1e3:7.2f} ms")
    print(f"fwd_pose_lp      {t_pose_lp * 1e3:7.2f} ms")
    print(f"fwd_j2d          {t_j2d * 1e3:7.2f} ms   ({(1 + n_samples) * B} SMPL bodies)")
    print(f"fwd_loss_total   {t_loss_fwd * 1e3:7.2f} ms")
    print(f"value_and_grad   {t_vag * 1e3:7.2f} ms   (bwd ≈ {(t_vag - t_loss_fwd) * 1e3:.2f} ms)")
    print(f"step_fused       {t_step * 1e3:7.2f} ms   (optim+guard ≈ {(t_step - t_vag) * 1e3:.2f} ms)")
    if flops:
        print(f"step flops       {flops / 1e9:7.1f} GFLOP  → ideal bf16 ≈ {flops / 197e12 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
