"""CLI cold-start split on TPU: where the first protocol batch's ~25-45 s go.

Every CLI invocation is a fresh process, so the first eval batch pays
(a) imports + model init, (b) TRACING the jitted eval step (pure host
Python on this 1-core box), (c) XLA compile — a persistent-cache
deserialization when warm — and (d) the first execution's device transfer
through the tunnel.  This script measures each stage explicitly with
jit's AOT path (.lower() = trace, .compile() = compile/cache-load) at the
3DPW protocol configuration (B=32, 256², N=10), using the same persistent
cache the CLIs use (utils/compile_cache.py), so "warm cache" here means
exactly what a second CLI invocation sees.

Run twice: the first run populates the cache (its compile stage is the
cold number), the second measures the warm split.

Usage:  python scripts/profile_cold_start.py   (runs on the TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.perf_counter()

import jax
import jax.numpy as jnp
import numpy as np

t_import_jax = time.perf_counter() - T0

from humaniflow_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

B = 32
IMG = 256
N_SAMPLES = 10


def main():
    print(f"  import jax           : {t_import_jax:7.2f} s", flush=True)
    t0 = time.perf_counter()
    dev = jax.devices()[0]
    t_devices = time.perf_counter() - t0
    print(f"  jax.devices() [axon] : {t_devices:7.2f} s   (plugin + tunnel)", flush=True)

    t0 = time.perf_counter()
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl
    from humaniflow_tpu.pipelines.evaluate import make_eval_step
    t_import_pkg = time.perf_counter() - t0
    print(f"  import humaniflow_tpu: {t_import_pkg:7.2f} s", flush=True)

    cfg = get_humaniflow_cfg_defaults()
    model = HumaniflowModel(cfg.MODEL)
    t0 = time.perf_counter()
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    t_model_init = time.perf_counter() - t0
    print(f"  model.init           : {t_model_init:7.2f} s", flush=True)
    t0 = time.perf_counter()
    smpl_n = synthetic_smpl(num_verts=6890, seed=0)
    smpl_m = synthetic_smpl(num_verts=6890, seed=1)
    smpl_f = synthetic_smpl(num_verts=6890, seed=2)
    t_smpl = time.perf_counter() - t0
    print(f"  synthetic_smpl x3    : {t_smpl:7.2f} s", flush=True)
    t_init = time.perf_counter() - T0
    print(f"  imports + model init : {t_init:7.2f} s  (total to here)", flush=True)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            (rng.uniform(size=(B, IMG, IMG, 3)) * 255).astype(np.uint8)
        ),
        "input_joints2D": jnp.asarray(
            rng.uniform(0, IMG, size=(B, 17, 2)).astype(np.float32)
        ),
        "input_joints2D_vis": jnp.ones((B, 17), bool),
        "pose": jnp.asarray(rng.normal(scale=0.3, size=(B, 72)), jnp.float32),
        "shape": jnp.asarray(rng.normal(scale=0.5, size=(B, 10)), jnp.float32),
        "is_female": jnp.asarray(np.arange(B) % 2, jnp.float32),
    }
    jax.block_until_ready(batch["image"])
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    step = make_eval_step(
        model, smpl_n, smpl_m, smpl_f, cfg,
        num_pred_samples=N_SAMPLES, compute_samples=True, compute_joints2d=True,
    )
    lowered = step.lower(params, batch, key)
    t_trace = time.perf_counter() - t0
    print(f"  trace (.lower)       : {t_trace:7.2f} s   (host Python)", flush=True)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"  compile (.compile)   : {t_compile:7.2f} s   (warm = cache load)", flush=True)

    t0 = time.perf_counter()
    out = compiled(params, batch, key)
    jax.block_until_ready(out)
    t_first = time.perf_counter() - t0
    print(f"  first execution      : {t_first:7.2f} s   (incl. input transfer)", flush=True)

    t0 = time.perf_counter()
    out = compiled(params, batch, key)
    jax.block_until_ready(out)
    t_steady = time.perf_counter() - t0

    # the metric kernel's first two batches (batch 1 pays eval_shape key
    # discovery + the packed _update_step trace+compile; batch 2 is the
    # steady state — metrics/eval_metrics.py.  evaluate_humaniflow hides
    # batch 1's cost behind the eval-step compile via tracker.warm_async;
    # this script measures the UNOVERLAPPED cost of each stage.)
    from humaniflow_tpu.metrics.eval_metrics import EvalMetricsTracker
    from humaniflow_tpu.pipelines.protocols import EVAL_METRICS_3DPW

    tracker = EvalMetricsTracker(
        list(EVAL_METRICS_3DPW),
        num_samples_for_prob_metrics=N_SAMPLES, sync_every=100,
    )
    pred, target, proxy, extra = out
    # the eval loop injects the dataset's 2D-keypoint targets host-side
    # (pipelines/evaluate.py) — mirror that for the J2D metrics
    target = dict(target)
    target["joints2D"] = jnp.asarray(
        rng.uniform(0, IMG, size=(B, 17, 2)).astype(np.float32)
    )
    target["joints2D_vis"] = jnp.ones((B, 17), bool)
    t0 = time.perf_counter()
    tracker.update_per_batch(pred, target, B, model_input=proxy)
    jax.block_until_ready(tracker._dev_sums)
    t_metric1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    tracker.update_per_batch(pred, target, B, model_input=proxy)
    jax.block_until_ready(tracker._dev_sums)
    t_metric2 = time.perf_counter() - t0

    print(f"device: {jax.devices()[0]}  B={B} img={IMG} N={N_SAMPLES}")
    print(f"  imports + model init : {t_init:7.2f} s")
    print(f"  trace (.lower)       : {t_trace:7.2f} s   (host Python)")
    print(f"  compile (.compile)   : {t_compile:7.2f} s   (warm = cache load)")
    print(f"  first execution      : {t_first:7.2f} s   (incl. input transfer)")
    print(f"  steady execution     : {t_steady:7.2f} s")
    print(f"  metric batch 1 (warm): {t_metric1:7.2f} s   (trace+compile)")
    print(f"  metric batch 2 (stdy): {t_metric2:7.2f} s   (trace+compile)")
    total = t_init + t_trace + t_compile + t_first + t_metric1 + t_metric2
    print(f"  -> cold-start total  : {total:7.2f} s")


if __name__ == "__main__":
    main()
