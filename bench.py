"""Benchmarks: distribution inference (headline) + full training step.

Headline: 100-sample pose/shape distribution inference per image — the
reference's flagship capability (predict/predict_humaniflow.py with
num_samples, README.md:88) run as ONE jitted graph: proxy → HumaniflowModel
(point estimate + N=100 hierarchical samples) → SMPL vertices for every
sample → per-vertex directional variance.  The reference does this as a
per-image Python loop over pyro distribution objects at batch size 1; here
it is a single compiled XLA program at batch 32.

Also measured (reported in "detail"): the full training iteration at the
reference's batch size 72 — jitted synthetic-data generation (SMPL →
perspective IUV/RGB render → crop → augment → Canny → heatmaps, reference
train_humaniflow.py:113-245) plus the fused forward/loss/backward/update
step — as steps/sec, images/sec, and an MFU estimate from XLA-counted FLOPs
against the chip's bf16 peak.

vs_baseline: the reference repo publishes NO benchmark numbers
(BASELINE.md) and torch cannot run this workload on a TPU chip, so there is
no measured reference baseline — reported as null rather than a fabricated
ratio.  The analytic anchor: one 100-sample inference image is ~3.0 GFLOP
(ResNet-18@256² ≈ 2.7 GFLOP + 100×(flow+LBS) ≈ 0.3 GFLOP), so 1,500 img/s
≈ 4.5 TFLOP/s sustained.

Prints one JSON line.
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
TRAIN_BATCH = 72  # reference train batch (humaniflow_config.py:39)

# TPU v5e peak: 197 TFLOP/s bf16 (394 TOPS int8).  MFU below is against the
# bf16 peak — an under-estimate wherever XLA runs f32 passes.
PEAK_FLOPS = {"v5e": 197e12, "v5litepod": 197e12, "v4": 275e12, "v6e": 918e12}


def _device_peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    for k, v in PEAK_FLOPS.items():
        if k in kind:
            return v
    return 197e12


def _timed(fn, *args, n_iters=50, key_arg=None):
    """Amortized queued timing (axon tunnel: per-call dispatch overhead is
    ~6 ms at 10 queued calls but ~0.5 ms at 100 — docs/DESIGN.md)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iters


def _compiled_flops(jitted, *args) -> float:
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _make_distribution_inference(model, smpl):
    """The ONE measured distribution-inference program, shared by the
    headline (B=32), max-throughput (B=128) and single-image-latency (B=1)
    benchmarks so they can never silently diverge."""
    from humaniflow_tpu.models import smpl_forward
    from humaniflow_tpu.models.smpl import smpl_vertex_moments

    @jax.jit
    def distribution_inference(params, proxy, key):
        out = model.apply(
            params, proxy, key=key, num_samples=NUM_SAMPLES,
            use_shape_mode_for_samples=True,
        )
        b = proxy.shape[0]
        # per-image (Σx, Σx²) over the N samples, reduced IN the fused SMPL
        # Pallas kernel — the (B·N, 3, V) sample-vertex tensor (265 MB)
        # never reaches HBM.  One-pass E[x²]−E[x]² (uncertainty map: the
        # ~1e-4 relative cancellation loss at f32 is far below colormap
        # resolution).
        mom = smpl_vertex_moments(
            smpl,
            out["shape_samples"].reshape(b * NUM_SAMPLES, -1),
            out["pose_rotmats_samples"].reshape(b * NUM_SAMPLES, 23, 3, 3),
            jnp.broadcast_to(
                out["glob_rotmat"][:, None], (b, NUM_SAMPLES, 3, 3)
            ).reshape(b * NUM_SAMPLES, 3, 3),
            num_groups=b,
        )
        s1 = mom[:, 0] / NUM_SAMPLES
        s2 = mom[:, 1] / NUM_SAMPLES
        vertex_var = jnp.maximum(s2 - s1 * s1, 0.0).sum(axis=1)  # (B, V)
        point_est = smpl_forward(
            smpl, out["shape_mode"], out["pose_rotmats_point_est"], out["glob_rotmat"]
        )
        return point_est["vertices"], vertex_var

    return distribution_inference


def bench_inference(cfg, model, params, smpl):
    from humaniflow_tpu.models.smpl import smpl_vertex_moments

    distribution_inference = _make_distribution_inference(model, smpl)

    proxy = jax.random.normal(jax.random.PRNGKey(1), (BATCH, IMG, IMG, 18))
    key = jax.random.PRNGKey(2)
    dt = _timed(lambda: distribution_inference(params, proxy, key), n_iters=50)
    flops = _compiled_flops(distribution_inference, params, proxy, key)

    # ---- roofline companion: the headline MFU is low by construction, not
    # by inefficiency — decompose the batch into its three dominant
    # sub-programs and time each standalone.  The SMPL stage runs its dots
    # at Precision.HIGHEST (6 bf16 MXU passes per dot — the validated
    # accuracy floor, models/pallas_lbs.py precision table: DEFAULT is
    # 0.64-12 mm of vertex error), so its *attainable* MFU against the
    # 1-pass bf16 peak is ≤ 1/6 before counting K-padding (K = 10/24/207
    # vs the 128-wide systolic dimension).  stage_ms makes the split
    # measured evidence instead of DESIGN.md prose.
    @jax.jit
    def model_forward(params, proxy, key):
        return model.apply(
            params, proxy, key=key, num_samples=NUM_SAMPLES,
            use_shape_mode_for_samples=True,
        )

    out = jax.block_until_ready(model_forward(params, proxy, key))
    shp = out["shape_samples"].reshape(BATCH * NUM_SAMPLES, -1)
    pose = out["pose_rotmats_samples"].reshape(BATCH * NUM_SAMPLES, 23, 3, 3)
    glob = jnp.broadcast_to(
        out["glob_rotmat"][:, None], (BATCH, NUM_SAMPLES, 3, 3)
    ).reshape(BATCH * NUM_SAMPLES, 3, 3)

    @jax.jit
    def moments_stage(shp, pose, glob):
        # SMPL vertices for all B·N samples + per-image (Σx, Σx²) reduced
        # in-kernel (models/pallas_lbs.py smpl_verts_moments_fused)
        return smpl_vertex_moments(smpl, shp, pose, glob, num_groups=BATCH)

    stage_ms = {
        "model_forward": _timed(lambda: model_forward(params, proxy, key)) * 1e3,
        "smpl_moments_x3200": _timed(lambda: moments_stage(shp, pose, glob)) * 1e3,
    }
    return {
        "images_per_sec": BATCH / dt,
        "latency_ms_per_batch": dt * 1000,
        "flops_per_batch": flops,
        "mfu_bf16_peak": flops / dt / _device_peak_flops() if flops else None,
        "stage_ms": {k: round(v, 2) for k, v in stage_ms.items()},
        # the SMPL stage's dots run 6 bf16 passes per nominal FLOP
        # (Precision.HIGHEST) — its MFU ceiling against the 1-pass peak
        "smpl_precision_passes": 6,
    }


def bench_inference_large_batch(cfg, model, params, smpl, batch=128):
    """Throughput-optimal serving batch: the SAME distribution-inference
    program at B=128 amortises the flow stack's issue-bound small ops over
    more images (measured +13% img/s over B=32 on v5e).  Reported in
    detail; the headline stays at B=32 for cross-round comparability."""
    distribution_inference = _make_distribution_inference(model, smpl)

    proxy = jax.random.normal(jax.random.PRNGKey(5), (batch, IMG, IMG, 18))
    key = jax.random.PRNGKey(6)
    dt = _timed(lambda: distribution_inference(params, proxy, key), n_iters=20)
    return {
        "batch": batch,
        "images_per_sec": batch / dt,
        "latency_ms_per_batch": dt * 1000,
    }


def bench_train(cfg, model, params, smpl):
    """Full training iteration: jitted synth-data gen + fused train step."""
    import optax

    from humaniflow_tpu.pipelines.train import make_synth_data_fn
    from humaniflow_tpu.pipelines.train_step import make_train_step
    from humaniflow_tpu.render import TexturedIUVRenderer

    cfg.TRAIN.BATCH_SIZE = TRAIN_BATCH
    renderer = TexturedIUVRenderer(
        img_wh=IMG, projection_type="perspective",
        focal_length=cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH, render_rgb=True,
        # training-data renders: binned kernel + per-face pre-lit texels,
        # no UV planes, back-face culling (same configuration as
        # scripts/run_train.py defaults — culling is exact for closed
        # SMPL meshes, tests/test_binned_rasterizer.py)
        rasterizer="binned", texture_sampling="face", emit_uv=False,
        binned_cull=True,
        # tightened caps admitted by culling (scripts/run_train.py defaults;
        # sized at the true training distribution by
        # scripts/profile_overflow_margin.py — zero content drops)
        binned_live_cap=28672, binned_k_max=512, emit_overflow=True,
    )
    synth = make_synth_data_fn(cfg, smpl, renderer)
    from humaniflow_tpu.pipelines.train import make_optimizer

    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(model, smpl, cfg.LOSS, optimizer, img_wh=IMG))

    rng = np.random.default_rng(0)
    pose = jnp.asarray(rng.normal(scale=0.3, size=(TRAIN_BATCH, 72)), jnp.float32)
    texture = jnp.asarray(rng.uniform(size=(TRAIN_BATCH, 1200, 800, 3)), jnp.float32)
    background = jnp.asarray(
        rng.uniform(size=(TRAIN_BATCH, IMG, IMG, 3)), jnp.float32
    )
    k1, k2 = jax.random.PRNGKey(3), jax.random.PRNGKey(4)

    def full_iter(params, opt_state):
        batch = synth(k1, pose, texture, background)
        batch.pop("rgb_in")
        batch.pop("binning_overflow", None)
        return step(params, opt_state, batch, k2)

    # warmup/compile both programs
    p, o, m = full_iter(params, opt_state)
    jax.block_until_ready(m["total"])

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        p, o, m = full_iter(p, o)
    jax.block_until_ready(m["total"])
    dt = (time.perf_counter() - t0) / n_iters

    # stage split: synth alone (same amortized timing)
    dt_synth = _timed(
        lambda: synth(k1, pose, texture, background)["proxy"], n_iters=10
    )

    batch = synth(k1, pose, texture, background)
    batch.pop("rgb_in")
    batch.pop("binning_overflow", None)
    step_flops = _compiled_flops(step, params, opt_state, batch, k2)
    synth_flops = _compiled_flops(synth, k1, pose, texture, background)
    flops = step_flops + synth_flops
    return {
        "steps_per_sec": 1.0 / dt,
        "images_per_sec": TRAIN_BATCH / dt,
        "iter_ms": dt * 1000,
        "synth_ms": dt_synth * 1000,
        "step_ms": (dt - dt_synth) * 1000,
        "flops_per_iter": flops,
        "mfu_bf16_peak": flops / dt / _device_peak_flops() if flops else None,
    }


def bench_hrnet():
    """Batched HRNet-W48 keypoint detection at the reference input size
    (384×288): the heaviest conv stack in the system (SURVEY.md §3.1),
    jitted with normalisation + keypoint decode fused in."""
    import importlib

    from humaniflow_tpu.models.hrnet import PoseHighResolutionNet

    ph = importlib.import_module("humaniflow_tpu.pipelines.predict_hrnet")
    # bf16 conv compute — the predict CLI default (params/BN stay f32;
    # 302.8 -> 613.2 img/s at B=16, docs/DESIGN.md "HRNet-W48 throughput")
    hrnet = PoseHighResolutionNet(dtype=jnp.bfloat16)
    params = hrnet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 384, 288, 3)), train=False
    )
    forward = ph._hrnet_forward_fn(hrnet)
    b = 16
    crops = jax.random.uniform(jax.random.PRNGKey(1), (b, 384, 288, 3))
    dt = _timed(lambda: forward(params, crops), n_iters=20)
    flops = _compiled_flops(forward, params, crops)
    return {
        "batch": b,
        "images_per_sec": b / dt,
        "latency_ms_per_batch": dt * 1000,
        "mfu_bf16_peak": flops / dt / _device_peak_flops() if flops else None,
    }


class _SynthEvalDataset:
    """SSP-3D-shaped synthetic payload (uint8 image + keypoints + GT pose/
    shape/silhouette) for the protocol benchmark — matches the real
    datasets' host→device format (data/datasets.py)."""

    def __init__(self, n, img=IMG):
        self.n = n
        self.img = img

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        sil = np.zeros((self.img, self.img), np.uint8)
        sil[64:192, 80:176] = 1
        return {
            "pose": rng.normal(scale=0.3, size=72).astype(np.float32),
            "shape": rng.normal(scale=0.5, size=10).astype(np.float32),
            "joints2D": rng.uniform(0, self.img, size=(17, 2)).astype(np.float32),
            "joints2D_visib": np.ones(17, bool),
            "fname": f"frame_{i:04d}.png",
            "gender": "f" if i % 2 else "m",
            "image": (rng.uniform(size=(self.img, self.img, 3)) * 255).astype(np.uint8),
            "input_joints2D": rng.uniform(
                0, self.img, size=(17, 2)
            ).astype(np.float32),
            "input_joints2D_vis": np.ones(17, bool),
            "silhouette": sil,
        }


def bench_eval_protocol(cfg, model, params, protocol="ssp3d"):
    """The shipped distribution-eval protocols (reference
    evaluate/evaluate_humaniflow.py:18-286): images/sec end-to-end through
    the tunneled TPU, on synthetic dataset-shaped data.

    - "ssp3d": full metric list incl. silhouette-IOU + per-sample
      silhouettesamples-IOU at N=100 (the silhouette-render-heavy one).
    - "3dpw": PVE/MPJPE point + samples_min + J2D + diversity metrics at
      N=10 — no silhouettes (reference `-D 3dpw -N 10`)."""
    from humaniflow_tpu.models import synthetic_smpl
    from humaniflow_tpu.pipelines.evaluate import evaluate_humaniflow
    from humaniflow_tpu.pipelines.protocols import (
        EVAL_METRICS_3DPW,
        EVAL_METRICS_SSP3D,
    )
    from humaniflow_tpu.render import TexturedIUVRenderer

    metrics, n_samples = (
        (EVAL_METRICS_SSP3D, NUM_SAMPLES)
        if protocol == "ssp3d"
        else (EVAL_METRICS_3DPW, 10)
    )
    smpl_n = synthetic_smpl(num_verts=NUM_VERTS, seed=0)
    smpl_m = synthetic_smpl(num_verts=NUM_VERTS, seed=1)
    smpl_f = synthetic_smpl(num_verts=NUM_VERTS, seed=2)
    renderer = TexturedIUVRenderer(
        img_wh=IMG, projection_type="orthographic", render_rgb=False,
    )
    # evaluate_humaniflow builds its jits per call (once per CLI
    # invocation in real use), so the first batch of a run is dominated by
    # host tracing + cache-hit compilation — and that overhead varies by
    # tens of seconds through the tunneled device, so subtracting two runs
    # is noise.  Instead the pipeline records per-batch wall times over
    # ≥13 measured batches; steady state = (n−1 batches)/Σ times[1:]
    # (≥12-batch reproducibility rule, docs/DESIGN.md "Measurement
    # methodology").
    #
    # The HEADLINE number uses pre_stage=True (dataset resident in HBM,
    # drain of the deferred-sync tail folded into the last batch): it
    # measures the protocol pipeline the framework owns — on a production
    # TPU host the PCIe link does not bottleneck this workload, but the
    # benchmark environment's network-tunneled device moves bulk
    # host→device data at a rate that varies ~10× run-to-run, which made
    # the streamed number irreproducible (74 vs 195 img/s across driver
    # rounds).  The streamed end-to-end number — which INCLUDES that
    # tunnel transfer — is reported alongside as *_streamed.
    # warmup: trace + compile(-cache-load) the eval step OUTSIDE the timed
    # run.  The jitted step is memoized across evaluate calls
    # (pipelines/evaluate._EVAL_STEP_CACHE), so the timed run below pays
    # neither tracing nor the asynchronous executable load that otherwise
    # lands in whichever batch first blocks (25-45 s/run, docs/DESIGN.md)
    warmup_t = []
    evaluate_humaniflow(
        model, params, smpl_n, smpl_m, smpl_f, cfg,
        # 2 batches: batch 1 traces the dict-output metric kernel (key
        # discovery), batch 2 the fused packed kernel — both compiled
        # before the timed run
        _SynthEvalDataset(2 * BATCH), list(metrics),
        batch_size=BATCH, num_pred_samples=n_samples, renderer=renderer,
        batch_times=warmup_t,
    )
    # first-batch decomposition: what of warmup_t[0] was the eval-step /
    # metric-kernel build, and whether each came from the persistent
    # EXECUTABLE cache (deserialize — what a repeat CLI invocation pays)
    # or a fresh trace+compile (first-ever run at this code state)
    from humaniflow_tpu.utils import aot_cache

    first_batch_split = {
        k: {
            "event": v.get("event"),
            "seconds": round(float(v.get("seconds", 0.0)), 2),
        }
        for k, v in aot_cache.STATS.items()
        if k in ("eval_step", "metric_update")
    }

    # sync_every > n_batches: the timed window holds dispatches + the
    # device-compute drain only; the single metrics fetch (one tunnel
    # RTT whose 0.2-0.7 s jitter dominated run-to-run spread) lands in
    # the untimed final reduction — a fixed per-run cost that amortizes
    # to zero over a real dataset (the CLI default stays sync_every=8
    # for operator-visible overflow warnings)
    # 3 timed repeats, median by total wall, for BOTH protocols: the
    # residual per-run noise is a 0-0.6 s tunnel-completion-ack jitter on
    # the drain, so a single draw can still spread ~2x; the median of 3 is
    # stable across driver runs (each repeat costs ~1 s at 3DPW scale,
    # ~35 s at SSP-3D scale — the honest median is worth the 35 s)
    n_batches = 27 if protocol == "3dpw" else 14
    n_repeats = 3
    runs = []
    for _ in range(n_repeats):
        times = []
        evaluate_humaniflow(
            model, params, smpl_n, smpl_m, smpl_f, cfg,
            _SynthEvalDataset(n_batches * BATCH), list(metrics),
            batch_size=BATCH, num_pred_samples=n_samples, renderer=renderer,
            batch_times=times, pre_stage=True, sync_every=n_batches + 1,
        )
        runs.append(times)
    runs.sort(key=lambda t: float(np.sum(t[1:])))
    times = runs[(len(runs) - 1) // 2]  # median of 3
    steady = float(np.sum(times[1:]) / (len(times) - 1))

    # secondary: streamed (host assembly + tunnel transfer on the clock);
    # same jitted programs (persistent compile cache), fewer batches
    times_s = []
    evaluate_humaniflow(
        model, params, smpl_n, smpl_m, smpl_f, cfg,
        _SynthEvalDataset(7 * BATCH), list(metrics),
        batch_size=BATCH, num_pred_samples=n_samples, renderer=renderer,
        batch_times=times_s,
    )
    steady_s = float(np.sum(times_s[1:]) / (len(times_s) - 1))
    return {
        "images_per_sec": BATCH / steady,
        "sec_per_batch": steady,
        "sec_per_batch_median": round(float(np.median(times[1:])), 4),
        "num_batches_measured": len(times) - 1,
        "first_batch_sec": round(warmup_t[0], 2),
        "first_batch_split": first_batch_split,
        "images_per_sec_streamed": round(BATCH / steady_s, 2),
        "streamed_note": "includes host->device transfer over the "
        "benchmark tunnel (bandwidth varies ~10x run-to-run)",
        "num_pred_samples": n_samples,
        "metrics": f"{protocol} protocol (pipelines/protocols.py)",
    }


def bench_optimise(cfg, model, params, smpl):
    """Flow-prior-guided refinement (reference
    optimise/optimise_humaniflow.py:72-137): the full 81-iteration SGD loop
    over (pose, glob, shape, cam) as ONE jitted fori_loop, batch 32.  Each
    iteration is a fwd+bwd through SMPL + the conditional-flow log-prob, so
    the loop is ~162 model+SMPL passes per batch."""
    from humaniflow_tpu.configs import get_optimise_cfg_defaults
    from humaniflow_tpu.pipelines.optimise import make_optimise_fn

    b = 32
    ocfg = get_optimise_cfg_defaults()
    rng = np.random.default_rng(5)
    init = {
        "shape": jnp.asarray(rng.normal(scale=0.5, size=(b, 10)), jnp.float32),
        "pose_axisangle": jnp.asarray(
            rng.normal(scale=0.2, size=(b, 23, 3)), jnp.float32
        ),
        "glob_axisangle": jnp.asarray(
            rng.normal(scale=0.2, size=(b, 3)), jnp.float32
        ),
        "cam_wp": jnp.tile(jnp.asarray([[0.9, 0.0, 0.2]], jnp.float32), (b, 1)),
        "input_feats": jax.random.normal(
            jax.random.PRNGKey(6), (b, model.feat_dim)
        ),
        "joints2D": jnp.asarray(
            rng.uniform(64, 192, size=(b, 17, 2)), jnp.float32
        ),
        "joints2D_conf": jnp.ones((b, 17), jnp.float32),
    }

    # build (and trace) the jitted 81-iteration program ONCE — per-batch
    # calls then measure device time, not the multi-second re-trace
    optimise_fn = make_optimise_fn(model, smpl, ocfg, img_wh=IMG)

    def run():
        return optimise_fn(params, init)["shape"]

    dt = _timed(run, n_iters=5)
    return {
        "batch": b,
        "num_iters": ocfg.NUM_ITERS,
        "images_per_sec": b / dt,
        "latency_ms_per_batch": dt * 1000,
        "latency_ms_per_iter": dt * 1000 / ocfg.NUM_ITERS,
    }


def main():
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl

    cfg = get_humaniflow_cfg_defaults()
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    smpl = synthetic_smpl(num_verts=NUM_VERTS)

    inf = bench_inference(cfg, model, params, smpl)
    try:
        inf_b128 = bench_inference_large_batch(cfg, model, params, smpl)
    except Exception as e:
        inf_b128 = {"error": f"{type(e).__name__}: {e}"}
    try:
        # BASELINE.md's named serving metric: single-image 100-sample latency
        inf_b1 = bench_inference_large_batch(cfg, model, params, smpl, batch=1)
        inf_b1 = {"latency_1img_100samples_ms": round(
            inf_b1["latency_ms_per_batch"], 2
        )}
    except Exception as e:
        inf_b1 = {"error": f"{type(e).__name__}: {e}"}
    try:
        train = bench_train(cfg, model, params, smpl)
    except Exception as e:  # train bench must never take down the headline
        train = {"error": f"{type(e).__name__}: {e}"}
    try:
        hrnet = bench_hrnet()
    except Exception as e:
        hrnet = {"error": f"{type(e).__name__}: {e}"}
    try:
        optimise = bench_optimise(cfg, model, params, smpl)
    except Exception as e:
        optimise = {"error": f"{type(e).__name__}: {e}"}
    try:
        eval_protocol = bench_eval_protocol(cfg, model, params)
    except Exception as e:
        eval_protocol = {"error": f"{type(e).__name__}: {e}"}
    try:
        eval_3dpw = bench_eval_protocol(cfg, model, params, protocol="3dpw")
    except Exception as e:
        eval_3dpw = {"error": f"{type(e).__name__}: {e}"}

    detail = {
        "batch": BATCH,
        "num_samples": NUM_SAMPLES,
        "latency_ms_per_batch": round(inf["latency_ms_per_batch"], 2),
        "inference_mfu_bf16_peak": (
            round(inf["mfu_bf16_peak"], 4) if inf.get("mfu_bf16_peak") else None
        ),
        "inference_stage_ms": inf.get("stage_ms"),
        "smpl_precision_passes": inf.get("smpl_precision_passes"),
        "inference_max_throughput": {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in inf_b128.items()
        },
        "inference_single_image": inf_b1,
        "train": {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in train.items()
        },
        "hrnet": {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in hrnet.items()
        },
        "optimise": {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in optimise.items()
        },
        "eval_ssp3d_protocol": {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in eval_protocol.items()
        },
        "eval_3dpw_protocol": {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in eval_3dpw.items()
        },
        "device": str(jax.devices()[0]),
    }
    print(
        json.dumps(
            {
                "metric": "distribution_inference_100samples",
                "value": round(inf["images_per_sec"], 2),
                "unit": "images/sec/chip",
                # no published reference baseline exists (BASELINE.md);
                # see module docstring for the analytic FLOP anchor
                "vs_baseline": None,
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
