"""Evaluation metrics tracker: point-estimate, distribution-accuracy,
sample-consistency and sample-diversity metrics.

Capability parity with reference `metrics/eval_metrics_tracker.py:8-502`
(same metric names, same definitions, same mm conversion and per-frame npy
dumps), redesigned for TPU: all per-batch metric math — including the
Procrustes/scale-translation alignments and min-over-samples reductions —
runs as ONE jitted on-device function (`compute_batch_metrics`); the host
only accumulates scalar sums.  The reference moves every batch to numpy and
loops metric by metric (:119-433).

Metric families (reference docstring :9-37):
* point estimates:  PVE[-SC|-PA], PVE-T[-SC], MPJPE[-SC|-PA], joints2D-L2E,
  silhouette-IOU (+ input_* variants scored against HRNet inputs)
* distribution accuracy:  <metric>_samples_min (min over N samples)
* sample-input consistency:  joints2Dsamples-L2E, silhouettesamples-IOU
* sample diversity:  verts3D/joints3D[_vis|_invis]_sample_diversity
"""

import os
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.label_conversions import convert_heatmaps_to_2d_joints_coordinates
from ..ops.alignment import (
    procrustes_analysis_batch,
    scale_and_translation_transform_batch,
)


def _l2(a, b):
    return jnp.linalg.norm(a - b, axis=-1)


def _min_over_samples(err_per_sample):
    """(B, N, P) errors → (B, P) of the best sample (argmin of per-sample
    mean, reference :203-204)."""
    best = jnp.argmin(jnp.mean(err_per_sample, axis=-1), axis=-1)  # (B,)
    return jnp.take_along_axis(err_per_sample, best[:, None, None], axis=1)[:, 0]


def _flat_align(align_fn, pred_samples, target):
    """Apply a (B, P, 3)-batched alignment over a samples axis."""
    b, n = pred_samples.shape[:2]
    t = jnp.broadcast_to(target[:, None], pred_samples.shape)
    out = align_fn(pred_samples.reshape(b * n, *pred_samples.shape[2:]),
                   t.reshape(b * n, *t.shape[2:]))
    return out.reshape(pred_samples.shape), t


def _iou_counts(pred, target, sample_axis=False):
    pred = pred.astype(bool)
    target = target.astype(bool)
    axes = tuple(range(1, pred.ndim))
    tp = jnp.sum(pred & target, axis=axes)
    fp = jnp.sum(pred & ~target, axis=axes)
    fn = jnp.sum(~pred & target, axis=axes)
    return tp, fp, fn


@partial(jax.jit, static_argnames=("metrics", "num_samples"))
def compute_batch_metrics(
    metrics: Tuple[str, ...],
    pred: Dict,
    target: Dict,
    input_joints2d=None,
    input_joints2d_vis=None,
    num_samples: Optional[int] = None,
):
    """Per-frame metric values + accumulation terms for one batch, on device.

    Returns (per_frame {metric: (B,)}, sums {name: scalar}).
    """
    pf, sums = {}, {}

    def record(name, per_elem):
        """per_elem: (B, P) per-element errors → sum + per-frame mean."""
        sums[name] = jnp.sum(per_elem)
        pf[name] = jnp.mean(per_elem, axis=-1)

    # ---------------- 3D point estimates
    if "PVE" in metrics:
        record("PVE", _l2(pred["verts3D"], target["verts3D"]))
    if "PVE-SC" in metrics:
        sc = scale_and_translation_transform_batch(pred["verts3D"], target["verts3D"])
        record("PVE-SC", _l2(sc, target["verts3D"]))
    if "PVE-PA" in metrics:
        pa = procrustes_analysis_batch(pred["verts3D"], target["verts3D"])
        record("PVE-PA", _l2(pa, target["verts3D"]))
    if "PVE-T" in metrics:
        record("PVE-T", _l2(pred["tpose_verts3D"], target["tpose_verts3D"]))
    if "PVE-T-SC" in metrics:
        sc = scale_and_translation_transform_batch(
            pred["tpose_verts3D"], target["tpose_verts3D"]
        )
        record("PVE-T-SC", _l2(sc, target["tpose_verts3D"]))
    if "MPJPE" in metrics:
        record("MPJPE", _l2(pred["joints3D"], target["joints3D"]))
    if "MPJPE-SC" in metrics:
        sc = scale_and_translation_transform_batch(pred["joints3D"], target["joints3D"])
        record("MPJPE-SC", _l2(sc, target["joints3D"]))
    if "MPJPE-PA" in metrics:
        pa = procrustes_analysis_batch(pred["joints3D"], target["joints3D"])
        record("MPJPE-PA", _l2(pa, target["joints3D"]))

    # ---------------- distribution accuracy (min over samples)
    if "PVE_samples_min" in metrics:
        err = _l2(pred["verts3D_samples"], target["verts3D"][:, None])
        record("PVE_samples_min", _min_over_samples(err))
    if "PVE-SC_samples_min" in metrics:
        sc, t = _flat_align(
            scale_and_translation_transform_batch, pred["verts3D_samples"], target["verts3D"]
        )
        record("PVE-SC_samples_min", _min_over_samples(_l2(sc, t)))
    if "PVE-PA_samples_min" in metrics:
        pa, t = _flat_align(
            procrustes_analysis_batch, pred["verts3D_samples"], target["verts3D"]
        )
        record("PVE-PA_samples_min", _min_over_samples(_l2(pa, t)))
    if "PVE-T_samples_min" in metrics:
        err = _l2(pred["tpose_verts3D_samples"], target["tpose_verts3D"][:, None])
        record("PVE-T_samples_min", _min_over_samples(err))
    if "PVE-T-SC_samples_min" in metrics:
        sc, t = _flat_align(
            scale_and_translation_transform_batch,
            pred["tpose_verts3D_samples"], target["tpose_verts3D"],
        )
        record("PVE-T-SC_samples_min", _min_over_samples(_l2(sc, t)))
    if "MPJPE_samples_min" in metrics:
        err = _l2(pred["joints3D_samples"], target["joints3D"][:, None])
        record("MPJPE_samples_min", _min_over_samples(err))
    if "MPJPE-SC_samples_min" in metrics:
        sc, t = _flat_align(
            scale_and_translation_transform_batch, pred["joints3D_samples"], target["joints3D"]
        )
        record("MPJPE-SC_samples_min", _min_over_samples(_l2(sc, t)))
    if "MPJPE-PA_samples_min" in metrics:
        pa, t = _flat_align(
            procrustes_analysis_batch, pred["joints3D_samples"], target["joints3D"]
        )
        record("MPJPE-PA_samples_min", _min_over_samples(_l2(pa, t)))

    # ---------------- 2D point estimates
    def vis_masked_2d(name, pred_j2d, tgt_j2d, vis, samples=False):
        err = _l2(pred_j2d, tgt_j2d)  # (B, 17) or (B, N, 17)
        if samples:
            n = err.shape[1]
            err = err * vis[:, None]
            sums[name] = jnp.sum(err)
            sums[f"num_vis_{name}"] = jnp.sum(vis) * n
            pf[name] = jnp.sum(err, axis=(1, 2)) / (jnp.sum(vis, axis=-1) * n + 1e-12)
        else:
            err = err * vis
            sums[name] = jnp.sum(err)
            sums[f"num_vis_{name}"] = jnp.sum(vis)
            pf[name] = jnp.sum(err, axis=-1) / (jnp.sum(vis, axis=-1) + 1e-12)

    if "joints2D-L2E" in metrics:
        vis = target.get("joints2D_vis")
        if vis is None:
            vis = jnp.ones(pred["joints2D"].shape[:-1], jnp.float32)
        vis_masked_2d("joints2D-L2E", pred["joints2D"], target["joints2D"], vis.astype(jnp.float32))
    if "input_joints2D-L2E" in metrics:
        vis_masked_2d(
            "input_joints2D-L2E", pred["joints2D"], input_joints2d,
            input_joints2d_vis.astype(jnp.float32),
        )
    if "joints2Dsamples-L2E" in metrics:
        vis = target.get("joints2D_vis")
        if vis is None:
            vis = jnp.ones(pred["joints2Dsamples"].shape[0:1] + pred["joints2Dsamples"].shape[2:3], jnp.float32)
        vis_masked_2d(
            "joints2Dsamples-L2E", pred["joints2Dsamples"],
            target["joints2D"][:, None], vis.astype(jnp.float32), samples=True,
        )
    if "input_joints2Dsamples-L2E" in metrics:
        vis_masked_2d(
            "input_joints2Dsamples-L2E", pred["joints2Dsamples"],
            input_joints2d[:, None], input_joints2d_vis.astype(jnp.float32), samples=True,
        )

    if "silhouette-IOU" in metrics:
        tp, fp, fn = _iou_counts(pred["silhouettes"], target["silhouettes"])
        sums["num_true_positives"] = jnp.sum(tp)
        sums["num_false_positives"] = jnp.sum(fp)
        sums["num_false_negatives"] = jnp.sum(fn)
        pf["silhouette-IOU"] = tp / (tp + fp + fn + 1e-12)
    if "silhouettesamples-IOU" in metrics:
        tp, fp, fn = _iou_counts(
            pred["silhouettessamples"], target["silhouettes"][:, None]
        )
        sums["num_samples_true_positives"] = jnp.sum(tp)
        sums["num_samples_false_positives"] = jnp.sum(fp)
        sums["num_samples_false_negatives"] = jnp.sum(fn)
        pf["silhouettesamples-IOU"] = tp / (tp + fp + fn + 1e-12)

    # ---------------- sample diversity
    j3d_dist_from_mean = None
    if "verts3D_sample_diversity" in metrics:
        mean = pred["verts3D_samples"].mean(axis=1, keepdims=True)
        d = _l2(pred["verts3D_samples"], mean)  # (B, N, V)
        sums["verts3D_sample_diversity"] = jnp.sum(d)
        pf["verts3D_sample_diversity"] = jnp.mean(d, axis=(1, 2))
    if "joints3D_sample_diversity" in metrics:
        mean = pred["joints3D_coco_samples"].mean(axis=1, keepdims=True)
        j3d_dist_from_mean = _l2(pred["joints3D_coco_samples"], mean)  # (B, N, 17)
        sums["joints3D_sample_diversity"] = jnp.sum(j3d_dist_from_mean)
        pf["joints3D_sample_diversity"] = jnp.mean(j3d_dist_from_mean, axis=(1, 2))
    if "joints3D_invis_sample_diversity" in metrics:
        invis = 1.0 - input_joints2d_vis.astype(jnp.float32)
        d = j3d_dist_from_mean * invis[:, None]
        sums["joints3D_invis_sample_diversity"] = jnp.sum(d)
        sums["num_invis_joints3Dsamples"] = jnp.sum(invis) * num_samples
        pf["joints3D_invis_sample_diversity"] = jnp.mean(d, axis=(1, 2))
    if "joints3D_vis_sample_diversity" in metrics:
        vis = input_joints2d_vis.astype(jnp.float32)
        d = j3d_dist_from_mean * vis[:, None]
        sums["joints3D_vis_sample_diversity"] = jnp.sum(d)
        sums["num_vis_joints3Dsamples"] = jnp.sum(vis) * num_samples
        pf["joints3D_vis_sample_diversity"] = jnp.mean(d, axis=(1, 2))

    return pf, sums


def _proxy_joints(proxy):
    """Input 2D joints + visibility from the proxy representation (joint
    heatmaps are channels 1..17 of the NHWC proxy)."""
    if proxy is None:
        return None, None
    heatmaps = jnp.moveaxis(proxy[..., 1:], -1, 1)
    return convert_heatmaps_to_2d_joints_coordinates(
        heatmaps, gaussian_heatmaps=True
    )


@partial(
    jax.jit,
    static_argnames=("metrics", "num_samples", "sum_keys", "pf_keys"),
)
def _update_step(
    metrics, pred, target, proxy, num_samples, sum_keys, pf_keys, prev_sums,
):
    """The tracker's WHOLE per-batch device work as ONE jitted program:
    proxy→input-joints conversion, compute_batch_metrics, packing, and
    running-sum accumulation.  Separate eager stack/add/moveaxis ops each
    pay a device-server launch through the tunnel — ~3 launches/batch
    measured as the residual spread in the staged protocol benchmark."""
    input_j2d, input_vis = _proxy_joints(proxy)
    pf, sums = compute_batch_metrics.__wrapped__(
        metrics, pred, target, input_j2d, input_vis, num_samples
    )
    svec = jnp.stack([sums[k] for k in sum_keys]).astype(jnp.float32)
    svec = svec + prev_sums
    pfmat = jnp.stack([pf[k] for k in pf_keys]) if pf_keys else None
    return pfmat, svec


def _avals_key(pred, target, proxy):
    """Hashable (treedef, shapes, dtypes) key for the AOT-compiled kernel.
    Works for concrete arrays and jax.ShapeDtypeStruct alike."""
    leaves, treedef = jax.tree_util.tree_flatten((pred, target, proxy))
    return (str(treedef), tuple((l.shape, str(l.dtype)) for l in leaves))


class EvalMetricsTracker:
    """Host-side accumulator around the jitted per-batch metric kernel.

    :param sync_every: device→host sync cadence in batches.  At 1 (default)
        every ``update_per_batch`` ends in one ``jax.device_get`` — the
        per-batch host sync the reference's numpy tracker implies.  At K>1
        the per-batch sums are instead ADDED ON DEVICE (lazy, queued
        dispatch) and per-frame arrays kept as device buffers; one fetch
        per K batches pays the ~30 ms tunnel RTT K× less often, which is
        what makes protocol throughput reproducible through the tunneled
        device (docs/DESIGN.md "Measurement methodology").
    """

    def __init__(
        self,
        metrics_to_track: Sequence[str],
        save_path: Optional[str] = None,
        save_per_frame_metrics: bool = False,
        num_samples_for_prob_metrics: Optional[int] = None,
        sync_every: int = 1,
    ):
        self.metrics_to_track = tuple(metrics_to_track)
        self.save_path = save_path
        self.save_per_frame_metrics = save_per_frame_metrics
        self.num_samples_for_prob_metrics = num_samples_for_prob_metrics
        self.sync_every = max(int(sync_every), 1)
        # AOT-compiled update kernel (warm_async): (avals key, compiled)
        self._aot = None
        self._aot_validate = False
        self._warm_thread = None
        # observability: update_per_batch calls dispatched through the AOT
        # executable (vs the jit fallback) — lets tests/operators assert
        # the fast path actually hit instead of silently regressing
        self._aot_hits = 0
        self.initialise_metric_sums()
        self.initialise_per_frame_metric_lists()

    def initialise_metric_sums(self):
        self.metric_sums: Dict[str, float] = {}
        self.num_total_test_data = 0
        # PACKED device-side state between flushes: one (M_sums,) f32
        # vector of running sums and one (M_pf, B) array per batch.  The
        # packing is load-bearing: a device_get of ~200 separate small
        # arrays through the tunneled TPU measured 5-500 s (per-leaf
        # transfer setup), vs ~25 ms for the same data in 2 packed arrays
        # (docs/DESIGN.md "Measurement methodology").
        self._sum_keys = None
        self._pf_keys = None
        self._dev_sums = None
        self._pending_pf = []
        self._batches_since_flush = 0

    def initialise_per_frame_metric_lists(self):
        self.per_frame_metrics = {m: [] for m in self.metrics_to_track}

    @property
    def pending_batches(self) -> int:
        """Batches accumulated on device since the last host sync."""
        return self._batches_since_flush

    def flush(self):
        """ONE device→host round-trip for all pending sums + per-frame
        values, as PACKED arrays: with the device behind a network tunnel,
        per-array fetch setup dominates (a ~200-small-array device_get
        measured seconds-to-minutes; the packed equivalent ~25 ms)."""
        if self._dev_sums is None and not self._pending_pf:
            return
        # stack same-shape pending batches so the fetch is ~2-3 leaves
        # total (per-leaf transfer setup through the tunnel costs more
        # than the bytes; a partial final batch forms its own group)
        order: Dict[tuple, list] = {}
        for i, pf in enumerate(self._pending_pf):
            order.setdefault(pf.shape, []).append(i)
        packed = {
            s: jnp.stack([self._pending_pf[i] for i in idxs])
            for s, idxs in order.items()
        }
        sums_vec, packed_h = jax.device_get((self._dev_sums, packed))
        if sums_vec is not None:
            for k, v in zip(self._sum_keys, sums_vec):
                self.metric_sums[k] = self.metric_sums.get(k, 0.0) + float(v)
        pfs = [None] * len(self._pending_pf)
        for s, idxs in order.items():
            for j, i in enumerate(idxs):
                pfs[i] = packed_h[s][j]
        for pf in pfs:
            for k, row in zip(self._pf_keys, pf):
                self.per_frame_metrics[k].append(np.asarray(row))
        self._dev_sums = None
        self._pending_pf = []
        self._batches_since_flush = 0

    def block_pending(self):
        """Wait for all device-side pending work (sums + per-frame values)
        WITHOUT fetching.  Benchmarking hook: with sync_every>1 the last
        partial window's compute would otherwise drain outside the timed
        loop (inside compute_final_metrics), inflating measured throughput
        by up to sync_every−1 batches of device time."""
        if self._dev_sums is not None or self._pending_pf:
            jax.block_until_ready((self._dev_sums, self._pending_pf))

    def _discover_keys(self, pred, target, proxy):
        """Learn the (deterministic, metric-set-dependent) sum/per-frame key
        order by ABSTRACT tracing only — jax.eval_shape never compiles or
        executes.  Running the jitted dict-output kernel for discovery
        instead cost ~14 s of trace+compile+tunnel-execute at the 3DPW
        protocol shape (scripts/profile_cold_start.py)."""
        pf_s, sums_s = jax.eval_shape(
            lambda p, t, x: compute_batch_metrics.__wrapped__(
                self.metrics_to_track, p, t, *_proxy_joints(x),
                self.num_samples_for_prob_metrics,
            ),
            pred, target, proxy,
        )
        self._sum_keys = tuple(sorted(sums_s))
        self._pf_keys = tuple(sorted(pf_s))

    def warm(self, pred_shapes, target_shapes, proxy_shapes):
        """AOT-compile the per-batch update kernel from ShapeDtypeStructs
        (no data, no execution).  ``update_per_batch`` then dispatches the
        compiled executable directly whenever its input avals match — and
        falls back to the ordinary jit path (correct, just slower on first
        use) whenever they don't."""
        self._discover_keys(pred_shapes, target_shapes, proxy_shapes)
        prev_s = jax.ShapeDtypeStruct((len(self._sum_keys),), jnp.float32)
        lower_args = (
            self.metrics_to_track, pred_shapes, target_shapes, proxy_shapes,
            self.num_samples_for_prob_metrics,
            self._sum_keys, self._pf_keys, prev_s,
        )
        # persistent executable cache first (repeat CLI invocations skip
        # the trace+compile entirely — utils/aot_cache.py); fall back to a
        # fresh in-process AOT compile
        from ..utils import aot_cache

        compiled = aot_cache.cached_compile(
            _update_step, "metric_update", *lower_args
        )
        # a DESERIALIZED executable must prove itself on first dispatch —
        # XLA can surface load problems lazily in the output buffers
        # (aot_cache module docstring); a fresh compile is trusted
        self._aot_validate = (
            compiled is not None
            and aot_cache.STATS.get("metric_update", {}).get("event")
            == "deserialize"
        )
        if compiled is None:
            compiled = _update_step.lower(*lower_args).compile()
        self._aot = (_avals_key(pred_shapes, target_shapes, proxy_shapes),
                     compiled)

    def warm_async(self, pred_shapes, target_shapes, proxy_shapes):
        """``warm`` on a daemon thread, so the metric kernel's trace+compile
        overlaps the eval step's own first-batch compile (both are mostly
        GIL-releasing backend waits; the overlap removes the metric kernel
        from the cold-start critical path — scripts/profile_cold_start.py).
        Failures are swallowed: the jit path remains the fallback."""
        import threading

        def _work():
            try:
                self.warm(pred_shapes, target_shapes, proxy_shapes)
            except Exception:
                self._aot = None

        self._warm_thread = threading.Thread(target=_work, daemon=True)
        self._warm_thread.start()

    def update_per_batch(
        self, pred_dict, target_dict, batch_size, model_input=None,
        return_per_frame_metrics=False,
    ):
        self.num_total_test_data += batch_size
        if self._warm_thread is not None:
            self._warm_thread.join()
            self._warm_thread = None
        if self._sum_keys is None:
            self._discover_keys(pred_dict, target_dict, model_input)
        # Count sums (int32 IOU pixel counts) ride in f32 in the packed
        # vector: per-flush magnitudes stay ≤ ~2e9 where f32's ~1e-7
        # relative rounding is far below metric resolution, and f32 also
        # removes the int32 overflow risk of summing counts over a window.
        prev = (
            self._dev_sums
            if self._dev_sums is not None
            else jnp.zeros((len(self._sum_keys),), jnp.float32)
        )
        pfmat = None
        done = False
        if (
            self._aot is not None
            and self._aot[0] == _avals_key(pred_dict, target_dict, model_input)
        ):
            try:
                pfmat, dev_sums = self._aot[1](
                    pred_dict, target_dict, model_input, prev
                )
                if self._aot_validate:
                    # first dispatch of a disk-loaded executable: force the
                    # (tiny) sums buffer so a poisoned entry raises HERE,
                    # not at a distant flush (costs one RTT, once)
                    jax.block_until_ready(dev_sums)
                    self._aot_validate = False
                self._dev_sums = dev_sums
                done = True
                self._aot_hits += 1
            except Exception:
                # sharding disagreement at dispatch (ValueError), or a
                # poisoned deserialized entry (validation block) — drop it,
                # delete the disk entry, recompute below via jit from the
                # unchanged `prev`
                if self._aot_validate:
                    from ..utils.aot_cache import invalidate

                    invalidate("metric_update")
                    self._aot_validate = False
                self._aot = None
        if not done:
            pfmat, self._dev_sums = _update_step(
                self.metrics_to_track, pred_dict, target_dict, model_input,
                self.num_samples_for_prob_metrics,
                self._sum_keys, self._pf_keys, prev,
            )
        if pfmat is not None:
            self._pending_pf.append(pfmat)
        self._batches_since_flush += 1
        if return_per_frame_metrics:
            pf_host = jax.device_get(pfmat) if pfmat is not None else []
            self.flush()
            return {k: np.asarray(v) for k, v in zip(self._pf_keys, pf_host)}
        if self._batches_since_flush >= self.sync_every:
            self.flush()
        return None

    def compute_final_metrics(self, num_verts: int = 6890) -> Dict[str, float]:
        """Final reductions + mm conversion prints (reference :437-496)."""
        self.flush()
        final = {}
        n = self.num_total_test_data
        ns = self.num_samples_for_prob_metrics
        for m in self.metrics_to_track:
            mult = 1.0
            if m == "silhouette-IOU":
                s = self.metric_sums
                final[m] = s["num_true_positives"] / (
                    s["num_true_positives"] + s["num_false_negatives"] + s["num_false_positives"]
                )
            elif m == "silhouettesamples-IOU":
                s = self.metric_sums
                final[m] = s["num_samples_true_positives"] / (
                    s["num_samples_true_positives"]
                    + s["num_samples_false_negatives"]
                    + s["num_samples_false_positives"]
                )
            elif m in ("joints2D-L2E", "joints2Dsamples-L2E",
                       "input_joints2D-L2E", "input_joints2Dsamples-L2E"):
                final[m] = self.metric_sums[m] / max(self.metric_sums[f"num_vis_{m}"], 1e-12)
            elif m == "verts3D_sample_diversity":
                mult = 1000.0
                final[m] = self.metric_sums[m] / (n * ns * num_verts)
            elif m == "joints3D_sample_diversity":
                mult = 1000.0
                final[m] = self.metric_sums[m] / (n * ns * 17)
            elif m == "joints3D_invis_sample_diversity":
                mult = 1000.0
                denom = self.metric_sums.get("num_invis_joints3Dsamples", 0.0)
                final[m] = self.metric_sums[m] / denom if denom > 0 else 0.0
            elif m == "joints3D_vis_sample_diversity":
                mult = 1000.0
                final[m] = self.metric_sums[m] / self.metric_sums["num_vis_joints3Dsamples"]
            elif "PVE" in m:
                mult = 1000.0
                final[m] = self.metric_sums[m] / (n * num_verts)
            elif "MPJPE" in m:
                mult = 1000.0
                final[m] = self.metric_sums[m] / (n * 14)
            print(m, "{:.2f}".format(final[m] * mult))

        if self.save_per_frame_metrics and self.save_path is not None:
            os.makedirs(self.save_path, exist_ok=True)
            for m in self.metrics_to_track:
                if self.per_frame_metrics[m]:
                    arr = np.concatenate(self.per_frame_metrics[m], axis=0)
                    np.save(os.path.join(self.save_path, m + "_per_frame.npy"), arr)
        return final
