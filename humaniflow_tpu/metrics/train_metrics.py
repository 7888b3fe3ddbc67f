"""Training loss/metric tracker with epoch history, resume and best-model
selection.

Capability parity with reference
`metrics/train_loss_and_metrics_tracker.py:8-246`: same metric list, same
per-epoch reductions, pickled `log.pkl` history, resume-aware truncation
(:44-72) and `determine_save_model_weights_this_epoch` (:238-245).

Per-batch math reuses the jitted on-device metric kernel
(metrics/eval_metrics.compute_batch_metrics) — one device→host sync of a few
scalars per batch instead of the reference's full-tensor `.cpu().numpy()`
round trips.
"""

import pickle
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from .eval_metrics import compute_batch_metrics

ALL_METRICS = [
    "PVE", "PVE-SC", "PVE-PA", "PVE-T", "PVE-T-SC",
    "MPJPE", "MPJPE-SC", "MPJPE-PA",
    "joints2D-L2E", "joints2Dsamples-L2E",
]


def undo_keypoint_normalisation(joints2d, img_wh):
    """[-1, 1] normalised keypoints → pixel coordinates."""
    return (joints2d + 1.0) * (img_wh / 2.0)


class TrainingLossesAndMetricsTracker:
    def __init__(
        self,
        metrics_to_track: Sequence[str],
        img_wh: int,
        log_save_path: Optional[str] = None,
        load_logs: bool = False,
        current_epoch: Optional[int] = None,
    ):
        self.metrics_to_track = tuple(metrics_to_track)
        self.img_wh = img_wh
        self.log_save_path = log_save_path
        self.all_metrics_types = [
            f"{split}_{m}" for m in ALL_METRICS for split in ("train", "val")
        ]
        if load_logs:
            self.epochs_history = self.load_history(log_save_path, current_epoch)
        else:
            self.epochs_history: Dict[str, List[float]] = {
                "train_losses": [], "val_losses": [],
            }
            for m in self.all_metrics_types:
                self.epochs_history[m] = []
        self.loss_metric_sums = None

    def load_history(self, path, current_epoch):
        """Truncate history to the resume epoch; zero-fill missing metrics
        (reference :44-72)."""
        with open(path, "rb") as f:
            history = pickle.load(f)
        history["train_losses"] = history["train_losses"][:current_epoch]
        history["val_losses"] = history["val_losses"][:current_epoch]
        for m in self.all_metrics_types:
            if m in history:
                history[m] = history[m][:current_epoch]
            else:
                history[m] = [0.0] * current_epoch
        for key in history:
            assert len(history[key]) == current_epoch
        return history

    def initialise_loss_metric_sums(self):
        self.loss_metric_sums = {
            "train_losses": 0.0, "val_losses": 0.0,
            "train_num_samples": 0, "val_num_samples": 0,
        }
        for m in self.all_metrics_types:
            self.loss_metric_sums[m] = 0.0
        for split in ("train", "val"):
            self.loss_metric_sums[f"{split}_num_visib_joints2Dsamples"] = 0.0

    def batch_sums_device(
        self, loss, pred_dict, target_dict,
        pred_tpose_vertices=None, target_tpose_vertices=None,
    ):
        """Everything one batch contributes, reduced to a small DEVICE pytree
        (a dozen scalars) with no host sync.  The epoch loop queues these and
        flushes them through `add_batch_sums` with ONE `jax.device_get` per
        epoch — a per-batch fetch costs an RTT through the device tunnel
        (~30 ms, ~18% of a train iteration; docs/DESIGN.md "Measurement
        methodology").

        pred joints2D arrive normalised to [-1,1] (as produced by the train
        step); they are un-normalised here (reference :179,191)."""
        pred = dict(pred_dict)
        if "joints2D" in pred:
            pred["joints2D"] = undo_keypoint_normalisation(pred["joints2D"], self.img_wh)
        if "joints2Dsamples" in pred:
            pred["joints2Dsamples"] = undo_keypoint_normalisation(
                pred["joints2Dsamples"], self.img_wh
            )
        if pred_tpose_vertices is not None:
            pred["tpose_verts3D"] = pred_tpose_vertices
        target = dict(target_dict)
        if target_tpose_vertices is not None:
            target["tpose_verts3D"] = target_tpose_vertices

        _, sums = compute_batch_metrics(self.metrics_to_track, pred, target)
        out = {"loss": loss, "sums": sums}
        if "joints2D-L2E" in self.metrics_to_track:
            # the reference train tracker does NOT visibility-mask the
            # point-estimate J2D metric (:180-181); sums[...] is the masked
            # value, so also reduce the unmasked error on device
            out["j2d_unmasked"] = jnp.linalg.norm(
                jnp.asarray(pred["joints2D"]) - jnp.asarray(target["joints2D"]),
                axis=-1,
            ).sum()
        return out

    def add_batch_sums(self, split: str, host_vals, batch_size: int):
        """Accumulate one batch's fetched `batch_sums_device` pytree."""
        assert split in ("train", "val")
        self.loss_metric_sums[f"{split}_losses"] += float(host_vals["loss"]) * batch_size
        self.loss_metric_sums[f"{split}_num_samples"] += batch_size
        sums = host_vals["sums"]
        for m in self.metrics_to_track:
            if m == "joints2Dsamples-L2E":
                self.loss_metric_sums[f"{split}_{m}"] += float(sums[m])
                self.loss_metric_sums[f"{split}_num_visib_joints2Dsamples"] += float(
                    sums["num_vis_joints2Dsamples-L2E"]
                )
            elif m == "joints2D-L2E":
                self.loss_metric_sums[f"{split}_{m}"] += float(
                    host_vals["j2d_unmasked"]
                )
            else:
                self.loss_metric_sums[f"{split}_{m}"] += float(sums[m])

    def update_per_batch(
        self, split: str, loss, pred_dict, target_dict, batch_size: int,
        pred_tpose_vertices=None, target_tpose_vertices=None,
    ):
        """Immediate-sync variant: one device→host round-trip per batch."""
        vals = jax.device_get(
            self.batch_sums_device(
                loss, pred_dict, target_dict,
                pred_tpose_vertices, target_tpose_vertices,
            )
        )
        self.add_batch_sums(split, vals, batch_size)

    def update_per_epoch(self):
        h = self.epochs_history
        s = self.loss_metric_sums
        h["train_losses"].append(s["train_losses"] / max(s["train_num_samples"], 1))
        h["val_losses"].append(s["val_losses"] / max(s["val_num_samples"], 1))

        for mt in self.all_metrics_types:
            split, metric = mt.split("_", 1)
            if metric in self.metrics_to_track:
                if "joints2Dsamples" in metric:
                    denom = max(s[f"{split}_num_visib_joints2Dsamples"], 1e-12)
                    h[mt].append(s[mt] / denom)
                else:
                    if "PVE" in metric:
                        per = 6890
                    elif "MPJPE" in metric:
                        per = 14
                    else:  # joints2D
                        per = 17
                    h[mt].append(s[mt] / max(s[f"{split}_num_samples"] * per, 1))
            else:
                h[mt].append(0.0)

        print("Finished epoch.")
        print(
            "Train Loss: {:.5f}, Val Loss: {:.5f}".format(
                h["train_losses"][-1], h["val_losses"][-1]
            )
        )
        for m in self.metrics_to_track:
            print(
                "Train {}: {:.5f}, Val {}: {:.5f}".format(
                    m, h[f"train_{m}"][-1], m, h[f"val_{m}"][-1]
                )
            )
        if self.log_save_path is not None:
            with open(self.log_save_path, "wb") as f:
                pickle.dump(h, f)

    def determine_save_model_weights_this_epoch(
        self, save_val_metrics, best_epoch_val_metrics
    ) -> bool:
        return all(
            self.epochs_history[f"val_{m}"][-1] <= best_epoch_val_metrics[m]
            for m in save_val_metrics
        )
