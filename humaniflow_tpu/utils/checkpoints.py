"""Checkpoint save/resume (orbax-backed pytree checkpoints).

Capability parity with the reference's torch.save checkpointing
(train/train_humaniflow.py:390-398, utils/checkpoint_utils.py:4-26): the
same logical content — {epoch, best_epoch, best_epoch_val_metrics, params,
best_params, opt_state} — saved every EPOCHS_PER_SAVE epochs, with resume
restoring model/optimizer state and best-metric bookkeeping.
"""

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(save_dir: str, name: str, state: Dict[str, Any]) -> str:
    """Save a checkpoint dict.  Array pytrees are stored via orbax when
    available; falls back to a pickled numpy tree (same content)."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, name)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), _to_numpy_tree(state), force=True)
        ckptr.wait_until_finished()
    except Exception:
        with open(path + ".pkl", "wb") as f:
            pickle.dump(_to_numpy_tree(state), f)
        path = path + ".pkl"
    return path


def load_checkpoint(path: str, target: Optional[Any] = None):
    """Load a checkpoint saved by save_checkpoint (orbax dir or pickle)."""
    if path.endswith(".pkl") or (os.path.isfile(path) and not os.path.isdir(path)):
        with open(path, "rb") as f:
            return pickle.load(f)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), target=_to_numpy_tree(target))
    return ckptr.restore(os.path.abspath(path))


def load_training_info_from_checkpoint(state: Dict[str, Any], save_val_metrics):
    """Resume bookkeeping (reference: utils/checkpoint_utils.py:4-26):
    current epoch, best epoch, best val metrics (zero-filled if missing)."""
    current_epoch = int(state["epoch"]) + 1
    best_epoch = int(state.get("best_epoch", state["epoch"]))
    best_epoch_val_metrics = {}
    stored = state.get("best_epoch_val_metrics", {})
    for metric in save_val_metrics:
        best_epoch_val_metrics[metric] = float(stored.get(metric, np.inf))
    return current_epoch, best_epoch, best_epoch_val_metrics
