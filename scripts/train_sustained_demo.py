"""Sustained synthetic-data training demo on the REAL train pipeline.

Runs `train_humaniflow` (the full epoch loop: jitted synth-data generation →
fused train step → NaN rollback → tracker → checkpoint/best-model logic,
reference train/train_humaniflow.py:94-407) for a few hundred steps at the
reference batch size on randomly-initialised weights, and writes the loss /
metric trajectory + loss-curve plot.  This is the stability-at-speed
evidence the 2-step CI tests can't give: hundreds of consecutive iterations
on the TPU with no NaN halts, decreasing losses, and checkpoints landing.

Environment note: poses ship from the host (20 KB/batch); textures and
backgrounds are device-resident pools created once — through this
environment's tunneled TPU (~7 MB/s) per-batch texture upload would measure
the tunnel, not training (CLAUDE.md host-boundary rule).  On a real TPU VM
the standard host datasets apply.

Usage:  python scripts/train_sustained_demo.py -E 20 -S 40 -O demo_out
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class DevicePoolTrainDataset:
    """epoch_batches provider with device-resident texture/background pools.

    Poses are drawn fresh on the host per batch (tiny); each batch cycles
    through `n_pools` pre-uploaded texture/background pools — the synth
    pipeline's own texture/lighting/crop/occlusion augmentation provides the
    appearance variation, as in the reference's on-the-fly renderer.
    """

    def __init__(self, steps_per_epoch, batch_size, img, n_pools=2, seed=0):
        import jax
        import numpy as np

        self.rng = np.random.default_rng(seed)
        self.steps = steps_per_epoch
        self.bsz = batch_size
        self._i = 0
        # synthesize the pools ON DEVICE (uploading ~1 GB of host-random
        # texture through a tunneled device would measure the link)
        keys = jax.random.split(jax.random.PRNGKey(seed), 2 * n_pools)
        self.textures = [
            jax.random.uniform(keys[i], (batch_size, 1200, 800, 3))
            for i in range(n_pools)
        ]
        self.backgrounds = [
            jax.random.uniform(keys[n_pools + i], (batch_size, img, img, 3))
            for i in range(n_pools)
        ]

    def __len__(self):
        return self.steps * self.bsz

    def epoch_batches(self, batch_size, shuffle=True, drop_last=True):
        import numpy as np

        assert batch_size == self.bsz
        for _ in range(self.steps):
            self._i += 1
            yield {
                "pose": self.rng.normal(
                    scale=0.3, size=(batch_size, 72)
                ).astype(np.float32),
                "texture": self.textures[self._i % len(self.textures)],
                "background": self.backgrounds[self._i % len(self.backgrounds)],
            }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", "-E", type=int, default=20)
    parser.add_argument("--steps_per_epoch", "-S", type=int, default=40)
    parser.add_argument("--val_steps", type=int, default=5)
    parser.add_argument("--batch_size", "-B", type=int, default=72)
    parser.add_argument("--out_dir", "-O", type=str, default="sustained_demo")
    parser.add_argument(
        "--track_metrics", action="store_true",
        help="track PVE-SC/joints2D-L2E per batch (reduced to scalar sums "
        "ON DEVICE by the tracker's metric kernel and fetched once per "
        "epoch — metric tensors never reach the host)",
    )
    args = parser.parse_args()

    import time

    import jax
    import numpy as np

    from humaniflow_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl
    from humaniflow_tpu.pipelines.train import train_humaniflow
    from humaniflow_tpu.render import TexturedIUVRenderer

    cfg = get_humaniflow_cfg_defaults()
    cfg.TRAIN.BATCH_SIZE = args.batch_size
    cfg.TRAIN.EPOCHS_PER_SAVE = max(args.epochs // 2, 1)
    img = cfg.DATA.PROXY_REP_SIZE
    smpl = synthetic_smpl(num_verts=6890)
    renderer = TexturedIUVRenderer(
        img_wh=img, projection_type="perspective",
        focal_length=cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH, render_rgb=True,
        rasterizer="binned", texture_sampling="face", emit_uv=False,
    )
    model = HumaniflowModel(cfg.MODEL)

    metrics = ("PVE-SC", "joints2D-L2E") if args.track_metrics else ()
    train_ds = DevicePoolTrainDataset(args.steps_per_epoch, args.batch_size, img, seed=0)
    val_ds = DevicePoolTrainDataset(args.val_steps, args.batch_size, img, seed=1)

    t0 = time.perf_counter()
    train_humaniflow(
        model, smpl, cfg, renderer, train_ds, val_ds, args.out_dir,
        metrics_to_track=metrics,
        save_val_metrics=("PVE-SC",) if args.track_metrics else (),
        num_epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
        key=jax.random.PRNGKey(0),
    )
    wall = time.perf_counter() - t0
    n_steps = args.epochs * args.steps_per_epoch

    import pickle

    with open(os.path.join(args.out_dir, "log.pkl"), "rb") as fh:
        log = pickle.load(fh)
    tr = np.asarray(log["train_losses"])
    va = np.asarray(log["val_losses"])
    print(f"steps: {n_steps} train + {args.epochs * args.val_steps} val "
          f"in {wall:.0f}s wall (incl. compile)")
    print(f"train loss by epoch: {np.array2string(tr, precision=1)}")
    print(f"val   loss by epoch: {np.array2string(va, precision=1)}")
    for m in metrics:
        print(f"val {m} by epoch: "
              f"{np.array2string(np.asarray(log[f'val_{m}']), precision=4)}")
    assert np.isfinite(tr).all() and np.isfinite(va).all()
    assert tr[-1] < tr[0], "train loss did not decrease"

    try:  # plotting is best-effort (headless matplotlib)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        names = ["losses"] + [m for m in metrics]
        fig, axes = plt.subplots(1, len(names), figsize=(5 * len(names), 4))
        for ax, name in zip(np.atleast_1d(axes), names):
            ax.plot(log[f"train_{name}"], label="train")
            ax.plot(log[f"val_{name}"], label="val")
            ax.set_title(name)
            ax.set_xlabel("epoch")
            ax.legend()
        out_png = os.path.join(args.out_dir, "loss_curves.png")
        fig.savefig(out_png, dpi=100, bbox_inches="tight")
        print(f"loss curves → {out_png}")
    except Exception as e:
        print(f"plotting skipped: {e}")


if __name__ == "__main__":
    main()
