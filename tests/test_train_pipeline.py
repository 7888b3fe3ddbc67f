"""End-to-end training-pipeline smoke test: jitted synthetic-data generation
(SMPL → render → crop → augment → Canny → heatmaps) feeding a train step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from humaniflow_tpu.configs import get_humaniflow_cfg_defaults, paths
from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl
from humaniflow_tpu.pipelines.train import make_synth_data_fn
from humaniflow_tpu.pipelines.train_step import make_train_step

IMG = 48
B = 2

needs_uv = pytest.mark.skipif(
    not os.path.exists(paths.DENSEPOSE_UV), reason="UV_Processed.mat missing"
)


@pytest.fixture(scope="module")
def setup():
    from humaniflow_tpu.render import TexturedIUVRenderer

    cfg = get_humaniflow_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = IMG
    cfg.TRAIN.BATCH_SIZE = B
    # keep the reference FOV when shrinking the test image (focal 300 @ 256)
    cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH = 300.0 * IMG / 256.0
    smpl = synthetic_smpl(num_verts=6890)  # renderer needs full SMPL topology
    renderer = TexturedIUVRenderer(
        img_wh=IMG, projection_type="perspective",
        focal_length=cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH, render_rgb=True,
        chunk=4096,
        # run_train.py default: overflow surfaced through the synth batch
        # and accumulated per epoch by the train loop (always 0 on the
        # exact CPU/xla backend — the plumbing is what's under test here)
        emit_overflow=True,
    )
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    return cfg, smpl, renderer, model, params


@needs_uv
def test_synth_data_generation(setup):
    cfg, smpl, renderer, model, params = setup
    synth = make_synth_data_fn(cfg, smpl, renderer)
    rng = np.random.default_rng(0)
    pose72 = jnp.asarray(rng.normal(scale=0.3, size=(B, 72)), jnp.float32)
    texture = jnp.asarray(rng.uniform(size=(B, 1200, 800, 3)), jnp.float32)
    background = jnp.asarray(rng.uniform(size=(B, IMG, IMG, 3)), jnp.float32)

    batch = synth(jax.random.PRNGKey(1), pose72, texture, background)
    assert batch["proxy"].shape == (B, IMG, IMG, 18)
    assert batch["pose_rotmats"].shape == (B, 23, 3, 3)
    assert batch["joints2D"].shape == (B, 17, 2)
    for k, v in batch.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # the proxy contains heatmap energy for at least some visible joints
    assert float(batch["proxy"][..., 1:].max()) > 0.5
    # emit_overflow plumbing: scalar int32 key, 0 on the exact xla backend
    assert batch["binning_overflow"].shape == ()
    assert int(batch["binning_overflow"]) == 0
    # rendered person composited over background: rgb in [0, 1]
    assert 0.0 <= float(batch["rgb_in"].min()) and float(batch["rgb_in"].max()) <= 1.0


class _FakeDataset:
    """Minimal epoch_batches provider (poses/textures/backgrounds)."""

    def __init__(self, n=4, img=IMG, seed=0):
        self.rng = np.random.default_rng(seed)
        self.n = n
        self.img = img

    def __len__(self):
        return self.n

    def epoch_batches(self, batch_size, shuffle=True, drop_last=True):
        for _ in range(self.n // batch_size):
            yield {
                "pose": self.rng.normal(scale=0.3, size=(batch_size, 72)).astype(np.float32),
                "texture": self.rng.uniform(size=(batch_size, 1200, 800, 3)).astype(np.float32),
                "background": self.rng.uniform(size=(batch_size, self.img, self.img, 3)).astype(np.float32),
            }


@needs_uv
def test_full_train_loop_with_tracker_and_checkpoint(setup, tmp_path):
    """Two epochs of the full loop: synth gen → step → tracker → checkpoint
    → resume bookkeeping (reference train_humaniflow.py:94-407)."""
    from humaniflow_tpu.pipelines.train import train_humaniflow
    from humaniflow_tpu.utils.checkpoints import load_checkpoint

    cfg, smpl, renderer, model, params = setup
    cfg.TRAIN.EPOCHS_PER_SAVE = 1
    exp_dir = str(tmp_path / "exp")
    # the train loop DONATES its (params, opt_state) buffers; hand it a copy
    # so the module-scoped fixture stays alive for other tests
    params_copy = jax.tree_util.tree_map(jnp.array, params)
    before = np.asarray(params["fc1"]["kernel"]).copy()
    out_params, best_params = train_humaniflow(
        model, smpl, cfg, renderer,
        _FakeDataset(n=2), _FakeDataset(n=2, seed=1),
        exp_dir, params=params_copy,
        metrics_to_track=("PVE", "joints2D-L2E"),
        save_val_metrics=("PVE",),
        num_epochs=2, steps_per_epoch=1,
    )
    assert os.path.exists(os.path.join(exp_dir, "log.pkl"))
    ckpt = load_checkpoint(os.path.join(exp_dir, "epoch_000001"))
    assert int(ckpt["epoch"]) == 1
    assert "params" in ckpt and "best_params" in ckpt
    # params actually updated over the run
    diff = float(np.abs(np.asarray(out_params["fc1"]["kernel"]) - before).max())
    assert diff > 0


@needs_uv
def test_train_data_parallel_matches_single(setup, tmp_path):
    """A 2-epoch train_humaniflow(mesh=8) run reproduces the single-device
    run's loss trajectory and final params with the same PRNG keys: the
    synth-data batch is sharded over the data axis and GSPMD inserts the
    gradient all-reduce (VERDICT r1 item 3)."""
    import pickle

    from humaniflow_tpu.parallel import make_mesh
    from humaniflow_tpu.pipelines.train import train_humaniflow

    _, smpl, renderer, model, params = setup
    cfg = get_humaniflow_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = IMG
    cfg.TRAIN.BATCH_SIZE = 8  # divides the 8-device mesh
    cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH = 300.0 * IMG / 256.0
    cfg.TRAIN.EPOCHS_PER_SAVE = 100  # skip checkpoint IO in this test

    def run(mesh, exp_dir):
        out_params, _ = train_humaniflow(
            model, smpl, cfg, renderer,
            _FakeDataset(n=8, seed=10), _FakeDataset(n=8, seed=11),
            exp_dir,
            params=jax.tree_util.tree_map(jnp.array, params),
            metrics_to_track=(), save_val_metrics=(),
            num_epochs=2, steps_per_epoch=1,
            key=jax.random.PRNGKey(42), mesh=mesh,
        )
        with open(os.path.join(exp_dir, "log.pkl"), "rb") as f:
            history = pickle.load(f)
        return out_params, history

    single_params, single_hist = run(None, str(tmp_path / "single"))
    sharded_params, sharded_hist = run(make_mesh(8), str(tmp_path / "mesh"))

    assert len(single_hist["train_losses"]) == 2
    np.testing.assert_allclose(
        sharded_hist["train_losses"], single_hist["train_losses"], rtol=1e-3
    )
    np.testing.assert_allclose(
        sharded_hist["val_losses"], single_hist["val_losses"], rtol=1e-3
    )
    flat_s = jax.tree_util.tree_leaves(single_params)
    flat_m = jax.tree_util.tree_leaves(sharded_params)
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3)


@needs_uv
def test_train_mesh_batch_size_mismatch_raises(setup, tmp_path):
    from humaniflow_tpu.parallel import make_mesh
    from humaniflow_tpu.pipelines.train import train_humaniflow

    _, smpl, renderer, model, params = setup
    cfg = get_humaniflow_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = IMG
    cfg.TRAIN.BATCH_SIZE = 6  # does not divide 8
    with pytest.raises(ValueError, match="must divide"):
        train_humaniflow(
            model, smpl, cfg, renderer, _FakeDataset(n=6), _FakeDataset(n=6),
            str(tmp_path), params=jax.tree_util.tree_map(jnp.array, params),
            num_epochs=1, mesh=make_mesh(8),
        )


@needs_uv
def test_train_step_on_synth_batch(setup):
    cfg, smpl, renderer, model, params = setup
    synth = make_synth_data_fn(cfg, smpl, renderer)
    rng = np.random.default_rng(1)
    batch = synth(
        jax.random.PRNGKey(2),
        jnp.asarray(rng.normal(scale=0.3, size=(B, 72)), jnp.float32),
        jnp.asarray(rng.uniform(size=(B, 1200, 800, 3)), jnp.float32),
        jnp.asarray(rng.uniform(size=(B, IMG, IMG, 3)), jnp.float32),
    )
    batch.pop("rgb_in")
    opt = optax.adam(1e-4)
    step = jax.jit(
        make_train_step(model, smpl, cfg.LOSS, opt, img_wh=IMG, num_j2d_samples=2)
    )
    new_params, _, metrics = step(params, opt.init(params), batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["total"]))
    assert float(metrics["nan_skipped"]) == 0.0
