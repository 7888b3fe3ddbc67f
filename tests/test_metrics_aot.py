"""Direct tests for the EvalMetricsTracker AOT metric-warm fast path
(VERDICT r4 item 6).

The AOT path (``warm``/``warm_async`` + the compiled-executable dispatch in
``update_per_batch``) is guarded by broad exception fallbacks — correct but
previously silent: a regression would quietly revert every CLI eval to the
slow jit path with zero signal.  These tests pin that:

(a) after ``warm()`` the next ``update_per_batch`` dispatches the AOT
    executable (observable via the ``_aot_hits`` counter);
(b) the AOT and jit paths produce identical running sums and per-frame
    packs;
(c) an avals mismatch falls back cleanly to the jit path (and clears
    nothing it shouldn't);
(d) a raising ``warm_async`` leaves results correct (jit fallback);
(e) the PIPELINE-level warm (`pipelines/evaluate._spawn_metric_warm`,
    avals mirrored via jax.eval_shape of the eval step) actually HITS on
    the real eval loop — the end-to-end assertion the verdict asked for.

Capability accelerated: reference metrics/eval_metrics_tracker.py:119-433.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humaniflow_tpu.metrics.eval_metrics import EvalMetricsTracker

METRICS = (
    "PVE", "MPJPE", "joints2D-L2E", "PVE_samples_min",
    "joints2Dsamples-L2E", "verts3D_sample_diversity",
)
B, V, N, WH = 2, 16, 3, 8


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    pred = {
        "verts3D": f(B, V, 3),
        "joints3D": f(B, 14, 3),
        "joints2D": f(B, 17, 2),
        "verts3D_samples": f(B, N, V, 3),
        "joints2Dsamples": f(B, N, 17, 2),
    }
    target = {
        "verts3D": f(B, V, 3),
        "joints3D": f(B, 14, 3),
        "joints2D": f(B, 17, 2),
        "joints2D_vis": jnp.ones((B, 17), bool),
    }
    proxy = jnp.abs(f(B, WH, WH, 18))
    return pred, target, proxy


def _shapes(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree
    )


def _run(tracker, n_batches=3):
    for i in range(n_batches):
        pred, target, proxy = _batch(seed=i)
        tracker.update_per_batch(pred, target, B, model_input=proxy)
    tracker.flush()
    return dict(tracker.metric_sums), {
        k: [np.asarray(v) for v in vs]
        for k, vs in tracker.per_frame_metrics.items()
    }


def test_warm_hits_and_matches_jit_path():
    """(a) + (b): warm() makes update_per_batch dispatch the compiled
    executable, and sums + per-frame packs are identical to the jit path."""
    base = EvalMetricsTracker(METRICS, num_samples_for_prob_metrics=N,
                              save_per_frame_metrics=True)
    sums_jit, pf_jit = _run(base)
    assert base._aot_hits == 0

    warm = EvalMetricsTracker(METRICS, num_samples_for_prob_metrics=N,
                              save_per_frame_metrics=True)
    pred, target, proxy = _batch()
    warm.warm(_shapes(pred), _shapes(target), _shapes(proxy))
    assert warm._aot is not None
    sums_aot, pf_aot = _run(warm)
    assert warm._aot_hits == 3  # every batch went through the executable

    assert set(sums_jit) == set(sums_aot)
    for k in sums_jit:
        np.testing.assert_allclose(sums_aot[k], sums_jit[k], rtol=1e-6)
    for m in METRICS:
        for a, b in zip(pf_aot[m], pf_jit[m]):
            np.testing.assert_array_equal(a, b)


def test_avals_mismatch_falls_back_to_jit():
    """(c): an executable compiled for other shapes is skipped by the avals
    key check — the jit path runs, results are correct, no exception."""
    tracker = EvalMetricsTracker(METRICS, num_samples_for_prob_metrics=N)
    pred, target, proxy = _batch()
    # warm at a DIFFERENT batch size → key mismatch on real inputs
    bigger = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct((s.shape[0] + 1,) + s.shape[1:], s.dtype),
        _shapes((pred, target, proxy)),
    )
    tracker.warm(*bigger)
    assert tracker._aot is not None
    sums, _ = _run(tracker)
    assert tracker._aot_hits == 0  # never dispatched
    assert tracker._aot is not None  # mismatch is a skip, not an invalidation

    base = EvalMetricsTracker(METRICS, num_samples_for_prob_metrics=N)
    sums_ref, _ = _run(base)
    for k in sums_ref:
        np.testing.assert_allclose(sums[k], sums_ref[k], rtol=1e-6)


def test_poisoned_disk_executable_falls_back(monkeypatch, tmp_path):
    """A metric-update executable that came from the DISK cache and fails
    its first-dispatch validation (lazy XLA load errors surface in the
    output buffers) is dropped + invalidated; the jit path recomputes from
    the unchanged previous sums and the final metrics are unaffected."""
    from humaniflow_tpu.metrics import eval_metrics as EM
    from humaniflow_tpu.utils import aot_cache

    tracker = EvalMetricsTracker(METRICS, num_samples_for_prob_metrics=N,
                                 save_per_frame_metrics=True)
    pred, target, proxy = _batch()
    tracker.warm(_shapes(pred), _shapes(target), _shapes(proxy))
    assert tracker._aot is not None
    # simulate "this executable was deserialized from disk" + a poisoned
    # first dispatch (validation block raises)
    tracker._aot_validate = True
    poison = tmp_path / "metric_update-deadbeef.aotx"
    poison.write_bytes(b"x")
    aot_cache.STATS["metric_update"] = {
        "event": "deserialize", "path": str(poison),
    }

    def boom(tree):
        raise RuntimeError("synthetic poisoned buffer")

    monkeypatch.setattr(EM.jax, "block_until_ready", boom)
    pred, target, proxy = _batch(seed=0)
    tracker.update_per_batch(pred, target, B, model_input=proxy)
    monkeypatch.undo()
    assert tracker._aot is None  # dropped
    assert tracker._aot_hits == 0
    assert not poison.exists()  # disk entry invalidated
    for i in range(1, 3):
        pred, target, proxy = _batch(seed=i)
        tracker.update_per_batch(pred, target, B, model_input=proxy)
    tracker.flush()
    sums = dict(tracker.metric_sums)

    base = EvalMetricsTracker(METRICS, num_samples_for_prob_metrics=N,
                              save_per_frame_metrics=True)
    sums_ref, _ = _run(base)
    for k in sums_ref:
        np.testing.assert_allclose(sums[k], sums_ref[k], rtol=1e-6)


def test_raising_warm_async_leaves_results_correct():
    """(d): warm_async that raises is swallowed; update_per_batch joins the
    thread, falls back to jit, and the final metrics are unaffected."""
    tracker = EvalMetricsTracker(METRICS, num_samples_for_prob_metrics=N)

    def boom(*a, **k):
        raise RuntimeError("synthetic warm failure")

    tracker.warm = boom
    pred, target, proxy = _batch()
    tracker.warm_async(_shapes(pred), _shapes(target), _shapes(proxy))
    sums, _ = _run(tracker)
    assert tracker._aot is None
    assert tracker._aot_hits == 0
    assert tracker._warm_thread is None  # joined and cleared

    base = EvalMetricsTracker(METRICS, num_samples_for_prob_metrics=N)
    sums_ref, _ = _run(base)
    for k in sums_ref:
        np.testing.assert_allclose(sums[k], sums_ref[k], rtol=1e-6)


def test_pipeline_metric_warm_hits_end_to_end(tmp_path, monkeypatch):
    """(e): the eval pipeline's _spawn_metric_warm — whose avals are
    MIRRORED from jax.eval_shape of the eval step rather than taken from
    concrete arrays — produces an executable that actually dispatches on
    the real loop's batches (and on the mesh path, warm is never spawned)."""
    import humaniflow_tpu.pipelines.evaluate as E
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl
    from test_evaluate import _FakeEvalDataset

    cfg = get_humaniflow_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = 32
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 18))
    smpls = [synthetic_smpl(num_verts=64, seed=s) for s in range(3)]

    created = []
    real_tracker = E.EvalMetricsTracker

    def spy(*a, **k):
        t = real_tracker(*a, **k)
        created.append(t)
        return t

    monkeypatch.setattr(E, "EvalMetricsTracker", spy)
    metrics = ["PVE", "MPJPE", "joints2D-L2E", "PVE_samples_min"]
    final = E.evaluate_humaniflow(
        model, params, *smpls, cfg, _FakeEvalDataset(n=6), metrics,
        batch_size=2, num_pred_samples=2,
    )
    (tracker,) = created
    assert tracker._aot is not None, "pipeline warm failed to compile"
    assert tracker._aot_hits >= 2, "AOT executable never dispatched"
    for m in metrics:
        assert np.isfinite(final[m])

    # mesh path: warm is not spawned (executable would be compiled for
    # single-device shardings) — the jit path serves every batch.  Runs in
    # a SUBPROCESS with one retry: this exact multi-device dispatch hits an
    # intermittent silent XLA:CPU runtime abort on this host even in a
    # fresh process (tests/_mesh_eval_subproc.py docstring — upstream
    # runtime issue, not a framework bug; TPU collectives don't share the
    # failing host-thread rendezvous machinery).
    import json
    import subprocess
    import sys as _sys

    expected = json.dumps({m: float(final[m]) for m in metrics})
    here = os.path.dirname(os.path.abspath(__file__))
    for attempt in range(2):
        proc = subprocess.run(
            [_sys.executable, os.path.join(here, "_mesh_eval_subproc.py"),
             expected],
            capture_output=True, text=True, timeout=1800,
            cwd=here,
        )
        if proc.returncode == 0:
            assert "MESH_EVAL_OK" in proc.stdout
            break
        aborted = proc.returncode in (-6, 134)  # SIGABRT
        assert aborted and attempt == 0, (
            f"mesh-half subprocess failed (rc={proc.returncode}):\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
