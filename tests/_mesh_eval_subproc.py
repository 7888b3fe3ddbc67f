"""Subprocess body for test_metrics_aot's mesh half.

Runs the 8-device data-parallel eval with sample metrics and asserts (a) the
pipeline does NOT spawn the AOT metric warm on the mesh path, and (b) the
final metrics match the single-device values passed in as JSON argv[1].

Why a subprocess: this exact program — the jitted metric `_update_step`
dispatched on 8-virtual-device sharded inputs with sample metrics — hits an
intermittent, silent XLA:CPU runtime abort on this 1-core host (SIGABRT
inside the multi-device dispatch; reproduced ~1-in-6 in a FRESH process
with no other device work in flight, so it is not caused by anything this
suite does first).  Once it aborted with an explicit collective-rendezvous
termination ("Expected 8 threads to join ... Exiting to ensure a consistent
program state"); the common mode prints nothing.  Isolating the dispatch in
a child process converts a suite-killer into a retryable failure while
still running the full assertion end-to-end.  The capability under test is
unaffected on real hardware: TPU collectives are ICI ops with no host
thread rendezvous.
"""

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: humaniflow_tpu
sys.path.insert(0, _HERE)  # tests dir: test_evaluate

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_enable_async_dispatch", False)
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402

import humaniflow_tpu.pipelines.evaluate as E  # noqa: E402
from humaniflow_tpu.configs import get_humaniflow_cfg_defaults  # noqa: E402
from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl  # noqa: E402
from humaniflow_tpu.parallel import make_mesh, replicate  # noqa: E402
from test_evaluate import _FakeEvalDataset  # noqa: E402


def main():
    expected = json.loads(sys.argv[1])

    cfg = get_humaniflow_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = 32
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 18))
    smpls = [synthetic_smpl(num_verts=64, seed=s) for s in range(3)]
    metrics = list(expected)

    created = []
    real_tracker = E.EvalMetricsTracker

    def spy(*a, **k):
        t = real_tracker(*a, **k)
        created.append(t)
        return t

    E.EvalMetricsTracker = spy
    mesh = make_mesh(8)
    final_m = E.evaluate_humaniflow(
        model, replicate(params, mesh), *smpls, cfg, _FakeEvalDataset(n=6),
        metrics, batch_size=2, num_pred_samples=2, mesh=mesh,
    )
    (tracker_m,) = created
    assert tracker_m._aot is None, "mesh path must not spawn the AOT warm"
    assert tracker_m._aot_hits == 0
    for m in metrics:
        np.testing.assert_allclose(final_m[m], expected[m], rtol=1e-4)
    print("MESH_EVAL_OK")


if __name__ == "__main__":
    main()
