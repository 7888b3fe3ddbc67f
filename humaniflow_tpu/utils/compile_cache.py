"""Persistent XLA compile cache for the user-facing CLIs.

Cold compiles of the full jitted programs are minutes-scale on a small host
(docs/DESIGN.md "Measurement methodology"); JAX's persistent compilation
cache makes every later CLI invocation start in seconds.  The cache
location is ``HFT_COMPILE_CACHE`` if set, else
``~/.cache/humaniflow_tpu/jax``; setting ``HFT_COMPILE_CACHE=0`` disables
it (e.g. read-only home directories).
"""

import os


def enable_persistent_compile_cache() -> None:
    import jax

    path = os.environ.get("HFT_COMPILE_CACHE")
    if path == "0":
        return
    if not path:
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "humaniflow_tpu", "jax"
        )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimisation, never a hard requirement
