"""Train-render decomposition + z-buffered kernel roofline (VERDICT r4 #4).

At the SHIPPED train config (B=72, 256², face-mode texels, cull, k_max=512,
table_mode) this splits the fused render into its subparts and accounts the
Pallas kernel's edge-test + ROP volume against the VPU's vector-op peak —
the roofline statement the coverage kernel got in r3 and the train kernel
never did.

Accounting model (binned_rasterizer._make_kernel, table_mode, n_const=4,
no lin, no z_grads): per live candidate slot the kernel evaluates on an
(8, 128) strip tile:
    w0, w1        2 FMA-pairs each        4 vector ops
    w2            1 sub                   1
    z             2 FMA                   2
    inside+ztest  min,min,cmp,cmp,and     5
    selects       depth + 4 const attrs   5
  ≈ 17 (8, 128) vector ops/slot (+9 scalar loads that pipeline against
  them on the scalar core).  Strips iterate only their live window
  [lo, hi), so total volume = Σ_meshes Σ_strips (hi − lo) × 17 ops.

Usage:  python scripts/profile_train_render_roofline.py  (runs on the TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 72
IMG = 256
KMAX = 512
OPS_PER_SLOT = 17  # see module docstring


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from humaniflow_tpu.models import synthetic_smpl
    from humaniflow_tpu.models.smpl import smpl_forward
    from humaniflow_tpu.ops.so3 import so3_exp
    from humaniflow_tpu.render.binned_rasterizer import (
        FACE_CHUNK,
        _bin_faces,
        rasterize_binned_with_attrs,
    )
    from humaniflow_tpu.render.rasterizer import project_perspective_screen
    from humaniflow_tpu.render.renderer import load_densepose_uv

    smpl = synthetic_smpl(num_verts=6890)
    dp = load_densepose_uv(None)
    rng = np.random.default_rng(0)
    pose = jnp.asarray(rng.normal(scale=0.3, size=(B, 23, 3)), jnp.float32)
    shape = jnp.asarray(rng.normal(size=(B, 10)), jnp.float32)
    verts = smpl_forward(
        smpl, shape, so3_exp(pose), jnp.tile(jnp.eye(3), (B, 1, 1))
    )["vertices"]
    cam_t = jnp.tile(jnp.asarray([[0.0, 0.2, 2.5]], jnp.float32), (B, 1))
    sv = project_perspective_screen(verts[:, dp["vertex_map"]], cam_t, 300.0, IMG)
    faces = dp["faces"]
    f = faces.shape[0]
    const = jnp.asarray(rng.uniform(size=(B, f, 4)), jnp.float32)

    kw = dict(const_attrs=const, emit_frags=False, k_max=KMAX, row_cand=6,
              cull_sign=1)

    # ---- end-to-end: table mode vs gather mode ----
    for mode in (True, False):
        extra = {} if mode else {"live_cap": 28672}
        t = timed(
            jax.jit(lambda s, c, m=mode, e=tuple(extra.items()):
                    rasterize_binned_with_attrs(
                        s, faces, IMG, table_mode=m, **dict(kw, const_attrs=c),
                        **dict(e))),
            sv, const)
        print(f"  rasterize_with_attrs table_mode={mode}: {t:7.2f} ms")

    # ---- binning-only (prologue) at the same config ----
    tri = sv[:, faces].reshape(B, f, 9)
    h = w = IMG

    bin_only = jax.jit(lambda t: jax.vmap(
        lambda tt: _bin_faces(tt, f, h, w, KMAX, 6, cull_sign=1,
                              gather_coefs=False)
    )(t))
    t_bin = timed(bin_only, tri)
    print(f"  binning prologue (sort, no gather):  {t_bin:7.2f} ms")

    # ---- live-slot census → roofline ----
    bounds, fids, _, ov, _ = jax.block_until_ready(bin_only(tri))
    lo = np.asarray(bounds[..., 0], np.int64)
    hi = np.asarray(bounds[..., 1], np.int64)
    slots = np.maximum(hi - lo, 0)
    # the chunked fori_loop rounds each strip's window to its covering
    # FACE_CHUNK-aligned chunk intersection; measure both ideal and chunked
    total_slots = int(slots.sum())
    n_strips = slots.shape[1]
    ops = total_slots * OPS_PER_SLOT
    # v5e VPU: 8 lanes × 128 sublanes × 4 ALUs? — use the measured vector
    # throughput the coverage roofline used: ~7.7 T (8,128)-elementwise
    # op/s ≡ 7.5e9 (8,128) vreg-ops/s
    vreg_ops_per_s = 7.7e12 / (8 * 128)
    t_floor_ms = ops / vreg_ops_per_s * 1e3
    print(f"  live slots: {total_slots} over {B}x{n_strips} strips "
          f"(mean {slots.mean():.0f}/strip)")
    print(f"  kernel roofline @{OPS_PER_SLOT} vops/slot: {t_floor_ms:7.2f} ms")
    print(f"  overflow (union counter): {int(np.asarray(ov).sum())}")


if __name__ == "__main__":
    main()
