"""Micro-profile of the binned-render pipeline's subparts at training scale.

Breaks renderer._render_binned_fused (B=72, 256², perspective, pixel-mode
textures) into separately-jitted pieces: screen projection, triangle
gather, candidate sort, coefficient gather, Pallas kernel, post-raster
texture-atlas gather — so the 'render 262 ms' line in
scripts/profile_synth_stages.py gets an actionable breakdown.

Usage:  python scripts/profile_render_parts.py  (runs on the TPU)
"""

import math
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


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from humaniflow_tpu.models import synthetic_smpl
    from humaniflow_tpu.models.smpl import smpl_forward
    from humaniflow_tpu.ops.so3 import so3_exp
    from humaniflow_tpu.render import TexturedIUVRenderer
    from humaniflow_tpu.render.binned_rasterizer import (
        _bin_faces,
        _edge_plane_coeffs,
        rasterize_binned_with_attrs,
    )
    from humaniflow_tpu.render.rasterizer import project_perspective_screen

    smpl = synthetic_smpl(num_verts=6890)
    renderer = TexturedIUVRenderer(
        img_wh=IMG, projection_type="perspective", focal_length=300.0,
        render_rgb=True, rasterizer="binned",
    )
    dp = renderer.dp
    faces = dp["faces"]
    f = faces.shape[0]

    rng = np.random.default_rng(0)
    pose72 = jnp.asarray(rng.normal(scale=0.3, size=(B, 72)), jnp.float32)
    texture = jnp.asarray(rng.uniform(size=(B, 1200, 800, 3)), jnp.float32)
    cam_t = jnp.asarray(
        np.stack([rng.normal(0, 0.05, B), rng.normal(0, 0.05, B),
                  np.full(B, 2.5)], -1), jnp.float32)

    pose_r24 = so3_exp(pose72.reshape(B, 24, 3))
    out = smpl_forward(smpl, jnp.zeros((B, 10)), pose_r24[:, 1:], pose_r24[:, 0])
    verts = jax.block_until_ready(out["vertices"])
    dp_verts = verts[:, dp["vertex_map"]]
    screen = jax.block_until_ready(
        project_perspective_screen(dp_verts, cam_t, 300.0, IMG))

    results = {}

    # full fused render (reference point)
    def full(v, c, t):
        r = renderer._render_jit(v, c, None, t, None, None)
        return r["iuv_images"], r["rgb_images"]

    full_j = jax.jit(full)
    full_j(verts, cam_t, texture)
    results["0_full_render"] = timed(full_j, verts, cam_t, texture)

    # triangle gather: verts_screen[:, faces]
    tri_j = jax.jit(lambda s: s[:, faces].reshape(B, f, 9))
    tri = jax.block_until_ready(tri_j(screen))
    results["1_tri_gather"] = timed(tri_j, screen)

    # attribute coefficient rows (XLA elementwise build, pre-gather)
    uv_tri = jnp.stack([dp["u"], dp["v"]], axis=-1)[faces][None]
    au_tri = jnp.stack([dp["atlas_u"], dp["atlas_v"]], axis=-1)[faces][None]
    lin = jnp.concatenate([
        jnp.broadcast_to(uv_tri, (B,) + uv_tri.shape[1:]),
        jnp.broadcast_to(au_tri, (B,) + au_tri.shape[1:]),
    ], axis=-1)
    part_const = dp["face_part"].astype(jnp.float32)[None, :, None]

    def build_rows(tri, lin):
        av = jnp.broadcast_to(lin, (B, f, 3, 4))
        d0 = av[..., 0, :] - av[..., 2, :]
        d1 = av[..., 1, :] - av[..., 2, :]
        c = av[..., 2, :]
        rows = jnp.stack([d0, d1, c], axis=-1).reshape(B, f, 12)
        coefs = _edge_plane_coeffs(tri)
        return jnp.concatenate(
            [coefs, rows, jnp.broadcast_to(part_const, (B, f, 1))], axis=-1)

    rows_j = jax.jit(build_rows)
    extra = jax.block_until_ready(rows_j(tri, lin))
    results["2_coef_rows_build"] = timed(rows_j, tri, lin)

    # candidate sort + window build + coefficient gather (the _bin_faces body)
    bin_j = jax.jit(jax.vmap(
        lambda t, e: _bin_faces(t, f, IMG, IMG, 896, 6, extra_rows=e[..., 9:])))
    # NOTE: _bin_faces internally recomputes edge coeffs; pass attr rows only
    bounds, fids, coefs, overflow, _ = jax.block_until_ready(bin_j(tri, extra))
    results["3_bin_sort_gather"] = timed(bin_j, tri, extra)

    # sort alone
    def sort_only(t):
        xs = t[:, :, 0::3]
        ys = t[:, :, 1::3]
        r0 = jnp.floor(ys.min(2) / 8).astype(jnp.int32)
        r1 = jnp.floor(ys.max(2) / 8).astype(jnp.int32)
        c0 = jnp.floor(t[:, :, 0::3].min(2) / 128).astype(jnp.int32)
        fid = jnp.broadcast_to(jnp.arange(f, dtype=jnp.int32), (B, f))
        keys = []
        vals = []
        for dr in range(6):
            for c in range(2):
                k = (r0 + dr) * 2 + c0 + c
                keys.append(jnp.where((r0 + dr <= r1), k, 32 * 2))
                vals.append(fid)
        keys = jnp.concatenate(keys, axis=1)
        vals = jnp.concatenate(vals, axis=1)
        return jax.lax.sort_key_val(keys, vals, dimension=1)

    sort_j = jax.jit(sort_only)
    jax.block_until_ready(sort_j(tri))
    results["3a_sort_only"] = timed(sort_j, tri)

    # coefficient gather alone (aligned-row fids gather + coefs[fids])
    gather_j = jax.jit(jax.vmap(lambda c, i: c[i]))
    all_coefs = jax.block_until_ready(
        jax.jit(lambda t, e: jnp.concatenate([_edge_plane_coeffs(t), e[..., 9:]], -1))(tri, extra))
    jax.block_until_ready(gather_j(all_coefs, fids))
    results["3b_coef_gather_only"] = timed(gather_j, all_coefs, fids)

    # Pallas kernel (attrs fused, z_grads) — the fused path's configuration:
    # atlas-uv lin attrs only, no face/bary outputs (emit_frags=False)
    lin_fused = jnp.broadcast_to(au_tri, (B,) + au_tri.shape[1:])
    kern_j = jax.jit(lambda s: rasterize_binned_with_attrs(
        s, faces, IMG, lin_attrs=lin_fused, const_attrs=part_const,
        z_grads=True, emit_frags=False))
    frags, planes, _, _ = jax.block_until_ready(kern_j(screen))
    results["4_kernel_plus_bin"] = timed(kern_j, screen)

    # texture-atlas per-pixel gather (current XLA form)
    atlas_uv = jax.block_until_ready(planes[..., 0:2])

    def tex_gather(textures, atlas_uv):
        th, tw = 1200, 800
        tx = jnp.clip(atlas_uv[..., 0] * (tw - 1), 0, tw - 1)
        ty = jnp.clip(atlas_uv[..., 1] * (th - 1), 0, th - 1)
        return jax.vmap(
            lambda tex, y, x: tex[jnp.round(y).astype(jnp.int32),
                                  jnp.round(x).astype(jnp.int32)]
        )(textures, ty, tx)

    tex_j = jax.jit(tex_gather)
    jax.block_until_ready(tex_j(texture, atlas_uv))
    results["5_texture_gather"] = timed(tex_j, texture, atlas_uv)

    # texture gather, linear single-index variant
    def tex_gather_lin(textures, atlas_uv):
        th, tw = 1200, 800
        tx = jnp.round(jnp.clip(atlas_uv[..., 0] * (tw - 1), 0, tw - 1)).astype(jnp.int32)
        ty = jnp.round(jnp.clip(atlas_uv[..., 1] * (th - 1), 0, th - 1)).astype(jnp.int32)
        flat = textures.reshape(B, th * tw, 3)
        idx = ty * tw + tx
        return jax.vmap(lambda t, i: t[i])(flat, idx)

    texl_j = jax.jit(tex_gather_lin)
    jax.block_until_ready(texl_j(texture, atlas_uv))
    results["5b_texture_gather_linear"] = timed(texl_j, texture, atlas_uv)

    print(f"\nbinned-render per-part timing  B={B}  {IMG}²  ({jax.devices()[0]})")
    for k, v in sorted(results.items()):
        print(f"  {k:<26s} {v * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
