"""Micro-profile of the coverage (silhouette) binning prologue at SSP-3D
sample-silhouette scale (VERDICT r4 item 3).

The SSP-3D protocol renders B·N = 3200 sample silhouettes per batch; at the
shipped config (64-row strips, k_max=8576, tall_cap=512, live_cap=16384,
cull_sign=1) the binned coverage path costs ~0.59 ms/mesh.  This script
splits it into separately-jitted parts at chunk scale (b = 256 meshes per
launch, matching pipelines/evaluate.py chunk=8 · B=32):

  full          rasterize_binned_coverage (the shipped path)
  bin_only      vmapped _bin_faces (everything before the kernel)
  keys_only     bbox + key build + concatenate (no sort)
  keybuild+sort key build + the single packed sort
  raw_sort      jnp.sort of random int32 of the same (b, n_keys) shape —
                the attainability floor for the sort step
  gather_only   live-prefix coefficient gather + 128-aligned row gathers
  kernel_only   pallas coverage kernel on pre-binned tables

`extra`:  occupancy stats + k_max sensitivity.
`extra2`: bin_only sub-stages (tall nonzero, searchsorted, edge coeffs,
          the live random gather).

Usage: python scripts/profile_coverage_parts.py [extra|extra2]
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
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

IMG = 256
CFG = dict(strip_rows=64, k_max=8576, row_cand=6, tall_cap=512,
           live_cap=16384, cull_sign=1)


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def _setup(b):
    from humaniflow_tpu.models import synthetic_smpl
    from humaniflow_tpu.render import binned_rasterizer as BR
    from humaniflow_tpu.render.renderer import TexturedIUVRenderer

    renderer = TexturedIUVRenderer(img_wh=IMG, projection_type="orthographic",
                                   render_rgb=False)
    faces = renderer.dp["faces"]
    f = int(faces.shape[0])
    # realistic screen-space vertices: body-ish blobs at eval cam scale
    rng = np.random.default_rng(0)
    smpl = synthetic_smpl(num_verts=6890, seed=0)
    v = np.asarray(smpl.v_template)[renderer.dp["vertex_map"]]
    v = v[None] + rng.normal(size=(b, *v.shape)).astype(np.float32) * 0.02
    cam = np.stack([
        rng.uniform(0.6, 0.9, b), rng.uniform(-0.1, 0.1, b),
        rng.uniform(-0.1, 0.1, b),
    ], -1).astype(np.float32)
    cam_t = np.stack([cam[:, 1], cam[:, 2], np.full(b, 2.5, np.float32)], -1)
    screen = jax.block_until_ready(renderer._screen_verts(
        jnp.asarray(v), jnp.asarray(cam_t), jnp.asarray(cam[:, [0, 0]])
    ))
    tri = jax.block_until_ready(
        jax.jit(lambda s: s[:, faces].reshape(b, f, 9))(screen))
    return BR, faces, f, rng, screen, tri


def main():
    b = 256
    BR, faces, f, rng, screen, tri = _setup(b)

    results = {}
    full = jax.jit(lambda s: BR.rasterize_binned_coverage(
        s, faces, IMG, **CFG))
    results["full"] = timed(full, screen)
    mask, overflow = full(screen)
    print("overflow sum:", int(jnp.sum(overflow)),
          "cover px/mesh:", float(mask.sum()) / b)

    bin_fn = jax.jit(lambda t: jax.vmap(lambda tt: BR._bin_faces(
        tt, f, IMG, IMG, CFG["k_max"], CFG["row_cand"], n_coef=6,
        cull_sign=CFG["cull_sign"], tall_cap=CFG["tall_cap"], z_order=False,
        live_cap=CFG["live_cap"], strip_rows=CFG["strip_rows"]))(t))
    results["bin_only"] = timed(bin_fn, tri)
    bounds, fids, coefs, ov, _ = jax.block_until_ready(bin_fn(tri))

    # key build alone (mirrors _bin_faces up to the sort)
    def keys_of(t):
        def one(tri1):
            sr, sc = CFG["strip_rows"], BR.STRIP_COLS
            n_row, n_col = IMG // sr, IMG // sc
            s = n_row * n_col
            xs, ys = tri1[:, 0::3], tri1[:, 1::3]
            r0 = jnp.floor(ys.min(1) / sr).astype(jnp.int32)
            r1 = jnp.floor(ys.max(1) / sr).astype(jnp.int32)
            c0 = jnp.floor(xs.min(1) / sc).astype(jnp.int32)
            c1 = jnp.floor(xs.max(1) / sc).astype(jnp.int32)
            x0, y0 = tri1[:, 0], tri1[:, 1]
            x1, y1 = tri1[:, 3], tri1[:, 4]
            x2, y2 = tri1[:, 6], tri1[:, 7]
            area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
            keep = area > 0
            fid = jnp.arange(f, dtype=jnp.int32)
            out = []
            for dr in range(2):
                r = r0 + dr
                row_ok = (r <= r1) & (r >= 0) & (r < n_row) & keep
                for ci, c in enumerate((c0, c1)):
                    col_ok = (c >= 0) & (c < n_col) & ((ci == 0) | (c1 > c0))
                    ok = row_ok & col_ok
                    key = jnp.where(ok, r * n_col + c, s)
                    out.append((key << 14) | fid)
            return jnp.concatenate(out)
        return jax.vmap(one)(t)
    keys_fn = jax.jit(keys_of)
    results["keys_only"] = timed(keys_fn, tri)

    sort_fn = jax.jit(lambda t: jnp.sort(keys_of(t), axis=-1))
    results["keybuild+sort"] = timed(sort_fn, tri)

    raw = jnp.asarray(
        rng.integers(0, 2**30, size=(b, 13774 * 4 + CFG["tall_cap"] * 8),
                     dtype=np.int32))
    raw_sort = jax.jit(lambda a: jnp.sort(a, axis=-1))
    results["raw_sort_same_n"] = timed(raw_sort, raw)

    # gather step alone: from sorted packed keys to (S, K_slots, 6) tables
    def gather_of(t, packed_sorted):
        def one(tri1, packed):
            sr = CFG["strip_rows"]
            s = (IMG // sr) * (IMG // BR.STRIP_COLS)
            k_max, live_cap = CFG["k_max"], CFG["live_cap"]
            keys_ = packed >> 14
            vals = packed & 0x3FFF
            n = vals.shape[0]
            n_pad = -(-n // BR.FACE_CHUNK) * BR.FACE_CHUNK
            vals = jnp.pad(vals, (0, n_pad - n))
            start = jnp.searchsorted(
                keys_, jnp.arange(s + 1, dtype=jnp.int32)).astype(jnp.int32)
            row_lo = start[:-1] // BR.FACE_CHUNK
            n_rows = k_max // BR.FACE_CHUNK + 1
            max_row = n_pad // BR.FACE_CHUNK - 1
            ridx = jnp.clip(
                row_lo[:, None] + jnp.arange(n_rows, dtype=jnp.int32)[None],
                0, max_row)
            coefs_ = BR._edge_plane_coeffs(tri1)[..., :6]
            cpre = coefs_[vals[:live_cap]].reshape(
                live_cap // BR.FACE_CHUNK, BR.FACE_CHUNK, 6)
            pad_blk = jnp.zeros((1, BR.FACE_CHUNK, 6)).at[..., 2].set(-1.0)
            cpre = jnp.concatenate([cpre, pad_blk], axis=0)
            ridx_c = jnp.minimum(ridx, live_cap // BR.FACE_CHUNK)
            return cpre[ridx_c].reshape(s, -1, 6)
        return jax.vmap(one)(t, packed_sorted)
    packed_sorted = jax.block_until_ready(sort_fn(tri))
    gather_fn = jax.jit(gather_of)
    results["gather_only"] = timed(gather_fn, tri, packed_sorted)

    # kernel alone on pre-binned tables
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    sr = CFG["strip_rows"]
    n_col_strips = IMG // BR.STRIP_COLS
    s = (IMG // sr) * n_col_strips
    k_slots = CFG["k_max"] + BR.FACE_CHUNK

    def kernel_only(bounds_, coefs_):
        bounds_in = bounds_.reshape(b, s, 1, 2)
        coefs_in = coefs_.swapaxes(-1, -2)
        return pl.pallas_call(
            BR._make_coverage_kernel(n_col_strips, sr),
            grid=(b, s),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 2), lambda bi, si: (bi, si, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 6, k_slots),
                             lambda bi, si: (bi, si, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[pl.BlockSpec(
                (1, sr, BR.STRIP_COLS),
                lambda bi, si: (bi, si // n_col_strips, si % n_col_strips),
                memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((b, IMG, IMG), jnp.float32)],
        )(bounds_in, coefs_in)[0]
    kern_fn = jax.jit(kernel_only)
    results["kernel_only"] = timed(kern_fn, bounds, coefs)

    print(f"\ncoverage-path per-part timing  b={b}  {IMG}²  "
          f"({jax.devices()[0]})")
    for k, v in results.items():
        print(f"  {k:<18s} {v:8.2f} ms  ({v / b * 1000:6.1f} µs/mesh)")


def extra():
    """Occupancy stats + full-path k_max sensitivity."""
    b = 256
    BR, faces, f, rng, screen, tri = _setup(b)

    def stats(t):
        def one(tri1):
            bounds, fids, coefs, ov, _ = BR._bin_faces(
                tri1, f, IMG, IMG, CFG["k_max"], CFG["row_cand"], n_coef=6,
                cull_sign=CFG["cull_sign"], tall_cap=CFG["tall_cap"],
                z_order=False, live_cap=CFG["live_cap"],
                strip_rows=CFG["strip_rows"])
            counts = bounds[:, 1] - bounds[:, 0]
            return counts.max(), counts.sum()
        mx, tot = jax.vmap(one)(t)
        return mx.max(), tot.max(), tot.mean()
    mx, tot_mx, tot_mean = jax.jit(stats)(tri)
    print(f"max strip count: {int(mx)}  max live/mesh: {int(tot_mx)}  "
          f"mean live/mesh: {float(tot_mean):.0f}")

    for km in (8576, 4224, 2176):
        cfg2 = dict(CFG, k_max=km)
        fullk = jax.jit(lambda s: BR.rasterize_binned_coverage(
            s, faces, IMG, **cfg2))
        t = timed(fullk, screen)
        _, ov = fullk(screen)
        print(f"  full k_max={km:5d}  {t:8.2f} ms ({t / b * 1000:6.1f} "
              f"µs/mesh)  overflow={int(jnp.sum(ov))}")


def extra2():
    """bin_only sub-stages: tall nonzero, searchsorted, edge coeffs, the
    live random gather."""
    b = 256
    BR, faces, f, rng, screen, tri = _setup(b)
    results = {}
    sr = CFG["strip_rows"]
    s = (IMG // sr) * (IMG // BR.STRIP_COLS)

    def keys_tall(t):
        def one(tri1):
            ys = tri1[:, 1::3]
            r0 = jnp.floor(ys.min(1) / sr).astype(jnp.int32)
            r1 = jnp.floor(ys.max(1) / sr).astype(jnp.int32)
            x0, y0 = tri1[:, 0], tri1[:, 1]
            x1, y1 = tri1[:, 3], tri1[:, 4]
            x2, y2 = tri1[:, 6], tri1[:, 7]
            area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
            keep = area > 0
            tall_m = (r1 - r0 > 1) & keep & (r1 >= 0) & (r0 < IMG // sr)
            n_tall = tall_m.sum().astype(jnp.int32)
            tidx = jnp.nonzero(tall_m, size=CFG["tall_cap"], fill_value=0)[0]
            return n_tall, tidx.sum()
        return jax.vmap(one)(t)
    results["tall_nonzero"] = timed(jax.jit(keys_tall), tri)

    n_keys = f * 4 + CFG["tall_cap"] * 8
    keys_sorted = jax.block_until_ready(jax.jit(
        lambda a: jnp.sort(a, axis=-1))(jnp.asarray(
            rng.integers(0, s, size=(b, n_keys), dtype=np.int32))))

    def ss(ks):
        def one(k1):
            return jnp.searchsorted(k1, jnp.arange(s + 1, dtype=jnp.int32))
        return jax.vmap(one)(ks)
    results["searchsorted"] = timed(jax.jit(ss), keys_sorted)

    coef_fn = jax.jit(lambda t: jax.vmap(
        lambda t1: BR._edge_plane_coeffs(t1)[..., :6])(t))
    results["edge_coeffs"] = timed(coef_fn, tri)

    coefs_all = jax.block_until_ready(coef_fn(tri))
    vals = jnp.asarray(rng.integers(0, f, size=(b, CFG["live_cap"]),
                                    dtype=np.int32))
    gath = jax.jit(lambda c, v_: jnp.take_along_axis(
        c, v_[..., None], axis=1))
    results["live_rand_gather"] = timed(gath, coefs_all, vals)

    print(f"\nbin_only sub-stages  b={b}")
    for k, v_ in results.items():
        print(f"  {k:<18s} {v_:8.2f} ms  ({v_ / b * 1000:6.1f} µs/mesh)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        extra()
    elif len(sys.argv) > 1 and sys.argv[1] == "extra2":
        extra2()
    else:
        main()
