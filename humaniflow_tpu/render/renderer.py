"""Textured IUV renderer: silhouette / IUV / depth / Phong-shaded RGB renders
of SMPL meshes.

Capability parity with reference
`utils/renderers/pytorch3d_textured_renderer.py:73-298` (the pytorch3d-backed
TexturedIUVRenderer) on the TPU rasterizer:

* DensePose UV preprocessing (:22-70): remap 6890 SMPL verts → 7829 DensePose
  verts, per-part texture-atlas UV offsets, per-face part indices;
* IUV renders with flat part/UV shading (training seg labels + eval
  silhouettes), RGB renders with textured Phong shading (synthetic training
  images, visualisations), depth maps;
* orthographic (weak-perspective) or perspective camera, per-call cam/light
  overrides (:258-271).

The camera convention matches ops/camera.orthographic_project +
undo_keypoint_normalisation: callers pass meshes already flipped by the
x-axis-π rotation exactly as the reference does before rendering.
"""

from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import paths
from .rasterizer import (
    face_normals,
    project_orthographic_screen,
    project_perspective_screen,
    rasterize,
)


def load_densepose_uv_host(mat_path: Optional[str] = None):
    """Host (numpy) DensePose UV data — computed once per process, no device
    involvement.

    Host-side consumers (synthetic-SMPL template construction, test setup)
    must use THIS loader: reading the device copies back with ``np.asarray``
    costs 30–200 s through the benchmark environment's tunneled TPU even for
    these ~200 KB tables (scripts/profile_cold_start.py — it was the
    dominant term of every CLI's cold start).
    """
    return dict(_densepose_uv_host(mat_path or paths.DENSEPOSE_UV))


def load_densepose_uv(mat_path: Optional[str] = None):
    """Load DensePose UV processing data (texture atlas layout) on device.

    :return: dict with faces (13774, 3) into 7829 DP verts, vertex_map
        (7829,) into 6890 SMPL verts, face_part (13774,), u/v (7829,) in
        [0, 1], and atlas-space u/v (7829,) indexing the 4×6 SURREAL texture
        atlas (800×1200), matching the reference's offset_uv preprocessing
        (pytorch3d_textured_renderer.py:39-70).
    """
    host = _densepose_uv_host(mat_path or paths.DENSEPOSE_UV)
    return {k: jnp.asarray(v) for k, v in host.items()}


@lru_cache(maxsize=4)
def _densepose_uv_host(mat_path: str):
    from scipy.io import loadmat

    m = loadmat(mat_path)
    faces = np.asarray(m["All_Faces"], np.int64) - 1          # (13774, 3)
    vertex_map = np.asarray(m["All_vertices"], np.int64)[0] - 1  # (7829,)
    face_part = np.asarray(m["All_FaceIndices"], np.int64)[:, 0]  # (13774,)
    u = np.asarray(m["All_U_norm"], np.float64)[:, 0]
    v = np.asarray(m["All_V_norm"], np.float64)[:, 0]

    # Per-vertex part index: take it from any face containing the vertex
    # (parts partition the DP vertex set).
    vert_part = np.zeros(7829, np.int64)
    vert_part[faces.reshape(-1)] = np.repeat(face_part, 3)

    # SURREAL texture atlas: 4 columns × 6 rows of per-part tiles.
    # Part i (1..24) occupies tile ((i-1)//4 row, (i-1)%4 col); within the
    # tile, u is horizontal and (1-v) vertical.
    col = (vert_part - 1) % 4
    row = (vert_part - 1) // 4
    atlas_u = (col + u) / 4.0          # in [0, 1] over atlas width
    atlas_v = (row + (1.0 - v)) / 6.0  # in [0, 1] over atlas height

    return {
        "faces": np.asarray(faces, np.int32),
        "vertex_map": np.asarray(vertex_map, np.int32),
        "face_part": np.asarray(face_part, np.int32),
        "u": np.asarray(u, np.float32),
        "v": np.asarray(v, np.float32),
        "atlas_u": np.asarray(atlas_u, np.float32),
        "atlas_v": np.asarray(atlas_v, np.float32),
        # face-centroid atlas UV (faces never span part tiles, so the mean
        # stays inside the face's tile) — texture_sampling="face" lookups
        "face_atlas_u": np.asarray(atlas_u[faces].mean(1), np.float32),
        "face_atlas_v": np.asarray(atlas_v[faces].mean(1), np.float32),
    }


DEFAULT_LIGHTS = {
    "location": jnp.asarray([[0.0, -0.8, -2.0]], jnp.float32),
    "ambient_color": 0.5 * jnp.ones((1, 3), jnp.float32),
    "diffuse_color": 0.3 * jnp.ones((1, 3), jnp.float32),
    "specular_color": jnp.zeros((1, 3), jnp.float32),
}


@dataclass
class TexturedIUVRenderer:
    """TPU renderer over SMPL meshes.

    :param projection_type: 'orthographic' (eval/vis) or 'perspective'
        (training data gen, focal 300 — reference :153-163).
    """

    img_wh: int = 256
    projection_type: str = "orthographic"
    focal_length: float = 300.0
    render_rgb: bool = True
    uv_mat_path: Optional[str] = None
    chunk: int = 2048
    # Rasterizer backend:
    #   "xla"    — exact z-buffer scan over face chunks (works everywhere);
    #   "tiled"  — tile-culled Pallas kernel (render/pallas_rasterizer.py),
    #              exact, ~2x faster than xla at large batch on TPU;
    #   "binned" — per-strip binned Pallas kernel with in-kernel attribute
    #              interpolation (render/binned_rasterizer.py), ~17x faster
    #              than xla at training batch on TPU; near-exact (measured
    #              agreement incl. worst-case stretched meshes in
    #              docs/DESIGN.md "Binned rasterizer approximation" — use
    #              for the synthetic-training-data renders, keep exact
    #              backends for metric-bearing eval renders).
    # Falls back to "xla" on CPU or when img_wh isn't a multiple of 128.
    rasterizer: str = "xla"
    use_pallas: bool = False  # back-compat alias for rasterizer="tiled"
    # binned backend: row-strip candidates per face (faces taller than
    # row_cand·8 px are dropped; 6 covers real SMPL meshes — raise for
    # meshes with heavily stretched faces, see binned_rasterizer.py)
    binned_row_cand: int = 6
    # (the silhouette path's binning capacities are fixed inside
    # _render_silhouette_binned_impl — 32-row strips, see there)
    # fused train render: live-prefix coefficient gather cap (see
    # binned_rasterizer._bin_faces live_cap) — 118.6 -> 110.9 ms/batch at
    # training scale with identical output; worst measured live-candidate
    # count is 38.1k/mesh, overflowing candidates read a never-inside pad
    # block and are counted in overflow
    binned_live_cap: int = 49152
    # fused train render: two-level binning cap (binned_rasterizer._bin_faces
    # tall_cap).  Default None (flat binning): at 8-row strips "tall"
    # (≥3-strip) faces are common enough that accuracy-preserving caps
    # measured a net LOSS at training scale (106 → 120-130 ms at
    # tall_cap=4096/6144; docs/DESIGN.md) — the side table's nonzero +
    # index gathers cost more than the sort-key reduction saves.  The knob
    # may win on real SMPL meshes (far fewer stretched faces); measure
    # before enabling.
    binned_tall_cap: Optional[int] = None
    # back-face culling for the fused train render: exact for closed,
    # consistently-wound, NON-self-intersecting meshes (real SMPL bodies
    # under training poses).  Measured at training scale on the synthetic
    # mesh: 96.6 -> 84.3 ms (-13%; the coefficient gather and kernel
    # halve but the sort does not), silhouette masks IDENTICAL, winner
    # flips confined to the synthetic mesh's self-intersecting geometry
    # (its random blendshapes cross faces even near rest — real SMPL does
    # not).  Default OFF; scripts/run_train.py --cull.
    binned_cull: bool = False
    # binned backend texture filtering: "pixel" = per-pixel atlas lookup
    # (reference semantics, one XLA gather pass); "vertex" = sample texels
    # once per DP vertex and interpolate in-kernel (loses sub-face texture
    # detail); "face" = one texel per face centroid carried as an in-kernel
    # constant attribute with flat (per-face) lighting folded in — at
    # training scale faces project to ~1-2 px so per-face texels keep
    # per-pixel-level texture frequency while removing the per-pixel atlas
    # gather AND the shading planes entirely (docs/DESIGN.md "Texture
    # sampling modes")
    texture_sampling: str = "pixel"
    # binned backend: skip the atlas-UV attribute planes and emit U=V=0 in
    # iuv_images — for consumers that only use the part channel (the
    # training synth-data path reads iuv[..., 0] and rgb only)
    emit_uv: bool = True
    # binned backend: per-strip face-candidate capacity.  Candidates are
    # z-sorted near-to-far within each strip, so overflow drops only the
    # FARTHEST (z-buffer-occluded) faces — lower values cut the coefficient
    # -gather and kernel-chunk cost (see binned_rasterizer.rasterize_binned)
    binned_k_max: int = 896
    # silhouette path: route render_silhouette_with_overflow through the
    # exact per-pixel coverage scan instead of the culled binned kernel —
    # bit-exact by construction (no seam-hole/overflow caveats) at ~3x the
    # cost.  scripts/run_evaluate.py --exact_silhouettes.
    silhouette_exact: bool = False
    # binned backend: look edge/attribute coefficients up in-kernel from a
    # per-mesh SMEM table (DMA'd once per mesh) instead of gathering
    # per-slot coefficient windows — removes the binning's per-slot gather
    # (the largest non-kernel cost at training scale) and the live_cap
    # drop source entirely.  Auto-falls back to the gathered-window path
    # for attribute configs whose table exceeds the SMEM budget (>16 rows:
    # vertex-texel / verts-features modes).  docs/DESIGN.md r5.
    binned_table_mode: bool = True
    # include "binning_overflow" (scalar int32) in the render output:
    # CONTENT-dropping candidates this call — i.e. the binned backend's
    # live_cap drops, which remove bottom-image-strip candidates outright
    # (k_max drops only z-occluded far faces on this z-ordered path and are
    # excluded; binned_rasterizer._bin_faces).  Long-running consumers (the
    # train loop) surface it to the operator per epoch.  Always 0 for the
    # exact xla/tiled backends.
    emit_overflow: bool = False

    def __post_init__(self):
        assert self.projection_type in ("orthographic", "perspective")
        self.dp = load_densepose_uv(self.uv_mat_path)
        if self.use_pallas and self.rasterizer == "xla":
            self.rasterizer = "tiled"
        assert self.rasterizer in ("xla", "tiled", "binned")
        if self.rasterizer != "xla" and (
            jax.default_backend() == "cpu" or self.img_wh % 128 != 0
        ):
            self.rasterizer = "xla"
        # jit the whole render pipeline (None args are empty pytrees; a
        # None→array change simply retraces)
        self._render_jit = jax.jit(self._render)
        self._silhouette_jit = jax.jit(self._render_silhouette_impl)
        assert self.texture_sampling in ("pixel", "vertex", "face")
        # silhouette-with-overflow routing: the binned coverage kernel where
        # Pallas is available (unless the caller asked for the exact scan),
        # the exact scan elsewhere
        self._sil_binned = (
            not self.silhouette_exact
            and jax.default_backend() != "cpu"
            and self.img_wh % 128 == 0
        )
        if self._sil_binned:
            self._silhouette_binned_jit = jax.jit(
                self._render_silhouette_binned_impl
            )

    def _rasterize(self, screen_verts):
        """Rasterize with the configured backend (see `rasterizer` field).
        The binned backend never reaches here — it renders through the fused
        in-kernel-attribute path (`_render_binned_fused`)."""
        if self.rasterizer == "xla":
            return (
                rasterize(screen_verts, self.dp["faces"], self.img_wh, chunk=self.chunk),
                self.dp["faces"],
                self.dp["face_part"],
            )
        from .pallas_rasterizer import BLOCK_COLS, BLOCK_ROWS, rasterize_pallas

        # sort faces by (row-block, col-block) tile bucket: chunks become
        # tile-local so the kernel's bbox culling skips ~97% of (tile, chunk)
        # pairs (row-only sorting leaves chunks spanning the full width)
        c = jnp.mean(screen_verts[0, self.dp["faces"]], axis=1)
        key = (
            (c[:, 1] // BLOCK_ROWS).astype(jnp.int32) * 64
            + (c[:, 0] // BLOCK_COLS).astype(jnp.int32)
        )
        order = jnp.argsort(key)
        faces_sorted = self.dp["faces"][order]
        part_sorted = self.dp["face_part"][order]
        frags = rasterize_pallas(screen_verts, faces_sorted, self.img_wh)
        return frags, faces_sorted, part_sorted

    def _screen_verts(self, vertices, cam_t=None, orthographic_scale=None):
        if self.projection_type == "orthographic":
            scale = (
                orthographic_scale[:, 0]
                if orthographic_scale is not None
                else jnp.full((vertices.shape[0],), 0.9, vertices.dtype)
            )
            t = (
                cam_t
                if cam_t is not None
                else jnp.zeros((vertices.shape[0], 3), vertices.dtype)
            )
            cam_wp = jnp.stack([scale, t[:, 0], t[:, 1]], axis=-1)
            # z offset participates only in depth ordering
            verts = vertices + jnp.concatenate(
                [jnp.zeros_like(t[:, :2]), t[:, 2:3]], axis=-1
            )[:, None, :]
            return project_orthographic_screen(verts, cam_wp, self.img_wh)
        return project_perspective_screen(
            vertices, cam_t, self.focal_length, self.img_wh
        )

    def __call__(
        self,
        vertices: jax.Array,
        cam_t: Optional[jax.Array] = None,
        orthographic_scale: Optional[jax.Array] = None,
        textures: Optional[jax.Array] = None,
        lights_rgb_settings: Optional[Dict] = None,
        verts_features: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        return self._render_jit(
            vertices, cam_t, orthographic_scale, textures,
            lights_rgb_settings, verts_features,
        )

    def _render(
        self,
        vertices: jax.Array,
        cam_t: Optional[jax.Array] = None,
        orthographic_scale: Optional[jax.Array] = None,
        textures: Optional[jax.Array] = None,
        lights_rgb_settings: Optional[Dict] = None,
        verts_features: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        """Render IUV (+ RGB, depth) images.

        :param vertices: (B, 6890, 3) SMPL vertices (pre-flipped).
        :param textures: (B, 1200, 800, 3) SURREAL/MGN texture atlases for
            textured RGB; verts_features: (B, 6890, 3) per-vertex colours as
            an alternative (visualisation path).
        :return: dict with iuv_images (B, wh, wh, 3) [part, U, V],
            depth_images (B, wh, wh), silhouettes (B, wh, wh) and rgb_images
            when requested — channel-last like the reference output.
        """
        b = vertices.shape[0]
        dp_verts = vertices[:, self.dp["vertex_map"]]  # (B, 7829, 3)
        screen = self._screen_verts(dp_verts, cam_t, orthographic_scale)
        want_rgb = self.render_rgb and (
            textures is not None or verts_features is not None
        )
        if self.rasterizer == "binned":
            # fused path: the Pallas kernel interpolates attributes in-kernel
            # (ROP-style) — no post-raster gathers (docs/DESIGN.md)
            return self._render_binned_fused(
                screen, dp_verts, cam_t, orthographic_scale, textures,
                lights_rgb_settings, verts_features, want_rgb,
            )
        frags, faces, face_part = self._rasterize(screen)
        fidx = jnp.maximum(frags.face_idx, 0)  # (B, H, W)

        # ------- packed attribute lookup: the per-pixel gathers dominate the
        # post-raster cost, so all shared per-vertex attrs go through ONE
        # per-face table + ONE gather, and the per-face data (part id,
        # normal, triangle positions) through a second packed gather.
        vert_attr_list = [jnp.stack([self.dp["u"], self.dp["v"]], axis=-1)]
        if want_rgb and textures is not None:
            vert_attr_list.append(
                jnp.stack([self.dp["atlas_u"], self.dp["atlas_v"]], axis=-1)
            )
        static_attrs = jnp.concatenate(vert_attr_list, axis=-1)  # (V, Ds)
        tri_static = static_attrs[faces]  # (F, 3, Ds) — built once per call
        picked_static = tri_static[fidx]  # (B, H, W, 3, Ds): single gather
        static_px = jnp.where(
            frags.mask[..., None],
            jnp.einsum("...k,...kd->...d", frags.bary, picked_static),
            0.0,
        )

        uv = static_px[..., :2]
        part = jnp.where(frags.mask, face_part[fidx], 0).astype(jnp.float32)
        iuv = jnp.concatenate([part[..., None], uv], axis=-1)

        out = {
            "iuv_images": iuv,
            "depth_images": jnp.where(frags.mask, frags.depth, 0.0),
            "silhouettes": frags.mask.astype(jnp.float32),
        }
        if self.emit_overflow:
            # exact backends never drop candidates — constant 0 keeps the
            # output contract identical across rasterizer choices
            out["binning_overflow"] = jnp.zeros((), jnp.int32)

        if want_rgb:
            # batched per-face table: [normal, v0, v1, v2(, colours v0..v2)]
            normals = face_normals(dp_verts, faces)  # (B, F, 3)
            tri_pos = jax.vmap(lambda v: v[faces])(dp_verts)  # (B, F, 3, 3)
            face_rows = [normals[:, :, None, :], tri_pos]
            if textures is None:
                vf = (
                    verts_features[:, self.dp["vertex_map"]]
                    if verts_features.ndim == 3
                    else jnp.broadcast_to(
                        verts_features[self.dp["vertex_map"]], dp_verts.shape
                    )
                )
                face_rows.append(jax.vmap(lambda a: a[faces])(vf))
            face_table = jnp.concatenate(face_rows, axis=2)  # (B, F, 4|7, 3)
            picked = jax.vmap(lambda t, f: t[f])(face_table, fidx)  # (B,H,W,·,3)

            pix_normal = jnp.where(frags.mask[..., None], picked[..., 0, :], 0.0)
            pix_pos = jnp.where(
                frags.mask[..., None],
                jnp.einsum("...k,...kd->...d", frags.bary, picked[..., 1:4, :]),
                0.0,
            )
            if textures is not None:
                atlas_uv = static_px[..., 2:4]
                th, tw = textures.shape[1:3]
                tx = jnp.clip((atlas_uv[..., 0] * (tw - 1)), 0, tw - 1)
                ty = jnp.clip((atlas_uv[..., 1] * (th - 1)), 0, th - 1)
                albedo = jax.vmap(
                    lambda tex, y, x: tex[
                        jnp.round(y).astype(jnp.int32), jnp.round(x).astype(jnp.int32)
                    ]
                )(textures, ty, tx)  # (B, wh, wh, 3)
            else:
                albedo = jnp.where(
                    frags.mask[..., None],
                    jnp.einsum("...k,...kd->...d", frags.bary, picked[..., 4:7, :]),
                    0.0,
                )

            lights = dict(DEFAULT_LIGHTS)
            if lights_rgb_settings is not None:
                lights.update(lights_rgb_settings)
            light_dir = lights["location"][:, None, None, :] - pix_pos
            light_dir = light_dir / jnp.maximum(
                jnp.linalg.norm(light_dir, axis=-1, keepdims=True), 1e-8
            )
            lambert = jnp.abs(jnp.sum(pix_normal * light_dir, axis=-1, keepdims=True))
            ambient = lights["ambient_color"][:, None, None, :]
            diffuse = lights["diffuse_color"][:, None, None, :] * lambert
            rgb = jnp.clip(albedo * (ambient + diffuse), 0.0, 1.0)
            out["rgb_images"] = jnp.where(frags.mask[..., None], rgb, 0.0)

        return out

    def _render_binned_fused(
        self, screen, dp_verts, cam_t, orthographic_scale, textures,
        lights_rgb_settings, verts_features, want_rgb,
    ):
        """Fused binned-rasterizer render: attributes (UV, part id, albedo
        source) are interpolated INSIDE the Pallas kernel and positions/
        normals reconstructed analytically from (x, y, depth, ∂z/∂x, ∂z/∂y)
        — zero post-raster gathers.  The round-1 gather-based resolve cost
        ~150 ms/batch at training scale (docs/DESIGN.md).

        texture_sampling="face" goes further: one pre-lit texel per face
        (flat per-face Lambert folded into the constant attribute), so the
        kernel emits finished RGB — no per-pixel texture gather, no depth
        -gradient planes, no post-raster shading math.  Exactly equal to
        flat-normal shading evaluated at the face centroid (light direction
        varies negligibly across a 1-2 px face at training scale)."""
        from .binned_rasterizer import rasterize_binned_with_attrs

        b = screen.shape[0]
        faces = self.dp["faces"]
        wh = float(self.img_wh)

        lights = dict(DEFAULT_LIGHTS)
        if lights_rgb_settings is not None:
            lights.update(lights_rgb_settings)

        face_tex = want_rgb and textures is not None and (
            self.texture_sampling == "face"
        )
        per_pixel_tex = want_rgb and textures is not None and (
            self.texture_sampling == "pixel"
        )
        emit_uv = self.emit_uv or per_pixel_tex  # pixel mode needs atlas UV

        # Interpolate ATLAS UV in-kernel and derive the IUV (u, v) planes
        # from it post-raster: within a face, atlas_u = (col(part) + u)/4
        # and atlas_v = (row(part) + 1 - v)/6 are exact linear relations
        # (col/row constant per part), so u/v reconstruct elementwise —
        # two fewer attribute planes and 6 fewer gathered coefficient rows
        # per face (the kernel is VPU-op-bound; docs/DESIGN.md).
        lin_parts = []
        if emit_uv:
            au_tri = jnp.stack(
                [self.dp["atlas_u"], self.dp["atlas_v"]], axis=-1
            )[faces][None]
            lin_parts.append(jnp.broadcast_to(au_tri, (b,) + au_tri.shape[1:]))
        const_parts = []
        if want_rgb and not per_pixel_tex:
            if face_tex:
                # one texel per face centroid, pre-lit with flat per-face
                # Lambert — the kernel's const-attr select emits final RGB
                th, tw = textures.shape[1:3]
                fx = jnp.round(jnp.clip(
                    self.dp["face_atlas_u"] * (tw - 1), 0, tw - 1
                )).astype(jnp.int32)
                fy = jnp.round(jnp.clip(
                    self.dp["face_atlas_v"] * (th - 1), 0, th - 1
                )).astype(jnp.int32)
                texel_f = jax.vmap(lambda t: t[fy, fx])(textures)  # (B, F, 3)
                tri_w = dp_verts[:, faces]  # (B, F, 3, 3) world-space
                n = jnp.cross(
                    tri_w[:, :, 1] - tri_w[:, :, 0],
                    tri_w[:, :, 2] - tri_w[:, :, 0],
                )
                n = n / jnp.maximum(
                    jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12
                )
                cen = tri_w.mean(2)
                ldir = lights["location"][:, None, :] - cen
                ldir = ldir / jnp.maximum(
                    jnp.linalg.norm(ldir, axis=-1, keepdims=True), 1e-8
                )
                lam = jnp.abs(jnp.sum(n * ldir, axis=-1, keepdims=True))
                scale = (
                    lights["ambient_color"][:, None, :]
                    + lights["diffuse_color"][:, None, :] * lam
                )
                const_parts.append(texel_f * scale)
            elif textures is not None:
                # sample the atlas once per DP vertex and let the kernel
                # barycentrically interpolate texels (bilinear-ish
                # filtering; loses sub-face texture detail)
                th, tw = textures.shape[1:3]
                tx = jnp.round(
                    jnp.clip(self.dp["atlas_u"] * (tw - 1), 0, tw - 1)
                ).astype(jnp.int32)
                ty = jnp.round(
                    jnp.clip(self.dp["atlas_v"] * (th - 1), 0, th - 1)
                ).astype(jnp.int32)
                texel = jax.vmap(lambda t: t[ty, tx])(textures)  # (B, V, 3)
                lin_parts.append(texel[:, faces])
            else:
                vf = (
                    verts_features[:, self.dp["vertex_map"]]
                    if verts_features.ndim == 3
                    else jnp.broadcast_to(
                        verts_features[self.dp["vertex_map"]],
                        (b,) + verts_features[self.dp["vertex_map"]].shape,
                    )
                )
                lin_parts.append(vf[:, faces])
        lin = jnp.concatenate(lin_parts, axis=-1) if lin_parts else None
        const_parts.append(
            jnp.broadcast_to(
                self.dp["face_part"].astype(jnp.float32)[None, :, None],
                (b, faces.shape[0], 1),
            )
        )
        const = jnp.concatenate(const_parts, axis=-1)
        z_grads = want_rgb and not face_tex

        frags, planes, _overflow, _live_drop = rasterize_binned_with_attrs(
            screen, faces, self.img_wh,
            lin_attrs=lin, const_attrs=const, z_grads=z_grads,
            k_max=self.binned_k_max, row_cand=self.binned_row_cand,
            emit_frags=False, live_cap=self.binned_live_cap,
            cull_sign=1 if self.binned_cull else 0,
            tall_cap=self.binned_tall_cap,
            table_mode=self.binned_table_mode,
        )
        # the emitted counter is the CONTENT-dropping subset only (live_cap
        # drops): on this z-ordered path k_max overflow drops z-occluded
        # far faces and the tall term fires benignly on off-frame/stretched
        # faces every batch at the true training distribution — a union
        # counter would warn unconditionally (binned_rasterizer._bin_faces,
        # scripts/profile_overflow_margin.py)
        overflow = _live_drop.sum().astype(jnp.int32)
        mask = frags.mask
        # plane layout: [atlas uv?][lin albedo?][lit rgb?][part][za zb?]
        i = 0
        if emit_uv:
            atlas_uv = planes[..., 0:2]
            i = 2
        if want_rgb and not per_pixel_tex:
            albedo = planes[..., i:i + 3]
            i += 3
        part = planes[..., i]
        i += 1

        if emit_uv:
            # u, v from atlas uv + part (see above); 0 on uncovered pixels
            pm1 = jnp.maximum(part - 1.0, 0.0)
            tile_row = jnp.floor(pm1 / 4.0)
            tile_col = pm1 - 4.0 * tile_row
            u_px = jnp.where(mask, 4.0 * atlas_uv[..., 0] - tile_col, 0.0)
            v_px = jnp.where(mask, 1.0 - (6.0 * atlas_uv[..., 1] - tile_row), 0.0)
        else:
            u_px = v_px = jnp.zeros_like(part)

        out = {
            "iuv_images": jnp.stack([part, u_px, v_px], axis=-1),
            "depth_images": jnp.where(mask, frags.depth, 0.0),
            "silhouettes": mask.astype(jnp.float32),
        }
        if self.emit_overflow:
            out["binning_overflow"] = overflow
        if not want_rgb:
            return out
        if face_tex:
            # albedo is already lit per-face RGB; clip is exact here because
            # the lighting scale is constant within a face
            rgb = jnp.clip(albedo, 0.0, 1.0)
            out["rgb_images"] = jnp.where(mask[..., None], rgb, 0.0)
            return out

        za, zb = planes[..., i], planes[..., i + 1]
        if per_pixel_tex:
            th, tw = textures.shape[1:3]
            tx = jnp.clip(atlas_uv[..., 0] * (tw - 1), 0, tw - 1)
            ty = jnp.clip(atlas_uv[..., 1] * (th - 1), 0, th - 1)
            albedo = jax.vmap(
                lambda tex, y, x: tex[
                    jnp.round(y).astype(jnp.int32), jnp.round(x).astype(jnp.int32)
                ]
            )(textures, ty, tx)

        # gather-free position/normal reconstruction from the depth plane
        gx = (jnp.arange(self.img_wh, dtype=jnp.float32) + 0.5)[None, None, :]
        gy = (jnp.arange(self.img_wh, dtype=jnp.float32) + 0.5)[None, :, None]
        z = frags.depth
        if self.projection_type == "perspective":
            c = wh / 2.0
            fl = self.focal_length
            xc, yc = gx - c, gy - c
            pix_pos = jnp.stack(
                [xc * z / fl, yc * z / fl, z], axis=-1
            ) - cam_t[:, None, None, :]
            ddx = jnp.stack(
                [(z + xc * za) / fl,
                 jnp.broadcast_to(yc * za / fl, z.shape), za], axis=-1
            )
            ddy = jnp.stack(
                [jnp.broadcast_to(xc * zb / fl, z.shape),
                 (z + yc * zb) / fl, zb], axis=-1
            )
        else:
            s = (
                orthographic_scale[:, 0]
                if orthographic_scale is not None
                else jnp.full((b,), 0.9, jnp.float32)
            )[:, None, None]
            t = (
                cam_t if cam_t is not None else jnp.zeros((b, 3), jnp.float32)
            )[:, None, None, :]
            x_w = (2.0 * gx / wh - 1.0) / s - t[..., 0]
            y_w = (2.0 * gy / wh - 1.0) / s - t[..., 1]
            k = jnp.broadcast_to(2.0 / (wh * s), z.shape)
            zero = jnp.zeros_like(z)
            pix_pos = jnp.stack(
                [jnp.broadcast_to(x_w, z.shape),
                 jnp.broadcast_to(y_w, z.shape), z - t[..., 2]], axis=-1
            )
            ddx = jnp.stack([k, zero, za], axis=-1)
            ddy = jnp.stack([zero, k, zb], axis=-1)
        normal = jnp.cross(ddx, ddy)
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
        )

        light_dir = lights["location"][:, None, None, :] - pix_pos
        light_dir = light_dir / jnp.maximum(
            jnp.linalg.norm(light_dir, axis=-1, keepdims=True), 1e-8
        )
        lambert = jnp.abs(jnp.sum(normal * light_dir, axis=-1, keepdims=True))
        ambient = lights["ambient_color"][:, None, None, :]
        diffuse = lights["diffuse_color"][:, None, None, :] * lambert
        rgb = jnp.clip(albedo * (ambient + diffuse), 0.0, 1.0)
        out["rgb_images"] = jnp.where(mask[..., None], rgb, 0.0)
        return out

    def _sil_screen(self, vertices, cam_wp):
        cam_t = jnp.stack(
            [cam_wp[:, 1], cam_wp[:, 2], jnp.full_like(cam_wp[:, 0], 2.5)], axis=-1
        )
        scale = cam_wp[:, [0, 0]]
        dp_verts = vertices[:, self.dp["vertex_map"]]
        return self._screen_verts(dp_verts, cam_t, scale)

    def _render_silhouette_impl(self, vertices, cam_wp):
        from .rasterizer import rasterize_coverage

        screen = self._sil_screen(vertices, cam_wp)
        mask = rasterize_coverage(screen, self.dp["faces"], self.img_wh, chunk=self.chunk)
        return mask.astype(jnp.float32)

    def _render_silhouette_binned_impl(self, vertices, cam_wp):
        from .binned_rasterizer import rasterize_binned_coverage

        screen = self._sil_screen(vertices, cam_wp)
        # TALL (64-row) strips + back-face culling.  Coverage has no
        # z-buffer, so unlike the train render the kernel cost is binning
        # -bound, not edge-test-bound — and a body face (~2-6 px tall)
        # almost never crosses a tall strip boundary, so taller strips cut
        # sort keys and kernel instances: 8-row 1.23 → 32-row 0.652 →
        # 64-row 0.608 ms/mesh, with 2.5-4x LOWER overflow on hard draws
        # (0/175/1061 vs 0/449/3972 at pose-scale 0.25/0.6/0.9).  Round 5
        # cut it further to 0.337 ms/mesh: the tall-face nonzero became a
        # masked sort and the coefficient gather moved INTO the kernel
        # (table_mode, an SMEM-resident per-mesh coefficient table +
        # 32-wide unrolled candidate loop — docs/DESIGN.md
        # "Evaluation-protocol performance", Round 5).  Culling is
        # near-exact for the consistently-wound SMPL body: the DensePose
        # face table is 13,774 faces (2 short of the closed 13,776), so a
        # pixel seen through the seam hole keeps only its back face —
        # measured 1 px per ~64 renders vs the all-faces union
        # (tests/test_binned_rasterizer.py).  Binning drops land in
        # `overflow` for the caller's batched host sync.
        mask, overflow = rasterize_binned_coverage(
            screen, self.dp["faces"], self.img_wh,
            strip_rows=64, k_max=8576, row_cand=6, tall_cap=512,
            live_cap=16384, cull_sign=1,
        )
        return mask.astype(jnp.float32), overflow

    def render_silhouette(self, vertices, cam_wp):
        """Silhouette-only path (coverage mask, no IUV interpolation) for
        eval IOU through the exact coverage scan: weak-perspective cam
        (B, 3) = (scale, tx, ty) (reference eval: cam_t from cam_wp with
        z=2.5, evaluate_humaniflow.py:120-122)."""
        return self._silhouette_jit(vertices, cam_wp)

    def render_silhouette_with_overflow(self, vertices, cam_wp):
        """Silhouette masks plus a per-mesh overflow count.

        On TPU (img_wh % 128 == 0, silhouette_exact=False) this routes
        through the coverage-specialized binned kernel
        (`rasterize_binned_coverage`) with back-face culling — ~3x the
        exact scan's throughput at SSP-3D sample-silhouette scale.
        Accuracy contract: the kernel itself is bit-exact at overflow 0,
        but the shipped CULLED config is only near-exact — the DensePose
        face table is 13,774 faces, 2 short of the closed SMPL 13,776, so
        a pixel visible only through that seam hole keeps a back face
        (measured ~1 px per 64 renders, tests/test_binned_rasterizer.py);
        and overflow on this z_order=False path drops arbitrary
        (highest-face-id) candidates, NOT guaranteed-occluded ones.
        Callers must accumulate the overflow count into their batched host
        sync and treat ANY nonzero value as "re-run with
        silhouette_exact=True" (measured 0 at body-mesh protocol scale).
        With silhouette_exact=True, or off-TPU, this is the exact per-pixel
        scan with overflow ≡ 0.

        :return: (mask (B, wh, wh) f32, overflow (B,) int32).
        """
        if self._sil_binned:
            return self._silhouette_binned_jit(vertices, cam_wp)
        mask = self._silhouette_jit(vertices, cam_wp)
        return mask, jnp.zeros((vertices.shape[0],), jnp.int32)
