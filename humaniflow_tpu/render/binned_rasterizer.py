"""Binned Pallas TPU rasterizer: per-strip face lists + edge-plane kernel.

The tile-culled kernel (pallas_rasterizer.py) still tests every face of a
*live* 64-face chunk against a 32x128 pixel tile — ~4k pixel tests for a
triangle that covers ~30 pixels.  This rasterizer adds the binning a
hardware rasterizer performs:

1. **Bin (XLA)**: each face emits up to 12 (strip, face) candidates covering
   its screen bbox (strips are 8x128 pixel blocks — the native f32 vector
   register shape).  Candidates are sorted by strip id
   (`jax.lax.sort_key_val`), giving each strip a contiguous window of the
   sorted pair array.  Windows are widened to 128-slot alignment so the
   face-id tables are built with *aligned row gathers* — 16x faster on TPU
   than elementwise window gathers (3 ms vs 51 ms at training scale); the
   kernel masks the ragged window edges with per-strip [lo, hi) slot bounds.
2. **Precompute (XLA)**: per-face barycentric *edge-plane coefficients*
   [a0 b0 c0 a1 b1 c1 za zb zc] so the kernel evaluates
   w0 = a0·x + b0·y + c0, w1 = a1·x + b1·y + c1, w2 = 1 - w0 - w1,
   z = za·x + zb·y + zc — three fused multiply-adds per plane, no per-face
   divisions or scalar arithmetic in the inner loop.  Degenerate and padding
   faces get c0 = -1 (never inside).
3. **Rasterize (Pallas)**: grid (batch, strip, face-chunk); each instance
   z-tests one 128-face chunk against its resident 8x128 tile; chunks past
   the strip's [lo, hi) window are skipped whole (`pl.when` on SMEM bounds).

Work scales with the number of (face, strip) overlaps (~2 strips/face)
instead of faces x image: ~11x faster than the XLA rasterizer at training
scale (B=72, F=13776, 256²) before tuning, and exact on all pixels except
where a strip overflows its K table slots (see below).

Faces that overflow a strip's K slots are dropped (z-buffer artifacts), as
are faces taller than `row_cand` strips (default 6 → 48 px) or wider than 2
(256 px) — `rasterize_binned` returns a per-batch overflow count so callers
can check, and `row_cand`/`k_max` raise the caps when a mesh has stretched
faces (measured agreement vs the exact backend at training scale:
docs/DESIGN.md "Binned rasterizer approximation").
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterizer import BIG_DEPTH, Fragments

STRIP_ROWS = 8
STRIP_COLS = 128
FACE_CHUNK = 128
_ROW_CAND = 6  # bbox row-strip candidates per face (covers ≤ ~40 px tall)
_NCOEF = 9     # a0 b0 c0 a1 b1 c1 za zb zc


def _edge_plane_coeffs(tri: jax.Array) -> jax.Array:
    """(…, 9) packed screen coords → (…, 9) edge-plane coefficients."""
    x0, y0, z0 = tri[..., 0], tri[..., 1], tri[..., 2]
    x1, y1, z1 = tri[..., 3], tri[..., 4], tri[..., 5]
    x2, y2, z2 = tri[..., 6], tri[..., 7], tri[..., 8]
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    valid = jnp.abs(area) > 1e-9
    inv = jnp.where(valid, 1.0, 0.0) / jnp.where(valid, area, 1.0)
    a0 = -(y2 - y1) * inv
    b0 = (x2 - x1) * inv
    c0 = ((y2 - y1) * x1 - (x2 - x1) * y1) * inv
    a1 = -(y0 - y2) * inv
    b1 = (x0 - x2) * inv
    c1 = ((y0 - y2) * x2 - (x0 - x2) * y2) * inv
    za = a0 * (z0 - z2) + a1 * (z1 - z2)
    zb = b0 * (z0 - z2) + b1 * (z1 - z2)
    zc = c0 * (z0 - z2) + c1 * (z1 - z2) + z2
    c0 = jnp.where(valid, c0, -1.0)  # degenerate → w0 < 0 everywhere
    return jnp.stack([a0, b0, c0, a1, b1, c1, za, zb, zc], axis=-1)


def _make_kernel(n_col_strips, n_lin=0, n_const=0, z_grads=False,
                 emit_frags=True, table_mode=False):
    """Kernel for one (batch, strip, face-chunk) instance.

    bounds_ref: SMEM (1, 1, 1, 2)          — live slot window [lo, hi)
    coef_ref:   SMEM (1, 1, R, FACE_CHUNK) — edge-plane coefficients +
        attribute rows, channel-major: SMEM blocks pad the minor dim to 128
        lanes, so a (FACE_CHUNK, R) layout would DMA far more bytes than it
        uses.  R = 9 + 3·n_lin + n_const; linear attr j occupies rows
        9+3j..9+3j+2 as (d0, d1, c) with value = d0·w0 + d1·w1 + c
        (d0 = A₀−A₂, d1 = A₁−A₂, c = A₂ over the face's vertex values) —
        the ROP-style attribute interpolation a hardware rasterizer does,
        reusing the already-computed barycentrics instead of post-raster
        XLA gathers (which are latency-bound: 150 ms/batch at training
        scale, docs/DESIGN.md).
    fid_ref:    SMEM (1, 1, 1, FACE_CHUNK) — original face ids; only
        present when emit_frags.
    outputs:    VMEM (1, STRIP_ROWS, STRIP_COLS), revisited per chunk:
        depth, then (when emit_frags) face, b0, b1, then n_lin planes,
        n_const planes, and the winner's (za, zb) depth-gradient planes
        when z_grads (for gather-free normal reconstruction).

    emit_frags=False drops the face-id/barycentric outputs (and the fid
    input) for consumers that only need depth + interpolated attributes —
    the fused render path.  The kernel is VPU-op-bound (~1 (8,128) op per
    cycle; the per-face SMEM scalar reads overlap with vector work on the
    scalar core for free — a vectorised dynamic-gather broadcast variant
    measured 2x SLOWER), so every dropped per-face select is wall-clock:
    trimming face/b0/b1 + 1 lin attr cut kernel+bin 170 -> 144 ms at
    training scale with identical output.

    Slots outside [lo, hi) hold neighbouring strips' faces (the windows are
    128-aligned) — they are masked out via a scalar broadcast into `take`.
    """
    n_attr = n_lin + n_const + (2 if z_grads else 0)

    def kernel(bounds_ref, coef_ref, *rest):
        # table_mode: coef_ref is the fids window; rest[0] is the FULL
        # (B, R_pad, F_pad) coefficient table left in HBM (ANY space) and
        # the trailing scratch args are an SMEM table buffer + DMA
        # semaphore.  The per-mesh slab is DMA'd into the scratch ONCE per
        # mesh (first inner grid instance) — a pipelined SMEM input would
        # be double-buffered by Mosaic and a 16-row table at SMPL scale
        # (884 KB) exceeds SMEM ×2 (measured AOT OOM; docs/DESIGN.md r5).
        # Candidates are then looked up by face id in-kernel, no
        # pre-gathered windows (same design as _make_coverage_table_kernel).
        table_ref = None
        if table_mode:
            fids_ref = coef_ref
            table_hbm_ref, *rest = rest
            *rest, table_ref, dma_sem = rest
        if emit_frags:
            if table_mode:
                fid_ref = fids_ref
                depth_ref, face_ref, b0_ref, b1_ref, *attr_refs = rest
            else:
                fid_ref, depth_ref, face_ref, b0_ref, b1_ref, *attr_refs = rest
        else:
            depth_ref, *attr_refs = rest
        ck = pl.program_id(2)

        if table_mode:
            bi = pl.program_id(0)
            si0 = pl.program_id(1)

            @pl.when((si0 == 0) & (ck == 0))
            def _fetch_table():
                # grid iterates (b, s, chunk) row-major on one core, and
                # scratch persists across instances: fetch-and-wait here
                # makes the slab visible to every later (si, ck) of this bi
                cp = pltpu.make_async_copy(
                    table_hbm_ref.at[bi], table_ref, dma_sem
                )
                cp.start()
                cp.wait()

        @pl.when(ck == 0)
        def _init():
            depth_ref[0] = jnp.full((STRIP_ROWS, STRIP_COLS), BIG_DEPTH, jnp.float32)
            if emit_frags:
                face_ref[0] = jnp.full((STRIP_ROWS, STRIP_COLS), -1, jnp.int32)
                b0_ref[0] = jnp.zeros((STRIP_ROWS, STRIP_COLS), jnp.float32)
                b1_ref[0] = jnp.zeros((STRIP_ROWS, STRIP_COLS), jnp.float32)
            for r in attr_refs:
                r[0] = jnp.zeros((STRIP_ROWS, STRIP_COLS), jnp.float32)

        lo = bounds_ref[0, 0, 0, 0]
        hi = bounds_ref[0, 0, 0, 1]

        @pl.when((ck * FACE_CHUNK < hi) & ((ck + 1) * FACE_CHUNK > lo))
        def _rasterize():
            si = pl.program_id(1)
            row0 = ((si // n_col_strips) * STRIP_ROWS).astype(jnp.float32)
            col0 = ((si % n_col_strips) * STRIP_COLS).astype(jnp.float32)
            gy = (
                jax.lax.broadcasted_iota(jnp.int32, (STRIP_ROWS, STRIP_COLS), 0)
                .astype(jnp.float32) + row0 + 0.5
            )
            gx = (
                jax.lax.broadcasted_iota(jnp.int32, (STRIP_ROWS, STRIP_COLS), 1)
                .astype(jnp.float32) + col0 + 0.5
            )

            # z-buffer + attribute planes live in vector REGISTERS across
            # the candidate loop (one (8,128) vreg each); the VMEM refs are
            # read/written once per chunk, not once per candidate — cutting
            # the kernel's VMEM traffic ~10x (measured 146 -> 96 ms
            # kernel+bin at training scale).  The loop runs only the live
            # slot range [lo_k, hi_k) (dynamic fori_loop bounds), replacing
            # the per-slot `live` mask and skipping dead slots entirely.
            def candidate(k, carry, valid=None):
                depth = carry[0]
                if table_mode:
                    fid = fids_ref[0, 0, 0, k]

                    def C(r):
                        return table_ref[r, fid]
                else:
                    def C(r):
                        return coef_ref[0, 0, r, k]
                w0 = C(0) * gx + C(1) * gy + C(2)
                w1 = C(3) * gx + C(4) * gy + C(5)
                w2 = 1.0 - w0 - w1
                z = C(6) * gx + C(7) * gy + C(8)
                take = (
                    (jnp.minimum(jnp.minimum(w0, w1), w2) >= 0) & (z < depth)
                )
                if valid is not None:
                    take = take & valid
                out = [jnp.where(take, z, depth)]
                i = 1
                if emit_frags:
                    if not table_mode:
                        fid = fid_ref[0, 0, 0, k]
                    out.append(jnp.where(take, fid, carry[i]))
                    out.append(jnp.where(take, w0, carry[i + 1]))
                    out.append(jnp.where(take, w1, carry[i + 2]))
                    i += 3
                for j in range(n_lin):
                    val = (
                        C(9 + 3 * j) * w0
                        + C(10 + 3 * j) * w1
                        + C(11 + 3 * j)
                    )
                    out.append(jnp.where(take, val, carry[i]))
                    i += 1
                for j in range(n_const):
                    out.append(jnp.where(take, C(9 + 3 * n_lin + j), carry[i]))
                    i += 1
                if z_grads:
                    out.append(jnp.where(take, C(6), carry[i]))
                    out.append(jnp.where(take, C(7), carry[i + 1]))
                    i += 2
                return tuple(out)

            carry = [depth_ref[0]]
            if emit_frags:
                carry += [face_ref[0], b0_ref[0], b1_ref[0]]
            carry += [attr_refs[a][0] for a in range(n_attr)]
            lo_k = jnp.maximum(lo - ck * FACE_CHUNK, 0)
            hi_k = jnp.minimum(hi - ck * FACE_CHUNK, FACE_CHUNK)
            # NOTE: a manually-unrolled (x2/x4) variant with scalar validity
            # masks measured SLOWER (32.8 -> 35 ms kernel+bin at training
            # scale) — the loop is already well-pipelined; the ragged-edge
            # masking costs more than any scheduling gain
            carry = jax.lax.fori_loop(
                lo_k, hi_k, lambda k, c: candidate(k, c), tuple(carry)
            )
            depth_ref[0] = carry[0]
            i = 1
            if emit_frags:
                face_ref[0] = carry[1]
                b0_ref[0] = carry[2]
                b1_ref[0] = carry[3]
                i = 4
            for a in range(n_attr):
                attr_refs[a][0] = carry[i + a]

    return kernel


def _bin_faces(tri, f, h, w, k_max, row_cand=_ROW_CAND, extra_rows=None,
               n_coef=_NCOEF, cull_sign=0, tall_cap=None, z_order=True,
               live_cap=None, strip_rows=STRIP_ROWS, gather_coefs=True):
    """Per-batch-element binning: (F, 9) screen tris → per-strip face tables.

    Returns (bounds (S, 2) int32 [lo, hi) slot windows, fids (S, K_slots),
    coefs (S, K_slots, 9), overflow scalar, live_drop scalar).
    K_slots = k_max + FACE_CHUNK: windows are 128-aligned so the leading
    partial chunk carries up to 127 foreign slots masked via lo.

    `overflow` is the union of every dropped-candidate source (k_max far
    -face drops, tall/wide-face row losses, tall_cap side-table overflow,
    live_cap drops) — the exactness signal the coverage path relies on.
    `live_drop` counts ONLY the live_cap drops: with z_order=True those are
    the sole cap-controlled CONTENT drops (the sort is strip-major, so they
    remove bottom-image-strip candidates outright, while k_max drops only
    the farthest — z-occluded — faces of a near-to-far window), which makes
    it the right operator-warning signal for long-running training
    (pipelines/train.py).  At the true training distribution (shape
    σ=1.25, cam tz ∈ [2, 3]; scripts/profile_overflow_margin.py) the union
    counter fires on EVERY batch through the synthetic test mesh's
    stretched triangles, while live_drop is exactly 0 at the shipped caps.

    :param row_cand: row-strip candidates per face — faces taller than
        row_cand·8 px are dropped (counted in overflow).  6 covers real
        SMPL meshes at training scale with margin; raise it for meshes
        with heavily stretched triangles (sort cost scales linearly).
    :param cull_sign: 0 = keep all faces; ±1 = back-face culling, keeping
        faces whose signed screen area has that sign.  For a CLOSED
        consistently-wound mesh the coverage union (silhouette) is exactly
        the front-face union — culling halves the candidate load and the
        per-strip occupancy, so k_max overflow vanishes at body scale.
        Culled faces are excluded from the overflow count.
    :param tall_cap: two-level binning.  The candidate sort dominates the
        binning cost and its size scales with row_cand (measured TPU v5e,
        13774 faces: 0.11 ms/mesh at row_cand=2 vs 0.96 ms at 16) — but
        almost all faces of a body mesh span ≤ 2 row-strips.  With
        tall_cap=M, ALL faces enter a 2-row main table and only the first
        M faces spanning ≥ 3 row-strips enter a side table covering rows
        2..row_cand-1; both are packed into ONE sort of
        f·4 + M·(row_cand-2)·2 keys instead of f·row_cand·2.  Tall faces
        beyond M lose their upper rows (counted in overflow).  None = flat
        single-level binning (row_cand rows for every face).
    """
    n_row = h // strip_rows
    n_col = w // STRIP_COLS
    s = n_row * n_col

    xs = tri[:, 0::3]
    ys = tri[:, 1::3]
    xmin, xmax = xs.min(1), xs.max(1)
    ymin, ymax = ys.min(1), ys.max(1)
    r0 = jnp.floor(ymin / strip_rows).astype(jnp.int32)
    r1 = jnp.floor(ymax / strip_rows).astype(jnp.int32)
    c0 = jnp.floor(xmin / STRIP_COLS).astype(jnp.int32)
    c1 = jnp.floor(xmax / STRIP_COLS).astype(jnp.int32)

    # sort candidates by (strip, quantized face depth): within a strip the
    # window is near-to-far, so k_max overflow drops only the FARTHEST
    # (z-buffer-occluded) faces — overflow becomes harmless at body scale.
    # z_order=False (coverage: no z-buffer, order-independent) zeroes the
    # depth bits so each strip window is ASCENDING in face id — the
    # downstream per-slot coefficient gather then reads near-sequentially
    # (measured ~3x faster than the z-shuffled gather)
    #
    # pack (strip·2^z_bits + zq) << 14 | fid into ONE int32 and single-array
    # sort: halves the sort network's data movement vs sort_key_val pairs
    # (22.7 -> 17.8 ms at training scale).  Bit budget (sign-safe 31 bits):
    # fid 14 b, strip+depth get the rest — z_bits adapts so the sentinel
    # key s·2^z_bits always fits (10 b at 256², 9 b at 384², …); at very
    # large strip counts the depth ordering degrades gracefully to coarser
    # buckets instead of silently overflowing int32.
    assert f < (1 << 14)
    assert s < (1 << 17), f"{s} strips cannot be packed into int32 sort keys"
    z_bits = 0
    while z_bits < 10 and (s << (z_bits + 1)) < (1 << 17):
        z_bits += 1
    zscale = 1 << z_bits
    if z_order and z_bits > 0:
        zmean = tri[:, 2::3].mean(1)
        zlo = zmean.min()
        zspan = jnp.maximum(zmean.max() - zlo, 1e-6)
        zq = jnp.clip(
            (zmean - zlo) / zspan * (zscale - 1.0), 0, zscale - 1
        ).astype(jnp.int32)
    else:
        zq = jnp.zeros((f,), jnp.int32)
    if cull_sign != 0:
        x0, y0 = tri[:, 0], tri[:, 1]
        x1, y1 = tri[:, 3], tri[:, 4]
        x2, y2 = tri[:, 6], tri[:, 7]
        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        keep = (area * cull_sign) > 0
    else:
        keep = None
    fid = jnp.arange(f, dtype=jnp.int32)
    keep_all = keep if keep is not None else jnp.ones((f,), bool)

    def entries(dr_range, r0_, r1_, c0_, c1_, zq_, fid_, valid):
        out = []
        for dr in dr_range:
            r = r0_ + dr
            row_ok = (r <= r1_) & (r >= 0) & (r < n_row) & valid
            for ci, c in enumerate((c0_, c1_)):
                col_ok = (c >= 0) & (c < n_col) & ((ci == 0) | (c1_ > c0_))
                ok = row_ok & col_ok
                key = jnp.where(ok, (r * n_col + c) * zscale + zq_, s * zscale)
                out.append((key << 14) | fid_)
        return out

    main_rows = row_cand if tall_cap is None else min(2, row_cand)
    packed = entries(range(main_rows), r0, r1, c0, c1, zq, fid, keep_all)
    overflow_tall = jnp.zeros((), jnp.int32)
    if tall_cap is not None and row_cand > main_rows:
        tall_m = (r1 - r0 > main_rows - 1) & keep_all & (r1 >= 0) & (r0 < n_row)
        n_tall = tall_m.sum().astype(jnp.int32)
        # ascending tall fids via a masked sort — same indices as
        # jnp.nonzero(size=tall_cap, fill_value=·)[0] for the first n_tall
        # slots (the only ones tvalid exposes), but ~9x cheaper on TPU:
        # nonzero's cumsum+scatter lowering measured 131 µs/mesh at
        # coverage scale vs ~15 µs for the 14k-element sort
        # (scripts/profile_coverage_parts.py extra2).
        marked = jnp.where(tall_m, fid, fid + (1 << 20))
        tidx = (jnp.sort(marked)[:tall_cap] & ((1 << 20) - 1)).astype(jnp.int32)
        tvalid = jnp.arange(tall_cap, dtype=jnp.int32) < n_tall
        packed += entries(
            range(main_rows, row_cand),
            r0[tidx], r1[tidx], c0[tidx], c1[tidx], zq[tidx], tidx, tvalid,
        )
        overflow_tall = jnp.maximum(n_tall - tall_cap, 0)
    packed = jnp.sort(jnp.concatenate(packed))
    keys = packed >> 14
    vals = packed & 0x3FFF

    n = vals.shape[0]
    n_pad = -(-n // FACE_CHUNK) * FACE_CHUNK
    vals = jnp.pad(vals, (0, n_pad - n))

    start = jnp.searchsorted(
        keys, jnp.arange(s + 1, dtype=jnp.int32) * zscale
    ).astype(jnp.int32)
    raw = start[1:] - start[:-1]
    counts = jnp.minimum(raw, k_max)
    overflow = jnp.maximum(raw - k_max, 0).sum()
    tall = (r1 - r0 > row_cand - 1) | (c1 - c0 > 1)
    if keep is not None:
        tall = tall & keep
    overflow = overflow + tall.sum() + overflow_tall

    # 128-aligned window rows: row gathers are ~16x faster than elementwise
    row_lo = start[:-1] // FACE_CHUNK
    n_rows = k_max // FACE_CHUNK + 1
    max_row = n_pad // FACE_CHUNK - 1
    ridx = jnp.clip(
        row_lo[:, None] + jnp.arange(n_rows, dtype=jnp.int32)[None], 0, max_row
    )  # (S, n_rows)
    fids = vals.reshape(-1, FACE_CHUNK)[ridx].reshape(s, -1)  # (S, K_slots)
    lo = start[:-1] - row_lo * FACE_CHUNK
    bounds = jnp.stack([lo, lo + counts], axis=-1)  # (S, 2)

    if not gather_coefs:
        # table-mode caller (coverage): the kernel looks coefficients up
        # from an SMEM-resident per-mesh table by face id, so the per-slot
        # coefficient gather — the binning's single largest cost — is
        # skipped entirely.  live_cap is moot (nothing is gathered), so
        # this path also has NO live drops.
        return bounds, fids, None, overflow, jnp.zeros((), jnp.int32)

    coefs = _edge_plane_coeffs(tri)[..., :n_coef]  # (F, n_coef)
    if extra_rows is not None:
        coefs = jnp.concatenate([coefs, extra_rows], axis=-1)  # (F, n_coef+A)
    live_drop = jnp.zeros((), jnp.int32)
    if live_cap is not None and live_cap < n_pad:
        # prefix coefficient gather: the random per-slot gather is the
        # binning's top cost (issue-bound, ~1.2 ns/element — 0.66 ms/mesh
        # at coverage scale) and S·K_slots is ~5x the number of LIVE
        # candidates.  Sentinel entries sort to the tail, so gathering
        # coefficients for the first `live_cap` sorted entries and then
        # building the slot tables with 128-aligned ROW gathers does ~4x
        # less random-gather work.  Live candidates beyond the cap read a
        # never-inside pad block (c0 = -1) and are counted in overflow.
        assert live_cap % FACE_CHUNK == 0
        c = coefs.shape[-1]
        n_live = start[s]  # first sentinel position in the sorted order
        live_drop = jnp.maximum(n_live - live_cap, 0)
        overflow = overflow + live_drop
        cpre = coefs[vals[:live_cap]].reshape(
            live_cap // FACE_CHUNK, FACE_CHUNK, c
        )
        pad_blk = jnp.zeros((1, FACE_CHUNK, c), coefs.dtype).at[..., 2].set(-1.0)
        cpre = jnp.concatenate([cpre, pad_blk], axis=0)
        ridx_c = jnp.minimum(ridx, live_cap // FACE_CHUNK)
        gathered = cpre[ridx_c].reshape(s, -1, c)  # (S, K_slots, c)
    else:
        gathered = coefs[fids]  # (S, K_slots, 9+A) — fids always in [0, F)
    return bounds, fids, gathered, overflow, live_drop


def _rasterize_binned_impl(
    verts_screen, faces, image_size, k_max, row_cand,
    lin_attrs=None, const_attrs=None, z_grads=False, emit_frags=True,
    tall_cap=None, live_cap=None, cull_sign=0, table_mode=False,
):
    b, v, _ = verts_screen.shape
    f = faces.shape[0]
    h = w = image_size
    assert h % STRIP_ROWS == 0 and w % STRIP_COLS == 0
    assert k_max % FACE_CHUNK == 0
    n_col_strips = w // STRIP_COLS
    s = (h // STRIP_ROWS) * n_col_strips

    # per-face attribute coefficient rows (see _make_kernel docstring)
    n_lin = 0 if lin_attrs is None else lin_attrs.shape[-1]
    n_const = 0 if const_attrs is None else const_attrs.shape[-1]
    rows = []
    if lin_attrs is not None:
        av = jnp.broadcast_to(lin_attrs, (b, f, 3, n_lin))
        d0 = av[..., 0, :] - av[..., 2, :]
        d1 = av[..., 1, :] - av[..., 2, :]
        c = av[..., 2, :]
        rows.append(jnp.stack([d0, d1, c], axis=-1).reshape(b, f, 3 * n_lin))
    if const_attrs is not None:
        rows.append(jnp.broadcast_to(const_attrs, (b, f, n_const)))
    extra = jnp.concatenate(rows, axis=-1) if rows else None
    n_rows = _NCOEF + 3 * n_lin + n_const
    n_attr_out = n_lin + n_const + (2 if z_grads else 0)

    tri = verts_screen[:, faces].reshape(b, f, 9)
    if table_mode:
        # SMEM budget gate: the single-buffered scratch table must fit in
        # the ~1 MB scalar memory beside the fid windows.  16 rows at
        # SMPL/DensePose scale (13824 faces) = 884 KB fits; the 25-row
        # vertex-texel / verts-features configs do not — fall back to the
        # gathered-window path rather than fail at Mosaic layout time.
        r_pad_try = -(-n_rows // 8) * 8
        f_pad_try = -(-f // FACE_CHUNK) * FACE_CHUNK
        if r_pad_try * f_pad_try * 4 > 900_000:
            table_mode = False
    if table_mode:
        # in-kernel coefficient lookup (r5): binning emits only the sorted
        # fid windows; the kernel reads coefficients by face id from a
        # per-mesh SMEM-resident (R_pad, F_pad) table.  Removes the
        # per-slot coefficient gather (the largest binning cost — 43 ms of
        # the 107 ms render at B=72 training scale) AND the possibility of
        # live_cap content drops (nothing is gathered).
        bounds, fids, _, overflow, live_drop = jax.vmap(
            lambda t: _bin_faces(t, f, h, w, k_max, row_cand,
                                 tall_cap=tall_cap, cull_sign=cull_sign,
                                 gather_coefs=False)
        )(tri)
        coefs9 = jax.vmap(_edge_plane_coeffs)(tri)  # (b, f, 9)
        table = (
            jnp.concatenate([coefs9, extra], axis=-1)
            if extra is not None else coefs9
        )
        r_pad = -(-n_rows // 8) * 8
        f_pad = -(-f // FACE_CHUNK) * FACE_CHUNK
        table = jnp.pad(
            table.swapaxes(-1, -2),
            ((0, 0), (0, r_pad - n_rows), (0, f_pad - f)),
        )  # (b, R_pad, F_pad)
    elif extra is None:
        bounds, fids, coefs, overflow, live_drop = jax.vmap(
            lambda t: _bin_faces(t, f, h, w, k_max, row_cand, tall_cap=tall_cap,
                                 live_cap=live_cap, cull_sign=cull_sign)
        )(tri)
    else:
        bounds, fids, coefs, overflow, live_drop = jax.vmap(
            lambda t, e: _bin_faces(t, f, h, w, k_max, row_cand, extra_rows=e,
                                    tall_cap=tall_cap, live_cap=live_cap,
                                    cull_sign=cull_sign)
        )(tri, extra)

    k_slots = k_max + FACE_CHUNK
    num_chunks = k_slots // FACE_CHUNK
    grid = (b, s, num_chunks)
    kernel = _make_kernel(n_col_strips, n_lin, n_const, z_grads, emit_frags,
                          table_mode=table_mode)
    # SMEM blocks: last two dims must equal the array's — lay the (strip,
    # chunk) axes out flat so every block is a full trailing slab
    bounds_in = bounds.reshape(b, s, 1, 2)
    if not table_mode:
        coefs_in = coefs.reshape(
            b, s * num_chunks, FACE_CHUNK, n_rows
        ).swapaxes(-1, -2)  # (…, n_rows, FACE_CHUNK) — lane-major chunks
    n_frag_out = 4 if emit_frags else 1
    out_shapes = [jax.ShapeDtypeStruct((b, h, w), jnp.float32)]
    if emit_frags:
        out_shapes += [
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ]
    out_shapes += [jax.ShapeDtypeStruct((b, h, w), jnp.float32)] * n_attr_out
    in_specs = [
        pl.BlockSpec(
            (1, 1, 1, 2), lambda bi, si, ck: (bi, si, 0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    inputs = [bounds_in]
    scratch_shapes = []
    if table_mode:
        # fid window per chunk + the per-mesh coefficient table.  The
        # table stays in HBM (ANY space) and is DMA'd into a
        # SINGLE-buffered SMEM scratch once per mesh inside the kernel —
        # as a pipelined SMEM input Mosaic double-buffers it and
        # R_pad·F_pad·4 B ×2 exceeds the 1 MB SMEM at SMPL scale.
        in_specs += [
            pl.BlockSpec(
                (1, 1, 1, FACE_CHUNK),
                lambda bi, si, ck: (bi, si * num_chunks + ck, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        inputs += [fids.reshape(b, s * num_chunks, 1, FACE_CHUNK), table]
        scratch_shapes = [
            pltpu.SMEM((r_pad, f_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, n_rows, FACE_CHUNK),
                lambda bi, si, ck: (bi, si * num_chunks + ck, 0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        inputs.append(coefs_in)
        if emit_frags:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 1, FACE_CHUNK),
                    lambda bi, si, ck: (bi, si * num_chunks + ck, 0, 0),
                    memory_space=pltpu.SMEM,
                )
            )
            inputs.append(fids.reshape(b, s * num_chunks, 1, FACE_CHUNK))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, STRIP_ROWS, STRIP_COLS),
                lambda bi, si, ck: (bi, si // n_col_strips, si % n_col_strips),
                memory_space=pltpu.VMEM,
            )
        ]
        * (n_frag_out + n_attr_out),
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
    )(*inputs)
    depth = outs[0]
    attr_planes = outs[n_frag_out:]
    mask = depth < BIG_DEPTH
    if emit_frags:
        face, b0, b1 = outs[1:4]
        face = jnp.where(mask, face, -1)
        b0 = jnp.where(mask, b0, 0.0)
        b1 = jnp.where(mask, b1, 0.0)
        bary = jnp.stack([b0, b1, 1.0 - b0 - b1], axis=-1)
        bary = jnp.where(mask[..., None], bary, 0.0)
    else:
        # fused consumers use only mask + depth (+ attr planes)
        face = jnp.where(mask, 0, -1)
        bary = jnp.zeros((b, h, w, 3), jnp.float32)
    frags = Fragments(face_idx=face, bary=bary, depth=depth)
    planes = (
        jnp.stack(attr_planes, axis=-1) if attr_planes else None
    )  # (B, H, W, n_lin + n_const [+ za, zb])
    return frags, planes, overflow, live_drop


def _make_coverage_kernel(n_col_strips, strip_rows=STRIP_ROWS):
    """Coverage-only kernel: no z-test, no attributes — per-candidate work
    is two edge-plane FMAs + an inside test + one select (~half the full
    kernel), and the binning gathers only the 6 edge-coefficient rows.
    Exact whenever overflow == 0 (the candidate set is identical to the
    full kernel's).  NOTE the coverage path bins with z_order=False (for
    the near-sequential coefficient gather), so k_max overflow drops the
    HIGHEST-face-id candidates — arbitrary with respect to visibility,
    unlike the z-ordered full kernel whose overflow drops occluded far
    faces.  Callers must treat ANY nonzero overflow as a signal to re-run
    through the exact scan, not as bounded damage."""

    def kernel(bounds_ref, coef_ref, cover_ref):
        si = pl.program_id(1)
        row0 = ((si // n_col_strips) * strip_rows).astype(jnp.float32)
        col0 = ((si % n_col_strips) * STRIP_COLS).astype(jnp.float32)
        gy = (
            jax.lax.broadcasted_iota(jnp.int32, (strip_rows, STRIP_COLS), 0)
            .astype(jnp.float32) + row0 + 0.5
        )
        gx = (
            jax.lax.broadcasted_iota(jnp.int32, (strip_rows, STRIP_COLS), 1)
            .astype(jnp.float32) + col0 + 0.5
        )

        # register-resident coverage accumulator + live-range loop (see
        # _make_kernel); the whole candidate window is ONE SMEM block (the
        # grid has no chunk dimension), so there is exactly one instance —
        # and one VMEM store — per (batch, strip)
        def candidate(k, cover, valid=None):
            w0 = (
                coef_ref[0, 0, 0, k] * gx
                + coef_ref[0, 0, 1, k] * gy
                + coef_ref[0, 0, 2, k]
            )
            w1 = (
                coef_ref[0, 0, 3, k] * gx
                + coef_ref[0, 0, 4, k] * gy
                + coef_ref[0, 0, 5, k]
            )
            w2 = 1.0 - w0 - w1  # same rounding as the full kernel
            inside = jnp.minimum(jnp.minimum(w0, w1), w2) >= 0
            if valid is not None:
                inside = inside & valid
            return jnp.where(inside, 1.0, cover)

        lo = bounds_ref[0, 0, 0, 0]
        hi = bounds_ref[0, 0, 0, 1]
        init = jnp.zeros((strip_rows, STRIP_COLS), jnp.float32)
        cover_ref[0] = jax.lax.fori_loop(
            lo, hi, lambda k, c: candidate(k, c), init
        )

    return kernel


def _make_coverage_table_kernel(n_col_strips, strip_rows=STRIP_ROWS):
    """Coverage kernel with IN-KERNEL coefficient lookup.

    Candidates arrive as face ids (the sorted fids window, SMEM int32) and
    the per-mesh edge-coefficient table (8, F_pad) stays SMEM-RESIDENT
    across the strip grid dimension (its index_map is constant over the
    innermost grid dim, so Mosaic fetches it once per mesh).  This removes
    the XLA-side per-slot coefficient gather — the live-prefix random
    gather (118 µs/mesh) plus the 128-aligned row gathers (~38 µs/mesh)
    were the single largest binning cost
    (scripts/profile_coverage_parts.py) — and shrinks the per-instance
    SMEM window 6x (int32 fids vs 6 f32 coefficient rows).  Per-candidate
    work gains one scalar load (the fid) over _make_coverage_kernel;
    coverage semantics are identical."""

    def kernel(bounds_ref, fids_ref, table_ref, cover_ref):
        si = pl.program_id(1)
        row0 = ((si // n_col_strips) * strip_rows).astype(jnp.float32)
        col0 = ((si % n_col_strips) * STRIP_COLS).astype(jnp.float32)
        gy = (
            jax.lax.broadcasted_iota(jnp.int32, (strip_rows, STRIP_COLS), 0)
            .astype(jnp.float32) + row0 + 0.5
        )
        gx = (
            jax.lax.broadcasted_iota(jnp.int32, (strip_rows, STRIP_COLS), 1)
            .astype(jnp.float32) + col0 + 0.5
        )

        lo = bounds_ref[0, 0, 0, 0]
        hi = bounds_ref[0, 0, 0, 1]
        k_last = fids_ref.shape[-1] - 1

        def candidate(k):
            # clamp: the unrolled tail can index up to hi+3 — stay inside
            # the SMEM window (the value is masked by `k < hi` below)
            kk = jnp.minimum(k, k_last)
            fid = fids_ref[0, 0, 0, kk]
            w0 = (
                table_ref[0, 0, fid] * gx
                + table_ref[0, 1, fid] * gy
                + table_ref[0, 2, fid]
            )
            w1 = (
                table_ref[0, 3, fid] * gx
                + table_ref[0, 4, fid] * gy
                + table_ref[0, 5, fid]
            )
            w2 = 1.0 - w0 - w1  # same rounding as the full kernel
            return jnp.minimum(jnp.minimum(w0, w1), w2) >= 0

        # 32-wide unroll with a tree-OR: the scalar fid/coefficient loads
        # pipeline against the vector FMAs and the loop-carried select
        # chain shrinks 32x — the straight loop was scalar-load latency
        # bound (kernel 287 µs/mesh straight, 246 at 4-wide, 203 at
        # 32-wide; whole path 586 -> 337 µs/mesh with the sort-based tall
        # select and the in-kernel table — docs/DESIGN.md r5)
        def body(i, cover):
            k = lo + i * 32
            ins = None
            for d in range(0, 32, 2):
                pair = (candidate(k + d) & (k + d < hi)) | (
                    candidate(k + d + 1) & (k + d + 1 < hi)
                )
                ins = pair if ins is None else ins | pair
            return jnp.where(ins, 1.0, cover)

        n_iter = (hi - lo + 31) // 32
        init = jnp.zeros((strip_rows, STRIP_COLS), jnp.float32)
        cover_ref[0] = jax.lax.fori_loop(0, n_iter, body, init)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size", "k_max", "row_cand", "cull_sign", "tall_cap", "live_cap",
        "strip_rows", "table_mode",
    ),
)
def rasterize_binned_coverage(
    verts_screen: jax.Array,
    faces: jax.Array,
    image_size: int,
    k_max: int = 1280,
    row_cand: int = 16,
    cull_sign: int = 0,
    tall_cap: int = 4096,
    live_cap: int = 32768,
    strip_rows: int = STRIP_ROWS,
    table_mode: bool = True,
):
    """Coverage-only binned rasterization — the silhouette hot path.

    Same binning as `rasterize_binned` but runs a no-z/no-attribute kernel:
    ~3x cheaper per mesh than the full binned raster and ~3x cheaper than
    the exact XLA coverage scan at SSP-3D sample-silhouette scale
    (docs/DESIGN.md "Evaluation-protocol performance").

    :param table_mode: True (default) looks edge coefficients up INSIDE the
        kernel from a per-mesh SMEM-resident (8, F_pad) table indexed by
        face id, skipping the per-slot coefficient gather that dominated
        the binning prologue (156 µs of 586 µs/mesh,
        scripts/profile_coverage_parts.py).  In this mode live_cap is
        unused (nothing is gathered, so nothing can be live-dropped).
        False keeps the round-3 pre-gathered-window kernel.
    :return: (mask (B, H, W) bool, overflow (B,) int32).  The mask is
        EXACT (identical to rasterizer.rasterize_coverage) whenever the
        overflow count is 0 — callers on metric-bearing paths should check
        it (eval accumulates it into its batched host sync).
    """
    b = verts_screen.shape[0]
    f = faces.shape[0]
    h = w = image_size
    assert h % strip_rows == 0 and w % STRIP_COLS == 0
    assert k_max % FACE_CHUNK == 0
    n_col_strips = w // STRIP_COLS
    s = (h // strip_rows) * n_col_strips

    tri = verts_screen[:, faces].reshape(b, f, 9)
    # the union overflow counter is the exactness signal here: with
    # z_order=False EVERY drop source removes coverage, so live_drop is
    # not split out
    bounds, fids, coefs, overflow, _ = jax.vmap(
        lambda t: _bin_faces(
            t, f, h, w, k_max, row_cand, n_coef=6, cull_sign=cull_sign,
            tall_cap=tall_cap, z_order=False, live_cap=live_cap,
            strip_rows=strip_rows, gather_coefs=not table_mode,
        )
    )(tri)

    k_slots = k_max + FACE_CHUNK
    grid = (b, s)
    bounds_in = bounds.reshape(b, s, 1, 2)
    if table_mode:
        coefs6 = jax.vmap(lambda t: _edge_plane_coeffs(t)[..., :6])(tri)
        f_pad = -(-f // FACE_CHUNK) * FACE_CHUNK
        table = jnp.pad(
            coefs6.swapaxes(-1, -2), ((0, 0), (0, 2), (0, f_pad - f))
        )  # (b, 8, F_pad): 6 coefficient rows sublane-padded to 8
        fids_in = fids.reshape(b, s, 1, k_slots)
        cover = pl.pallas_call(
            _make_coverage_table_kernel(n_col_strips, strip_rows),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 1, 2), lambda bi, si: (bi, si, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 1, 1, k_slots), lambda bi, si: (bi, si, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 8, f_pad), lambda bi, si: (bi, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, strip_rows, STRIP_COLS),
                    lambda bi, si: (bi, si // n_col_strips, si % n_col_strips),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_shape=[jax.ShapeDtypeStruct((b, h, w), jnp.float32)],
        )(bounds_in, fids_in, table)[0]
        return cover > 0.5, overflow
    coefs_in = coefs.swapaxes(-1, -2)  # (b, s, 6, k_slots)
    cover = pl.pallas_call(
        _make_coverage_kernel(n_col_strips, strip_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, 2), lambda bi, si: (bi, si, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, 6, k_slots),
                lambda bi, si: (bi, si, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, strip_rows, STRIP_COLS),
                lambda bi, si: (bi, si // n_col_strips, si % n_col_strips),
                memory_space=pltpu.VMEM,
            )
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, w), jnp.float32)],
    )(bounds_in, coefs_in)[0]
    return cover > 0.5, overflow


@functools.partial(
    jax.jit, static_argnames=("image_size", "k_max", "row_cand", "tall_cap")
)
def rasterize_binned(
    verts_screen: jax.Array,
    faces: jax.Array,
    image_size: int,
    k_max: int = 896,
    row_cand: int = _ROW_CAND,
    tall_cap=None,
):
    """Binned rasterization (same contract as rasterizer.rasterize).

    :param verts_screen: (B, V, 3) screen coords (x, y, depth)
    :param faces: (F, 3) int32 — no pre-sorting needed (binning is exact
        per batch element)
    :param k_max: per-strip face capacity; overflowing faces are dropped
    :param row_cand: row-strip candidates per face (see _bin_faces) —
        static; raise for meshes with faces taller than row_cand·8 px
    :return: (Fragments, overflow) — overflow is (B,) int32 of dropped
        (face, strip) pairs per batch element (0 at body-mesh scale).
    """
    frags, _, overflow, _ = _rasterize_binned_impl(
        verts_screen, faces, image_size, k_max, row_cand, tall_cap=tall_cap
    )
    return frags, overflow


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size", "k_max", "row_cand", "z_grads", "emit_frags", "tall_cap",
        "live_cap", "cull_sign", "table_mode",
    ),
)
def rasterize_binned_with_attrs(
    verts_screen: jax.Array,
    faces: jax.Array,
    image_size: int,
    lin_attrs=None,
    const_attrs=None,
    z_grads: bool = False,
    k_max: int = 896,
    row_cand: int = _ROW_CAND,
    emit_frags: bool = True,
    tall_cap=None,
    live_cap=None,
    cull_sign: int = 0,
    table_mode: bool = False,
):
    """Binned rasterization with in-kernel (ROP-style) attribute
    interpolation: the winner's attributes are emitted as image planes
    during z-testing, replacing the post-raster XLA gathers that dominate
    render time at training scale (docs/DESIGN.md).

    :param lin_attrs: (B|1, F, 3, K_lin) per-face-vertex values,
        barycentrically interpolated (u/v coords, per-vertex texel colours…)
    :param const_attrs: (B|1, F, K_const) per-face constants (part ids…)
    :param z_grads: also emit the winner's (za, zb) screen-space depth
        gradients — enough to reconstruct positions and face normals
        analytically from (x, y, depth) without any gather
    :param emit_frags: False drops the face-id/bary outputs and their
        per-face kernel selects (fragments carry only mask + depth) — the
        fused render path's configuration (the kernel is VPU-op-bound, see
        _make_kernel).
    :param cull_sign: ±1 enables back-face culling (see _bin_faces).  For
        a CLOSED, consistently-wound, NON-self-intersecting mesh the
        z-buffer winner at every pixel is front-facing, so culling is
        EXACT; the live candidate load halves (coefficient gather +
        kernel; the sort still sees every face) — measured -13% at
        training scale.  Self-intersecting geometry (e.g. the synthetic
        test mesh, whose random blendshapes cross faces) exposes interior
        back faces where culled winners differ (masks stay identical,
        measured 100%) — keep 0 there.
    :param table_mode: look coefficients up in-kernel from a per-mesh
        SMEM-resident (R_pad, F_pad) table by face id instead of gathering
        per-slot coefficient windows — removes the binning's largest cost
        and makes live_cap moot (no gather, no live drops; docs/DESIGN.md
        r5).  The table is DMA'd into a SINGLE-buffered SMEM scratch once
        per mesh (a pipelined input would be double-buffered and OOM), so
        the bound is R_pad·F_pad·4 B ≤ ~1 MB SMEM minus the fid windows
        (R = 9 + 3·K_lin + K_const; 16 rows at DensePose scale = 884 KB —
        fits; a 3-lin-attr config at 19+ rows does not).
    :return: (Fragments, planes (B, H, W, K_lin+K_const[+2]), overflow,
        live_drop); plane values are 0 on uncovered pixels.  `overflow` is
        the union of all drop sources; `live_drop` (B,) counts only the
        live_cap drops — the content-dropping subset on this z-ordered
        path (see _bin_faces).
    """
    return _rasterize_binned_impl(
        verts_screen, faces, image_size, k_max, row_cand,
        lin_attrs=lin_attrs, const_attrs=const_attrs, z_grads=z_grads,
        emit_frags=emit_frags, tall_cap=tall_cap, live_cap=live_cap,
        cull_sign=cull_sign, table_mode=table_mode,
    )
