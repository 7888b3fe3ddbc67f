"""Batched mesh/point-set alignment used by the evaluation metrics.

Capability parity with reference `utils/eval_utils.py`
(procrustes_analysis_batch:62, scale_and_translation_transform_batch:107,128).
Implemented in jnp so the -PA / -SC metric reductions run on-device inside a
single jitted eval step instead of the reference's per-batch numpy round trip.
"""

import jax
import jax.numpy as jnp


def procrustes_analysis_batch(s1: jax.Array, s2: jax.Array, return_R: bool = False):
    """Batched similarity (scale + rotation + translation) alignment of s1 to s2.

    :param s1: (B, N, 3) source point sets.
    :param s2: (B, N, 3) target point sets.
    :return: aligned s1 of shape (B, N, 3) (and rotations (B, 3, 3) if
        return_R).
    """
    x1 = jnp.swapaxes(s1, -1, -2)  # (B, 3, N)
    x2 = jnp.swapaxes(s2, -1, -2)
    mu1 = x1.mean(axis=-1, keepdims=True)
    mu2 = x2.mean(axis=-1, keepdims=True)
    x1c = x1 - mu1
    x2c = x2 - mu2

    hi = jax.lax.Precision.HIGHEST  # alignment feeds mm-scale metrics
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    var1 = jnp.sum(x1c**2, axis=(-1, -2))
    k = mm(x1c, jnp.swapaxes(x2c, -1, -2))  # (B, 3, 3)

    u, _, vh = jnp.linalg.svd(k)
    v = jnp.swapaxes(vh, -1, -2)
    det = jnp.linalg.det(mm(u, vh))
    z = jnp.broadcast_to(jnp.eye(3, dtype=s1.dtype), k.shape).copy()
    z = z.at[..., -1, -1].set(jnp.sign(det))
    r = mm(mm(v, z), jnp.swapaxes(u, -1, -2))

    trace = jnp.trace(mm(r, k), axis1=-2, axis2=-1)
    scale = (trace / var1)[..., None, None]
    t = mu2 - scale * mm(r, mu1)

    s1_hat = scale * mm(r, x1) + t
    s1_hat = jnp.swapaxes(s1_hat, -1, -2)
    if return_R:
        return s1_hat, r
    return s1_hat


def scale_and_translation_transform_batch(p: jax.Array, t: jax.Array) -> jax.Array:
    """Normalise each mesh in p to zero mean / unit RMS distance, then match
    the mean and RMS of the corresponding mesh in t.

    :param p: (B, N, 3) meshes to transform; :param t: (B, N, 3) references.
    """
    p_mean = p.mean(axis=-2, keepdims=True)
    p_c = p - p_mean
    p_scale = jnp.sqrt(jnp.sum(p_c**2, axis=(-2, -1), keepdims=True) / p.shape[-2])
    p_norm = p_c / p_scale

    t_mean = t.mean(axis=-2, keepdims=True)
    t_scale = jnp.sqrt(
        jnp.sum((t - t_mean) ** 2, axis=(-2, -1), keepdims=True) / t.shape[-2]
    )
    return p_norm * t_scale + t_mean


def make_xz_ground_plane(vertices: jax.Array) -> jax.Array:
    """Translate meshes so the lowest y coordinate lies on the x-z plane
    (reference: eval_utils.py:168)."""
    lowest_y = vertices[..., 1].min(axis=-1, keepdims=True)
    return vertices.at[..., 1].add(-lowest_y) if hasattr(vertices, "at") else vertices
