"""Batched DLT triangulation and ray utilities.

Replaces the reference's per-pair ``cv2.triangulatePoints`` (utils.py:238-239)
and the MVS back-projection / ray-plane math (MVS2.py:302-306, 334-354) with
statically-shaped batched formulations:

- :func:`triangulate_dlt` triangulates N correspondences across V >= 2 views in
  one shot by solving the 4x4 normal equations A^T A x = 0 per point via a
  vmapped symmetric eigendecomposition — no data-dependent shapes, maps onto
  XLA's batched eigh instead of per-point SVD round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _dlt_rows(P, pix):
    """DLT row pair for one view: (..., 3, 4) proj, (..., 2) pixel -> (..., 2, 4)."""
    u = pix[..., 0:1]
    v = pix[..., 1:2]
    r0 = u * P[..., 2, :] - P[..., 0, :]
    r1 = v * P[..., 2, :] - P[..., 1, :]
    return jnp.stack([r0, r1], axis=-2)


def triangulate_dlt(P, pixels, mask=None):
    """Triangulate world points from multi-view observations.

    Args:
      P: (..., V, 3, 4) projection matrices.
      pixels: (..., V, 2) pixel observations.
      mask: optional (..., V) bool/float validity; invalid views contribute
        zero rows (at least 2 valid views needed for a meaningful solution).

    Returns:
      (points (..., 3), w_sign (...,)) — the dehomogenized 3-D points and the
      sign-carrying homogeneous w (|w| near 0 means an ill-conditioned point,
      the analogue of the reference's w==0 skip at SFM.py:70-75).
    """
    rows = _dlt_rows(P, pixels)  # (..., V, 2, 4)
    if mask is not None:
        rows = rows * mask[..., None, None].astype(rows.dtype)
    A = rows.reshape(*rows.shape[:-3], -1, 4)  # (..., 2V, 4)
    # Row normalization for conditioning (Hartley-style): unit-norm rows.
    norms = jnp.linalg.norm(A, axis=-1, keepdims=True)
    A = A / jnp.maximum(norms, _EPS)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    # Null vector = eigenvector of the smallest eigenvalue (eigh is ascending).
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[..., :, 0]
    w = X[..., 3]
    denom = jnp.where(jnp.abs(w) < _EPS, jnp.where(w < 0, -_EPS, _EPS), w)
    return X[..., :3] / denom[..., None], w


def dehomogenize(X):
    """(..., 4) homogeneous -> ((..., 3), w) with w==0 guard."""
    w = X[..., 3]
    denom = jnp.where(jnp.abs(w) < _EPS, jnp.where(w < 0, -_EPS, _EPS), w)
    return X[..., :3] / denom[..., None], w


def ray_plane_intersection(origin, direction, plane_point, plane_normal):
    """Intersect rays with planes, broadcasting over batch dims.

    Returns (point (..., 3), valid (...,)) where valid is False for rays
    (near-)parallel to the plane.  Matches the reference
    ``ray_plane_intersection`` (MVS2.py:302-306) with an explicit validity
    mask instead of a division blow-up.
    """
    denom = jnp.sum(direction * plane_normal, axis=-1)
    num = jnp.sum((plane_point - origin) * plane_normal, axis=-1)
    valid = jnp.abs(denom) > 1e-9
    s = num / jnp.where(valid, denom, 1.0)
    return origin + s[..., None] * direction, valid


def backproject_pixel(pix, K, R, t):
    """Pixel (..., 2) -> (camera center (..., 3), world ray dir (..., 3), unit).

    Inverse of :func:`project_pinhole` up to depth: d_world = R^T K^{-1} [u,v,1].
    Replaces the hand-decomposed intrinsics back-projection in the reference
    expansion loop (MVS2.py:334-354).
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    skew = K[..., 0, 1]
    y = (pix[..., 1] - cy) / fy
    x = (pix[..., 0] - cx - skew * y) / fx
    d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    d_world = jnp.einsum("...ji,...j->...i", R, d_cam)
    d_world = d_world / jnp.maximum(
        jnp.linalg.norm(d_world, axis=-1, keepdims=True), _EPS
    )
    center = -jnp.einsum("...ji,...j->...i", R, t)
    return center, d_world
