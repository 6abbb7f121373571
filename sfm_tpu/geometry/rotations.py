"""Rotation representations (axis-angle <-> matrix), batched and jit-friendly.

Replaces the reference's per-call ``cv2.Rodrigues`` round-trips (utils.py:241,
SFM.py:147) and the numpy Rodrigues in the BA residual (BundleAdjustment.py:8-21)
with pure jnp formulas that vmap/grad cleanly.  All functions broadcast over
leading batch dimensions; angle ~ 0 is handled with a Taylor-safe branch so
gradients stay finite (the reference guards with nan_to_num at
BundleAdjustment.py:14-16).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def rotate_points(points, rotvecs):
    """Rotate ``points`` (..., 3) by axis-angle ``rotvecs`` (..., 3).

    Rodrigues formula: v' = v cosθ + (k × v) sinθ + k (k·v)(1 − cosθ).
    Matches the reference BA ``rotate`` (BundleAdjustment.py:8-21), but is
    differentiable at θ = 0: the θ→0 neighbourhood takes a second-order
    Taylor branch, with the main branch's sqrt argument clamped away from
    zero so autodiff never sees 0/0 (the reference instead papers over the
    NaN with nan_to_num, BundleAdjustment.py:14-16).
    """
    theta2 = jnp.sum(rotvecs * rotvecs, axis=-1, keepdims=True)
    small = theta2 < 1e-14
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    k = rotvecs / theta
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    dot = jnp.sum(k * points, axis=-1, keepdims=True)
    cross = jnp.cross(k, points)
    main = points * cos + cross * sin + k * dot * (1.0 - cos)
    # v + ω×v + 0.5 ω×(ω×v): exact to O(θ^3), smooth at 0.
    cross_w = jnp.cross(rotvecs, points)
    taylor = points + cross_w + 0.5 * jnp.cross(rotvecs, cross_w)
    return jnp.where(small, taylor, main)


def rodrigues_matrix(rotvecs):
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    theta = jnp.linalg.norm(rotvecs, axis=-1, keepdims=True)
    k = rotvecs / jnp.maximum(theta, _EPS)
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], axis=-1),
            jnp.stack([kz, zeros, -kx], axis=-1),
            jnp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )
    theta = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvecs.dtype), K.shape)
    return eye + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)


def rodrigues_vector(R):
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Inverse of :func:`rodrigues_matrix` for θ in [0, π); the θ→π neighbourhood
    is handled through the symmetric-part fallback.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos)
    # Antisymmetric part gives axis*2sinθ.
    ax = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin = jnp.sin(theta)
    small = theta[..., None] < 1e-6
    near_pi = (jnp.pi - theta[..., None]) < 1e-4
    # Generic branch.
    axis_gen = ax / jnp.maximum(2.0 * sin[..., None], _EPS)
    # θ→π: axis from diagonal of (R + I)/2 = aa^T, sign fixed from ax.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    a_abs = jnp.sqrt(jnp.clip((diag + 1.0) * 0.5, 0.0, None))
    # Choose signs so off-diagonals match: use column of R+I with largest norm.
    M = R + jnp.eye(3, dtype=R.dtype)
    col_norms = jnp.linalg.norm(M, axis=-2)
    best = jnp.argmax(col_norms, axis=-1)
    col = jnp.take_along_axis(M, best[..., None, None], axis=-1)[..., 0]
    axis_pi = col / jnp.maximum(jnp.linalg.norm(col, axis=-1, keepdims=True), _EPS)
    # Just below π the antisymmetric part still carries the axis sign; align
    # the fallback axis with it (at exactly π both signs are equivalent).
    sign = jnp.where(
        jnp.sum(axis_pi * ax, axis=-1, keepdims=True) < 0.0, -1.0, 1.0
    )
    axis_pi = axis_pi * sign
    del a_abs
    axis = jnp.where(near_pi, axis_pi, axis_gen)
    rv = axis * theta[..., None]
    return jnp.where(small, ax * 0.5, rv)
