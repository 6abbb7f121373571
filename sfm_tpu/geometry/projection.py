"""Camera projection models.

Two models, matching the reference:

1. Pinhole P = K [R|t] for matching/triangulation/MVS (reference
   getProjectionMatrix utils.py:234-236, projectPoint utils.py:241-244).
2. The BA camera vector with radial distortion, generalizing the reference's
   11-parameter model [rvec(3), t(3), f, k1, k2, px, py] (SFM.py:143-148
   packing, BundleAdjustment.py:23-39 projection) to 12 parameters with
   *separate* fx, fy: [rvec(3), t(3), fx, fy, k1, k2, px, py].  The
   reference's f = (fx+fy)/2 averaging is a baked-in model error on any
   camera with fx != fy (dinoRing: 3310.4 vs 3325.5) that puts a floor under
   its achievable reprojection error; fx = fy reproduces the reference model
   exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from sfm_tpu.geometry.rotations import rotate_points

_EPS = 1e-12


def projection_matrix(K, R, t):
    """(…,3,3),(…,3,3),(…,3) -> (…,3,4) P = K [R|t]."""
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return K @ Rt


def project_pinhole(points, K, R, t):
    """Project world points (..., 3) with pinhole cameras (broadcasting).

    Returns pixel coords (..., 2).  Equivalent to the reference's
    cv2.projectPoints with zero distortion (utils.py:241-244).
    """
    cam = jnp.einsum("...ij,...j->...i", R, points) + t
    z = jnp.where(jnp.abs(cam[..., 2:3]) < _EPS, _EPS, cam[..., 2:3])
    ndc = cam[..., :2] / z
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    skew = K[..., 0, 1]
    u = fx * ndc[..., 0] + skew * ndc[..., 1] + cx
    v = fy * ndc[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


CAM_PARAMS = 12


def pack_cam(K, R_rotvec, t):
    """Build the 12-param BA camera vector from calibration.

    [rvec(3), t(3), fx, fy, k1=0, k2=0, px, py].  The reference packs
    f=(fx+fy)/2 instead (SFM.py:143-148) — see module docstring.
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    zeros = jnp.zeros_like(fx)
    return jnp.concatenate(
        [
            R_rotvec,
            t,
            fx[..., None],
            fy[..., None],
            zeros[..., None],
            zeros[..., None],
            K[..., 0, 2][..., None],
            K[..., 1, 2][..., None],
        ],
        axis=-1,
    )


def project_cam(points, cams):
    """Project points (..., 3) with 12-param cameras (..., 12) -> (..., 2).

    rotate -> translate -> perspective divide -> radial distortion
    r = 1 + k1 n + k2 n^2 (n = x^2+y^2) -> scale by (fx, fy) -> add principal
    point.  With fx = fy this is the reference ``project``
    (BundleAdjustment.py:23-39) exactly.
    """
    rv = cams[..., 0:3]
    t = cams[..., 3:6]
    f = cams[..., 6:8]
    k1 = cams[..., 8:9]
    k2 = cams[..., 9:10]
    pp = cams[..., 10:12]
    cam = rotate_points(points, rv) + t
    z = jnp.where(jnp.abs(cam[..., 2:3]) < _EPS, _EPS, cam[..., 2:3])
    xy = cam[..., :2] / z
    n = jnp.sum(xy * xy, axis=-1, keepdims=True)
    r = 1.0 + k1 * n + k2 * n * n
    return xy * r * f + pp


def reprojection_errors(points, pixels, K, R, t):
    """Per-observation Euclidean reprojection error in pixels."""
    proj = project_pinhole(points, K, R, t)
    return jnp.linalg.norm(proj - pixels, axis=-1)
