"""NCC scoring and bilinear patch sampling.

``ncc_scores`` is the matcher's hot op: all-pairs correlation of two
normalized descriptor sets as one MXU matmul (replaces the reference's FLANN
k-d forest at utils.py:180-185 and the O(N*M) Python NCC loop at
HarrisFeatures.py:16-37 — at a few thousand corners per 640x480 image, a
dense matmul on the systolic array beats tree search by orders of magnitude).

``bilinear_sample_patches`` is MVS's photo-consistency gather: sample square
patches at *fractional* pixel centers (projected 3-D points) with bilinear
interpolation, batched over candidates x views.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def ncc_scores(desc1, desc2):
    """(…, K1, D) x (…, K2, D) -> (…, K1, K2) correlation matrix on the MXU.

    Runs at DEFAULT (bf16-pass) precision deliberately: correlation ranking
    only needs ~2 decimal digits and this is the matcher's FLOPs hot spot —
    the library's global 'highest' default (see sfm_tpu/__init__.py) is for
    the geometry path, not here.
    """
    return jnp.einsum(
        "...id,...jd->...ij",
        desc1,
        desc2,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


@functools.partial(jax.jit, static_argnames=("wid",))
def bilinear_sample_patches(gray, centers, wid: int = 5):
    """Sample (2*wid+1)^2 patches at fractional centers with bilinear interp.

    Args:
      gray: (H, W) single grayscale image.
      centers: (M, 2) float (x, y) patch centers.
      wid: half-width.

    Returns:
      patches: (M, (2*wid+1)**2) float32;
      inbounds: (M,) bool — True where the whole patch (incl. interp support)
        lies inside the image.
    """
    h, w = gray.shape
    x = centers[..., 0]
    y = centers[..., 1]
    inb = (
        (x >= wid + 1) & (x <= w - wid - 2) & (y >= wid + 1) & (y <= h - wid - 2)
    )
    d = jnp.arange(-wid, wid + 1, dtype=centers.dtype)
    px = x[:, None, None] + d[None, None, :]
    py = y[:, None, None] + d[None, :, None]
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(px - x0, 0.0, 1.0)
    fy = jnp.clip(py - y0, 0.0, 1.0)
    v00 = gray[y0, x0]
    v01 = gray[y0, x0 + 1]
    v10 = gray[y0 + 1, x0]
    v11 = gray[y0 + 1, x0 + 1]
    val = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    m = val.shape[0]
    return val.reshape(m, -1).astype(jnp.float32), inb
