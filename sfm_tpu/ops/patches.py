"""Patch extraction + descriptor normalization.

The reference's descriptor is a flattened grayscale square patch of side
2*wid+1 around a corner (getDescFeatures, HarrisFeatures.py:116-133), matched
by zero-mean NCC (Match, HarrisFeatures.py:16-37).  Here the gather is batched
over all corners of all images at once, and descriptors are normalized to
zero-mean unit-norm so that NCC between two descriptors is a plain dot
product — which turns all-pairs matching into one MXU matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8


@functools.partial(jax.jit, static_argnames=("wid",))
def extract_patches(gray, corners, wid: int = 5):
    """Gather square patches around integer corner coordinates.

    Args:
      gray: (N, H, W) grayscale stack.
      corners: (N, K, 2) int (x, y) positions.
      wid: half-width; patch side = 2*wid+1.

    Returns:
      patches: (N, K, (2*wid+1)**2) float32, row-major flattened;
      inbounds: (N, K) bool — corners whose full patch fits in the image.
    """
    n, h, w = gray.shape
    side = 2 * wid + 1
    x = corners[..., 0]
    y = corners[..., 1]
    inb = (x >= wid) & (x < w - wid) & (y >= wid) & (y < h - wid)
    dy = jnp.arange(-wid, wid + 1)
    dx = jnp.arange(-wid, wid + 1)
    yy = jnp.clip(y[..., None, None] + dy[None, None, :, None], 0, h - 1)
    xx = jnp.clip(x[..., None, None] + dx[None, None, None, :], 0, w - 1)

    def per_image(img, yy_i, xx_i):
        return img[yy_i, xx_i]  # (K, side, side) advanced-index gather

    patches = jax.vmap(per_image)(gray, yy, xx)
    return patches.reshape(n, -1, side * side).astype(jnp.float32), inb


@jax.jit
def normalize_descriptors(patches):
    """Zero-mean, unit-L2 normalize flattened patches -> NCC-ready descriptors.

    After this, dot(d1, d2) equals the Pearson/NCC correlation of the raw
    patches (the reference's ctNcc up to its 1/(n-1) convention, MVS2.py:39-43).
    """
    mean = jnp.mean(patches, axis=-1, keepdims=True)
    c = patches - mean
    norm = jnp.linalg.norm(c, axis=-1, keepdims=True)
    return c / jnp.maximum(norm, _EPS)
