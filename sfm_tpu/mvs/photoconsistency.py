"""Batched multi-view photo-consistency (NCC) scoring.

The reference's ``photo_consistenecy_test`` (MVS2.py:62-77) scores ONE patch
against all images in interpreted Python — and contains a bug: it projects
the centroid with the *reference* camera for every view (MVS2.py:68), so all
views are sampled at the reference pixel.  Here the whole candidate batch is
scored against all views in one device program, each view projected with its
OWN camera (the code's documented intent, per SURVEY.md §7), patches sampled
bilinearly at fractional centers.

Score convention mirrors ``ctNcc`` (MVS2.py:39-43): Pearson correlation
scaled by n/(n-1), so the reference's 0.4/0.7 thresholds transfer exactly.

Visibility semantics mirror the reference: the reference view itself is NOT
part of the visible set (MVS2.py:66-67), so ``visible_lower_bound`` counts
*other* views.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sfm_tpu.geometry.projection import project_pinhole
from sfm_tpu.ops.ncc import bilinear_sample_patches
from sfm_tpu.ops.patches import normalize_descriptors


@functools.partial(jax.jit, static_argnames=("wid",))
def photo_consistency(
    gray,            # (N, H, W) float32 grayscale stack
    K, R, t,         # (N, 3, 3), (N, 3, 3), (N, 3) calibration
    centers,         # (M, 3) candidate patch centroids
    ref_idx,         # (M,) int32 reference image per candidate
    min_ncc: float,
    wid: int = 5,
):
    """Score M candidates against all N views.

    Returns:
      vis: (M, N) bool — view passes NCC threshold (False at the ref view);
      proj: (M, N, 2) float32 — projected pixel of each candidate in each view;
      score_mean: (M,) mean NCC over visible views (0 if none);
      vis_count: (M,) int32 number of visible (non-reference) views.
    """
    n_img = gray.shape[0]
    m = centers.shape[0]
    side2 = (2 * wid + 1) ** 2
    ncc_scale = side2 / (side2 - 1.0)

    # Project all candidates into all views: (M, N, 2).
    proj = project_pinhole(
        centers[:, None, :], K[None], R[None], t[None]
    )

    # ONE sampling sweep over views: each view's normalized descriptors are
    # stored (bf16 — NCC ranking tolerates it and it halves the HBM
    # footprint), the reference row is then just a take_along_axis, and NCC
    # for all views is a single batched contraction.  This halves the gather
    # work vs. a separate reference-sampling pass.
    def view_scan(_, i):
        patches_i, inb_i = bilinear_sample_patches(gray[i], proj[:, i], wid)
        desc_i = normalize_descriptors(patches_i)
        return None, (desc_i.astype(jnp.bfloat16), inb_i)

    _, (desc_t, inb_t) = jax.lax.scan(view_scan, None, jnp.arange(n_img))
    desc = jnp.transpose(desc_t, (1, 0, 2))   # (M, N, D) bf16
    inb = jnp.transpose(inb_t)                # (M, N)

    ref_ix = ref_idx[:, None, None].astype(jnp.int32)
    ref_desc = jnp.take_along_axis(
        desc, jnp.broadcast_to(ref_ix, (m, 1, side2)), axis=1
    )[:, 0]                                    # (M, D) bf16
    ref_inb = jnp.take_along_axis(inb, ref_ix[..., 0], axis=1)[:, 0]

    ncc = (
        jnp.einsum(
            "mnd,md->mn", desc, ref_desc,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        * ncc_scale
    )
    not_ref = (
        jnp.arange(n_img, dtype=jnp.int32)[None, :] != ref_idx[:, None]
    )
    vis = (ncc > min_ncc) & inb & ref_inb[:, None] & not_ref
    scores = jnp.where(vis, ncc, 0.0)
    vis_count = jnp.sum(vis.astype(jnp.int32), axis=1)
    score_mean = jnp.sum(scores, axis=1) / jnp.maximum(vis_count, 1)
    return vis, proj.astype(jnp.float32), score_mean, vis_count
