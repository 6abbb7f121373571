"""MVS seeding from SfM tracks.

Mirrors the reference seed loop (MVS2.py:205-260) as one batched device
program instead of a per-track Python loop:

- every track contributes candidates: its first observation fixes the
  reference image/pixel/optical-center, each further observation is
  pairwise-triangulated against it (MVS2.py:223-250);
- ALL candidates across ALL tracks are photo-consistency scored in one batch;
- per track, the passing candidate nearest the reference camera wins —
  exactly the reference's pop-nearest-first-take-first-passing semantics
  (MVS2.py:252-260), expressed with segment-min instead of a heap.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import MvsConfig
from sfm_tpu.geometry.projection import projection_matrix
from sfm_tpu.geometry.triangulation import triangulate_dlt, refine_triangulation
from sfm_tpu.mvs.cells import fill_cells, which_cell
from sfm_tpu.mvs.photoconsistency import (
    pack_patch_payload,
    photo_consistency,
)

_BIG = jnp.float32(1e30)

import functools


def build_seed_candidates(track_offsets, track_obs):
    """Host-side flattening of tracks into candidate pair arrays.

    Returns numpy arrays (track_id, ref_obs (C,3), other_obs (C,3)) — one
    candidate per non-reference observation of each track.
    """
    lengths = np.diff(track_offsets)
    n_tracks = len(lengths)
    ref_rows = track_obs[track_offsets[:-1]]          # (T, 3) first obs
    track_id = np.repeat(np.arange(n_tracks), lengths - 1)
    # Indices of non-first observations.
    first_mask = np.zeros(track_obs.shape[0], bool)
    first_mask[track_offsets[:-1]] = True
    other_rows = track_obs[~first_mask]
    ref_per_cand = ref_rows[track_id]
    return track_id.astype(np.int32), ref_per_cand, other_rows


@functools.partial(
    jax.jit,
    static_argnames=("n_tracks", "config", "visible_lower_bound"),
)
def seed_patches(
    gray,
    K, R, t, centers_cam,
    track_id, ref_obs, other_obs,
    n_tracks: int,
    occupancy,
    config: MvsConfig,
    visible_lower_bound: int,
    cand_valid=None,
):
    """Batched seeding.

    Args (device arrays): gray (N,H,W); calibration; candidate arrays from
    ``build_seed_candidates``; occupancy grid.

    Returns (dict of per-seed arrays (length n_tracks, masked by 'valid'),
    updated occupancy, packed (n_tracks, 11) float32 host payload per
    ``photoconsistency.pack_patch_payload`` — one fetch for the host).
    """
    P = projection_matrix(K, R, t)
    ref_img = ref_obs[:, 0]
    oth_img = other_obs[:, 0]
    pix_ref = ref_obs[:, 1:3].astype(jnp.float32)
    pix_oth = other_obs[:, 1:3].astype(jnp.float32)

    # Pairwise two-view DLT per candidate (MVS2.py:238-244).
    P_pair = jnp.stack([P[ref_img], P[oth_img]], axis=1)   # (C, 2, 3, 4)
    pix_pair = jnp.stack([pix_ref, pix_oth], axis=1)       # (C, 2, 2)
    c, w = triangulate_dlt(P_pair, pix_pair)
    c = refine_triangulation(P_pair, pix_pair, c)
    nondeg = jnp.abs(w) > 1e-12

    O = centers_cam[ref_img]                                # (C, 3)
    dvec = O - c
    dist = jnp.linalg.norm(dvec, axis=-1)
    normal = dvec / jnp.maximum(dist[:, None], 1e-12)

    from sfm_tpu.config import resolve_photo_views

    vis, proj, score, cnt = photo_consistency(
        gray, K, R, t, c, ref_img, config.min_ncc_seed, config.patch_wid,
        resolve_photo_views(config.max_photo_views, gray.shape[0]),
    )
    passing = nondeg & (cnt >= visible_lower_bound)
    if cand_valid is not None:
        # Shape bucketing pads the candidate axis; pad rows are explicitly
        # masked (their zero-pixel pseudo-triangulations would usually fail
        # nondeg anyway, but the mask is the guarantee).
        passing = passing & cand_valid

    # Nearest-first, first-passing per track via two segment mins.
    key = jnp.where(passing, dist, _BIG)
    seg_min = jax.ops.segment_min(key, track_id, n_tracks)
    is_best = passing & (dist <= seg_min[track_id])
    cand_idx = jnp.arange(track_id.shape[0])
    first = jax.ops.segment_min(
        jnp.where(is_best, cand_idx, jnp.iinfo(jnp.int32).max),
        track_id,
        n_tracks,
    )
    has_seed = first < jnp.iinfo(jnp.int32).max
    sel = jnp.clip(first, 0, track_id.shape[0] - 1)

    seeds = {
        "c": c[sel],
        "n": normal[sel],
        "ref": ref_img[sel].astype(jnp.int32),
        "vis": vis[sel],
        "proj": proj[sel],
        "score": score[sel],
        "valid": has_seed,
    }
    # Occupy cells at every visible hit (MVS2.py:258-259) plus the seed's own
    # reference-projection cell (deviation: guarantees expansion can't
    # re-claim the seed's own footprint; see mvs.expand docstring).
    n_img = gray.shape[0]
    hit_cells = which_cell(seeds["proj"], config.cell_size)    # (T, N, 2)
    img_ids = jnp.broadcast_to(
        jnp.arange(n_img, dtype=jnp.int32)[None, :], seeds["vis"].shape
    )
    mask = seeds["vis"] & has_seed[:, None]
    occupancy = fill_cells(occupancy, img_ids, hit_cells, mask)
    ref_cell = jnp.take_along_axis(
        hit_cells, seeds["ref"][:, None, None].astype(jnp.int32).repeat(2, -1),
        axis=1,
    )[:, 0]
    occupancy = fill_cells(
        occupancy, seeds["ref"], ref_cell, has_seed
    )
    ref_pix = jnp.take_along_axis(
        seeds["proj"],
        seeds["ref"][:, None, None].astype(jnp.int32).repeat(2, -1),
        axis=1,
    )[:, 0]
    packed = pack_patch_payload(
        seeds["c"], seeds["n"], seeds["score"], ref_pix, seeds["ref"],
        has_seed,
    )
    return seeds, occupancy, packed
