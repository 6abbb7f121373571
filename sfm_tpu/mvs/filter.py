"""Visibility-consistency outlier filtering.

The reference implements PMVS's outlier filter but ships it disabled as
"very very slow" (CellTable.filter_out_outlier, MVS2.py:132-158, call site
disabled at MVS2.py:280-281): per occupied cell, a patch is an outlier if a
non-neighboring patch shares the cell and the patch's support
(visible_count * avg_ncc) falls below the cell's mean (1 - avg_ncc).

Vectorized formulation over the (patch, hit-cell) incidence list with one
deliberate simplification: the reference tests every patch PAIR in a cell
(quadratic); here each patch is tested against the cell's best-scoring patch
— the witness that matters, since any patch non-neighboring with some patch
in the cell is, in the overwhelming case, non-neighboring with the dominant
one.  Cost is linear in total visible hits.
"""

from __future__ import annotations

import numpy as np


def filter_outliers(
    points: np.ndarray,     # (D, 3)
    normals: np.ndarray,    # (D, 3)
    scores: np.ndarray,     # (D,) mean NCC
    vis: np.ndarray,        # (D, N) bool visible-view mask
    proj: np.ndarray,       # (D, N, 2) projected pixels
    cell_size: int,
    grid_w: int,
    grid_h: int,
    neighbor_threshold: float = 0.2,   # is_patch_neighbor default, MVS2.py:298
) -> np.ndarray:
    """Return a keep-mask (D,) bool."""
    d, n = vis.shape
    if d == 0:
        return np.ones(0, bool)
    vis_ct = vis.sum(1)

    # (patch, cell) incidence from visible hits.
    pid, img = np.nonzero(vis)
    px = np.clip((proj[pid, img, 0] // cell_size).astype(np.int64), 0, grid_w - 1)
    py = np.clip((proj[pid, img, 1] // cell_size).astype(np.int64), 0, grid_h - 1)
    cell = (img.astype(np.int64) * grid_w + px) * grid_h + py

    # Compact cell ids.
    uniq, cell_c = np.unique(cell, return_inverse=True)
    n_cells = len(uniq)

    # Per-cell stats: count, mean(1 - score), best patch by score.
    cnt = np.bincount(cell_c, minlength=n_cells)
    thr = np.bincount(cell_c, weights=(1.0 - scores[pid]), minlength=n_cells)
    thr = thr / np.maximum(cnt, 1)
    order = np.argsort(scores[pid], kind="stable")
    best = np.zeros(n_cells, np.int64)
    best[cell_c[order]] = pid[order]  # last write wins = max score

    q = best[cell_c]                       # witness patch per incidence
    dvec = points[pid] - points[q]
    planarity = np.abs(
        np.einsum("ij,ij->i", dvec, normals[pid])
        + np.einsum("ij,ij->i", dvec, normals[q])
    )
    non_neighbor = (planarity >= neighbor_threshold) & (q != pid)
    weak = vis_ct[pid] * scores[pid] < thr[cell_c]
    flagged = non_neighbor & weak & (cnt[cell_c] > 1)

    removed = np.zeros(d, bool)
    np.logical_or.at(removed, pid, flagged)
    return ~removed
