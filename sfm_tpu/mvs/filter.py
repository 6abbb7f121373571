"""Visibility-consistency outlier filtering.

The reference implements PMVS's outlier filter but ships it disabled as
"very very slow" (CellTable.filter_out_outlier, MVS2.py:132-158, call site
disabled at MVS2.py:280-281): per cell, a patch p2 is an outlier if ANY
other patch p1 sharing the cell is non-neighboring with it
(|d.n1 + d.n2| >= 0.2, is_patch_neighbor MVS2.py:298) AND p2's support
(visible_count * avg_ncc) falls below the cell's mean (1 - avg_ncc).

This is the reference's EXACT pairwise rule, vectorized: incidences are
grouped by cell, each group padded to the cell-occupancy maximum, and the
pairwise planarity test runs as a batched (cells, G, G) computation in
chunks of cells (G is small — a handful of patches share a cell — so the
quadratic term is trivial; the reference's slowness was interpreted-Python
quadruple loops over every cell of every image, not the math).

Deviation note: the reference only filters cells whose occupancy bit is
False — an artifact of its accepted-patch-never-occupies-own-cell bug (see
PARITY.md); here the rule applies to every cell a patch hits.
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
    cell_chunk: int = 8192,
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

    # Group incidences by cell.
    order = np.argsort(cell, kind="stable")
    pid_s = pid[order]
    cell_s = cell[order]
    uniq, starts, cnt = np.unique(cell_s, return_index=True, return_counts=True)
    n_cells = len(uniq)

    # Per-cell support threshold: mean(1 - score) over the cell's patches
    # (includes the candidate itself, like the reference, MVS2.py:139-141).
    inv = np.repeat(np.arange(n_cells), cnt)
    thr = np.bincount(inv, weights=(1.0 - scores[pid_s])) / cnt

    multi = cnt > 1
    if not multi.any():
        return np.ones(d, bool)

    removed = np.zeros(d, bool)
    G = int(cnt[multi].max())
    mcells = np.flatnonzero(multi)
    for lo in range(0, len(mcells), cell_chunk):
        sel = mcells[lo: lo + cell_chunk]
        c = len(sel)
        # Padded (c, G) patch-id table for this chunk of cells.
        tbl = np.zeros((c, G), np.int64)
        valid = np.arange(G)[None, :] < cnt[sel][:, None]
        flat_rows = np.repeat(np.arange(c), cnt[sel])
        flat_cols = np.concatenate([np.arange(k) for k in cnt[sel]])
        src = np.concatenate(
            [pid_s[starts[i]: starts[i] + cnt[i]] for i in sel]
        )
        tbl[flat_rows, flat_cols] = src
        # Exact pairwise planarity |d.n1 + d.n2| per cell (c, G, G), with
        # d = p_a - p_b (is_patch_neighbor, MVS2.py:298-299).
        P = points[tbl]                       # (c, G, 3)
        Nrm = normals[tbl]
        dvec = P[:, :, None, :] - P[:, None, :, :]
        plan = np.abs(
            np.einsum("cabj,caj->cab", dvec, Nrm)      # (p_a - p_b) . n_a
            + np.einsum("cabj,cbj->cab", dvec, Nrm)    # (p_a - p_b) . n_b
        )
        pair_ok = valid[:, :, None] & valid[:, None, :]
        diff = tbl[:, :, None] != tbl[:, None, :]
        # Patch in column b is non-neighboring with SOME other patch a.
        non_nb_any = (
            (plan >= neighbor_threshold) & pair_ok & diff
        ).any(axis=1)                          # (c, G) over b
        weak = vis_ct[tbl] * scores[tbl] < thr[sel][:, None]
        flagged = non_nb_any & weak & valid
        removed[tbl[flagged]] = True
    return ~removed
