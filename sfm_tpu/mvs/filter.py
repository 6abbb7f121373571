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

import functools

import jax
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


@functools.partial(
    jax.jit,
    static_argnames=("cell_size", "grid_w", "grid_h", "g_cap", "k_hit"),
)
def filter_outliers_device(
    points,      # (D, 3) f32
    normals,     # (D, 3) f32
    scores,      # (D,) f32
    vis,         # (D, N) bool
    proj,        # (D, N, 2) f32
    valid,       # (D,) bool — padding mask (pad rows contribute nothing)
    cell_size: int,
    grid_w: int,
    grid_h: int,
    neighbor_threshold=0.2,
    g_cap: int = 64,
    k_hit: int = 0,
):
    """Device (jit) version of :func:`filter_outliers` — identical keep-mask.

    The host version groups incidences per cell and runs a padded
    (cells, G, G) pairwise pass; on device the same pairs are enumerated by
    sorting incidences by cell key and comparing each entry against its next
    ``g_cap - 1`` sorted neighbors (same key => same cell), so no
    data-dependent group shapes exist.  Per-cell support thresholds come
    from one scatter-add into the dense cell grid.

    ``g_cap`` must exceed the largest cell occupancy for exactness; the
    returned ``max_group`` lets the caller verify (and re-run with a larger
    cap — a new compile — in the overflow case; never silent).  ``k_hit``
    (0 = N) bounds visible views per patch: V-gated pipelines pass
    ``max_photo_views - 1`` to shrink the incidence space ~N/V-fold; a row
    with more hits than ``k_hit`` shows up in the returned
    ``hits_dropped`` counter (exactness violated -> caller re-runs
    un-gated), never silently.

    Returns (keep (D,) bool incl. padding mask, max_group (), hits_dropped ()).
    """
    import jax.numpy as jnp

    d, n = vis.shape
    vis = vis & valid[:, None]

    # Compact incidences: each patch has at most k_hit visible views (the
    # V-gate bounds it to max_photo_views - 1; ungated it is N), so a
    # row-wise top_k over view-index weights shrinks the incidence space
    # ~N/V-fold before the sort/pairwise pass (the same extraction trick as
    # mvs.expand's hit enumeration; order is irrelevant here — the pairwise
    # rule is symmetric).
    vis_ct = jnp.sum(vis.astype(jnp.float32), axis=1)          # (D,)
    k_hit = n if k_hit <= 0 else min(k_hit, n)
    wv_desc = jnp.arange(n, 0, -1, dtype=jnp.int32)
    wv, hit_img = jax.lax.top_k(
        jnp.where(vis, wv_desc[None, :], 0), k_hit
    )                                                          # (D, K)
    inc_ok = (wv > 0).reshape(-1)                              # (I,)
    img_f = hit_img.astype(jnp.int32).reshape(-1)
    pid_f = jnp.repeat(jnp.arange(d, dtype=jnp.int32), k_hit)
    pix = jnp.take_along_axis(
        proj, hit_img[..., None], axis=1
    ).reshape(-1, 2)                                           # (I, 2)
    px = jnp.clip((pix[:, 0] // cell_size).astype(jnp.int32), 0, grid_w - 1)
    py = jnp.clip((pix[:, 1] // cell_size).astype(jnp.int32), 0, grid_h - 1)
    lin_f = (img_f * grid_w + px) * grid_h + py                # (I,)

    # Per-cell support threshold: mean(1 - score) over the cell's incidences
    # (reference MVS2.py:139-141 — includes the candidate itself).
    n_cells = n * grid_w * grid_h
    one = jnp.where(inc_ok, 1.0, 0.0)
    cnt = jnp.zeros(n_cells, jnp.float32).at[lin_f].add(one)
    ssum = jnp.zeros(n_cells, jnp.float32).at[lin_f].add(
        jnp.where(inc_ok, 1.0 - scores[pid_f], 0.0)
    )
    thr = ssum / jnp.maximum(cnt, 1.0)
    # max over REAL cells only: invalid incidences all scatter to lin_f of
    # garbage rows... they carry one=0, so cnt at their cells is unaffected.
    max_group = cnt.max().astype(jnp.int32)

    weak_f = inc_ok & (vis_ct[pid_f] * scores[pid_f] < thr[lin_f])

    # Sort incidences by cell key (invalid -> sentinel past every real key).
    big = jnp.int32(n_cells)
    key = jnp.where(inc_ok, lin_f, big)
    order = jnp.argsort(key)
    key_s = key[order]
    pid_s = pid_f[order]
    p_s = points[pid_s]
    n_s = normals[pid_s]
    w_s = weak_f[order]
    size = key.shape[0]
    pos = jnp.arange(size)

    def body(off, rm_inc):
        # Compare sorted entry i with entry i+off (rolled); a pair is real
        # iff both share a cell key and the window did not wrap.  plan() is
        # symmetric, so one pass flags the weak side(s) of each unordered
        # pair once.  Flags accumulate PER INCIDENCE (elementwise — a
        # per-iteration scatter over the incidence space measured ~8 s on
        # dino48; the single scatter now happens once, after the loop).
        kb = jnp.roll(key_s, -off)
        same = (key_s == kb) & (key_s < big) & (pos < size - off)
        dvec = p_s - jnp.roll(p_s, -off, axis=0)
        plan = jnp.abs(
            jnp.sum(dvec * n_s, axis=-1)
            + jnp.sum(dvec * jnp.roll(n_s, -off, axis=0), axis=-1)
        )
        non_nb = same & (plan >= neighbor_threshold)
        flag_a = non_nb & w_s
        flag_b = non_nb & jnp.roll(w_s, -off)
        return rm_inc | flag_a | jnp.roll(flag_b, off)

    rm_inc = jax.lax.fori_loop(
        1, g_cap, body, jnp.zeros(size, bool)
    )
    removed = jnp.zeros(d, bool).at[pid_s].max(rm_inc)
    hits_dropped = (
        jnp.sum(vis.astype(jnp.int32))
        - jnp.sum(inc_ok.astype(jnp.int32))
    )
    return ~removed & valid, max_group, hits_dropped
