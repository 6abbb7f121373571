#!/usr/bin/env python3
"""Dev micro-bench: ablate expansion-round pieces + V=8 vs V=16."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.config import MvsConfig
from sfm_tpu.mvs.cells import make_occupancy, which_cell, is_vacant, fill_cells
from sfm_tpu.mvs.expand import expansion_round, _OFFSETS
from sfm_tpu.mvs.photoconsistency import photo_consistency


def sync(r):
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])


def timeit(f, n=5):
    sync(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    sync(r)
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)
N, H, W = 48, 480, 640
CAP = 16384
gray = jnp.asarray(rng.random((N, H, W)).astype(np.float32) * 255)
K = jnp.asarray(np.tile(np.asarray([[1500.0, 0, 320], [0, 1500.0, 240], [0, 0, 1]], np.float32), (N, 1, 1)))
R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (N, 1, 1)))
t = jnp.asarray(np.tile(np.asarray([0, 0, 0.6], np.float32), (N, 1)))
centers_cam = jnp.zeros((N, 3), jnp.float32)
centers = jnp.asarray((rng.random((CAP, 3)) * 0.1 - 0.05).astype(np.float32))
ref = jnp.asarray(rng.integers(0, N, CAP).astype(np.int32))
occ = make_occupancy(N, H, W, 2)
f_c = centers
f_n = jnp.asarray((rng.random((CAP, 3)) - 0.5).astype(np.float32))
f_n = f_n / jnp.linalg.norm(f_n, axis=-1, keepdims=True)
f_vis = jnp.asarray(rng.random((CAP, N)) < 0.2)
f_proj = jnp.asarray((rng.random((CAP, N, 2)) * [W - 40, H - 40] + 20).astype(np.float32))
f_valid = jnp.ones((CAP,), bool)

for v in (16, 8):
    t_pc = timeit(lambda v=v: photo_consistency(gray, K, R, t, centers, ref, 0.7, 5, v))
    print(f"photo_consistency V={v}: {t_pc*1e3:.0f} ms")
    cfg = MvsConfig(round_capacity=CAP, max_photo_views=v)
    t_rd = timeit(lambda cfg=cfg: expansion_round(
        gray, K, R, t, centers_cam, occ, f_c, f_n, f_vis, f_proj, f_valid,
        cfg, 3, CAP, 10.0))
    print(f"expansion_round  V={v}: {t_rd*1e3:.0f} ms")


# Ablation: candidate enumeration + pre-dedup + nonzero compaction only.
@jax.jit
def enum_dedup(occupancy, f_c, f_vis, f_proj, f_valid):
    n_img = N
    F = f_c.shape[0]
    hit_cell = which_cell(f_proj, 2)
    cand_cell = hit_cell[:, :, None, :] + _OFFSETS[None, None]
    img_ids = jnp.broadcast_to(jnp.arange(n_img, dtype=jnp.int32)[None, :, None], (F, n_img, 4))
    vacant = is_vacant(occupancy, img_ids, cand_cell)
    cand_ok = f_valid[:, None, None] & f_vis[:, :, None] & vacant
    n_flat = F * n_img * 4
    cx, cy = occupancy.shape[1], occupancy.shape[2]
    cell_flat = cand_cell.reshape(-1, 2)
    img_flat = jnp.repeat(jnp.broadcast_to(jnp.arange(n_img, dtype=jnp.int32)[None, :], (F, n_img)).reshape(-1), 4)
    lin_all = (img_flat * cx + jnp.clip(cell_flat[:, 0], 0, cx - 1)) * cy + jnp.clip(cell_flat[:, 1], 0, cy - 1)
    flat_ok = cand_ok.reshape(-1)
    idx_all = jnp.arange(n_flat, dtype=jnp.int32)
    big = jnp.int32(n_flat)
    first = jnp.full((occupancy.size,), big, jnp.int32).at[lin_all].min(jnp.where(flat_ok, idx_all, big))
    flat_ok = flat_ok & (first[lin_all] == idx_all)
    (sel,) = jnp.nonzero(flat_ok, size=CAP, fill_value=flat_ok.shape[0] - 1)
    return sel.sum()


print(f"enum+dedup+nonzero    : {timeit(lambda: enum_dedup(occ, f_c, f_vis, f_proj, f_valid))*1e3:.0f} ms")


# fill_cells double scatter ablation
vis = jnp.asarray(rng.random((CAP, N)) < 0.2)
proj = f_proj
acc = jnp.asarray(rng.random(CAP) < 0.7)
img = jnp.asarray(rng.integers(0, N, CAP).astype(np.int32))
cell = jnp.asarray(rng.integers(0, 200, (CAP, 2)).astype(np.int32))


@jax.jit
def fills(occupancy, vis, proj, acc, img, cell):
    hit_cells_new = which_cell(proj, 2)
    img_ids_all = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], vis.shape)
    occupancy = fill_cells(occupancy, img_ids_all, hit_cells_new, vis & acc[:, None])
    occupancy = fill_cells(occupancy, img, cell, acc)
    return occupancy.sum()


print(f"fill_cells x2         : {timeit(lambda: fills(occ, vis, proj, acc, img, cell))*1e3:.0f} ms")
