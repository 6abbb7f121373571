"""Per-image cell occupancy grids as device arrays.

The reference CellTable (MVS2.py:80-173) keeps per-image boolean numpy grids
plus a Python dict Q_table of patches per cell.  Here occupancy is a single
(N, Ci, Cj) device array updated by scatter, and the Q-table's only live role
(deduplicated final extraction, reconstruct_from_Q MVS2.py:159-173) is
covered by the patch arrays themselves — every accepted patch is in the cloud
exactly once.

Convention: True = occupied (the reference uses True = vacant).
Cell mapping: cell = floor(pixel / cell_size) (MVS2.py:113-114), grid shape
(ceil((W-1)/s), ceil((H-1)/s)) per image — indexed [cell_x, cell_y] like the
reference's [col-cell][row-cell].
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def grid_shape(h: int, w: int, cell_size: int):
    """(Cx, Cy) grid dimensions (reference MVS2.py:88)."""
    return (
        math.ceil((w - 1) / cell_size),
        math.ceil((h - 1) / cell_size),
    )


def make_occupancy(n_images: int, h: int, w: int, cell_size: int):
    cx, cy = grid_shape(h, w, cell_size)
    return jnp.zeros((n_images, cx, cy), bool)


def which_cell(pix, cell_size: int):
    """Pixel (…, 2) float -> (…, 2) int32 cell (cx, cy)."""
    return jnp.floor(pix / cell_size).astype(jnp.int32)


def cell_center(cell, cell_size: int):
    """Cell (…, 2) int -> pixel-space center (MVS2.py:116-117)."""
    return (cell.astype(jnp.float32) + 0.5) * cell_size


def is_vacant(occupancy, img_idx, cell):
    """Bounds-checked vacancy (out of bounds counts occupied, MVS2.py:90-96)."""
    cx, cy = occupancy.shape[1], occupancy.shape[2]
    inb = (
        (cell[..., 0] >= 0)
        & (cell[..., 0] < cx)
        & (cell[..., 1] >= 0)
        & (cell[..., 1] < cy)
    )
    ci = jnp.clip(cell[..., 0], 0, cx - 1)
    cj = jnp.clip(cell[..., 1], 0, cy - 1)
    occupied = occupancy[img_idx, ci, cj]
    return inb & ~occupied


def fill_cells(occupancy, img_idx, cells, mask):
    """Scatter-occupy cells; masked entries are dropped.

    img_idx (...,) int32, cells (..., 2) int32, mask (...,) bool.
    """
    cx, cy = occupancy.shape[1], occupancy.shape[2]
    ci = jnp.clip(cells[..., 0], 0, cx - 1)
    cj = jnp.clip(cells[..., 1], 0, cy - 1)
    img = jnp.where(mask, img_idx, 0)
    val = mask  # scatter True only where masked-in (False is a no-op via OR)
    flat = occupancy.reshape(-1)
    lin = (img * cx + jnp.where(mask, ci, 0)) * cy + jnp.where(mask, cj, 0)
    flat = flat.at[lin.reshape(-1)].max(val.reshape(-1))
    return flat.reshape(occupancy.shape)
