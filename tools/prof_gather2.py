#!/usr/bin/env python3
"""Dev micro-bench round 2: element-gather vs slice-gather; NMS argsort cost."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


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
M, V = 16384, 16
wid, side = 5, 11
win = side + 1
gray = jnp.asarray(rng.random((N, H, W)).astype(np.float32) * 255)
img16 = jnp.asarray(rng.integers(0, N, (M, V)).astype(np.int32))
ctr16 = jnp.asarray((rng.random((M, V, 2)) * [W - 40, H - 40] + 20).astype(np.float32))


# F: one big advanced-index element gather for bilinear windows (12x12)
@jax.jit
def elem_gather(gray, img, ctr):
    flat = gray.reshape(-1)
    x0 = jnp.floor(ctr[..., 0]).astype(jnp.int32) - wid   # (M, V)
    y0 = jnp.floor(ctr[..., 1]).astype(jnp.int32) - wid
    x0 = jnp.clip(x0, 0, W - win)
    y0 = jnp.clip(y0, 0, H - win)
    base = (img * H + y0) * W + x0                         # (M, V)
    dy = jnp.arange(win, dtype=jnp.int32) * W
    dx = jnp.arange(win, dtype=jnp.int32)
    idx = base[..., None, None] + dy[:, None] + dx[None, :]  # (M, V, 12, 12)
    window = flat[idx.reshape(-1)].reshape(M, V, win, win)
    return window.sum()


# G: row gather: (M*V*12) row starts, each a contiguous 12-pixel run via
# advanced indexing on 2D reshaped (N*H, W) with take along rows? Just
# gather rows as slices of 12: use one gather of (M*V*12, 12) elements.
@jax.jit
def row_gather(gray, img, ctr):
    flat2 = gray.reshape(N * H, W)
    x0 = jnp.clip(jnp.floor(ctr[..., 0]).astype(jnp.int32) - wid, 0, W - win)
    y0 = jnp.clip(jnp.floor(ctr[..., 1]).astype(jnp.int32) - wid, 0, H - win)
    rows = (img * H + y0)[..., None] + jnp.arange(win, dtype=jnp.int32)  # (M,V,12)
    # gather full rows then lane-slice: rows (M*V*12, W) would be 2.4 GB; no.
    # instead element gather per pixel within row:
    idx = rows[..., None] * W + (x0[..., None, None] + jnp.arange(win, dtype=jnp.int32))
    return flat2.reshape(-1)[idx.reshape(-1)].reshape(M, V, win, win).sum()


print(f"F elem-gather 12x12 V=16 : {timeit(lambda: elem_gather(gray, img16, ctr16))*1e3:.1f} ms")
print(f"G elem-gather rows  V=16 : {timeit(lambda: row_gather(gray, img16, ctr16))*1e3:.1f} ms")

img48 = jnp.asarray(rng.integers(0, N, (M, 48)).astype(np.int32))
ctr48 = jnp.asarray((rng.random((M, 48, 2)) * [W - 40, H - 40] + 20).astype(np.float32))


@jax.jit
def elem_gather48(gray, img, ctr):
    flat = gray.reshape(-1)
    x0 = jnp.clip(jnp.floor(ctr[..., 0]).astype(jnp.int32) - wid, 0, W - win)
    y0 = jnp.clip(jnp.floor(ctr[..., 1]).astype(jnp.int32) - wid, 0, H - win)
    base = (img * H + y0) * W + x0
    dy = jnp.arange(win, dtype=jnp.int32) * W
    dx = jnp.arange(win, dtype=jnp.int32)
    idx = base[..., None, None] + dy[:, None] + dx[None, :]
    return flat[idx.reshape(-1)].reshape(M, 48, win, win).sum()


print(f"F48 elem-gather 12x12 V=48: {timeit(lambda: elem_gather48(gray, img48, ctr48))*1e3:.1f} ms")

# NMS cost probes
resp = gray + 0.0


@jax.jit
def rank_nms(resp):
    n, h, w = resp.shape
    flat = resp.reshape(n, h * w)
    order = jnp.argsort(flat, axis=-1)
    ranks = jnp.zeros((n, h * w), jnp.int32)
    ranks = ranks.at[jnp.arange(n)[:, None], order].set(
        jnp.arange(h * w, dtype=jnp.int32)[None, :])
    rank_img = ranks.reshape(n, h, w)
    pooled = jax.lax.reduce_window(rank_img, jnp.int32(-1), jax.lax.max,
                                   (1, 9, 9), (1, 1, 1), "SAME")
    return (rank_img == pooled).sum()


@jax.jit
def bitcast_nms(resp):
    n, h, w = resp.shape
    # positive float -> monotone int32 bitcast; break ties with pixel index
    # in the low 12 bits (perturbs only ~2^-11 relative differences).
    r = jnp.maximum(resp, 0.0) + 1e-30
    bits = jax.lax.bitcast_convert_type(r, jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2) + \
        jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1) * w
    key = (bits & ~jnp.int32(0xFFF)) | (iota & jnp.int32(0xFFF))
    pooled = jax.lax.reduce_window(key, jnp.iinfo(jnp.int32).min, jax.lax.max,
                                   (1, 9, 9), (1, 1, 1), "SAME")
    return (key == pooled).sum()


print(f"rank NMS (argsort)       : {timeit(lambda: rank_nms(resp))*1e3:.1f} ms")
print(f"bitcast NMS              : {timeit(lambda: bitcast_nms(resp))*1e3:.1f} ms")


@jax.jit
def topk_probe(resp):
    n, h, w = resp.shape
    return jax.lax.top_k(resp.reshape(n, h * w), 4096)[0].sum()


print(f"top_k 4096 of 307k x48   : {timeit(lambda: topk_probe(resp))*1e3:.1f} ms")
