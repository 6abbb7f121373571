#!/usr/bin/env python3
"""Dev micro-bench: which patch-gather formulation is fastest on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from sfm_tpu.ops.ncc import bilinear_sample_patches, bilinear_sample_patches_stack


def timeit(f, n=5):
    r = f(); jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)
N, H, W = 48, 480, 640
M = 16384
gray = jnp.asarray(rng.random((N, H, W)).astype(np.float32) * 255)
gray_bf = gray.astype(jnp.bfloat16)
centers = jnp.asarray(
    (rng.random((M, N, 2)) * [W - 40, H - 40] + 20).astype(np.float32))
img16 = jnp.asarray(rng.integers(0, N, (M, 16)).astype(np.int32))
ctr16 = jnp.asarray((rng.random((M, 16, 2)) * [W - 40, H - 40] + 20).astype(np.float32))
img48 = jnp.asarray(rng.integers(0, N, (M, 48)).astype(np.int32))


@jax.jit
def scan48(gray, centers):
    def body(_, i):
        p, inb = bilinear_sample_patches(gray[i], centers[:, i], 5)
        return None, (p.sum(-1), inb)
    _, (s, inb) = jax.lax.scan(body, None, jnp.arange(gray.shape[0]))
    return s.sum(), inb.sum()


print(f"A scan 2D 48 views     : {timeit(lambda: scan48(gray, centers))*1e3:.1f} ms")
print(f"A'scan 2D 48 views bf16: {timeit(lambda: scan48(gray_bf, centers))*1e3:.1f} ms")


@jax.jit
def stack_v(gray, img, ctr):
    p, inb = bilinear_sample_patches_stack(gray, img, ctr, 5)
    return p.sum(), inb.sum()


print(f"B stack 3D V=16        : {timeit(lambda: stack_v(gray, img16, ctr16))*1e3:.1f} ms")
print(f"C stack 3D V=48        : {timeit(lambda: stack_v(gray, img48, centers))*1e3:.1f} ms")


# D: nearest-pixel integer patches, no bilinear (reference getDescFeatures
# samples int coords): dynamic_slice (11, 11) at rounded center.
@partial(jax.jit, static_argnums=(2,))
def nearest48(gray, centers, wid=5):
    side = 2 * wid + 1
    def body(_, i):
        x0 = jnp.clip(jnp.round(centers[:, i, 0]).astype(jnp.int32) - wid, 0, W - side)
        y0 = jnp.clip(jnp.round(centers[:, i, 1]).astype(jnp.int32) - wid, 0, H - side)
        g = gray[i]
        win = jax.vmap(lambda by, bx: jax.lax.dynamic_slice(g, (by, bx), (side, side)))(y0, x0)
        return None, win.sum((-1, -2))
    _, s = jax.lax.scan(body, None, jnp.arange(gray.shape[0]))
    return s.sum()


print(f"D scan 2D nearest 11x11: {timeit(lambda: nearest48(gray, centers))*1e3:.1f} ms")


# E: one-hot matmul row extraction: rows via dynamic_slice in sublane dim only,
# full-width rows then lane shift? Try gathering (12, 128) slices (aligned width).
@jax.jit
def wide48(gray, centers):
    wid = 5
    win = 2 * wid + 2
    def body(_, i):
        x0 = jnp.clip(jnp.floor(centers[:, i, 0]).astype(jnp.int32) - wid, 0, W - 128)
        y0 = jnp.clip(jnp.floor(centers[:, i, 1]).astype(jnp.int32) - wid, 0, H - win)
        g = gray[i]
        w2 = jax.vmap(lambda by, bx: jax.lax.dynamic_slice(g, (by, bx), (win, 128)))(y0, x0)
        return None, w2[:, :, :12].sum((-1, -2))
    _, s = jax.lax.scan(body, None, jnp.arange(gray.shape[0]))
    return s.sum()


print(f"E scan 2D (12,128) wide: {timeit(lambda: wide48(gray, centers))*1e3:.1f} ms")
