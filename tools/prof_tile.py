#!/usr/bin/env python3
"""Tile-resident gather experiments for the MVS photo-consistency sweep
(VERDICT r2 item 1).

The sweep's cost model today: XLA lowers vmap(dynamic_slice) to a slice
gather that costs ~1.2-1.5 us per INDEX on TPU regardless of slice size —
latency/issue-bound, 0.02% of HBM bandwidth.  Hypothesis: a Pallas kernel
that issues MANY outstanding async copies (one (24, W) 8-row-aligned slab
per sample, S samples per grid step, double-buffered across steps) can
overlap those latencies and extract the bilinear 11x11 patch in-VMEM via
dynamic-offset reads + lane rolls, beating the gather ceiling severalfold.

Experiments (run on the real chip, default env):
  E0  baseline: bilinear_sample_patches_stack + normalize at sweep shapes.
  E1  DMA-only Pallas kernel (no extraction): measures copy issue/wait
      throughput with S outstanding copies per step.
  E2  full kernel: DMA + dynamic extraction + bilinear + normalize,
      correctness-checked against the XLA path.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/prof_tile.py [--check]

Findings land in BASELINE.md + the config docstrings; the production kernel
(if E2 wins) lives in sfm_tpu/ops/gather.py.
"""
from __future__ import annotations

import argparse
import functools
import json

import numpy as np


ROWS = 24  # slab rows per sample: covers any 12-row window at 8-aligned base


def make_gather_kernel(n_steps, S, w, wid=5, extract=True, double=True):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    side = 2 * wid + 1   # 11
    win = side + 1       # 12
    # 1-D SMEM operands carry XLA's T(1024) tiled layout — Mosaic requires
    # the block size to be a multiple of 1024 to match.
    BI = -(-S * 8 // 1024) * 1024
    BF = -(-S * 2 // 1024) * 1024

    def issue(hbm, slab, sem, buf, pref_i):
        for s in range(S):
            row8 = pl.multiple_of(pref_i[s * 8 + 0], 8)
            pltpu.make_async_copy(
                hbm.at[pl.ds(row8, ROWS), :],
                slab.at[buf, s],
                sem.at[buf, s],
            ).start()

    def wait_and_process(slab, sem, out_ref, buf, pref_i, pref_f, hbm,
                         slab32=None):
        for s in range(S):
            row8 = pl.multiple_of(pref_i[s * 8 + 0], 8)
            pltpu.make_async_copy(
                hbm.at[pl.ds(row8, ROWS), :],
                slab.at[buf, s],
                sem.at[buf, s],
            ).wait()
        if extract == 4:
            # v4: ONE batched bf16->f32 cast of the whole step's slabs (the
            # per-sample (24, 256) cast is one of the two big per-sample
            # vector ops; its cost does not depend on the sample).
            slab32[...] = slab[buf].astype(jnp.float32)
        for s in range(S):
            if not extract:
                out_ref[s] = slab[buf, s, :side, :side].astype(jnp.bfloat16)
                continue
            dy = pref_i[s * 8 + 1]
            x_al = pl.multiple_of(pref_i[s * 8 + 2], 128)
            x_rem = pref_i[s * 8 + 3]
            fx = pref_f[s * 2 + 0]
            fy = pref_f[s * 2 + 1]
            if extract == 2:
                # v2: 8-way row select FIRST (bf16, (win+1, 256)), then the
                # f32 cast + dynamic roll on the ~2x smaller region.
                w256b = slab[buf, s, :, pl.ds(x_al, 256)]      # (ROWS,256) bf16
                rows = w256b[0 : win + 1]
                for j in range(1, 8):
                    rows = jnp.where(
                        dy == j, w256b[j : j + win + 1], rows
                    )                                          # (13, 256)
                w = pltpu.roll(
                    rows.astype(jnp.float32), 256 - x_rem, axis=1
                )
                a = w[:, :win]                                 # (13, 12)
                p00 = a[:win, :side]
                p01 = a[:win, 1:win]
                p10 = a[1 : win + 1, :side]
                p11 = a[1 : win + 1, 1:win]
                interp = (
                    p00 * (1 - fy) * (1 - fx)
                    + p01 * (1 - fy) * fx
                    + p10 * fy * (1 - fx)
                    + p11 * fy * fx
                )                                              # (12, 11)
                patch = interp[:side, :]
            elif extract == 4:
                w256 = slab32[s, :, pl.ds(x_al, 256)]
                w256 = pltpu.roll(w256, 256 - x_rem, axis=1)
                a = pltpu.roll(w256[:, :win], ROWS - dy, axis=0)  # (ROWS,12)
                p00 = a[:side, :side]
                p01 = a[:side, 1:win]
                p10 = a[1:win, :side]
                p11 = a[1:win, 1:win]
                patch = (
                    p00 * (1 - fy) * (1 - fx)
                    + p01 * (1 - fy) * fx
                    + p10 * fy * (1 - fx)
                    + p11 * fy * fx
                )                                              # (11, 11)
            elif extract == 3:
                # v3: dynamic SUBLANE roll replaces the 8-way static row
                # select AND shrinks the bilinear from (23, 11) to (11, 11):
                # lane-roll the window to lane 0, slice the 12 window lanes,
                # then roll rows so the (win+1)-row window starts at row 0.
                w256 = slab[buf, s, :, pl.ds(x_al, 256)].astype(jnp.float32)
                w256 = pltpu.roll(w256, 256 - x_rem, axis=1)
                a = pltpu.roll(w256[:, :win], ROWS - dy, axis=0)  # (ROWS,12)
                p00 = a[:side, :side]
                p01 = a[:side, 1:win]
                p10 = a[1:win, :side]
                p11 = a[1:win, 1:win]
                patch = (
                    p00 * (1 - fy) * (1 - fx)
                    + p01 * (1 - fy) * fx
                    + p10 * fy * (1 - fx)
                    + p11 * fy * fx
                )                                              # (11, 11)
            else:
                # f32 before the roll: Mosaic's dynamic rotate only lowers
                # for 32-bit element types.
                w256 = slab[buf, s, :, pl.ds(x_al, 256)].astype(jnp.float32)
                w256 = pltpu.roll(w256, 256 - x_rem, axis=1)   # window->lane 0
                a = w256[:, :win]                              # (ROWS, 12)
                p00 = a[: ROWS - 1, :side]
                p01 = a[: ROWS - 1, 1:win]
                p10 = a[1:ROWS, :side]
                p11 = a[1:ROWS, 1:win]
                interp = (
                    p00 * (1 - fy) * (1 - fx)
                    + p01 * (1 - fy) * fx
                    + p10 * fy * (1 - fx)
                    + p11 * fy * fx
                )                                              # (23, 11)
                patch = jnp.zeros((side, side), jnp.float32)
                for j in range(8):
                    patch = jnp.where(
                        dy == j, interp[j : j + side, :], patch
                    )
            m = jnp.sum(patch) / (side * side)
            c = patch - m
            nrm = jnp.sqrt(jnp.sum(c * c))
            desc = c / jnp.maximum(nrm, 1e-8)
            out_ref[s] = desc.astype(jnp.bfloat16)

    def kernel(pref_i, pref_i_nxt, pref_f, hbm, out_ref, slab, sem,
               slab32=None):
        i = pl.program_id(0)
        if not double:
            issue(hbm, slab, sem, 0, pref_i)
            wait_and_process(slab, sem, out_ref, 0, pref_i, pref_f, hbm,
                             slab32)
            return
        is_even = jax.lax.rem(i, 2) == 0

        @pl.when(i == 0)
        def _():
            issue(hbm, slab, sem, 0, pref_i)

        more = i + 1 < n_steps

        @pl.when(more & is_even)
        def _():
            issue(hbm, slab, sem, 1, pref_i_nxt)

        @pl.when(more & ~is_even)
        def _():
            issue(hbm, slab, sem, 0, pref_i_nxt)

        @pl.when(is_even)
        def _():
            wait_and_process(slab, sem, out_ref, 0, pref_i, pref_f, hbm,
                             slab32)

        @pl.when(~is_even)
        def _():
            wait_and_process(slab, sem, out_ref, 1, pref_i, pref_f, hbm,
                             slab32)

    nbuf = 2 if double else 1
    scratch = [
        pltpu.VMEM((nbuf, S, ROWS, w), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((nbuf, S)),
    ]
    if extract == 4:
        scratch.append(pltpu.VMEM((S, ROWS, w), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((BI,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (BI,),
                lambda i: (jnp.minimum(i + 1, n_steps - 1),),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((BF,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((S, side, side), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps * S, side, side),
                                       jnp.bfloat16),
        scratch_shapes=scratch,
    )


def gather_params(img_idx, ctr, h, w, wid, S):
    """Per-sample DMA/extraction params, padded+reshaped for S-per-step."""
    import jax.numpy as jnp

    side = 2 * wid + 1
    win = side + 1
    x = ctr[:, 0]
    y = ctr[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    base_x = jnp.clip(x0.astype(jnp.int32) - wid, 0, w - win)
    base_y = jnp.clip(y0.astype(jnp.int32) - wid, 0, h - win)
    row = img_idx.astype(jnp.int32) * h + base_y
    row8 = (row // 8) * 8
    dy = row - row8
    x_al = jnp.minimum((base_x // 128) * 128, w - 256)
    x_rem = base_x - x_al
    m = x.shape[0]
    pad = (-m) % S
    ints = jnp.stack(
        [row8, dy, x_al, x_rem] + [jnp.zeros_like(row8)] * 4, axis=1
    )  # (m, 8)
    flts = jnp.stack([fx, fy], axis=1)
    ints = jnp.pad(ints, ((0, pad), (0, 0)))
    flts = jnp.pad(flts, ((0, pad), (0, 0)))
    n_steps = (m + pad) // S
    # 1-D per-step blocks padded to a 1024 multiple (SMEM layout constraint).
    BI = -(-S * 8 // 1024) * 1024
    BF = -(-S * 2 // 1024) * 1024
    ints = jnp.pad(
        ints.reshape(n_steps, S * 8), ((0, 0), (0, BI - S * 8))
    ).reshape(-1)
    flts = jnp.pad(
        flts.reshape(n_steps, S * 2), ((0, 0), (0, BF - S * 2))
    ).reshape(-1)
    return ints, flts, n_steps


def build_case(m, n_img=48, h=480, w=640, wid=5, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    gray = (rng.random((n_img, h, w)) * 255).astype(np.float32)
    img_idx = rng.integers(0, n_img, m).astype(np.int32)
    xs = rng.uniform(wid + 1, w - wid - 2, m).astype(np.float32)
    ys = rng.uniform(wid + 1, h - wid - 2, m).astype(np.float32)
    ctr = np.stack([xs, ys], axis=1)
    flat = jnp.asarray(gray, jnp.bfloat16).reshape(n_img * h, w)
    flat = jnp.pad(flat, ((0, 8), (0, 0)))  # row8+24 can reach n*h+8
    return gray, jnp.asarray(img_idx), jnp.asarray(ctr), flat


def run_pallas(m, S, extract=True, double=True, n_img=48, h=480, w=640,
               wid=5, iters=20):
    import jax
    import jax.numpy as jnp
    from sfm_tpu.utils.roofline import _timeit

    gray, img_idx, ctr, flat = build_case(m, n_img, h, w, wid)

    @jax.jit
    def run(flat, img_idx, ctr):
        ints, flts, n_steps = gather_params(img_idx, ctr, h, w, wid, S)
        kern = make_gather_kernel(n_steps, S, w, wid, extract, double)
        out = kern(ints, ints, flts, flat)
        return out.astype(jnp.float32).sum()

    t = _timeit(lambda: run(flat, img_idx, ctr), iters)
    return {
        "m": m, "S": S, "extract": extract, "double": double,
        "time_s": round(t, 6), "us_per_sample": round(t / m * 1e6, 4),
    }


def run_baseline(m, n_img=48, h=480, w=640, wid=5, iters=20):
    import jax
    import jax.numpy as jnp
    from sfm_tpu.ops.ncc import bilinear_sample_patches_stack
    from sfm_tpu.ops.patches import normalize_descriptors
    from sfm_tpu.utils.roofline import _timeit

    gray, img_idx, ctr, _ = build_case(m, n_img, h, w, wid)
    stack = jnp.asarray(gray, jnp.bfloat16)

    @jax.jit
    def run(stack, img_idx, ctr):
        patches, inb = bilinear_sample_patches_stack(stack, img_idx, ctr, wid)
        return normalize_descriptors(patches).astype(jnp.bfloat16).sum()

    t = _timeit(lambda: run(stack, img_idx, ctr), iters)
    return {"m": m, "time_s": round(t, 6),
            "us_per_sample": round(t / m * 1e6, 4)}


def check(m=4096, S=32, n_img=8, h=480, w=640, wid=5, double=True,
          extract=True):
    """Correctness: kernel descriptors vs the XLA reference path."""
    import jax
    import jax.numpy as jnp
    from sfm_tpu.ops.ncc import bilinear_sample_patches_stack
    from sfm_tpu.ops.patches import normalize_descriptors

    gray, img_idx, ctr, flat = build_case(m, n_img, h, w, wid)
    stack = jnp.asarray(gray, jnp.bfloat16)
    patches, inb = bilinear_sample_patches_stack(stack, img_idx, ctr, wid)
    want = np.asarray(normalize_descriptors(patches))
    side = 2 * wid + 1

    ints, flts, n_steps = gather_params(img_idx, ctr, h, w, wid, S)
    kern = make_gather_kernel(n_steps, S, w, wid, extract, double)
    got = np.asarray(kern(ints, ints, flts, flat), np.float32)[:m]
    got = got.reshape(m, side * side)
    err = np.abs(got - want)
    print(f"check extract={extract}: max|diff| =", err.max(),
          " mean =", err.mean())
    assert err.max() < 2e-2, err.max()  # bf16 patch + bf16 desc rounding
    print("CHECK OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--m", type=int, default=81920)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    if args.check:
        check()
        check(extract=3)
        return

    out = {"baseline": run_baseline(args.m, iters=args.iters)}
    print("E0 baseline:", json.dumps(out["baseline"]))
    for S in (8, 32, 128):
        r = run_pallas(args.m, S, extract=False, iters=args.iters)
        print("E1 dma-only:", json.dumps(r))
    for S in (8, 32, 128):
        for double in (False, True):
            r = run_pallas(args.m, S, extract=True, double=double,
                           iters=args.iters)
            print("E2 full:", json.dumps(r))
    for S in (32, 128):
        r = run_pallas(args.m, S, extract=2, double=False, iters=args.iters)
        print("E3 v2(select-first):", json.dumps(r))
    for S in (32, 128):
        r = run_pallas(args.m, S, extract=3, double=False, iters=args.iters)
        print("E4 v3(sublane-roll):", json.dumps(r))
    for S in (16, 32, 64):
        r = run_pallas(args.m, S, extract=4, double=False, iters=args.iters)
        print("E5 v4(batch-cast):", json.dumps(r))


if __name__ == "__main__":
    main()
