"""Measure shard_map/GSPMD overhead ON HARDWARE with a 1-device mesh
(VERDICT r4 item 3).

The multi-chip path (shard_map feature/pair programs, sharded BA, GSPMD MVS
rounds with the per-device Pallas slab gather) is equality-tested on the
8-device simulated CPU mesh, but its *cost* on a real chip was unmeasured —
`tools/comm_model.py`'s scaling projections take the per-device compute term
on faith.  A 1-device mesh runs the exact sharded program (shard_map
partitioning, sharding constraints, collective lowering with trivial
collectives) on the same chip as the unsharded program, so the wall delta
bounds the partitioning machinery's own overhead.

Run (default env, real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/hw_shard_overhead.py
Writes SHARD_OVERHEAD_r05.txt style lines to stdout; redirect to record.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, warm=3):
    """Median wall of ``warm`` runs after one untimed run."""
    fn()
    walls = []
    for _ in range(warm):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return walls[len(walls) // 2], walls


def main():
    import jax
    import jax.numpy as jnp

    from sfm_tpu.ba.run import bundle_adjust
    from sfm_tpu.config import BaConfig, MvsConfig, PipelineConfig
    from sfm_tpu.io import load_images, read_pars
    from sfm_tpu.mvs import dense_reconstruction
    from sfm_tpu.parallel.mesh import data_mesh
    from sfm_tpu.sfm import structure_from_motion

    np.asarray(jnp.arange(8))  # tunnel init
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")

    data = "/root/reference/dinoRing"
    calib = read_pars(os.path.join(data, "dinoR_par.txt"))
    images, _ = load_images(data, "png", max_images=48)
    calib = calib.subset(range(48))
    cfg = PipelineConfig(ba=BaConfig(dtype="float32"), mvs=MvsConfig())
    mesh = data_mesh(num_devices=1)

    results = {}

    # --- SfM (features + pair program). ---
    for name, m in (("sfm_unsharded", None), ("sfm_sharded1", mesh)):
        med, walls = timed(
            lambda m=m: structure_from_motion(images, calib, cfg, mesh=m)
        )
        results[name] = med
        print(f"{name}: median {med:.3f} s  samples "
              f"{[round(w, 3) for w in walls]}", flush=True)

    recon = structure_from_motion(images, calib, cfg)

    # --- BA, frozen + joint (PCG and dense Schur take the mesh path). ---
    import copy

    for solver, ba_cfg in (
        ("frozen", BaConfig(dtype="float32")),
        ("joint_dense", BaConfig(dtype="float32", refine_cameras=True)),
        (
            "joint_pcg",
            BaConfig(
                dtype="float32", refine_cameras=True, dense_schur_max_cams=1
            ),
        ),
    ):
        for name, m in ((f"ba_{solver}_unsharded", None),
                        (f"ba_{solver}_sharded1", mesh)):
            med, walls = timed(
                lambda m=m, c=ba_cfg: bundle_adjust(
                    copy.deepcopy(recon), c, mesh=m
                )
            )
            results[name] = med
            print(f"{name}: median {med:.3f} s  samples "
                  f"{[round(w, 3) for w in walls]}", flush=True)

    # --- MVS (seed + rounds incl. the sharded Pallas slab gather). ---
    recon, info = bundle_adjust(recon, cfg.ba)
    for name, m in (("mvs_unsharded", None), ("mvs_sharded1", mesh)):
        med, walls = timed(
            lambda m=m: dense_reconstruction(
                images, calib, recon, cfg.mvs, 10.0, mesh=m
            )
        )
        results[name] = med
        print(f"{name}: median {med:.3f} s  samples "
              f"{[round(w, 3) for w in walls]}", flush=True)

    d0 = dense_reconstruction(images, calib, recon, cfg.mvs, 10.0)
    d1 = dense_reconstruction(images, calib, recon, cfg.mvs, 10.0, mesh=mesh)
    print(f"mvs points unsharded={d0.num_points} sharded1={d1.num_points}")

    print("\nOverhead summary (sharded1 / unsharded):")
    for stage in ("sfm", "ba_frozen", "ba_joint_dense", "ba_joint_pcg",
                  "mvs"):
        u = results[f"{stage}_unsharded"]
        s = results[f"{stage}_sharded1"]
        print(f"  {stage}: {s:.3f} / {u:.3f} = {s / u:.2f}x "
              f"(+{(s - u) * 1e3:.0f} ms)")


if __name__ == "__main__":
    main()
