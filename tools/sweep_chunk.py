"""Sweep MVS rounds_per_call (device-program chunking) on dinoRing-48.

Each program call pays a fixed ~23 ms payload fetch over the axon tunnel;
larger chunks amortize it but waste device rounds after the frontier dries.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_chunk.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from sfm_tpu.config import PipelineConfig, BaConfig, MvsConfig
from sfm_tpu.io import read_pars, load_images
from sfm_tpu.sfm import structure_from_motion
from sfm_tpu.ba.run import bundle_adjust
from sfm_tpu.mvs import dense_reconstruction

DATA = "/root/reference/dinoRing"


def main():
    calib = read_pars(os.path.join(DATA, "dinoR_par.txt"))
    images, _ = load_images(DATA, "png")
    calib = calib.subset(range(images.shape[0]))
    recon = structure_from_motion(images, calib, PipelineConfig())
    recon, _ = bundle_adjust(recon, BaConfig())

    for chunk in (1, 2, 3, 4):
        cfg = MvsConfig(rounds_per_call=chunk)
        dense = dense_reconstruction(images, calib, recon, cfg, scale=10.0)  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            dense = dense_reconstruction(images, calib, recon, cfg, scale=10.0)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "rounds_per_call": chunk,
            "mvs_s": round(best, 3),
            "points": dense.num_points,
            "rounds": dense.metrics.values["mvs_rounds"],
        }), flush=True)


if __name__ == "__main__":
    main()
