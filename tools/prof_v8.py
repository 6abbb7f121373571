#!/usr/bin/env python3
"""Dev experiment: MVS quality/time vs max_photo_views on real dinoRing."""
import os
import sys
import time

import numpy as np


def main():
    import jax
    from sfm_tpu.config import PipelineConfig, BaConfig, MvsConfig
    from sfm_tpu.io import read_pars, load_images
    from sfm_tpu.sfm import structure_from_motion
    from sfm_tpu.ba.run import bundle_adjust
    from sfm_tpu.mvs import dense_reconstruction

    data = "/root/reference/dinoRing"
    calib = read_pars(os.path.join(data, "dinoR_par.txt"))
    images, _ = load_images(data, "png", max_images=48)
    calib = calib.subset(range(48))
    config = PipelineConfig(ba=BaConfig(dtype="float32"))
    recon = structure_from_motion(images, calib, config)
    recon, _ = bundle_adjust(recon, config.ba)

    for v in [int(x) for x in sys.argv[1:]] or (16, 8, 12):
        cfg = MvsConfig(max_photo_views=v)
        d = dense_reconstruction(images, calib, recon, cfg, 10.0)  # compile
        t0 = time.perf_counter()
        d = dense_reconstruction(images, calib, recon, cfg, 10.0)
        dt = time.perf_counter() - t0
        print(f"V={v:3d}: {d.num_points} points, {d.num_seeds} seeds, "
              f"{dt:.2f} s warm, mean score {d.scores.mean():.4f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
