"""Quality harness for the UNMODIFIED reference (cap made env-configurable in
the /tmp copy only). Runs SfM+BA (and optionally MVS), then computes post-BA
reprojection statistics from the reference's own GlobalSet state and records
everything as JSON.  stdout of the reference is redirected to a log file by
the caller (show_list floods O(n^2) lines)."""
import argparse
import json
import math
import os
import sys
import time
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, "/tmp/refq")        # pyntcloud stub
sys.path.insert(0, "/tmp/refq/src")    # patched reference copy

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
plt.show = lambda *a, **k: None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--par", required=True)
    ap.add_argument("--scale", type=float, default=10.0)
    ap.add_argument("--mvs", action="store_true")
    ap.add_argument("--out", required=True)
    args_cli = ap.parse_args()

    import cv2
    import glob as globmod

    # Capture the scipy BA result so we can also report the reference's
    # INTERNAL optimum (refined cameras + points), which SFM.py:181-183
    # discards in favor of calibration cameras.
    import scipy.optimize as sopt
    captured = {}
    _orig_lsq = sopt.least_squares

    def _capturing_lsq(*a, **k):
        res = _orig_lsq(*a, **k)
        captured["res"] = res
        return res

    sopt.least_squares = _capturing_lsq

    import utils
    import SFM
    SFM.least_squares = _capturing_lsq
    from GlobalSet import GlobalSet

    args = SimpleNamespace(
        img_dir=args_cli.data, par_path=args_cli.par, img_type="png",
        scale=args_cli.scale, debug=False, nonSeq=False, cell_size=2,
        desc_wid=5,
    )

    files = sorted(globmod.glob(args.img_dir + "/*." + args.img_type))
    imgs = [cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB) for f in files]
    sys.stderr.write(f"[harness] {len(imgs)} images\n")

    gs = GlobalSet(threshold=0.01)
    t0 = time.time()
    SFM.StructureFromMotion(imgs, gs, args, 0.3)
    t_sfm_ba = time.time() - t0
    sys.stderr.write(f"[harness] SfM+BA done in {t_sfm_ba:.1f}s\n")

    # Post-BA reprojection statistics from the reference's own state
    # (world points were written back by updateWorldPoints, SFM.py:207-210).
    par_K, par_r, par_t = utils.read_pars(args)
    errs = []
    n_obs, n_pts, legal = gs.getInfo()
    for s in legal:
        X = np.asarray(s.world_point, dtype=np.float64)
        for tup in s.point2d_list:
            i = tup[0]
            proj = utils.projectPoint(X, par_r[i], par_t[i], par_K[i])
            errs.append(float(np.linalg.norm(proj - np.asarray(tup[1:3], dtype=np.float64))))
    errs = np.asarray(errs)
    internal = {}
    if "res" in captured:
        r = np.asarray(captured["res"].fun).reshape(-1, 2)
        pn = np.linalg.norm(r, axis=1)
        internal = {
            "internal_rms_px": float(np.sqrt(np.mean(pn ** 2))),
            "internal_mean_px": float(np.mean(pn)),
        }
    result = {
        **internal,
        "n_images": len(imgs),
        "sfm_ba_s": t_sfm_ba,
        "n_tracks": int(n_pts),
        "n_obs": int(n_obs),
        "post_ba_rms_px": float(np.sqrt(np.mean(errs ** 2))),
        "post_ba_mean_px": float(np.mean(errs)),
        "post_ba_p95_px": float(np.percentile(errs, 95)),
        "mvs_cap": int(os.environ.get("REF_MVS_CAP", "100000")),
    }
    with open(args_cli.out, "w") as f:
        json.dump(result, f, indent=1)
    sys.stderr.write(f"[harness] sparse metrics: {json.dumps(result)}\n")

    if args_cli.mvs:
        import MVS2
        t1 = time.time()
        MVS2.DensePointsWithMVS2(imgs, gs, args)
        result["mvs_s"] = time.time() - t1
        # seed / dense clouds captured by the pyntcloud stub in cwd
        for name, key in (("initial_patches", "seeds"), ("all_patches", "dense_points")):
            p = name + ".ply.npz"
            if os.path.exists(p):
                result[key] = int(np.load(p)["points"].shape[0])
        with open(args_cli.out, "w") as f:
            json.dump(result, f, indent=1)
        sys.stderr.write(f"[harness] final: {json.dumps(result)}\n")


if __name__ == "__main__":
    main()
