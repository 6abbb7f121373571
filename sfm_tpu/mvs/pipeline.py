"""Dense reconstruction orchestrator (reference DensePointsWithMVS2,
MVS2.py:176-295, re-architected as seeding + frontier rounds).

Work budgeting: the reference caps its BFS at 100k *queue iterations*
(MVS2.py:321), each considering up to |V|*4 candidates.  Here the analogous
budget is ``MvsConfig.max_patches`` accepted patches / ``max_rounds`` rounds;
the host loop stops early when a round accepts nothing (frontier dry).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import MvsConfig
from sfm_tpu.io.calib import Calibration
from sfm_tpu.io.images import device_gray
from sfm_tpu.mvs.photoconsistency import unpack_patch_payload
from sfm_tpu.mvs.cells import make_occupancy
from sfm_tpu.mvs.expand import expansion_round
from sfm_tpu.mvs.seed import build_seed_candidates, seed_patches
from sfm_tpu.sfm.pipeline import SparseReconstruction
from sfm_tpu.utils.fetch import fetch as _fetch
from sfm_tpu.utils.metrics import Metrics, StageTimer


@dataclass
class DenseReconstruction:
    """Dense colored point cloud + per-patch geometry."""

    points: np.ndarray    # (D, 3) float32 patch centroids
    colors: np.ndarray    # (D, 3) uint8
    normals: np.ndarray   # (D, 3) float32
    scores: np.ndarray    # (D,) float32 mean NCC
    refs: np.ndarray      # (D,) int32 reference image per patch
    num_seeds: int
    metrics: Metrics = field(default_factory=Metrics)
    timers: Optional[StageTimer] = None

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    def export_ply(self, path: str) -> None:
        from sfm_tpu.io.ply import export_ply

        export_ply(path, self.points, self.colors)


def _payload_refs(ph_rows, n_images: int) -> np.ndarray:
    """Reference-image index per patch from payload rows (column 9 of
    pack_patch_payload)."""
    return np.clip(ph_rows[:, 9].astype(np.int32), 0, n_images - 1)


import functools


@functools.lru_cache(maxsize=16)
def _make_filter_program(
    config: MvsConfig, photo_views: int, gw: int, gh: int, g_cap: int
):
    """Compiled end-of-run outlier filter: recompute vis/proj for the whole
    accumulated cloud (same scoring program family the rounds used, so the
    result is the accept-time visibility), run the exact pairwise rule
    (filter_outliers_device), and pack [keep(Dp) | max_group] so the host
    pays ONE fetch."""
    from sfm_tpu.mvs.filter import filter_outliers_device
    from sfm_tpu.mvs.photoconsistency import photo_consistency

    def run(gray, K, R, t, pts, nrm, sco, refs, thr, valid):
        n_img = gray.shape[0]
        vis, proj, _, _ = photo_consistency(
            gray, K, R, t, pts, refs, thr, config.patch_wid, photo_views
        )
        # The V-gate bounds visible views per patch, so the filter's
        # incidence space compacts to K = photo_views - 1 per row.
        k_hit = (
            photo_views - 1 if 0 < photo_views < n_img else 0
        )
        keep, max_group, hits_dropped = filter_outliers_device(
            pts, nrm, sco, vis, proj, valid,
            config.cell_size, gw, gh, g_cap=g_cap, k_hit=k_hit,
        )
        return jnp.concatenate(
            [
                keep.astype(jnp.float32),
                max_group.astype(jnp.float32)[None],
                hits_dropped.astype(jnp.float32)[None],
            ]
        )

    return jax.jit(run)


def _run_device_filter(
    gray, K, R, t, points, normals, scores, refs, n_seeds,
    h, w, config: MvsConfig, metrics,
):
    """Host driver for the device outlier filter; returns keep (D,) bool.

    The patch batch is padded to an 8192 multiple (stable compiled shapes
    across runs/datasets); ``g_cap`` starts at 64 and escalates (a
    recompile) in the rare case a cell holds more patches — counted, never
    silently inexact."""
    from sfm_tpu.config import resolve_photo_views
    from sfm_tpu.mvs.cells import grid_shape

    d = points.shape[0]
    if d == 0:
        return np.ones(0, bool)
    gw, gh = grid_shape(h, w, config.cell_size)
    pv = resolve_photo_views(config.max_photo_views, gray.shape[0])
    dp = -(-d // 8192) * 8192
    pad = dp - d
    pts = jnp.asarray(np.pad(points, ((0, pad), (0, 0))))
    nrm = jnp.asarray(np.pad(normals, ((0, pad), (0, 0))))
    sco = jnp.asarray(np.pad(scores, (0, pad)))
    rf = jnp.asarray(np.pad(refs, (0, pad)))
    # Seeds were scored at min_ncc_seed, expansion patches at
    # min_ncc_expand (reference MVS2.py:255 vs :362) — the recompute must
    # reproduce each patch's own accept-time visibility.
    thr = jnp.asarray(
        np.where(
            np.arange(dp) < n_seeds,
            config.min_ncc_seed, config.min_ncc_expand,
        ).astype(np.float32)
    )
    valid = jnp.asarray(np.arange(dp) < d)
    g_cap = 64
    while True:
        from sfm_tpu.config import mvs_device_knobs

        run = _make_filter_program(
            mvs_device_knobs(config), pv, gw, gh, g_cap
        )
        out = _fetch(run(gray, K, R, t, pts, nrm, sco, rf, thr, valid))
        max_group = int(out[dp])
        hits_dropped = int(out[dp + 1])
        if hits_dropped:
            # A vis row exceeded the gate's per-row bound — cannot happen
            # for gate-produced visibility, but never silently inexact.
            metrics.record("mvs_filter_hits_over_k", hits_dropped)
        if max_group <= g_cap:
            break
        # Exactness needs shifted-window offsets up to max_group - 1.
        metrics.record("mvs_filter_gcap_escalated", max_group)
        g_cap = 1 << (max_group - 1).bit_length()
    metrics.record("mvs_filter_max_cell_group", max_group)
    return out[:d] > 0.5


def _mvs_fingerprint(images, config, bound, scale) -> str:
    """Configuration fingerprint guarding mid-MVS checkpoint resumes.

    Budget knobs (max_rounds, max_patches) are deliberately EXCLUDED — a
    legitimate resume may raise them to continue a finished budget.  Shape /
    threshold / input knobs must match or the restored occupancy+frontier
    would be inconsistent with the program.
    """
    from sfm_tpu.config import resolve_photo_views
    from sfm_tpu.io.images import _cache_key

    n, h, w = images.shape[:3]
    img_crc = _cache_key(images)[1:]  # shape, dtype, ptr(ignored), crc
    # v2 (round 5): the accumulator state carries acc_ref instead of the
    # filter-era acc_vis/acc_proj — old states must fail the fingerprint
    # check (clear error) rather than KeyError mid-resume.
    return (
        f"v2|{n}x{h}x{w}|crc{img_crc[-1]}|cell{config.cell_size}"
        f"|wid{config.patch_wid}|ncc{config.min_ncc_seed}/{config.min_ncc_expand}"
        f"|bound{bound}|cap{config.round_capacity}"
        f"|views{resolve_photo_views(config.max_photo_views, n)}"
        f"|cop{config.coplanarity_threshold}|rad{config.neighbor_radius_scaled}"
        f"|scale{scale}|filter{int(config.enable_outlier_filter)}"
    )


def dense_reconstruction(
    images: np.ndarray,
    calib: Calibration,
    recon: SparseReconstruction,
    config: MvsConfig = MvsConfig(),
    scale: float = 1.0,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 16,
) -> DenseReconstruction:
    """Run patch-based MVS from SfM tracks.

    With ``mesh`` (1-D, axis "data") the expansion rounds shard their
    candidate batches across devices (see mvs.expand._make_round_program).

    With ``checkpoint_dir``, the expansion loop persists its full state
    (occupancy, frontier, backlog, accumulated cloud, counters) every
    ``checkpoint_every`` rounds and resumes from it on the next call — a
    crash in the longest stage (the reference's 23.6 h BFS, MVS2.py:321)
    costs at most ``checkpoint_every`` rounds, and the resumed run produces
    the identical cloud (deterministic device programs + exact state
    round-trip; tests/test_cli.py kill-and-resume test).
    """
    from sfm_tpu.utils import checkpoint as ckpt

    import dataclasses

    from sfm_tpu.config import resolve_photo_views
    from sfm_tpu.utils.buckets import (
        bucket_images, bucket_multiple, pad_calibration,
    )

    timers = StageTimer()
    metrics = Metrics()
    n, h, w = images.shape[0], images.shape[1], images.shape[2]
    # Reference quirk deliberately fixed (same class as the MVS2.py:68/:334
    # fixes): its 2-image carve-out sets visible_lower_bound = 2
    # (MVS2.py:200-203), but its visible set — like ours — counts only
    # NON-reference views (photo_consistenecy_test appends idx != self.R,
    # MVS2.py:66-74), so with 2 images visible_ct can never exceed 1 and
    # the carve-out is dead code: a 2-image run produces ZERO patches.  The
    # intent is plainly "require the one other view", i.e. bound 1.
    bound = config.visible_lower_bound if n > 2 else 1

    # Shape bucketing (utils/buckets.py): pad the image axis to the ladder
    # with inert cameras so a new dataset reuses compiled programs.  The
    # view-gate auto rule must see the REAL image count (a 12-image rig
    # padded to 16 must stay ungated), so the knob is resolved here and
    # pinned into the config every downstream program sees.
    config = dataclasses.replace(
        config, max_photo_views=resolve_photo_views(config.max_photo_views, n)
    )
    n_b = bucket_images(n) if config.shape_buckets else n
    calib_dev = pad_calibration(calib, n_b) if n_b > n else calib

    gray = device_gray(images, pad_to=n_b)
    if n_b > n:
        metrics.record("mvs_image_axis_padded", n_b - n)
    K = jnp.asarray(calib_dev.K.astype(np.float32))
    R = jnp.asarray(calib_dev.R.astype(np.float32))
    t = jnp.asarray(calib_dev.t.astype(np.float32))
    centers_cam = jnp.asarray(calib_dev.centers.astype(np.float32))
    occupancy = make_occupancy(n_b, h, w, config.cell_size)

    fingerprint = (
        _mvs_fingerprint(images, config, bound, scale) + f"|nb{n_b}"
        if checkpoint_dir else ""
    )
    state = ckpt.load_mvs_state(checkpoint_dir)
    resumed = state is not None
    if resumed:
        saved_fp = str(state["fingerprint"])
        if saved_fp != fingerprint:
            raise ValueError(
                f"MVS checkpoint in {checkpoint_dir} was written with a "
                f"different configuration/input ({saved_fp!r} != "
                f"{fingerprint!r}); delete {ckpt.MVS_STATE_FILE} to restart"
            )
        occupancy = jnp.asarray(state["occupancy"])
        frontier = {
            k: jnp.asarray(state["f_" + k])
            for k in ("c", "n", "vis", "proj", "valid")
        }
        # Valid rows in the restored (not-yet-dispatched) frontier: the
        # backlog-merge accounting needs it (round 4 — initializing it to 0
        # made every post-resume merge undercount the live backlog by one
        # frontier's worth and drop pending patches when it drained).
        fr_valid = int(np.asarray(state["f_valid"]).sum())
        backlog = None
        bl_count = 0
        if "b_c" in state:
            bl_count = int(np.asarray(state["b_valid"]).sum())
            backlog = {
                k: jnp.asarray(state["b_" + k])
                for k in ("c", "n", "vis", "proj", "valid")
            }
            if bl_count == 0:
                backlog = None
        total, rounds, dropped_candidates, n_seeds = (
            int(x) for x in state["counters"]
        )
        all_c = [state["acc_c"]]
        all_n = [state["acc_n"]]
        all_score = [state["acc_score"]]
        all_color = [state["acc_color"]]
        all_ref = [state["acc_ref"]]
        metrics.record("mvs_num_seeds", n_seeds)
        metrics.record("mvs_resumed_at_round", rounds)

    if not resumed:
        with timers.stage("seed"):
            track_id, ref_obs, other_obs = build_seed_candidates(
                recon.track_offsets, recon.track_obs
            )
            n_cand = track_id.shape[0]
            n_tracks = recon.num_tracks
            cand_valid = None
            if config.shape_buckets:
                c_b = bucket_multiple(n_cand, 2048)
                t_b = bucket_multiple(n_tracks, 1024)
                if c_b > n_cand:
                    pad_c = c_b - n_cand
                    track_id = np.concatenate(
                        [track_id, np.zeros(pad_c, track_id.dtype)]
                    )
                    ref_obs = np.concatenate(
                        [ref_obs, np.zeros((pad_c, 3), ref_obs.dtype)]
                    )
                    other_obs = np.concatenate(
                        [other_obs, np.zeros((pad_c, 3), other_obs.dtype)]
                    )
                cand_valid = jnp.asarray(np.arange(c_b) < n_cand)
                n_tracks = t_b
            from sfm_tpu.config import mvs_device_knobs

            seeds, occupancy, seed_packed = seed_patches(
                gray, K, R, t, centers_cam,
                jnp.asarray(track_id), jnp.asarray(ref_obs), jnp.asarray(other_obs),
                n_tracks, occupancy, mvs_device_knobs(config), bound,
                cand_valid=cand_valid,
            )
            # The seed payload (ONE device->host fetch for the whole stage)
            # is read AFTER the first expansion round is dispatched — see
            # the pre-dispatch below: the device runs round 1 while the
            # host pays the fixed ~23 ms tunnel fetch it would otherwise
            # sit idle through.

    # The expansion frontier consumes exactly these fields; seed dicts carry
    # extras (ref, score) that must not leak into backlog bookkeeping.
    _FRONTIER_KEYS = ("c", "n", "vis", "proj", "valid")

    def _split_frontier(fr, cap):
        """Fix the frontier's leading dim to ``cap`` so every round reuses
        ONE compiled program (a second frontier shape costs a full
        recompile).  Valid patches beyond ``cap`` are NOT dropped: they go
        to a DEVICE-side backlog (static capacity, valid-masked) that
        refills frontier slots in later rounds (_merge_backlog) — overflow
        defers expansion, never loses it (their cells are already claimed,
        so no duplication either)."""
        fr = {k: fr[k] for k in _FRONTIER_KEYS}
        f = fr["c"].shape[0]
        if f <= cap:
            if f == cap:
                return fr, None
            out = {}
            for k, v in fr.items():
                pad = [(0, cap - f)] + [(0, 0)] * (v.ndim - 1)
                out[k] = jnp.pad(v, pad)
            return out, None
        # Overflow: one device split — frontier = first `cap` valid rows
        # (slot order), backlog = the rest.  b_cap can only shrink from
        # here (each round consumes `cap` pending rows and accepts at most
        # `cap` new ones), so this one-time sizing bounds the whole run.
        b_cap = f - cap
        return _device_split_merge(fr, None, cap, b_cap)

    def _merge_backlog(fr, backlog, cap):
        """FIFO refill: while a backlog exists, the next round's frontier is
        the OLDEST ``cap`` pending patches — backlog entries first (they were
        deferred in an earlier round), then this round's accepted patches in
        slot order; accepted patches that don't fit go back to the backlog's
        tail.  This is the parallel analogue of the reference's BFS queue
        order (MVS2.py:314-321): every pending patch expands within
        ceil(queue_position / cap) rounds, so deferral is bounded and nothing
        starves.  Nothing is ever dropped.

        Round 3: runs ON DEVICE as plain row gathers (~70 ns/row) — the
        previous host implementation pulled the whole frontier D2H and back,
        measured at ~0.16 s PER ROUND over the remote link, tripling the
        round cost while a backlog persisted (tools/prof_backlog.py)."""
        if backlog is None:
            return fr, None
        return _device_split_merge(fr, backlog, cap, backlog["c"].shape[0])

    def _device_split_merge(fr, backlog, cap, b_cap):
        """Compact the oldest ``cap`` valid rows of (backlog ++ frontier)
        into the next frontier; the remainder (masked) becomes the new
        backlog.  Returns (frontier, backlog-or-None); the backlog is
        dropped once its live count (tracked exactly on host from accepted
        counts — no device fetch) reaches zero."""
        if backlog is not None:
            cat = {
                k: jnp.concatenate([backlog[k], fr[k]])
                for k in _FRONTIER_KEYS
            }
        else:
            cat = fr
        total = cat["valid"].shape[0]
        if total < cap + b_cap:
            pad_n = cap + b_cap - total
            cat = {
                k: jnp.pad(v, [(0, pad_n)] + [(0, 0)] * (v.ndim - 1))
                for k, v in cat.items()
            }
            total = cap + b_cap
        (sel,) = jnp.nonzero(
            cat["valid"], size=total, fill_value=total - 1
        )
        count = jnp.sum(cat["valid"].astype(jnp.int32))
        ok = jnp.arange(total) < count
        front = {k: cat[k][sel[:cap]] for k in _FRONTIER_KEYS}
        front["valid"] = front["valid"] & ok[:cap]
        if b_cap == 0:
            return front, None
        back = {k: cat[k][sel[cap : cap + b_cap]] for k in _FRONTIER_KEYS}
        back["valid"] = back["valid"] & ok[cap : cap + b_cap]
        return front, back

    if not resumed:
        frontier, backlog = _split_frontier(seeds, config.round_capacity)
        dropped_candidates = 0
        rounds = 0
    cap = config.round_capacity
    # A fresh split already leaves the OLDEST `cap` valid seeds in the
    # frontier — merging before the first dispatch would both invert FIFO
    # order (backlog rows would jump ahead of never-dispatched seeds) and
    # waste a device program.  A resumed frontier is a round's accepted
    # output (newest), so there the pre-dispatch merge IS the FIFO order.
    skip_first_merge = not resumed

    def _save_state():
        st = {
            "fingerprint": np.asarray(fingerprint),
            "occupancy": np.asarray(occupancy),
            "counters": np.asarray(
                [total, rounds, dropped_candidates, n_seeds], np.int64
            ),
            "acc_c": np.concatenate(all_c).astype(np.float32),
            "acc_n": np.concatenate(all_n).astype(np.float32),
            "acc_score": np.concatenate(all_score).astype(np.float32),
            "acc_color": np.concatenate(all_color),
            "acc_ref": np.concatenate(all_ref).astype(np.int32),
        }
        for k in ("c", "n", "vis", "proj", "valid"):
            st["f_" + k] = np.asarray(frontier[k])
        if backlog:
            for k in ("c", "n", "vis", "proj", "valid"):
                st["b_" + k] = np.asarray(backlog[k])
        ckpt.save_mvs_state(checkpoint_dir, st)

    last_ckpt_rounds = rounds
    # The host loop chunks config.rounds_per_call rounds per program to
    # amortize the per-call fetch + dispatch.  (The outlier filter no
    # longer forces chunk=1: since round 5 it runs ON DEVICE at the end,
    # recomputing vis/proj there instead of fetching them per round —
    # VERDICT r4 item 5.)
    chunk = max(config.rounds_per_call, 1)
    def _dispatch():
        nonlocal frontier, occupancy
        frontier, occupancy, packed = expansion_round(
            gray, K, R, t, centers_cam, occupancy,
            frontier["c"], frontier["n"], frontier["vis"],
            frontier["proj"], frontier["valid"],
            config, bound, cap, scale, mesh=mesh,
            rounds_per_call=chunk,
        )
        return packed

    pending = None  # dispatched chunk whose payload is not yet read
    if not resumed:
        # Pre-dispatch round 1 BEFORE the seed-payload fetch: the first
        # round never needs a backlog merge (the fresh split already holds
        # the oldest `cap` valid seeds), so the device can run it while the
        # host pays the fixed ~23 ms tunnel fetch below.  Guarded so the
        # budget loop would certainly have run it: n_seeds <= num_tracks,
        # so num_tracks < max_patches implies total < max_patches.
        if (
            config.overlap_seed_fetch
            and config.max_rounds > 0
            and recon.num_tracks < config.max_patches
        ):
            pending = _dispatch()
            skip_first_merge = False
        with timers.stage("seed"):
            # ONE device->host fetch for the whole seed stage; colors are
            # sampled host-side from the original images.
            sp = _fetch(seed_packed)
            seed_valid, s_c, s_n, s_score, s_color = unpack_patch_payload(
                sp, images
            )
            n_seeds = int(seed_valid.sum())
            metrics.record("mvs_num_seeds", n_seeds)
        total = n_seeds
        # Exact live backlog count, tracked on host with NO device fetch:
        # the split kept the first `cap` valid rows, so the deferred count
        # is n_seeds - cap; each later merge updates it from the valid-row
        # count of the frontier being folded back in (see the loop).
        bl_count = (
            max(0, n_seeds - cap) if backlog is not None else 0
        )
        fr_valid = n_seeds - bl_count
        if backlog is not None and bl_count == 0:
            backlog = None
        if bl_count:
            metrics.record("mvs_seed_frontier_deferred", bl_count)
        # vis (M, N) and proj (M, N, 2) are ~10x the bytes of everything
        # else a round produces; only the (off-by-default) visibility
        # outlier filter consumes them on the host, so only fetch them when
        # it is enabled — the frontier itself stays on device either way.
        all_c = [s_c[seed_valid]]
        all_n = [s_n[seed_valid]]
        all_score = [s_score[seed_valid]]
        all_color = [s_color[seed_valid]]
        # Reference image per patch (payload column 9) — the outlier
        # filter's device-side visibility recompute needs it; free, the
        # payload is already on host.
        all_ref = [_payload_refs(sp[seed_valid], n)]

    backlog_merge_s = 0.0
    backlog_rounds = 0
    hits_over_k = 0
    # Acceptance funnel (summed over rounds, from the free payload-tail
    # diagnostics — expand.py): [scored, ray+finite, +coplanar+near,
    # +NCC views, post-dedup accepts].
    funnel = np.zeros(5, np.int64)
    with timers.stage("expand"):
        while rounds < config.max_rounds and total < config.max_patches:
            if pending is None:
                if bl_count and not skip_first_merge:
                    # Device-side merge (row gathers, ~70 ns/row) — the old
                    # host round-trip cost ~0.16 s PER ROUND over the remote
                    # link (VERDICT r2 item 8; tools/prof_backlog.py).  The
                    # dispatch is async; the accumulated time here is issue
                    # cost only.  Accounting: the merge folds bl_count
                    # backlog rows + fr_valid frontier rows into the next
                    # frontier (capped at `cap`); the remainder is the new
                    # backlog.  (Round 4 fix: the old update used the LAST
                    # FETCHED accepted count, which is 0 right after a
                    # resume — a permanent undercount that dropped pending
                    # patches when the backlog drained.)
                    import time as _time

                    _t0 = _time.perf_counter()
                    frontier, backlog = _merge_backlog(frontier, backlog, cap)
                    backlog_merge_s += _time.perf_counter() - _t0
                    backlog_rounds += 1
                    pending_rows = bl_count + fr_valid
                    bl_count = max(0, pending_rows - cap)
                    fr_valid = min(pending_rows, cap)
                    if bl_count == 0:
                        backlog = None
                skip_first_merge = False
                packed = _dispatch()
            else:
                packed, pending = pending, None
            # Software pipelining: enqueue the NEXT chunk before the
            # blocking payload fetch of this one, so the ~23 ms tunnel
            # fetch + host unpack overlap device compute.  Only when the
            # next chunk is PROVABLY identical to what the sequential loop
            # would run: no backlog merge pending, budgets unreachable even
            # at maximal acceptance, no checkpoint due (its state must stay
            # in lockstep with the counters), and no per-round vis/proj
            # consumption (outlier filter reads `frontier` on host).
            # Exact bounds: after this chunk, rounds' = rounds + chunk and
            # total' <= total + chunk*cap; the sequential loop would run the
            # next chunk iff rounds' < max_rounds and total' < max_patches.
            if (
                not bl_count
                and rounds + chunk < config.max_rounds
                and total + chunk * cap < config.max_patches
                and not (
                    checkpoint_dir
                    and rounds + 2 * chunk - last_ckpt_rounds
                    >= checkpoint_every
                )
            ):
                pending = _dispatch()
            # ONE small fetch per chunk; the frontier stays on device.
            ph = _fetch(packed).reshape(chunk, cap + 1, 11)
            stop = False
            for r in range(chunk):
                acc_valid, a_c, a_n, a_score, a_color = unpack_patch_payload(
                    ph[r, :cap], images
                )
                n_acc = int(acc_valid.sum())
                fr_valid = n_acc
                n_cand = int(ph[r, cap, 0])
                dropped_candidates += max(0, n_cand - cap)
                hits_over_k += int(ph[r, cap, 1])
                funnel += ph[r, cap, 2:7].astype(np.int64)
                rounds += 1
                if n_acc == 0:
                    # Frontier dry — but deferred seed-overflow patches (if
                    # any) refill it at the next merge, so only stop when
                    # the backlog is exhausted too.
                    stop = bl_count == 0
                    break
                all_c.append(a_c[acc_valid])
                all_n.append(a_n[acc_valid])
                all_score.append(a_score[acc_valid])
                all_color.append(a_color[acc_valid])
                all_ref.append(_payload_refs(ph[r, :cap][acc_valid], n))
                total += n_acc
                # Enforce budgets mid-chunk: with rounds_per_call > 1 the
                # while-condition alone would overshoot max_rounds /
                # max_patches by up to chunk-1 rounds.
                if rounds >= config.max_rounds or total >= config.max_patches:
                    stop = True
                    break
            if checkpoint_dir and (
                rounds - last_ckpt_rounds >= checkpoint_every
            ):
                _save_state()
                last_ckpt_rounds = rounds
            if stop:
                break
    if checkpoint_dir:
        # Completed: the mid-run state is superseded by the stage output.
        ckpt.clear_mvs_state(checkpoint_dir)
    metrics.record("mvs_rounds", rounds)
    metrics.record("mvs_num_points", total)
    if funnel[0]:
        metrics.record("mvs_candidates_scored", int(funnel[0]))
        metrics.record("mvs_pass_ray_finite", int(funnel[1]))
        metrics.record("mvs_pass_geometry", int(funnel[2]))
        metrics.record("mvs_pass_ncc", int(funnel[3]))
        metrics.record("mvs_accepted", int(funnel[4]))
        metrics.record(
            "mvs_accept_rate", round(float(funnel[4]) / float(funnel[0]), 4)
        )
    if backlog_rounds:
        metrics.record("mvs_backlog_rounds", backlog_rounds)
        metrics.record("mvs_backlog_merge_s", round(backlog_merge_s, 4))
    if bl_count:
        # Deferred patches still unexpanded at stop (budget/rounds exhausted
        # first) — never silent (VERDICT r1: no silent caps).
        metrics.record("mvs_backlog_remaining", bl_count)
    # No silent caps: candidates beyond the per-round capacity are deferred
    # to later rounds by the vacancy test, but an unexpectedly large count
    # here signals the capacity knob should grow.
    metrics.record("mvs_candidates_over_capacity", dropped_candidates)
    if hits_over_k:
        # Visible hits beyond the per-row top_k bound (expand.py): 0 by
        # construction for frontiers built by the same view gate; nonzero
        # means a caller violated the bound and hits were dropped.
        metrics.record("mvs_hits_over_k", hits_over_k)

    points = np.concatenate(all_c).astype(np.float32)
    colors = np.concatenate(all_color).astype(np.uint8)
    normals = np.concatenate(all_n).astype(np.float32)
    scores = np.concatenate(all_score).astype(np.float32)
    refs = np.concatenate(all_ref).astype(np.int32)

    if config.enable_outlier_filter:
        # Round 5: the filter runs ON DEVICE (VERDICT r4 item 5).  The old
        # path fetched vis (M,N) + proj (M,N,2) for EVERY round — "~10x the
        # bytes of everything else a round produces" — and forced
        # rounds_per_call=1.  Since each patch's visibility is a
        # deterministic function of (center, ref image, threshold) through
        # the same scoring program, it is recomputed on device in one final
        # batch instead (equality-tested against the stored-vis host path,
        # tests/test_mvs.py), and the exact pairwise rule runs jitted
        # (filter_outliers_device); the host pays ONE keep-mask fetch.
        with timers.stage("filter"):
            keep = _run_device_filter(
                gray, K, R, t, points, normals, scores, refs, n_seeds,
                h, w, config, metrics,
            )
        metrics.record("mvs_filtered_out", int((~keep).sum()))
        points, colors = points[keep], colors[keep]
        normals, scores = normals[keep], scores[keep]
        refs = refs[keep]
        n_seeds = int(keep[:n_seeds].sum())
        metrics.record("mvs_num_points_filtered", points.shape[0])

    return DenseReconstruction(
        points=points,
        colors=colors,
        normals=normals,
        scores=scores,
        refs=refs,
        num_seeds=n_seeds,
        metrics=metrics,
        timers=timers,
    )
