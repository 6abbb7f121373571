"""Shape bucketing (utils/buckets.py; VERDICT r4 item 4).

Two contracts: (a) bucketed and unbucketed runs produce IDENTICAL outputs
(padding is inert), and (b) two datasets whose sizes land in the same
buckets share compiled programs (the warm-from-cache property that made
temple-style onboarding pay 481 s of compiles in round 4).
"""

import dataclasses

import numpy as np
import pytest

from sfm_tpu.config import (
    BaConfig, FeatureConfig, MvsConfig, PipelineConfig, RuntimeConfig,
)


class TestLadders:
    def test_bucket_images(self):
        from sfm_tpu.utils.buckets import bucket_images

        for n in range(1, 9):
            assert bucket_images(n) == n
        assert bucket_images(9) == 16
        assert bucket_images(12) == 16
        assert bucket_images(16) == 16
        assert bucket_images(48) == 48
        assert bucket_images(50) == 56

    def test_bucket_pairs(self):
        from sfm_tpu.utils.buckets import bucket_pairs

        assert bucket_pairs(16, "sequence") == 15
        assert bucket_pairs(16, "combination") == 120

    def test_pad_calibration_inert_cameras(self):
        import jax.numpy as jnp

        from sfm_tpu.geometry.projection import project_pinhole
        from sfm_tpu.io.calib import Calibration
        from sfm_tpu.utils.buckets import pad_calibration

        cal = Calibration(
            K=np.tile(np.eye(3), (3, 1, 1)),
            R=np.tile(np.eye(3), (3, 1, 1)),
            t=np.zeros((3, 3)),
            names=("a", "b", "c"),
        )
        cal16 = pad_calibration(cal, 16)
        assert cal16.num_views == 16
        np.testing.assert_array_equal(cal16.K[:3], cal.K)
        # Pad cameras see every finite point far behind them.
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)),
                          jnp.float32)
        for i in range(3, 16):
            depth = (
                np.asarray(cal16.R[i] @ np.asarray(pts).T).T
                + cal16.t[i]
            )[:, 2]
            assert (depth < 0).all()


class TestBucketedEquality:
    """n=12 buckets to 16 images / 15 pairs: outputs must match the
    unbucketed run exactly."""

    @pytest.fixture(scope="class")
    def runs(self, dino_calib_cls):
        from sfm_tpu.ba.run import bundle_adjust
        from sfm_tpu.io import load_images
        from sfm_tpu.mvs import dense_reconstruction
        from sfm_tpu.sfm import structure_from_motion

        n = 12
        imgs, _ = load_images(
            "/root/reference/dinoRing", "png", max_images=n
        )
        cal = dino_calib_cls.subset(range(n))
        mvs_cfg = MvsConfig(round_capacity=2048, max_rounds=3,
                            max_patches=6000)
        out = {}
        for name, buckets in (("bucketed", True), ("plain", False)):
            cfg = PipelineConfig(
                features=FeatureConfig(max_corners=1024, max_matches=512),
                runtime=RuntimeConfig(shape_buckets=buckets),
            )
            recon = structure_from_motion(imgs, cal, cfg)
            recon, info = bundle_adjust(recon, BaConfig(dtype="float64"))
            dense = dense_reconstruction(
                imgs, cal, recon,
                dataclasses.replace(mvs_cfg, shape_buckets=buckets),
                scale=10.0,
            )
            out[name] = (recon, info, dense)
        return out

    def test_sparse_identical(self, runs):
        rb, _, _ = runs["bucketed"]
        rp, _, _ = runs["plain"]
        assert rb.num_tracks == rp.num_tracks
        np.testing.assert_array_equal(rb.track_obs, rp.track_obs)
        np.testing.assert_array_equal(rb.track_offsets, rp.track_offsets)
        np.testing.assert_array_equal(rb.world, rp.world)

    def test_ba_identical(self, runs):
        _, ib, _ = runs["bucketed"]
        _, ip, _ = runs["plain"]
        assert ib["iterations"] == ip["iterations"]
        assert np.isclose(ib["final_cost"], ip["final_cost"], rtol=0,
                          atol=0), (ib["final_cost"], ip["final_cost"])

    def test_dense_identical(self, runs):
        _, _, db = runs["bucketed"]
        _, _, dp = runs["plain"]
        assert db.num_seeds == dp.num_seeds
        np.testing.assert_array_equal(db.points, dp.points)
        np.testing.assert_array_equal(db.colors, dp.colors)
        np.testing.assert_array_equal(db.refs, dp.refs)


def test_mvs_device_knobs_ignore_host_loop_fields():
    """Budget/chunking/filter/bucketing knobs are host-side only: changing
    them must not evict the compiled MVS device programs (the same bug
    class as the round-4 SfM pair-key fix)."""
    import dataclasses

    from sfm_tpu.config import mvs_device_knobs

    base = mvs_device_knobs(MvsConfig())
    for kw in (
        {"max_patches": 5},
        {"max_rounds": 1},
        {"rounds_per_call": 4},
        {"round_capacity": 128},
        {"enable_outlier_filter": True},
        {"overlap_seed_fetch": False},
        {"shape_buckets": False},
    ):
        assert mvs_device_knobs(MvsConfig(**kw)) == base, kw
    # Device-read fields DO change the key.
    assert mvs_device_knobs(MvsConfig(min_ncc_expand=0.5)) != base
    assert mvs_device_knobs(MvsConfig(patch_wid=4)) != base


def test_mvs_budget_change_reuses_round_program(dino_calib):
    import dataclasses

    from sfm_tpu.io import load_images
    from sfm_tpu.mvs import dense_reconstruction
    from sfm_tpu.mvs.expand import _make_round_program
    from sfm_tpu.sfm import structure_from_motion

    imgs, _ = load_images("/root/reference/dinoRing", "png", max_images=6)
    cal = dino_calib.subset(range(6))
    cfg = PipelineConfig(
        features=FeatureConfig(max_corners=512, max_matches=256))
    recon = structure_from_motion(imgs, cal, cfg)
    m1 = MvsConfig(round_capacity=1024, max_rounds=2, max_patches=2000)
    d1 = dense_reconstruction(imgs, cal, recon, m1, scale=10.0)
    info1 = _make_round_program.cache_info()
    # Budget-only change: same compiled program, no new lru entry.
    d2 = dense_reconstruction(
        imgs, cal, recon,
        dataclasses.replace(m1, max_patches=1000, max_rounds=1),
        scale=10.0,
    )
    info2 = _make_round_program.cache_info()
    assert info2.currsize == info1.currsize
    assert d1.num_points >= d2.num_points > 0


def test_joint_ba_with_padded_cameras(dino_calib):
    """ba.problem now pads cameras to a multiple of 8: the joint solvers
    (dense Schur + PCG) must converge with observation-free pad cameras in
    the reduced system (their blocks are pure Marquardt-eps diagonals)."""
    import copy

    from sfm_tpu.ba.run import bundle_adjust
    from sfm_tpu.io import load_images
    from sfm_tpu.sfm import structure_from_motion

    imgs, _ = load_images("/root/reference/dinoRing", "png", max_images=12)
    cal = dino_calib.subset(range(12))
    cfg = PipelineConfig(
        features=FeatureConfig(max_corners=1024, max_matches=512),
    )
    recon = structure_from_motion(imgs, cal, cfg)
    _, i_dense = bundle_adjust(
        copy.deepcopy(recon),
        BaConfig(dtype="float64", refine_cameras=True),
    )
    assert i_dense["camera_solver"] == "dense_schur"
    assert i_dense["rms_reproj_refined_px"] < 0.3
    assert i_dense["cams11"].shape[0] == 12  # pad rows sliced off
    _, i_pcg = bundle_adjust(
        copy.deepcopy(recon),
        BaConfig(dtype="float64", refine_cameras=True,
                 dense_schur_max_cams=1),
    )
    assert i_pcg["camera_solver"] == "pcg"
    assert i_pcg["rms_reproj_refined_px"] < 0.3


def test_same_bucket_shares_programs(dino_calib):
    """Two datasets with different image counts in the same bucket must
    hit the same compiled programs — the warm-from-cache property.  A new
    jit trace/compile shows up as a cache-size increase on the pair
    program; shapes equal => one entry."""
    from sfm_tpu.io import load_images
    from sfm_tpu.sfm import structure_from_motion
    from sfm_tpu.sfm.pipeline import _make_pair_program, _pair_cache_key

    imgs, _ = load_images("/root/reference/dinoRing", "png", max_images=12)
    cfg = PipelineConfig(
        features=FeatureConfig(max_corners=512, max_matches=256),
    )
    r10 = structure_from_motion(imgs[:10], dino_calib.subset(range(10)), cfg)
    run_pairs = _make_pair_program(
        _pair_cache_key(cfg), cfg.features.max_matches, None
    )
    size_after_first = run_pairs._cache_size()
    r12 = structure_from_motion(imgs[:12], dino_calib.subset(range(12)), cfg)
    assert run_pairs._cache_size() == size_after_first  # no new compile
    assert r10.num_tracks > 0 and r12.num_tracks > 0
    # Real-image results only: no observation references a pad image.
    assert r10.track_obs[:, 0].max() < 10
    assert r12.track_obs[:, 0].max() < 12
