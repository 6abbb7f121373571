"""Full-pipeline test against synthetic geometric ground truth.

The dinoRing tests validate against the reference's observable contract;
this validates against KNOWN geometry: a textured unit sphere rendered
through an exactly-calibrated camera ring (tools/stress_scale.py's scene at
test size).  Every stage's output has a closed-form correctness check:
tracks must triangulate onto the sphere, BA must keep them there, and every
dense patch centroid must lie on the surface.
"""
import numpy as np
import pytest

from sfm_tpu.config import PipelineConfig, FeatureConfig, BaConfig, MvsConfig
from sfm_tpu.io.calib import Calibration


@pytest.fixture(scope="module")
def sphere_scene():
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.stress_scale import make_scene

    images, K, R, t = make_scene(n_frames=12, w=200, h=150, seed=1)
    calib = Calibration(
        K=K, R=R, t=t, names=tuple(f"s{i}" for i in range(12))
    )
    return images, calib


class TestSyntheticPipeline:
    @pytest.fixture(scope="class")
    def outputs(self, sphere_scene):
        from sfm_tpu.sfm import structure_from_motion
        from sfm_tpu.ba.run import bundle_adjust
        from sfm_tpu.mvs import dense_reconstruction

        images, calib = sphere_scene
        cfg = PipelineConfig(
            features=FeatureConfig(max_corners=512, max_matches=256),
            ba=BaConfig(dtype="float64"),
            mvs=MvsConfig(round_capacity=2048, max_rounds=8,
                          max_patches=20000),
        )
        recon = structure_from_motion(images, calib, cfg)
        recon, info = bundle_adjust(recon, cfg.ba)
        # scale=1: the expansion radius gate is 0.05/scale world units
        # (MVS2.py:369) and one 2-px cell at this focal/depth spans ~0.017 —
        # dinoRing's run.sh scale of 10 would reject every neighbor here.
        dense = dense_reconstruction(images, calib, recon, cfg.mvs,
                                     scale=1.0)
        return recon, info, dense

    def test_sparse_points_on_sphere(self, outputs):
        recon, _, _ = outputs
        assert recon.num_tracks > 50
        r_err = np.abs(np.linalg.norm(recon.world, axis=1) - 1.0)
        # 0.3 px gate at f=240, depth ~2 -> ~2.5e-3 world units; merged
        # tracks keep the first pair's point so allow some slack.
        assert np.median(r_err) < 0.01
        assert np.percentile(r_err, 95) < 0.05

    def test_ba_tightens_reprojection(self, outputs):
        recon, info, _ = outputs
        assert recon.rms_reprojection_error() < 0.3
        assert info["iterations"] >= 1

    def test_dense_points_on_sphere(self, outputs):
        _, _, dense = outputs
        assert dense.num_points > 1000
        r_err = np.abs(np.linalg.norm(dense.points, axis=1) - 1.0)
        # Expansion propagates tangent planes over a curved surface, so the
        # tolerance is looser than the sparse cloud's but must stay at
        # surface scale (cell world size ~2.7e-3 at this geometry).
        assert np.median(r_err) < 0.02
        assert np.percentile(r_err, 90) < 0.06

    def test_dense_normals_point_outward_ish(self, outputs):
        _, _, dense = outputs
        # Patch normals face the (outside) cameras, so n . p > 0 on a
        # sphere centered at the origin for the vast majority of patches.
        dots = np.einsum("ij,ij->i", dense.normals, dense.points)
        assert (dots > 0).mean() > 0.9
