"""Scene-family robustness envelopes (VERDICT r2 item 2).

Every measured default (Lowe 0.8, harris_rel_threshold, the V-gate auto
rule, round capacity) was tuned on the dinoRing 48-view ring.  These tests
run the FULL pipeline on exact-calibration synthetic scenes OFF that tuning
set — non-ring rigs (arc, grid, irregular), fx != fy intrinsics (exercising
the 12-param camera model over the reference's f-averaging at
/root/reference/SFM.py:148), occlusion (two spheres), weak texture — and
assert quality envelopes against closed-form ground truth (every dense
point's distance to the nearest sphere surface is exact).

Plus the `-t ppm` image path (the reference's templeRing invocation,
/root/reference/run_temple.sh:1) which no test previously loaded.
"""

import numpy as np
import pytest

from sfm_tpu.utils import synth

S1 = (((0.0, 0.0, 0.0), 1.0),)
S2 = (((0.0, 0.0, 0.0), 1.0), ((1.0, 0.1, 0.9), 0.55))


def _pipeline(images, calib, spheres, scale=1.0):
    from sfm_tpu.config import (
        PipelineConfig, FeatureConfig, BaConfig, MvsConfig,
    )
    from sfm_tpu.sfm import structure_from_motion
    from sfm_tpu.ba.run import bundle_adjust
    from sfm_tpu.mvs import dense_reconstruction

    cfg = PipelineConfig(
        features=FeatureConfig(max_corners=1024, max_matches=512)
    )
    recon = structure_from_motion(images, calib, cfg)
    recon, _ = bundle_adjust(recon, BaConfig())
    dense = dense_reconstruction(
        images, calib, recon,
        MvsConfig(round_capacity=4096, max_rounds=24), scale=scale,
    )
    surf = synth.surface_distance(dense.points, spheres)
    return recon, dense, surf


SCENES = {
    # name: (rig centers, render kwargs, min_tracks, min_expand_ratio)
    "arc": (synth.ring_rig(12, span=np.pi * 2 / 3), {}, 300, 5.0),
    "grid": (synth.grid_rig(4, 3), {}, 150, 5.0),
    "irregular": (synth.irregular_rig(16), {}, 200, 5.0),
    "anisotropic": (
        synth.ring_rig(12), {"fx": 420.0, "fy": 320.0}, 120, 5.0,
    ),
    "occlusion": (synth.ring_rig(16), {"spheres": S2}, 200, 5.0),
    "weak_texture": (
        synth.ring_rig(16), {"texture_strength": 0.08}, 15, 5.0,
    ),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(SCENES))
def test_scene_family(name):
    centers, kwargs, min_tracks, min_ratio = SCENES[name]
    spheres = kwargs.get("spheres", S1)
    images, calib = synth.render_scene(centers, 320, 240, **kwargs)
    recon, dense, surf = _pipeline(images, calib, spheres)

    # Sparse: exact calibration + 0.3 px gate -> sub-pixel rms everywhere,
    # including the fx != fy rig (the 11-param reference model could not
    # represent that camera; measured here: 0.16 px).
    assert recon.num_tracks >= min_tracks
    assert recon.rms_reprojection_error() < 0.35

    # Dense: expansion must actually expand (measured 10-45x; require 5x)
    # and land on the true surface (measured median <= 0.014 of a
    # unit-radius sphere; require < 0.03 with p95 < 0.08).
    assert dense.num_points >= min_ratio * max(dense.num_seeds, 1)
    assert float(np.median(surf)) < 0.03
    assert float(np.percentile(surf, 95)) < 0.08

    if name == "occlusion":
        # The second (occluding) sphere is itself reconstructed.
        near2 = np.linalg.norm(
            dense.points - np.array([1.0, 0.1, 0.9]), axis=1
        ) < 0.65
        assert int(near2.sum()) >= 5


def test_scale_flag_matches_world_units():
    """The -scale knob gates expansion radius at 0.05/scale world units
    (reference MVS2.py:369): a unit-radius scene at 320x240 resolution has
    ~0.01 inter-cell spacing, so scale=10 (the dinoRing value) must starve
    expansion while scale=1 expands — the knob behaves like the reference's."""
    images, calib = synth.render_scene(synth.ring_rig(12), 320, 240)
    _, d10, _ = _pipeline(images, calib, S1, scale=10.0)
    _, d1, _ = _pipeline(images, calib, S1, scale=1.0)
    assert d10.num_points == d10.num_seeds  # radius gate rejects neighbors
    assert d1.num_points > 5 * d1.num_seeds


def test_ppm_image_loading(tmp_path):
    """The reference's templeRing invocation loads `-t ppm`
    (/root/reference/run_temple.sh:1); exercise that path end to end."""
    from PIL import Image

    from sfm_tpu.io import load_images

    images, _ = synth.render_scene(synth.ring_rig(4), 64, 48)
    for i, img in enumerate(images):
        Image.fromarray(img).save(tmp_path / f"v{i:02d}.ppm")
    loaded, paths = load_images(str(tmp_path), "ppm")
    assert loaded.shape == images.shape
    assert len(paths) == 4
    np.testing.assert_array_equal(loaded, images)
