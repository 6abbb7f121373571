"""Quality-parity regression gate (VERDICT r2 item 3).

QUALITY.json used to be a one-shot artifact: nothing failed CI if parity vs
the reference regressed between rounds.  These tests re-run the CHEAP
our-side half of the parity suite on CPU against the cached reference-side
artifacts (quality_data/ref/*.npz + reference_measured.json, captured once
by tools/refquality from the unmodified reference) and assert the criteria
that are CPU-feasible:

- ba_solver_parity: our LM/Schur solver on the reference's exact captured
  BA problem must reach <= 1.05x scipy-TRF's rms, and our 12-param model
  must reproduce the reference's 11-param rms at its own solution.
- dino8_photo_consistency + dino8_completeness: full dino-8 pipeline, our
  cloud's PMVS-rule pass rate >= the reference cloud's, and median
  ref->ours distance <= 1.5% of the reference bbox diagonal.

The 48-frame criteria stay in quality.py (TPU, one-shot): they re-run the
whole-dataset pipeline and are too heavy for every CI round.
"""

import os

import pytest

QUALITY_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "quality_data",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(QUALITY_DATA, "ref")),
    reason="cached reference-side quality artifacts not available",
)


def test_ba_solver_parity_on_reference_problem():
    import quality

    ref = quality._load_ref()
    c = quality._ba_solver_parity(ref["dino48_sparse"]["internal_rms_px"])
    # Model embedding: our 12-param camera evaluated at the reference's
    # solution reproduces its rms (QUALITY.md: agreement to 4e-6 px).
    assert abs(c["model_check_rms_at_ref_solution"] - c["reference_rms"]) < 0.02, c
    assert c["pass"], c


@pytest.mark.slow
def test_dino8_quality_criteria(dino_images, dino_calib):
    import quality

    details, criteria = quality.dino8_evaluation(save_cloud=False)
    failed = {k: v for k, v in criteria.items() if not v["pass"]}
    assert not failed, {"failed": failed, "details": {
        k: details[k] for k in ("seeds", "dense_points", "rounds")}}
    # Envelope guards against quiet degradation even while criteria pass.
    assert details["seeds"] >= 400
    assert details["dense_points"] >= 50_000
