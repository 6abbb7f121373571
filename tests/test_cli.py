"""CLI smoke tests (subprocess-free: drive main() in-process on CPU)."""
import json
import os

import numpy as np
import pytest

from sfm_tpu.cli import build_parser, config_from_args, main


REF = "/root/reference/dinoRing"


def _ref_args(tmp_path, extra=()):
    return [
        "-img_p", REF, "-par_p", os.path.join(REF, "dinoR_par.txt"),
        "-t", "png", "-scale", "10", "--max_images", "4",
        "--max_corners", "512", "--max_matches", "256",
        "--out_dir", str(tmp_path), *extra,
    ]


@pytest.mark.skipif(not os.path.isdir(REF), reason="dinoRing unavailable")
class TestCli:
    def test_parser_reference_flags(self):
        p = build_parser()
        a = p.parse_args(
            ["-img_p", "x", "-par_p", "y", "-t", "png", "-scale", "10",
             "-cell_size", "4", "-desc_wid", "3", "--nonSequence", "--debug"]
        )
        assert a.image_type == "png" and a.scale == 10.0
        assert a.cell_size == 4 and a.desc_wid == 3
        assert a.nonSequence and a.debug
        cfg = config_from_args(a)
        assert cfg.sfm.pair_mode == "combination"
        assert cfg.mvs.cell_size == 4
        assert cfg.mvs.patch_wid == 3

    def test_sfm_ba_stages(self, tmp_path):
        rc = main(_ref_args(tmp_path, ["--stages", "sfm,ba",
                                       "--checkpoint_dir", str(tmp_path / "ck")]))
        assert rc == 0
        assert (tmp_path / "sparse_points.ply").exists()
        assert (tmp_path / "sparse_points_ba.ply").exists()
        assert (tmp_path / "ck" / "sfm.npz").exists()
        assert (tmp_path / "ck" / "ba.npz").exists()

    def test_resume_mvs_only(self, tmp_path):
        ck = str(tmp_path / "ck")
        assert main(_ref_args(tmp_path, ["--stages", "sfm",
                                         "--checkpoint_dir", ck])) == 0
        rc = main(_ref_args(tmp_path, [
            "--stages", "mvs", "--checkpoint_dir", ck,
            "--mvs_round_capacity", "1024", "--mvs_rounds", "1",
        ]))
        assert rc == 0
        assert (tmp_path / "all_patches.ply").exists()
        assert (tmp_path / "initial_patches.ply").exists()

    def test_missing_prereq_errors(self, tmp_path):
        rc = main(_ref_args(tmp_path, ["--stages", "ba"]))
        assert rc == 2
