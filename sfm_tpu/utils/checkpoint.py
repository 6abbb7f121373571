"""Stage checkpointing / resume.

The reference keeps everything in RAM; a crash during its hours-long MVS
loses all SfM+BA work (SURVEY.md §5 "Checkpoint / resume": absent).  Here
each stage boundary (tracks after SfM, refined points after BA, dense cloud)
serializes to a single ``.npz`` so any stage can restart from the previous
one — the natural boundaries are the reference's main.py:29-30 seams.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from sfm_tpu.io.calib import Calibration
from sfm_tpu.sfm.pipeline import SparseReconstruction


def save_sparse(path: str, recon: SparseReconstruction) -> None:
    np.savez_compressed(
        path,
        world=recon.world,
        track_offsets=recon.track_offsets,
        track_obs=recon.track_obs,
        K=recon.calib.K,
        R=recon.calib.R,
        t=recon.calib.t,
        names=np.asarray(recon.calib.names),
    )


def load_sparse(path: str) -> SparseReconstruction:
    z = np.load(path, allow_pickle=False)
    calib = Calibration(
        K=z["K"], R=z["R"], t=z["t"], names=tuple(z["names"].tolist())
    )
    return SparseReconstruction(
        calib=calib,
        world=z["world"],
        track_offsets=z["track_offsets"],
        track_obs=z["track_obs"],
    )


def stage_path(ckpt_dir: str, stage: str) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    return os.path.join(ckpt_dir, f"{stage}.npz")


def try_resume(ckpt_dir: Optional[str], stage: str):
    """Return the checkpointed SparseReconstruction if present, else None."""
    if not ckpt_dir:
        return None
    p = stage_path(ckpt_dir, stage)
    if os.path.exists(p):
        return load_sparse(p)
    return None
