"""sfm_tpu — a TPU-native Structure-from-Motion + Multi-View-Stereo engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``MarvinChung/simple-implementation-of-structure-from-motion-and-multi-view-stereo-by-python``
(see /root/reference): calibrated incremental SfM on Middlebury-style datasets,
Levenberg-Marquardt bundle adjustment with a Schur-complement solver, and
PMVS-style patch-based dense reconstruction — all formulated as batched,
statically-shaped device computations instead of per-point Python loops.

Layering (bottom-up), mirroring the capability map in SURVEY.md:

- ``sfm_tpu.config``    — every tunable the reference hard-codes, as one dataclass
- ``sfm_tpu.io``        — Middlebury ``*_par.txt`` calibration, images, PLY export
- ``sfm_tpu.geometry``  — rotations, projection, triangulation, epipolar geometry
- ``sfm_tpu.ops``       — Pallas/TPU kernels (Harris response, NCC scoring) + XLA fallbacks
- ``sfm_tpu.features``  — corner detection, patch descriptors, MXU matcher
- ``sfm_tpu.sfm``       — RANSAC two-view geometry, track store, sparse pipeline
- ``sfm_tpu.ba``        — Schur-complement Levenberg-Marquardt bundle adjustment
- ``sfm_tpu.mvs``       — patch-based dense reconstruction (seed + frontier expansion)
- ``sfm_tpu.parallel``  — device-mesh / sharding helpers (pjit/shard_map)
- ``sfm_tpu.utils``     — metrics, timing, visualization
"""

__version__ = "0.1.0"

import jax as _jax

# TPU MXU f32 matmuls default to bfloat16 passes; the geometry/solver math
# (projection matrices ~3e3 entries, DLT/eigh, Gauss-Newton) needs true f32
# or pixel-level accuracy collapses (~1 px triangulation error vs the 0.3 px
# acceptance gate).  Bandwidth-bound throughput kernels that tolerate bf16
# opt back in explicitly (descriptor correlation, ops/ncc.py).
_jax.config.update("jax_default_matmul_precision", "highest")

from sfm_tpu.config import PipelineConfig  # noqa: F401
