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

# Persistent compilation cache: a fresh process otherwise re-pays every XLA
# compile (~2 min of the measured 140 s cold start on the remote-TPU link).
# Opt out with SFM_TPU_NO_COMPILE_CACHE=1 or point SFM_TPU_COMPILE_CACHE at a
# different directory.  Thresholds 0: cache everything, tiny programs too —
# this pipeline is many small programs, not one big one.  Skipped when the
# process pins JAX to CPU (tests, verify recipes): CPU compiles are fast,
# and XLA:CPU AOT cache entries bake in host feature sets that can mismatch
# across processes (observed '+prefer-no-scatter' SIGILL warnings).
import os as _os

_on_cpu = "cpu" in (
    _os.environ.get("JAX_PLATFORMS", "") or getattr(_jax.config, "jax_platforms", None) or ""
)
if not _os.environ.get("SFM_TPU_NO_COMPILE_CACHE") and not _on_cpu:
    _cache_dir = _os.environ.get(
        "SFM_TPU_COMPILE_CACHE",
        _os.path.join(
            _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache")),
            "sfm_tpu", "jax_cache",
        ),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):  # read-only FS / older jax: best effort
        pass

from sfm_tpu.config import PipelineConfig  # noqa: F401
