from sfm_tpu.sfm.ransac import ransac_fundamental  # noqa: F401
from sfm_tpu.sfm.tracks import TrackStore  # noqa: F401
from sfm_tpu.sfm.pipeline import structure_from_motion, SparseReconstruction  # noqa: F401
