from sfm_tpu.ops.harris import harris_response, detect_corners  # noqa: F401
from sfm_tpu.ops.patches import extract_patches, normalize_descriptors  # noqa: F401
from sfm_tpu.ops.ncc import ncc_scores  # noqa: F401
