from sfm_tpu.features.frontend import detect_and_describe, FeatureSet  # noqa: F401
from sfm_tpu.features.matching import match_descriptors, MatchResult  # noqa: F401
