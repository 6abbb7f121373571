from sfm_tpu.mvs.pipeline import dense_reconstruction, DenseReconstruction  # noqa: F401
