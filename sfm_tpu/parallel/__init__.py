from sfm_tpu.parallel.mesh import data_mesh, shard_batch  # noqa: F401
