from sfm_tpu.geometry.rotations import (  # noqa: F401
    rodrigues_matrix,
    rodrigues_vector,
    rotate_points,
)
from sfm_tpu.geometry.projection import (  # noqa: F401
    projection_matrix,
    project_pinhole,
    project_cam,
    pack_cam,
    reprojection_errors,
)
from sfm_tpu.geometry.triangulation import (  # noqa: F401
    triangulate_dlt,
    dehomogenize,
    ray_plane_intersection,
)
from sfm_tpu.geometry.epipolar import (  # noqa: F401
    eight_point,
    sampson_distance,
    epipolar_distance,
)
