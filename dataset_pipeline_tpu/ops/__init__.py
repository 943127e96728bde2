from dataset_pipeline_tpu.ops.knn import (  # noqa: F401
    VoxelGrid,
    build_grid,
    knn_bruteforce,
    knn_grid,
    nearest_neighbor,
    radius_search,
)
from dataset_pipeline_tpu.ops.normals import estimate_normals  # noqa: F401
from dataset_pipeline_tpu.ops.outlier import remove_outliers  # noqa: F401
