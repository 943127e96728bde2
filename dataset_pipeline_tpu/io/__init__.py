from dataset_pipeline_tpu.io.ply import PointCloud, read_ply, write_ply  # noqa: F401
from dataset_pipeline_tpu.io.meshlab import (  # noqa: F401
    MeshInfo,
    read_meshlab_project,
    write_meshlab_project,
)
from dataset_pipeline_tpu.io import colmap  # noqa: F401
from dataset_pipeline_tpu.io.depthmap import (  # noqa: F401
    read_depth_raw,
    write_depth_raw,
    read_cube_intrinsics,
    write_cube_intrinsics,
)
