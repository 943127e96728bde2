from dataset_pipeline_tpu.editor.ops import (  # noqa: F401
    select_beyond_plane,
    select_lasso,
    clip_mesh_to_box,
    crop_mesh_to_box,
    csg_box,
    apply_up_direction,
    move_points,
    delete_points,
    select_mesh_vertices,
    move_mesh_vertices,
    delete_mesh_vertices,
)
from dataset_pipeline_tpu.editor.labels import (  # noqa: F401
    LabelDefinition,
    read_label_definitions,
    read_labels,
    write_labels,
)
