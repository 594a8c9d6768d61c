from vats_tpu.parallel.mesh import (
    MESH_AXES,
    ambient_mesh,
    create_mesh,
    create_device_mesh,
    logical_axis_rules,
    logical_to_mesh_spec,
    with_logical_constraint,
)

__all__ = [
    "MESH_AXES",
    "ambient_mesh",
    "create_mesh",
    "create_device_mesh",
    "logical_axis_rules",
    "logical_to_mesh_spec",
    "with_logical_constraint",
]
