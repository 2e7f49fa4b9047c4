from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.new import new_cube
from xcube_spark.cube.schema import (
    CubeSchema,
    find_ancillary_var_names,
    get_cube_schema,
)

__all__ = [
    "CubeGrid",
    "new_cube",
    "CubeSchema",
    "get_cube_schema",
    "find_ancillary_var_names",
]
