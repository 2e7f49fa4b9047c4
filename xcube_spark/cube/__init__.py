from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.new import new_cube

__all__ = ["CubeGrid", "new_cube"]
