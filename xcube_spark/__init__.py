"""xcube_spark — a PySpark-native data-cube analytics engine.

Re-implements the capabilities of xcube-dev/xcube (geospatial data-cube
toolkit: reference at /root/reference) as an idiomatic PySpark
DataFrame/SQL engine.  The fundamental data model is the *cells table*:
a long DataFrame with one row per (time, y, x) grid cell and one column
per cube variable (see SURVEY.md §1.8), replacing the reference's
chunked xarray/Dask arrays (xcube/core/schema.py:14).

Subpackages
-----------
cube        data model: grid schema, cube synthesis, verification
operators   relational re-expressions of the reference's operator set
functions   expression compiler (Python AST -> Spark Column)
sources     IO facade, store/catalog framework, time-slice maintenance
pipeline    large-scale training-data ops (dedup, similarity, text)
streaming   Structured Streaming surface (additive; no ref counterpart)
"""

from xcube_spark.cube.accessor import SparkCube
from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.new import new_cube
from xcube_spark.session import get_session

__version__ = "0.1.0"

__all__ = ["CubeGrid", "SparkCube", "new_cube", "get_session", "__version__"]
