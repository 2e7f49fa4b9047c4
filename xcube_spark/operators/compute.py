"""Multi-cube user compute — xcube/core/compute.py:28-365.

``compute_dataset``: apply a user ``cube_func`` chunk-parallel over one
or more aligned cubes.  The reference contract
(``cube_func(*var_arrays, input_params, dim_coords, dim_ranges) ->
ndarray`` under ``xr.apply_ufunc(dask='parallelized')``) maps 1:1 onto
``applyInPandas`` over chunk groups (SURVEY §2.9):

- group = ``chunk_id`` (the Zarr-chunk analog): each group's pandas
  frame is one chunk's cells, sorted to (t_i, y_i, x_i) C-order so the
  user function sees the same array layout the reference delivers;
- the coords dict carries the chunk's dimension columns (the reference
  feeds chunk coordinates through its index-var trick,
  compute.py:339-365);
- multiple aligned input cubes are equi-joined on the dim key first —
  alignment *is* the join (SURVEY §2.12 merge analog).

Scale: Arrow-batched transfer, one Python worker call per chunk, no
driver-side data motion; chunk size controls the memory envelope
exactly like the reference's dask chunking.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xcube_spark.cube.grid import DIM_COLS, CubeGrid, var_names

CubeFunc = Callable[..., Any]  # (*np_arrays, coords: dict) -> np array


def align_cubes(*cubes: DataFrame) -> DataFrame:
    """Align N cubes on the dim key (inner equi-join on t_i/y_i/x_i;
    coordinate columns taken from the first cube)."""
    out = cubes[0]
    for other in cubes[1:]:
        dup = [c for c in ("time", "y", "x") if c in other.columns]
        out = out.join(other.drop(*dup), on=list(DIM_COLS), how="inner")
    return out


def compute_dataset(
    cube_func: CubeFunc,
    *cubes: DataFrame,
    grid: CubeGrid,
    var_name: str,
    input_var_names: list[str] | None = None,
    input_params: Mapping[str, Any] | None = None,
    output_type: str = "double",
) -> DataFrame:
    """Compute a new variable with ``cube_func`` applied per chunk.

    ``cube_func(*arrays, coords)`` receives one numpy array per input
    variable (chunk cells in (t_i, y_i, x_i) order) plus a coords dict
    of the dim/coord arrays, and returns an equally-shaped array
    (``input_params`` are closed over via functools/partial-style
    binding here, mirroring compute.py:28-60's input_params).
    """
    src = align_cubes(*cubes) if len(cubes) > 1 else cubes[0]
    vars_ = input_var_names or var_names(src)
    params = dict(input_params or {})

    keyed = src.withColumn(
        "__chunk", grid.chunk_id_expr(F.col("t_i"), F.col("y_i"), F.col("x_i"))
    )
    out_schema = T.StructType(
        [f for f in keyed.schema.fields if f.name != "__chunk"]
        + [T.StructField(var_name, getattr(
            T, {"double": "DoubleType", "float": "FloatType",
                "int": "IntegerType", "long": "LongType"}[output_type])())]
    )
    coord_cols = [c for c in ("t_i", "y_i", "x_i", "time", "y", "x")
                  if c in src.columns]

    def apply_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t_i", "y_i", "x_i"]).drop(columns="__chunk")
        arrays = [pdf[v].to_numpy() for v in vars_]
        coords = {c: pdf[c].to_numpy() for c in coord_cols}
        result = cube_func(*arrays, coords, **params) if params else \
            cube_func(*arrays, coords)
        pdf[var_name] = result
        return pdf

    return keyed.groupBy("__chunk").applyInPandas(apply_chunk, out_schema)
