"""Reshape operators — xcube/core/vars2dim.py:10-46.

``vars_to_dim``: stack data variables into a new dimension ``var`` with
a single data column ``data`` — the cube-world melt.  Spark mapping:
``stack()`` unpivot (a generator projection, narrow, shuffle-free).
The inverse (``dim_to_vars``) is a pivot.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xcube_spark.cube.grid import COORD_COLS, DIM_COLS
from xcube_spark.cube.grid import var_names as cube_vars


def vars_to_dim(
    cube: DataFrame,
    var_names: Sequence[str] | None = None,
    dim_name: str = "var",
    data_name: str = "data",
) -> DataFrame:
    """Melt variable columns into (dim_name, data_name) long form."""
    vars_ = list(var_names) if var_names is not None else cube_vars(cube)
    keep = [c for c in cube.columns if c in set(DIM_COLS) | set(COORD_COLS)]
    pairs = ", ".join(f"'{v}', {v}" for v in vars_)
    stacked = cube.select(
        *keep,
        F.expr(
            f"stack({len(vars_)}, {pairs}) as ({dim_name}, {data_name})"
        ),
    )
    return stacked


def dim_to_vars(
    long: DataFrame,
    values: Sequence[str],
    dim_name: str = "var",
    data_name: str = "data",
) -> DataFrame:
    """Inverse melt: pivot the ``var`` dimension back into columns.
    Explicit pivot values avoid the extra distinct-scan job."""
    keys = [c for c in long.columns if c not in (dim_name, data_name)]
    return (
        long.groupBy(*keys)
        .pivot(dim_name, list(values))
        .agg(F.first(data_name))
    )
