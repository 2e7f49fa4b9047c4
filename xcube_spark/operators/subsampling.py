"""Spatial block subsampling — xcube/core/subsampling.py:17-264.

``subsample_dataset``: k x k spatial block downsampling with per-variable
aggregation methods: first (corner slicing), min/max/mean/median, mode.

Spark mapping (SURVEY §2.5): ``groupBy(t_i, y_i div k, x_i div k)`` — a
single partial-aggregated shuffle whose output is 1/k² of the input.
"first" needs no shuffle at all: it is the pure predicate
``y_i % k = 0 AND x_i % k = 0`` (the reference's ``[..., ::k, ::k]``
slicing).  "mode" (scipy path in the reference, subsampling.py:146) is
``mode()`` / count + row_number in SQL.
"""

from __future__ import annotations

from fnmatch import fnmatch
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AGG_METHODS = ("first", "min", "max", "mean", "median", "mode", "count")


def _agg(var: str, method: str) -> Column:
    c = F.col(var)
    e = {
        "min": F.min(c),
        "max": F.max(c),
        "mean": F.avg(c),
        "median": F.expr(f"percentile({var}, 0.5)"),
        "mode": F.mode(c),
        "count": F.count(c),
    }[method]
    return e.alias(f"{var}_{method}")


def resolve_agg_methods(
    var_names: Sequence[str],
    agg_methods: str | Mapping[str, object] | None,
    default: str = "mean",
) -> dict[str, tuple[str, ...]]:
    """Per-variable method resolution with glob patterns
    (subsampling.py:169-232: ``var_configs`` keyed by fnmatch pattern)."""
    out: dict[str, tuple[str, ...]] = {}
    for v in var_names:
        if agg_methods is None:
            out[v] = (default,)
        elif isinstance(agg_methods, str):
            out[v] = (agg_methods,)
        else:
            methods: tuple[str, ...] = ()
            for pattern, m in agg_methods.items():
                if fnmatch(v, pattern):
                    methods = (m,) if isinstance(m, str) else tuple(m)
            out[v] = methods or (default,)
    for v, ms in out.items():
        for m in ms:
            if m not in AGG_METHODS:
                raise ValueError(f"unknown agg method {m!r} for {v!r}")
    return out


def subsample_dataset(
    cube: DataFrame,
    factor: int,
    agg_methods: str | Mapping[str, object] | None = None,
) -> DataFrame:
    """Downsample spatially by ``factor`` with per-variable aggregators.

    Index columns become block indices (``y_i div k``); if every variable
    uses "first", the plan degenerates to a shuffle-free filter, exactly
    like the reference's slicing fast path (subsampling.py:104-118).
    """
    from xcube_spark.cube.grid import var_names as cube_vars

    vars_ = cube_vars(cube)
    methods = resolve_agg_methods(vars_, agg_methods)

    if all(ms == ("first",) for ms in methods.values()):
        out = cube.where((F.col("y_i") % factor == 0) & (F.col("x_i") % factor == 0))
        return out.withColumns(
            {
                "y_i": (F.col("y_i") / factor).cast("int"),
                "x_i": (F.col("x_i") / factor).cast("int"),
            }
        )

    keys = [
        F.col("t_i"),
        F.floor(F.col("y_i") / factor).cast("int").alias("y_i"),
        F.floor(F.col("x_i") / factor).cast("int").alias("x_i"),
    ]
    aggs: list[Column] = []
    for v, ms in methods.items():
        for m in ms:
            if m == "first":
                # corner cell of each block, deterministic
                aggs.append(
                    F.min_by(
                        F.col(v), F.col("y_i") % factor * factor + F.col("x_i") % factor
                    ).alias(f"{v}_first")
                )
            else:
                aggs.append(_agg(v, m))
    aggs.append(F.count(F.lit(1)).alias("n"))
    return cube.groupBy(*keys).agg(*aggs)
