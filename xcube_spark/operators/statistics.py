"""Statistics — xcube/webapi/statistics/controllers.py:30-141.

``compute_statistics``: for a variable (or compiled expression) over an
optional mask: count/minimum/maximum/mean/deviation plus a 100-bin
density histogram.

Spark mapping (SURVEY §2.5): one scalar aggregate for the moments; the
histogram buckets on ``floor((v - lo) / (hi - lo) * bins)`` against the
broadcast [lo, hi] range — two passes total, both full-scan streaming
aggregates with tiny outputs.  (DuckDB 1.0 lacks width_bucket, so the
arithmetic form is also what the oracle runs.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xcube_spark.functions.expression import compile_expr


def compute_statistics(
    df: DataFrame,
    var: str | Column,
    mask: Column | None = None,
) -> DataFrame:
    """Single-row stats: count, minimum, maximum, mean, deviation
    (controllers.py:95-99).  ``var`` may be an expression string —
    compiled to a Column, same as the server's expression support."""
    c = compile_expr(var) if isinstance(var, str) else var
    if mask is not None:
        df = df.where(mask)
    return df.agg(
        F.count(c).alias("count"),
        F.min(c).alias("minimum"),
        F.max(c).alias("maximum"),
        F.avg(c).alias("mean"),
        F.stddev_pop(c).alias("deviation"),
    )


def compute_histogram(
    df: DataFrame,
    var: str | Column,
    bins: int = 100,
    value_range: Sequence[float] | None = None,
    mask: Column | None = None,
) -> DataFrame:
    """100-bin histogram (controllers.py:100-141): (bucket, lo, hi,
    frequency) rows; bucket edges from the data range unless given."""
    c = compile_expr(var) if isinstance(var, str) else var
    if mask is not None:
        df = df.where(mask)
    vals = df.select(c.alias("__v")).where(F.col("__v").isNotNull())
    if value_range is not None:
        lo, hi = float(value_range[0]), float(value_range[1])
        ranged = vals.withColumns({"lo": F.lit(lo), "hi": F.lit(hi)}).where(
            F.col("__v").between(lo, hi)
        )
    else:
        rng = vals.agg(F.min("__v").alias("lo"), F.max("__v").alias("hi"))
        ranged = vals.crossJoin(F.broadcast(rng))
    bucket = F.least(
        F.floor(
            (F.col("__v") - F.col("lo")) / (F.col("hi") - F.col("lo")) * bins
        ).cast("int"),
        F.lit(bins - 1),
    )
    width = (F.col("hi") - F.col("lo")) / bins
    return (
        ranged.groupBy(
            bucket.alias("bucket"),
            (F.col("lo") + bucket * width).alias("bin_lo"),
            (F.col("lo") + (bucket + 1) * width).alias("bin_hi"),
        )
        .agg(F.count(F.lit(1)).alias("frequency"))
    )


def stretch_range_df(
    df: DataFrame, var: str | Column, how: str = "2sigma"
) -> DataFrame:
    """Color-mapping value range (core/tile.py:540-608) as a ONE-ROW
    DataFrame ``(lo, hi)``: '2sigma' -> mean ± 2·std; 'minmax' -> exact
    extremes; 'p2-p98' percentile stretch via approx_percentile.

    Lazy by construction: crossJoin(broadcast(...)) this against the
    consumer (histogram, RGBA normalize) and the whole stretch+render
    runs as one Spark action — no driver round-trip per request.  The
    reference recomputes stretch ranges inline per tile request
    (tile.py:540-608); folding it into the render plan beats that."""
    c = compile_expr(var) if isinstance(var, str) else var
    if how == "minmax":
        return df.agg(F.min(c).cast("double").alias("lo"),
                      F.max(c).cast("double").alias("hi"))
    if how == "2sigma":
        return df.agg(
            (F.avg(c) - 2 * F.stddev_pop(c)).alias("lo"),
            (F.avg(c) + 2 * F.stddev_pop(c)).alias("hi"),
        )
    if how == "p2-p98":
        return df.agg(
            F.percentile_approx(c, 0.02).cast("double").alias("lo"),
            F.percentile_approx(c, 0.98).cast("double").alias("hi"),
        )
    raise ValueError(f"unknown stretch {how!r}")


def with_stretch_range(
    df: DataFrame, var: str | Column, how: str = "2sigma",
    stats_df: DataFrame | None = None,
) -> DataFrame:
    """Attach ``lo``/``hi`` stretch columns to every row of ``df`` via
    a broadcast of the one-row range aggregate (the scalar-subquery
    shape) — single-action composition for histogram/tile pipelines.
    ``stats_df`` overrides the source the range is computed from (e.g.
    compute the stretch on the full variable but apply per-tile)."""
    rng = stretch_range_df(stats_df if stats_df is not None else df, var, how)
    return df.crossJoin(F.broadcast(rng))


def stretch_range(
    df: DataFrame, var: str | Column, how: str = "2sigma"
) -> tuple[float, float]:
    """Driver-side convenience: collect the stretch range as floats.
    One job; prefer stretch_range_df/with_stretch_range inside query
    plans so the range never round-trips through the driver."""
    row = stretch_range_df(df, var, how).collect()[0]
    return float(row["lo"]), float(row["hi"])
