"""Cube synthesis — the ``new_cube`` fixture generator.

Re-expresses xcube's ``new_cube`` (xcube/core/new.py:13-268): synthesize
a deterministic test cube from axis specs plus per-variable value
functions.  Spark-first: one ``spark.range(T*H*W)`` followed by pure
Column arithmetic — a narrow, shuffle-free, embarrassingly parallel
plan that scales to arbitrary cube sizes (no driver-side materialize).

Variable specs (mirrors new.py:232-257):
- number           -> constant variable (new.py:240-245)
- str              -> SQL expression over t_i/y_i/x_i/time/y/x
- Column           -> used as-is
- callable(ns)     -> Column built from a namespace dict of the dim
                      columns (the ``f(t, y, x)`` callable pattern,
                      new.py:246-251)
- ("uniform", seed[, null_frac]) -> seeded uniform(0,1) with optional
                      NULL fraction (random-variable pattern + the NaN
                      fixture of FIXTURES.md)
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid

#: default fixture variables (FIXTURES.md §1)
DEFAULT_VARIABLES: dict[str, Any] = {
    "A": lambda ns: ns["t_i"].cast("double")
    + 0.1 * ns["y"]
    + 0.01 * ns["x"],
    "B": ("uniform", 42, 0.3),
    "C": 0.5,
    "flags": lambda ns: (
        F.when(ns["x_i"] < 180, F.lit(1)).otherwise(0)
        + F.when((ns["y_i"] * 360 + ns["x_i"]) % 7 == 0, F.lit(2)).otherwise(0)
        + F.when((ns["y_i"] * 360 + ns["x_i"]) % 13 == 0, F.lit(4)).otherwise(0)
    ).cast("int"),
}


def _resolve_var(spec: Any, ns: Mapping[str, Column]) -> Column:
    if isinstance(spec, Column):
        return spec
    if isinstance(spec, (int, float)):
        return F.lit(float(spec))
    if isinstance(spec, str):
        return F.expr(spec)
    if isinstance(spec, tuple) and spec and spec[0] == "uniform":
        seed = spec[1] if len(spec) > 1 else 42
        null_frac = spec[2] if len(spec) > 2 else 0.0
        val = F.rand(seed)
        if null_frac:
            # missing data is SQL NULL, not NaN (SURVEY §4: NaN->NULL policy)
            return F.when(F.rand(seed + 1) >= null_frac, val)
        return val
    if callable(spec):
        return spec(dict(ns))
    raise TypeError(f"unsupported variable spec: {spec!r}")


def new_cube(
    spark: SparkSession,
    grid: CubeGrid | None = None,
    variables: Mapping[str, Any] | None = None,
    include_chunk_id: bool = False,
    num_partitions: int | None = None,
    **grid_kwargs: Any,
) -> DataFrame:
    """Synthesize a cells-table cube (one row per (time, y, x) cell).

    Equivalent to ``new_cube(width=W, height=H, time_periods=T,
    variables=...)`` (xcube/core/new.py:13-41) in the long cells model.
    """
    from xcube_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    grid = grid or CubeGrid(**grid_kwargs)
    if variables is None:
        variables = DEFAULT_VARIABLES

    plane = grid.width * grid.height
    base = spark.range(grid.size, numPartitions=num_partitions)
    t_i = (F.col("id") / plane).cast("int")
    rem = F.col("id") % plane
    y_i = (rem / grid.width).cast("int")
    x_i = (rem % grid.width).cast("int")

    df = base.select(
        t_i.alias("t_i"), y_i.alias("y_i"), x_i.alias("x_i")
    ).select(
        "t_i",
        "y_i",
        "x_i",
        grid.time_center_expr(F.col("t_i")).alias("time"),
        grid.y_center_expr(F.col("y_i")).alias("y"),
        grid.x_center_expr(F.col("x_i")).alias("x"),
    )

    ns = {c: F.col(c) for c in df.columns}
    for name, spec in variables.items():
        df = df.withColumn(name, _resolve_var(spec, ns))
    if include_chunk_id:
        df = df.withColumn(
            "chunk_id",
            grid.chunk_id_expr(F.col("t_i"), F.col("y_i"), F.col("x_i")),
        )
    return df


def new_cube_sql(grid: CubeGrid, variables: Mapping[str, str] | None = None) -> str:
    """DuckDB-runnable SQL that generates the *same* cube — the oracle
    twin of :func:`new_cube` for deterministic variable specs.

    Coordinate math is written with the identical operation order as the
    Column expressions so float results agree bit-for-bit.
    """
    if variables is None:
        variables = {
            "A": "CAST(t_i AS DOUBLE) + 0.1 * y + 0.01 * x",
            "C": "CAST(0.5 AS DOUBLE)",
            "flags": (
                "CAST((CASE WHEN x_i < 180 THEN 1 ELSE 0 END)"
                " + (CASE WHEN (y_i * 360 + x_i) % 7 = 0 THEN 2 ELSE 0 END)"
                " + (CASE WHEN (y_i * 360 + x_i) % 13 = 0 THEN 4 ELSE 0 END) AS INT)"
            ),
        }
    plane = grid.width * grid.height
    t0 = grid.t_start.timestamp()
    y_center = (
        f"({grid.y_end} - (y_i + 0.5) * {grid.y_res})"
        if grid.inverse_y
        else f"({grid.y_start} + (y_i + 0.5) * {grid.y_res})"
    )
    var_sql = ", ".join(f"{expr} AS {name}" for name, expr in variables.items())
    return f"""
        WITH idx AS (
            SELECT CAST(range // {plane} AS INT) AS t_i,
                   CAST((range % {plane}) // {grid.width} AS INT) AS y_i,
                   CAST(range % {grid.width} AS INT) AS x_i
            FROM range({grid.size})
        ), dims AS (
            SELECT t_i, y_i, x_i,
                   to_timestamp({t0} + (CAST(t_i AS DOUBLE) + 0.5)
                                * {grid.t_freq_days * 86400.0})::TIMESTAMP AS time,
                   {y_center} AS y,
                   ({grid.x_start} + (x_i + 0.5) * {grid.x_res}) AS x
            FROM idx
        )
        SELECT t_i, y_i, x_i, time, y, x, {var_sql} FROM dims
    """


def gen_points(
    spark: SparkSession,
    grid: CubeGrid,
    n: int,
    seed: int = 42,
    frac_outside: float = 0.0,
    method: str = "xorshift",
) -> DataFrame:
    """Random test points over a cube's extent — ``xcube genpts``
    (cli/genpts.py:28-88): n rows of (point_id, time, lat, lon), seeded
    uniform within the grid bbox/time span; ``frac_outside`` widens the
    sampling box so some points fall off-grid (the reference's
    out-of-range fixture knob).  Pure spark.range + a seeded uniform —
    distributed, deterministic per seed.

    ``method``: "xorshift" uses Spark's native ``F.rand`` (fast,
    engine-private stream); "hash" derives each uniform from the Knuth
    multiplicative hash of (id + salt) — pure int64 arithmetic with a
    power-of-two divisor, so ANY engine replays the exact doubles
    (the oracle-stateable mode; same portability argument as
    pipeline/curation.det_hash)."""
    pad_x = (grid.x_end - grid.x_start) * frac_outside
    pad_y = (grid.y_end - grid.y_start) * frac_outside
    t0 = grid.t_start.timestamp()
    span = grid.time_periods * grid.t_freq_days * 86400.0

    if method == "hash":
        def u(salt: int) -> Column:
            h = ((F.col("id") + F.lit(salt)) * F.lit(2654435761)) \
                % F.lit(2 ** 32)
            return h / F.lit(float(2 ** 32))
    elif method == "xorshift":
        def u(salt: int) -> Column:
            return F.rand(salt)
    else:
        raise ValueError(f"unknown gen_points method {method!r}")

    return spark.range(n).select(
        F.col("id").alias("point_id"),
        F.timestamp_seconds(
            F.lit(t0) + u(seed) * F.lit(span * (1 + frac_outside))
        ).alias("time"),
        (F.lit(grid.y_start - pad_y)
         + u(seed + 1) * F.lit(grid.y_end - grid.y_start + 2 * pad_y)
         ).alias("lat"),
        (F.lit(grid.x_start - pad_x)
         + u(seed + 2) * F.lit(grid.x_end - grid.x_start + 2 * pad_x)
         ).alias("lon"),
    )
