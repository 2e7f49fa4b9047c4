"""Maintenance & canonicalization operators — SURVEY §2.10.

chunk_dataset / rechunk (core/chunk.py:15-46, schema.py:432-533),
empty-chunk discovery + pruning (chunk.py:49-86, cli/prune.py:22-98),
optimize/compact (core/optimize.py:15-80), the normalize pass
(core/normalize.py:45-947 — the deterministic column-transform subset
that applies to the cells model), and verify_cube
(core/verify.py:14-75).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid, var_names


# ---- chunking ---------------------------------------------------------


def chunk_dataset(cube: DataFrame, grid: CubeGrid,
                  chunks: tuple[int, int, int] | None = None) -> DataFrame:
    """chunk_dataset (chunk.py:15-46): attach/recompute the chunk key
    and repartition on it — rechunk ≡ repartition (SURVEY §1.8).
    The partition count follows the chunk-grid cardinality so one
    shuffle partition holds ~one chunk's rows."""
    g = grid if chunks is None else CubeGrid(
        **{**grid.__dict__, "chunks": chunks}
    )
    ct, cy, cx = g.chunks
    n_chunks = (
        ((g.time_periods + ct - 1) // ct)
        * ((g.height + cy - 1) // cy)
        * ((g.width + cx - 1) // cx)
    )
    keyed = cube.withColumn(
        "chunk_id", g.chunk_id_expr(F.col("t_i"), F.col("y_i"), F.col("x_i"))
    )
    return keyed.repartition(max(1, n_chunks), "chunk_id")


def get_empty_dataset_chunks(cube: DataFrame, grid: CubeGrid) -> DataFrame:
    """Find all-NULL chunks (chunk.py:49-86): one partial agg keyed by
    chunk id — ``every(var IS NULL)`` per variable, a chunk is empty if
    every variable is all-NULL."""
    vars_ = var_names(cube)
    key = grid.chunk_id_expr(F.col("t_i"), F.col("y_i"), F.col("x_i"))
    per_var = [F.every(F.col(v).isNull()).alias(f"{v}_empty") for v in vars_]
    agg = cube.groupBy(key.alias("chunk_id")).agg(*per_var)
    all_empty: Column = F.lit(True)
    for v in vars_:
        all_empty = all_empty & F.col(f"{v}_empty")
    return agg.where(all_empty).select("chunk_id")


def prune_dataset(cube: DataFrame, grid: CubeGrid) -> DataFrame:
    """xcube prune (cli/prune.py:22-98): drop rows of all-NULL chunks.
    Broadcast the (tiny) empty-chunk set into an anti-join; at read
    time, absent chunks mean fill-value/NULL — COALESCE semantics
    (SURVEY §4: don't materialize all-null cell rows)."""
    empty = get_empty_dataset_chunks(cube, grid)
    key = grid.chunk_id_expr(F.col("t_i"), F.col("y_i"), F.col("x_i"))
    return cube.withColumn("__ck", key).join(
        F.broadcast(empty.withColumnRenamed("chunk_id", "__ck")),
        on="__ck",
        how="left_anti",
    ).drop("__ck")


def optimize_dataset(cube: DataFrame, target_partitions: int) -> DataFrame:
    """optimize_dataset (optimize.py:15-80): compaction.  The Zarr
    metadata-consolidation half is native to parquet footers/catalog
    stats; the small-files half is a coalesce to the target layout."""
    return cube.coalesce(max(1, target_partitions))


# ---- normalization (normalize.py:45-947, cells-model subset) ----------


def normalize_lon(cube: DataFrame, grid: CubeGrid) -> tuple[DataFrame, CubeGrid]:
    """0..360 -> -180..180 longitude normalization (normalize.py:389):
    shift coords and re-index so x stays monotonic from -180.

    Applies only to the global 0..360 convention the reference handles
    (full 360-degree span starting at 0); anything already within
    [-180, 180] — including grids starting exactly at -180 — is
    returned unchanged."""
    is_0_360 = (
        abs(grid.x_start) < 1e-9
        and abs(grid.x_end - 360.0) < 1e-9
        and grid.width % 2 == 0
    )
    if not is_0_360:
        return cube, grid
    half = grid.width // 2
    out = cube.withColumns(
        {
            "x": F.when(F.col("x") >= 180.0, F.col("x") - 360.0)
            .otherwise(F.col("x")),
            "x_i": (F.col("x_i") + half) % grid.width,
        }
    )
    new_grid = CubeGrid(**{**grid.__dict__, "x_start": -180.0})
    return out, new_grid


def normalize_inverse_y(cube: DataFrame, grid: CubeGrid) -> tuple[DataFrame, CubeGrid]:
    """Reverse a decreasing y axis (normalize.py:444): flip indices,
    coords unchanged per cell."""
    if not grid.inverse_y:
        return cube, grid
    out = cube.withColumn("y_i", F.lit(grid.height - 1) - F.col("y_i"))
    new_grid = CubeGrid(**{**grid.__dict__, "inverse_y": False})
    return out, new_grid


#: JD 2440587.5 = 1970-01-01T00:00 (unix epoch)
_JD_EPOCH = 2440587.5


def decode_julian_time(
    cube: DataFrame,
    jd_col: str = "time",
    attrs: dict | None = None,
) -> DataFrame:
    """Julian-day -> datetime time decode (normalize.py:465
    ``_normalize_jd2datetime``).

    The reference triggers on ``units``/``long_name`` equal to
    ``'time in julian days'`` and converts each JD to the *calendar
    date* (``jd2gcal`` + ``datetime(y, m, d)`` — midnight, day
    precision).  Same here: pass ``attrs`` to reproduce the gate, or
    call directly to force the decode.  Pure Column math: unix seconds
    = (jd - 2440587.5) * 86400, truncated to the civil day (the JD day
    starts at noon, which the epoch offset accounts for)."""
    if attrs is not None:
        units = str(attrs.get("units") or attrs.get("long_name") or "")
        if units.lower().strip() != "time in julian days":
            return cube
    ts = F.timestamp_seconds(
        (F.col(jd_col) - F.lit(_JD_EPOCH)) * F.lit(86400.0))
    return cube.withColumn(jd_col, F.date_trunc("DAY", ts))


def normalize_2d_coords(
    cube: DataFrame,
    lat_name: str = "lat",
    lon_name: str = "lon",
    tol: float = 1e-6,
) -> DataFrame:
    """2-D -> 1-D coordinate collapse (normalize.py:330
    ``_normalize_lat_lon_2d``).

    If per-cell ``lat(y, x)``/``lon(y, x)`` columns actually span an
    equi-rectangular grid — lat constant along x, lon constant along y
    (within ``tol``, the reference's allclose) — replace the cube's
    ``y``/``x`` coordinate columns with the collapsed per-axis values
    and drop the 2-D columns.  Otherwise the 2-D columns are dropped
    and the cube returned as-is (the reference drops them in either
    case; an irregular grid then needs rectify_dataset).

    One small aggregate decides regularity (axis-sized result); the
    collapse itself is two broadcast axis joins — no data-sized shuffle.
    """
    if lat_name not in cube.columns or lon_name not in cube.columns:
        return cube
    # per-axis spread: regular iff every y_i row has one lat value and
    # every x_i column one lon value
    lat_spread = (
        cube.groupBy("y_i")
        .agg((F.max(lat_name) - F.min(lat_name)).alias("d"))
        .agg(F.max("d").alias("d")).collect()[0]["d"]
    )
    lon_spread = (
        cube.groupBy("x_i")
        .agg((F.max(lon_name) - F.min(lon_name)).alias("d"))
        .agg(F.max("d").alias("d")).collect()[0]["d"]
    )
    if lat_spread is None or lon_spread is None \
            or lat_spread > tol or lon_spread > tol:
        return cube.drop(lat_name, lon_name)
    y_axis = cube.groupBy("y_i").agg(F.min(lat_name).alias("__lat"))
    x_axis = cube.groupBy("x_i").agg(F.min(lon_name).alias("__lon"))
    out = (
        cube.drop(lat_name, lon_name)
        .join(F.broadcast(y_axis), "y_i")
        .join(F.broadcast(x_axis), "x_i")
    )
    cols = {"y": F.col("__lat"), "x": F.col("__lon")}
    return out.withColumns(cols).drop("__lat", "__lon")


def normalize_zonal_to_grid(
    zonal: DataFrame,
    grid: CubeGrid | None = None,
    y_res: float | None = None,
) -> tuple[DataFrame, CubeGrid]:
    """Zonal-mean -> 2-D grid normalization (normalize.py:236
    ``_normalize_zonal_lat_lon``): a dataset with only latitude rows
    (``t_i, y_i, [time, y], <vars>`` — no x) broadcasts each zonal
    value across a full longitude axis at the latitude resolution,
    exactly the reference's per-latitude fill.

    Spark shape: crossJoin with the (tiny, broadcast) x-axis table —
    a narrow W-times fan-out, no shuffle of the zonal data."""
    from pyspark.sql import functions as _F

    if "x_i" in zonal.columns or "x" in zonal.columns:
        return zonal, grid
    if grid is None:
        if y_res is None:
            raise ValueError("need grid or y_res to derive the lon axis")
        width = int(round(360.0 / y_res))
        grid = CubeGrid(width=width, height=int(round(180.0 / y_res)),
                        x_res=y_res, y_res=y_res)
    spark = zonal.sparkSession
    x_axis = spark.range(grid.width).select(
        _F.col("id").cast("int").alias("x_i"),
        grid.x_center_expr(_F.col("id").cast("int")).alias("x"),
    )
    out = zonal.crossJoin(_F.broadcast(x_axis))
    dims = [c for c in ("t_i", "y_i", "x_i", "time", "y", "x")
            if c in out.columns]
    others = [c for c in out.columns if c not in dims]
    return out.select(*dims, *others), grid


def normalize_dataset(cube: DataFrame, grid: CubeGrid) -> tuple[DataFrame, CubeGrid]:
    """The canonicalization pipeline (normalize.py:45-90) for the cells
    model: 2-D coord collapse + lon shift + y-axis flip + canonical
    column order.  (Julian time decode is attribute-gated — see
    decode_julian_time — and applies at ingest when the metadata
    sidecar carries 'time in julian days'.)"""
    if "lat" in cube.columns and "lon" in cube.columns:
        cube = normalize_2d_coords(cube)
    cube, grid = normalize_lon(cube, grid)
    cube, grid = normalize_inverse_y(cube, grid)
    dims = [c for c in ("t_i", "y_i", "x_i", "time", "y", "x")
            if c in cube.columns]
    return cube.select(*dims, *var_names(cube)), grid


# ---- verification (verify.py:14-75) -----------------------------------


def verify_cube(cube: DataFrame, grid: CubeGrid) -> list[str]:
    """Structural validation returning a report list (empty = valid):
    index ranges, duplicate cells, coordinate/index consistency —
    the CHECK-constraint queries of SURVEY §2.10, one aggregate scan."""
    report: list[str] = []
    required = ["t_i", "y_i", "x_i", "time", "y", "x"]
    missing = [c for c in required if c not in cube.columns]
    if missing:
        return [f"missing dimension columns: {missing}"]

    x_err = F.abs(grid.x_center_expr(F.col("x_i")) - F.col("x")) > 1e-9
    y_err = F.abs(grid.y_center_expr(F.col("y_i")) - F.col("y")) > 1e-9
    row = cube.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("t_i", "y_i", "x_i").alias("n_keys"),
        F.min("t_i").alias("t_lo"), F.max("t_i").alias("t_hi"),
        F.min("y_i").alias("y_lo"), F.max("y_i").alias("y_hi"),
        F.min("x_i").alias("x_lo"), F.max("x_i").alias("x_hi"),
        F.sum(x_err.cast("long")).alias("bad_x"),
        F.sum(y_err.cast("long")).alias("bad_y"),
    ).collect()[0]

    if row["n"] != row["n_keys"]:
        report.append(
            f"duplicate cells: {row['n'] - row['n_keys']} of {row['n']}"
        )
    if row["t_lo"] is not None and (
        row["t_lo"] < 0 or row["t_hi"] >= grid.time_periods
    ):
        report.append(f"t_i out of range [0, {grid.time_periods})")
    if row["y_lo"] is not None and (row["y_lo"] < 0 or row["y_hi"] >= grid.height):
        report.append(f"y_i out of range [0, {grid.height})")
    if row["x_lo"] is not None and (row["x_lo"] < 0 or row["x_hi"] >= grid.width):
        report.append(f"x_i out of range [0, {grid.width})")
    if row["bad_x"]:
        report.append(f"{row['bad_x']} cells with x != center(x_i)")
    if row["bad_y"]:
        report.append(f"{row['bad_y']} cells with y != center(y_i)")
    return report


def assert_cube(cube: DataFrame, grid: CubeGrid) -> DataFrame:
    """assert_cube (verify.py:14-30): raise on an invalid cube."""
    report = verify_cube(cube, grid)
    if report:
        raise ValueError("not a valid cube: " + "; ".join(report))
    return cube


def read_with_fill(
    cube: DataFrame,
    grid: CubeGrid,
    fill_values: "dict[str, float] | None" = None,
) -> DataFrame:
    """Re-densify a pruned cube at read time — the fill-value contract
    of SURVEY §4: empty chunks are never materialized (prune_dataset
    deletes them, Zarr serves fill_value for absent chunks at
    chunk.py:49-86 / cli/prune.py:54); a reader that needs the dense
    grid joins the synthesized cell table and COALESCEs the fill.

    The dense side is a narrow spark.range projection (no IO) and the
    join keys match the cells layout, so the stored side streams
    without an extra shuffle; fill defaults to NULL (NaN-as-missing
    stays NULL per the engine's NaN policy)."""
    from xcube_spark.cube.new import new_cube

    vars_ = var_names(cube)
    fills = fill_values or {}
    dense = new_cube(cube.sparkSession, grid, variables={})
    joined = dense.join(
        cube.select("t_i", "y_i", "x_i", *vars_),
        on=["t_i", "y_i", "x_i"],
        how="left",
    )
    out_cols = [F.col(c) for c in ("t_i", "y_i", "x_i", "time", "y", "x")]
    for v in vars_:
        c = F.col(v)
        if v in fills:
            c = F.coalesce(c, F.lit(fills[v]))
        out_cols.append(c.alias(v))
    return joined.select(*out_cols)
