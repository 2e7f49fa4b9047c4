"""Time-slice maintenance — xcube/core/timeslice.py:19-190.

The reference maintains a stored Zarr cube incrementally: find the
insert position for a new time slice, then append / insert / replace /
update it in place.  The Spark-native equivalents operate at two
levels:

- **logical** (DataFrame -> DataFrame): pure plan combinators
  (UNION ALL + anti-join for replace, index shifting for insert) —
  composable, testable, oracle-checkable;
- **physical** (parquet dataset partitioned by ``t_i``): dynamic
  partition overwrite — only the touched time-slice partitions are
  rewritten, the append/MERGE story from SURVEY §2.1.  On Delta/Iceberg
  this is `MERGE INTO`; plain parquet gets the same effect via
  ``partitionOverwriteMode=dynamic``.

A time slice is a cells DataFrame with a single distinct ``t_i``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def find_time_slice(cube: DataFrame, time_value) -> tuple[int, str]:
    """Insert position of ``time_value`` (timeslice.py:19-60): returns
    (t_i, mode) with mode 'append' | 'insert' | 'replace'.

    One tiny agg over the distinct time axis (driver-side result is a
    scalar pair — the axis is metadata-sized, not data-sized)."""
    axis = cube.select("t_i", "time").distinct()
    t = F.lit(time_value).cast("timestamp")
    row = axis.agg(
        F.max(F.when(F.col("time") < t, F.col("t_i"))).alias("before"),
        F.min(F.when(F.col("time") > t, F.col("t_i"))).alias("after"),
        F.max(F.when(F.col("time") == t, F.col("t_i"))).alias("exact"),
        F.max("t_i").alias("last"),
    ).collect()[0]
    if row["exact"] is not None:
        return int(row["exact"]), "replace"
    if row["last"] is None:  # empty cube: first slice appends at 0
        return 0, "append"
    if row["after"] is None:
        return int(row["last"]) + 1, "append"
    return int(row["after"]), "insert"


def append_time_slice(cube: DataFrame, ts_slice: DataFrame) -> DataFrame:
    """timeslice.py:62-93 — logical append along time (UNION ALL; the
    t_i of the slice must follow the cube's last index)."""
    return cube.unionByName(ts_slice)


def insert_time_slice(cube: DataFrame, ts_slice: DataFrame,
                      t_i: int) -> DataFrame:
    """timeslice.py:94-112 — insert at position ``t_i``: existing slices
    at >= t_i shift up by one (pure Column arithmetic, no data motion
    until write)."""
    shifted = cube.withColumn(
        "t_i",
        F.when(F.col("t_i") >= t_i, F.col("t_i") + 1).otherwise(F.col("t_i")),
    )
    return shifted.unionByName(ts_slice.withColumn("t_i", F.lit(t_i)))


def replace_time_slice(cube: DataFrame, ts_slice: DataFrame,
                       t_i: int) -> DataFrame:
    """timeslice.py:113-131 — replace slice ``t_i``: drop the old rows,
    union the new (the MERGE WHEN MATCHED shape)."""
    kept = cube.where(F.col("t_i") != t_i)
    return kept.unionByName(ts_slice.withColumn("t_i", F.lit(t_i)))


def update_time_slice(
    spark: SparkSession,
    cube_path: str,
    ts_slice: DataFrame,
    mode: str = "replace",
) -> None:
    """Physical in-place update of a parquet cube partitioned by t_i
    (timeslice.py:132-190): dynamic partition overwrite rewrites only
    the slice's partitions; 'append' adds files without touching
    existing partitions."""
    if mode == "append":
        ts_slice.write.mode("append").partitionBy("t_i").parquet(cube_path)
        return
    if mode != "replace":
        raise ValueError(f"mode must be append|replace, got {mode!r}")
    with _partition_overwrite(spark):
        ts_slice.write.mode("overwrite").partitionBy("t_i").parquet(cube_path)


class _partition_overwrite:
    """Scoped spark.sql.sources.partitionOverwriteMode=dynamic."""

    KEY = "spark.sql.sources.partitionOverwriteMode"

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(self.KEY, "static")
        self.spark.conf.set(self.KEY, "dynamic")

    def __exit__(self, *exc):
        self.spark.conf.set(self.KEY, self.prev)
