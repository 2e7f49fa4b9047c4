"""Physical cube layout — SURVEY §4 custom work item 1.

``write_cube_layout`` materializes a cells table the way a 100 TB cube
must be stored for pruning to match Zarr-chunk selectivity:

- **partition by coarse time** (``t_part = t_i div k``): time-range
  predicates prune whole directories before listing;
- **range-repartition + sort by (y_i, x_i)** within each time
  partition: every parquet file covers a narrow y-band (and is sorted
  by x within it), so bbox predicates skip files and row groups via
  footer min/max stats — the parquet analog of spatial z-ordering (a
  true Morton key adds little for band-shaped scans and costs a bit
  shuffle; the y-band layout is what the reference's chunking gives).

At read time ``open_cube_layout`` restores the plain cells frame; the
pruning is Catalyst's job (tests/test_plans.py pins PartitionFilters +
PushedFilters; tests/test_sources.py checks the footer stats really
are narrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid


def write_cube_layout(
    cube: DataFrame,
    path: str,
    grid: CubeGrid,
    time_partition_size: int | None = None,
    files_per_partition: int = 8,
    mode: str = "error",
) -> None:
    """Write ``cube`` with the pruning-friendly layout.

    ``time_partition_size`` defaults to the grid's time chunk;
    ``files_per_partition`` controls the y-band count (one file per
    band per time partition) — size it so a band is ~100-500 MB at the
    target scale."""
    k = time_partition_size or grid.chunks[0]
    keyed = cube.withColumn(
        "t_part", (F.col("t_i") / F.lit(k)).cast("int")
    )
    banded = (
        keyed.repartitionByRange(
            max(1, files_per_partition), "t_part", F.col("y_i")
        )
        .sortWithinPartitions("t_part", "y_i", "x_i")
    )
    banded.write.mode(mode).partitionBy("t_part").parquet(path)


def open_cube_layout(spark: SparkSession, path: str) -> DataFrame:
    """Open a laid-out cube; drops the physical partition column."""
    return spark.read.parquet(path).drop("t_part")


def write_bucketed_table(
    df,
    table: str,
    bucket_col: str = "doc_id",
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a BUCKETED managed table — the layout
    that elides the shuffle on every subsequent equi-join or
    aggregation keyed by ``bucket_col``.

    This is the storage contract behind the incremental-pipeline
    claims (dedup state merges, doc_id joins in the curation chain):
    two tables bucketed the same way join with ZERO exchanges — at
    100 TB that's the difference between re-shuffling the corpus per
    batch and a bucket-local merge.  Spark's bucketing is hash(col) %
    n_buckets recorded in the catalog; pick n_buckets ~ cluster cores
    x small constant and keep it STABLE across writes (a mismatch
    forces a shuffle back in).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
