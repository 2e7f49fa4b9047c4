"""Streaming granule ingest — the reference's gen loop (watch inputs,
append each arriving granule to the cube; core/gen/gen.py:40-100)
restated over Structured Streaming + the kerchunk virtualization
layer.

A file stream watches a directory for new netCDF-4 granules; each
micro-batch scans ONLY the new files (distributed HDF5 metadata
parse, sources/virtualize.py) and merges their chunk references into
a persistent scan-state parquet, then re-assembles the combined
kerchunk refs document.  The virtual cube therefore grows
incrementally — no data bytes are ever copied, re-read or shuffled;
ingest cost is O(new granule metadata) per batch regardless of
archive size.

Exactly-once: the streaming checkpoint dedups batch delivery, and the
scan-state append is made idempotent by anti-joining already-ingested
paths, so a replayed batch is a no-op (same discipline as the
incremental-dedup sink's replay guard)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from xcube_spark.sources.virtualize import (_SCAN_SCHEMA, assemble_refs,
                                            scan_netcdf4_granules)


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, "granule_scan")


def read_granule_state(spark: SparkSession, state_dir: str) -> DataFrame:
    p = _state_path(state_dir)
    if not os.path.exists(p):
        return spark.createDataFrame([], _SCAN_SCHEMA)
    return spark.read.parquet(p)


def run_granule_ingest_stream(
    spark: SparkSession,
    watch_dir: str,
    refs_path: str,
    state_dir: str,
    checkpoint_path: str,
    var_names: list[str] | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Watch ``watch_dir`` for new ``*.nc`` granules and maintain the
    combined kerchunk refs at ``refs_path`` incrementally.

    The file source emits (path, mtime) rows only — content is never
    loaded by the stream itself; the per-batch scan reads just the new
    files' HDF5 metadata, executor-side."""
    files = (
        spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, "
                "length LONG, content BINARY")
        .option("pathGlobFilter", "*.nc")
        .load(watch_dir)
        .select("path", "modificationTime")
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        paths = [r["path"].removeprefix("file:")
                 for r in batch_df.select("path").collect()]
        if not paths:
            return
        state = read_granule_state(spark, state_dir)
        seen = {r["path"] for r in
                state.select("path").distinct().collect()}
        new = [p for p in paths if p not in seen]
        if new:  # replay of a committed batch -> no-op
            scan_netcdf4_granules(spark, new, var_names) \
                .write.mode("append").parquet(_state_path(state_dir))
        rows = read_granule_state(spark, state_dir).collect()
        assemble_refs(rows, refs_path)

    writer = (
        files.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
