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
incremental-dedup sink's replay guard).

Bad-granule isolation: a granule that fails to parse, or whose
grid/codec/chunking is incompatible with the already-committed state,
is QUARANTINED (recorded under ``state_dir/quarantine`` with the
error) *before* anything is appended to the scan state — one bad file
can neither wedge the stream nor poison the persisted state into a
permanently-failing assemble."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from xcube_spark.sources.virtualize import (_SCAN_SCHEMA, assemble_refs,
                                            scan_netcdf4_granules,
                                            validate_scan_rows)


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, "granule_scan")


def _quarantine_path(state_dir: str) -> str:
    return os.path.join(state_dir, "quarantine")


def read_granule_state(spark: SparkSession, state_dir: str) -> DataFrame:
    p = _state_path(state_dir)
    if not os.path.exists(p):
        return spark.createDataFrame([], _SCAN_SCHEMA)
    return spark.read.parquet(p)


def read_granule_quarantine(spark: SparkSession,
                            state_dir: str) -> DataFrame:
    """Quarantined granules: (path, error, batch_id)."""
    p = _quarantine_path(state_dir)
    if not os.path.exists(p):
        return spark.createDataFrame(
            [], "path STRING, error STRING, batch_id LONG")
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
        # ONE state collect per batch (metadata-sized rows): reused for
        # the replay guard, the validation base and the final assemble.
        state_rows = read_granule_state(spark, state_dir).collect()
        seen = {r["path"] for r in state_rows}
        new = sorted(p for p in set(paths) if p not in seen)
        accepted: list = []
        rejected: list[tuple[str, str]] = []
        if new:  # empty -> replay of a committed batch -> no-op
            scanned = scan_netcdf4_granules(
                spark, new, var_names, capture_errors=True).collect()
            by_path: dict[str, list] = {}
            for r in scanned:
                by_path.setdefault(r["path"], []).append(r)
            # validate each granule against committed state + the
            # batch's already-accepted granules BEFORE persisting, so
            # an incompatible file is quarantined instead of poisoning
            # the scan state into a permanently-failing assemble.
            base = list(state_rows)
            for p in new:
                rows_p = by_path.get(p, [])
                err = next((r["info"] for r in rows_p
                            if r["kind"] == "error"), None)
                if err is None:
                    try:
                        validate_scan_rows(base + rows_p)
                    except ValueError as e:
                        err = str(e)
                if err is not None:
                    rejected.append((p, err))
                    continue
                base += rows_p
                accepted.extend(rows_p)
            if accepted:
                spark.createDataFrame(accepted, _SCAN_SCHEMA) \
                    .coalesce(1) \
                    .write.mode("append").parquet(_state_path(state_dir))
            if rejected:
                spark.createDataFrame(
                    [(p, e, batch_id) for p, e in rejected],
                    "path STRING, error STRING, batch_id LONG",
                ).coalesce(1).write.mode("append") \
                    .parquet(_quarantine_path(state_dir))
        have = state_rows + accepted
        if have and (accepted or not os.path.exists(refs_path)):
            assemble_refs(have, refs_path)

    writer = (
        files.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
