"""Streaming cube maintenance — the reference's incremental time-slice
append (xcube/core/timeslice.py:62-131) as a Structured Streaming sink.

``append_stream_to_cube``: every micro-batch of cells is appended to a
parquet cube partitioned by ``t_i`` via ``foreachBatch`` —
new time slices become new partitions, replacements rewrite only the
touched partitions (dynamic partition overwrite), and exactly-once
comes from the checkpointed batch id.  This is the gen1 per-input loop
(append/insert time slice per arriving granule, gen.py:40-100) with
the scheduler replaced by the streaming engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from xcube_spark.sources.timeslice import update_time_slice


def append_stream_to_cube(
    cells_stream: DataFrame,
    cube_path: str,
    checkpoint_path: str,
    mode: str = "append",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Write a stream of cube cells into a t_i-partitioned parquet cube.

    ``mode='append'`` adds slices (new partitions); ``'replace'``
    rewrites the partitions present in each micro-batch (the
    replace/update_time_slice semantics).  Each batch is one atomic
    partition-level commit; the checkpoint makes redelivery idempotent
    at the batch level."""
    if mode not in ("append", "replace"):
        raise ValueError(f"mode must be append|replace, got {mode!r}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        update_time_slice(batch_df.sparkSession, cube_path, batch_df,
                          mode=mode)

    writer = (
        cells_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
