"""Interval (range) joins — points x intervals without a cartesian.

No xcube counterpart (driver-mandated pipeline extension, the batch
sibling of ``streaming/events.py:stream_stream_interval_join``): an
interval join attaches, to every point row, each interval row whose
``[start, end)`` range contains the point's timestamp — sessionized
attribution, outage windows, promo periods.

Physical strategy — the BINNED range join, NOT a theta join:

1. pick a bucket width (caller-supplied, or 2x the mean interval
   length from one tiny stats job over the interval side);
2. explode every interval into the buckets its range spans
   (``sequence(bucket(start), bucket(end))`` — fan-out is
   ceil(len/width) + 1, ~1-2 for width ~ interval length);
3. each point maps to exactly ONE bucket, so the bucket equi-join
   emits every qualifying (point, interval) pair exactly once — no
   dedup pass — and the range predicate refines the bucket matches.

Catalyst plans the bucket key as a plain equi-join (broadcast when the
exploded interval side is small, sort-merge otherwise, AQE skew-split
on hot buckets) — a naive ``p.ts BETWEEN i.s AND i.e`` join has no
equi-key and degenerates to BroadcastNestedLoopJoin, |P| x |I| work;
the binned form shuffles each side once by bucket and compares only
ranges that share a bucket, which is the difference between hours and
minutes at 100 TB.  Bucketing is monotone in the timestamp, so the
floor-of-division rounding shape cannot lose pairs (a point's bucket
always lies within its covering interval's exploded span).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]

#: auto-width fan-out cap: no interval may explode into more than this
#: many buckets (Spark's sequence() allows MAX_ROUNDED_ARRAY_LENGTH
#: ~= 2^31-15 entries but anything near that is a memory bomb; 1024
#: keeps the worst row's explode output trivially small while leaving
#: the common-case width at 2x the mean)
_MAX_FANOUT = 1024

#: Spark's hard sequence()-entries ceiling (ArrayData
#: MAX_ROUNDED_ARRAY_LENGTH) — explicit widths are validated against
#: it so a skewed interval fails fast with a named cause
_SEQUENCE_LIMIT = (1 << 31) - 15


def _us(col: Column) -> Column:
    """Event-time micros (full precision — RANGE-style comparisons at
    second granularity silently merge sub-second neighbors)."""
    return F.unix_micros(col.cast("timestamp_ltz"))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bucket_seconds: float | None = None,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner-join ``points`` to every ``intervals`` row whose
    ``[start_col, end_col)`` range (``[..]`` when ``end_inclusive``)
    contains the point's ``ts_col``.  Column names of the two inputs
    must be disjoint (rename before calling, as with any Spark join).

    ``bucket_seconds`` sets the bin width; when omitted, one tiny
    aggregate over the interval side picks 2x the mean interval
    length (a stats job over the SMALL side only — never the points),
    floored so that even the LONGEST interval explodes into at most
    ``_MAX_FANOUT`` buckets: a mean-only width is skew-fragile — a
    single long-tail interval would fan out len/width sequence
    elements, and Spark's ``sequence()`` hard-errors past its
    max-entries limit, failing the whole job on otherwise-valid data.
    A wider bucket only adds refinement comparisons, never wrong
    pairs.  An explicit ``bucket_seconds`` is still fan-out-checked:
    a width that would explode any interval past Spark's sequence
    limit raises a ValueError naming the offending length up front
    rather than failing mid-shuffle with an opaque error.
    """
    p_us = _us(F.col(ts_col))
    s_us = _us(F.col(start_col))
    e_us = _us(F.col(end_col))

    if bucket_seconds is None:
        mean_len, max_len = intervals.agg(
            F.avg(_us(F.col(end_col)) - _us(F.col(start_col))),
            F.max(_us(F.col(end_col)) - _us(F.col(start_col))),
        ).first()
        w_us = max(
            1,
            int(2 * (mean_len or 1_000_000.0)),
            -(-int(max_len or 0) // _MAX_FANOUT),  # ceil division
        )
    else:
        if bucket_seconds <= 0:
            raise ValueError("bucket_seconds must be positive")
        w_us = max(1, int(bucket_seconds * 1_000_000))
        max_len = intervals.agg(
            F.max(_us(F.col(end_col)) - _us(F.col(start_col)))
        ).first()[0]
        fanout = (int(max_len or 0) // w_us) + 2
        if fanout > _SEQUENCE_LIMIT:
            raise ValueError(
                f"bucket_seconds={bucket_seconds} would explode a "
                f"{int(max_len) / 1e6:.0f}s interval into ~{fanout} "
                f"buckets (> Spark's sequence limit "
                f"{_SEQUENCE_LIMIT}); widen the bucket or pass "
                f"bucket_seconds=None for the auto fan-out cap"
            )

    w = F.lit(float(w_us))
    iv = intervals.withColumn(
        "__ib",
        F.explode(F.sequence(F.floor(s_us / w).cast("long"),
                             F.floor(e_us / w).cast("long"))),
    )
    pt = points.withColumn("__pb", F.floor(p_us / w).cast("long"))

    upper = (F.col(ts_col) <= F.col(end_col)) if end_inclusive \
        else (F.col(ts_col) < F.col(end_col))
    cond = (
        (pt["__pb"] == iv["__ib"])
        & (F.col(ts_col) >= F.col(start_col))
        & upper
    )
    return pt.join(iv, cond, "inner").drop("__pb", "__ib")
