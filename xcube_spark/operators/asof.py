"""As-of joins — time-series point-in-time lookups.

No xcube counterpart (driver-mandated pipeline extension): an as-of
join attaches, to every left row, the latest right row at-or-before
its timestamp (``backward``; ``forward`` = earliest at-or-after),
optionally within a tolerance and per grouping key.  The workhorse of
feature-store / market-data pipelines ("value as of event time").

Physical strategy — the union-window form, NOT a range join:

1. tag both inputs and union them (right rows carry a struct of their
   payload; left columns ride as plain columns, null-filled on right
   rows — only the carried right payload needs the struct);
2. one window per ``by`` key ordered by (ts, tag):
   ``last(struct, ignorenulls)`` carries the most recent right payload
   forward onto each left row;
3. filter back to left rows, expand the struct, apply tolerance.

One shuffle on the ``by`` key (both inputs co-partitioned), sort within
partitions — the sort-merge shape.  A naive ``l.ts >= r.ts`` theta
join explodes to |L|x|R| per key before aggregation; the union-window
is linear in |L|+|R| and never materializes a candidate pair, which is
the difference between hours and minutes at 100 TB.  Skewed keys:
AQE's skew-join split applies to the single shuffle; the window state
is one struct per row regardless of key width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | tuple[str, ...] = (),
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Attach the nearest right row per left row in event time.

    ``on``: timestamp column present in both inputs; ``by``: equality
    keys; ``direction``: 'backward' (latest right.ts <= left.ts) or
    'forward' (earliest right.ts >= left.ts); ``tolerance_seconds``:
    bound on |left.ts - right.ts| — beyond it the right columns are
    null (the row is kept: left join semantics).  Right payload
    columns are renamed with ``suffix`` on collision with left
    columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction!r}")
    by = list(by)
    payload = [c for c in right.columns if c != on and c not in by]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    ts_name = on + suffix if on + suffix not in left.columns else "__asof_ts"

    # left columns ride the union as PLAIN columns (null-filled on the
    # right rows by allowMissingColumns) — no struct pack/unpack for
    # the left side; only the right payload needs the struct, because
    # last(..., ignorenulls) carries exactly one column
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__tag"),
        F.struct(
            F.col(on).alias("__rts"),
            *[F.col(c).alias(out_names[c]) for c in payload],
        ).alias("__r"),
    )
    l = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__tag"),
    )
    # right rows sort before left rows at equal ts (backward joins are
    # at-or-before inclusive); forward runs the mirrored order.
    # Ties among right rows sharing the same (by, ts) are broken by the
    # payload struct itself (struct comparison is field-by-field, so it
    # is a total order over the row): last() then deterministically
    # picks the MAX payload struct — the same winner on every run and
    # partitioning, not whichever row the shuffle happened to order
    # last.  Rule: equal-timestamp right rows resolve to pick-max.
    if direction == "backward":
        order = [F.col(on).asc(), F.col("__tag").asc(), F.col("__r").asc()]
    else:
        order = [F.col(on).desc(), F.col("__tag").asc(), F.col("__r").asc()]
    w = (
        Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    ).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    unioned = r.unionByName(l, allowMissingColumns=True)
    carried = unioned.withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    ).where(F.col("__tag") == 1)

    within = F.lit(True)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col(on).cast("timestamp_ltz").cast("double")
            - F.col("__m.__rts").cast("timestamp_ltz").cast("double")
        )
        within = gap <= F.lit(float(tolerance_seconds))

    matched = F.col("__m").isNotNull() & within
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(
        F.when(matched, F.col("__m.__rts")).alias(ts_name)
    )
    out_cols.extend(
        F.when(matched, F.col(f"__m.{out_names[c]}")).alias(out_names[c])
        for c in payload
    )
    return carried.select(*out_cols)
