"""Subsetting operators — projections and filters.

Re-expresses xcube/core/select.py as DataFrame select/where.  These are
deliberately thin: expressing subsets declaratively is exactly what lets
Catalyst do column pruning and push bbox/time predicates down to the
parquet scan (file/row-group skipping on a (t_i, y_i, x_i)-sorted
layout — SURVEY §4).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xcube_spark.cube.grid import COORD_COLS, DIM_COLS


def select_variables_subset(
    df: DataFrame, var_names: Iterable[str] | None
) -> DataFrame:
    """Keep named data variables + all dim/coord columns.

    Mirrors ``select_variables_subset`` (select.py:66-84) — pure column
    pruning; with parquet this prunes the scan's ReadSchema.
    """
    if var_names is None:
        return df
    keep = [c for c in df.columns if c in set(DIM_COLS) | set(COORD_COLS)]
    missing = [v for v in var_names if v not in df.columns]
    if missing:
        raise KeyError(f"variables not found in cube: {missing}")
    return df.select(*keep, *var_names)


def select_spatial_subset(
    df: DataFrame,
    bbox: Sequence[float] | None = None,
    ij_bbox: Sequence[int] | None = None,
    x_name: str = "x",
    y_name: str = "y",
) -> DataFrame:
    """Bbox subset by coordinate label or by pixel index.

    Mirrors ``select_spatial_subset`` (select.py:87-163): label path
    filters cell centers within [x1,x2]x[y1,y2]; index path filters
    ``x_i/y_i`` within the inclusive ij bbox.  Both are plain range
    predicates -> parquet row-group pruning, no shuffle.
    """
    if (bbox is None) == (ij_bbox is None):
        raise ValueError("exactly one of bbox / ij_bbox must be given")
    if bbox is not None:
        x1, y1, x2, y2 = bbox
        if x1 > x2:
            # anti-meridian crossing (the reference's
            # get_box_split_bounds_geometry split, geom.py:573-580):
            # two x ranges OR-ed — still a pushable parquet filter
            x_pred = (F.col(x_name) >= x1) | (F.col(x_name) <= x2)
        else:
            x_pred = F.col(x_name).between(x1, x2)
        return df.where(x_pred & F.col(y_name).between(y1, y2))
    i1, j1, i2, j2 = ij_bbox
    return df.where(
        F.col("x_i").between(i1, i2) & F.col("y_i").between(j1, j2)
    )


def widen_end_date(end: datetime | str) -> datetime:
    """Inclusive end-*date* widening: a date-only upper bound means
    "until the end of that day" (select.py:166-213 widens to midnight+1D)."""
    if isinstance(end, str):
        is_date_only = len(end) <= 10
        end = datetime.fromisoformat(end)
        if is_date_only:
            return end + timedelta(days=1)
        return end
    if (end.hour, end.minute, end.second, end.microsecond) == (0, 0, 0, 0):
        return end + timedelta(days=1)
    return end


def select_temporal_subset(
    df: DataFrame,
    time_range: Sequence[datetime | str | None],
    time_name: str = "time",
) -> DataFrame:
    """Time-range subset with the reference's end-widening rule
    (select.py:166-213): [t1, t2) after widening date-only t2 by one day."""
    t1, t2 = time_range
    cond = None
    if t1 is not None:
        if isinstance(t1, str):
            t1 = datetime.fromisoformat(t1)
        cond = F.col(time_name) >= F.lit(t1)
    if t2 is not None:
        t2w = widen_end_date(t2)
        c2 = F.col(time_name) < F.lit(t2w)
        cond = c2 if cond is None else (cond & c2)
    return df if cond is None else df.where(cond)


def select_subset(
    df: DataFrame,
    var_names: Iterable[str] | None = None,
    bbox: Sequence[float] | None = None,
    time_range: Sequence[datetime | str | None] | None = None,
) -> DataFrame:
    """Facade: variables ∧ bbox ∧ time range (select.py:26-63)."""
    out = select_variables_subset(df, var_names)
    if bbox is not None:
        out = select_spatial_subset(out, bbox=bbox)
    if time_range is not None:
        out = select_temporal_subset(out, time_range)
    return out


def select_label_subset(
    df: DataFrame,
    dim: str,
    predicate: Column,
    keep_if: str = "any",
) -> DataFrame:
    """Drop labels along ``dim`` whose slice fails a per-slice predicate.

    Mirrors ``select_label_subset`` (select.py:221-347), e.g. "drop time
    slices with more than 50% NaN".  ``predicate`` is a per-row boolean
    Column; a label is kept when ``any``/``all``/``none`` of its rows
    satisfy it.  Implemented as a per-label aggregate + left-semi join —
    one shuffle on the (small-cardinality) label key, and the semi join
    broadcasts since the label list is tiny.
    """
    agg = {
        "any": F.max(predicate.cast("int")) == 1,
        "all": F.min(predicate.cast("int")) == 1,
        "none": F.max(predicate.cast("int")) == 0,
    }[keep_if]
    labels = df.groupBy(dim).agg(agg.alias("__keep")).where("__keep").select(dim)
    return df.join(F.broadcast(labels), on=dim, how="left_semi")


def select_nearest_label(
    df: DataFrame,
    dim: str,
    value,
) -> DataFrame:
    """Slice at the label nearest to ``value`` along ``dim`` —
    ``sel(method="nearest")`` (used by timeseries.py:148 and
    webapi/statistics/controllers.py:88-90).

    Resolves the nearest label with a tiny distinct+sort+limit on the
    label column (TakeOrderedAndProject — no full sort), then applies an
    equality filter which can push down.
    """
    lit = F.lit(value)
    target = (
        df.select(dim)
        .distinct()
        .orderBy(F.abs(F.col(dim).cast("double") - lit.cast("double")))
        .limit(1)
        .collect()[0][0]
    )
    return df.where(F.col(dim) == F.lit(target))
