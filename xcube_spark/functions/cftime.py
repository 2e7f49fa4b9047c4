"""CF non-standard calendar decode — the reference handles cftime axes
(xcube/core/new.py:142-160 cftime fixtures, select.py:202-213
non-standard-calendar label selection) through the cftime package.

The cells model uses TimestampType, so the non-standard calendars
decode with pure Column math into proleptic-Gregorian timestamps:

- ``standard`` / ``proleptic_gregorian`` / ``gregorian``: plain
  epoch + value x unit seconds;
- ``noleap`` / ``365_day``: every year 365 days — (year, month, day)
  computed from fixed month lengths, all results are valid Gregorian
  dates;
- ``360_day``: every month 30 days — day 29/30 of February does not
  exist in the Gregorian calendar and is **clamped to Feb 28** (a
  documented lossy mapping; the reference keeps cftime objects, which
  TimestampType cannot represent);
- ``all_leap`` / ``366_day``: every year 366 days (February always
  29); Feb 29 of a Gregorian non-leap year clamps to Feb 28;
- ``julian``: the proleptic Julian calendar — leap every 4th year, no
  century rule.  Decoding is LABEL-preserving (like cftime/xarray
  comparisons, which order by Y-M-D labels): Julian-calendar
  (year, month, day) labels map to the same Gregorian labels, with
  Feb 29 of Julian-only leap years (1900, 2100, ...) clamped to
  Feb 28.

All arithmetic is Column expressions (no UDF): the CASE chain over 12
cumulative month lengths folds into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from xcube_spark.sources.zarrio import parse_time_units

_NOLEAP_CUM = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]
_ALLLEAP_CUM = [0, 31, 60, 91, 121, 152, 182, 213, 244, 274, 305, 335]

_STANDARD = {"standard", "gregorian", "proleptic_gregorian", "", None}


def _greg_leap(year: Column) -> Column:
    """Gregorian leap-year predicate as a Column."""
    return ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)


def _epoch_ymd(units: str) -> tuple[int, int, int, float]:
    """Epoch date components straight from the units string (the epoch
    is a date **in the model calendar**, so it must not be converted
    through real-calendar timestamps)."""
    import re

    m = re.search(r"since\s+(\d{1,4})-(\d{1,2})-(\d{1,2})"
                  r"(?:[T ](\d{1,2}):(\d{2})(?::(\d{2}(?:\.\d+)?))?)?",
                  units)
    if not m:
        raise ValueError(f"unsupported CF time units {units!r}")
    secs = (int(m.group(4) or 0) * 3600 + int(m.group(5) or 0) * 60
            + float(m.group(6) or 0.0))
    return int(m.group(1)), int(m.group(2)), int(m.group(3)), secs


def decode_cf_time(value: Column, units: str,
                   calendar: str | None = None) -> Column:
    """Numeric CF time -> TimestampType for the given calendar."""
    cal = (calendar or "standard").lower()
    if cal in _STANDARD:
        epoch, per_unit = parse_time_units(units)
        return F.timestamp_seconds(F.lit(epoch) + value * F.lit(per_unit))
    if cal in ("noleap", "365_day"):
        return _fixed_year_decode(value, units, year_days=365,
                                  month_cum=_NOLEAP_CUM)
    if cal == "360_day":
        return _fixed_year_decode(value, units, year_days=360,
                                  month_cum=[30 * i for i in range(12)])
    if cal in ("all_leap", "366_day"):
        return _fixed_year_decode(value, units, year_days=366,
                                  month_cum=_ALLLEAP_CUM)
    if cal == "julian":
        return _julian_decode(value, units)
    raise ValueError(f"unsupported CF calendar {calendar!r}")


def _fixed_year_decode(value: Column, units: str, year_days: int,
                       month_cum: list[int]) -> Column:
    _, per_unit = parse_time_units(units)  # validates the unit word
    y0, m0, d0, s0 = _epoch_ymd(units)
    ep_days = y0 * year_days + month_cum[m0 - 1] + (d0 - 1)

    total = (F.lit(float(ep_days)) + F.lit(s0 / 86400.0)
             + value * F.lit(per_unit / 86400.0))
    day = F.floor(total).cast("long")
    day_secs = F.round((total - day) * F.lit(86400.0)).cast("long")
    # values within float noise below midnight round to 86400 — carry
    # into the day so make_timestamp never sees hour 24
    day = day + F.floor(day_secs / 86400).cast("long")
    day_secs = F.pmod(day_secs, F.lit(86400))

    year = F.floor(day / year_days).cast("int")
    doy = (day - year.cast("long") * year_days).cast("int")

    # month = 1 + |{m in 2..12 : doy >= cum[m-1]}| — a LINEAR sum of
    # comparisons, each referencing doy once.  The former CASE chain
    # was also linear, but _cum_expr(month) then re-inlined the whole
    # month tree once per WHEN arm and every later reference inlined
    # again — the expression tree grew multiplicatively and a 4-
    # calendar projection took ~15 s to ANALYZE and another ~15 s to
    # compile (r12 optimization round; the round-5 "materialize
    # between stages" lesson, solved here inside one Column).
    month = _month_from_doy(doy, month_cum)
    dom = doy - _cum_lookup(month, month_cum) + 1
    if year_days == 360:  # Feb 29/30 have no Gregorian image
        dom = F.when(month == 2, F.least(dom, F.lit(28))).otherwise(dom)
    if year_days == 366:  # Feb 29 only exists in Gregorian leap years
        dom = F.when((month == 2) & (dom == 29) & ~_greg_leap(year),
                     F.lit(28)).otherwise(dom)
    ts = F.make_timestamp(
        year, month, dom,
        (day_secs / 3600).cast("int"),
        ((day_secs % 3600) / 60).cast("int"),
        (day_secs % 60).cast("double"),
    )
    return ts


def _julian_days_before_year(year: int) -> int:
    """Days in Julian-calendar years [0, year): 365/year + one leap day
    per multiple of 4 (proleptic, year 0 leap)."""
    return 365 * year + (year + 3) // 4


def _julian_decode(value: Column, units: str) -> Column:
    """Proleptic-Julian calendar decode: quadrennium arithmetic (1461
    days per 4 years, the leap year first), then the leap-aware month
    CASE chain — all Column math."""
    _, per_unit = parse_time_units(units)
    y0, m0, d0, s0 = _epoch_ymd(units)
    ep_leap = y0 % 4 == 0
    ep_days = (_julian_days_before_year(y0) + _NOLEAP_CUM[m0 - 1]
               + (1 if ep_leap and m0 > 2 else 0) + (d0 - 1))

    total = (F.lit(float(ep_days)) + F.lit(s0 / 86400.0)
             + value * F.lit(per_unit / 86400.0))
    day = F.floor(total).cast("long")
    day_secs = F.round((total - day) * F.lit(86400.0)).cast("long")
    # values within float noise below midnight round to 86400 — carry
    # into the day so make_timestamp never sees hour 24
    day = day + F.floor(day_secs / 86400).cast("long")
    day_secs = F.pmod(day_secs, F.lit(86400))

    quad = F.floor(day / 1461).cast("long")
    r = (day - quad * 1461).cast("int")  # 0..1460; year 0 of quad leap
    a = F.when(r < 366, F.lit(0)) \
        .otherwise(F.lit(1) + F.floor((r - 366) / 365).cast("int"))
    year = (quad * 4 + a).cast("int")
    is_leap = a == 0
    doy = F.when(is_leap, r).otherwise(r - 366 - (a - 1) * 365)

    # leap-aware month: cum[m] gains 1 for months after February —
    # same linear-growth construction as _fixed_year_decode (see the
    # expression-tree note there)
    leap1 = F.when(is_leap, F.lit(1)).otherwise(F.lit(0))
    month = _month_from_doy(doy, _NOLEAP_CUM, leap1=leap1)
    cum_m = _cum_lookup(month, _NOLEAP_CUM) + F.when(
        is_leap & (month > 2), F.lit(1)).otherwise(F.lit(0))
    dom = doy - cum_m + 1
    # Feb 29 of a Julian-only leap year (e.g. 1900) has no Gregorian
    # image -> clamp (documented lossy label mapping)
    dom = F.when((month == 2) & (dom == 29) & ~_greg_leap(year),
                 F.lit(28)).otherwise(dom)
    return F.make_timestamp(
        year, month, dom,
        (day_secs / 3600).cast("int"),
        ((day_secs % 3600) / 60).cast("int"),
        (day_secs % 60).cast("double"),
    )


def _month_from_doy(doy: Column, month_cum: list[int],
                    leap1: Column | None = None) -> Column:
    """month = 1 + count of months m in 2..12 with doy >= cum[m-1]
    (cum strictly increasing) — equivalent to the highest-cum-wins
    CASE chain but every comparison references ``doy`` exactly once,
    so the tree grows linearly.  ``leap1`` (0/1) shifts the cum of
    every month after February (Julian leap years)."""
    month = F.lit(1)
    for m in range(2, 13):
        cum = F.lit(month_cum[m - 1])
        if leap1 is not None and m > 2:
            cum = cum + leap1
        month = month + (doy >= cum).cast("int")
    return month


def _cum_lookup(month: Column, month_cum: list[int]) -> Column:
    """cum[month-1] via element_at over a 12-literal array — the
    ``month`` subtree is referenced ONCE (the former per-month CASE
    chain inlined it once per arm)."""
    return F.element_at(
        F.array(*[F.lit(c) for c in month_cum]), month)


# ---------------------------------------------------------------------------
# DataFrame-staged decode (r13): the Column API above builds ONE
# expression per timestamp, in which day/doy/month subtrees are
# re-inlined at every reference — linear per reference, but a
# 4-calendar projection still totals ~10^3 nodes per column and pays
# a multi-second one-time codegen compile.  Staging the same
# arithmetic through NAMED intermediate columns keeps every subtree
# written once: CollapseProject will not re-inline a non-trivial
# alias that is referenced more than once, so the optimized plan
# stays linear end to end.  The expressions are IDENTICAL — only the
# plan representation changes — pinned bit-exact by
# tests/test_opt_r13.py against the Column API.


def decode_cf_time_staged(df, value_col: str, out_col: str, units: str,
                          calendar: str | None = None):
    """``df.withColumn(out_col, decode_cf_time(value_col, ...))`` with
    the decode staged through materialized intermediate columns (all
    dropped from the result).  Use for multi-calendar projections;
    single-calendar ingest axes are fine on the Column API."""
    cal = (calendar or "standard").lower()
    val = F.col(value_col)
    if cal in _STANDARD:
        return df.withColumn(
            out_col, decode_cf_time(val, units, calendar))
    if cal in ("noleap", "365_day"):
        return _fixed_year_staged(df, val, out_col, units, 365,
                                  _NOLEAP_CUM)
    if cal == "360_day":
        return _fixed_year_staged(df, val, out_col, units, 360,
                                  [30 * i for i in range(12)])
    if cal in ("all_leap", "366_day"):
        return _fixed_year_staged(df, val, out_col, units, 366,
                                  _ALLLEAP_CUM)
    if cal == "julian":
        return _julian_staged(df, val, out_col, units)
    raise ValueError(f"unsupported CF calendar {calendar!r}")


def _day_split_staged(df, total_expr: Column, c) -> "DataFrame":
    """Shared day/second split: total -> (day, secs) columns, same
    carry arithmetic as the Column decoders."""
    df = df.withColumn(c("total"), total_expr)
    total = F.col(c("total"))
    day0 = F.floor(total).cast("long")
    df = df.withColumns({
        c("day0"): day0,
        c("ds0"): F.round((total - day0) * F.lit(86400.0)).cast("long"),
    })
    return df.withColumns({
        c("day"): (F.col(c("day0"))
                   + F.floor(F.col(c("ds0")) / 86400).cast("long")),
        c("secs"): F.pmod(F.col(c("ds0")), F.lit(86400)),
    }).drop(c("total"), c("day0"), c("ds0"))


def _staged_ts(df, c, out_col: str, year, month, dom):
    secs = F.col(c("secs"))
    ts = F.make_timestamp(
        year, month, dom,
        (secs / 3600).cast("int"),
        ((secs % 3600) / 60).cast("int"),
        (secs % 60).cast("double"),
    )
    return df.withColumn(out_col, ts)


def _fixed_year_staged(df, value: Column, out_col: str, units: str,
                       year_days: int, month_cum: list[int]):
    _, per_unit = parse_time_units(units)
    y0, m0, d0, s0 = _epoch_ymd(units)
    ep_days = y0 * year_days + month_cum[m0 - 1] + (d0 - 1)

    def c(s: str) -> str:
        return f"__{out_col}_{s}"

    df = _day_split_staged(
        df,
        (F.lit(float(ep_days)) + F.lit(s0 / 86400.0)
         + value * F.lit(per_unit / 86400.0)),
        c)
    day = F.col(c("day"))
    df = df.withColumn(c("year"), F.floor(day / year_days).cast("int"))
    df = df.withColumn(
        c("doy"),
        (day - F.col(c("year")).cast("long") * year_days).cast("int"))
    df = df.withColumn(
        c("month"), _month_from_doy(F.col(c("doy")), month_cum))
    year, month = F.col(c("year")), F.col(c("month"))
    dom = F.col(c("doy")) - _cum_lookup(month, month_cum) + 1
    if year_days == 360:  # Feb 29/30 have no Gregorian image
        dom = F.when(month == 2, F.least(dom, F.lit(28))).otherwise(dom)
    if year_days == 366:  # Feb 29 only exists in Gregorian leap years
        dom = F.when((month == 2) & (dom == 29) & ~_greg_leap(year),
                     F.lit(28)).otherwise(dom)
    df = _staged_ts(df, c, out_col, year, month, dom)
    return df.drop(c("day"), c("secs"), c("year"), c("doy"), c("month"))


def _julian_staged(df, value: Column, out_col: str, units: str):
    _, per_unit = parse_time_units(units)
    y0, m0, d0, s0 = _epoch_ymd(units)
    ep_leap = y0 % 4 == 0
    ep_days = (_julian_days_before_year(y0) + _NOLEAP_CUM[m0 - 1]
               + (1 if ep_leap and m0 > 2 else 0) + (d0 - 1))

    def c(s: str) -> str:
        return f"__{out_col}_{s}"

    df = _day_split_staged(
        df,
        (F.lit(float(ep_days)) + F.lit(s0 / 86400.0)
         + value * F.lit(per_unit / 86400.0)),
        c)
    day = F.col(c("day"))
    df = df.withColumn(c("quad"), F.floor(day / 1461).cast("long"))
    df = df.withColumn(
        c("r"), (day - F.col(c("quad")) * 1461).cast("int"))
    r = F.col(c("r"))
    df = df.withColumn(
        c("a"),
        F.when(r < 366, F.lit(0))
        .otherwise(F.lit(1) + F.floor((r - 366) / 365).cast("int")))
    a = F.col(c("a"))
    df = df.withColumns({
        c("year"): (F.col(c("quad")) * 4 + a).cast("int"),
        c("doy"): F.when(a == 0, r).otherwise(r - 366 - (a - 1) * 365),
        c("lp"): F.when(a == 0, F.lit(1)).otherwise(F.lit(0)),
    })
    df = df.withColumn(
        c("month"),
        _month_from_doy(F.col(c("doy")), _NOLEAP_CUM,
                        leap1=F.col(c("lp"))))
    year, month = F.col(c("year")), F.col(c("month"))
    is_leap = F.col(c("lp")) == 1
    cum_m = _cum_lookup(month, _NOLEAP_CUM) + F.when(
        is_leap & (month > 2), F.lit(1)).otherwise(F.lit(0))
    dom = F.col(c("doy")) - cum_m + 1
    dom = F.when((month == 2) & (dom == 29) & ~_greg_leap(year),
                 F.lit(28)).otherwise(dom)
    df = _staged_ts(df, c, out_col, year, month, dom)
    return df.drop(c("day"), c("secs"), c("quad"), c("r"), c("a"),
                   c("year"), c("doy"), c("lp"), c("month"))
