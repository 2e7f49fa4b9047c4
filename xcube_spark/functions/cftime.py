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
  TimestampType cannot represent).

All arithmetic is Column expressions (no UDF): the CASE chain over 12
cumulative month lengths folds into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from xcube_spark.sources.zarrio import parse_time_units

_NOLEAP_CUM = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]

_STANDARD = {"standard", "gregorian", "proleptic_gregorian", "", None}


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

    year = F.floor(day / year_days).cast("int")
    doy = (day - year.cast("long") * year_days).cast("int")

    month = F.lit(1)
    for m in range(2, 13):  # CASE chain: highest cum <= doy wins
        month = F.when(doy >= F.lit(month_cum[m - 1]), F.lit(m)) \
            .otherwise(month)
    dom = doy - _cum_expr(month, month_cum) + 1
    if year_days == 360:  # Feb 29/30 have no Gregorian image
        dom = F.when(month == 2, F.least(dom, F.lit(28))).otherwise(dom)
    ts = F.make_timestamp(
        year, month, dom,
        (day_secs / 3600).cast("int"),
        ((day_secs % 3600) / 60).cast("int"),
        (day_secs % 60).cast("double"),
    )
    return ts


def _cum_expr(month: Column, month_cum: list[int]) -> Column:
    out = F.lit(month_cum[0])
    for m in range(2, 13):
        out = F.when(month == m, F.lit(month_cum[m - 1])).otherwise(out)
    return out
