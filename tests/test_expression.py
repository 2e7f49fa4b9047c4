"""Expression compiler tests — mirrors the reference's transpiler tests
(xcube/util/expression.py dialect; test/util/test_expression.py style)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from xcube_spark.functions.expression import (
    ExprError,
    compile_expr,
    split_var_assignment,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1.0, 4.0, 0.5, 3), (2.0, 9.0, -0.5, 6), (3.0, 16.0, 0.0, 5)],
        "a double, b double, c double, f int",
    )


def _one(df, expr, **names):
    return df.select(compile_expr(expr, names or None).alias("r")).collect()


def test_arithmetic(df):
    rows = _one(df, "a + b * 2 - c / 0.5")
    assert [r["r"] for r in rows] == [8.0, 21.0, 35.0]


def test_power_and_funcs(df):
    rows = _one(df, "sqrt(b) + power(a, 2)")
    assert [r["r"] for r in rows] == [3.0, 7.0, 13.0]


def test_comparison_chain(df):
    rows = _one(df, "1 <= a < 3")
    assert [r["r"] for r in rows] == [True, True, False]


def test_bool_ops_rewrite(df):
    # and/or/not -> &,|,~ (expression.py:78+ rewrite rules)
    rows = _one(df, "a > 1 and not (b > 10) or c > 0")
    assert [r["r"] for r in rows] == [True, True, False]


def test_where_and_ifexp(df):
    assert [r["r"] for r in _one(df, "where(c > 0, a, b)")] == [1.0, 9.0, 16.0]
    assert [r["r"] for r in _one(df, "a if c > 0 else b")] == [1.0, 9.0, 16.0]


def test_min_max_to_least_greatest(df):
    # min/max -> fmin/fmax -> least/greatest (expression.py:10-41)
    assert [r["r"] for r in _one(df, "min(a, c)")] == [0.5, -0.5, 0.0]
    assert [r["r"] for r in _one(df, "max(a, c)")] == [1.0, 2.0, 3.0]


def test_np_prefix_and_constants(df):
    rows = _one(df, "np.cos(pi) + a")
    assert [round(r["r"], 9) for r in rows] == [0.0, 1.0, 2.0]


def test_bitwise_flags(df):
    rows = _one(df, "(f & 2) != 0")
    assert [r["r"] for r in rows] == [True, True, False]


def test_clip_isnan(df):
    assert [r["r"] for r in _one(df, "clip(c, 0, 1)")] == [0.5, 0.0, 0.0]
    # engine NaN->NULL policy (SURVEY §4): div-by-zero yields NULL (SQL),
    # the relational face of the reference's NaN missing-value
    assert [r["r"] for r in _one(df, "isnull(a / 0 * 0)")] == [True, True, True]
    assert [r["r"] for r in _one(df, "isnan(sqrt(0 - a))")] == [True, True, True]


def test_explicit_namespace(df):
    rows = df.select(
        compile_expr("x * 2", {"x": F.col("a")}).alias("r")
    ).collect()
    assert [r["r"] for r in rows] == [2.0, 4.0, 6.0]


def test_sandbox_rejections():
    for bad in (
        "__import__('os')",
        "a.__class__",
        "open('/etc/passwd')",
        "[x for x in y]",
        "lambda: 1",
        "f'{a}'",
    ):
        with pytest.raises(ExprError):
            compile_expr(bad)


def test_unknown_function():
    with pytest.raises(ExprError, match="unknown function"):
        compile_expr("frobnicate(a)")


def test_split_var_assignment():
    assert split_var_assignment("B = B3 / B4") == ("B", "B3 / B4")
    assert split_var_assignment("B3 / B4") == (None, "B3 / B4")


def test_constant_expr(df):
    rows = _one(df, "2 * pi")
    assert [round(r["r"], 9) for r in rows] == [round(2 * math.pi, 9)] * 3


# ---- CF calendars (functions/cftime.py) --------------------------------


def test_cf_calendar_decode(spark):
    """noleap/360_day decode with pure Column math; 360_day Feb 29/30
    clamp to Feb 28 (documented lossy mapping)."""
    from datetime import datetime

    from xcube_spark.functions.cftime import decode_cf_time

    df = spark.createDataFrame([(0.0,), (59.0,), (364.0,), (365.0,)], ["t"])
    got = {r["t"]: (r["nl"], r["d360"]) for r in df.select(
        "t",
        decode_cf_time(F.col("t"), "days since 2000-01-01",
                       "noleap").alias("nl"),
        decode_cf_time(F.col("t"), "days since 2000-01-01",
                       "360_day").alias("d360"),
    ).collect()}
    assert got[0.0] == (datetime(2000, 1, 1), datetime(2000, 1, 1))
    assert got[59.0] == (datetime(2000, 3, 1), datetime(2000, 2, 28))
    assert got[364.0] == (datetime(2000, 12, 31), datetime(2001, 1, 5))
    assert got[365.0] == (datetime(2001, 1, 1), datetime(2001, 1, 6))
    # hour units + standard calendar passthrough
    row = df.limit(1).select(decode_cf_time(
        F.lit(36.0), "hours since 2000-01-01", "standard").alias("x")).first()
    assert row["x"] == datetime(2000, 1, 2, 12, 0)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported CF calendar"):
        decode_cf_time(F.col("t"), "days since 2000-01-01", "lunar")


def test_cf_calendar_all_leap_decode(spark):
    """all_leap/366_day: February always 29 days; Feb 29 of a Gregorian
    non-leap year clamps to Feb 28."""
    from datetime import datetime

    from xcube_spark.functions.cftime import decode_cf_time

    df = spark.createDataFrame(
        [(0.0,), (59.0,), (60.0,), (365.0,), (366.0,)], ["t"])
    got = {r["t"]: (r["al"], r["al01"]) for r in df.select(
        "t",
        decode_cf_time(F.col("t"), "days since 2000-01-01",
                       "all_leap").alias("al"),
        decode_cf_time(F.col("t"), "days since 2001-01-01",
                       "366_day").alias("al01"),
    ).collect()}
    # 2000 IS a Gregorian leap year -> Feb 29 survives; 2001 is not ->
    # day 59 (Feb 29 in the model calendar) clamps to Feb 28
    assert got[0.0] == (datetime(2000, 1, 1), datetime(2001, 1, 1))
    assert got[59.0] == (datetime(2000, 2, 29), datetime(2001, 2, 28))
    assert got[60.0] == (datetime(2000, 3, 1), datetime(2001, 3, 1))
    assert got[365.0] == (datetime(2000, 12, 31), datetime(2001, 12, 31))
    assert got[366.0] == (datetime(2001, 1, 1), datetime(2002, 1, 1))


def _julian_ymd(y0, m0, d0, days):
    """Independent scalar reimplementation of the proleptic-Julian
    date walk (the test oracle): step day-by-day with the 4-year rule."""
    cum = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
    y, m, d = y0, m0, d0
    for _ in range(days):
        mlen = cum[m - 1] + (1 if m == 2 and y % 4 == 0 else 0)
        d += 1
        if d > mlen:
            d, m = 1, m + 1
            if m > 12:
                m, y = 1, y + 1
    return y, m, d


def test_cf_calendar_julian_decode(spark):
    """julian: leap every 4th year including century years; labels map
    to Gregorian labels, Julian-only Feb 29 (1900) clamps to Feb 28."""
    from datetime import datetime

    from xcube_spark.functions.cftime import decode_cf_time

    df = spark.createDataFrame(
        [(0.0,), (58.0,), (59.0,), (60.0,), (1000.0,), (1461.0,)], ["t"])
    got = {r["t"]: (r["j00"], r["j1900"]) for r in df.select(
        "t",
        decode_cf_time(F.col("t"), "days since 2000-01-01",
                       "julian").alias("j00"),
        decode_cf_time(F.col("t"), "days since 1900-01-01",
                       "julian").alias("j1900"),
    ).collect()}
    # 2000: leap in BOTH calendars -> Feb 29 survives
    assert got[59.0][0] == datetime(2000, 2, 29)
    assert got[60.0][0] == datetime(2000, 3, 1)
    # 1900: Julian leap, Gregorian NOT -> day 59 = Feb 29 clamps to 28
    assert got[58.0][1] == datetime(1900, 2, 28)
    assert got[59.0][1] == datetime(1900, 2, 28)
    assert got[60.0][1] == datetime(1900, 3, 1)
    # spot-check multi-year offsets against the independent day-walk
    for t in (1000.0, 1461.0):
        for (y0, col) in ((2000, 0), (1900, 1)):
            y, m, d = _julian_ymd(y0, 1, 1, int(t))
            exp = datetime(y, m, min(d, 28) if (m == 2 and d == 29
                           and not (y % 4 == 0 and (y % 100 != 0
                           or y % 400 == 0))) else d)
            assert got[t][col] == exp, (t, y0)
    # 1461 days = exactly one Julian quadrennium
    assert got[1461.0][0] == datetime(2004, 1, 1)
    assert got[1461.0][1] == datetime(1904, 1, 1)


def test_validate_expression_api(spark):
    """Dry-run validate (controllers.py:24): mean over a 2-cell probe;
    unknown names and bad syntax raise ExprError."""
    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.cube.new import new_cube
    from xcube_spark.functions.expression import ExprError, validate_expression

    grid = CubeGrid(width=4, height=2, time_periods=1, x_res=90.0,
                    y_res=90.0)
    cube = new_cube(spark, grid, {"A": 2.0, "B": 3.0})
    out = validate_expression(cube, "A * B + 1")
    assert out["result"] == 7.0
    with pytest.raises(ExprError, match="unknown variable"):
        validate_expression(cube, "A * nosuchvar")
    with pytest.raises(ExprError):
        validate_expression(cube, "A +* B")
