"""Operator tests: evaluate, temporal resample/upsample, statistics,
histogram, levels, subsample, maskset, vars2dim, extract."""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.new import new_cube
from xcube_spark.operators.evaluate import evaluate_dataset
from xcube_spark.operators.extract import get_cube_values_for_points
from xcube_spark.operators.levels import compute_levels, num_levels, select_level
from xcube_spark.operators.maskset import MaskSet, parse_bit_mask
from xcube_spark.operators.statistics import (
    compute_histogram,
    compute_statistics,
    stretch_range,
)
from xcube_spark.operators.subsampling import subsample_dataset
from xcube_spark.operators.temporal import resample_in_time, upsample_in_time
from xcube_spark.operators.vars2dim import dim_to_vars, vars_to_dim

GRID = CubeGrid(width=8, height=4, time_periods=6, x_res=45.0, y_res=45.0)


@pytest.fixture(scope="module")
def cube(spark):
    df = new_cube(spark, GRID, variables={"A": lambda ns: ns["t_i"].cast("double") + 0.125 * ns["x_i"], "C": 2.0}).cache()
    df.count()
    yield df
    df.unpersist()


def test_evaluate_dataset(cube):
    out = evaluate_dataset(
        cube,
        {
            "D": {"expression": "A * 2 + C"},
            "E": {"expression": "D + 1"},  # depends on computed D
            "F": {
                "expression": "A",
                "valid_pixel_expression": "A > 1",
            },
        },
    )
    row = out.where("t_i=1 AND x_i=4 AND y_i=0").collect()[0]
    assert row["D"] == (1 + 0.5) * 2 + 2.0
    assert row["E"] == row["D"] + 1
    assert row["F"] == 1.5
    masked = out.where("t_i=0 AND x_i=0")
    assert all(r["F"] is None for r in masked.collect())  # A=0 -> invalid


def test_evaluate_assignment_syntax(cube):
    out = evaluate_dataset(cube, {"_": {"expression": "G = A + C"}})
    assert "G" in out.columns


def test_resample_downsample_2d(cube):
    # 6 daily steps -> 2-day windows = 3 groups per cell
    out = resample_in_time(cube, "2D", methods=("mean", "min", "max", "count"))
    assert out.select("time").distinct().count() == 3
    cell = out.where("y_i=0 AND x_i=0").orderBy("time").collect()
    assert [r["A_mean"] for r in cell] == [0.5, 2.5, 4.5]
    assert [r["A_count"] for r in cell] == [2, 2, 2]


def test_resample_all(cube):
    out = resample_in_time(cube, "all", methods=("mean", "sum"))
    cell = out.where("y_i=0 AND x_i=0").collect()[0]
    assert cell["A_mean"] == 2.5  # mean over t of t
    assert cell["time"] is None


def test_resample_first_last_arg(cube):
    out = resample_in_time(cube, "3D", methods=("first", "last", "argmax"))
    cell = out.where("y_i=0 AND x_i=0").orderBy("time").collect()
    assert [r["A_first"] for r in cell] == [0.0, 3.0]
    assert [r["A_last"] for r in cell] == [2.0, 5.0]
    # argmax returns the time of the max value
    assert cell[0]["A_argmax"] == datetime(2010, 1, 3, 12)


def test_upsample_ffill_interpolate(spark):
    series = spark.createDataFrame(
        [
            (datetime(2020, 1, 1), 1.0),
            (datetime(2020, 1, 3), 5.0),
            (datetime(2020, 1, 5), None),
            (datetime(2020, 1, 7), 9.0),
        ],
        "time timestamp, v double",
    )
    ff = upsample_in_time(series, "1D", "ffill").orderBy("time").collect()
    assert [r["v"] for r in ff] == [1.0, 1.0, 5.0, 5.0, 5.0, 5.0, 9.0]
    bf = upsample_in_time(series, "1D", "bfill").orderBy("time").collect()
    assert [r["v"] for r in bf] == [1.0, 5.0, 5.0, 9.0, 9.0, 9.0, 9.0]
    ip = upsample_in_time(series, "1D", "interpolate").orderBy("time").collect()
    assert [r["v"] for r in ip] == [1.0, 3.0, 5.0, 6.0, 7.0, 8.0, 9.0]
    nr = upsample_in_time(series, "1D", "nearest").orderBy("time").collect()
    assert [r["v"] for r in nr] == [1.0, 1.0, 5.0, 5.0, 5.0, 9.0, 9.0]
    af = upsample_in_time(series, "1D", "asfreq").orderBy("time").collect()
    assert [r["v"] for r in af] == [1.0, None, 5.0, None, None, None, 9.0]


def test_compute_statistics_and_histogram(cube):
    stats = compute_statistics(cube, "A", mask=F.col("t_i") == 0).collect()[0]
    assert stats["count"] == 32
    assert stats["minimum"] == 0.0
    assert stats["maximum"] == 0.875
    assert math.isclose(stats["mean"], 0.4375)
    hist = compute_histogram(cube, "A", bins=10)
    assert hist.agg(F.sum("frequency")).collect()[0][0] == GRID.size
    assert hist.count() <= 10
    # expression input works too
    stats2 = compute_statistics(cube, "A * 2").collect()[0]
    assert stats2["maximum"] == (5 + 0.875) * 2


def test_stretch_range(cube):
    lo, hi = stretch_range(cube, "A", "minmax")
    assert (lo, hi) == (0.0, 5.875)
    lo2, hi2 = stretch_range(cube, "A", "2sigma")
    assert lo2 < 2.9375 < hi2


def test_levels(spark, cube):
    assert num_levels(CubeGrid(width=1024, height=512), tile_size=256) == 3
    levels = compute_levels(cube, GRID, num=3)
    assert len(levels) == 3
    l1, g1 = levels[1]
    assert g1.width == 4 and g1.height == 2
    assert l1.count() == 4 * 2 * 6
    # decimation keeps even source cells: A at l1 (x_i=1) == A at l0 (x_i=2)
    v = l1.where("t_i=0 AND y_i=0 AND x_i=1").collect()[0]["A"]
    assert v == 0.125 * 2
    grids = [g for _, g in levels]
    assert select_level(grids, GRID.x_res) == 0
    assert select_level(grids, GRID.x_res * 2) == 1
    assert select_level(grids, GRID.x_res * 100) == 2


def test_subsample_first_fastpath(cube):
    out = subsample_dataset(cube, factor=2, agg_methods="first")
    assert out.count() == GRID.size // 4
    v = out.where("t_i=0 AND y_i=0 AND x_i=1").collect()[0]["A"]
    assert v == 0.125 * 2  # source x_i=2


def test_subsample_glob_methods(cube):
    out = subsample_dataset(cube, factor=2, agg_methods={"A*": ("mean", "mode"), "C": "median"})
    assert {"A_mean", "A_mode", "C_median", "n"} <= set(out.columns)


def test_maskset_bits():
    assert parse_bit_mask("3b") == 8
    assert parse_bit_mask("1b-4b") == 0b11110
    with pytest.raises(ValueError):
        parse_bit_mask("xb")


def test_maskset_values(spark):
    df = spark.createDataFrame([(0,), (1,), (2,), (3,)], "q int")
    ms = MaskSet("q", flag_values=[0, 1, 2, 3], flag_meanings="clear land water cloud")
    got = df.select(ms["water"].alias("m")).collect()
    assert [r["m"] for r in got] == [False, False, True, False]


def test_vars2dim_roundtrip(cube):
    long = vars_to_dim(cube, ["A", "C"])
    assert long.count() == GRID.size * 2
    back = dim_to_vars(long, ["A", "C"])
    assert back.count() == GRID.size
    r = back.where("t_i=1 AND y_i=0 AND x_i=2").collect()[0]
    assert r["A"] == 1.25 and r["C"] == 2.0


def test_extract_points_outer_semantics(spark, cube):
    pts = spark.createDataFrame(
        [
            (0, datetime(2010, 1, 1, 12), 10.0, 10.0),     # inside
            (1, datetime(2010, 1, 1, 12), 200.0, 10.0),    # lat out of range
            (2, datetime(2030, 1, 1, 12), 10.0, 10.0),     # time out of range
        ],
        "id long, time timestamp, lat double, lon double",
    )
    out = get_cube_values_for_points(cube, GRID, pts, ["A"]).orderBy("id").collect()
    assert out[0]["A"] is not None
    assert out[1]["A"] is None and out[2]["A"] is None


def test_extract_irregular_axes(spark):
    """Irregular-axis extraction: range-join lookup against bounds
    tables must agree with the closed-form regular path, and handle an
    actually non-equidistant axis."""
    from xcube_spark.operators.extract import (
        get_cube_values_for_points_irregular,
        get_dataset_indexes_irregular,
    )

    grid = CubeGrid(width=8, height=4, time_periods=3, x_res=45.0, y_res=45.0)
    cube = new_cube(spark, grid, {"v": lambda ns: (
        ns["t_i"] * 100 + ns["y_i"] * 10 + ns["x_i"]).cast("double")})

    pts = spark.createDataFrame(
        [(0, "2010-01-01 12:00:00", -80.0, -170.0),
         (1, "2010-01-03 01:00:00", 60.0, 100.0),
         (2, "2010-01-02 00:30:00", 200.0, 0.0)],  # lat out of range
        "point_id long, time string, lat double, lon double",
    ).withColumn("time", F.to_timestamp("time"))

    out = get_cube_values_for_points_irregular(
        cube, pts, grid.y_axis(spark), grid.x_axis(spark),
        grid.time_axis(spark),
    )
    rows = {r["point_id"]: r for r in out.collect()}
    assert rows[0]["v"] == 0 * 100 + 0 * 10 + 0
    assert rows[1]["v"] == 2 * 100 + 3 * 10 + 6
    assert rows[2]["v"] is None and rows[2]["y_i"] is None

    # genuinely irregular axis: exponential bin edges
    edges = [0.0, 1.0, 3.0, 7.0, 15.0]
    axis = spark.createDataFrame(
        [(i, edges[i], edges[i + 1]) for i in range(4)],
        "k_i int, k_lo double, k_hi double",
    )
    p2 = spark.createDataFrame(
        [(0, 0.5), (1, 2.9), (2, 7.0), (3, 20.0)], "pid long, k double")
    got = {r["pid"]: r["k_i"] for r in get_dataset_indexes_irregular(
        p2, axis, "k", "k_i").collect()}
    assert got == {0: 0, 1: 1, 2: 3, 3: None}


def test_resample_first_last_skipna(spark):
    """first/last skip NULLs (xarray .first()/.last() parity): a NULL at
    the window edge must not shadow the first/last valid value."""
    rows = [
        (0, "2010-01-01", None), (0, "2010-01-02", 5.0),
        (0, "2010-01-03", 7.0), (0, "2010-01-04", None),
    ]
    df = spark.createDataFrame(
        [(i, ts, v) for i, (_, ts, v) in enumerate(rows)],
        "t_i int, ts string, A double",
    ).select(
        F.lit(0).alias("y_i"), F.lit(0).alias("x_i"),
        F.col("t_i"), F.to_timestamp("ts").alias("time"), "A",
    )
    out = resample_in_time(df, "1W", methods=("first", "last")).collect()
    assert out[0]["A_first"] == 5.0 and out[0]["A_last"] == 7.0


def test_mapped_and_identity_mldataset(spark):
    from pyspark.sql import functions as F

    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.cube.new import new_cube
    from xcube_spark.operators.mldataset import (BaseMultiLevelDataset,
                                                 IdentityMultiLevelDataset,
                                                 MappedMultiLevelDataset)

    grid = CubeGrid(width=8, height=4, time_periods=1, x_res=45.0,
                    y_res=45.0, chunks=(1, 2, 2))
    base = BaseMultiLevelDataset(new_cube(spark, grid, {"v": 3.0}),
                                 grid, 2)
    mapped = MappedMultiLevelDataset(
        base, lambda df, k=1.0: df.withColumn("v", F.col("v") * k), k=2.0)
    assert mapped.num_levels == 2
    assert mapped.get_dataset(0).agg(F.max("v")).collect()[0][0] == 6.0
    assert mapped.get_dataset(1).agg(F.max("v")).collect()[0][0] == 6.0
    ident = IdentityMultiLevelDataset(base)
    assert ident.get_dataset(1).agg(F.max("v")).collect()[0][0] == 3.0
    import pytest as _p

    with _p.raises(ValueError, match="callable"):
        MappedMultiLevelDataset(base, "nope")


# ---- EMA smoothing (round-10 third-session addition) ---------------------


def test_ema_smooth_constant_series_is_identity(spark):
    from pyspark.sql import Row, functions as F
    from xcube_spark.operators.temporal import ema_smooth

    rows = [Row(k=1, i=i, v=5.0) for i in range(30)]
    df = spark.createDataFrame(rows)
    ema = ema_smooth(df, "v", "k", ["i"], alpha=0.25, window=16)
    out = df.select("i", ema.alias("e")).collect()
    for r in out:
        assert r["e"] == 5.0  # weighted mean of a constant is exact


def test_ema_smooth_matches_reference_formula(spark):
    from pyspark.sql import Row
    from xcube_spark.operators.temporal import ema_smooth

    vals = [1.0, 2.0, 4.0, 8.0, 3.0]
    df = spark.createDataFrame([Row(k=1, i=i, v=v)
                                for i, v in enumerate(vals)])
    ema = ema_smooth(df, "v", "k", ["i"], alpha=0.25, window=16)
    out = {r["i"]: r["e"] for r in
           df.select("i", ema.alias("e")).collect()}
    for t in range(len(vals)):
        num = den = 0.0
        for i in range(t + 1):
            w = 0.75 ** i
            num, den = num + w * vals[t - i], den + w
        assert abs(out[t] - num / den) < 1e-12, t


def test_holt_smooth_matches_truncated_filter(spark):
    from pyspark.sql import Row
    from xcube_spark.operators.temporal import (holt_coefficients,
                                                holt_smooth)

    vals = [float((i * 13 % 17) - 8) for i in range(20)]
    df = spark.createDataFrame([Row(k=1, i=i, v=v)
                                for i, v in enumerate(vals)])
    W = 12
    out = {r["i"]: (r["holt_level"], r["holt_trend"], r["holt_forecast"])
           for r in holt_smooth(df, "v", "k", ["i"],
                                alpha=0.5, beta=0.25,
                                window=W).collect()}
    li, bi = holt_coefficients(0.5, 0.25, W)
    for t in range(len(vals)):
        if t < W - 1:
            assert out[t] == (None, None, None), t
            continue
        lev = tre = 0.0
        for i in range(W):
            lev, tre = lev + li[i] * vals[t - i], tre + bi[i] * vals[t - i]
        got = out[t]
        assert abs(got[0] - lev) < 1e-12, (t, got[0], lev)
        assert abs(got[1] - tre) < 1e-12
        assert abs(got[2] - (lev + tre)) < 1e-12


def test_holt_coefficients_match_textbook_recursion():
    """The truncated taps converge to the textbook Holt recursion:
    after a warmup longer than the window, the filtered value tracks
    the recursion (zero-init, same alpha/beta) to within the decayed
    tail mass."""
    from xcube_spark.operators.temporal import holt_coefficients

    a, b, W = 0.5, 0.25, 12
    li, bi = holt_coefficients(a, b, W)
    vals = [float((i * 7 % 23) - 11) for i in range(60)]
    lev = tre = 0.0
    for x in vals:
        l_prev = lev
        lev = a * x + (1 - a) * (l_prev + tre)
        tre = b * (lev - l_prev) + (1 - b) * tre
    t = len(vals) - 1
    f_lev = sum(li[i] * vals[t - i] for i in range(W))
    f_tre = sum(bi[i] * vals[t - i] for i in range(W))
    # tail mass of the taps decays like rho^W (rho = spectral radius)
    assert abs(f_lev - lev) < 0.2
    assert abs(f_tre - tre) < 0.2
    # taps decay: the last tap is small relative to the first
    assert abs(li[-1]) < 0.05 * abs(li[0])


def test_hampel_filter_matches_bruteforce(spark):
    from pyspark.sql import Row
    from xcube_spark.operators.temporal import hampel_filter

    vals = [float((i * 29 % 31) - 15) for i in range(40)]
    vals[25] = 500.0  # an obvious spike the filter must repair
    df = spark.createDataFrame([Row(k=1, i=i, v=v)
                                for i, v in enumerate(vals)])
    W = 15
    out = {r["i"]: r for r in
           hampel_filter(df, "v", "k", ["i"], window=W).collect()}
    for t in range(len(vals)):
        r = out[t]
        if t < W - 1:
            assert r["roll_med"] is None and r["outlier"] is None
            continue
        win = sorted(vals[t - W + 1:t + 1])
        med = win[W // 2]
        mad = sorted(abs(x - med) for x in vals[t - W + 1:t + 1])[W // 2]
        assert r["roll_med"] == med, t
        assert r["roll_mad"] == mad, t
        if mad > 0:
            z = (vals[t] - med) / (1.4826 * mad)
            assert abs(r["robust_z"] - z) < 1e-12, t
            exp_out = 1 if abs(z) > 3.0 else 0
        else:
            assert r["robust_z"] is None, t
            exp_out = 1 if vals[t] != med else 0
        assert r["outlier"] == exp_out, t
        assert r["hampel_value"] == (med if exp_out else vals[t]), t
    assert out[25]["outlier"] == 1          # the spike is flagged
    assert out[25]["hampel_value"] != 500.0  # and repaired


def test_hampel_filter_constant_plateau(spark):
    """mad == 0 windows: z is NULL, only exact deviations flag."""
    from pyspark.sql import Row
    from xcube_spark.operators.temporal import hampel_filter

    vals = [2.0] * 20 + [7.0]
    df = spark.createDataFrame([Row(k=1, i=i, v=v)
                                for i, v in enumerate(vals)])
    out = {r["i"]: r for r in
           hampel_filter(df, "v", "k", ["i"], window=15).collect()}
    assert out[19]["roll_mad"] == 0.0
    assert out[19]["robust_z"] is None
    assert out[19]["outlier"] == 0
    assert out[20]["outlier"] == 1           # 7.0 breaks the plateau
    assert out[20]["hampel_value"] == 2.0    # repaired to the median


def test_focal_mean_matches_bruteforce(spark):
    import numpy as np
    from pyspark.sql import Row
    from xcube_spark.operators.focal import focal_mean

    rng = [(t, y, x) for t in range(2) for y in range(5) for x in range(6)]
    vals = {k: float((i * 37 % 11) - 5) for i, k in enumerate(rng)}
    rows = [Row(t_i=t, y_i=y, x_i=x, A=vals[(t, y, x)])
            for (t, y, x) in rng]
    df = spark.createDataFrame(rows)
    out = {(r["t_i"], r["y_i"], r["x_i"]): r["A_focal"]
           for r in focal_mean(df, "A", "t_i", "y_i", "x_i").collect()}
    for (t, y, x) in rng:
        acc = [vals[(t, yy, xx)]
               for yy in range(max(0, y - 1), min(5, y + 2))
               for xx in range(max(0, x - 1), min(6, x + 2))]
        assert abs(out[(t, y, x)] - sum(acc) / len(acc)) < 1e-12


def test_focal_mean_null_values_drop_out(spark):
    from pyspark.sql import Row
    from xcube_spark.operators.focal import focal_mean

    rows = [Row(t_i=0, y_i=0, x_i=0, A=1.0),
            Row(t_i=0, y_i=0, x_i=1, A=None),
            Row(t_i=0, y_i=0, x_i=2, A=4.0)]
    df = spark.createDataFrame(rows, "t_i INT, y_i INT, x_i INT, A DOUBLE")
    out = {r["x_i"]: r["A_focal"]
           for r in focal_mean(df, "A", "t_i", "y_i", "x_i").collect()}
    assert out[0] == 1.0          # (1) / 1 — null neighbor excluded
    assert out[1] == 2.5          # (1+4)/2
    assert out[2] == 4.0


def test_cusum_drift_matches_recursion(spark):
    from pyspark.sql import Row
    from xcube_spark.operators.temporal import cusum_drift

    vals = [1.0, 5.0, 5.0, 0.0, 9.0, 9.0, 9.0, 0.0]
    k = 3.0
    df = spark.createDataFrame([Row(u=1, i=i, v=v)
                                for i, v in enumerate(vals)])
    out = {r["i"]: r["cusum"]
           for r in cusum_drift(df, "v", "u", ["i"], k=k).collect()}
    s = 0.0
    for i, v in enumerate(vals):
        s = max(0.0, s + v - k)
        assert abs(out[i] - s) < 1e-12, (i, out[i], s)


def test_cusum_drift_first_value_above_k(spark):
    """Regression: when the running sum of (value - k) stays positive
    from the FIRST event, the closed form must include the empty
    prefix C_0 = 0 — S_1 = x_1 - k, not 0."""
    from pyspark.sql import Row
    from xcube_spark.operators.temporal import cusum_drift

    vals = [9.0, 8.0, 7.0, 1.0, 9.0]
    k = 3.0
    df = spark.createDataFrame([Row(u=1, i=i, v=v)
                                for i, v in enumerate(vals)])
    out = {r["i"]: r["cusum"]
           for r in cusum_drift(df, "v", "u", ["i"], k=k).collect()}
    assert out[0] == 6.0  # x_1 - k, the bug emitted 0.0 here
    s = 0.0
    for i, v in enumerate(vals):
        s = max(0.0, s + v - k)
        assert abs(out[i] - s) < 1e-12, (i, out[i], s)


def test_hillshade_flat_surface_is_uniform(spark):
    """A constant field has zero slope everywhere -> hillshade equals
    255 * cos(zenith) on every interior cell."""
    import math
    from pyspark.sql import Row
    from xcube_spark.operators.focal import HS_ZENITH_RAD, hillshade

    rows = [Row(t_i=0, y_i=y, x_i=x, A=7.5)
            for y in range(5) for x in range(5)]
    df = spark.createDataFrame(rows)
    out = hillshade(df, "A", "t_i", "y_i", "x_i").collect()
    interior = [r for r in out if r["A_hillshade"] is not None]
    assert len(interior) == 9  # 3x3 interior of a 5x5 grid
    want = 255.0 * math.cos(HS_ZENITH_RAD)
    for r in interior:
        assert abs(r["A_hillshade"] - want) < 1e-9


def test_hillshade_slope_darkens_away_from_sun(spark):
    """A ramp rising toward the northwest sun shades brighter than
    one rising away from it."""
    from pyspark.sql import Row
    from xcube_spark.operators.focal import hillshade

    # sun at 315deg (NW): slope facing NW = bright, SE = dark
    up_nw = [Row(t_i=0, y_i=y, x_i=x, A=float(-(x + y)))
             for y in range(5) for x in range(5)]
    up_se = [Row(t_i=0, y_i=y, x_i=x, A=float(x + y))
             for y in range(5) for x in range(5)]
    b = hillshade(spark.createDataFrame(up_nw), "A",
                  "t_i", "y_i", "x_i").collect()
    d = hillshade(spark.createDataFrame(up_se), "A",
                  "t_i", "y_i", "x_i").collect()
    bright = [r["A_hillshade"] for r in b if r["A_hillshade"] is not None]
    dark = [r["A_hillshade"] for r in d if r["A_hillshade"] is not None]
    assert min(bright) > max(dark)


def test_integral_image_box_sum_identity(spark):
    from pyspark.sql import Row
    from xcube_spark.operators.focal import integral_image

    vals = {(y, x): float((3 * y + 5 * x) % 7)
            for y in range(6) for x in range(7)}
    rows = [Row(t_i=0, y_i=y, x_i=x, A=vals[(y, x)])
            for (y, x) in vals]
    df = spark.createDataFrame(rows)
    out = {(r["y_i"], r["x_i"]): r["A_integral"]
           for r in integral_image(df, "A", "t_i", "y_i",
                                   "x_i").collect()}
    # prefix-sum correctness
    for (y, x) in vals:
        want = sum(vals[(yy, xx)]
                   for yy in range(y + 1) for xx in range(x + 1))
        assert abs(out[(y, x)] - want) < 1e-9
    # O(1) box query: sum over y in [2,4], x in [3,6]
    def I(y, x):
        return out[(y, x)] if y >= 0 and x >= 0 else 0.0
    box = I(4, 6) - I(1, 6) - I(4, 2) + I(1, 2)
    want = sum(vals[(y, x)] for y in range(2, 5) for x in range(3, 7))
    assert abs(box - want) < 1e-9


def test_rolling_trend_recovers_linear_slope(spark):
    from pyspark.sql import Row
    from xcube_spark.operators.temporal import rolling_trend

    # exactly linear series: value = 3*i -> slope 3 once window fills
    df = spark.createDataFrame([Row(u=1, i=i, v=3.0 * i)
                                for i in range(40)])
    out = {r["i"]: r["trend"]
           for r in rolling_trend(df, "v", "u", ["i"],
                                  window=8).collect()}
    for i in range(40):
        if i < 7:
            assert out[i] is None
        else:
            assert abs(out[i] - 3.0) < 1e-12, (i, out[i])


def test_rolling_trend_sign(spark):
    from pyspark.sql import Row
    from xcube_spark.operators.temporal import rolling_trend

    vals = [float(50 - i) for i in range(20)]  # falling
    df = spark.createDataFrame([Row(u=1, i=i, v=v)
                                for i, v in enumerate(vals)])
    out = [r["trend"] for r in
           rolling_trend(df, "v", "u", ["i"], window=8).collect()
           if r["trend"] is not None]
    assert all(t < 0 for t in out)


def test_slope_aspect_cardinal_directions(spark):
    """Aspect is the DOWNSLOPE (facing) direction: a plane rising
    southward (z = y; ascending y is south in this grid's raster
    convention, see hillshade's stencil) faces north; a plane rising
    eastward faces west; a flat plane is FLAT with slope 0; slope
    magnitude matches atan(gradient)."""
    import math
    from pyspark.sql import Row
    from xcube_spark.operators.focal import slope_aspect

    rows = []
    for y in range(5):
        for x in range(5):
            rows.append(Row(t=0, y=y, x=x, north=float(y),
                            east=float(x), flat=7.0))
    df = spark.createDataFrame(rows)
    for var, want_asp in (("north", 0.0), ("east", 270.0),
                          ("flat", -1.0)):
        out = {(r["y"], r["x"]): (r[f"{var}_slope_deg"],
                                  r[f"{var}_aspect_deg"])
               for r in slope_aspect(df, var, time_col="t",
                                     y_col="y", x_col="x").collect()
               if r[f"{var}_slope_deg"] is not None}
        assert out, var
        for (y, x), (slope, asp) in out.items():
            assert 1 <= y <= 3 and 1 <= x <= 3  # interior only
            if var == "flat":
                assert slope == 0.0 and asp == -1.0
            else:
                # unit gradient: slope = atan(1) in degrees
                assert abs(slope - math.degrees(math.atan(1.0))) < 1e-9
                assert abs(asp - want_asp) < 1e-9


def test_rolling_zscore_matches_bruteforce(spark):
    import statistics
    from pyspark.sql import Row
    from xcube_spark.operators.temporal import rolling_zscore

    vals = [float((i * 31 % 37) - 18) for i in range(45)]
    df = spark.createDataFrame([Row(k=1, i=i, v=v)
                                for i, v in enumerate(vals)])
    W = 32
    out = {r["i"]: (r["roll_mean"], r["roll_sd"], r["zscore"])
           for r in rolling_zscore(df, "v", "k", ["i"],
                                   window=W).collect()}
    for t in range(len(vals)):
        m, sd, z = out[t]
        if t < W - 1:
            assert (m, sd, z) == (None, None, None), t
            continue
        win = vals[t - W + 1:t + 1]
        assert abs(m - statistics.fmean(win)) < 1e-9, t
        want_sd = statistics.stdev(win)
        assert abs(sd - want_sd) < 1e-9, t
        assert abs(z - (vals[t] - statistics.fmean(win)) / want_sd) \
            < 1e-7, t


def test_rolling_zscore_constant_window_null_z(spark):
    from pyspark.sql import Row
    from xcube_spark.operators.temporal import rolling_zscore

    df = spark.createDataFrame([Row(k=1, i=i, v=4.0)
                                for i in range(40)])
    out = {r["i"]: r for r in
           rolling_zscore(df, "v", "k", ["i"], window=32).collect()}
    assert out[35]["roll_mean"] == 4.0
    assert out[35]["roll_sd"] == 0.0   # clamped, not epsilon-negative
    assert out[35]["zscore"] is None


def test_transition_matrix_rows_sum_to_one(spark):
    from xcube_spark.queries.events_ops import events_transition_matrix

    out = events_transition_matrix(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r["prob"])
    for f, ps in by_from.items():
        assert abs(sum(ps) - 1.0) < 1e-4, f
        assert all(0.0 <= p <= 1.0 for p in ps)


def test_distance_transform_matches_bruteforce(spark):
    """Manhattan DT from separable min-plus window passes must equal
    the O(n^2) brute force, including the no-mask NULL slice."""
    from pyspark.sql import Row
    from xcube_spark.operators.focal import distance_transform

    w, h = 9, 7
    masked = {(1, 2), (5, 6), (3, 3)}
    rows = [Row(t=0, y=y, x=x, m=(y, x) in masked)
            for y in range(h) for x in range(w)]
    rows += [Row(t=1, y=y, x=x, m=False)  # slice with NO masked cell
             for y in range(h) for x in range(w)]
    df = spark.createDataFrame(rows)
    out = {(r["t"], r["y"], r["x"]): r["dist"]
           for r in distance_transform(
               df, F.col("m"), time_col="t", y_col="y",
               x_col="x").collect()}
    for y in range(h):
        for x in range(w):
            want = min(abs(y - my) + abs(x - mx)
                       for my, mx in masked)
            assert out[(0, y, x)] == want, (y, x)
            assert out[(1, y, x)] is None  # unreachable -> NULL
