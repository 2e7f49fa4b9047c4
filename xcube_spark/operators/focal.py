"""Focal (neighborhood) raster statistics over the cube grid.

The classic map-algebra focal mean: each cell takes the mean of its
3x3 neighborhood — smoothing/convolution for gridded variables (the
raster-analytics companion to the reference's spatial resampling
surface, ``xcube/core/resampling`` — additive: the reference delegates
kernel ops to xarray/dask, this is the Spark-native form).

Design: the 3x3 box kernel is SEPARABLE, so the operator runs as two
1-D passes — an x-pass (window over each (time, y) row) then a y-pass
(window over each (time, x) column) — instead of a 9x explode +
re-aggregate.  Each pass is one exchange + sort of the grid; the 9x
row fan-out shuffle never exists.  Each 3-term sum is UNROLLED
``lag/current/lead`` in a fixed left-associated shape (the
``ema_smooth`` discipline), so partial sums have no ordering freedom
and both engines produce bit-identical doubles; neighbor counts are
exact integers, making the final mean a single deterministic IEEE
division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _pass_sums(v: Column, w) -> tuple[Column, Column]:
    """One separable pass: (value sum, present count) over the
    ordered 1-D 3-neighborhood, left-associated, null-safe."""
    lag, lead = F.lag(v).over(w), F.lead(v).over(w)
    s = (F.when(lag.isNotNull(), lag).otherwise(F.lit(0.0))
         + F.when(v.isNotNull(), v).otherwise(F.lit(0.0))) \
        + F.when(lead.isNotNull(), lead).otherwise(F.lit(0.0))
    c = (F.when(lag.isNotNull(), F.lit(1)).otherwise(F.lit(0))
         + F.when(v.isNotNull(), F.lit(1)).otherwise(F.lit(0))) \
        + F.when(lead.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    return s, c


def focal_mean(
    cube: DataFrame,
    var: str,
    time_col: str = "time",
    y_col: str = "y",
    x_col: str = "x",
) -> DataFrame:
    """3x3 focal mean of ``var`` -> adds ``{var}_focal``.

    Boundary cells average over their in-grid neighbors only (the
    standard shrinking-kernel edge rule).  Assumes a DENSE grid in
    ``x`` and ``y`` per time slice (the cube contract after
    rectification); missing VALUES are fine — they drop out of both
    the sum and the count.

    Scale shape: two exchanges total (one per separable pass), each a
    hash partition + sort the size of the grid — no row fan-out, no
    join.  At 100 TB the passes pipeline per partition; a fused 2-D
    window would need the same two sorts anyway.
    """
    wx = Window.partitionBy(time_col, y_col).orderBy(x_col)
    s1, c1 = _pass_sums(F.col(var).cast("double"), wx)
    stage1 = cube.withColumn("__s1", s1).withColumn("__c1", c1)
    wy = Window.partitionBy(time_col, x_col).orderBy(y_col)
    s2, _ = _pass_sums(F.col("__s1"), wy)
    # counts sum exactly as integers on the same frame
    lagc, leadc = F.lag("__c1").over(wy), F.lead("__c1").over(wy)
    c2 = (F.coalesce(lagc, F.lit(0)) + F.col("__c1")) \
        + F.coalesce(leadc, F.lit(0))
    return (
        stage1.withColumn(
            f"{var}_focal",
            F.when(c2 > 0, s2 / c2.cast("double")))
        .drop("__s1", "__c1")
    )


def focal_mean_sql(
    var: str,
    src: str = "cube",
    time_col: str = "time",
    y_col: str = "y",
    x_col: str = "x",
) -> str:
    """DuckDB twin of :func:`focal_mean` — identical unrolled
    left-associated lag/lead shape over the same two window passes.
    Returns a SELECT producing ``(time, y, x, {var}_focal)``."""
    v = f"CAST({var} AS DOUBLE)"

    def pass_exprs(val: str, part: str, order: str,
                   int_count: bool) -> tuple[str, str]:
        w = f"(PARTITION BY {part} ORDER BY {order})"
        lag, lead = f"LAG({val}) OVER {w}", f"LEAD({val}) OVER {w}"
        s = (f"((CASE WHEN {lag} IS NOT NULL THEN {lag} ELSE 0.0 END"
             f" + CASE WHEN {val} IS NOT NULL THEN {val} ELSE 0.0 END)"
             f" + CASE WHEN {lead} IS NOT NULL THEN {lead}"
             f" ELSE 0.0 END)")
        one, zero = ("1", "0") if int_count else ("1.0", "0.0")
        c = (f"((CASE WHEN {lag} IS NOT NULL THEN {one} ELSE {zero} END"
             f" + CASE WHEN {val} IS NOT NULL THEN {one}"
             f" ELSE {zero} END)"
             f" + CASE WHEN {lead} IS NOT NULL THEN {one}"
             f" ELSE {zero} END)")
        return s, c

    s1, c1 = pass_exprs(v, f"{time_col}, {y_col}", x_col, True)
    stage1 = (f"SELECT {time_col}, {y_col}, {x_col}, "
              f"{s1} AS __s1, {c1} AS __c1 FROM {src}")
    s2, _ = pass_exprs("__s1", f"{time_col}, {x_col}", y_col, True)
    wy = f"(PARTITION BY {time_col}, {x_col} ORDER BY {y_col})"
    c2 = (f"((COALESCE(LAG(__c1) OVER {wy}, 0) + __c1)"
          f" + COALESCE(LEAD(__c1) OVER {wy}, 0))")
    return (f"SELECT {time_col}, {y_col}, {x_col}, "
            f"CASE WHEN {c2} > 0 THEN {s2} / CAST({c2} AS DOUBLE) END"
            f" AS {var}_focal FROM ({stage1})")


import math as _math

#: solar geometry for the standard cartographic hillshade
HS_AZIMUTH_RAD = _math.radians(315.0)
HS_ZENITH_RAD = _math.radians(45.0)


def hillshade(
    cube: DataFrame,
    var: str,
    time_col: str = "time",
    y_col: str = "y",
    x_col: str = "x",
    z_factor: float = 1.0,
) -> DataFrame:
    """Horn (1981) hillshade over the cube grid — slope/aspect from
    3x3 finite differences, shaded with the standard 315deg azimuth /
    45deg altitude sun: the classic terrain-visualization raster
    derivative (the analysis-side companion of the tile renderer).

    Neighbor access is TWO chained 1-D window passes (lag/lead over x,
    then lag/lead of those over y) — the separable trick from
    :func:`focal_mean` generalized to the full 3x3 stencil: two
    exchanges, no 9x explode, no join.  Interior cells only (every
    stencil cell present); all trig is fixed-shape per-row IEEE math
    with module-constant sun angles, cross-engine to the last ulp or
    two (callers round).

    Adds ``{var}_hillshade`` in [0, 255] (raw double).
    """
    wx = Window.partitionBy(time_col, y_col).orderBy(x_col)
    v = F.col(var).cast("double")
    s1 = cube.withColumn("__zc", v) \
        .withColumn("__zw", F.lag(v).over(wx)) \
        .withColumn("__ze", F.lead(v).over(wx))
    wy = Window.partitionBy(time_col, x_col).orderBy(y_col)
    cols = {}
    for base, nm in (("__zw", "w"), ("__zc", "c"), ("__ze", "e")):
        cols[f"n{nm}"] = F.lag(base).over(wy)
        cols[f"c{nm}"] = F.col(base)
        cols[f"s{nm}"] = F.lead(base).over(wy)
    s2 = s1
    for name, c in cols.items():
        s2 = s2.withColumn(f"__{name}", c)
    g = {k: F.col(f"__{k}") for k in cols}
    dzdx = ((g["ne"] + F.lit(2.0) * g["ce"] + g["se"])
            - (g["nw"] + F.lit(2.0) * g["cw"] + g["sw"])) / F.lit(8.0)
    dzdy = ((g["sw"] + F.lit(2.0) * g["sc"] + g["se"])
            - (g["nw"] + F.lit(2.0) * g["nc"] + g["ne"])) / F.lit(8.0)
    dzdx = dzdx * F.lit(z_factor)
    dzdy = dzdy * F.lit(z_factor)
    slope = F.atan(F.sqrt(dzdx * dzdx + dzdy * dzdy))
    aspect = F.atan2(dzdy, -dzdx)
    shade = F.lit(255.0) * (
        F.lit(_math.cos(HS_ZENITH_RAD)) * F.cos(slope)
        + F.lit(_math.sin(HS_ZENITH_RAD)) * F.sin(slope)
        * F.cos(F.lit(HS_AZIMUTH_RAD) - aspect))
    present = None
    for k in g:
        cond = g[k].isNotNull()
        present = cond if present is None else (present & cond)
    out = s2.withColumn(
        f"{var}_hillshade",
        F.when(present, F.greatest(shade, F.lit(0.0))))
    return out.drop("__zc", "__zw", "__ze",
                    *[f"__{k}" for k in cols])


def hillshade_sql(
    var: str,
    src: str = "cube",
    time_col: str = "time",
    y_col: str = "y",
    x_col: str = "x",
    z_factor: float = 1.0,
) -> str:
    """DuckDB twin of :func:`hillshade` — identical two-pass stencil
    and per-row trig shapes with the same sun-angle double literals.
    Produces ``(time, y, x, {var}_hillshade)`` (interior cells)."""
    v = f"CAST({var} AS DOUBLE)"
    wx = f"(PARTITION BY {time_col}, {y_col} ORDER BY {x_col})"
    stage1 = (f"SELECT {time_col}, {y_col}, {x_col}, {v} AS zc, "
              f"LAG({v}) OVER {wx} AS zw, "
              f"LEAD({v}) OVER {wx} AS ze FROM {src}")
    wy = f"(PARTITION BY {time_col}, {x_col} ORDER BY {y_col})"
    sel = []
    for base, nm in (("zw", "w"), ("zc", "c"), ("ze", "e")):
        sel.append(f"LAG({base}) OVER {wy} AS n{nm}")
        sel.append(f"{base} AS c{nm}")
        sel.append(f"LEAD({base}) OVER {wy} AS s{nm}")
    stage2 = (f"SELECT {time_col}, {y_col}, {x_col}, "
              + ", ".join(sel) + f" FROM ({stage1})")
    dzdx = ("(((ne + (2.0 * ce)) + se) - ((nw + (2.0 * cw)) + sw))"
            f" / 8.0 * {z_factor!r}")
    dzdy = ("(((sw + (2.0 * sc)) + se) - ((nw + (2.0 * nc)) + ne))"
            f" / 8.0 * {z_factor!r}")
    slope = f"atan(sqrt(({dzdx}) * ({dzdx}) + ({dzdy}) * ({dzdy})))"
    aspect = f"atan2(({dzdy}), -({dzdx}))"
    shade = (f"255.0 * ({_math.cos(HS_ZENITH_RAD)!r} * cos({slope})"
             f" + {_math.sin(HS_ZENITH_RAD)!r} * sin({slope})"
             f" * cos({HS_AZIMUTH_RAD!r} - ({aspect})))")
    notnull = " AND ".join(
        f"{c} IS NOT NULL"
        for c in ("nw", "nc", "ne", "cw", "cc", "ce", "sw", "sc", "se"))
    return (f"SELECT {time_col}, {y_col}, {x_col}, "
            f"greatest({shade}, 0.0) AS {var}_hillshade "
            f"FROM ({stage2}) WHERE {notnull}")


def integral_image(
    cube: DataFrame,
    var: str,
    time_col: str = "time",
    y_col: str = "y",
    x_col: str = "x",
) -> DataFrame:
    """Summed-area table (integral image): ``I(y, x) = sum of
    ``var`` over all cells with y' <= y and x' <= x`` — after this
    one preprocessing pass, ANY axis-aligned box sum is four lookups
    (O(1) per query), the standard trick behind multi-scale box
    filters, ROI statistics and Haar features at scale.

    Built as two SEPARABLE cumulative window passes (running sum over
    x within each row, then over y within each column) — two
    exchanges, no fan-out.  Running sums accumulate in the same
    coordinate order on any engine, so cross-engine noise is
    sub-ulp-per-row (callers round).

    Adds ``{var}_integral`` (raw double).
    """
    wx = (Window.partitionBy(time_col, y_col).orderBy(x_col)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    s1 = cube.withColumn(
        "__rx", F.sum(F.col(var).cast("double")).over(wx))
    wy = (Window.partitionBy(time_col, x_col).orderBy(y_col)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (s1.withColumn(f"{var}_integral", F.sum("__rx").over(wy))
            .drop("__rx"))


def integral_image_sql(
    var: str,
    src: str = "cube",
    time_col: str = "time",
    y_col: str = "y",
    x_col: str = "x",
) -> str:
    """DuckDB twin of :func:`integral_image` — the same two
    cumulative window passes."""
    v = f"CAST({var} AS DOUBLE)"
    wx = (f"(PARTITION BY {time_col}, {y_col} ORDER BY {x_col} "
          f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    wy = (f"(PARTITION BY {time_col}, {x_col} ORDER BY {y_col} "
          f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    stage1 = (f"SELECT {time_col}, {y_col}, {x_col}, "
              f"SUM({v}) OVER {wx} AS __rx FROM {src}")
    return (f"SELECT {time_col}, {y_col}, {x_col}, "
            f"SUM(__rx) OVER {wy} AS {var}_integral FROM ({stage1})")


#: degrees per radian, one shared double literal for both engines
RAD2DEG = 180.0 / _math.pi

#: 8-way compass sector names, index = floor(((compass+22.5)%360)/45)
ASPECT_CLASSES = ("N", "NE", "E", "SE", "S", "SW", "W", "NW")


def slope_aspect(
    cube: DataFrame,
    var: str,
    time_col: str = "time",
    y_col: str = "y",
    x_col: str = "x",
    z_factor: float = 1.0,
) -> DataFrame:
    """Horn (1981) slope and aspect over the cube grid — the raw
    terrain derivatives underneath :func:`hillshade`, emitted as
    compass-convention degrees plus an 8-way sector class (the
    standard GIS surface-analysis pair: slope gates buildability/
    erosion models, aspect drives solar/vegetation analysis).

    Same separable 3x3 stencil as hillshade (two chained 1-D window
    passes, two exchanges, no explode); interior cells only.
    Compass aspect uses the ESRI convention rewritten branch-free:
    ``compass = ((90 - deg(atan2(dzdy, -dzdx))) % 360 + 360) % 360``
    (0 = north, clockwise); cells with EXACTLY zero gradient in both
    axes (an exact integer-arithmetic test, bit-identical
    cross-engine) are flat — aspect -1, class 'FLAT'.

    Adds ``{var}_slope_deg`` / ``{var}_aspect_deg`` (raw doubles —
    trig differs cross-engine by an ulp or two, callers round) and
    leaves the class to callers so it derives from the ROUNDED
    aspect (the lockstep discipline).
    """
    wx = Window.partitionBy(time_col, y_col).orderBy(x_col)
    v = F.col(var).cast("double")
    s1 = cube.withColumn("__zc", v) \
        .withColumn("__zw", F.lag(v).over(wx)) \
        .withColumn("__ze", F.lead(v).over(wx))
    wy = Window.partitionBy(time_col, x_col).orderBy(y_col)
    cols = {}
    for base, nm in (("__zw", "w"), ("__zc", "c"), ("__ze", "e")):
        cols[f"n{nm}"] = F.lag(base).over(wy)
        cols[f"c{nm}"] = F.col(base)
        cols[f"s{nm}"] = F.lead(base).over(wy)
    s2 = s1
    for name, c in cols.items():
        s2 = s2.withColumn(f"__{name}", c)
    g = {k: F.col(f"__{k}") for k in cols}
    dzdx = ((g["ne"] + F.lit(2.0) * g["ce"] + g["se"])
            - (g["nw"] + F.lit(2.0) * g["cw"] + g["sw"])) / F.lit(8.0)
    dzdy = ((g["sw"] + F.lit(2.0) * g["sc"] + g["se"])
            - (g["nw"] + F.lit(2.0) * g["nc"] + g["ne"])) / F.lit(8.0)
    dzdx = dzdx * F.lit(z_factor)
    dzdy = dzdy * F.lit(z_factor)
    slope_deg = F.atan(F.sqrt(dzdx * dzdx + dzdy * dzdy)) \
        * F.lit(RAD2DEG)
    asp = F.atan2(dzdy, -dzdx) * F.lit(RAD2DEG)
    compass = ((F.lit(90.0) - asp) % F.lit(360.0) + F.lit(360.0)) \
        % F.lit(360.0)
    flat = (dzdx == F.lit(0.0)) & (dzdy == F.lit(0.0))
    present = None
    for k in g:
        cond = g[k].isNotNull()
        present = cond if present is None else (present & cond)
    out = (
        s2.withColumn(f"{var}_slope_deg", F.when(present, slope_deg))
        .withColumn(
            f"{var}_aspect_deg",
            F.when(present,
                   F.when(flat, F.lit(-1.0)).otherwise(compass)))
    )
    return out.drop("__zc", "__zw", "__ze",
                    *[f"__{k}" for k in cols])


def slope_aspect_sql(
    var: str,
    src: str = "cube",
    time_col: str = "time",
    y_col: str = "y",
    x_col: str = "x",
    z_factor: float = 1.0,
) -> str:
    """DuckDB twin of :func:`slope_aspect` — identical two-pass
    stencil, identical branch-free compass form, same RAD2DEG double
    literal.  Produces ``(time, y, x, {var}_slope_deg,
    {var}_aspect_deg)`` (interior cells)."""
    v = f"CAST({var} AS DOUBLE)"
    wx = f"(PARTITION BY {time_col}, {y_col} ORDER BY {x_col})"
    stage1 = (f"SELECT {time_col}, {y_col}, {x_col}, {v} AS zc, "
              f"LAG({v}) OVER {wx} AS zw, "
              f"LEAD({v}) OVER {wx} AS ze FROM {src}")
    wy = f"(PARTITION BY {time_col}, {x_col} ORDER BY {y_col})"
    sel = []
    for base, nm in (("zw", "w"), ("zc", "c"), ("ze", "e")):
        sel.append(f"LAG({base}) OVER {wy} AS n{nm}")
        sel.append(f"{base} AS c{nm}")
        sel.append(f"LEAD({base}) OVER {wy} AS s{nm}")
    stage2 = (f"SELECT {time_col}, {y_col}, {x_col}, "
              + ", ".join(sel) + f" FROM ({stage1})")
    dzdx = ("(((ne + (2.0 * ce)) + se) - ((nw + (2.0 * cw)) + sw))"
            f" / 8.0 * {z_factor!r}")
    dzdy = ("(((sw + (2.0 * sc)) + se) - ((nw + (2.0 * nc)) + ne))"
            f" / 8.0 * {z_factor!r}")
    slope = (f"atan(sqrt(({dzdx}) * ({dzdx}) + ({dzdy}) * ({dzdy})))"
             f" * {RAD2DEG!r}")
    asp = f"atan2(({dzdy}), -({dzdx})) * {RAD2DEG!r}"
    compass = f"(((90.0 - ({asp})) % 360.0 + 360.0) % 360.0)"
    flat = f"(({dzdx}) = 0.0 AND ({dzdy}) = 0.0)"
    notnull = " AND ".join(
        f"{c} IS NOT NULL"
        for c in ("nw", "nc", "ne", "cw", "cc", "ce", "sw", "sc", "se"))
    return (f"SELECT {time_col}, {y_col}, {x_col}, "
            f"({slope}) AS {var}_slope_deg, "
            f"CASE WHEN {flat} THEN -1.0 ELSE {compass} END"
            f" AS {var}_aspect_deg "
            f"FROM ({stage2}) WHERE {notnull}")


#: "infinite" cost for unmasked cells in the distance transform —
#: far above any reachable grid distance, far below BIGINT overflow
DT_INF = 1 << 40


def distance_transform(
    cube: DataFrame,
    mask: Column,
    time_col: str = "time",
    y_col: str = "y",
    x_col: str = "x",
) -> DataFrame:
    """Manhattan (L1) distance transform over the cube grid: each
    cell's distance (in cells) to the nearest cell where ``mask``
    holds — the classic EO masking derivative (distance-to-cloud /
    distance-to-coast buffers: "drop pixels within k cells of a
    cloud" needs exactly this raster).

    The L1 transform is SEPARABLE and each 1-D pass is a min-plus
    convolution with |i - j|, which windows express EXACTLY:
    ``min_j (c_j + |i-j|) = min(i + runmin_{j<=i}(c_j - j),
    -i + runmin_{j>=i}(c_j + j))`` — a running min over the ascending
    frame plus one over the descending frame, both riding the same
    partition sort.  Two passes (x within each (time, y) row, then y
    within each (time, x) column) = two exchanges total, no explode,
    no join, and — cost being 0 or :data:`DT_INF` — ALL arithmetic is
    exact BIGINT: the output is integer-identical on any engine.

    Adds ``dist`` (BIGINT; NULL when no masked cell exists in the
    cell's (time) slice).
    """
    big = F.lit(DT_INF).cast("long")
    c0 = F.when(mask, F.lit(0).cast("long")).otherwise(big)
    wxa = (Window.partitionBy(time_col, y_col).orderBy(x_col)
           .rowsBetween(Window.unboundedPreceding, 0))
    wxd = (Window.partitionBy(time_col, y_col)
           .orderBy(F.desc(x_col))
           .rowsBetween(Window.unboundedPreceding, 0))
    x = F.col(x_col).cast("long")
    s1 = cube.withColumn("__c0", c0)
    d1 = F.least(
        x + F.min(F.col("__c0") - x).over(wxa),
        -x + F.min(F.col("__c0") + x).over(wxd))
    s1 = s1.withColumn("__d1", d1)
    wya = (Window.partitionBy(time_col, x_col).orderBy(y_col)
           .rowsBetween(Window.unboundedPreceding, 0))
    wyd = (Window.partitionBy(time_col, x_col)
           .orderBy(F.desc(y_col))
           .rowsBetween(Window.unboundedPreceding, 0))
    y = F.col(y_col).cast("long")
    d2 = F.least(
        y + F.min(F.col("__d1") - y).over(wya),
        -y + F.min(F.col("__d1") + y).over(wyd))
    out = s1.withColumn(
        "dist",
        F.when(d2 < F.lit(DT_INF // 2).cast("long"), d2))
    return out.drop("__c0", "__d1")


def distance_transform_sql(
    mask_sql: str,
    src: str = "cube",
    time_col: str = "time",
    y_col: str = "y",
    x_col: str = "x",
) -> str:
    """DuckDB twin of :func:`distance_transform` — identical
    min-plus running-min passes, identical DT_INF, all BIGINT."""
    big = DT_INF
    wxa = (f"(PARTITION BY {time_col}, {y_col} ORDER BY {x_col} "
           f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    wxd = (f"(PARTITION BY {time_col}, {y_col} ORDER BY {x_col} DESC "
           f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    stage1 = f"""
        SELECT *, CASE WHEN {mask_sql} THEN CAST(0 AS BIGINT)
                       ELSE CAST({big} AS BIGINT) END AS c0
        FROM {src}"""
    stage2 = f"""
        SELECT *, least(
            CAST({x_col} AS BIGINT)
                + MIN(c0 - CAST({x_col} AS BIGINT)) OVER {wxa},
            -CAST({x_col} AS BIGINT)
                + MIN(c0 + CAST({x_col} AS BIGINT)) OVER {wxd}) AS d1
        FROM ({stage1})"""
    wya = (f"(PARTITION BY {time_col}, {x_col} ORDER BY {y_col} "
           f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    wyd = (f"(PARTITION BY {time_col}, {x_col} ORDER BY {y_col} DESC "
           f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    stage3 = f"""
        SELECT {time_col}, {y_col}, {x_col}, least(
            CAST({y_col} AS BIGINT)
                + MIN(d1 - CAST({y_col} AS BIGINT)) OVER {wya},
            -CAST({y_col} AS BIGINT)
                + MIN(d1 + CAST({y_col} AS BIGINT)) OVER {wyd}) AS d2
        FROM ({stage2})"""
    return (f"SELECT {time_col}, {y_col}, {x_col}, "
            f"CASE WHEN d2 < {big // 2} THEN d2 END AS dist "
            f"FROM ({stage3})")
