"""True B-spline resampling, orders 2-5 —
xcube/core/resampling/affine.py:152-158 (``spline_order`` 2..5 via
``dask_image.ndinterp.affine_transform`` -> scipy ``map_coordinates``).

scipy's spline interpolation is NOT a local convolution: it first runs
a global *prefilter* that turns samples into B-spline coefficients
(the banded interpolation system), then evaluates the (n+1)-point
B-spline basis at the fractional position.  The Spark restatement
keeps both steps distributed:

1. **prefilter** — the per-line banded Toeplitz system
   ``sum_k b_n(j - k) c[k] = x[j]`` with mirror boundaries is solved
   line-by-line: one ``applyInPandas`` grouped by (t_i, y_i) solves
   along x, a second grouped by (t_i, x_i) solves along y (the tensor
   product separates).  Each task holds one line (<= grid width), so
   the "global" filter costs exactly two uniform shuffles.
2. **gather** — the target cells join the (n+1)^2 coefficient
   neighbors with separable basis weights, mirror-reflected at the
   edges; identical join shape to the bilinear/bicubic families in
   affine.py.

Because the prefilter inverts the basis exactly, resampling onto the
source grid itself reproduces the input bit-near-exactly (the
interpolation property) — the test oracle, plus an independent dense
``np.linalg.solve`` restatement of the coefficient system.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame

from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid

#: centered B-spline basis values at integer offsets (the band of the
#: interpolation system): order -> {offset: weight}
BSPLINE_BANDS: dict[int, dict[int, float]] = {
    2: {0: 3.0 / 4.0, 1: 1.0 / 8.0},
    3: {0: 2.0 / 3.0, 1: 1.0 / 6.0},
    4: {0: 115.0 / 192.0, 1: 19.0 / 96.0, 2: 1.0 / 384.0},
    5: {0: 11.0 / 20.0, 1: 13.0 / 60.0, 2: 1.0 / 120.0},
}


def bspline_weight(order: int, s: Column) -> Column:
    """The centered B-spline basis b_n evaluated at (Column) offset
    ``s`` — standard piecewise polynomials (public; e.g. Unser 1999)."""
    a = F.abs(s)
    a2 = a * a
    a3 = a2 * a
    if order == 2:
        return (
            F.when(a <= 0.5, F.lit(0.75) - a2)
            .when(a <= 1.5, (a - 1.5) * (a - 1.5) * 0.5)
            .otherwise(F.lit(0.0))
        )
    if order == 3:
        return (
            F.when(a <= 1.0, F.lit(2.0 / 3.0) - a2 + a3 / 2)
            .when(a <= 2.0, (2.0 - a) * (2.0 - a) * (2.0 - a) / 6.0)
            .otherwise(F.lit(0.0))
        )
    if order == 4:
        a4 = a2 * a2
        return (
            F.when(a <= 0.5, F.lit(115.0 / 192.0) - a2 * (5.0 / 8.0)
                   + a4 / 4.0)
            .when(a <= 1.5, (F.lit(55.0) + 20.0 * a - 120.0 * a2
                             + 80.0 * a3 - 16.0 * a4) / 96.0)
            .when(a <= 2.5, F.pow(2.5 - a, F.lit(4.0)) / 24.0)
            .otherwise(F.lit(0.0))
        )
    if order == 5:
        a4, a5 = a2 * a2, a2 * a3
        return (
            F.when(a <= 1.0, F.lit(11.0 / 20.0) - a2 / 2 + a4 / 4 - a5 / 12)
            .when(a <= 2.0, F.lit(17.0 / 40.0) + a * (5.0 / 8.0)
                  - a2 * (7.0 / 4.0) + a3 * (5.0 / 4.0)
                  - a4 * (3.0 / 8.0) + a5 / 24.0)
            .when(a <= 3.0, F.pow(3.0 - a, F.lit(5.0)) / 120.0)
            .otherwise(F.lit(0.0))
        )
    raise ValueError(f"unsupported B-spline order {order}")


def solve_coeff_line(x: np.ndarray, order: int) -> np.ndarray:
    """Solve the 1-D B-spline coefficient system for one sample line
    with mirror (reflect-at-sample) boundaries.

    The system is symmetric banded Toeplitz (band = BSPLINE_BANDS);
    mirror boundaries fold the out-of-range coefficients back
    (c[-k] = c[k]), which just adds the reflected band entries to the
    first/last rows.  Solved with a plain banded LU (Thomas-style
    forward elimination) — O(N * band^2), no external libs."""
    band = BSPLINE_BANDS[order]
    n = len(x)
    p = max(band)
    if n == 1:
        return x / sum(band.get(abs(k), 0.0) for k in range(-p, p + 1))
    # build the folded banded matrix rows: A[i][j] over |i-j| <= p
    a = np.zeros((n, 2 * p + 1))  # a[i, p + (j - i)]
    for i in range(n):
        for k in range(-p, p + 1):
            j = i + k
            w = band.get(abs(k))
            if w is None or w == 0.0:
                continue
            # mirror fold: j < 0 -> -j; j > n-1 -> 2(n-1) - j
            # (repeat for lines shorter than the band)
            jf = j
            while jf < 0 or jf > n - 1:
                jf = -jf if jf < 0 else 2 * (n - 1) - jf
            a[i, p + (jf - i)] += w
    # dense-banded LU without pivoting (the system is diagonally
    # dominant for every order here)
    c = x.astype("float64").copy()
    for i in range(n - 1):
        for r in range(i + 1, min(i + p + 1, n)):
            off = p + (i - r)
            if a[r, off] == 0.0:
                continue
            f = a[r, off] / a[i, p]
            for k in range(0, p + 1):
                if i + k < n and p + (i + k - r) <= 2 * p:
                    a[r, p + (i + k - r)] -= f * a[i, p + k]
            c[r] -= f * c[i]
    for i in range(n - 1, -1, -1):
        s = c[i]
        for k in range(1, p + 1):
            if i + k < n:
                s -= a[i, p + k] * c[i + k]
        c[i] = s / a[i, p]
    return c


def _prefilter_pass(cube: DataFrame, vars_: list[str], order: int,
                    line_key: tuple[str, str], pos: str) -> DataFrame:
    """One separable prefilter direction: group to full lines, solve
    the coefficient system per line per variable."""
    import pandas as pd

    cols = list(cube.columns)

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(pos)
        for v in vars_:
            pdf[v] = solve_coeff_line(pdf[v].to_numpy("float64"), order)
        return pdf

    schema = ", ".join(
        f"`{c}` {'INT' if c in ('t_i', 'y_i', 'x_i') else 'DOUBLE'}"
        for c in cols)
    return cube.groupBy(*line_key).applyInPandas(solve, schema)


def bspline_transform_dataset(
    cube: DataFrame,
    source: CubeGrid,
    target: CubeGrid,
    order: int,
    var_names: list[str] | None = None,
) -> DataFrame:
    """Affine resampling with TRUE B-spline interpolation of order
    2-5 (scipy ``map_coordinates`` semantics, mirror boundary):
    distributed prefilter (two grouped line passes) + (n+1)^2-point
    basis gather."""
    from xcube_spark.cube.grid import var_names as cube_vars
    from xcube_spark.operators.resampling.affine import (
        _source_frac_index, _target_index_table)

    if order not in BSPLINE_BANDS:
        raise ValueError(f"unsupported B-spline order {order}")
    vars_ = list(var_names) if var_names is not None else cube_vars(cube)
    spark = cube.sparkSession

    coeff = cube.select("t_i", "y_i", "x_i", *vars_)
    coeff = _prefilter_pass(coeff, vars_, order, ("t_i", "y_i"), "x_i")
    coeff = _prefilter_pass(coeff, vars_, order, ("t_i", "x_i"), "y_i")
    coeff = coeff.select(
        F.col("t_i").alias("__st"), F.col("y_i").alias("__sy"),
        F.col("x_i").alias("__sx"), *vars_)

    tgt = _target_index_table(spark, target)
    fx = _source_frac_index(source, F.col("x"), "x")
    fy = _source_frac_index(source, F.col("y"), "y")
    tgt = tgt.withColumns({"__fx": fx, "__fy": fy})

    # stencil anchors: n+1 consecutive coefficients around the position
    if order % 2:
        y0 = F.floor("__fy").cast("int")
        x0 = F.floor("__fx").cast("int")
        offs = range(-(order // 2), order // 2 + 2)
    else:
        y0 = F.round("__fy").cast("int")
        x0 = F.round("__fx").cast("int")
        offs = range(-(order // 2), order // 2 + 1)
    ty = F.col("__fy") - y0
    tx = F.col("__fx") - x0
    # evaluate the 1-D basis once per axis offset (2(n+1) piecewise
    # polynomials instead of 2(n+1)^2 — keeps codegen under the 64 KB
    # method limit for the 25/36-point stencils)
    offs = list(offs)
    tgt = tgt.withColumns({
        **{f"__wy{i}": bspline_weight(order, F.lit(dy) - ty)
           for i, dy in enumerate(offs)},
        **{f"__wx{i}": bspline_weight(order, F.lit(dx) - tx)
           for i, dx in enumerate(offs)},
    })

    def mirror(idx: Column, size: int) -> Column:
        # exact repeated reflection in closed form (period 2(size-1)),
        # so even grids narrower than the stencil fold correctly —
        # matching solve_coeff_line's fold loop
        if size == 1:
            return F.lit(0)
        period = 2 * (size - 1)
        m = F.pmod(idx, F.lit(period))
        return F.least(m, F.lit(period) - m)

    corners = F.array(*[
        F.struct(
            mirror(y0 + dy, source.height).alias("__sy"),
            mirror(x0 + dx, source.width).alias("__sx"),
            (F.col(f"__wy{i}") * F.col(f"__wx{j}")).alias("__w"),
        )
        for i, dy in enumerate(offs) for j, dx in enumerate(offs)
    ])
    expl = tgt.select(
        "t_i", "y_i", "x_i", "time", "y", "x",
        F.explode(corners).alias("c")
    ).select(
        "t_i", "y_i", "x_i", "time", "y", "x",
        F.col("c.__sy").alias("__sy"), F.col("c.__sx").alias("__sx"),
        F.col("c.__w").alias("__w"),
    )
    if target.size <= 4_000_000:
        expl = F.broadcast(expl)
    joined = expl.join(
        coeff,
        on=[F.col("t_i") == F.col("__st"),
            expl["__sy"] == coeff["__sy"],
            expl["__sx"] == coeff["__sx"]],
        how="left",
    )
    aggs = [F.first(c).alias(c) for c in ("time", "y", "x")]
    for v in vars_:
        # mirror folding can hit the same coefficient twice, so weights
        # simply sum; basis weights partition unity on a full stencil
        aggs.append(F.sum(F.col("__w") * F.col(v)).alias(v))
    return joined.groupBy("t_i", "y_i", "x_i").agg(*aggs).select(
        "t_i", "y_i", "x_i", "time", "y", "x", *vars_)
