"""Temporal resampling — xcube/core/resampling/temporal.py:17-161.

``resample_in_time``: resample the time dimension to a frequency.

- **Downsampling** (frequency coarser than data): per-window aggregation
  with methods all/any/argmax/argmin/count/first/last/min/max/mean/
  median/percentile_<p>/std/sum/var (cli/resample.py:18-32).  Spark
  mapping: ``groupBy(date_trunc | window(time, freq))`` + agg exprs —
  one partially-aggregated shuffle keyed by window start.
- **Upsampling** (frequency finer than data): asfreq/ffill/bfill/pad/
  nearest/interpolate.  Spark mapping: dense target axis (``sequence``)
  left-joined to the data, gaps filled with ordered-window functions
  (``last(ignorenulls)`` / ``first`` over following rows / linear
  interpolation from both).

Output columns follow the reference's ``{var}_{method}`` naming
(temporal.py:117-140); aggregations skip NULLs = skipna=True parity
(temporal.py:154).
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: downsampling frequency units -> Spark date_trunc/window specs
_FREQ = {
    "min": "minute",
    "T": "minute",
    "H": "hour",
    "D": "day",
    "W": "week",
    "M": "month",
    "Q": "quarter",
    "Y": "year",
}

_PERCENTILE_RE = re.compile(r"^percentile_(\d+(?:\.\d+)?)$")


def _down_agg(var: str, method: str) -> Column:
    c = F.col(var)
    m = _PERCENTILE_RE.match(method)
    if m:
        q = float(m.group(1)) / 100.0
        return F.expr(f"percentile({var}, {q})").alias(f"{var}_{method}")
    e = {
        # thunks, not Columns: eagerly building all 15 expressions per
        # call cost ~60 py4j round trips each when only one is used
        # (r12 — plan-build time, not plan shape)
        "all": lambda: F.min(c.cast("boolean")),
        "any": lambda: F.max(c.cast("boolean")),
        "count": lambda: F.count(c),
        # skipna parity with xarray's resample .first()/.last(): order
        # only over rows where the value is non-null (a NULL ordering
        # key excludes the row from min_by/max_by), so the first/last
        # VALID value wins, not a NULL that happens to sit at the edge
        "first": lambda: F.min_by(c, F.when(c.isNotNull(),
                                            F.col("time"))),
        "last": lambda: F.max_by(c, F.when(c.isNotNull(),
                                           F.col("time"))),
        "min": lambda: F.min(c),
        "max": lambda: F.max(c),
        "argmax": lambda: F.max_by(F.col("time"), c),
        "argmin": lambda: F.min_by(F.col("time"), c),
        "mean": lambda: F.avg(c),
        "median": lambda: F.expr(f"percentile({var}, 0.5)"),
        "std": lambda: F.stddev_pop(c),
        "var": lambda: F.var_pop(c),
        "sum": lambda: F.sum(c),
    }.get(method)
    if e is None:
        raise ValueError(f"unsupported downsampling method {method!r}")
    return e().alias(f"{var}_{method}")


def parse_frequency(frequency: str) -> tuple[int, str]:
    """'8D' -> (8, 'D'); 'D' -> (1, 'D'); '30min'/'30T' -> (30, 'min');
    'all' handled by caller."""
    m = re.match(r"^(\d*)(min|[THDWMQY])$", frequency)
    if not m:
        raise ValueError(f"invalid frequency {frequency!r}")
    return int(m.group(1) or 1), m.group(2)


def resample_in_time(
    cube: DataFrame,
    frequency: str,
    methods: Sequence[str] = ("mean",),
    var_names: Iterable[str] | None = None,
    time_name: str = "time",
) -> DataFrame:
    """Downsample to ``frequency`` (e.g. '1D', '2W', 'M', 'all') with one
    or more aggregation methods; outputs ``{var}_{method}`` columns and
    the window-start ``time`` column (temporal.py:17-161)."""
    from xcube_spark.cube.grid import var_names as cube_vars

    vars_ = list(var_names) if var_names is not None else cube_vars(cube)
    group_keys = [c for c in ("t_i", "y_i", "x_i") if c in cube.columns]
    group_keys = [k for k in group_keys if k != "t_i"]  # time folds away

    if frequency == "all":
        key = F.lit(None).cast("timestamp").alias("time")
        grouped = cube.groupBy(*group_keys) if group_keys else cube.groupBy()
        aggs = [_down_agg(v, m) for v in vars_ for m in methods]
        out = grouped.agg(*aggs)
        return out.select(key, *out.columns)

    n, unit = parse_frequency(frequency)
    if n == 1:
        key = F.date_trunc(_FREQ[unit], F.col(time_name)).alias("time")
    else:
        if unit not in ("H", "D", "W"):
            raise ValueError(
                f"multiples only supported for H/D/W frequencies, got {frequency!r}"
            )
        secs = {"H": 3600, "D": 86400, "W": 7 * 86400}[unit] * n
        # fixed-width windows anchored at the epoch
        key = F.timestamp_seconds(
            (F.floor(F.col(time_name).cast("double") / secs) * secs).cast("long")
        ).alias("time")

    aggs = [_down_agg(v, m) for v in vars_ for m in methods]
    return cube.groupBy(key, *group_keys).agg(*aggs)


def upsample_in_time(
    series: DataFrame,
    frequency: str,
    method: str = "ffill",
    var_names: Iterable[str] | None = None,
    time_name: str = "time",
) -> DataFrame:
    """Upsample a (time-keyed) series to a finer frequency.

    Methods (cli/resample.py:18-32): asfreq (introduce NULL gaps),
    ffill/pad, bfill, nearest, interpolate (linear in time).

    The dense axis comes from ``sequence(min, max, interval)`` — an
    axis-table build, tiny next to the data; the join then broadcasts.
    Assumes a per-time-step series (the output of a prior aggregation),
    matching the reference, which upsamples along time only.
    """
    vars_ = (
        list(var_names)
        if var_names is not None
        else [c for c in series.columns if c != time_name]
    )
    n, unit = parse_frequency(frequency)
    interval = F.expr(f"INTERVAL {n} {_FREQ[unit].upper()}")
    bounds = series.agg(
        F.min(time_name).alias("lo"), F.max(time_name).alias("hi")
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", interval)).alias(time_name)
    )
    joined = grid.join(series, on=time_name, how="left")

    if method == "asfreq":
        return joined

    w_prev = Window.orderBy(time_name).rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy(time_name).rowsBetween(0, Window.unboundedFollowing)

    out = joined
    for v in vars_:
        c = F.col(v)
        if method in ("ffill", "pad"):
            filled = F.last(c, ignorenulls=True).over(w_prev)
        elif method == "bfill":
            filled = F.first(c, ignorenulls=True).over(w_next)
        elif method == "nearest":
            pt = F.max(F.when(c.isNotNull(), F.col(time_name))).over(w_prev)
            nt = F.min(F.when(c.isNotNull(), F.col(time_name))).over(w_next)
            pv = F.last(c, ignorenulls=True).over(w_prev)
            nv = F.first(c, ignorenulls=True).over(w_next)
            t = F.col(time_name).cast("double")
            filled = F.when(c.isNotNull(), c).otherwise(
                F.when(
                    nt.isNull()
                    | (
                        pt.isNotNull()
                        & ((t - pt.cast("double")) <= (nt.cast("double") - t))
                    ),
                    pv,
                ).otherwise(nv)
            )
        elif method == "interpolate":
            pt = F.max(F.when(c.isNotNull(), F.col(time_name))).over(w_prev)
            nt = F.min(F.when(c.isNotNull(), F.col(time_name))).over(w_next)
            pv = F.last(c, ignorenulls=True).over(w_prev)
            nv = F.first(c, ignorenulls=True).over(w_next)
            t = F.col(time_name).cast("double")
            frac = (t - pt.cast("double")) / (nt.cast("double") - pt.cast("double"))
            filled = F.when(c.isNotNull(), c).otherwise(
                F.when(pt.isNull(), nv)
                .when(nt.isNull(), pv)
                .otherwise(pv + (nv - pv) * frac)
            )
        else:
            raise ValueError(f"unsupported upsampling method {method!r}")
        out = out.withColumn(v, filled)
    return out


def ema_smooth(
    df: DataFrame,
    value_col: str,
    key_col: str,
    order_cols,
    alpha: float = 0.25,
    window: int = 16,
) -> Column:
    """Windowed exponential-moving-average smoothing: per ``key_col``
    series ordered by ``order_cols``, the weighted mean of the last
    ``window`` values with weights ``(1 - alpha)^i`` (i = lag
    distance), normalized over the weights actually present — the
    exponential-kernel twin of the trailing-range mean in
    ``events_rolling_1h`` (reference temporal smoothing surface:
    resample_in_time's rolling aggregations, core/resampling/
    temporal.py).

    Returns the smoothed COLUMN (caller selects it), built as
    ``window`` unrolled ``lag`` terms summed in a FIXED left-to-right
    order: with ``alpha`` an exact binary fraction, every weight
    ``0.75^i = 3^i / 4^i`` is exactly representable, each term is one
    IEEE multiply, and the whole fold is bit-identical on any engine
    that evaluates the same shape (no accumulator, no summation-order
    freedom).

    Scale shape: one shuffle on ``key_col``; the ``window`` lags
    all ride the SAME sorted frame (a single per-partition pass), so
    cost is O(window) arithmetic per row with no extra exchanges.

    ``order_cols`` entries may be Columns or SQL fragments (strings).
    When ALL entries are strings the whole fold is built as ONE
    ``F.expr`` string: the unrolled shape makes ~30 ``when``/``lag``/
    arithmetic Column calls, each a py4j round trip, so plan BUILD
    dominated the bench row (~0.5-0.8 s/invocation measured r12);
    one parsed expression is one round trip.  The parsed tree is the
    IDENTICAL CaseWhen/lag fold (``repr(w)``-D literals round-trip
    doubles exactly; verified bit-identical over sf0.01, and the
    shared oracle pins it).
    """
    from pyspark.sql.window import Window

    decay = 1.0 - alpha
    if all(isinstance(c, str) for c in order_cols):
        over = (f"PARTITION BY {key_col} "
                f"ORDER BY {', '.join(order_cols)}")
        num_t, den_t = [], []
        for i in range(window):
            wt = f"{decay ** i!r}D"
            x = (value_col if i == 0
                 else f"lag({value_col}, {i}) OVER ({over})")
            num_t.append(
                f"CASE WHEN {x} IS NOT NULL THEN {wt} * {x} "
                f"ELSE 0.0D END")
            den_t.append(
                f"CASE WHEN {x} IS NOT NULL THEN {wt} ELSE 0.0D END")
        ns, ds = num_t[0], den_t[0]
        for t in num_t[1:]:
            ns = f"({ns} + {t})"
        for t in den_t[1:]:
            ds = f"({ds} + {t})"
        return F.expr(f"({ns}) / ({ds})")

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    num = None
    den = None
    for i in range(window):
        wt = decay ** i
        x = F.col(value_col) if i == 0 else F.lag(value_col, i).over(w)
        term = F.when(x.isNotNull(), F.lit(wt) * x).otherwise(F.lit(0.0))
        pres = F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = pres if den is None else den + pres
    return num / den


def holt_coefficients(
    alpha: float, beta: float, window: int
) -> tuple[list[float], list[float]]:
    """Impulse-response coefficients of Holt's linear (double
    exponential) smoothing, truncated to ``window`` taps.

    The textbook recursion
    ``l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1})``,
    ``b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}``
    is a linear time-invariant system ``s_t = A s_{t-1} + g x_t`` with
    ``A = [[1-a, 1-a], [-aB, 1-aB]]`` and ``g = [a, aB]``, so the
    state is the convolution ``s_t = sum_i (A^i g) x_{t-i}``.  The
    taps ``A^i g`` decay geometrically (spectral radius < 1 for
    0 < a,B < 1), so a fixed truncation is the windowed-filter form of
    Holt — same trick as ``ema_smooth``'s truncated EMA.

    Returned as two Python-double lists (level taps, trend taps)
    computed once with a FIXED multiply/add sequence; callers embed
    them as literals in both the Spark expression and the SQL twin,
    so cross-engine identity is by construction (the DFT-twiddle
    discipline — the literal IS the contract, not the arithmetic).
    """
    li, bi = [alpha], [alpha * beta]
    for _ in range(1, window):
        l_prev, b_prev = li[-1], bi[-1]
        li.append((1.0 - alpha) * l_prev + (1.0 - alpha) * b_prev)
        bi.append(-(alpha * beta) * l_prev + (1.0 - alpha * beta) * b_prev)
    return li, bi


def holt_smooth(
    df: DataFrame,
    value_col: str,
    key_col: str,
    order_cols,
    alpha: float = 0.5,
    beta: float = 0.25,
    window: int = 12,
) -> DataFrame:
    """Windowed Holt linear-trend (double exponential) smoothing per
    series: level, trend, and one-step forecast (level + trend) as
    fixed ``window``-tap FIR filters over the trailing values — the
    trend-aware companion of ``ema_smooth`` (reference temporal
    smoothing surface: resample_in_time, core/resampling/temporal.py).

    Rows with fewer than ``window`` predecessors emit NULL (the
    ``rolling_trend`` full-window contract).  Each output is a fixed
    left-associated fold of ``lit(tap) * lag(value, i)`` terms riding
    ONE sorted frame — bit-identical on any engine evaluating the
    same shape, absorbed by the caller's nudged round.

    Adds ``holt_level``, ``holt_trend``, ``holt_forecast`` (raw
    doubles).  Scale shape: one hash exchange on ``key_col`` + one
    sort; O(window) arithmetic per row, no extra exchanges.
    """
    if window < 1:
        raise ValueError(f"holt_smooth window must be >= 1, got {window}")
    li, bi = holt_coefficients(alpha, beta, window)
    if all(isinstance(c, str) for c in order_cols):
        # one parsed expression per output instead of ~50 Column-API
        # py4j round trips (same rationale and same verified-identical
        # fold shape as ema_smooth's string path above)
        over = (f"PARTITION BY {key_col} "
                f"ORDER BY {', '.join(order_cols)}")
        lev_t, tre_t = [], []
        for i in range(window):
            x = (value_col if i == 0
                 else f"lag({value_col}, {i}) OVER ({over})")
            lev_t.append(f"{li[i]!r}D * {x}")
            tre_t.append(f"{bi[i]!r}D * {x}")
        ls, ts = lev_t[0], tre_t[0]
        for t in lev_t[1:]:
            ls = f"({ls} + {t})"
        for t in tre_t[1:]:
            ts = f"({ts} + {t})"
        full = f"(row_number() OVER ({over})) >= {window}"
        return (
            df.withColumn(
                "holt_level",
                F.expr(f"CASE WHEN {full} THEN ({ls}) END"))
            .withColumn(
                "holt_trend",
                F.expr(f"CASE WHEN {full} THEN ({ts}) END"))
            .withColumn("holt_forecast",
                        F.col("holt_level") + F.col("holt_trend"))
        )
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    lev = None
    tre = None
    for i in range(window):
        x = F.col(value_col) if i == 0 else F.lag(value_col, i).over(w)
        lt = F.lit(li[i]) * x
        bt = F.lit(bi[i]) * x
        lev = lt if lev is None else lev + lt
        tre = bt if tre is None else tre + bt
    rn = F.row_number().over(w)
    full = rn >= window
    return (
        df.withColumn("holt_level", F.when(full, lev))
        .withColumn("holt_trend", F.when(full, tre))
        .withColumn("holt_forecast",
                    F.when(full, F.col("holt_level")
                           + F.col("holt_trend")))
    )


def cusum_drift(
    df: DataFrame,
    value_col: str,
    key_col: str,
    order_cols,
    k: float = 0.0,
    h: float = 100.0,
) -> DataFrame:
    """One-sided CUSUM drift/changepoint detection per series.

    The textbook recursion ``S_t = max(0, S_{t-1} + x_t - k)`` is not
    window-expressible, but the closed form is:
    ``S_t = C_t - min(0, min_{i<=t}(C_i))`` with ``C_t`` the running
    sum of ``x - k`` — the 0 term is the empty prefix ``C_0 = 0``
    (without it, a series whose running sum stays positive from the
    first event would be underestimated and the first row would
    always emit 0 instead of ``x_1 - k``) — two window passes over
    the SAME sorted frame (one exchange, one sort).  Rows with ``S`` above the decision
    threshold ``h`` flag a sustained upward drift (the monitoring
    primitive for data-quality regressions in an ingest stream).

    Adds ``cusum`` (raw double — round in the caller) and ``drift``
    (computed from the ROUNDED statistic by the caller, to keep both
    engines in lockstep).  Returns the input plus ``cusum``.

    Scale shape: one hash exchange on ``key_col`` + one sort; both
    the running sum and the running min are O(1)-state streaming
    frames.  Running sums accumulate in the SAME (ts, id) order on
    any engine, so cross-engine noise is sub-ulp-per-row and the
    caller's rounding absorbs it.
    """
    w = (Window.partitionBy(key_col).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = F.sum(F.col(value_col) - F.lit(k)).over(w)
    out = df.withColumn("__c", c)
    w2 = (Window.partitionBy(key_col).orderBy(*order_cols)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        out.withColumn(
            "cusum",
            F.col("__c")
            - F.least(F.lit(0.0), F.min("__c").over(w2)))
        .drop("__c")
    )


def hampel_filter(
    df: DataFrame,
    value_col: str,
    key_col: str,
    order_cols,
    window: int = 15,
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Hampel filter per series: rolling median / rolling MAD outlier
    detection and repair over the trailing ``window`` values — the
    ROLLING companion of the global median/MAD gate in
    ``events_mad_outliers`` (robust data-quality filtering for
    non-stationary streams, where a global median misses level
    shifts).

    The trailing values are gathered into an array of ``window``
    unrolled lags and SORTED; with ``window`` odd, the median is an
    exact ELEMENT (no interpolation, no arithmetic) and the MAD is
    the exact middle of the absolute deviations — both bit-identical
    on any engine with the same total order on doubles.  The robust
    z-score ``(x - med) / (1.4826 * mad)`` is three IEEE ops on
    identical inputs (no reassociation freedom).  Rows with fewer
    than ``window`` predecessors emit NULLs; windows with
    ``mad == 0`` (constant plateaus) emit NULL z and flag
    only exact deviations from the median.

    Adds ``roll_med``, ``roll_mad``, ``robust_z`` (raw doubles —
    round in the caller), ``outlier`` (int), and ``hampel_value``
    (the repaired series: median where flagged, else the value).

    Scale shape: one hash exchange on ``key_col`` + one sort; the
    lags ride one frame and the two ``window``-element sorts are
    O(window log window) per row with no extra exchanges.
    """
    if window < 1 or window % 2 == 0:
        raise ValueError(
            f"hampel_filter window must be a positive ODD integer "
            f"(exact-element median contract), got {window}")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    lags = [F.col(value_col) if i == 0
            else F.lag(value_col, i).over(w)
            for i in range(window)]
    mid = window // 2 + 1  # 1-based middle element
    rn = F.row_number().over(w)
    out = df.withColumn("__arr", F.when(rn >= window,
                                        F.array_sort(F.array(*lags))))
    out = out.withColumn("__med", F.element_at("__arr", mid))
    adev = [F.abs(x - F.col("__med")) for x in lags]
    out = out.withColumn(
        "__mad",
        F.when(F.col("__arr").isNotNull(),
               F.element_at(F.array_sort(F.array(*adev)), mid)))
    z = F.when(
        F.col("__mad") > 0.0,
        (F.col(value_col) - F.col("__med"))
        / (F.lit(1.4826) * F.col("__mad")))
    outlier = F.when(
        F.col("__arr").isNull(), F.lit(None).cast("int")
    ).when(
        (F.col("__mad") > 0.0) & (F.abs(z) > n_sigmas), F.lit(1)
    ).when(
        (F.col("__mad") == 0.0)
        & (F.col(value_col) != F.col("__med")), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        out.withColumn("robust_z", z)
        .withColumn("outlier", outlier)
        .withColumn(
            "hampel_value",
            F.when(F.col("outlier") == 1, F.col("__med"))
            .otherwise(F.when(F.col("__arr").isNotNull(),
                              F.col(value_col))))
        .withColumnRenamed("__med", "roll_med")
        .withColumnRenamed("__mad", "roll_mad")
        .drop("__arr")
    )


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    key_col: str,
    order_cols,
    window: int = 32,
) -> DataFrame:
    """Rolling z-score / Bollinger bands per series: over each FULL
    trailing window of ``window`` values, the mean, the sample
    standard deviation, and the current value's z-score — the rolling
    second-moment companion of ``rolling_trend`` (breakout/volatility
    detection; the bands are ``mean +- 2*sd``).

    Both moments are UNROLLED fixed-order lag folds (``sum x`` and
    ``sum x^2`` over the same frame), so there is no engine-private
    Welford/aggregate ordering anywhere; the variance is the textbook
    ``(s2 - s1*s1/n) / (n-1)`` clamped at zero (constant windows can
    go epsilon-negative), evaluated with the IDENTICAL op shape on
    both engines.  The subtraction is an FMA-contraction site
    (round-9 lesson), so callers must round with the 1e-6 nudge.
    Rows with fewer than ``window`` predecessors emit NULL.

    Adds ``roll_mean``, ``roll_sd``, ``zscore`` (raw doubles; NULL z
    for zero-variance windows).  One exchange + sort on ``key_col``;
    all lags ride one frame.
    """
    if window < 1:
        raise ValueError(
            f"rolling_zscore window must be >= 1, got {window}")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    n = float(window)
    s1 = None
    s2 = None
    for i in range(window):
        x = F.col(value_col) if i == 0 else F.lag(value_col, i).over(w)
        s1 = x if s1 is None else s1 + x
        xx = x * x
        s2 = xx if s2 is None else s2 + xx
    rn = F.row_number().over(w)
    full = rn >= window
    mean = s1 / F.lit(n)
    var = F.greatest(
        (s2 - (s1 * s1) / F.lit(n)) / F.lit(n - 1.0), F.lit(0.0))
    sd = F.sqrt(var)
    out = (
        df.withColumn("roll_mean", F.when(full, mean))
        .withColumn("roll_sd", F.when(full, sd))
    )
    z = F.when(
        F.col("roll_sd") > 0.0,
        (F.col(value_col) - F.col("roll_mean")) / F.col("roll_sd"))
    return out.withColumn("zscore", z)


def rolling_trend(
    df: DataFrame,
    value_col: str,
    key_col: str,
    order_cols,
    window: int = 32,
) -> DataFrame:
    """Rolling linear-trend slope per series: over each FULL trailing
    window of ``window`` values, the OLS slope of value against age
    (0 = newest), sign-flipped so positive = rising — the
    trend-detection primitive for drift dashboards (the linear
    companion of ``cusum_drift``'s step detector).

    With age as the regressor, the design moments are CONSTANTS
    (``n``, ``sum i``, ``sum i^2``), so the slope is a fixed linear
    combination of the ``window`` unrolled lag terms:
    ``slope = -(n * sum(i * y_i) - sum(i) * sum(y_i)) / denom`` with
    every coefficient an exact integer — the whole statistic is a
    fixed left-associated fold, bit-identical on any engine (the
    ``ema_smooth`` discipline; no window-aggregate ordering freedom
    anywhere).  Rows with fewer than ``window`` predecessors emit
    NULL.

    Adds ``trend`` (raw double; round in the caller).  One exchange +
    sort on ``key_col``; all lags ride the same frame.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    n = window
    si = n * (n - 1) // 2
    si2 = (n - 1) * n * (2 * n - 1) // 6
    denom = float(n * si2 - si * si)
    sy = None
    siy = None
    for i in range(n):
        x = F.col(value_col) if i == 0 else F.lag(value_col, i).over(w)
        sy = x if sy is None else sy + x
        term = F.lit(float(i)) * x
        siy = term if siy is None else siy + term
    rn = F.row_number().over(w)
    slope = -(F.lit(float(n)) * siy - F.lit(float(si)) * sy) \
        / F.lit(denom)
    return df.withColumn(
        "trend", F.when(rn >= n, slope))
