"""Rectification — xcube/core/resampling/rectify.py:23-852.

``rectify_dataset``: resample a cube with **irregular 2-D coordinates**
(per-pixel lat(y, x) / lon(y, x), e.g. satellite swath data) onto a
regular target grid.

The reference runs numba-JIT triangle-inversion kernels per dask block
(rectify.py:469-852).  The Spark-first design inverts the direction —
an **inverse nearest-neighbor gather via the ij-lookup table**, which is
xcube's own declared extension point (``output_ij_names`` exposes the
lookup, rectify.py:36):

1. every *source* cell computes its target index with pure Column math
   (``floor((lon - x0) / res)``) — a narrow projection over the source,
   no geometry kernels;
2. source cells landing on the same target cell reduce with
   ``min_by(distance-to-target-center)`` — one partial-agg shuffle keyed
   by target index, the exact relational analog of "each target pixel
   takes the nearest covering source pixel";
3. the reduced **ij-lookup table** (target -> source indices) is a
   reusable DataFrame: computed once per (source geometry, target grid)
   pair and equi-joined against any number of variable sets / time
   steps — the reference's design intent, made explicit.

Interpolation modes (rectify.py:20 nearest/triangular/bilinear):
- ``nearest``: min_by reduction, one source pixel per target cell;
- ``idw``: the relational stand-in for the reference's fractional
  triangular/bilinear blends — keep the k nearest covering source
  pixels per target cell (rank-k lookup) and blend with
  inverse-squared-distance weights.  Same physical shape (one ranked
  reduction + one gather join), converges to the reference's blend as
  source density grows.

Scale: both steps are linear scans + one shuffle whose key cardinality
is the *target* size; no cross products, no per-row Python.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid


def compute_ij_lookup(
    source: DataFrame,
    target: CubeGrid,
    lon_name: str = "lon",
    lat_name: str = "lat",
    k: int = 1,
) -> DataFrame:
    """The ij-lookup table: (y_i, x_i) target index -> the ``k`` nearest
    source pixels whose centers fall inside the target cell, with their
    squared center distances ``d2``.  Distinct source geometry rows only
    (one time step).  ``k=1`` is the nearest-mode lookup (min_by, no
    window); ``k>1`` ranks per target cell for the idw blend."""
    geo = source.select(
        F.col("y_i").alias("src_y_i"),
        F.col("x_i").alias("src_x_i"),
        F.col(lon_name).alias("__lon"),
        F.col(lat_name).alias("__lat"),
    ).dropDuplicates(["src_y_i", "src_x_i"])

    tx = target.x_index_expr(F.col("__lon"))
    ty = target.y_index_expr(F.col("__lat"))
    mapped = geo.withColumns({"x_i": tx, "y_i": ty}).where(
        F.col("x_i").isNotNull() & F.col("y_i").isNotNull()
    )
    # distance from source center to target cell center
    cx = target.x_center_expr(F.col("x_i"))
    cy = target.y_center_expr(F.col("y_i"))
    d2 = (F.col("__lon") - cx) ** 2 + (F.col("__lat") - cy) ** 2

    if k == 1:
        return mapped.groupBy("y_i", "x_i").agg(
            F.min_by(F.struct("src_y_i", "src_x_i"), d2).alias("src"),
            F.min(d2).alias("d2"),
        ).select(
            "y_i",
            "x_i",
            F.col("src.src_y_i").alias("src_y_i"),
            F.col("src.src_x_i").alias("src_x_i"),
            "d2",
        )

    from pyspark.sql import Window

    w = Window.partitionBy("y_i", "x_i").orderBy(
        d2.asc(), F.col("src_y_i"), F.col("src_x_i")
    )
    return (
        mapped.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select("y_i", "x_i", "src_y_i", "src_x_i", d2.alias("d2"))
    )


def rectify_dataset(
    source: DataFrame,
    target: CubeGrid,
    var_names: Iterable[str] | None = None,
    lon_name: str = "lon",
    lat_name: str = "lat",
    ij_lookup: DataFrame | None = None,
    output_ij: bool = False,
    interpolation: str = "nearest",
    k: int = 4,
) -> DataFrame:
    """Rectify an irregular-coords cube onto ``target``.

    ``source`` must carry per-cell ``lon``/``lat`` columns (the 2-D
    coordinate arrays of the reference, gridmapping/coords.py:58,71).
    Pass a precomputed ``ij_lookup`` to amortize the geometry reduction
    across calls; ``output_ij=True`` keeps the source indices in the
    output (the reference's ``output_ij_names``, nearest mode only).
    ``interpolation='idw'`` blends the ``k`` nearest covering source
    pixels with 1/d2 weights (see module docstring)."""
    from xcube_spark.cube.grid import var_names as cube_vars

    if interpolation not in ("nearest", "idw"):
        raise ValueError(f"interpolation must be nearest|idw, "
                         f"got {interpolation!r}")
    if interpolation == "idw" and output_ij:
        raise ValueError("output_ij only applies to nearest mode")
    lookup_k = 1 if interpolation == "nearest" else k
    vars_ = list(var_names) if var_names is not None else [
        v for v in cube_vars(source) if v not in (lon_name, lat_name)
    ]
    lookup = ij_lookup if ij_lookup is not None else compute_ij_lookup(
        source, target, lon_name, lat_name, k=lookup_k
    )

    spark = source.sparkSession
    tgt_plane = (
        spark.range(target.width * target.height)
        .select(
            (F.col("id") / target.width).cast("int").alias("y_i"),
            (F.col("id") % target.width).cast("int").alias("x_i"),
        )
    )
    # all (time, target cell) combinations; time axis is shared.  The
    # count is one tiny agg job (distinct of a partition-level int) and
    # feeds the broadcast cost model below — `mapped` is T x plane, so
    # sizing it from the plane alone undercounts by the time factor.
    times = source.select("t_i").distinct()
    n_times = times.count()
    grid = times.crossJoin(tgt_plane)

    src_vals = source.select(
        F.col("t_i").alias("__st"),
        F.col("y_i").alias("__ssy"),
        F.col("x_i").alias("__ssx"),
        *vars_,
    )
    mapped = grid.join(F.broadcast(lookup), on=["y_i", "x_i"], how="left")
    if n_times * target.width * target.height * 8 * lookup_k <= 4_000_000:
        # the mapped target (ints only) is broadcast-sized even at T
        # time steps -> the big source side never shuffles for the
        # gather; past the cap it stays a shuffle join (AQE may still
        # downgrade it to broadcast from runtime stats)
        mapped = F.broadcast(mapped)
    joined = mapped.join(
        src_vals,
        on=[
            F.col("t_i") == F.col("__st"),
            F.col("src_y_i") == F.col("__ssy"),
            F.col("src_x_i") == F.col("__ssx"),
        ],
        how="left",
    )

    if interpolation == "idw":
        # inverse-squared-distance blend over the k gathered pixels;
        # an exact hit (d2 ~ 0) takes its pixel value verbatim
        wgt = F.lit(1.0) / (F.col("d2") + F.lit(1e-24))
        aggs = []
        for v in vars_:
            num = F.sum(F.when(F.col(v).isNotNull(), wgt * F.col(v)))
            den = F.sum(F.when(F.col(v).isNotNull(), wgt))
            aggs.append((num / den).alias(v))
        gathered = joined.groupBy("t_i", grid["y_i"], grid["x_i"]).agg(*aggs)
    else:
        gathered = joined.select(
            "t_i",
            grid["y_i"],
            grid["x_i"],
            *( [F.col("src_y_i"), F.col("src_x_i")] if output_ij else [] ),
            *vars_,
        )
    return gathered.select(
        "t_i",
        "y_i",
        "x_i",
        target.y_center_expr(F.col("y_i")).alias("y"),
        target.x_center_expr(F.col("x_i")).alias("x"),
        *( ["src_y_i", "src_x_i"] if output_ij and interpolation == "nearest"
           else [] ),
        *vars_,
    )
