"""Virtual chunk-computed datasets — xcube/core/chunkstore.py:36-224
and core/zarrstore/generic.py:27,308.

The reference's lazy stores synthesize Zarr chunks on demand from a
user callable ``get_data(chunk_index) -> ndarray``.  The Spark-native
analog (SURVEY §2.1): a **generator DataFrame** —

    spark.range(num_chunks) -> mapInPandas(chunk_index -> cell rows)

Each task materializes one chunk by calling the user function; nothing
is stored, scans stream straight out of compute.  Filters on chunk
coordinates prune *before* generation (the range table is tiny), which
is exactly the virtual-store promise: IO cost proportional to the
subset read, not the dataset size.

The user function receives the chunk's index triple and its cell-index
bounds and returns a numpy array shaped (nt, ny, nx) per variable —
the reference's ``GenericArray.get_data`` contract re-expressed.
"""

from __future__ import annotations

from typing import Callable, Iterator, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid

#: (chunk t/y/x index, (t0,t1,y0,y1,x0,x1) cell bounds) -> {var: ndarray}
ChunkFunc = Callable[[tuple[int, int, int], tuple[int, ...]], Mapping[str, np.ndarray]]


def chunk_grid(grid: CubeGrid) -> tuple[int, int, int]:
    ct, cy, cx = grid.chunks
    return (
        (grid.time_periods + ct - 1) // ct,
        (grid.height + cy - 1) // cy,
        (grid.width + cx - 1) // cx,
    )


def open_chunk_store(
    spark: SparkSession,
    grid: CubeGrid,
    get_data: ChunkFunc,
    var_names: list[str],
) -> DataFrame:
    """Build the virtual cells DataFrame over ``get_data``.

    The plan is ``range(num_chunks) -> mapInPandas``: chunk generation
    is embarrassingly parallel, each Arrow batch carries whole chunks,
    and Catalyst prunes chunks when the caller filters on ``t_i/y_i/
    x_i`` ranges that the tiny range-table filter can express."""
    nt, ny, nx = chunk_grid(grid)
    ct, cy, cx = grid.chunks
    n_chunks = nt * ny * nx
    schema = "t_i INT, y_i INT, x_i INT, " + ", ".join(
        f"`{v}` DOUBLE" for v in var_names
    )

    tp, h, w = grid.time_periods, grid.height, grid.width

    def generate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk_id in pdf["id"]:
                tc = int(chunk_id) // (ny * nx)
                yc = (int(chunk_id) % (ny * nx)) // nx
                xc = int(chunk_id) % nx
                t0, t1 = tc * ct, min((tc + 1) * ct, tp)
                y0, y1 = yc * cy, min((yc + 1) * cy, h)
                x0, x1 = xc * cx, min((xc + 1) * cx, w)
                arrays = get_data((tc, yc, xc), (t0, t1, y0, y1, x0, x1))
                tt, yy, xx = np.meshgrid(
                    np.arange(t0, t1), np.arange(y0, y1), np.arange(x0, x1),
                    indexing="ij",
                )
                out = {"t_i": tt.ravel().astype("int32"),
                       "y_i": yy.ravel().astype("int32"),
                       "x_i": xx.ravel().astype("int32")}
                for v in var_names:
                    out[v] = np.asarray(arrays[v], dtype="float64").ravel()
                yield pd.DataFrame(out)

    cells = spark.range(n_chunks).mapInPandas(generate, schema)
    return cells.withColumns({
        "time": grid.time_center_expr(F.col("t_i")),
        "y": grid.y_center_expr(F.col("y_i")),
        "x": grid.x_center_expr(F.col("x_i")),
    }).select("t_i", "y_i", "x_i", "time", "y", "x", *var_names)
