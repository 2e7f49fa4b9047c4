"""Multi-level datasets — xcube/core/mldataset/ (abc.py, lazy.py:19,
computed.py:24, combined.py:14, fs.py:35).

The reference's ``MultiLevelDataset`` family wraps a pyramid whose
level datasets materialize lazily and are cached per level.  The Spark
analog is natural: a **level factory returning DataFrames** — a
DataFrame is already a lazy plan, so "materialize level i on first
access" becomes "build (and memoize) level i's plan on first access";
actual compute happens only when a consumer runs an action, and Spark
caches nothing unless asked.  What the classes add over plain
``compute_levels`` is the reference's contract:

- ``BaseMultiLevelDataset``  — derive level i from the base cube by i
  halvings (decimation or block aggregation), building only the levels
  actually requested (lazy.py:81 ``get_dataset``);
- ``ComputedMultiLevelDataset`` — levels produced by a user callable
  over input datasets (computed.py:24's script hook, minus the
  file-system script loading: the callable is passed directly);
- ``CombinedMultiLevelDataset`` — zip N pyramids level-wise through a
  combiner (combined.py:14; default: join on the dim columns);
- ``FsMultiLevelDataset``     — ``.levels`` persistence: one parquet
  table per level plus a ``.zlevels`` JSON spec (fs.py:112), written
  by :func:`write_mldataset` and re-opened lazily.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.operators.levels import next_level, num_levels as _num_levels


class MultiLevelDataset:
    """Abstract pyramid: ``num_levels`` grids + lazily-built level
    DataFrames (mldataset/abc.py)."""

    def __init__(self, num_levels: int, base_grid: CubeGrid):
        self._num_levels = num_levels
        self._grids = [base_grid.level(i) for i in range(num_levels)]
        self._cache: dict[int, DataFrame] = {}

    @property
    def num_levels(self) -> int:
        return self._num_levels

    @property
    def grids(self) -> list[CubeGrid]:
        return list(self._grids)

    def grid(self, index: int) -> CubeGrid:
        return self._grids[index]

    def get_dataset(self, index: int) -> DataFrame:
        """Level ``index`` DataFrame, built on first access and
        memoized (the plan, not the data — lazy.py:81)."""
        if not 0 <= index < self._num_levels:
            raise IndexError(f"level {index} not in [0, {self._num_levels})")
        if index not in self._cache:
            self._cache[index] = self._build(index)
        return self._cache[index]

    def datasets(self) -> list[DataFrame]:
        return [self.get_dataset(i) for i in range(self._num_levels)]

    def _build(self, index: int) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


class BaseMultiLevelDataset(MultiLevelDataset):
    """Pyramid derived from a base cube by repeated halving
    (BaseMultiLevelDataset, mldataset/base.py semantics).  Level i
    reuses level i-1's plan, so requesting only level 3 still builds a
    single composed plan — no intermediate materialization."""

    def __init__(self, cube: DataFrame, grid: CubeGrid,
                 num_levels: int | None = None, method: str = "first"):
        super().__init__(num_levels or _num_levels(grid), grid)
        self._cube = cube
        self._method = method

    def _build(self, index: int) -> DataFrame:
        if index == 0:
            return self._cube
        return next_level(self.get_dataset(index - 1), method=self._method)


class ComputedMultiLevelDataset(MultiLevelDataset):
    """Levels computed by a user callable
    ``fn(inputs: list[MultiLevelDataset], index: int) -> DataFrame``
    (ComputedMultiLevelDataset, computed.py:24 — the script's callable
    passed directly instead of exec'd from a file)."""

    def __init__(self, fn: Callable[[Sequence[MultiLevelDataset], int], DataFrame],
                 inputs: Sequence[MultiLevelDataset],
                 num_levels: int, base_grid: CubeGrid,
                 parameters: Mapping | None = None):
        super().__init__(num_levels, base_grid)
        self._fn = fn
        self._inputs = list(inputs)
        self._params = dict(parameters or {})

    def _build(self, index: int) -> DataFrame:
        if self._params:
            return self._fn(self._inputs, index, **self._params)
        return self._fn(self._inputs, index)


class CombinedMultiLevelDataset(MultiLevelDataset):
    """Level-wise combination of N pyramids (combined.py:14).  The
    default combiner joins on the dim columns — variables from all
    inputs side by side; pass ``combiner_fn`` for anything else."""

    def __init__(self, inputs: Sequence[MultiLevelDataset],
                 combiner_fn: Callable[[Sequence[DataFrame]], DataFrame]
                 | None = None):
        if not inputs:
            raise ValueError("need at least one input pyramid")
        n = min(m.num_levels for m in inputs)
        super().__init__(n, inputs[0].grid(0))
        self._inputs = list(inputs)
        self._combiner = combiner_fn or self._join_combiner

    @staticmethod
    def _join_combiner(dfs: Sequence[DataFrame]) -> DataFrame:
        out = dfs[0]
        for df in dfs[1:]:
            dims = [c for c in ("t_i", "y_i", "x_i") if c in out.columns]
            dupes = [c for c in df.columns
                     if c in out.columns and c not in dims]
            out = out.join(df.drop(*dupes), dims)
        return out

    def _build(self, index: int) -> DataFrame:
        return self._combiner([m.get_dataset(index) for m in self._inputs])


class FsMultiLevelDataset(MultiLevelDataset):
    """A persisted ``.levels`` pyramid re-opened lazily: levels are
    ``{path}/L{i}`` parquet tables, the grid/level spec lives in
    ``{path}/.zlevels`` JSON (fs.py:112's spec file).  Only levels
    actually requested are scanned — and partition pruning within a
    level still applies."""

    def __init__(self, spark: SparkSession, path: str):
        with open(os.path.join(path, ".zlevels")) as f:
            spec = json.load(f)
        if not isinstance(spec, dict):
            raise TypeError("Unexpected .zlevels file. Must be a JSON object.")
        grid_kwargs = dict(spec["base_grid"])
        if "t_start" in grid_kwargs:
            from datetime import datetime

            grid_kwargs["t_start"] = datetime.fromisoformat(
                grid_kwargs["t_start"])
        if "chunks" in grid_kwargs:
            grid_kwargs["chunks"] = tuple(grid_kwargs["chunks"])
        super().__init__(int(spec["num_levels"]), CubeGrid(**grid_kwargs))
        self._spark = spark
        self._path = path

    def _build(self, index: int) -> DataFrame:
        return self._spark.read.parquet(os.path.join(self._path, f"L{index}"))


def write_mldataset(mlds: MultiLevelDataset, path: str,
                    partition_cols: tuple[str, ...] = ("t_i",)) -> None:
    """Persist a pyramid as a ``.levels`` directory (fs.py write side):
    one partitioned parquet table per level + the .zlevels spec."""
    os.makedirs(path, exist_ok=True)
    g = mlds.grid(0)
    spec = {
        "version": 1,
        "num_levels": mlds.num_levels,
        "base_grid": {
            "width": g.width, "height": g.height,
            "time_periods": g.time_periods,
            "x_start": g.x_start, "y_start": g.y_start,
            "x_res": g.x_res, "y_res": g.y_res,
            "t_start": g.t_start.isoformat(),
            "t_freq_days": g.t_freq_days,
            "inverse_y": g.inverse_y, "crs": g.crs,
            "chunks": list(g.chunks),
        },
    }
    with open(os.path.join(path, ".zlevels"), "w") as f:
        json.dump(spec, f)
    for i in range(mlds.num_levels):
        (mlds.get_dataset(i).write.mode("overwrite")
         .partitionBy(*partition_cols)
         .parquet(os.path.join(path, f"L{i}")))


class MappedMultiLevelDataset(MultiLevelDataset):
    """Pyramid with a per-level mapper function applied lazily
    (mldataset/mapped.py:13-38): wraps another pyramid, level i =
    ``mapper_fn(source.get_dataset(i))``.  The mapper composes into
    each level's plan — nothing materializes until the level is
    acted on."""

    def __init__(self, source: MultiLevelDataset,
                 mapper_fn: Callable[[DataFrame], DataFrame],
                 **mapper_params):
        if not callable(mapper_fn):
            raise ValueError("mapper_fn must be callable")
        super().__init__(source.num_levels, source.grid(0))
        self._source = source
        self._fn = mapper_fn
        self._params = dict(mapper_params)

    def _build(self, index: int) -> DataFrame:
        return self._fn(self._source.get_dataset(index), **self._params)


class IdentityMultiLevelDataset(MappedMultiLevelDataset):
    """The no-op wrapper (mldataset/identity.py) — useful as the
    default in pipelines that optionally map levels."""

    def __init__(self, source: MultiLevelDataset):
        super().__init__(source, lambda df: df)
