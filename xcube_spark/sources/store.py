"""Data-store framework — xcube/core/store/store.py:27-731.

``new_data_store(store_id, **params)`` returns a store exposing the
reference's DataStore contract: list/has/describe/open/write/delete/
search data ids.  Two concrete stores:

- ``FsDataStore``: a filesystem root of datasets (one parquet dataset
  per data id) — the analog of the fsspec family
  (core/store/fs/store.py:67,814).  Cloud roots (s3a://, abfss://) ride
  on Hadoop FS connectors for free, which is why the reference's six
  protocol stores collapse into one class here.
- ``MemoryDataStore``: registered temp views (core/store/memory.py
  analog) over ``spark.catalog``.

Descriptors (``describe_data``) are computed from data + schema like
the reference's DatasetDescriptor (core/store/descriptor.py:180),
with variable summaries from one aggregate scan.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xcube_spark.sources.dsio import guess_format, open_dataset, write_dataset


@dataclass
class VariableDescriptor:
    """core/store/descriptor.py:273 — name, dtype, summary stats."""

    name: str
    dtype: str
    n_valid: int
    vmin: Any = None
    vmax: Any = None


@dataclass
class DatasetDescriptor:
    """core/store/descriptor.py:180 — id, dims, bbox, time range, vars."""

    data_id: str
    num_rows: int
    dims: dict[str, int]
    bbox: tuple | None
    time_range: tuple | None
    variables: list[VariableDescriptor]


def describe_dataframe(data_id: str, df: DataFrame) -> DatasetDescriptor:
    """One-scan descriptor: dim sizes, bbox, time range, and per-variable
    valid counts + min/max, all in a single aggregate (no per-variable
    passes — one job regardless of variable count)."""
    from xcube_spark.cube.grid import DIM_COLS, var_names

    cols = set(df.columns)
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for d in DIM_COLS:
        if d in cols:
            aggs.append(F.count_distinct(F.col(d)).alias(f"__n_{d}"))
    for c in ("x", "y", "time"):
        if c in cols:
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
    vars_ = var_names(df) if DIM_COLS[0] in cols else [
        c for c in df.columns if c not in ("x", "y", "time")
    ]
    dtypes = dict(df.dtypes)
    for v in vars_:
        aggs.append(F.count(F.col(v)).alias(f"__nv_{v}"))
        if dtypes[v] in ("double", "float", "int", "bigint", "smallint"):
            aggs.append(F.min(v).alias(f"__vmin_{v}"))
            aggs.append(F.max(v).alias(f"__vmax_{v}"))
    row = df.agg(*aggs).collect()[0].asDict()

    dims = {d: row[f"__n_{d}"] for d in DIM_COLS if f"__n_{d}" in row}
    bbox = None
    if "__min_x" in row and "__min_y" in row:
        bbox = (row["__min_x"], row["__min_y"], row["__max_x"], row["__max_y"])
    time_range = None
    if "__min_time" in row:
        time_range = (row["__min_time"], row["__max_time"])
    variables = [
        VariableDescriptor(
            name=v,
            dtype=dtypes[v],
            n_valid=row[f"__nv_{v}"],
            vmin=row.get(f"__vmin_{v}"),
            vmax=row.get(f"__vmax_{v}"),
        )
        for v in vars_
    ]
    return DatasetDescriptor(
        data_id=data_id,
        num_rows=row["__n"],
        dims=dims,
        bbox=bbox,
        time_range=time_range,
        variables=variables,
    )


class DataStore:
    """The reference's DataStore ABC (store.py:139): read surface."""

    def get_data_ids(self) -> Iterator[str]:
        raise NotImplementedError

    def has_data(self, data_id: str) -> bool:
        raise NotImplementedError

    def open_data(self, data_id: str, **options) -> DataFrame:
        raise NotImplementedError

    def describe_data(self, data_id: str) -> DatasetDescriptor:
        return describe_dataframe(data_id, self.open_data(data_id))

    def search_data(self, pattern: str | None = None) -> Iterator[str]:
        """DataSearcher.search_data (store/search.py:15,38): substring
        match over data ids."""
        for did in self.get_data_ids():
            if pattern is None or pattern in did:
                yield did


class MutableDataStore(DataStore):
    """MutableDataStore (store.py:519): + write/delete."""

    def write_data(self, df: DataFrame, data_id: str, **options) -> str:
        raise NotImplementedError

    def delete_data(self, data_id: str) -> None:
        raise NotImplementedError


class FsDataStore(MutableDataStore):
    """Filesystem store: each data id is a dataset path under ``root``
    (format from the id's extension, parquet default)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _path(self, data_id: str) -> str:
        return f"{self.root}/{data_id}"

    def get_data_ids(self) -> Iterator[str]:
        if not os.path.isdir(self.root):
            return
        for name in sorted(os.listdir(self.root)):
            if not name.startswith(("_", ".")):
                yield name

    def has_data(self, data_id: str) -> bool:
        return os.path.exists(self._path(data_id))

    def open_data(self, data_id: str, **options) -> DataFrame:
        if not self.has_data(data_id):
            raise FileNotFoundError(f"data id not found: {data_id}")
        return open_dataset(self.spark, self._path(data_id), **options)

    def write_data(self, df: DataFrame, data_id: str, mode: str = "error",
                   **options) -> str:
        write_dataset(df, self._path(data_id), mode=mode, **options)
        return data_id

    def delete_data(self, data_id: str) -> None:
        import shutil

        path = self._path(data_id)
        if not os.path.exists(path):
            raise FileNotFoundError(f"data id not found: {data_id}")
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)


class MemoryDataStore(MutableDataStore):
    """In-session store over ``spark.catalog`` temp views
    (the reference's memory store / MemDatasetIO, dsio.py:308)."""

    _PREFIX = "xcube_store_"

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def _view(self, data_id: str) -> str:
        return f"{self._PREFIX}{data_id}"

    def get_data_ids(self) -> Iterator[str]:
        for t in self.spark.catalog.listTables():
            if t.name.startswith(self._PREFIX):
                yield t.name[len(self._PREFIX):]

    def has_data(self, data_id: str) -> bool:
        return self.spark.catalog.tableExists(self._view(data_id))

    def open_data(self, data_id: str, **options) -> DataFrame:
        if not self.has_data(data_id):
            raise FileNotFoundError(f"data id not found: {data_id}")
        return self.spark.table(self._view(data_id))

    def write_data(self, df: DataFrame, data_id: str, **options) -> str:
        df.createOrReplaceTempView(self._view(data_id))
        return data_id

    def delete_data(self, data_id: str) -> None:
        if not self.has_data(data_id):
            raise FileNotFoundError(f"data id not found: {data_id}")
        self.spark.catalog.dropTempView(self._view(data_id))


#: store registry (the reference's extension point, plugin.py:82-145)
_STORES = {"file": FsDataStore, "memory": MemoryDataStore}


def new_data_store(store_id: str, spark: SparkSession, **params) -> DataStore:
    """new_data_store (core/store/store.py:27): instantiate by id."""
    if store_id not in _STORES:
        raise ValueError(f"unknown store {store_id!r}; known: {sorted(_STORES)}")
    return _STORES[store_id](spark, **params)
