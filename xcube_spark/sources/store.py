"""Data-store framework — xcube/core/store/store.py:27-731.

``new_data_store(store_id, **params)`` returns a store exposing the
reference's DataStore contract: list/has/describe/open/write/delete/
search data ids.  Two concrete stores:

- ``FsDataStore``: a filesystem root of datasets (one parquet dataset
  per data id) — the analog of the fsspec family
  (core/store/fs/store.py:67,814), with the reference's param surface
  (read_only, includes/excludes, storage_options).  Roots with a URI
  scheme run through the Hadoop FileSystem API.
- ``S3DataStore`` / ``AbfsDataStore``: protocol stores whose
  storage-option schemas mirror the reference's accessors
  (core/store/fs/impl/fs.py:40-170) and plumb into ``fs.s3a.*`` /
  ``fs.azure.*`` Hadoop conf — the scan itself stays the ordinary
  distributed read.
- ``MemoryDataStore``: registered temp views (core/store/memory.py
  analog) over ``spark.catalog``.

Descriptors (``describe_data``) are computed from data + schema like
the reference's DatasetDescriptor (core/store/descriptor.py:180),
with variable summaries from one aggregate scan.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from enum import Enum
from typing import Any, Iterator, Mapping

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

    def preload_data(self, *data_ids: str, **preload_params
                     ) -> "PreloadHandle":
        """Prepare datasets for faster repeated access
        (core/store/preload.py ``PreloadedDataStore`` contract).  The
        base store needs no preparation -> ``NullPreloadHandle``;
        stores that benefit (e.g. :class:`FsDataStore` persisting hot
        frames into executor memory) override it."""
        return NullPreloadHandle()


class MutableDataStore(DataStore):
    """MutableDataStore (store.py:519): + write/delete."""

    def write_data(self, df: DataFrame, data_id: str, **options) -> str:
        raise NotImplementedError

    def delete_data(self, data_id: str) -> None:
        raise NotImplementedError


#: per-protocol storage-option schemas — the reference's
#: ``get_storage_options_schema`` surface (core/store/fs/impl/fs.py:
#: 40-170, S3FsAccessor/AzureFsAccessor), restated as plain JSON-schema
#: dicts.  Options validate against these before any conf is touched.
STORAGE_OPTIONS_SCHEMAS: dict[str, dict] = {
    "file": {"type": "object", "properties": {}},
    "s3": {
        "type": "object",
        "properties": {
            "anon": {"type": "boolean",
                     "title": "Connect anonymously (public buckets)"},
            "key": {"type": "string", "title": "AWS access key id"},
            "secret": {"type": "string", "title": "AWS secret access key"},
            "token": {"type": "string", "title": "Session token"},
            "use_ssl": {"type": "boolean", "default": True},
            "requester_pays": {"type": "boolean", "default": False},
            "client_kwargs": {
                "type": "object",
                "properties": {
                    "endpoint_url": {"type": "string", "format": "uri",
                                     "title": "Alternative endpoint URL"},
                    "region_name": {"type": "string",
                                    "title": "AWS region name"},
                },
            },
        },
    },
    "abfs": {
        "type": "object",
        "properties": {
            "anon": {"type": "boolean"},
            "account_name": {"type": "string",
                             "title": "Azure storage account name"},
            "account_key": {"type": "string",
                            "title": "Azure storage account key"},
        },
    },
}

_JSON_TYPES = {"boolean": bool, "string": str, "object": dict}


def validate_storage_options(options: dict, protocol: str) -> None:
    """Validate options against the protocol schema: known keys
    type-check (one level of nesting); unknown keys pass through like
    the reference's ``additional_properties=True``."""
    schema = STORAGE_OPTIONS_SCHEMAS.get(protocol)
    if schema is None:
        raise ValueError(f"no storage-options schema for {protocol!r}")

    def check(opts: dict, props: dict, where: str) -> None:
        for k, v in opts.items():
            spec = props.get(k)
            if spec is None:
                continue
            want = _JSON_TYPES.get(spec.get("type"))
            if want is not None and not isinstance(v, want):
                raise TypeError(
                    f"storage option {where}{k} must be "
                    f"{spec['type']}, got {type(v).__name__}")
            if spec.get("type") == "object" and "properties" in spec:
                check(v, spec["properties"], f"{where}{k}.")

    check(options, schema["properties"], "")


def get_data_store_params_schema(store_id: str) -> dict:
    """The store's parameter schema (the reference's
    ``get_data_store_params_schema``, core/store/store.py): root +
    flags + the protocol's storage options."""
    if store_id == "memory":
        return {"type": "object", "properties": {}}
    proto = store_id if store_id in STORAGE_OPTIONS_SCHEMAS else "file"
    return {
        "type": "object",
        "properties": {
            "root": {"type": "string", "title": "Root or base directory"},
            "read_only": {"type": "boolean", "default": False},
            "includes": {"type": "array", "items": {"type": "string"},
                         "title": "Wildcards of included data ids"},
            "excludes": {"type": "array", "items": {"type": "string"},
                         "title": "Wildcards of excluded data ids"},
            "storage_options": STORAGE_OPTIONS_SCHEMAS[proto],
        },
        "required": ["root"],
    }


class FsDataStore(MutableDataStore):
    """Filesystem store: each data id is a dataset path under ``root``
    (format from the id's extension, parquet default).

    Matches the reference's ``FsDataStore`` param surface
    (core/store/fs/store.py:814-860): ``read_only``, ``includes`` /
    ``excludes`` wildcard filters on data ids, and per-protocol
    ``storage_options`` (validated against
    :data:`STORAGE_OPTIONS_SCHEMAS` and plumbed into the Hadoop conf
    by the protocol subclasses).  Roots with a URI scheme
    (``s3a://...``, ``file:///...``) run list/exists/delete through
    the Hadoop FileSystem API — the exact same code path a cloud
    bucket uses, so the ``file://`` twin genuinely exercises the
    cloud path."""

    protocol = "file"

    def __init__(self, spark: SparkSession, root: str,
                 read_only: bool = False,
                 includes: list[str] | str | None = None,
                 excludes: list[str] | str | None = None,
                 storage_options: dict | None = None):
        self.spark = spark
        self.read_only = read_only
        self.includes = [includes] if isinstance(includes, str) \
            else list(includes or [])
        self.excludes = [excludes] if isinstance(excludes, str) \
            else list(excludes or [])
        options = dict(storage_options or {})
        validate_storage_options(options, self.protocol)
        self.root = self._qualify_root(root).rstrip("/")
        self._apply_storage_options(options)

    # -- protocol hooks --------------------------------------------------

    def _qualify_root(self, root: str) -> str:
        return root

    def _apply_storage_options(self, options: dict) -> None:
        if options:
            raise ValueError(
                f"{self.protocol} store takes no storage options: "
                f"{sorted(options)}")

    # -- id filtering (reference store.py:780-811) -----------------------

    def _included(self, data_id: str) -> bool:
        import fnmatch

        if any(fnmatch.fnmatch(data_id, p) for p in self.excludes):
            return False
        if not self.includes:
            return True
        return any(fnmatch.fnmatch(data_id, p) for p in self.includes)

    # -- hadoop-fs plumbing ----------------------------------------------

    @property
    def _use_hadoop(self) -> bool:
        return "://" in self.root

    def _hfs(self):
        jvm = self.spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(self.root)
        return jvm, path.getFileSystem(
            self.spark._jsc.hadoopConfiguration())

    def _path(self, data_id: str) -> str:
        return f"{self.root}/{data_id}"

    def get_data_ids(self) -> Iterator[str]:
        if self._use_hadoop:
            jvm, fs = self._hfs()
            root = jvm.org.apache.hadoop.fs.Path(self.root)
            if not fs.exists(root):
                return
            names = sorted(st.getPath().getName()
                           for st in fs.listStatus(root))
        elif os.path.isdir(self.root):
            names = sorted(os.listdir(self.root))
        else:
            return
        for name in names:
            if not name.startswith(("_", ".")) and self._included(name):
                yield name

    def has_data(self, data_id: str) -> bool:
        if not self._included(data_id):
            return False
        if self._use_hadoop:
            jvm, fs = self._hfs()
            return fs.exists(
                jvm.org.apache.hadoop.fs.Path(self._path(data_id)))
        return os.path.exists(self._path(data_id))

    def open_data(self, data_id: str, **options) -> DataFrame:
        if not self.has_data(data_id):
            raise FileNotFoundError(f"data id not found: {data_id}")
        preloaded = getattr(self, "_preloaded", None)
        if preloaded is not None and not options and data_id in preloaded:
            return preloaded[data_id]
        return open_dataset(self.spark, self._path(data_id), **options)

    def preload_data(self, *data_ids: str, blocking: bool = True,
                     **preload_params) -> PreloadHandle:
        """Warm datasets into executor memory: each id is opened,
        ``persist()``-ed and materialized on background threads;
        subsequent ``open_data`` calls return the persisted frame.
        Spark's block manager is the cache the reference's preload
        downloads into a local directory — same contract, platform-
        native storage.  ``close()``/``cancel()`` unpersists."""
        if not hasattr(self, "_preloaded"):
            self._preloaded: dict[str, DataFrame] = {}
        store = self

        def _load(handle: PreloadHandle, data_id: str) -> None:
            handle.notify(PreloadState(
                data_id, status=PreloadStatus.started, progress=0.1,
                message="opening"))
            df = store.open_data(data_id).persist()
            df.count()  # materialize into the block manager
            store._preloaded[data_id] = df
            handle.notify(PreloadState(
                data_id, status=PreloadStatus.stopped, progress=1.0,
                message="persisted"))

        parent = self

        class _Handle(ExecutorPreloadHandle):
            def close(self) -> None:
                for d in data_ids:
                    df = parent._preloaded.pop(d, None)
                    if df is not None:
                        df.unpersist()
                super().close()

        return _Handle(tuple(data_ids), _load, blocking=blocking)

    def _check_writable(self) -> None:
        if self.read_only:
            raise PermissionError(
                f"store is read-only (root {self.root})")

    def write_data(self, df: DataFrame, data_id: str, mode: str = "error",
                   **options) -> str:
        self._check_writable()
        write_dataset(df, self._path(data_id), mode=mode, **options)
        return data_id

    def delete_data(self, data_id: str) -> None:
        self._check_writable()
        if self._use_hadoop:
            jvm, fs = self._hfs()
            p = jvm.org.apache.hadoop.fs.Path(self._path(data_id))
            if not fs.exists(p):
                raise FileNotFoundError(f"data id not found: {data_id}")
            fs.delete(p, True)
            return
        import shutil

        path = self._path(data_id)
        if not os.path.exists(path):
            raise FileNotFoundError(f"data id not found: {data_id}")
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)


class S3DataStore(FsDataStore):
    """S3 store: the reference's ``s3`` fsspec store
    (core/store/fs/impl/fs.py:40-120) on Spark's S3A connector —
    storage options map onto ``fs.s3a.*`` Hadoop conf keys, the scan
    itself is the ordinary distributed parquet read."""

    protocol = "s3"

    def _qualify_root(self, root: str) -> str:
        return root if "://" in root else f"s3a://{root}"

    def _apply_storage_options(self, options: dict) -> None:
        # per-BUCKET S3A keys (fs.s3a.bucket.<name>.*): the Hadoop
        # config is session-global, so plain fs.s3a.* keys from two
        # stores would clobber each other (last-writer-wins creds /
        # endpoint).  Bucket scoping keeps each store's options
        # isolated, exactly what the S3A connector provides for this.
        conf = self.spark._jsc.hadoopConfiguration()
        bucket = self.root.split("://", 1)[-1].split("/", 1)[0]
        pre = f"fs.s3a.bucket.{bucket}"
        anon = options.get("anon")
        if anon:
            conf.set(f"{pre}.aws.credentials.provider",
                     "org.apache.hadoop.fs.s3a."
                     "AnonymousAWSCredentialsProvider")
        if "key" in options:
            conf.set(f"{pre}.access.key", options["key"])
        if "secret" in options:
            conf.set(f"{pre}.secret.key", options["secret"])
        if "token" in options:
            conf.set(f"{pre}.session.token", options["token"])
            conf.set(f"{pre}.aws.credentials.provider",
                     "org.apache.hadoop.fs.s3a."
                     "TemporaryAWSCredentialsProvider")
        if "use_ssl" in options:
            conf.set(f"{pre}.connection.ssl.enabled",
                     str(bool(options["use_ssl"])).lower())
        if "requester_pays" in options:
            conf.set(f"{pre}.requester.pays.enabled",
                     str(bool(options["requester_pays"])).lower())
        ck = options.get("client_kwargs", {})
        if "endpoint_url" in ck:
            conf.set(f"{pre}.endpoint", ck["endpoint_url"])
            conf.set(f"{pre}.path.style.access", "true")
        if "region_name" in ck:
            conf.set(f"{pre}.endpoint.region", ck["region_name"])


class AbfsDataStore(FsDataStore):
    """Azure Blob store (reference ``abfs`` accessor,
    core/store/fs/impl/fs.py:125-170) on Spark's ABFS connector."""

    protocol = "abfs"

    def _qualify_root(self, root: str) -> str:
        return root if "://" in root else f"abfss://{root}"

    def _apply_storage_options(self, options: dict) -> None:
        conf = self.spark._jsc.hadoopConfiguration()
        name = options.get("account_name")
        if name and "account_key" in options:
            conf.set(
                f"fs.azure.account.key.{name}.dfs.core.windows.net",
                options["account_key"])


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
_STORES = {"file": FsDataStore, "memory": MemoryDataStore,
           "s3": S3DataStore, "abfs": AbfsDataStore}


def new_data_store(store_id: str, spark: SparkSession, **params) -> DataStore:
    """new_data_store (core/store/store.py:27): instantiate by id."""
    if store_id not in _STORES:
        raise ValueError(f"unknown store {store_id!r}; known: {sorted(_STORES)}")
    return _STORES[store_id](spark, **params)


# ---- store pool (core/store/storepool.py parity) ------------------------


class DataStoreConfig:
    """A named, instantiable store configuration
    (storepool.py:96-167): store id + params + presentation
    metadata.  ``DataStorePool`` turns these into live stores on
    first use."""

    def __init__(self, store_id: str,
                 store_params: Mapping[str, Any] | None = None,
                 title: str | None = None,
                 description: str | None = None):
        if not store_id:
            raise ValueError("store_id must be given")
        self._store_id = store_id
        self._store_params = dict(store_params or {})
        self._title = title
        self._description = description

    @property
    def store_id(self) -> str:
        return self._store_id

    @property
    def store_params(self) -> dict:
        return dict(self._store_params)

    @property
    def title(self) -> str | None:
        return self._title

    @property
    def description(self) -> str | None:
        return self._description

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "DataStoreConfig":
        return cls(d["store_id"], d.get("store_params"),
                   d.get("title"), d.get("description"))

    def to_dict(self) -> dict:
        out: dict[str, Any] = {"store_id": self._store_id}
        if self._store_params:
            out["store_params"] = dict(self._store_params)
        if self._title:
            out["title"] = self._title
        if self._description:
            out["description"] = self._description
        return out


class DataStorePool:
    """Named store configs -> lazily instantiated stores
    (storepool.py:204-330) — how a gen2 request's
    ``input_config.store_instance_id`` resolves to an opener.
    Instances are created once and cached; closing the pool drops
    them."""

    def __init__(self, spark: SparkSession,
                 store_configs: Mapping[str, DataStoreConfig | Mapping]
                 | None = None):
        self._spark = spark
        self._configs: dict[str, DataStoreConfig] = {}
        self._instances: dict[str, DataStore] = {}
        for k, v in (store_configs or {}).items():
            self.add_store_config(k, v)

    @classmethod
    def from_dict(cls, spark: SparkSession,
                  d: Mapping[str, Any]) -> "DataStorePool":
        return cls(spark, d.get("store_configs", d))

    @property
    def is_empty(self) -> bool:
        return not self._configs

    @property
    def store_instance_ids(self) -> list[str]:
        return sorted(self._configs)

    def has_store_instance(self, instance_id: str) -> bool:
        return instance_id in self._configs

    def add_store_config(
            self, instance_id: str,
            config: DataStoreConfig | Mapping[str, Any]) -> None:
        if not isinstance(config, DataStoreConfig):
            config = DataStoreConfig.from_dict(config)
        self._configs[instance_id] = config
        self._instances.pop(instance_id, None)

    def remove_store_config(self, instance_id: str) -> None:
        if instance_id not in self._configs:
            raise ValueError(
                f"unknown store instance {instance_id!r}")
        del self._configs[instance_id]
        self._instances.pop(instance_id, None)

    def get_store_config(self, instance_id: str) -> DataStoreConfig:
        if instance_id not in self._configs:
            raise ValueError(
                f"unknown store instance {instance_id!r}")
        return self._configs[instance_id]

    def get_store(self, instance_id: str) -> DataStore:
        cfg = self.get_store_config(instance_id)
        if instance_id not in self._instances:
            self._instances[instance_id] = new_data_store(
                cfg.store_id, self._spark, **cfg.store_params)
        return self._instances[instance_id]

    def get_store_instance_id(
            self, store_config: DataStoreConfig) -> str | None:
        """Find an instance id whose config matches (same id+params),
        the pool's dedup hook (storepool.py:251-266)."""
        want = (store_config.store_id, store_config.store_params)
        for iid, cfg in self._configs.items():
            if (cfg.store_id, cfg.store_params) == want:
                return iid
        return None

    def close_all_stores(self) -> None:
        self._instances.clear()

    def to_dict(self) -> dict:
        return {"store_configs": {
            k: v.to_dict() for k, v in sorted(self._configs.items())}}


# ---- preload API (core/store/preload.py parity) -------------------------


class PreloadStatus(Enum):
    """preload.py:18-31."""

    created = "created"
    started = "started"
    stopped = "stopped"
    cancelled = "cancelled"
    failed = "failed"


@dataclass
class PreloadState:
    """Mutable per-dataset preload progress (preload.py:34-74)."""

    data_id: str
    status: PreloadStatus = PreloadStatus.created
    progress: float = 0.0
    message: str = ""
    exception: BaseException | None = None

    def update(self, other: "PreloadState") -> None:
        if other.status is not None:
            self.status = other.status
        if other.progress:
            self.progress = other.progress
        if other.message:
            self.message = other.message
        if other.exception is not None:
            self.exception = other.exception


class PreloadHandle:
    """Handle over an in-progress preload (preload.py:77-141);
    usable as a context manager that closes on exit."""

    def get_state(self, data_id: str) -> PreloadState:
        raise NotImplementedError

    @property
    def cancelled(self) -> bool:
        return False

    def cancel(self) -> None:
        pass

    def close(self) -> None:
        pass

    def notify(self, event: PreloadState) -> None:
        pass

    def __enter__(self) -> "PreloadHandle":
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        self.close()


class NullPreloadHandle(PreloadHandle):
    """Returned by stores whose data needs no preloading
    (preload.py:144-158)."""

    def get_state(self, data_id: str) -> PreloadState:
        return PreloadState(data_id, status=PreloadStatus.stopped,
                            progress=1.0)


class ExecutorPreloadHandle(PreloadHandle):
    """Thread-pool preload driver (preload.py:161-260): runs
    ``preload_fn(handle, data_id)`` per dataset on background threads;
    ``blocking=True`` waits for completion before returning from the
    constructor."""

    def __init__(self, data_ids: tuple[str, ...],
                 preload_fn, blocking: bool = True, max_workers: int = 3):
        from concurrent.futures import ThreadPoolExecutor, wait

        self._states = {d: PreloadState(d) for d in data_ids}
        self._cancelled = False
        self._executor = ThreadPoolExecutor(max_workers=max_workers)
        self._futures = []
        for d in data_ids:
            self._futures.append(
                self._executor.submit(self._run, preload_fn, d))
        if blocking:
            wait(self._futures)

    def _run(self, preload_fn, data_id: str) -> None:
        st = self._states[data_id]
        if self._cancelled:
            st.status = PreloadStatus.cancelled
            return
        st.status = PreloadStatus.started
        try:
            preload_fn(self, data_id)
            if st.status is PreloadStatus.started:
                st.status = PreloadStatus.stopped
                st.progress = 1.0
        except BaseException as e:  # noqa: BLE001 — recorded, not raised
            st.status = PreloadStatus.failed
            st.exception = e

    def get_state(self, data_id: str) -> PreloadState:
        return self._states[data_id]

    @property
    def cancelled(self) -> bool:
        return self._cancelled

    def cancel(self) -> None:
        self._cancelled = True
        for f in self._futures:
            f.cancel()

    def notify(self, event: PreloadState) -> None:
        self._states[event.data_id].update(event)

    def close(self) -> None:
        self._executor.shutdown(wait=False, cancel_futures=True)


class ReferenceDataStore(DataStore):
    """Kerchunk reference store (core/store/ref/store.py:21-120): a
    list of reference JSON files (or a directory of them) served as
    openable datasets — referred NetCDF/HDF5 granules read as if they
    were Zarr, chunk-parallel, without copying bytes.

    ``refs`` entries may be paths to ``*.json`` reference files or a
    directory (every ``*.json`` inside becomes a data id).  Data ids
    are the file stems, like the reference's normalized ref names.
    """

    def __init__(self, spark: SparkSession, refs: list[str] | str):
        self.spark = spark
        if isinstance(refs, str):
            root = refs
            refs = sorted(
                os.path.join(root, f) for f in os.listdir(root)
                if f.endswith(".json"))
        self._refs: dict[str, str] = {}
        for r in refs:
            stem = os.path.splitext(os.path.basename(r))[0]
            self._refs[stem] = r

    def get_data_ids(self) -> Iterator[str]:
        yield from sorted(self._refs)

    def has_data(self, data_id: str) -> bool:
        return data_id in self._refs

    def open_data(self, data_id: str, **options) -> DataFrame:
        from xcube_spark.sources.zarrio import open_kerchunk_cube

        if data_id not in self._refs:
            raise FileNotFoundError(f"data id not found: {data_id}")
        return open_kerchunk_cube(self.spark, self._refs[data_id],
                                  **options)


_STORES["reference"] = ReferenceDataStore
