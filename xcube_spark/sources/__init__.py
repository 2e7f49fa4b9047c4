from xcube_spark.sources.dsio import (
    FORMATS,
    guess_format,
    open_dataset,
    write_dataset,
)
from xcube_spark.sources.store import (
    DataStore,
    DataStoreConfig,
    DataStorePool,
    FsDataStore,
    MemoryDataStore,
    ReferenceDataStore,
    new_data_store,
)
from xcube_spark.sources.timeslice import (
    append_time_slice,
    find_time_slice,
    insert_time_slice,
    replace_time_slice,
    update_time_slice,
)

__all__ = [
    "FORMATS",
    "guess_format",
    "open_dataset",
    "write_dataset",
    "DataStore",
    "DataStoreConfig",
    "DataStorePool",
    "FsDataStore",
    "MemoryDataStore",
    "ReferenceDataStore",
    "new_data_store",
    "append_time_slice",
    "find_time_slice",
    "insert_time_slice",
    "replace_time_slice",
    "update_time_slice",
]
