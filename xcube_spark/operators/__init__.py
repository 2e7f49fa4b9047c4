from xcube_spark.operators.select import (
    select_spatial_subset,
    select_subset,
    select_temporal_subset,
    select_variables_subset,
    select_label_subset,
)
from xcube_spark.operators.timeseries import get_time_series

__all__ = [
    "select_subset",
    "select_variables_subset",
    "select_spatial_subset",
    "select_temporal_subset",
    "select_label_subset",
    "get_time_series",
]
