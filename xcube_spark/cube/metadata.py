"""Dataset attributes & CF metadata — the ``_meta`` sidecar convention.

The reference carries CF global attrs + per-variable attrs on the
xr.Dataset (new.py:207-230, update.py:22-268).  The cells-table model
stores them as a JSON sidecar next to the parquet dataset
(SURVEY §1.8: "attrs/metadata become a _meta JSON sidecar") plus
helpers that *recompute* the coverage attrs from the data — the
``update_dataset_spatial_attrs`` / ``update_dataset_temporal_attrs``
operators (update.py:97-180), one aggregate scan each.

``edit_metadata`` (cli/patch.py:111-175) is a read-modify-write of the
sidecar — the ALTER TABLE SET TBLPROPERTIES analog.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_FILENAME = "_meta.json"


def write_meta(dataset_path: str, attrs: Mapping[str, Any]) -> None:
    """Write/overwrite the sidecar (the dataset dir must exist)."""
    with open(os.path.join(dataset_path, META_FILENAME), "w") as f:
        json.dump(dict(attrs), f, indent=2, sort_keys=True, default=str)


def read_meta(dataset_path: str) -> dict[str, Any]:
    path = os.path.join(dataset_path, META_FILENAME)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def edit_metadata(dataset_path: str, patch: Mapping[str, Any],
                  delete: list[str] | None = None) -> dict[str, Any]:
    """Patch sidecar attrs in place (cli/patch.py:111-175): merge new
    keys, drop ``delete`` keys, return the updated attrs."""
    attrs = read_meta(dataset_path)
    attrs.update(patch)
    for k in delete or []:
        attrs.pop(k, None)
    write_meta(dataset_path, attrs)
    return attrs


def compute_spatial_attrs(cube: DataFrame) -> dict[str, Any]:
    """CF geospatial_* attrs from the data (update.py:97-140) — one
    aggregate over the coordinate columns."""
    row = cube.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).collect()[0]
    return {
        "geospatial_lon_min": row[0],
        "geospatial_lon_max": row[1],
        "geospatial_lat_min": row[2],
        "geospatial_lat_max": row[3],
    }


def compute_temporal_attrs(cube: DataFrame) -> dict[str, Any]:
    """CF time_coverage_* attrs from the data (update.py:143-180)."""
    row = cube.agg(F.min("time"), F.max("time")).collect()[0]
    return {
        "time_coverage_start": row[0].isoformat() if row[0] else None,
        "time_coverage_end": row[1].isoformat() if row[1] else None,
    }


def update_dataset_attrs(cube: DataFrame,
                         base_attrs: Mapping[str, Any] | None = None,
                         ) -> dict[str, Any]:
    """Recompute coverage attrs from coords and merge over the base
    (update.py:22-94); both aggregates fuse into one scan via union of
    the agg lists."""
    row = cube.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y"),
        F.min("time"), F.max("time"),
    ).collect()[0]
    attrs = dict(base_attrs or {})
    attrs.update({
        "Conventions": attrs.get("Conventions", "CF-1.7"),
        "geospatial_lon_min": row[0],
        "geospatial_lon_max": row[1],
        "geospatial_lat_min": row[2],
        "geospatial_lat_max": row[3],
        "time_coverage_start": row[4].isoformat() if row[4] else None,
        "time_coverage_end": row[5].isoformat() if row[5] else None,
    })
    return attrs
