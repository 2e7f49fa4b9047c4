"""gen1 input processors — xcube/core/gen/iproc.py (``InputProcessor``
:126, ``XYInputProcessor``:263, ``DefaultInputProcessor``:392) and the
gen1 append loop (core/gen/gen.py).

The reference's gen1 tool ingests heterogeneous satellite products by
dispatching each input to a named *input processor* that knows how to
(a) pre-process the raw dataset into the standard form, (b) describe
how its geolocation maps onto a grid (regular x/y vs per-pixel swath
coords needing rectification), and (c) post-process the resampled
slice; processed slices append into the growing cube.

Spark re-expression: a processor transforms a cells DataFrame; the
pipeline composes pre_process -> (rectify if the processor declares
per-pixel coords) -> post_process -> time-slice append — all lazy plan
construction, executed once at write.  Product-specific processors
(Sentinel-3 OLCI etc. live in reference plugins) register themselves
with :func:`register_input_processor` exactly like the reference's
extension registry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

from pyspark.sql import DataFrame

from xcube_spark.cube.grid import CubeGrid


@dataclass(frozen=True)
class ReprojectionInfo:
    """How an input's geolocation maps to a grid (iproc.py:24):
    names of the x/y coordinate columns and whether they are per-pixel
    (swath -> needs rectification) or regular axes."""

    xy_names: tuple[str, str] = ("lon", "lat")
    per_pixel: bool = False
    xy_crs: str = "EPSG:4326"


class InputProcessor:
    """Base processor (iproc.py:126): named, parameterized, with
    pre/post hooks around the grid mapping step."""

    name = "base"
    description = ""

    def __init__(self, **parameters: Any):
        self.parameters: dict[str, Any] = {**self.default_parameters,
                                           **parameters}

    @property
    def default_parameters(self) -> dict[str, Any]:
        return {}

    def get_reprojection_info(self, cube: DataFrame) -> ReprojectionInfo:
        return ReprojectionInfo()

    def pre_process(self, cube: DataFrame, grid: CubeGrid
                    ) -> tuple[DataFrame, CubeGrid]:
        return cube, grid

    def post_process(self, cube: DataFrame) -> DataFrame:
        return cube


class DefaultInputProcessor(InputProcessor):
    """The xcube-standard-format processor (iproc.py:392): inputs carry
    regular lat/lon axes; pre-processing collapses accidental 2-D
    coords and normalizes 0..360 longitudes — the ``_normalize_lon_360``
    + squeeze steps of the reference."""

    name = "default"
    description = "Single-time cubes in xcube standard format"

    def pre_process(self, cube, grid):
        from xcube_spark.operators.maintenance import (normalize_2d_coords,
                                                       normalize_lon)

        if "lat" in cube.columns and "lon" in cube.columns:
            cube = normalize_2d_coords(cube)
        return normalize_lon(cube, grid)


class SwathInputProcessor(InputProcessor):
    """Per-pixel-geolocation products (the Sentinel-3/SNAP family of
    the reference's plugin processors): declares per-pixel lon/lat so
    the pipeline rectifies onto the target grid."""

    name = "swath"
    description = "Products with per-pixel lon/lat needing rectification"

    @property
    def default_parameters(self) -> dict[str, Any]:
        return {"xy_names": ("lon", "lat"), "interpolation": "nearest"}

    def get_reprojection_info(self, cube: DataFrame) -> ReprojectionInfo:
        xn, yn = self.parameters["xy_names"]
        return ReprojectionInfo(xy_names=(xn, yn), per_pixel=True)


class Sentinel3InputProcessor(SwathInputProcessor):
    """Sentinel-3 OLCI/SLSTR products (the reference's SENTINEL3
    processor, plugin.py:33-40 + core/sentinel3.py): a product
    directory of netCDF-4 files with 2-D per-pixel geolocation in
    geo_coordinates.nc, opened through the self-implemented HDF5
    reader and rectified onto the target grid."""

    name = "sentinel3"
    description = "Sentinel-3 OLCI/SLSTR L1/L2 product directories"

    @staticmethod
    def open(spark, path: str, var_names: list[str] | None = None):
        from xcube_spark.sources.sentinel3 import open_sentinel3_product

        return open_sentinel3_product(spark, path, var_names=var_names)


#: the processor registry (the reference's extension point)
INPUT_PROCESSORS: dict[str, type[InputProcessor]] = {}


def register_input_processor(cls: type[InputProcessor]) -> type[InputProcessor]:
    INPUT_PROCESSORS[cls.name] = cls
    return cls


register_input_processor(DefaultInputProcessor)
register_input_processor(SwathInputProcessor)
register_input_processor(Sentinel3InputProcessor)


def find_input_processor(name: str, **parameters: Any) -> InputProcessor:
    if name not in INPUT_PROCESSORS:
        raise KeyError(f"unknown input processor {name!r}; "
                       f"registered: {sorted(INPUT_PROCESSORS)}")
    return INPUT_PROCESSORS[name](**parameters)


def gen1_process_inputs(
    inputs: list[tuple[DataFrame, CubeGrid]],
    target_grid: CubeGrid,
    processor: InputProcessor | str = "default",
    var_names: list[str] | None = None,
    processor_params: Mapping[str, Any] | None = None,
) -> DataFrame:
    """The gen1 main loop (core/gen/gen.py): process each input slice
    through the processor, rectify swath inputs onto the target grid,
    and append the slices along time (slice i gets ``t_i = i``).

    Everything is plan composition — one UNION ALL of per-slice plans;
    execution happens at the caller's write."""
    if isinstance(processor, str):
        processor = find_input_processor(processor,
                                         **dict(processor_params or {}))
    slices = []
    for i, (df, grid) in enumerate(inputs):
        df, grid = processor.pre_process(df, grid)
        info = processor.get_reprojection_info(df)
        if info.per_pixel:
            from xcube_spark.operators.resampling.rectify import rectify_dataset

            df = rectify_dataset(
                df, target_grid, var_names=var_names,
                lon_name=info.xy_names[0], lat_name=info.xy_names[1],
                interpolation=processor.parameters.get("interpolation",
                                                       "nearest"))
        df = processor.post_process(df)
        from pyspark.sql import functions as F

        slices.append(df.withColumn("t_i", F.lit(i)))
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out
