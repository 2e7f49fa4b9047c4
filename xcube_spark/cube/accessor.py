"""SparkCube — the fluent accessor (xcube/core/xarray.py:33-359).

The reference exposes its operator library through the ``ds.xcube.*``
xarray accessor; here the same role is played by a thin value object
bundling ``(cells DataFrame, CubeGrid, attrs)``.  Every method is a
pure delegation to an operator module and returns a new SparkCube (or
DataFrame for table-shaped results), so chains compose into one
Catalyst plan exactly like raw operator calls:

    SparkCube.new(spark)
        .select_subset(bbox=[0, 0, 40, 40])
        .resample_space(2)
        .time_series(["A"])           # -> DataFrame

Nothing executes until an action — the reference's lazy-until-compute
contract (SURVEY §3.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Callable, Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.grid import var_names as _var_names


@dataclass(frozen=True)
class SparkCube:
    """(cells, grid, attrs) — the engine's Dataset analog."""

    df: DataFrame
    grid: CubeGrid
    attrs: Mapping[str, Any] = field(default_factory=dict)

    # ---- construction -------------------------------------------------

    @classmethod
    def new(cls, spark: SparkSession, grid: CubeGrid | None = None,
            variables: Mapping[str, Any] | None = None) -> "SparkCube":
        """Synthesize a cube (new_cube, core/new.py:13-268)."""
        from xcube_spark.cube.new import new_cube

        g = grid or CubeGrid()
        return cls(new_cube(spark, g, variables), g)

    @classmethod
    def open(cls, spark: SparkSession, path: str, grid: CubeGrid,
             **options) -> "SparkCube":
        """Open a stored cells table (open_cube, dsio.py:42)."""
        from xcube_spark.cube.metadata import read_meta
        from xcube_spark.sources.dsio import open_dataset

        return cls(open_dataset(spark, path, **options), grid,
                   read_meta(path))

    # ---- introspection ------------------------------------------------

    @property
    def var_names(self) -> list[str]:
        return _var_names(self.df)

    def verify(self) -> list[str]:
        from xcube_spark.operators.maintenance import verify_cube

        return verify_cube(self.df, self.grid)

    def describe(self, data_id: str = "<cube>"):
        from xcube_spark.sources.store import describe_dataframe

        return describe_dataframe(data_id, self.df)

    # ---- subsetting (SURVEY §2.2) ------------------------------------

    def select_subset(self, var_names: Iterable[str] | None = None,
                      bbox: Sequence[float] | None = None,
                      time_range: Sequence | None = None) -> "SparkCube":
        from xcube_spark.operators.select import select_subset

        return replace(self, df=select_subset(
            self.df, var_names=var_names, bbox=bbox, time_range=time_range))

    # ---- geometry (§2.3) ---------------------------------------------

    def mask_by_geometry(self, geometry: str, **kw) -> "SparkCube":
        from xcube_spark.operators.geom import mask_dataset_by_geometry

        return replace(self, df=mask_dataset_by_geometry(
            self.df, geometry, **kw))

    def clip_by_geometry(self, geometry: str, **kw) -> "SparkCube":
        from xcube_spark.operators.geom import clip_dataset_by_geometry

        return replace(self, df=clip_dataset_by_geometry(
            self.df, geometry, **kw))

    # ---- aggregations (§2.5) -----------------------------------------

    def time_series(self, var_names: Iterable[str] | None = None,
                    agg_methods: Sequence[str] = ("mean",)) -> DataFrame:
        from xcube_spark.operators.timeseries import get_time_series

        return get_time_series(self.df, var_names, agg_methods=agg_methods)

    def resample_time(self, frequency: str,
                      methods: Sequence[str] = ("mean",),
                      **kw) -> DataFrame:
        from xcube_spark.operators.temporal import resample_in_time

        return resample_in_time(self.df, frequency, methods=methods, **kw)

    def statistics(self, var: str, **kw) -> DataFrame:
        from xcube_spark.operators.statistics import compute_statistics

        return compute_statistics(self.df, var, **kw)

    def subsample(self, factor: int, agg_methods=None) -> "SparkCube":
        from xcube_spark.operators.subsampling import subsample_dataset

        return SparkCube(
            subsample_dataset(self.df, factor, agg_methods=agg_methods),
            self.grid.downsampled(factor), self.attrs)

    def levels(self, num: int | None = None) -> list["SparkCube"]:
        from xcube_spark.operators.levels import compute_levels

        return [SparkCube(df, g, self.attrs)
                for df, g in compute_levels(self.df, self.grid, num=num)]

    # ---- resampling (§2.6) -------------------------------------------

    def resample_space(self, target: "CubeGrid | int",
                       **kw) -> "SparkCube":
        """Grid target -> full dispatcher; int k -> block downscale."""
        from xcube_spark.operators.resampling import resample_in_space
        from xcube_spark.operators.resampling.affine import downscale_dataset

        if isinstance(target, int):
            return SparkCube(downscale_dataset(self.df, target),
                             self.grid.downsampled(target), self.attrs)
        return SparkCube(
            resample_in_space(self.df, self.grid, target, **kw),
            target, self.attrs)

    # ---- expressions & compute (§2.7, §2.9) --------------------------

    def evaluate(self, expressions: Mapping[str, Any], **kw) -> "SparkCube":
        """``{"B": "A * 2"}`` or the full attrs form
        ``{"B": {"expression": ..., "valid_pixel_expression": ...}}``."""
        from xcube_spark.operators.evaluate import evaluate_dataset

        specs = {
            name: (spec if isinstance(spec, Mapping)
                   else {"expression": spec})
            for name, spec in expressions.items()
        }
        return replace(self, df=evaluate_dataset(self.df, specs, **kw))

    def compute(self, cube_func: Callable, var_name: str,
                **kw) -> "SparkCube":
        from xcube_spark.operators.compute import compute_dataset

        return replace(self, df=compute_dataset(
            cube_func, self.df, grid=self.grid, var_name=var_name, **kw))

    # ---- extraction (§2.4) -------------------------------------------

    def values_for_points(self, points: DataFrame, **kw) -> DataFrame:
        from xcube_spark.operators.extract import get_cube_values_for_points

        return get_cube_values_for_points(self.df, self.grid, points, **kw)

    # ---- maintenance (§2.10) -----------------------------------------

    def normalize(self) -> "SparkCube":
        from xcube_spark.operators.maintenance import normalize_dataset

        df, grid = normalize_dataset(self.df, self.grid)
        return SparkCube(df, grid, self.attrs)

    def prune(self) -> "SparkCube":
        from xcube_spark.operators.maintenance import prune_dataset

        return replace(self, df=prune_dataset(self.df, self.grid))

    def chunk(self, chunks: tuple[int, int, int] | None = None) -> "SparkCube":
        from xcube_spark.operators.maintenance import chunk_dataset

        return replace(self, df=chunk_dataset(self.df, self.grid, chunks))

    def update_attrs(self) -> "SparkCube":
        from xcube_spark.cube.metadata import update_dataset_attrs

        return replace(self, attrs=update_dataset_attrs(self.df, self.attrs))

    # ---- persistence --------------------------------------------------

    def write_layout(self, path: str, files_per_partition: int = 8,
                     mode: str = "error") -> "SparkCube":
        """Materialize with the pruning-friendly physical layout
        (sources/layout.py: coarse-time partitions + spatial bands)."""
        from xcube_spark.cube.metadata import write_meta
        from xcube_spark.sources.layout import write_cube_layout

        write_cube_layout(self.df, path, self.grid,
                          files_per_partition=files_per_partition, mode=mode)
        if self.attrs:
            write_meta(path, self.attrs)
        return self

    def write(self, path: str, format_name: str | None = None,
              mode: str = "error", partition_by: list[str] | None = None,
              **options) -> "SparkCube":
        """write_cube + the _meta sidecar (dsio.py:58)."""
        from xcube_spark.cube.metadata import write_meta
        from xcube_spark.sources.dsio import write_dataset

        write_dataset(self.df, path, format_name=format_name, mode=mode,
                      partition_by=partition_by, **options)
        if self.attrs:
            write_meta(path, self.attrs)
        return self
