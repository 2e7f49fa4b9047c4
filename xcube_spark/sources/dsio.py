"""Dataset IO facade — xcube/core/dsio.py:42-657.

``open_dataset`` / ``write_dataset`` with format guessing, mirroring the
reference's ``open_cube``/``write_cube`` + the ``DatasetIO`` registry
(dsio.py:244-291 fitness-based guessing).  Spark-first: every format is
a thin dispatch to ``spark.read``/``df.write`` — the DataSource V2
machinery replaces the reference's driver classes, so a "format driver"
here is just (reader options, writer options, extension set).

Formats: parquet (canonical columnar storage), zarr (the reference's
canonical cube format — self-implemented v2 reader/writer, see
sources/zarrio.py), csv, json, orc, netcdf.  A ``.nc`` path is
sniffed by magic number: classic CDF-1/2 goes through
sources/netcdf3.py, netCDF-4/HDF5 through the self-implemented HDF5
parser in sources/hdf5.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class FormatDriver:
    """A (name, extensions, read/write options) format entry — the
    relational reduction of the reference's DatasetIO class
    (dsio.py:294-356: name/ext/modes + read/write)."""

    name: str
    extensions: tuple[str, ...]
    read_options: dict = field(default_factory=dict)
    write_options: dict = field(default_factory=dict)

    def read(self, spark: SparkSession, path: str, **options) -> DataFrame:
        return (
            spark.read.format(self.name)
            .options(**{**self.read_options, **options})
            .load(path)
        )

    def write(self, df: DataFrame, path: str, mode: str = "error",
              **options) -> None:
        (
            df.write.format(self.name)
            .options(**{**self.write_options, **options})
            .mode(mode)
            .save(path)
        )


@dataclass(frozen=True)
class ZarrFormatDriver(FormatDriver):
    """Zarr v2 entry (ZarrDatasetIO, /root/reference/xcube/core/dsio.py:411):
    dispatches to the self-implemented chunk-parallel reader/writer in
    sources/zarrio.py instead of a Spark DataSource."""

    def read(self, spark: SparkSession, path: str, **options) -> DataFrame:
        from xcube_spark.sources.zarrio import open_zarr_cube

        return open_zarr_cube(spark, path,
                              var_names=options.get("var_names"),
                              cell_bounds=options.get("cell_bounds"))

    def write(self, df: DataFrame, path: str, mode: str = "error",
              **options) -> None:
        from xcube_spark.sources.zarrio import write_zarr_cube

        grid = options.pop("grid", None)
        if grid is None:
            raise ValueError("zarr write needs grid=<CubeGrid> option")
        write_zarr_cube(df, path, grid, mode=mode, **options)


@dataclass(frozen=True)
class NetcdfFormatDriver(FormatDriver):
    """NetCDF entry (Netcdf4DatasetIO,
    /root/reference/xcube/core/dsio.py:359): magic-number dispatch
    between the self-implemented classic CDF-1/2 reader/writer
    (sources/netcdf3.py) and the self-implemented netCDF-4/HDF5
    parser (sources/hdf5.py)."""

    def read(self, spark: SparkSession, path: str, **options) -> DataFrame:
        with open(path, "rb") as f:
            magic = f.read(8)
        if magic[:3] == b"CDF":
            from xcube_spark.sources.netcdf3 import open_netcdf_cube

            return open_netcdf_cube(spark, path,
                                    var_names=options.get("var_names"))
        from xcube_spark.sources.hdf5 import open_netcdf4_cube

        return open_netcdf4_cube(spark, path,
                                 var_names=options.get("var_names"))

    def write(self, df: DataFrame, path: str, mode: str = "error",
              **options) -> None:
        grid = options.pop("grid", None)
        if grid is None:
            raise ValueError("netcdf write needs grid=<CubeGrid> option")
        if options.pop("format_version", 4) == 3:
            from xcube_spark.sources.netcdf3 import write_netcdf_cube

            write_netcdf_cube(df, path, grid, **options)
        else:
            from xcube_spark.sources.hdf5 import write_netcdf4_cube

            write_netcdf4_cube(df, path, grid, **options)


@dataclass(frozen=True)
class GeoTiffFormatDriver(FormatDriver):
    """GeoTIFF/COG entry (plugin.py:91-218 geotiff accessors,
    store/fs/impl/geotiff.py): self-implemented classic-TIFF subset
    reader (sources/geotiff.py), chunk-parallel like zarr."""

    def read(self, spark: SparkSession, path: str, **options) -> DataFrame:
        from xcube_spark.sources.geotiff import open_geotiff_cube

        return open_geotiff_cube(
            spark, path, level=options.get("level", 0),
            band_names=options.get("band_names"))

    def write(self, df: DataFrame, path: str, mode: str = "error",
              **options) -> None:
        from xcube_spark.sources.geotiff import write_geotiff

        required = {"var_names", "width", "height"}
        missing = required - set(options)
        if missing:
            raise ValueError(f"geotiff write needs options {sorted(missing)}")
        write_geotiff(df, path, **options)


@dataclass(frozen=True)
class Jpeg2000FormatDriver(FormatDriver):
    """JPEG-2000 entry (ref plugin.py:102-107 j2k/jp2 openers):
    self-implemented Part 1 reversible codec (sources/jp2.py),
    tile-parallel like geotiff."""

    def read(self, spark: SparkSession, path: str, **options) -> DataFrame:
        from xcube_spark.sources.jp2 import open_jp2_cube

        return open_jp2_cube(
            spark, path,
            band_name=options.get("band_name", "band_1"),
            x_start=options.get("x_start"),
            y_end=options.get("y_end"),
            res=options.get("res"),
            nodata=options.get("nodata"))

    def write(self, df: DataFrame, path: str, mode: str = "error",
              **options) -> None:
        from xcube_spark.sources.jp2 import write_jp2_cube_plane

        required = {"var_name", "width", "height"}
        missing = required - set(options)
        if missing:
            raise ValueError(f"jp2 write needs options {sorted(missing)}")
        write_jp2_cube_plane(df, path, **options)


@dataclass(frozen=True)
class FeatureFormatDriver(FormatDriver):
    """Vector-feature entries (GeoJSON / ESRI Shapefile accessors,
    /root/reference/xcube/plugin.py:91-218): read-only dispatch to the
    WKT-features readers in sources/features.py."""

    def read(self, spark: SparkSession, path: str, **options) -> DataFrame:
        from xcube_spark.sources import features

        if self.name == "shapefile":
            return features.open_shapefile_features(spark, path)
        return features.open_geojson_features(spark, path)

    def write(self, df: DataFrame, path: str, mode: str = "error",
              **options) -> None:
        raise ValueError(f"{self.name} driver is read-only")


FORMATS: dict[str, FormatDriver] = {
    "parquet": FormatDriver("parquet", (".parquet", ".pq")),
    "zarr": ZarrFormatDriver("zarr", (".zarr",)),
    "geojson": FeatureFormatDriver("geojson", (".geojson",)),
    "shapefile": FeatureFormatDriver("shapefile", (".shp",)),
    "geotiff": GeoTiffFormatDriver("geotiff", (".tif", ".tiff")),
    "jpeg2000": Jpeg2000FormatDriver("jpeg2000", (".jp2", ".j2k")),
    "netcdf": NetcdfFormatDriver("netcdf", (".nc", ".cdf")),
    "csv": FormatDriver(
        "csv",
        (".csv",),
        read_options={"header": "true", "inferSchema": "true"},
        write_options={"header": "true"},
    ),
    "json": FormatDriver("json", (".json", ".ndjson", ".jsonl")),
    "orc": FormatDriver("orc", (".orc",)),
}


def guess_format(path: str) -> str:
    """Extension-based format guess (the reference's guess_dataset_format,
    dsio.py:244-262); parquet is the default like Zarr is there."""
    lower = path.rstrip("/").lower()
    for name, drv in FORMATS.items():
        if any(lower.endswith(ext) for ext in drv.extensions):
            return name
    return "parquet"


def open_dataset(
    spark: SparkSession,
    input_path: str,
    format_name: str | None = None,
    **options,
) -> DataFrame:
    """open_cube/open_dataset (dsio.py:42-110): read with explicit or
    guessed format."""
    fmt = format_name or guess_format(input_path)
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {sorted(FORMATS)}")
    return FORMATS[fmt].read(spark, input_path, **options)


def write_dataset(
    df: DataFrame,
    output_path: str,
    format_name: str | None = None,
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """write_cube/write_dataset (dsio.py:58-137).  ``partition_by``
    materializes the physical layout (chunk/partition pruning keys —
    SURVEY §1.8: partition cells tables by coarse time)."""
    fmt = format_name or guess_format(output_path)
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {sorted(FORMATS)}")
    drv = FORMATS[fmt]
    if type(drv).write is not FormatDriver.write:  # custom driver (zarr)
        drv.write(df, output_path, mode=mode, **options)
        return
    writer = df.write.format(fmt).options(
        **{**drv.write_options, **options}
    ).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(output_path)
