"""Dataset IO facade — xcube/core/dsio.py:42-657.

``open_dataset`` / ``write_dataset`` with format guessing, mirroring the
reference's ``open_cube``/``write_cube`` + the ``DatasetIO`` registry
(dsio.py:244-291 fitness-based guessing).  Spark-first: every format is
a thin dispatch to ``spark.read``/``df.write`` — the DataSource V2
machinery replaces the reference's driver classes, so a "format driver"
here is just (reader options, writer options, extension set).

Formats: parquet (canonical, ≈ the reference's Zarr), csv, json, orc.
The reference's Zarr/NetCDF stay out-of-container (no zarr/netcdf libs
baked in): their role — chunked columnar cube storage — is filled by
parquet; a Zarr ingest job would be an external converter exactly like
the reference's GeoTIFF ingest path.
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


FORMATS: dict[str, FormatDriver] = {
    "parquet": FormatDriver("parquet", (".parquet", ".pq")),
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
    writer = df.write.format(fmt).options(
        **{**FORMATS[fmt].write_options, **options}
    ).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(output_path)
