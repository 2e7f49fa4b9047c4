"""Query registry — the driver-facing catalog of judged queries.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a ``(spark, sf_dir) -> DataFrame`` callable plus (where SQL can
express it) a DuckDB oracle string over the same parquet tables.  The
driver runs both sides at sf=0.01 and hash-compares results
(CORRECTNESS_r{N}.json); ``bench.py`` reuses the same registry.

Float policy: both sides ROUND aggregates to 6 decimals so IEEE
summation-order differences between engines can't flip the value hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # DuckDB oracle; None -> rows-only check
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def query(name: str, sql: str | None = None, bench: bool = False):
    """Decorator registering a judged query."""

    def deco(fn):
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql, bench=bench)
        return fn

    return deco


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver table.  The events table is written with
    nanosecond parquet timestamps, which Spark only reads as raw longs
    (legacy nanosAsLong conf); normalize to a proper TimestampType
    column (microsecond truncation — identical to DuckDB's cast)."""
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: registration) and return
    the populated registry."""
    from xcube_spark.queries import (  # noqa: F401
        cube_ops,
        events_ops,
        maintenance_ops,
        pipeline_ops,
        relational,
        resampling_ops,
        streaming_ops,
        text_pipeline,
    )

    return REGISTRY
