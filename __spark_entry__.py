"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the registry in xcube_spark/queries/* — one
entry per implemented operator from SURVEY.md §2 (plus the pipeline
extensions), each with a DuckDB oracle where SQL can express it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from xcube_spark.queries import load_all

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's signature pipeline (SURVEY §7.1) —
    subset ∧ bbox ∧ time -> per-time-step aggregation — on the
    synthesized fixture cube, plus nothing driver-side but the scan of
    /root/testdata/sf0.001 to prove IO wiring."""
    sf_dir = "/root/testdata/sf0.001"
    # touch the driver tables (IO smoke) ...
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    # ... and run the flagship cube query
    return _REGISTRY["cube_select_timeseries"].fn(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in _REGISTRY.items() if q.sql is not None}
