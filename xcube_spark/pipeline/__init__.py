from xcube_spark.pipeline import dedup, similarity, text  # noqa: F401
