from xcube_spark.pipeline import byoa, dedup, similarity, text  # noqa: F401
