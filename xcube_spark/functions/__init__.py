from xcube_spark.functions.expression import compile_expr, split_var_assignment

__all__ = ["compile_expr", "split_var_assignment"]
