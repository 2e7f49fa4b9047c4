"""Computed variables — xcube/core/evaluate.py:16-152.

``evaluate_dataset``: compute new variables from expressions attached
to variable metadata (``expression`` attr) and mask by
``valid_pixel_expression`` — the reference processes variables in
dependency order and evaluates with numpy; we compile each expression
to a Column (functions/expression.py) and chain ``withColumn``s, so
the whole evaluation is one codegen stage, no Python in the loop.
"""

from __future__ import annotations

from graphlib import TopologicalSorter
from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xcube_spark.functions.expression import compile_expr, split_var_assignment


def evaluate_dataset(
    cube: DataFrame,
    processed_variables: Mapping[str, Mapping[str, str | None]] | None = None,
) -> DataFrame:
    """Add computed variables.

    ``processed_variables`` maps var name -> {"expression": str | None,
    "valid_pixel_expression": str | None} (the reference's attrs model,
    evaluate.py:40-60).  Variables may reference each other; evaluation
    order is a topological sort of the reference graph (the reference's
    dependency-ish ordering, evaluate.py:85-100).

    ``valid_pixel_expression`` masks invalid cells to NULL — the
    relational form of the reference's NaN masking (evaluate.py:120+),
    consistent with the engine-wide NaN->NULL policy (SURVEY §4).
    """
    if not processed_variables:
        return cube

    specs: dict[str, tuple[str | None, str | None]] = {}
    for name, attrs in processed_variables.items():
        expr = attrs.get("expression")
        if expr:
            target, expr = split_var_assignment(expr)
            name = target or name
        specs[name] = (expr, attrs.get("valid_pixel_expression"))

    # dependency order: an expression referencing another computed var
    # must evaluate after it
    deps = {
        name: {
            other
            for other in specs
            if other != name
            and expr is not None
            and _references(expr, other)
        }
        for name, (expr, _) in specs.items()
    }
    order = list(TopologicalSorter(deps).static_order())

    out = cube
    for name in order:
        expr, valid_expr = specs[name]
        if expr is not None:
            col = compile_expr(expr)
        elif name in out.columns:
            col = F.col(name)
        else:
            raise KeyError(f"variable {name!r} has no expression and no column")
        if valid_expr:
            col = F.when(compile_expr(valid_expr), col)
        out = out.withColumn(name, col)
    return out


def _references(expr: str, name: str) -> bool:
    import ast

    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError:
        return False
    return any(
        isinstance(n, ast.Name) and n.id == name for n in ast.walk(tree)
    )
