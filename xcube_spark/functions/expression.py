"""Expression compiler: user expression strings -> Spark Columns.

Re-expresses the reference's expression stack —
``compute_array_expr`` / ``transpile_expr`` (xcube/util/expression.py:
10-41,78-390: AST transpiler rewriting ``and/or/not`` to numpy logical
ops, ``min/max`` to fmin/fmax) and the sandboxed ``VarExpr`` evaluator
(xcube/core/varexpr/varexpr.py:52-310, namespace in varexpr/names.py)
— as a single Python-AST -> Column compiler.

Emitting Columns instead of evaluating is *inherently* sandboxed (the
reference needs an interpreter whitelist; we never execute user code)
and JVM-vectorized (the compiled expression runs inside whole-stage
codegen, never in Python).

Dialect (mirrors the reference's "user-friendly" rules):
- ``and / or / not``  -> boolean column ops (``&``, ``|``, ``~``)
- ``A if cond else B`` and ``where(cond, A, B)`` -> ``when/otherwise``
- ``min/max/fmin/fmax`` -> ``least``/``greatest`` (NaN-ignoring pair
  semantics of fmin/fmax map to least/greatest's null handling)
- numpy ufunc names (sin, cos, sqrt, log, exp, power, …) -> pyspark
  functions; constants ``pi``, ``e``, ``nan``, ``inf``
- bare names -> cube variable columns
"""

from __future__ import annotations

import ast
import math
from typing import Callable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- function registry: ufunc name -> Column function ------------------

def _where(cond: Column, a, b) -> Column:
    return F.when(cond, a).otherwise(b)


def _fmod(a, b):
    return a % b


def _square(a):
    return a * a


def _clip(a, lo, hi):
    return F.least(F.greatest(a, F.lit(lo) if not isinstance(lo, Column) else lo),
                   F.lit(hi) if not isinstance(hi, Column) else hi)


def _around(a, n=0):
    return F.round(a, n if isinstance(n, int) else 0)


FUNCTIONS: dict[str, Callable[..., Column]] = {
    # trigonometry / transcendentals (numpy ufunc names, varexpr/names.py)
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "arcsin": F.asin, "arccos": F.acos, "arctan": F.atan,
    "arctan2": F.atan2, "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "exp": F.exp, "expm1": F.expm1, "log": F.log, "log10": F.log10,
    "log2": F.log2, "log1p": F.log1p, "sqrt": F.sqrt, "cbrt": F.cbrt,
    "power": F.pow, "pow": F.pow, "square": _square,
    "absolute": F.abs, "abs": F.abs, "fabs": F.abs,
    "sign": F.signum, "floor": F.floor, "ceil": F.ceil, "ceiling": F.ceil,
    "trunc": lambda c: c.cast("long").cast("double"),
    "rint": F.rint, "around": _around, "round": _around,
    "degrees": F.degrees, "radians": F.radians,
    "fmod": _fmod, "mod": _fmod, "hypot": F.hypot,
    # pairwise min/max — reference rewrites min->fmin (expression.py:10-41)
    "fmin": F.least, "fmax": F.greatest,
    "min": F.least, "max": F.greatest,
    "minimum": F.least, "maximum": F.greatest,
    # selection / null handling
    "where": _where, "clip": _clip,
    "isnan": F.isnan, "isnull": F.isnull,
    "isfinite": lambda c: ~(F.isnan(c) | (F.abs(c) == float("inf"))),
    "isinf": lambda c: F.abs(c) == float("inf"),
    "nan_to_num": lambda c: F.when(F.isnan(c) | c.isNull(), 0.0).otherwise(c),
    # logical ufuncs (transpile target of and/or/not, expression.py:78+)
    "logical_and": lambda a, b: a & b,
    "logical_or": lambda a, b: a | b,
    "logical_not": lambda a: ~a,
    "logical_xor": lambda a, b: a.cast("boolean") != b.cast("boolean"),
}

CONSTANTS: dict[str, float] = {
    "pi": math.pi,
    "PI": math.pi,
    "e": math.e,
    "E": math.e,
    "nan": float("nan"),
    "NaN": float("nan"),
    "inf": float("inf"),
    "Infinity": float("inf"),
    "True": True,
    "False": False,
}

_BIN_OPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.FloorDiv: lambda a, b: F.floor(a / b),
    ast.Mod: lambda a, b: a % b,
    ast.Pow: lambda a, b: F.pow(a, b),
    ast.BitAnd: lambda a, b: a.bitwiseAND(b) if isinstance(a, Column) else a & b,
    ast.BitOr: lambda a, b: a.bitwiseOR(b) if isinstance(a, Column) else a | b,
    ast.BitXor: lambda a, b: a.bitwiseXOR(b) if isinstance(a, Column) else a ^ b,
    ast.LShift: lambda a, b: F.shiftleft(a, b),
    ast.RShift: lambda a, b: F.shiftright(a, b),
}

_CMP_OPS = {
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
}


class ExprError(ValueError):
    """Raised for unsupported or unsafe expression constructs."""


class _Compiler(ast.NodeVisitor):
    def __init__(self, names: Mapping[str, Column]):
        self.names = names

    # -- leaves ---------------------------------------------------------

    def visit_Constant(self, node: ast.Constant):
        if isinstance(node.value, (int, float, bool, str)):
            return node.value
        raise ExprError(f"unsupported literal {node.value!r}")

    def visit_Name(self, node: ast.Name):
        if node.id in self.names:
            return self.names[node.id]
        if node.id in CONSTANTS:
            return CONSTANTS[node.id]
        raise ExprError(f"unknown name {node.id!r}")

    # -- operators ------------------------------------------------------

    def visit_BinOp(self, node: ast.BinOp):
        op = _BIN_OPS.get(type(node.op))
        if op is None:
            raise ExprError(f"unsupported operator {type(node.op).__name__}")
        return op(self.visit(node.left), self.visit(node.right))

    def visit_UnaryOp(self, node: ast.UnaryOp):
        v = self.visit(node.operand)
        if isinstance(node.op, ast.USub):
            return -v
        if isinstance(node.op, ast.UAdd):
            return v
        if isinstance(node.op, (ast.Not, ast.Invert)):
            return ~v if isinstance(v, Column) else (not v)
        raise ExprError(f"unsupported unary {type(node.op).__name__}")

    def visit_BoolOp(self, node: ast.BoolOp):
        # and/or -> element-wise boolean ops (expression.py:78+ rewrite)
        vals = [self.visit(v) for v in node.values]
        out = vals[0]
        for v in vals[1:]:
            out = (out & v) if isinstance(node.op, ast.And) else (out | v)
        return out

    def visit_Compare(self, node: ast.Compare):
        left = self.visit(node.left)
        out = None
        for op, comp in zip(node.ops, node.comparators):
            fn = _CMP_OPS.get(type(op))
            if fn is None:
                raise ExprError(f"unsupported comparison {type(op).__name__}")
            right = self.visit(comp)
            c = fn(left, right)
            out = c if out is None else (out & c)
            left = right
        return out

    def visit_IfExp(self, node: ast.IfExp):
        # A if cond else B -> when(cond, A).otherwise(B)
        return _where(self.visit(node.test), self.visit(node.body), self.visit(node.orelse))

    def visit_Call(self, node: ast.Call):
        if not isinstance(node.func, ast.Name):
            # allow np.xxx / math.xxx prefixes by taking the attr name
            if isinstance(node.func, ast.Attribute) and isinstance(
                node.func.value, ast.Name
            ) and node.func.value.id in ("np", "numpy", "math", "xr"):
                fname = node.func.attr
            else:
                raise ExprError("only plain function calls are allowed")
        else:
            fname = node.func.id
        fn = FUNCTIONS.get(fname)
        if fn is None:
            raise ExprError(f"unknown function {fname!r}")
        if node.keywords:
            raise ExprError("keyword arguments are not supported")
        args = [self.visit(a) for a in node.args]
        # pyspark functions need Column args; python scalars stay raw only
        # where the function takes a plain-int parameter (round scale,
        # shift distance, clip bounds)
        if fname not in ("round", "around", "shiftleft", "shiftright", "clip"):
            args = [
                F.lit(a) if isinstance(a, (bool, int, float)) else a
                for a in args
            ]
        return fn(*args)

    def generic_visit(self, node):
        raise ExprError(f"unsupported syntax: {type(node).__name__}")


def split_var_assignment(expr: str) -> tuple[str | None, str]:
    """``"B = B3/B4"`` -> ("B", "B3/B4"); plain exprs -> (None, expr)
    (varexpr/context.py:17-149 assignment syntax)."""
    try:
        tree = ast.parse(expr.strip(), mode="exec")
    except SyntaxError:
        return None, expr
    if (
        len(tree.body) == 1
        and isinstance(tree.body[0], ast.Assign)
        and len(tree.body[0].targets) == 1
        and isinstance(tree.body[0].targets[0], ast.Name)
    ):
        target = tree.body[0].targets[0].id
        value = ast.unparse(tree.body[0].value)
        return target, value
    return None, expr


def compile_expr(
    expr: str, names: Mapping[str, Column] | None = None
) -> Column:
    """Compile a user expression string into a Spark Column.

    ``names`` maps variable names to Columns (defaults to treating every
    bare name as ``F.col(name)``).
    """
    try:
        tree = ast.parse(expr.strip(), mode="eval")
    except SyntaxError as e:
        raise ExprError(f"invalid expression: {e}") from e

    class _DefaultNames(dict):
        # treat every bare name as a column — except the math constants,
        # which keep their reference-namespace meaning (varexpr/names.py)
        def __contains__(self, k):
            return k not in CONSTANTS

        def __getitem__(self, k):
            return F.col(k)

    ns = names if names is not None else _DefaultNames()
    out = _Compiler(ns).visit(tree.body)
    if not isinstance(out, Column):
        out = F.lit(out)
    return out


def validate_expression(cube, expr: str) -> dict:
    """Server expressions validate API
    (webapi/expressions/controllers.py:24 ``validate_expression``): the
    reference evaluates the expression on a 2-cell dataset slice and
    returns the mean — catching name, type, and runtime errors before a
    full evaluation is committed.  Same here: compile (syntax +
    whitelist), reject unknown variable names against the cube's
    schema, then evaluate over ``limit(2)`` — a one-task probe job.

    Returns ``{"result": <mean>}``; raises :class:`ExprError` with the
    reference's error semantics otherwise.
    """
    import ast as _ast

    try:
        tree = _ast.parse(expr.strip(), mode="eval")
    except SyntaxError as e:
        raise ExprError(f"invalid expression: {e}") from e
    known = set(cube.columns) | set(CONSTANTS) | set(FUNCTIONS)
    unknown = sorted({n.id for n in _ast.walk(tree)
                      if isinstance(n, _ast.Name) and n.id not in known})
    if unknown:
        raise ExprError(f"unknown variable(s) {', '.join(unknown)!s} — "
                        f"dataset has {sorted(cube.columns)}")
    col = compile_expr(expr)
    try:
        row = cube.limit(2).agg(F.avg(col.cast("double"))).collect()[0]
    except Exception as e:  # runtime/type errors surface as ExprError
        raise ExprError(str(e)) from e
    return {"result": row[0]}
