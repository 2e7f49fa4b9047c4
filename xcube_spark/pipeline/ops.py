"""Compute-operation registry — xcube/webapi/compute/op/ (decorator.py:13
``operation``/``op_param``, registry.py ``OpRegistry``, info.py
``OpInfo``) and the built-in ops in webapi/compute/operations.py.

This is the reference's *extension surface*: users register functions
as named operations; the server derives a JSON schema for each
operation's parameters from its Python signature (refined by
``op_param``), validates incoming requests against it, and invokes the
function.  Here an operation takes and returns **DataFrames** — a
registered op is a composable piece of Spark plan, so invoking one
adds to the lazy plan instead of computing anything.

No HTTP layer (declared non-goal): ``invoke`` is the
request-validation + dispatch core a server route would call.
"""

from __future__ import annotations

import inspect
import typing
from typing import Any, Callable, Mapping

from pyspark.sql import DataFrame

#: python annotation -> JSON-schema type (info.py's PyType mapping)
_PY_JSON_TYPES: dict[Any, str] = {
    int: "integer", float: "number", str: "string", bool: "boolean",
    list: "array", tuple: "array", dict: "object", type(None): "null",
}


def _resolve_annotation(ann: Any, fn: Callable) -> Any:
    """PEP 563 modules stringify annotations; resolve per-parameter so
    one unresolvable name doesn't void the whole signature."""
    if not isinstance(ann, str):
        return ann
    import builtins

    ns = {**vars(typing), **vars(builtins), "DataFrame": DataFrame}
    ns.update(getattr(fn, "__globals__", {}))
    try:
        return eval(ann, ns)  # noqa: S307 - annotation strings only
    except Exception:
        return inspect.Parameter.empty


def _schema_for_annotation(ann: Any) -> dict:
    if ann is inspect.Parameter.empty or ann is Any:
        return {}
    origin = typing.get_origin(ann)
    if origin in (list, tuple):
        args = [a for a in typing.get_args(ann) if a is not Ellipsis]
        schema: dict[str, Any] = {"type": "array"}
        if args and all(a == args[0] for a in args):
            schema["items"] = _schema_for_annotation(args[0])
        elif args:
            schema["prefixItems"] = [_schema_for_annotation(a) for a in args]
            schema["minItems"] = schema["maxItems"] = len(args)
        return schema
    if origin is typing.Union:
        subs = [_schema_for_annotation(a) for a in typing.get_args(ann)]
        return {"anyOf": subs}
    if ann in _PY_JSON_TYPES:
        return {"type": _PY_JSON_TYPES[ann]}
    return {}


class OpInfo:
    """Operation metadata: callable + derived params schema (info.py:32)."""

    def __init__(self, fn: Callable):
        self.fn = fn
        self.name = fn.__name__
        self.description = inspect.getdoc(fn) or ""
        sig = inspect.signature(fn)
        props: dict[str, dict] = {}
        required: list[str] = []
        self._dataset_params: list[str] = []
        for pname, p in sig.parameters.items():
            ann = _resolve_annotation(p.annotation, fn)
            if ann is DataFrame or pname in ("dataset", "cube", "df"):
                self._dataset_params.append(pname)
                continue
            props[pname] = _schema_for_annotation(ann)
            if p.default is inspect.Parameter.empty:
                required.append(pname)
            else:
                props[pname]["default"] = p.default
        self.params_schema: dict[str, Any] = {
            "type": "object",
            "properties": props,
            "required": required,
            "additionalProperties": False,
        }

    @property
    def dataset_params(self) -> list[str]:
        return list(self._dataset_params)

    def to_dict(self) -> dict:
        """JSON shape of GET /compute/operations entries
        (webapi/compute/controllers.py get_compute_operations)."""
        return {
            "operationId": self.name,
            "description": self.description,
            "parametersSchema": self.params_schema,
            "datasetParams": self.dataset_params,
        }

    def update_param_schema(self, name: str, patch: Mapping[str, Any]) -> None:
        self.params_schema["properties"].setdefault(name, {}).update(patch)

    def validate(self, params: Mapping[str, Any]) -> list[str]:
        """Shallow JSON-schema validation (type/required/extra) —
        the server's request gate."""
        errors = []
        props = self.params_schema["properties"]
        for req in self.params_schema["required"]:
            if req not in params:
                errors.append(f"missing required parameter {req!r}")
        for k, v in params.items():
            if k not in props:
                errors.append(f"unknown parameter {k!r}")
                continue
            expect = props[k].get("type")
            ok = {
                "integer": lambda x: isinstance(x, int)
                and not isinstance(x, bool),
                "number": lambda x: isinstance(x, (int, float))
                and not isinstance(x, bool),
                "string": lambda x: isinstance(x, str),
                "boolean": lambda x: isinstance(x, bool),
                "array": lambda x: isinstance(x, (list, tuple)),
                "object": lambda x: isinstance(x, dict),
                None: lambda x: True,
            }[expect](v)
            if not ok:
                errors.append(f"parameter {k!r} must be {expect}, "
                              f"got {type(v).__name__}")
        return errors


class OpRegistry:
    """Named-operation registry (registry.py)."""

    def __init__(self) -> None:
        self._ops: dict[str, OpInfo] = {}

    def register_op(self, fn: Callable) -> OpInfo:
        info = self._ops.get(fn.__name__)
        if info is None or info.fn is not fn:
            info = OpInfo(fn)
            self._ops[fn.__name__] = info
        return info

    def get_op(self, name: str) -> OpInfo:
        if name not in self._ops:
            raise KeyError(f"unknown operation {name!r}; "
                           f"registered: {sorted(self._ops)}")
        return self._ops[name]

    def ops(self) -> dict[str, OpInfo]:
        return dict(self._ops)

    def invoke(self, name: str, dataset: DataFrame,
               params: Mapping[str, Any] | None = None) -> DataFrame:
        """Validate ``params`` against the op's schema and apply the op
        to ``dataset`` — the controller's dispatch core
        (webapi/compute/controllers.py semantics)."""
        info = self.get_op(name)
        params = dict(params or {})
        errors = info.validate(params)
        if errors:
            raise ValueError(f"invalid parameters for {name!r}: "
                             + "; ".join(errors))
        ds_params = info.dataset_params
        if not ds_params:
            raise ValueError(f"operation {name!r} takes no dataset")
        return info.fn(**{ds_params[0]: dataset}, **params)


#: the default registry (decorator.py OP_REGISTRY)
OP_REGISTRY = OpRegistry()


def operation(_op: Callable | None = None, *,
              op_registry: OpRegistry = OP_REGISTRY):
    """``@operation`` — register a function as a named compute op
    (decorator.py:13)."""

    def deco(fn: Callable):
        op_registry.register_op(fn)
        return fn

    return deco(_op) if _op is not None else deco


def op_param(name: str, *, op_registry: OpRegistry = OP_REGISTRY,
             **schema_patch: Any):
    """``@op_param("x", title=..., description=..., default=...)`` —
    refine one parameter's schema (decorator.py:46)."""

    def deco(fn: Callable):
        info = op_registry.register_op(fn)
        info.update_param_schema(name, schema_patch)
        return fn

    return deco


# ---- built-in operations (webapi/compute/operations.py) ----------------


@operation
@op_param("bbox", title="Bounding box",
          description="x1, y1, x2, y2 in the dataset's CRS")
def spatial_subset(dataset: DataFrame,
                   bbox: tuple[float, float, float, float]) -> DataFrame:
    """Create a spatial subset from the given dataset."""
    from xcube_spark.operators.select import select_subset

    return select_subset(dataset, bbox=list(bbox))


@operation
@op_param("frequency", title="Resampling frequency",
          description="pandas-style offset, e.g. '1D', '2W', 'M'")
def temporal_resample(dataset: DataFrame, frequency: str,
                      method: str = "mean") -> DataFrame:
    """Resample the dataset along time."""
    from xcube_spark.operators.temporal import resample_in_time

    return resample_in_time(dataset, frequency, methods=(method,))
