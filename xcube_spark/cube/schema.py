"""Cube schema + ancillary-variable discovery.

Reference: ``xcube/core/schema.py`` (CubeSchema: shape/dims/chunks/
coords validation) and ``xcube/core/ancvar.py`` (CF ancillary-variable
resolution).  In the cells-table model the schema IS the
:class:`~xcube_spark.cube.grid.CubeGrid` plus the variable column set;
``CubeSchema`` packages them with the reference's property surface so
store descriptors and the generator can reason about shape/chunking
without touching data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

from pyspark.sql import DataFrame

from xcube_spark.cube.grid import CubeGrid, var_names

#: xcube-specific name prefixes implying a standard-name modifier
#: (ancvar.py:9-12)
ANCILLARY_SUFFIX_TO_MODIFIER = [
    ("std", "standard_error"),
    ("count", "number_of_observations"),
]

#: CF Appendix C standard-name modifiers (ancvar.py:86-104)
_KNOWN_MODIFIERS = {
    "standard_error",
    "number_of_observations",
    "status_flag",
    "detection_minimum",
}


@dataclass(frozen=True)
class CubeSchema:
    """Shape/dims/chunks of a cube (schema.py:14-200).

    ``shape``/``chunks`` are (time, y, x) ordered like the reference's
    default dims; coordinate *values* stay in the grid (they are
    expressions, not arrays, in the Spark model).
    """

    grid: CubeGrid
    variable_names: tuple[str, ...]
    x_name: str = "x"
    y_name: str = "y"
    time_name: str = "time"

    @property
    def ndim(self) -> int:
        return 3

    @property
    def dims(self) -> tuple[str, ...]:
        return (self.time_name, self.y_name, self.x_name)

    @property
    def shape(self) -> tuple[int, int, int]:
        g = self.grid
        return (g.time_periods, g.height, g.width)

    @property
    def chunks(self) -> tuple[int, int, int]:
        return tuple(self.grid.chunks)

    @property
    def num_chunks(self) -> tuple[int, int, int]:
        return tuple(
            -(-s // c) for s, c in zip(self.shape, self.chunks)
        )

    def to_dict(self) -> dict:
        return {
            "dims": list(self.dims),
            "shape": list(self.shape),
            "chunks": list(self.chunks),
            "variables": list(self.variable_names),
            "crs": self.grid.crs,
        }


#: columns every cells-table cube must carry (cubespec §grid)
_REQUIRED_COLS = ("t_i", "y_i", "x_i", "time", "y", "x")


def get_cube_schema(cube: DataFrame, grid: CubeGrid) -> CubeSchema:
    """Derive and validate the schema of a cells-table cube
    (schema.py:203-243 ``get_cube_schema``).

    Raises ``ValueError`` when the frame lacks the index/coordinate
    columns or has no data variables — the reference's "cube variables
    must have same dims" check collapses to this in the long model,
    since every column of one DataFrame shares the row grid by
    construction.
    """
    missing = [c for c in _REQUIRED_COLS if c not in cube.columns]
    if missing:
        raise ValueError(
            f"not a cube: missing index/coordinate column(s) "
            f"{', '.join(missing)}"
        )
    vars_ = var_names(cube)
    if not vars_:
        raise ValueError("not a cube: dataset has no data variables")
    return CubeSchema(grid=grid, variable_names=tuple(vars_))


def _modifier_from_standard_names(
    var_std: str | None, anc_std: str | None
) -> str | None:
    """CF Appendix C: ancillary std name = '<var std name> <modifier>'
    (ancvar.py:77-104)."""
    if not var_std or not anc_std:
        return None
    parts = anc_std.split(" ")
    if len(parts) == 2 and parts[0] == var_std:
        mod = parts[1]
        if mod in _KNOWN_MODIFIERS:
            return mod
    return None


def find_ancillary_var_names(
    cube: DataFrame,
    var_name: str,
    var_attrs: Mapping[str, Mapping[str, Any]] | None = None,
) -> dict[str, set[str]]:
    """Resolve ancillary variables for ``var_name``
    (ancvar.py:15-74): modifier -> variable-name set.

    Resolution order, exactly the reference's:

    1. the variable's CF ``ancillary_variables`` attribute (space-
       separated names), modifier derived from standard names;
    2. standard-name matching across all other variables
       (``'<std> <modifier>'``);
    3. xcube naming convention ``{var}_std`` / ``{var}_count``.

    ``var_attrs`` maps variable name -> attrs (the ``_meta`` sidecar's
    per-variable section); without it only rule 3 applies.
    """
    names = set(var_names(cube))
    if var_name not in names:
        return {}
    attrs = dict(var_attrs or {})
    my = dict(attrs.get(var_name, {}))
    results: dict[str, set[str]] = {}

    listed = my.get("ancillary_variables")
    if isinstance(listed, str):
        for anc in listed.split(" "):
            if anc in names:
                mod = _modifier_from_standard_names(
                    my.get("standard_name"),
                    dict(attrs.get(anc, {})).get("standard_name"),
                ) or ""
                results.setdefault(mod, set()).add(anc)

    if not results and my.get("standard_name"):
        for anc in names:
            if anc == var_name:
                continue
            mod = _modifier_from_standard_names(
                my.get("standard_name"),
                dict(attrs.get(anc, {})).get("standard_name"),
            )
            if mod is not None:
                results.setdefault(mod, set()).add(anc)

    if not results:
        for suffix, mod in ANCILLARY_SUFFIX_TO_MODIFIER:
            cand = f"{var_name}_{suffix}"
            if cand in names:
                results.setdefault(mod, set()).add(cand)

    return results
