"""OWS Coverages parameter mapping — xcube/webapi/ows/coverages
(controllers.py:54, request.py:25-110).

The reference parses OGC API - Coverages query parameters
(``subset=lat(10:20),time("2020-01-01":"2020-02-01")``,
``bbox=x1,y1,x2,y2``, ``scale-factor=2``, ``properties=a,b``) and
executes the equivalent dataset subset.  Here the same grammar compiles
to engine calls: subset -> select_subset's bbox/time args, scale-factor
-> subsample/LOD selection, properties -> variable pruning — the
"parameter -> WHERE/LOD mapping" of SURVEY §2.11.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from xcube_spark.cube.grid import CubeGrid

_SUBSET_RE = re.compile(r"(\w+)\(([^)]*)\)")


@dataclass
class CoverageRequest:
    """Parsed coverage query parameters."""

    bbox: list[float] | None = None
    time_range: tuple[str | None, str | None] | None = None
    scale_factor: int = 1
    properties: list[str] | None = None
    extra_subsets: dict = field(default_factory=dict)


def _strip_quotes(v: str) -> str | None:
    v = v.strip().strip('"')
    return None if v in ("", "*") else v


def parse_coverage_params(params: dict[str, str]) -> CoverageRequest:
    """Parse the request's query parameters (request.py:25-110 grammar):

    - ``subset``: comma-separated ``axis(lo:hi)`` / ``axis(value)``
      entries; ``lat``/``lon``/``x``/``y`` feed the bbox, ``time`` the
      time range (open ends via ``*``), anything else lands in
      ``extra_subsets``;
    - ``bbox``: ``x1,y1,x2,y2`` (wins over subset axes);
    - ``scale-factor``: integer downscale;
    - ``properties``: variable selection.
    """
    req = CoverageRequest()
    x = {"lo": None, "hi": None}
    y = {"lo": None, "hi": None}

    subset = params.get("subset")
    if subset:
        for axis, body in _SUBSET_RE.findall(subset):
            parts = [p for p in body.split(":")]
            lo = _strip_quotes(parts[0])
            hi = _strip_quotes(parts[1]) if len(parts) > 1 else lo
            axis_l = axis.lower()
            if axis_l in ("lon", "x"):
                x = {"lo": lo, "hi": hi}
            elif axis_l in ("lat", "y"):
                y = {"lo": lo, "hi": hi}
            elif axis_l == "time":
                req.time_range = (lo, hi)
            else:
                req.extra_subsets[axis] = (lo, hi)

    if x["lo"] is not None or y["lo"] is not None:
        # a single-axis subset still constrains that axis (the reference
        # applies per-axis subsets independently): substitute the full
        # numeric extent for the missing axis instead of dropping both
        inf = float("inf")
        req.bbox = [
            float(x["lo"]) if x["lo"] is not None else -inf,
            float(y["lo"]) if y["lo"] is not None else -inf,
            float(x["hi"]) if x["hi"] is not None else inf,
            float(y["hi"]) if y["hi"] is not None else inf,
        ]

    if "bbox" in params:
        vals = [float(v) for v in params["bbox"].split(",")]
        if len(vals) != 4:
            raise ValueError(f"bbox needs 4 numbers, got {params['bbox']!r}")
        req.bbox = vals

    if "scale-factor" in params:
        sf = float(params["scale-factor"])
        if sf < 1 or sf != int(sf):
            raise ValueError(f"scale-factor must be a positive int, got {sf}")
        req.scale_factor = int(sf)

    if "properties" in params:
        req.properties = [p.strip() for p in params["properties"].split(",")
                          if p.strip()]
    return req


def execute_coverage_request(
    cube: DataFrame,
    grid: CubeGrid,
    params: dict[str, str],
) -> tuple[DataFrame, CubeGrid]:
    """Parameter -> engine mapping: subset/properties become a
    select_subset (predicates push to the scan), scale-factor a block
    downscale (or, against a levels store, an LOD pick)."""
    from xcube_spark.operators.resampling.affine import downscale_dataset
    from xcube_spark.operators.select import select_subset

    req = parse_coverage_params(params)
    out = select_subset(cube, var_names=req.properties, bbox=req.bbox,
                        time_range=req.time_range)
    out_grid = grid
    if req.scale_factor > 1:
        out = downscale_dataset(out, req.scale_factor)
        out_grid = grid.downsampled(req.scale_factor)
    return out, out_grid
