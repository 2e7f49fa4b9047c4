"""Minimal geometry toolkit: WKT/GeoJSON parsing + numpy predicates.

Replaces the reference's shapely dependency (xcube/core/geom.py uses
shapely for normalize/mask/rasterize) with a dependency-free subset:
the environment ships no shapely, and the engine only needs geometry
*normalization* and *point-in-polygon* — cells are points, so every
geometry filter reduces to point tests against (multi)polygons.

Supported: POINT, LINESTRING (bbox use only), POLYGON (holes ok),
MULTIPOLYGON, GeoJSON dicts, (x1, y1, x2, y2) bboxes, (x, y) points.
Anti-meridian-crossing boxes split into two-part MultiPolygons
(geom.py:573-580 semantics).
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import numpy as np

Ring = list[tuple[float, float]]
#: polygon = [outer_ring, hole1, ...]; multipolygon = list of polygons
Geometry = dict[str, Any]

_WKT_RE = re.compile(r"^\s*(\w+)\s*(.*)$", re.S)


def _parse_numbers(text: str) -> list[float]:
    # accepts '.5', '5.', '5', '5.0', exponents — a digits-before-dot
    # requirement would silently truncate valid WKT coordinates
    return [float(t) for t in
            re.findall(r"-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?", text)]


def _parse_ring_list(text: str) -> list[Ring]:
    rings = []
    for ring_txt in re.findall(r"\(([^()]*)\)", text):
        nums = _parse_numbers(ring_txt)
        rings.append([(nums[i], nums[i + 1]) for i in range(0, len(nums), 2)])
    return rings


def parse_wkt(wkt: str) -> Geometry:
    m = _WKT_RE.match(wkt)
    if not m:
        raise ValueError(f"invalid WKT: {wkt[:50]!r}")
    kind = m.group(1).upper()
    body = m.group(2)
    if kind == "POINT":
        nums = _parse_numbers(body)
        return {"type": "Point", "coordinates": (nums[0], nums[1])}
    if kind == "LINESTRING":
        nums = _parse_numbers(body)
        pts = [(nums[i], nums[i + 1]) for i in range(0, len(nums), 2)]
        return {"type": "LineString", "coordinates": pts}
    if kind == "POLYGON":
        return {"type": "Polygon", "coordinates": _parse_ring_list(body)}
    if kind == "MULTIPOLYGON":
        polys = []
        # split top-level (( ... )) groups
        depth = 0
        start = None
        for i, ch in enumerate(body):
            if ch == "(":
                if depth == 1 and start is None:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 1 and start is not None:
                    polys.append(_parse_ring_list(body[start : i + 1]))
                    start = None
        return {"type": "MultiPolygon", "coordinates": polys}
    raise ValueError(f"unsupported WKT type {kind!r}")


def normalize_geometry(geom: Any) -> Geometry:
    """Coerce WKT / GeoJSON dict / bbox tuple / point tuple into a
    geometry dict — normalize_geometry (geom.py:559-638).  Boxes whose
    x1 > x2 cross the anti-meridian and split into a two-part
    MultiPolygon (geom.py:573-580)."""
    if isinstance(geom, dict) and "type" in geom:
        g = {"type": geom["type"], "coordinates": geom["coordinates"]}
        if g["type"] == "Polygon":
            g["coordinates"] = [[tuple(p) for p in r] for r in g["coordinates"]]
        elif g["type"] == "MultiPolygon":
            g["coordinates"] = [
                [[tuple(p) for p in r] for r in poly] for poly in g["coordinates"]
            ]
        elif g["type"] == "Point":
            g["coordinates"] = tuple(g["coordinates"])
        return g
    if isinstance(geom, str):
        return parse_wkt(geom)
    if isinstance(geom, Sequence):
        if len(geom) == 2:
            return {"type": "Point", "coordinates": (float(geom[0]), float(geom[1]))}
        if len(geom) == 4:
            x1, y1, x2, y2 = (float(v) for v in geom)
            if x1 > x2:  # anti-meridian crossing
                return {
                    "type": "MultiPolygon",
                    "coordinates": [
                        [_box_ring(x1, y1, 180.0, y2)],
                        [_box_ring(-180.0, y1, x2, y2)],
                    ],
                }
            return {"type": "Polygon", "coordinates": [_box_ring(x1, y1, x2, y2)]}
    raise ValueError(f"cannot normalize geometry from {type(geom).__name__}")


def _box_ring(x1: float, y1: float, x2: float, y2: float) -> Ring:
    return [(x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1)]


def geometry_bbox(geom: Geometry) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) over all coordinates."""
    pts = list(_iter_points(geom))
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return min(xs), min(ys), max(xs), max(ys)


def _iter_points(geom: Geometry):
    t = geom["type"]
    c = geom["coordinates"]
    if t == "Point":
        yield c
    elif t == "LineString":
        yield from c
    elif t == "Polygon":
        for ring in c:
            yield from ring
    elif t == "MultiPolygon":
        for poly in c:
            for ring in poly:
                yield from ring
    else:
        raise ValueError(f"unsupported geometry type {t!r}")


def is_rectangle(geom: Geometry) -> tuple[float, float, float, float] | None:
    """If the geometry is an axis-aligned box, return its bbox — the
    predicate-pushdown fast path (a bbox filter needs no UDF and prunes
    parquet row groups; mirrors clip-before-mask, geom.py:341-347)."""
    if geom["type"] != "Polygon" or len(geom["coordinates"]) != 1:
        return None
    ring = geom["coordinates"][0]
    pts = ring[:-1] if ring[0] == ring[-1] else ring
    if len(pts) != 4:
        return None
    xs = sorted({p[0] for p in pts})
    ys = sorted({p[1] for p in pts})
    if len(xs) == 2 and len(ys) == 2:
        corners = {(x, y) for x in xs for y in ys}
        if set(pts) == corners:
            return xs[0], ys[0], xs[1], ys[1]
    return None


def points_in_polygon(
    xs: np.ndarray, ys: np.ndarray, geom: Geometry
) -> np.ndarray:
    """Vectorized ray-casting point-in-(multi)polygon with hole support
    — the numpy replacement for rasterio.features.geometry_mask
    (geom.py:363-374).  Even-odd rule; boundary points follow the
    half-open convention of the crossing count."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if geom["type"] == "Point":
        px, py = geom["coordinates"]
        return (xs == px) & (ys == py)
    if geom["type"] == "Polygon":
        polys = [geom["coordinates"]]
    elif geom["type"] == "MultiPolygon":
        polys = geom["coordinates"]
    else:
        raise ValueError(f"cannot test containment in {geom['type']!r}")

    inside = np.zeros(xs.shape, dtype=bool)
    for rings in polys:
        acc = np.zeros(xs.shape, dtype=bool)
        for ring in rings:
            acc ^= _ring_crossings(xs, ys, ring)
        inside |= acc
    return inside


def _ring_crossings(xs: np.ndarray, ys: np.ndarray, ring: Ring) -> np.ndarray:
    """Odd crossing count of a horizontal ray from each point."""
    rx = np.array([p[0] for p in ring], dtype=np.float64)
    ry = np.array([p[1] for p in ring], dtype=np.float64)
    if rx[0] != rx[-1] or ry[0] != ry[-1]:
        rx = np.append(rx, rx[0])
        ry = np.append(ry, ry[0])
    x1, y1 = rx[:-1], ry[:-1]
    x2, y2 = rx[1:], ry[1:]
    px = xs[..., None]
    py = ys[..., None]
    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    crossing = cond & (px < xint)
    return (crossing.sum(axis=-1) % 2).astype(bool)


def geometries_intersect(a: Geometry, b: Geometry) -> bool:
    """Conservative intersects test: bbox overlap + mutual vertex
    containment + point cases.  Covers the find_places query shapes
    (webapi/places/controllers.py:25); exact segment-crossing-only
    intersection (no vertex inside) is not detected — documented v1
    limitation."""
    ax1, ay1, ax2, ay2 = geometry_bbox(a)
    bx1, by1, bx2, by2 = geometry_bbox(b)
    if ax2 < bx1 or bx2 < ax1 or ay2 < by1 or by2 < ay1:
        return False
    for g, other in ((a, b), (b, a)):
        if other["type"] in ("Polygon", "MultiPolygon"):
            pts = np.array(list(_iter_points(g)), dtype=np.float64)
            if points_in_polygon(pts[:, 0], pts[:, 1], other).any():
                return True
    if a["type"] == "Point" or b["type"] == "Point":
        return False
    # both polygonal with overlapping bboxes but no vertex containment:
    # treat as intersecting (bbox-level answer)
    return a["type"] in ("Polygon", "MultiPolygon") and b["type"] in (
        "Polygon",
        "MultiPolygon",
    )
