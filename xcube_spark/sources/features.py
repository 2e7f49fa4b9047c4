"""Vector-feature ingestion — GeoJSON and ESRI Shapefile readers.

Fills the reference's GeoJSON / Shapefile format-accessor slots
(xcube/plugin.py:91-218 ``geojson``/``shapefile`` openers via
geopandas) and feeds the places machinery
(webapi/places/controllers.py:25 ``find_places``) without geopandas /
fiona / shapely: GeoJSON is plain JSON, and the Shapefile main/dBase
files are a small public binary spec (ESRI whitepaper), both parsed
directly.

Output contract: a **WKT-features DataFrame** — ``feature_id`` +
``geometry`` (WKT string) + one column per property — the exact input
shape of ``operators/geom.py`` (find_places, rasterize_features,
mask/clip) and ``functions/wkt.py``.

Scale model: feature collections are metadata-sized (place groups,
admin boundaries) and parse driver-side; for feature *data* at scale,
newline-delimited GeoJSON (GeoJSONSeq, RFC 8142 style) parses
distributed — ``spark.read.text`` + an Arrow-batched ``mapInPandas``,
one feature per line, executor-local.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# ---- GeoJSON geometry -> WKT -------------------------------------------


def _ring(coords) -> str:
    return "(" + ", ".join(f"{x} {y}" for x, y, *_ in coords) + ")"


def geojson_to_wkt(geom: dict) -> str:
    """GeoJSON geometry dict -> WKT (the 7 standard types)."""
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        return f"POINT({c[0]} {c[1]})"
    if t == "MultiPoint":
        return "MULTIPOINT" + _ring(c)
    if t == "LineString":
        return "LINESTRING" + _ring(c)
    if t == "MultiLineString":
        return "MULTILINESTRING(" + ", ".join(_ring(p) for p in c) + ")"
    if t == "Polygon":
        return "POLYGON(" + ", ".join(_ring(r) for r in c) + ")"
    if t == "MultiPolygon":
        return "MULTIPOLYGON(" + ", ".join(
            "(" + ", ".join(_ring(r) for r in poly) + ")" for poly in c
        ) + ")"
    if t == "GeometryCollection":
        return "GEOMETRYCOLLECTION(" + ", ".join(
            geojson_to_wkt(g) for g in geom["geometries"]) + ")"
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def _feature_row(feat: dict, idx: int) -> dict:
    props = dict(feat.get("properties") or {})
    fid = feat.get("id", props.pop("id", idx))
    return {"feature_id": str(fid),
            "geometry": geojson_to_wkt(feat["geometry"]), **props}


def open_geojson_features(spark: SparkSession, path: str) -> DataFrame:
    """GeoJSON -> WKT-features DataFrame.

    A ``FeatureCollection`` document parses driver-side (place groups
    are metadata-sized); a newline-delimited file (one Feature per
    line) parses **distributed**: ``spark.read.text`` splits the file,
    each task JSON-decodes its own lines via mapInPandas."""
    # a FeatureCollection is valid with its members in ANY order (the
    # "type" key may come after "features"), so sniffing the head is
    # unreliable — try a full-document parse and fall back to the
    # distributed NDJSON path only when that fails.  Fast path: when
    # the FIRST LINE alone is a complete Feature object the file is
    # newline-delimited; skip the driver-side whole-file load.
    with open(path, "r", encoding="utf-8") as f:
        first_line = f.readline().strip().rstrip(",")
    try:
        head_obj = json.loads(first_line)
    except json.JSONDecodeError:
        head_obj = None
    fc = None
    if not (isinstance(head_obj, dict) and head_obj.get("type") == "Feature"):
        try:
            with open(path, "r", encoding="utf-8") as f:
                fc = json.load(f)
        except (json.JSONDecodeError, UnicodeDecodeError):
            fc = None
    if isinstance(fc, dict) and fc.get("type") == "FeatureCollection":
        rows = [_feature_row(feat, i)
                for i, feat in enumerate(fc.get("features", []))]
        if not rows:
            raise ValueError(f"no features in {path}")
        return spark.createDataFrame(pd.DataFrame(rows))
    if isinstance(fc, dict) and fc.get("type") == "Feature":
        return spark.createDataFrame(pd.DataFrame([_feature_row(fc, 0)]))

    lines = spark.read.text(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for line in pdf["value"]:
                line = line.strip().rstrip(",")
                if not line or line in ("[", "]"):
                    continue
                feat = json.loads(line)
                out.append({"feature_id": str(feat.get("id", "")),
                            "geometry": geojson_to_wkt(feat["geometry"]),
                            "properties": json.dumps(
                                feat.get("properties") or {})})
            yield pd.DataFrame(out, columns=["feature_id", "geometry",
                                             "properties"])

    return lines.mapInPandas(
        parse, "feature_id string, geometry string, properties string")


# ---- ESRI Shapefile (.shp + .dbf), public binary spec ------------------

_SHP_POINT, _SHP_POLYLINE, _SHP_POLYGON, _SHP_MULTIPOINT = 1, 3, 5, 8


def _signed_area(ring: list[tuple[float, float]]) -> float:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _shp_record_wkt(shape_type: int, buf: bytes) -> str | None:
    if shape_type == 0:
        return None  # null shape
    if shape_type == _SHP_POINT:
        x, y = struct.unpack_from("<2d", buf, 0)
        return f"POINT({x} {y})"
    if shape_type == _SHP_MULTIPOINT:
        (n,) = struct.unpack_from("<i", buf, 32)
        pts = struct.unpack_from(f"<{2 * n}d", buf, 36)
        return "MULTIPOINT(" + ", ".join(
            f"{pts[2 * i]} {pts[2 * i + 1]}" for i in range(n)) + ")"
    if shape_type in (_SHP_POLYLINE, _SHP_POLYGON):
        n_parts, n_points = struct.unpack_from("<2i", buf, 32)
        parts = struct.unpack_from(f"<{n_parts}i", buf, 40)
        pts = struct.unpack_from(f"<{2 * n_points}d", buf, 40 + 4 * n_parts)
        rings = []
        bounds = list(parts) + [n_points]
        for p0, p1 in zip(bounds, bounds[1:]):
            rings.append([(pts[2 * i], pts[2 * i + 1])
                          for i in range(p0, p1)])
        if shape_type == _SHP_POLYLINE:
            if len(rings) == 1:
                return "LINESTRING" + _ring(rings[0])
            return "MULTILINESTRING(" + ", ".join(_ring(r) for r in rings) + ")"
        # polygon: ESRI outer rings are clockwise (negative signed
        # area), holes counter-clockwise; holes attach to the
        # preceding outer ring
        polys: list[list[list[tuple[float, float]]]] = []
        for ring in rings:
            if _signed_area(ring) <= 0 or not polys:
                polys.append([ring])
            else:
                polys[-1].append(ring)
        if len(polys) == 1:
            return "POLYGON(" + ", ".join(_ring(r) for r in polys[0]) + ")"
        return "MULTIPOLYGON(" + ", ".join(
            "(" + ", ".join(_ring(r) for r in poly) + ")" for poly in polys
        ) + ")"
    raise ValueError(f"unsupported shapefile shape type {shape_type}")


def _read_dbf(path: str) -> list[dict]:
    """dBase III attribute records (name/type/length field descriptors,
    fixed-width ASCII records)."""
    with open(path, "rb") as f:
        data = f.read()
    n_rec, = struct.unpack_from("<i", data, 4)
    hdr_size, rec_size = struct.unpack_from("<2h", data, 8)
    fields = []
    off = 32
    while data[off] != 0x0D:
        name = data[off:off + 11].split(b"\0")[0].decode("ascii")
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fields.append((name, ftype, flen))
        off += 32
    out = []
    for r in range(n_rec):
        base = hdr_size + r * rec_size
        if data[base:base + 1] == b"*":  # deleted
            continue
        rec, pos = {}, base + 1
        for name, ftype, flen in fields:
            raw = data[pos:pos + flen].decode("ascii", "replace").strip()
            pos += flen
            if ftype == "N" and raw:
                rec[name] = float(raw) if "." in raw else int(raw)
            elif ftype == "F" and raw:
                rec[name] = float(raw)
            elif ftype == "L":
                rec[name] = raw in ("Y", "y", "T", "t")
            else:
                rec[name] = raw or None
        out.append(rec)
    return out


def read_shapefile(path: str) -> list[dict]:
    """Driver-side parse of ``.shp`` (+ sibling ``.dbf`` attributes) ->
    list of {feature_id, geometry(WKT), <attrs>} dicts."""
    with open(path, "rb") as f:
        shp = f.read()
    code, = struct.unpack_from(">i", shp, 0)
    if code != 9994:
        raise ValueError(f"not a shapefile: {path}")
    attrs = []
    dbf_path = os.path.splitext(path)[0] + ".dbf"
    if os.path.exists(dbf_path):
        attrs = _read_dbf(dbf_path)
    out, off, idx = [], 100, 0
    while off < len(shp):
        _rec_no, length = struct.unpack_from(">2i", shp, off)
        content = shp[off + 8: off + 8 + 2 * length]
        off += 8 + 2 * length
        stype, = struct.unpack_from("<i", content, 0)
        wkt = _shp_record_wkt(stype, content[4:])
        if wkt is None:
            idx += 1
            continue
        row = {"feature_id": str(idx), "geometry": wkt}
        if idx < len(attrs):
            row.update(attrs[idx])
        out.append(row)
        idx += 1
    return out


def open_shapefile_features(spark: SparkSession, path: str) -> DataFrame:
    """Shapefile -> WKT-features DataFrame (driver-side parse; feature
    files are metadata-sized — the cube-scale raster path never flows
    through here)."""
    rows = read_shapefile(path)
    if not rows:
        raise ValueError(f"no features in {path}")
    return spark.createDataFrame(pd.DataFrame(rows))
