"""Thin HTTP serving facade over the cube operators — the repo's
answer to ``xcube serve`` (reference ``xcube/server/server.py:36`` +
``xcube/webapi/**``), deliberately small: URL grammar and response
shapes follow the reference's route table, while every computation
dispatches to the already-oracle-checked operators
(``operators/{tiles,coverages,statistics,timeseries}.py``).

Routes (reference parity):

=====================================================  ==============
``GET /datasets``                                      datasets/routes.py:72
``GET /datasets/{ds}``                                 datasets/routes.py:121
``GET /datasets/{ds}/coords/{dim}``                    datasets/routes.py:141
``GET /tiles/{ds}/{var}/{z}/{y}/{x}``                  tiles/routes.py:86
``GET /timeseries/{ds}/{var}``                         timeseries/routes.py:23
``GET /statistics/{ds}/{var}``                         statistics/routes.py:46
``GET /ogc/collections/{ds}/coverage``                 ows/coverages/routes.py:27
=====================================================  ==============

Scale notes: the server holds DataFrames, not data — every request
plans a Spark job whose filters (tile bbox, point cell, time range)
push down to the scan, and only response-sized results (a 256x256
tile, a per-timestep series, a single stats row) reach the driver.
Stdlib ``ThreadingHTTPServer`` only — this container has no web
framework, and the point is the dispatch surface, not the HTTP stack.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlsplit

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid


@dataclass
class _Dataset:
    cube: DataFrame
    grid: CubeGrid
    title: str = ""


class ApiError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


def _iso(ts) -> str:
    if isinstance(ts, datetime):
        return ts.replace(tzinfo=None).isoformat() + "Z"
    return str(ts)


def _t_index(grid: CubeGrid, t: datetime) -> int:
    days = (t - grid.t_start).total_seconds() / 86400.0
    i = int(days // grid.t_freq_days)
    if not 0 <= i < grid.time_periods:
        raise ApiError(404, f"time {t.isoformat()} outside the dataset")
    return i


def _parse_time(s: str) -> datetime:
    s = s.rstrip("Z")
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ApiError(400, f"invalid timestamp {s!r}")


class CubeServer:
    """Route table + dispatch.  Register cubes with
    :meth:`add_dataset`, then :meth:`start` (tests use port 0)."""

    def __init__(self, spark):
        self.spark = spark
        self.datasets: dict[str, _Dataset] = {}
        self._httpd: ThreadingHTTPServer | None = None

    def add_dataset(self, ds_id: str, cube: DataFrame, grid: CubeGrid,
                    title: str = "") -> None:
        self.datasets[ds_id] = _Dataset(cube, grid, title or ds_id)

    # ---- dispatch -------------------------------------------------------

    def handle(self, path: str, params: dict[str, str]) \
            -> tuple[int, str, bytes]:
        """(path, query) -> (status, content_type, body)."""
        try:
            seg = [s for s in path.split("/") if s]
            if seg == ["datasets"]:
                return self._json(self._list_datasets())
            if len(seg) == 2 and seg[0] == "datasets":
                return self._json(self._describe(seg[1]))
            if len(seg) == 4 and seg[0] == "datasets" and seg[2] == "coords":
                return self._json(self._coords(seg[1], seg[3]))
            if len(seg) == 6 and seg[0] == "tiles":
                return (200, "image/png",
                        self._tile(seg[1], seg[2], int(seg[3]),
                                   int(seg[4]), int(seg[5]), params))
            if len(seg) == 3 and seg[0] == "timeseries":
                return self._json(self._timeseries(seg[1], seg[2], params))
            if len(seg) == 3 and seg[0] == "statistics":
                return self._json(self._statistics(seg[1], seg[2], params))
            if (len(seg) == 4 and seg[0] == "ogc"
                    and seg[1] == "collections" and seg[3] == "coverage"):
                return self._json(self._coverage(seg[2], params))
            if len(seg) == 3 and seg[0] == "volumes":
                return (200, "application/octet-stream",
                        self._volume(seg[1], seg[2], params))
            raise ApiError(404, f"unknown route {path!r}")
        except ApiError as e:
            return (e.status, "application/json",
                    json.dumps({"error": {"status": e.status,
                                          "message": str(e)}}).encode())

    @staticmethod
    def _json(obj) -> tuple[int, str, bytes]:
        return 200, "application/json", json.dumps(obj).encode()

    def _get(self, ds_id: str) -> _Dataset:
        if ds_id not in self.datasets:
            raise ApiError(404, f"dataset {ds_id!r} not found")
        return self.datasets[ds_id]

    # ---- handlers -------------------------------------------------------

    def _list_datasets(self) -> dict:
        return {"datasets": [
            {"id": k, "title": d.title,
             "bbox": [d.grid.x_start, d.grid.y_start,
                      d.grid.x_end, d.grid.y_end]}
            for k, d in sorted(self.datasets.items())]}

    def _describe(self, ds_id: str) -> dict:
        from xcube_spark.cube.grid import var_names

        d = self._get(ds_id)
        g = d.grid
        return {
            "id": ds_id, "title": d.title,
            "bbox": [g.x_start, g.y_start, g.x_end, g.y_end],
            "crs": g.crs,
            "dimensions": {"time": g.time_periods, "y": g.height,
                           "x": g.width},
            "spatialRes": g.x_res,
            "variables": [{"name": v} for v in var_names(d.cube)],
        }

    def _coords(self, ds_id: str, dim: str) -> dict:
        d = self._get(ds_id)
        col = {"time": "time", "lat": "y", "y": "y",
               "lon": "x", "x": "x"}.get(dim)
        if col is None:
            raise ApiError(404, f"unknown dimension {dim!r}")
        rows = (d.cube.select(col).distinct().orderBy(col).collect())
        vals = [(_iso(r[0]) if col == "time" else r[0]) for r in rows]
        return {"name": dim, "size": len(vals), "coordinates": vals}

    def _tile(self, ds_id: str, var: str, z: int, y: int, x: int,
              params: dict[str, str]) -> bytes:
        from xcube_spark.operators.tiles import (TilingScheme,
                                                 compute_rgba_tile,
                                                 compute_rgba_tile_auto,
                                                 render_tile_png)

        d = self._get(ds_id)
        scheme = TilingScheme.web_mercator() \
            if params.get("crs", "").upper() == "EPSG:3857" \
            else TilingScheme.geographic()
        nx, ny = scheme.num_tiles(z)
        if not (0 <= x < nx and 0 <= y < ny):
            raise ApiError(404, f"tile ({z}/{y}/{x}) outside the scheme")
        t_i = int(params.get("t_i", 0))
        if "time" in params:
            t_i = _t_index(d.grid, _parse_time(params["time"]))
        # dense nearest-gather render: every tile pixel looks up its
        # source cell (extract.py:321 index math as an equi-join), so
        # the PNG has no gaps at any zoom; the cube side is
        # bbox-filtered first (partition-prunable), the pixel side is
        # a bounded 256^2 range
        g = d.grid
        x1, y1, x2, y2 = scheme.tile_bbox(z, x, y)
        res = scheme.resolution(z)
        ts = scheme.tile_size
        src = d.cube.where(
            (F.col("x") >= x1) & (F.col("x") < x2)
            & (F.col("y") >= y1) & (F.col("y") < y2)
            & (F.col("t_i") == t_i)
        ).select("x_i", "y_i", var)
        px_grid = self.spark.range(ts * ts).select(
            (F.col("id") % ts).cast("int").alias("px"),
            (F.col("id") / ts).cast("int").alias("py"))
        pxx = F.lit(x1) + (F.col("px") + F.lit(0.5)) * F.lit(res)
        pyy = F.lit(y2) - (F.col("py") + F.lit(0.5)) * F.lit(res)
        px_grid = px_grid.select(
            "px", "py",
            g.x_index_expr(pxx).alias("x_i"),
            g.y_index_expr(pyy).alias("y_i"))
        cells = px_grid.join(src, ["x_i", "y_i"], "inner")
        # clamp-rendered like the reference
        if "vmin" in params or "vmax" in params:
            rgba = compute_rgba_tile(
                cells, var,
                float(params.get("vmin", 0.0)),
                float(params.get("vmax", 1.0)),
                cmap_name=params.get("cmap", "default"),
                cmap_norm=params.get("norm", "lin"))
        else:
            rgba = compute_rgba_tile_auto(cells, var)
        return render_tile_png(rgba, scheme.tile_size)

    def _timeseries(self, ds_id: str, var: str,
                    params: dict[str, str]) -> dict:
        from xcube_spark.operators.timeseries import get_time_series

        d = self._get(ds_id)
        aggs = [a.strip() for a in
                params.get("aggMethods", "mean").split(",") if a.strip()]
        bbox = None
        if "bbox" in params:
            bbox = [float(v) for v in params["bbox"].split(",")]
            if len(bbox) != 4:
                raise ApiError(400, "bbox needs x1,y1,x2,y2")
        cube = d.cube
        if "startDate" in params:
            cube = cube.where(
                F.col("time") >= F.lit(_parse_time(params["startDate"])))
        if "endDate" in params:
            cube = cube.where(
                F.col("time") <= F.lit(_parse_time(params["endDate"])))
        try:
            out = get_time_series(cube, [var], agg_methods=aggs, bbox=bbox)
        except ValueError as e:
            raise ApiError(400, str(e)) from e
        result = []
        for r in out.collect():
            item = {"time": _iso(r["time"])}
            for m in aggs:
                item[m] = r[f"{var}_{m}"]
            result.append(item)
        return {"result": result}

    def _statistics(self, ds_id: str, var: str,
                    params: dict[str, str]) -> dict:
        from xcube_spark.operators.statistics import (compute_histogram,
                                                      compute_statistics)

        d = self._get(ds_id)
        mask = None
        if "lon" in params or "lat" in params:
            if not ("lon" in params and "lat" in params):
                raise ApiError(400, "need both lon and lat")
            g = d.grid
            ix = int((float(params["lon"]) - g.x_start) // g.x_res)
            iy = int((float(params["lat"]) - g.y_start) // g.y_res)
            if not (0 <= ix < g.width and 0 <= iy < g.height):
                raise ApiError(404, "point outside the dataset")
            mask = (F.col("x_i") == ix) & (F.col("y_i") == iy)
        if "time" in params:
            t_mask = F.col("t_i") == _t_index(
                d.grid, _parse_time(params["time"]))
            mask = t_mask if mask is None else (mask & t_mask)
        row = compute_statistics(d.cube, var, mask=mask).collect()[0]
        out = {k: row[k] for k in
               ("count", "minimum", "maximum", "mean", "deviation")}
        if params.get("histogram") == "true":
            cube = d.cube.where(mask) if mask is not None else d.cube
            hist = compute_histogram(cube, var).orderBy("bucket").collect()
            out["histogram"] = [
                {"bucket": r["bucket"], "lo": r["bin_lo"],
                 "hi": r["bin_hi"], "count": r["frequency"]}
                for r in hist]
        return {"result": out}

    def _coverage(self, ds_id: str, params: dict[str, str]) -> dict:
        from xcube_spark.operators.coverages import execute_coverage_request

        d = self._get(ds_id)
        try:
            out, out_grid = execute_coverage_request(d.cube, d.grid, params)
        except ValueError as e:
            raise ApiError(400, str(e)) from e
        limit = int(params.get("limit", 100_000))
        rows = out.limit(limit + 1).collect()
        if len(rows) > limit:
            raise ApiError(
                413, f"coverage exceeds {limit} cells; subset or "
                     "raise ?limit=")
        cols = out.columns
        return {
            "domain": {"width": out_grid.width, "height": out_grid.height,
                       "crs": out_grid.crs},
            "shape": len(rows),
            "columns": cols,
            "rangeset": [[(_iso(v) if isinstance(v, datetime) else v)
                          for v in r] for r in rows],
        }

    def _volume(self, ds_id: str, var: str,
                params: dict[str, str]) -> bytes:
        from xcube_spark.operators.volumes import (extract_volume,
                                                   volume_nrrd_bytes,
                                                   volume_shape)

        d = self._get(ds_id)
        bbox = None
        if "bbox" in params:
            bbox = [float(v) for v in params["bbox"].split(",")]
            if len(bbox) != 4:
                raise ApiError(400, "bbox needs x1,y1,x2,y2")
        time_range = None
        if "startDate" in params or "endDate" in params:
            if not ("startDate" in params and "endDate" in params):
                raise ApiError(400, "need both startDate and endDate")
            time_range = (_parse_time(params["startDate"]),
                          _parse_time(params["endDate"]))
        try:
            voxels = extract_volume(d.cube, d.grid, var, bbox=bbox,
                                    time_range=time_range)
            shape = volume_shape(d.grid, bbox=bbox, time_range=time_range)
            return volume_nrrd_bytes(
                voxels, shape, encoding=params.get("encoding", "gz"))
        except ValueError as e:
            raise ApiError(400, str(e)) from e

    # ---- HTTP plumbing --------------------------------------------------

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start serving on a background thread; returns the port."""
        server = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API)
                u = urlsplit(self.path)
                params = dict(parse_qsl(u.query))
                status, ctype, body = server.handle(u.path, params)
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence test output
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
