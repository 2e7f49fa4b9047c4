"""HTTP serving facade (server.py) — e2e over a real socket with a
real client; reference parity: xcube serve route grammar
(webapi/{tiles,timeseries,statistics}/routes.py, ows/coverages)."""

import json
import urllib.request

import pytest

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.new import new_cube
from xcube_spark.server import CubeServer

GRID = CubeGrid(width=36, height=18, time_periods=3, x_res=10.0,
                y_res=10.0)


@pytest.fixture(scope="module")
def served(spark):
    cube = new_cube(spark, GRID, {
        "sst": "CAST(t_i AS DOUBLE) + 0.1 * y + 0.01 * x",
        "chl": 0.5,
    })
    srv = CubeServer(spark)
    srv.add_dataset("demo", cube, GRID, title="Demo cube")
    port = srv.start()
    yield f"http://127.0.0.1:{port}"
    srv.stop()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=120) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def _get_json(url):
    status, ctype, body = _get(url)
    assert status == 200, body
    assert ctype == "application/json"
    return json.loads(body)


def test_datasets_listing_and_descriptor(served):
    out = _get_json(f"{served}/datasets")
    assert out["datasets"][0]["id"] == "demo"
    desc = _get_json(f"{served}/datasets/demo")
    assert desc["dimensions"] == {"time": 3, "y": 18, "x": 36}
    assert {v["name"] for v in desc["variables"]} == {"sst", "chl"}
    coords = _get_json(f"{served}/datasets/demo/coords/time")
    assert coords["size"] == 3
    assert coords["coordinates"][0].startswith("2010-01-01T12:00")


def test_tile_png(served):
    status, ctype, body = _get(
        f"{served}/tiles/demo/sst/0/0/0?vmin=-10&vmax=12&cmap=default")
    assert status == 200
    assert ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    from xcube_spark.operators.tiles import decode_rgba_png

    w, h, rgba = decode_rgba_png(body)
    assert (w, h) == (256, 256)
    # west hemisphere tile of a global cube: data everywhere -> opaque
    assert rgba[3] == 255


def test_tile_auto_stretch_and_time(served):
    status, ctype, body = _get(
        f"{served}/tiles/demo/sst/0/0/1?time=2010-01-02T12:00:00")
    assert status == 200 and body[:4] == b"\x89PNG"
    status, _, body = _get(f"{served}/tiles/demo/sst/0/0/7")
    assert status == 404


def test_timeseries_json(served):
    out = _get_json(
        f"{served}/timeseries/demo/sst?aggMethods=mean,max"
        "&bbox=-180,-90,0,90")
    res = out["result"]
    assert len(res) == 3
    assert res[0]["time"].startswith("2010-01-01T12:00")
    # mean over x in [-180, 0): t + 0.1*0 + 0.01*mean(x) = t - 0.9
    assert res[0]["mean"] == pytest.approx(-0.9)
    assert res[1]["mean"] == pytest.approx(0.1)
    # max at y=85, x=-5: t + 8.5 - 0.05
    assert res[2]["max"] == pytest.approx(2 + 8.45)
    out = _get_json(
        f"{served}/timeseries/demo/sst?startDate=2010-01-02")
    assert len(out["result"]) == 2


def test_statistics_point_and_global(served):
    # cell containing (5, 5): x_i=18, y_i=9 -> x=5, y=5
    out = _get_json(
        f"{served}/statistics/demo/sst?lon=5&lat=5"
        "&time=2010-01-01T12:00:00")["result"]
    assert out["count"] == 1
    assert out["mean"] == pytest.approx(0.1 * 5 + 0.01 * 5)
    full = _get_json(
        f"{served}/statistics/demo/sst?histogram=true")["result"]
    assert full["count"] == GRID.size
    assert sum(b["count"] for b in full["histogram"]) == GRID.size
    status, _, _ = _get(f"{served}/statistics/demo/sst?lon=999&lat=0")
    assert status == 404


def test_coverage_subset(served):
    out = _get_json(
        f"{served}/ogc/collections/demo/coverage"
        "?subset=y(-40:40),x(-60:60)&properties=sst")
    assert out["domain"]["crs"] == "EPSG:4326"
    assert "sst" in out["columns"] and "chl" not in out["columns"]
    # 12 x cells * 8 y cells * 3 t
    assert out["shape"] == 12 * 8 * 3
    status, _, body = _get(
        f"{served}/ogc/collections/demo/coverage?limit=10")
    assert status == 413


def test_volume_nrrd(served):
    """NRRD brick: gzip payload decodes to the exact voxel grid."""
    import gzip
    import struct as st

    status, ctype, body = _get(
        f"{served}/volumes/demo/sst?bbox=-30,-30,30,30")
    assert status == 200 and ctype == "application/octet-stream"
    head, _, payload = body.partition(b"\n\n")
    assert b"NRRD0004" in head
    vals = st.unpack("<{}f".format(3 * 6 * 6), gzip.decompress(payload))
    assert len(vals) == 108
    # t=0 top render row (y=25), x=-25: 0 + 2.5 - 0.25
    assert abs(vals[0] - 2.25) < 1e-6
    status, _, _ = _get(f"{served}/volumes/demo/sst?bbox=0,0")
    assert status == 400


def test_unknown_routes(served):
    status, _, body = _get(f"{served}/nope")
    assert status == 404
    status, _, _ = _get(f"{served}/datasets/missing")
    assert status == 404
