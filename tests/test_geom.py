"""Geometry tests — mirrors test/core/test_geom.py shapes: the
canonical POLYGON((20 10, 20 20, 10 20, 10 10, 20 10)) and POINT(20 10)
fixtures of test/core/test_timeseries.py:15-21."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.new import new_cube
from xcube_spark.functions.wkt import (
    geometries_intersect,
    geometry_bbox,
    is_rectangle,
    normalize_geometry,
    parse_wkt,
    points_in_polygon,
)
from xcube_spark.operators.geom import (
    clip_dataset_by_geometry,
    find_places,
    geometry_mask,
    get_dataset_geometry,
    mask_dataset_by_geometry,
    rasterize_features,
)

GRID = CubeGrid(width=36, height=18, time_periods=2, x_res=10.0, y_res=10.0)
TRIANGLE = "POLYGON((0 0, 40 0, 0 40, 0 0))"
BOX = "POLYGON((20 10, 20 20, 10 20, 10 10, 20 10))"


@pytest.fixture(scope="module")
def cube(spark):
    df = new_cube(spark, GRID, variables={"A": 1.0, "B": 2.0}).cache()
    df.count()
    yield df
    df.unpersist()


def test_parse_wkt_roundtrip():
    g = parse_wkt(BOX)
    assert g["type"] == "Polygon"
    assert len(g["coordinates"][0]) == 5
    mp = parse_wkt(
        "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5), (5.2 5.2, 5.4 5.2, 5.4 5.4, 5.2 5.2)))"
    )
    assert mp["type"] == "MultiPolygon"
    assert len(mp["coordinates"]) == 2
    assert len(mp["coordinates"][1]) == 2  # hole preserved
    pt = parse_wkt("POINT(20 10)")
    assert pt["coordinates"] == (20.0, 10.0)


def test_normalize_bbox_and_antimeridian():
    g = normalize_geometry((10.0, 10.0, 20.0, 20.0))
    assert is_rectangle(g) == (10.0, 10.0, 20.0, 20.0)
    am = normalize_geometry((170.0, -10.0, -170.0, 10.0))
    assert am["type"] == "MultiPolygon"
    assert len(am["coordinates"]) == 2
    assert geometry_bbox(am) == (-180.0, -10.0, 180.0, 10.0)


def test_points_in_polygon_kernel():
    g = parse_wkt(TRIANGLE)
    xs = np.array([5.0, 30.0, 35.0, -1.0, 10.0])
    ys = np.array([5.0, 5.0, 30.0, 5.0, 10.0])
    got = points_in_polygon(xs, ys, g)
    assert got.tolist() == [True, True, False, False, True]
    # hole is excluded
    holed = parse_wkt(
        "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    assert points_in_polygon(np.array([5.0]), np.array([5.0]), holed).tolist() == [False]
    assert points_in_polygon(np.array([2.0]), np.array([2.0]), holed).tolist() == [True]


def test_geometry_mask_rect_is_pure_plan(cube):
    # rectangle fast path must not contain a python UDF in the plan
    masked = cube.where(geometry_mask(BOX))
    plan = masked._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert masked.count() == 1 * 1 * 2  # cell centers (15, 15) only


def test_mask_by_triangle(cube):
    out = mask_dataset_by_geometry(cube, TRIANGLE, save_geometry_mask="in_geom")
    rows = out.where("t_i = 0").collect()
    # clip bbox is [0,0,40,40] -> x centers 5..35, y centers 5..35 = 4x4
    assert len(rows) == 16
    for r in rows:
        inside = r["x"] + r["y"] < 40  # strict interior of the hypotenuse
        assert r["in_geom"] == inside
        assert (r["A"] is not None) == inside
        assert (r["B"] is not None) == inside


def test_clip(cube):
    out = clip_dataset_by_geometry(cube, TRIANGLE)
    assert out.count() == 16 * 2


def test_rasterize_features(cube):
    feats = [
        {"geometry": (0.0, 0.0, 180.0, 90.0), "class_id": 1, "w": 0.5},
        {"geometry": BOX, "class_id": 2, "w": 1.5},  # later wins inside box
    ]
    out = rasterize_features(cube, feats, ["class_id", "w"])
    r1 = out.where("t_i=0 AND x=15.0 AND y=15.0").collect()[0]
    assert r1["class_id"] == 2 and r1["w"] == 1.5
    r2 = out.where("t_i=0 AND x=25.0 AND y=15.0").collect()[0]
    assert r2["class_id"] == 1 and r2["w"] == 0.5
    r3 = out.where("t_i=0 AND x=-25.0 AND y=15.0").collect()[0]
    assert r3["class_id"] is None


def test_get_dataset_geometry(cube):
    g = get_dataset_geometry(cube)
    assert geometry_bbox(g) == (-175.0, -85.0, 175.0, 85.0)


def test_geometries_intersect():
    a = normalize_geometry((0, 0, 10, 10))
    b = normalize_geometry((5, 5, 15, 15))
    c = normalize_geometry((20, 20, 30, 30))
    assert geometries_intersect(a, b)
    assert not geometries_intersect(a, c)
    assert geometries_intersect(normalize_geometry("POINT(5 5)"), a)
    assert not geometries_intersect(normalize_geometry("POINT(50 5)"), a)


def test_find_places(spark):
    feats = spark.createDataFrame(
        [
            (0, "POINT(5 5)", "harbor", 3.0),
            (1, "POINT(50 50)", "peak", 8.0),
            (2, "POLYGON((0 0, 8 0, 8 8, 0 8, 0 0))", "park", 5.0),
        ],
        "feature_id long, geometry string, kind string, score double",
    )
    got = find_places(feats, query_geometry=(0, 0, 10, 10))
    assert {r["feature_id"] for r in got.collect()} == {0, 2}
    got2 = find_places(feats, query_geometry=(0, 0, 100, 100), query_expr="score > 4")
    assert {r["feature_id"] for r in got2.collect()} == {1, 2}


def test_parse_wkt_bare_decimal_coords():
    """'.5' / '5.' are valid WKT numbers and must not be truncated."""
    g = parse_wkt("POLYGON((.5 5., 1.5 .25, 1e1 -.5, .5 5.))")
    assert g["coordinates"][0][:3] == [(0.5, 5.0), (1.5, 0.25), (10.0, -0.5)]
