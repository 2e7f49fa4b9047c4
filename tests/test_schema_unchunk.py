"""CubeSchema / ancillary vars (core/schema.py, ancvar.py) and
unchunk_dataset (core/unchunk.py) parity."""

import json
import os

import pytest

from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.new import new_cube
from xcube_spark.cube.schema import (CubeSchema, find_ancillary_var_names,
                                     get_cube_schema)
from xcube_spark.sources.zarrio import (open_zarr_cube, unchunk_dataset,
                                        write_zarr_cube)

GRID = CubeGrid(width=8, height=4, time_periods=2, x_res=45.0, y_res=45.0,
                chunks=(1, 2, 4))


def test_cube_schema(spark):
    cube = new_cube(spark, GRID, {"a": 1.0, "b": 2.0})
    sch = get_cube_schema(cube, GRID)
    assert sch.shape == (2, 4, 8)
    assert sch.dims == ("time", "y", "x")
    assert sch.chunks == (1, 2, 4)
    assert sch.num_chunks == (2, 2, 2)
    assert sch.variable_names == ("a", "b")
    assert sch.to_dict()["crs"] == "EPSG:4326"


def test_cube_schema_rejects_non_cube(spark):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="missing index"):
        get_cube_schema(df, GRID)
    coords_only = new_cube(spark, GRID, {}).select(
        "t_i", "y_i", "x_i", "time", "y", "x")
    with pytest.raises(ValueError, match="no data variables"):
        get_cube_schema(coords_only, GRID)


def test_ancillary_by_attrs(spark):
    cube = new_cube(spark, GRID, {"chl": 1.0, "chl_unc": 0.1, "obs": 3.0})
    attrs = {
        "chl": {"ancillary_variables": "chl_unc obs",
                "standard_name": "chlorophyll"},
        "chl_unc": {"standard_name": "chlorophyll standard_error"},
        "obs": {"standard_name": "chlorophyll number_of_observations"},
    }
    out = find_ancillary_var_names(cube, "chl", attrs)
    assert out == {"standard_error": {"chl_unc"},
                   "number_of_observations": {"obs"}}


def test_ancillary_by_standard_name_scan(spark):
    cube = new_cube(spark, GRID, {"sst": 1.0, "err": 0.1})
    attrs = {"sst": {"standard_name": "sea_surface_temperature"},
             "err": {"standard_name":
                     "sea_surface_temperature standard_error"}}
    out = find_ancillary_var_names(cube, "sst", attrs)
    assert out == {"standard_error": {"err"}}


def test_ancillary_by_suffix(spark):
    cube = new_cube(spark, GRID, {"v": 1.0, "v_std": 0.1, "v_count": 5.0})
    out = find_ancillary_var_names(cube, "v")
    assert out == {"standard_error": {"v_std"},
                   "number_of_observations": {"v_count"}}
    assert find_ancillary_var_names(cube, "nope") == {}


@pytest.mark.parametrize("zarr_format", [2, 3])
def test_unchunk_roundtrip(spark, tmp_path, zarr_format):
    cube = new_cube(spark, GRID, {"temp": "CAST(t_i + y_i + x_i AS DOUBLE)"})
    path = str(tmp_path / f"c{zarr_format}.zarr")
    write_zarr_cube(cube, path, GRID, zarr_format=zarr_format)
    def snap():
        rows = open_zarr_cube(spark, path).select(
            "t_i", "y_i", "x_i", "temp").collect()
        return sorted((r.t_i, r.y_i, r.x_i, r.temp) for r in rows)

    before = snap()

    # the writer already emits single-chunk coords, so rewrite 'x' as
    # two chunks of 4 first to create the chunked-coords condition the
    # reference fixes (unchunk.py docstring)
    from dataclasses import replace as _replace

    from xcube_spark.sources.zarrio import (_read_bytes, _write_array_meta,
                                            _write_bytes, decode_chunk,
                                            encode_chunk, read_store)

    xm = read_store(path)["x"]
    xvals = decode_chunk(
        _read_bytes(os.path.join(path, "x", xm.chunk_key(0))), xm)
    split = _replace(xm, chunks=(4,))
    _write_array_meta(path, split)
    if os.path.exists(os.path.join(path, "x", xm.chunk_key(0))):
        os.remove(os.path.join(path, "x", xm.chunk_key(0)))
    _write_bytes(os.path.join(path, "x", split.chunk_key(0)),
                 encode_chunk(xvals[:4], split))
    _write_bytes(os.path.join(path, "x", split.chunk_key(1)),
                 encode_chunk(xvals[4:], split))

    done = unchunk_dataset(path, coords_only=True)
    assert done == ["x"]
    done2 = unchunk_dataset(path, var_names=["temp"])
    assert done2 == ["temp"]
    if zarr_format == 2:
        meta = json.load(open(os.path.join(path, "temp", ".zarray")))
        assert meta["chunks"] == meta["shape"] == [2, 4, 8]
        assert os.path.exists(os.path.join(path, "temp", "0.0.0"))
        assert not os.path.exists(os.path.join(path, "temp", "0.0.1"))
    after = snap()
    assert after == before
    # idempotent: already single-chunk arrays are skipped
    assert unchunk_dataset(path) == []


def test_unchunk_guards(spark, tmp_path):
    cube = new_cube(spark, GRID, {"v": 1.0})
    path = str(tmp_path / "g.zarr")
    write_zarr_cube(cube, path, GRID)
    with pytest.raises(ValueError, match="not found"):
        unchunk_dataset(path, var_names=["nope"])
    import xcube_spark.sources.zarrio as z

    old = z.MAX_UNCHUNK_ELEMENTS
    z.MAX_UNCHUNK_ELEMENTS = 10
    try:
        with pytest.raises(ValueError, match="driver-side"):
            unchunk_dataset(path, var_names=["v"])
    finally:
        z.MAX_UNCHUNK_ELEMENTS = old


def test_cli_optimize_unchunk_coords(spark, tmp_path, capsys):
    from xcube_spark.cli import main as cli_main

    cube = new_cube(spark, GRID, {"v": 1.0})
    path = str(tmp_path / "c.zarr")
    write_zarr_cube(cube, path, GRID)
    rc = cli_main(["optimize", path, "-C"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "unchunked:" in out
