"""CLI smoke tests: in-process main() calls over a temp cube (the
xcube test/cli pattern without subprocess overhead)."""

from __future__ import annotations

import json

import pytest

from xcube_spark.cli import main
from xcube_spark.cube.grid import CubeGrid
from xcube_spark.cube.new import new_cube

GRID = CubeGrid(width=8, height=4, time_periods=3, x_res=45.0, y_res=45.0)
GRID_ARGS = ["--width", "8", "--height", "4", "--time-periods", "3",
             "--x-res", "45.0", "--y-res", "45.0"]


@pytest.fixture(scope="module")
def cube_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "cube.parquet")
    new_cube(spark, GRID, {"v": 1.5}).write.parquet(path)
    return path


def test_cli_dump(cube_path, capsys):
    assert main(["dump", cube_path]) == 0
    out = capsys.readouterr().out
    assert "rows: 96" in out and "var v:" in out


def test_cli_verify_ok(cube_path, capsys):
    assert main(["verify", cube_path, *GRID_ARGS]) == 0
    assert "OK" in capsys.readouterr().out


def test_cli_verify_bad_grid(cube_path, capsys):
    # wrong grid declaration -> structural failure, exit 1
    assert main(["verify", cube_path, "--width", "4", "--height", "4",
                 "--time-periods", "3"]) == 1


def test_cli_subsample_and_resample(spark, cube_path, tmp_path):
    out = str(tmp_path / "sub.parquet")
    assert main(["subsample", cube_path, "-k", "2", "-o", out]) == 0
    assert spark.read.parquet(out).count() == 3 * 2 * 4

    out2 = str(tmp_path / "res.parquet")
    assert main(["resample", cube_path, "-F", "all", "-o", out2]) == 0
    assert spark.read.parquet(out2).count() == 8 * 4


def test_cli_genpts(spark, cube_path, tmp_path):
    out = str(tmp_path / "pts.parquet")
    assert main(["genpts", cube_path, "-n", "50", "-o", out, *GRID_ARGS]) == 0
    assert spark.read.parquet(out).count() == 50


def test_cli_gen(spark, cube_path, tmp_path, capsys):
    req = {
        "input_path": cube_path,
        "cube_config": {
            "variable_names": ["v"],
            "spatial_factor": 2,
            "output_path": str(tmp_path / "gen.parquet"),
        },
    }
    req_path = str(tmp_path / "req.json")
    with open(req_path, "w") as f:
        json.dump(req, f)
    assert main(["gen", req_path, *GRID_ARGS]) == 0
    assert spark.read.parquet(str(tmp_path / "gen.parquet")).count() == 3 * 2 * 4


def test_cli_chunk_layout(spark, cube_path, tmp_path):
    import glob

    out = str(tmp_path / "laid")
    assert main(["chunk", cube_path, "-o", out,
                 "--files-per-partition", "2", *GRID_ARGS]) == 0
    assert glob.glob(f"{out}/t_part=*")
    assert spark.read.parquet(out).count() == 96


def test_cli_vars2dim(spark, cube_path, tmp_path):
    out = str(tmp_path / "v2d.parquet")
    assert main(["vars2dim", cube_path, "-o", out]) == 0
    df = spark.read.parquet(out)
    assert "var" in df.columns and "value" in df.columns
    assert df.count() == GRID.size  # one variable -> same row count


def test_cli_prune(spark, cube_path, tmp_path):
    out = str(tmp_path / "pruned.parquet")
    assert main(["prune", cube_path, "-o", out, *GRID_ARGS]) == 0
    assert spark.read.parquet(out).count() == GRID.size  # nothing empty


def test_cli_patch(spark, cube_path, tmp_path):
    from xcube_spark.cube.metadata import read_meta

    patch_file = str(tmp_path / "patch.json")
    with open(patch_file, "w") as f:
        json.dump({"title": "patched", "institution": "test"}, f)
    out = str(tmp_path / "patched.parquet")
    assert main(["patch", cube_path, patch_file, "-o", out]) == 0
    meta = read_meta(out)
    assert meta["title"] == "patched"
    assert spark.read.parquet(out).count() == GRID.size


def test_cli_rectify(spark, cube_path, tmp_path):
    import pyspark.sql.functions as F

    swath_path = str(tmp_path / "swath.parquet")
    swath = new_cube(spark, GRID, {"v": 2.0}).withColumns(
        {"lon": F.col("x"), "lat": F.col("y")})
    swath.write.parquet(swath_path)
    out = str(tmp_path / "rect.parquet")
    assert main(["rectify", swath_path, "-o", out, *GRID_ARGS]) == 0
    df = spark.read.parquet(out)
    assert df.count() == GRID.size
    assert df.where(F.col("v") == 2.0).count() == GRID.size


def test_cli_curate(spark, sf_dir, tmp_path, capsys):
    from xcube_spark.cli import main

    out = str(tmp_path / "curated.parquet")
    rc = main(["curate", f"{sf_dir}/documents.parquet", "-o", out,
               "--min-quality", "0.5", "--substring-window", "10"])
    assert rc == 0
    res = spark.read.parquet(out)
    assert {"doc_id", "text", "split"} <= set(res.columns)
    assert 0 < res.count() <= spark.read.parquet(
        f"{sf_dir}/documents.parquet").count()
    assert set(r.split for r in res.select("split").distinct().collect()) \
        <= {"train", "val", "test"}


def test_cli_virtualize(spark, tmp_path):
    import json

    import numpy as np

    from xcube_spark.cli import main
    from xcube_spark.sources.hdf5 import write_hdf5

    for g in range(2):
        write_hdf5(str(tmp_path / f"g{g}.nc"), {
            "time": {"data": np.array([g * 86400.0]), "dims": ["time"],
                     "attrs": {"units": "seconds since 2021-01-01"}},
            "lat": {"data": np.linspace(-10, 10, 4), "dims": ["lat"]},
            "lon": {"data": np.linspace(-10, 10, 5), "dims": ["lon"]},
            "A": {"data": np.ones((1, 4, 5)) * g,
                  "dims": ["time", "lat", "lon"], "chunks": (1, 4, 5)},
        })
    refs = str(tmp_path / "v.json")
    assert main(["virtualize", str(tmp_path / "g0.nc"),
                 str(tmp_path / "g1.nc"), "-o", refs]) == 0
    doc = json.load(open(refs))
    assert "A/.zarray" in doc["refs"]
    assert json.loads(doc["refs"]["A/.zarray"])["shape"] == [2, 4, 5]


def test_cli_grid_res(capsys):
    """xcube grid res parity (ref cli/grid.py): exact rational
    resolutions near a target, with the power-of-two ladder columns."""
    assert main(["grid", "res", "0.05", "--delta", "1%"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t")[:4] == ["R_D (%)", "R_NOM", "R_DEN",
                                     "R (deg)"]
    # 180/3600 = 0.05 exactly: first row is the exact hit
    first = out[1].split("\t")
    assert first[0] == "0.0" and first[5] == "3600"
    # 3600 = 225 * 2^4
    assert first[6] == "225" and first[7] == "4"


def test_cli_grid_levels(capsys):
    assert main(["grid", "levels", "3600"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = [r.split("\t") for r in out[1:]]
    assert rows[0][:2] == ["0", "225"]
    assert rows[-1][:2] == ["4", "3600"]
    assert float(rows[-1][3]) == 0.05


def test_cli_grid_abox(capsys):
    assert main(["grid", "abox", "--res", "0.5", "--",
                 "-10.3,2.2,12.7,8.8"]) == 0
    out = capsys.readouterr().out
    assert "Adjusted box: -10.5,2.0,13.0,9.0" in out
    assert "47 x 14 cells" in out


def test_gridcalc_functions():
    from fractions import Fraction

    from xcube_spark.functions.gridcalc import (degrees_to_meters,
                                                factor_out_two,
                                                find_close_resolutions,
                                                meters_to_degrees)

    assert factor_out_two(3600) == (225, 4)
    assert factor_out_two(1) == (1, 0)
    assert abs(meters_to_degrees(degrees_to_meters(0.25)) - 0.25) < 1e-12
    res = find_close_resolutions(0.05, 0.001, int_inv_res=True)
    assert all(g.res.numerator == 1 for g in res)
    assert res[0].res == Fraction(1, 20)
    # every hit factors into a legal pyramid
    for g in res:
        assert g.height == g.height_0 * 2 ** g.level
        assert g.res * g.height == 180


def test_cli_compute(spark, cube_path, tmp_path, capsys):
    """sparkcube compute SCRIPT CUBE (reference cli/compute.py): a user
    script's compute() runs per chunk and the result lands in a new
    variable."""
    script = tmp_path / "user_compute.py"
    script.write_text(
        "def compute(v, coords, factor=1.0):\n"
        "    return v * factor + coords['t_i']\n"
    )
    out_path = str(tmp_path / "computed.parquet")
    assert main([
        "compute", str(script), cube_path,
        "--variables", "v", "-p", '{"factor": 2.0}',
        "-N", "w", "-o", out_path, *GRID_ARGS,
    ]) == 0
    df = spark.read.parquet(out_path)
    assert "w" in df.columns
    rows = {(r.t_i, r.y_i, r.x_i): r.w for r in df.collect()}
    assert rows[(0, 0, 0)] == 3.0    # 1.5*2 + 0
    assert rows[(2, 1, 3)] == 5.0    # 1.5*2 + 2
    # no compute() in script -> exit 1
    bad = tmp_path / "bad.py"
    bad.write_text("x = 1\n")
    assert main(["compute", str(bad), cube_path, *GRID_ARGS]) == 1


def test_cli_benchmark(spark, cube_path, tmp_path, capsys):
    """sparkcube benchmark (reference cli/benchmark.py): parameter-grid
    timing of a templated command; --in-process shares the JVM."""
    cfg = tmp_path / "bench.yml"
    cfg.write_text(
        "command: sparkcube dump ${input}\n"
        "params:\n"
        "  - input\n"
        f"input:\n  - {cube_path}\n  - {cube_path}\n"
    )
    assert main(["benchmark", str(cfg), "-R", "2", "--in-process"]) == 0
    out = capsys.readouterr().out
    lines = out.splitlines()
    hi = next(i for i, ln in enumerate(lines) if ln.startswith("id;"))
    header = lines[hi].split(";")
    assert header[:2] == ["id", "input"]
    assert "time-median" in header
    rows = [ln.split(";") for ln in lines[hi + 1:]
            if ln and ln[0].isdigit()]
    assert len(rows) == 2
    assert float(rows[0][header.index("time-median")]) > 0


def test_cli_versions(capsys, tmp_path):
    """sparkcube versions (reference cli/versions.py): package
    inventory, yaml-ish default, json by flag or extension."""
    assert main(["versions"]) == 0
    out = capsys.readouterr().out
    assert "pyspark:" in out and "xcube_spark:" in out
    out_path = tmp_path / "v.json"
    assert main(["versions", "-o", str(out_path)]) == 0
    v = json.loads(out_path.read_text())
    assert v["pyspark"] and v["python"]


def test_cli_io(spark, cube_path, capsys, tmp_path):
    """sparkcube io list/info/data (reference cli/io.py store tools)."""
    assert main(["io", "list"]) == 0
    out = capsys.readouterr().out
    assert "file" in out and "memory" in out and "parquet" in out
    import os
    root = os.path.dirname(cube_path)
    assert main(["io", "info", "file", f"root={root}"]) == 0
    out = capsys.readouterr().out
    assert "cube.parquet" in out
    assert main(["io", "data", "file", "cube.parquet",
                 f"root={root}"]) == 0
    desc = json.loads(capsys.readouterr().out)
    assert desc["data_id"] == "cube.parquet"
    assert desc["dims"]


def test_cli_gen2_local(spark, cube_path, tmp_path, capsys):
    """gen2 without --service: run the request locally, write the
    cube, emit a result JSON (ref cli/gen2.py local path)."""
    req = {
        "input_path": cube_path,
        "cube_config": {
            "variable_names": ["v"],
            "spatial_factor": 2,
            "output_path": str(tmp_path / "gen2.parquet"),
        },
    }
    req_path = str(tmp_path / "req2.json")
    with open(req_path, "w") as f:
        json.dump(req, f)
    result_path = str(tmp_path / "result.json")
    assert main(["gen2", req_path, "-o", result_path, *GRID_ARGS]) == 0
    assert spark.read.parquet(
        str(tmp_path / "gen2.parquet")).count() == 3 * 2 * 4
    with open(result_path) as f:
        doc = json.load(f)
    assert doc["status"]["succeeded"] is True
    assert doc["result"]["output_path"].endswith("gen2.parquet")


def test_cli_gen2_info(spark, cube_path, tmp_path, capsys):
    """--info describes the would-be cube without writing it."""
    req = {
        "input_path": cube_path,
        "cube_config": {
            "variable_names": ["v"],
            "spatial_factor": 2,
            "output_path": str(tmp_path / "never_written.parquet"),
        },
    }
    req_path = str(tmp_path / "req3.json")
    with open(req_path, "w") as f:
        json.dump(req, f)
    assert main(["gen2", req_path, "--info", *GRID_ARGS]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["result"]["rows"] == 3 * 2 * 4
    assert "v" in doc["result"]["schema"]
    import os
    assert not os.path.exists(str(tmp_path / "never_written.parquet"))


def test_cli_gen2_service_submit(spark, tmp_path, capsys, monkeypatch):
    """--service submits to a live /cubegens service and polls to
    completion; ${ENV_VAR} interpolation applies to the config."""
    from xcube_spark.server import CubeServer

    grid = CubeGrid(width=16, height=8, time_periods=4, x_res=22.5,
                    y_res=22.5)
    cube = new_cube(spark, grid, {"sst": "CAST(t_i AS DOUBLE) + x_i"})
    srv = CubeServer(spark)
    srv.add_dataset("src", cube, grid, title="source")
    port = srv.start()
    try:
        monkeypatch.setenv("TEST_GEN2_URL", f"http://127.0.0.1:{port}")
        svc_path = str(tmp_path / "svc.json")
        with open(svc_path, "w") as f:
            json.dump({"endpoint_url": "${TEST_GEN2_URL}"}, f)
        req = {
            "input_config": {"store_id": "served", "data_id": "src"},
            "cube_config": {"variable_names": ["sst"],
                            "spatial_factor": 2},
            "output_config": {"data_id": "out2", "title": "generated"},
        }
        req_path = str(tmp_path / "sreq.json")
        with open(req_path, "w") as f:
            json.dump(req, f)
        assert main(["gen2", req_path, "--service", svc_path]) == 0
        doc = json.loads(capsys.readouterr().out)
        assert doc["status"]["succeeded"] is True
        assert doc["result"]["datasetId"] == "out2"
        # failure path propagates a nonzero exit
        bad_req = str(tmp_path / "bad.json")
        with open(bad_req, "w") as f:
            json.dump({"input_config":
                       {"store_id": "served", "data_id": "nope"}}, f)
        assert main(["gen2", bad_req, "--service", svc_path]) == 1
        capsys.readouterr()
    finally:
        srv.stop()
