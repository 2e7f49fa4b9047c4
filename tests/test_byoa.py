"""BYOA code packaging (xcube/core/byoa/config.py, fileset.py parity)."""

import os
import zipfile

import pytest

from xcube_spark.pipeline.byoa import CodeConfig, FileSet


USER_MODULE = '''\
from pyspark.sql import functions as F


def double_v(df, factor=2):
    return df.withColumn("v", F.col("v") * factor)
'''


@pytest.fixture()
def pkg_dir(tmp_path):
    d = tmp_path / "userpkg"
    d.mkdir()
    (d / "algo.py").write_text(USER_MODULE)
    (d / "README.md").write_text("docs")
    (d / "junk.pyc").write_bytes(b"\x00")
    return str(d)


def test_fileset_keys_include_exclude(pkg_dir):
    fs = FileSet(pkg_dir, includes=["*.py", "*.md"], excludes=["junk*"])
    assert fs.keys() == ["README.md", "algo.py"]


def test_fileset_zip_roundtrip(pkg_dir, tmp_path):
    fs = FileSet(pkg_dir, includes=["*.py"])
    z = fs.to_local_zip(str(tmp_path / "code.zip"))
    assert z.is_local_zip()
    with zipfile.ZipFile(z.path) as zf:
        assert zf.namelist() == ["algo.py"]
    back = z.to_local_dir()
    assert os.path.isfile(os.path.join(back.path, "algo.py"))


def test_from_code_inline(spark):
    cfg = CodeConfig.from_code(
        "def add_one(df):\n"
        "    from pyspark.sql import functions as F\n"
        "    return df.withColumn('v', F.col('v') + 1)\n"
    )
    assert cfg.callable_ref.endswith(":add_one")
    fn = cfg.get_callable()
    df = spark.createDataFrame([(1,)], "v int")
    assert fn(df).collect()[0].v == 2
    # same config resolves to the same module (idempotent)
    assert cfg.get_callable() is fn


def test_from_code_json_roundtrip(spark):
    cfg = CodeConfig.from_code(
        "def triple(df):\n"
        "    from pyspark.sql import functions as F\n"
        "    return df.withColumn('v', F.col('v') * 3)\n",
        module_name="byoa_rt_mod",
    )
    back = CodeConfig.from_dict(cfg.to_dict())
    df = spark.createDataFrame([(2,)], "v int")
    assert back.get_callable()(df).collect()[0].v == 6


def test_from_callable():
    cfg = CodeConfig.from_callable(len)
    assert cfg.get_callable() is len
    assert cfg.callable_ref == "builtins:len"


def test_from_file_set_install_runs_on_executors(spark, pkg_dir):
    cfg = CodeConfig.from_file_set(
        FileSet(pkg_dir, includes=["*.py"]),
        "algo:double_v",
        callable_params={"factor": 5},
    )
    fn = cfg.install(spark)
    df = spark.createDataFrame([(3,)], "v int")
    out = fn(df, **cfg.callable_params)
    assert out.collect()[0].v == 15
    # the zip was registered for executor shipping
    assert cfg._installed_path and zipfile.is_zipfile(cfg._installed_path)


def test_bad_configs():
    with pytest.raises(ValueError):
        CodeConfig(inline_code="x = 1")  # no callable_ref
    with pytest.raises(ValueError):
        CodeConfig.from_file_set("/tmp", "no_colon")
    with pytest.raises(ValueError):
        CodeConfig.from_code("x = 1")  # no def to detect


def test_generator_accepts_code_config(spark):
    from xcube_spark.cube.new import new_cube
    from xcube_spark.pipeline.generator import (
        CubeGeneratorRequest,
        generate_cube,
    )

    from xcube_spark.cube.grid import CubeGrid

    grid = CubeGrid(width=8, height=8, time_periods=2)
    cube = new_cube(spark, grid, variables={"temp": 10.0})
    req = CubeGeneratorRequest.from_dict({
        "cube_config": {"variable_names": ["temp"]},
        "code_config": {
            "callable_ref": "byoa_gen_mod:scale",
            "inline_code": (
                "def scale(df):\n"
                "    from pyspark.sql import functions as F\n"
                "    return df.withColumn('temp', F.col('temp') * 0.5)\n"
            ),
        },
    })
    out, _ = generate_cube(spark, cube, grid, req)
    assert out.agg({"temp": "max"}).collect()[0][0] == 5.0


def test_fileset_sub_path_zip_dir_parity(tmp_path):
    """sub_path must yield identical keys/contents whether the base is a
    directory or a zip of that directory (fileset.py sub_path parity)."""
    root = tmp_path / "proj"
    (root / "src" / "pkg").mkdir(parents=True)
    (root / "src" / "pkg" / "mod.py").write_text("X = 1\n")
    (root / "src" / "top.py").write_text("Y = 2\n")
    (root / "other.txt").write_text("n/a\n")
    zip_path = str(tmp_path / "proj.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for dirpath, _dn, files in os.walk(root):
            for f in files:
                full = os.path.join(dirpath, f)
                zf.write(full, os.path.relpath(full, root)
                         .replace(os.sep, "/"))

    fs_dir = FileSet(str(root), sub_path="src")
    fs_zip = FileSet(zip_path, sub_path="src")
    assert fs_dir.keys() == fs_zip.keys() == ["pkg/mod.py", "top.py"]

    # materializations agree too
    out_dir = fs_zip.to_local_dir(str(tmp_path / "out_dir"))
    assert sorted(FileSet(out_dir.path).keys()) == ["pkg/mod.py", "top.py"]
    assert (
        open(os.path.join(out_dir.path, "pkg", "mod.py")).read()
        == "X = 1\n"
    )
    out_zip = fs_zip.to_local_zip(str(tmp_path / "out.zip"))
    with zipfile.ZipFile(out_zip.path) as zf:
        assert sorted(zf.namelist()) == ["pkg/mod.py", "top.py"]
        assert zf.read("pkg/mod.py") == b"X = 1\n"
