"""End-to-end tour of the engine — the reference's README workflow
(generate a cube, maintain it, query it, serve it) re-expressed
Spark-first.  Runs standalone:

    python examples/end_to_end.py

Every step prints what it did; total runtime ~1 min on local[32].
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.cube.new import new_cube
    from xcube_spark.session import get_session

    spark = get_session(app_name="xcube-spark-example")
    tmp = tempfile.mkdtemp(prefix="xcube-example-")

    # 1. Generate a cube (xcube gen2): declarative request over a store
    from xcube_spark.pipeline.generator import run_cube_generator
    from xcube_spark.sources.store import DataStorePool

    grid = CubeGrid(width=72, height=36, time_periods=6,
                    x_res=5.0, y_res=5.0)
    pool = DataStorePool(spark, {
        "local": {"store_id": "file", "store_params": {"root": tmp}},
    })
    src = pool.get_store("local")
    src.write_data(
        new_cube(spark, grid, {
            "sst": "CAST(t_i AS DOUBLE) + 0.1 * y + 0.01 * x",
        }),
        "raw.parquet",
    )
    cube, out_grid = run_cube_generator(spark, {
        "input_config": {"store_instance_id": "local",
                         "data_id": "raw.parquet"},
        "cube_config": {"variable_names": ["sst"],
                        "bbox": [-120, -60, 120, 60]},
        "code_config": {
            "callable_ref": "example_user_code:to_celsius_anomaly",
            "inline_code": (
                "def to_celsius_anomaly(df):\n"
                "    from pyspark.sql import functions as F\n"
                "    return df.withColumn('sst', F.col('sst') - 2.0)\n"
            ),
        },
        "output_config": {"store_instance_id": "local",
                          "data_id": "cube.parquet",
                          "write_params": {"mode": "overwrite"}},
    }, grid=grid, store_pool=pool)
    print(f"1. generated cube: {cube.count()} cells")

    # 2. Write + maintain a Zarr twin (chunked layout, unchunk coords)
    from xcube_spark.sources.zarrio import (open_zarr_cube,
                                            unchunk_dataset,
                                            write_zarr_cube)

    zpath = f"{tmp}/cube.zarr"
    n_chunks = write_zarr_cube(cube, zpath, grid, mode="overwrite")
    unchunked = unchunk_dataset(zpath, coords_only=True)
    print(f"2. zarr store: {n_chunks} chunks written, "
          f"coords unchunked: {unchunked or 'already single-chunk'}")
    # the store is grid-complete: cells outside the bbox subset come
    # back as fill values, so the re-opened cube covers the full grid
    assert open_zarr_cube(spark, zpath).count() == grid.size

    # 3. Query it: spatial subset -> per-time-step series
    from xcube_spark.operators.timeseries import get_time_series

    series = get_time_series(cube, ["sst"], agg_methods=["mean", "max"],
                             bbox=[-60, -30, 60, 30])
    print("3. timeseries:")
    for r in series.orderBy("time").collect()[:3]:
        print(f"   {r['time']}  mean={r['sst_mean']:.3f} "
              f"max={r['sst_max']:.3f}")

    # 4. Serve it (xcube serve) and fetch a PNG tile + STAC descriptor
    from xcube_spark.server import CubeServer

    srv = CubeServer(spark)
    srv.add_dataset("demo", cube, out_grid, title="Example cube")
    port = srv.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/wmts/1.0.0/tile/demo/sst/"
                "0/0/0.png?vmin=-2&vmax=8&cmap=viridis",
                timeout=120) as r:
            png = r.read()
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/ogc/collections/demo",
                timeout=120) as r:
            stac = json.loads(r.read())
        print(f"4. served: {len(png)}-byte PNG tile; STAC collection "
              f"bbox={stac['extent']['spatial']['bbox'][0]}")
    finally:
        srv.stop()

    # 5. A slice of the data-pipeline surface: dedup + quality
    from xcube_spark.pipeline.dedup import exact_dedup_map
    from xcube_spark.pipeline.text import quality_score

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "entirely different text with other words here")],
        "doc_id long, text string")
    dups = exact_dedup_map(docs).where(
        F.col("doc_id") != F.col("canonical_id"))
    q = quality_score(docs)
    print(f"5. pipeline: {dups.count()} duplicate doc(s); quality "
          f"columns = {[c for c in q.columns if c != 'doc_id']}")

    print("done.")


if __name__ == "__main__":
    main()
