"""Remote cube generation with progress — the gen2 service loop
(reference core/gen2/remote/) re-expressed against this repo's
/cubegens service.  Runs standalone:

    python examples/remote_generation.py

Starts a CubeServer in-process, submits a generation request through
RemoteCubeGenerator, watches progress via a console observer, then
queries the generated dataset over HTTP.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from xcube_spark.util.progress import (  # noqa: E402
    ProgressObserver,
    add_progress_observers,
)


class ConsoleProgress(ProgressObserver):
    """Minimal observer: prints each progress frame update."""

    def on_begin(self, stack):
        print(f"  [{stack[-1].label}] started")

    def on_update(self, stack):
        outer = stack[0]
        print(f"  [{outer.label}] {100 * outer.progress:.0f}%")

    def on_end(self, stack):
        s = stack[-1]
        state = "failed" if s.exc_info else "done"
        print(f"  [{s.label}] {state} in {s.total_time:.2f}s")


def main() -> None:
    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.cube.new import new_cube
    from xcube_spark.pipeline.remote import (RemoteCubeGenerator,
                                             ServiceConfig)
    from xcube_spark.server import CubeServer
    from xcube_spark.session import get_session
    spark = get_session(app_name="xcube-spark-remote-example")

    # 1. A serving node with a source cube
    grid = CubeGrid(width=72, height=36, time_periods=6,
                    x_res=5.0, y_res=5.0)
    cube = new_cube(spark, grid, {
        "sst": "10.0 + 0.2 * t_i + 0.05 * y_i",
    })
    srv = CubeServer(spark)
    srv.add_dataset("sst-source", cube, grid, title="SST source")
    port = srv.start()
    base = f"http://127.0.0.1:{port}"
    print(f"serving at {base}")

    # 2. Submit a gen2 request and poll with progress re-emission
    obs = ConsoleProgress()
    gen = RemoteCubeGenerator(ServiceConfig(base), progress_period=0.1,
                              raise_on_error=True)
    print("submitting generation request...")
    with add_progress_observers(obs):
        job = gen.generate_cube({
            "input_config": {"store_id": "served",
                             "data_id": "sst-source"},
            "cube_config": {"variable_names": ["sst"],
                            "time_period": "2D",
                            "spatial_factor": 2},
            "output_config": {"data_id": "sst-weekly",
                              "title": "SST 2-daily half-res"},
        })
    print(f"job result: {job['result']}")

    # 3. The generated cube serves like any other dataset
    with urllib.request.urlopen(f"{base}/datasets/sst-weekly",
                                timeout=60) as r:
        desc = json.load(r)
    print(f"generated dims: {desc['dimensions']}")
    srv.stop()
    print("ok.")


if __name__ == "__main__":
    main()
