"""Progress observers (util/progress.py — reference util/progress.py
parity) and the gen2 remote service loop (server.py /cubegens +
pipeline/remote.py RemoteCubeGenerator — reference
core/gen2/remote/generator.py:36)."""

import json
import urllib.request

import pytest

from xcube_spark.util.progress import (
    ProgressObserver,
    add_progress_observers,
    new_progress_observers,
    observe_progress,
)


class Recorder(ProgressObserver):
    def __init__(self):
        self.events = []

    def on_begin(self, stack):
        self.events.append(("begin", [s.label for s in stack]))

    def on_update(self, stack):
        self.events.append(
            ("update", [(s.label, round(s.progress, 4)) for s in stack]))

    def on_end(self, stack):
        self.events.append(("end", [s.label for s in stack],
                            stack[-1].exc_info_text))


def test_observe_progress_nested_propagation():
    rec = Recorder()
    with add_progress_observers(rec):
        with observe_progress("outer", 4) as p:
            p.worked(1)
            p.will_work(3)
            with observe_progress("inner", 10) as q:
                q.worked(5)   # inner 50% -> outer 1 + 1.5 of 4
                q.worked(5)
            assert p.state.completed_work == pytest.approx(4.0)
    kinds = [e[0] for e in rec.events]
    assert kinds == ["begin", "update", "begin", "update", "update",
                     "end", "end"]
    # inner 50% propagated: outer at (1 + 0.5*3)/4
    assert rec.events[3][1] == [("outer", round(2.5 / 4, 4)),
                                ("inner", 0.5)]


def test_observe_progress_error_capture_and_misuse():
    rec = Recorder()
    with add_progress_observers(rec):
        with pytest.raises(ValueError, match="boom"):
            with observe_progress("job", 1):
                raise ValueError("boom")
    end = [e for e in rec.events if e[0] == "end"][0]
    assert end[2][0] == "ValueError" and end[2][1] == "boom"
    p = observe_progress("x", 1)
    with pytest.raises(RuntimeError):
        p.worked(1)  # not entered


def test_new_progress_observers_suspends_outer():
    outer, inner = Recorder(), Recorder()
    with add_progress_observers(outer):
        with new_progress_observers(inner):
            with observe_progress("quiet", 1) as p:
                p.worked(1)
        with observe_progress("loud", 1) as p:
            p.worked(1)
    assert all("quiet" not in str(e) for e in outer.events)
    assert any("quiet" in str(e) for e in inner.events)
    assert any("loud" in str(e) for e in outer.events)


# ---- gen2 remote service e2e -----------------------------------------


def _get_json(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return json.loads(r.read())


def test_cubegen_submit_poll_e2e(spark):
    from xcube_spark.cube.grid import CubeGrid
    from xcube_spark.cube.new import new_cube
    from xcube_spark.pipeline.remote import (RemoteCubeGenerator,
                                             ServiceConfig)
    from xcube_spark.server import CubeServer

    grid = CubeGrid(width=16, height=8, time_periods=4, x_res=22.5,
                    y_res=22.5)
    cube = new_cube(spark, grid, {"sst": "CAST(t_i AS DOUBLE) + x_i"})
    srv = CubeServer(spark)
    srv.add_dataset("src", cube, grid, title="source")
    port = srv.start()
    try:
        gen = RemoteCubeGenerator(
            ServiceConfig(f"http://127.0.0.1:{port}"),
            progress_period=0.05, raise_on_error=True)
        job = gen.generate_cube({
            "input_config": {"store_id": "served", "data_id": "src"},
            "cube_config": {"variable_names": ["sst"],
                            "spatial_factor": 2},
            "output_config": {"data_id": "out", "title": "generated"},
        })
        assert job["status"]["succeeded"] is True
        assert job["result"]["datasetId"] == "out"
        # 16x8 -> 8x4 per time step, 4 steps
        assert job["result"]["rows"] == 8 * 4 * 4
        # the generated cube is served
        desc = _get_json(f"http://127.0.0.1:{port}/datasets/out")
        assert desc["id"] == "out"
        # listing + status routes
        listing = _get_json(f"http://127.0.0.1:{port}/cubegens")
        assert listing["cubegens"][0]["status"]["succeeded"] is True
        # failure path: bad dataset -> failed status, no exception
        gen2 = RemoteCubeGenerator(
            ServiceConfig(f"http://127.0.0.1:{port}"),
            progress_period=0.05)
        bad = gen2.generate_cube({
            "input_config": {"store_id": "served", "data_id": "nope"},
        })
        assert bad["status"]["failed"] is True
        assert "not served" in bad["result"]["message"]
    finally:
        srv.stop()


def test_observe_spark_progress(spark):
    """The Spark status-tracker sampler (observe_dask_progress twin):
    a real action under the context manager ends at 100% with at least
    begin/end events, and task-driven updates are monotone."""
    from xcube_spark.util.progress import observe_spark_progress

    rec = Recorder()
    with add_progress_observers(rec):
        with observe_spark_progress(spark, "count", 100, interval=0.02):
            spark.range(0, 2_000_000, 1, 16).selectExpr(
                "sum(id * id)").collect()
    kinds = [e[0] for e in rec.events]
    assert kinds[0] == "begin" and kinds[-1] == "end"
    fracs = [e[1][0][1] for e in rec.events if e[0] == "update"]
    assert fracs == sorted(fracs)          # monotone
    assert fracs[-1] == pytest.approx(1.0)  # accounted to completion
