"""sparkcube CLI — the reference's command surface (SURVEY §2.13,
xcube/plugin.py:224-247) as a thin dispatcher over engine functions.

Each subcommand loads a cells-table dataset, applies one operator, and
writes/prints the result — job entry points, not a new API layer:

    sparkcube dump CUBE.parquet
    sparkcube verify CUBE.parquet --width 360 --height 180 --time-periods 5
    sparkcube extract CUBE.parquet POINTS.csv -o OUT.parquet
    sparkcube resample CUBE.parquet -F 1W -M mean -o OUT.parquet
    sparkcube subsample CUBE.parquet -k 2 -o OUT.parquet
    sparkcube levels CUBE.parquet -n 3 -o OUT_DIR
    sparkcube optimize CUBE.parquet -o OUT.parquet --partitions 8
    sparkcube genpts CUBE.parquet -n 100 -o OUT.csv
    sparkcube gen REQUEST.json
"""

from __future__ import annotations

import argparse
import json
import sys

from xcube_spark.cube.grid import CubeGrid


def _read_request_json(path: str | None) -> dict:
    """gen2 request: a JSON file path, or '-'/omitted for stdin (the
    reference's piped-request form, cli/gen2.py REQUEST arg)."""
    if path in (None, "-"):
        return json.load(sys.stdin)
    with open(path) as f:
        return json.load(f)


def _emit_result(doc: dict, result_file: str | None) -> None:
    text = json.dumps(doc, indent=2, default=str)
    if result_file:
        with open(result_file, "w") as f:
            f.write(text + "\n")
    else:
        print(text)


def _grid_from_args(args) -> CubeGrid:
    return CubeGrid(
        width=args.width, height=args.height, time_periods=args.time_periods,
        x_start=args.x_start, y_start=args.y_start,
        x_res=args.x_res, y_res=args.y_res,
    )


def _add_grid_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--width", type=int, default=360)
    p.add_argument("--height", type=int, default=180)
    p.add_argument("--time-periods", type=int, default=5)
    p.add_argument("--x-start", type=float, default=-180.0)
    p.add_argument("--y-start", type=float, default=-90.0)
    p.add_argument("--x-res", type=float, default=1.0)
    p.add_argument("--y-res", type=float, default=1.0)


def _run_benchmark(args) -> int:
    """``sparkcube benchmark CONFIG -R N`` (reference cli/benchmark.py:
    hidden command): time a templated command over the cartesian
    product of its parameter value lists, print per-combination timing
    stats as ``;``-separated rows.  Config (YAML or JSON)::

        command: sparkcube dump ${input}
        params: [input]
        input: [a.parquet, b.parquet]

    ``--in-process`` dispatches ``sparkcube ...`` commands through
    :func:`main` in this interpreter (one shared JVM) instead of a
    subprocess — the right mode when the per-run cost being measured
    is the query, not session startup.
    """
    import itertools
    import shlex
    import statistics
    import subprocess
    import time

    with open(args.config) as f:
        text = f.read()
    try:
        import yaml

        cfg = yaml.safe_load(text)
    except ImportError:  # pragma: no cover - pyyaml is available here
        cfg = json.loads(text)
    template = cfg["command"]
    names = list(cfg["params"])
    combos = list(itertools.product(*[cfg[n] for n in names]))
    times: dict[int, list[float]] = {i: [] for i in range(len(combos))}
    for _rep in range(args.repeats):
        for i, values in enumerate(combos):
            cmd = template
            for n, v in zip(names, values):
                cmd = cmd.replace("${%s}" % n, str(v))
            argv_run = shlex.split(cmd)
            t0 = time.perf_counter()
            try:
                if args.in_process and argv_run[:1] == ["sparkcube"]:
                    rc = main(argv_run[1:])
                    if rc != 0:
                        raise RuntimeError(f"exit {rc}")
                else:
                    subprocess.check_call(argv_run)
                times[i].append(time.perf_counter() - t0)
            except Exception as e:
                print(f"error: {e}", file=sys.stderr)
                times[i].append(float("nan"))
    print(f"# command template: {template}")
    print(f"# repetition count: {args.repeats}")
    print("id;" + ";".join(names)
          + ";time-mean;time-median;time-stdev;time-min;time-max")
    for i, values in enumerate(combos):
        ts = [t for t in times[i] if t == t]  # drop NaNs
        if ts:
            stats = (statistics.fmean(ts), statistics.median(ts),
                     statistics.pstdev(ts), min(ts), max(ts))
        else:
            stats = (float("nan"),) * 5
        print(f"{i};" + ";".join(str(v) for v in values) + ";"
              + ";".join(f"{s:.6f}" for s in stats))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sparkcube")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("dump", help="describe a dataset (xcube dump)")
    p.add_argument("input")

    p = sub.add_parser("verify", help="structural cube validation")
    p.add_argument("input")
    _add_grid_args(p)

    p = sub.add_parser("extract", help="cube values for points")
    p.add_argument("input")
    p.add_argument("points")
    p.add_argument("-o", "--output", required=True)
    _add_grid_args(p)

    p = sub.add_parser("resample", help="temporal resampling")
    p.add_argument("input")
    p.add_argument("-F", "--frequency", default="1W")
    p.add_argument("-M", "--method", default="mean")
    p.add_argument("-o", "--output", required=True)

    p = sub.add_parser("subsample", help="k x k spatial subsampling")
    p.add_argument("input")
    p.add_argument("-k", "--factor", type=int, default=2)
    p.add_argument("-M", "--method", default="mean")
    p.add_argument("-o", "--output", required=True)

    p = sub.add_parser("levels", help="build pyramid levels")
    p.add_argument("input")
    p.add_argument("-n", "--num-levels", type=int, default=3)
    p.add_argument("-o", "--output", required=True)
    _add_grid_args(p)

    p = sub.add_parser("chunk", help="rewrite with the pruning layout")
    p.add_argument("input")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--files-per-partition", type=int, default=8)
    _add_grid_args(p)

    p = sub.add_parser("optimize", help="compact a dataset")
    p.add_argument("input")
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("-o", "--output")
    p.add_argument("-C", "--unchunk-coords", action="store_true",
                   help="in-place: rewrite a zarr store's coordinate "
                        "arrays as single chunks (cli/optimize.py:31)")

    p = sub.add_parser("genpts", help="random test points from a cube")
    p.add_argument("input")
    p.add_argument("-n", "--num-points", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("-o", "--output", required=True)
    _add_grid_args(p)

    p = sub.add_parser("gen", help="run a cube-generation request (gen2)")
    p.add_argument("request", help="JSON request file; input_path + "
                   "cube_config keys")
    _add_grid_args(p)

    p = sub.add_parser(
        "gen2", help="generator tool for data cubes: run a request "
        "locally, or submit it to a generator service (ref cli/gen2.py)")
    p.add_argument("request", nargs="?",
                   help="JSON request file; '-' or omitted reads stdin")
    p.add_argument("--service", dest="service_config", metavar="SERVICE",
                   help="JSON service config {endpoint_url, "
                   "access_token?} — submits REQUEST to the /cubegens "
                   "service instead of generating locally; ${ENV_VAR} "
                   "values are interpolated")
    p.add_argument("-i", "--info", action="store_true",
                   help="describe the cube that would be generated "
                   "(schema + row count); do not write it")
    p.add_argument("-o", "--output", dest="result_file",
                   help="write the result JSON here instead of stdout")
    _add_grid_args(p)

    p = sub.add_parser("versions", help="versions of the packages the "
                       "engine uses (xcube versions)")
    p.add_argument("-f", "--format", dest="fmt",
                   choices=["yaml", "json"], default=None)
    p.add_argument("-o", "--output", default=None)

    p = sub.add_parser("io", help="data-store introspection "
                       "(xcube io: store list/info/data)")
    io_sub = p.add_subparsers(dest="io_cmd", required=True)
    io_sub.add_parser("list", help="known store/format ids")
    q = io_sub.add_parser("info", help="describe a store's datasets")
    q.add_argument("store")
    q.add_argument("params", nargs="*", help="key=value store params")
    q = io_sub.add_parser("data", help="describe one dataset in a store")
    q.add_argument("store")
    q.add_argument("data_id")
    q.add_argument("params", nargs="*", help="key=value store params")

    p = sub.add_parser("benchmark", help="time a templated command over "
                       "a parameter grid (xcube benchmark)")
    p.add_argument("config", help="YAML/JSON: command template with "
                   "${param} placeholders, params list, value lists")
    p.add_argument("-R", "--repeats", type=int, default=1)
    p.add_argument("--in-process", action="store_true",
                   help="dispatch 'sparkcube ...' commands through "
                   "main() instead of a subprocess (shares the JVM)")

    p = sub.add_parser("compute", help="compute a variable from a user "
                       "script over one or more cubes (xcube compute)")
    p.add_argument("script", help="Python file defining "
                   "compute(*arrays, coords, **input_params) -> array")
    p.add_argument("cubes", nargs="+", help="input cube dataset(s); "
                   "multiple cubes are aligned on the grid key")
    p.add_argument("--variables", "--vars", dest="variables",
                   default=None, help="comma-separated input variables")
    p.add_argument("-p", "--params", default=None,
                   help="JSON dict passed as input_params")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("-N", "--name", default="output",
                   help="output variable name")
    p.add_argument("-D", "--dtype", default="double",
                   choices=["double", "float", "int", "long"])
    _add_grid_args(p)

    p = sub.add_parser("rectify", help="rectify swath coords onto the grid")
    p.add_argument("input")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--interpolation", default="nearest",
                   choices=["nearest", "idw", "triangular", "bilinear"])
    p.add_argument("--lon-name", default="lon")
    p.add_argument("--lat-name", default="lat")
    _add_grid_args(p)

    p = sub.add_parser("prune", help="drop all-empty chunks")
    p.add_argument("input")
    p.add_argument("-o", "--output", required=True)
    _add_grid_args(p)

    p = sub.add_parser("patch", help="patch dataset metadata attrs")
    p.add_argument("input")
    p.add_argument("patch_file", help="JSON attrs patch")
    p.add_argument("-o", "--output", required=True)

    p = sub.add_parser("vars2dim", help="fold variables into a dimension")
    p.add_argument("input")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--dim-name", default="var")
    p.add_argument("--value-name", default="value")

    p = sub.add_parser("curate", help="run the corpus-curation chain "
                       "(quality gate, exact dedup, PII redaction, "
                       "splits) over a documents table")
    p.add_argument("input", help="parquet with doc_id/text columns")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--substring-window", type=int, default=0,
                   help="if > 0, also excise duplicated spans of this "
                        "many tokens (Lee et al. substring dedup)")

    p = sub.add_parser("virtualize", help="scan netCDF-4 granules into "
                       "one kerchunk refs doc (distributed metadata "
                       "scan, time concatenation)")
    p.add_argument("inputs", nargs="+", help="granule .nc paths")
    p.add_argument("-o", "--output", required=True,
                   help="refs JSON output path")
    p.add_argument("--var", action="append", dest="variables",
                   help="restrict to these variables (repeatable)")

    p = sub.add_parser("grid", help="fixed-Earth-grid resolution "
                       "calculator (xcube grid res/levels/abox)")
    p.add_argument("action", choices=["res", "levels", "abox"])
    p.add_argument("value", help="res: target resolution (deg or Nm); "
                   "levels: grid height; abox: x1,y1,x2,y2")
    p.add_argument("--delta", default="2.5%",
                   help="res: max deviation (deg, Nm or P%%)")
    p.add_argument("--coverage", type=float, default=180.0)
    p.add_argument("--tile-max", type=int, default=2500)
    p.add_argument("--level-min", type=int, default=0)
    p.add_argument("--int-inv-res", action="store_true")
    p.add_argument("--num-results", type=int, default=10)
    p.add_argument("--res", help="abox: grid resolution (deg or Nm)")

    p = sub.add_parser("serve", help="HTTP server over a cube "
                       "(xcube serve; datasets/tiles/timeseries/"
                       "statistics/coverage routes)")
    p.add_argument("input")
    p.add_argument("--id", default="dataset", help="dataset id")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1")
    _add_grid_args(p)

    args = ap.parse_args(argv)

    if args.cmd == "grid":  # pure arithmetic — no Spark session
        from fractions import Fraction

        from xcube_spark.functions.gridcalc import (
            LEVELS_HEADER, RES_HEADER, find_close_resolutions,
            get_adjusted_box, get_levels, parse_delta, parse_res)

        cov = Fraction(args.coverage).limit_denominator(10**9)
        if args.action == "res":
            target = parse_res(args.value)
            results = find_close_resolutions(
                target, parse_delta(args.delta, target), cov,
                max_tile=args.tile_max, min_level=args.level_min,
                int_inv_res=args.int_inv_res)
            print("\t".join(RES_HEADER))
            for g in results[:args.num_results]:
                print("\t".join(map(str, g.row())))
            if len(results) > args.num_results:
                print(f"{len(results) - args.num_results} more...")
        elif args.action == "levels":
            print("\t".join(LEVELS_HEADER))
            for row in get_levels(int(args.value), cov,
                                  min_levels=args.level_min or None):
                print("\t".join(map(str, row)))
        else:  # abox
            if not args.res:
                print("abox needs --res", file=sys.stderr)
                return 2
            x1, y1, x2, y2 = (float(v) for v in args.value.split(","))
            res = parse_res(args.res)
            ax1, ay1, ax2, ay2 = get_adjusted_box(x1, y1, x2, y2, res)
            print(f"Adjusted box: {ax1},{ay1},{ax2},{ay2}")
            print(f"Box size: {round((ax2 - ax1) / res)} x "
                  f"{round((ay2 - ay1) / res)} cells")
        return 0

    if args.cmd == "benchmark":  # no session of its own (cli/benchmark.py)
        return _run_benchmark(args)

    if args.cmd == "versions":  # cli/versions.py: package inventory
        import importlib

        vers = {"python": sys.version.split()[0],
                "xcube_spark": __import__("xcube_spark").__version__}
        for pkg in ("pyspark", "pyarrow", "pandas", "numpy", "duckdb"):
            try:
                vers[pkg] = importlib.import_module(pkg).__version__
            except Exception:
                vers[pkg] = None
        if args.fmt == "json" or (args.fmt is None and args.output
                                  and args.output.endswith(".json")):
            text = json.dumps(vers, indent=2)
        else:
            text = "".join(f"{k}: {v}\n" for k, v in sorted(vers.items()))
        if args.output:
            with open(args.output, "w") as f:
                f.write(text)
        else:
            print(text, end="")
        return 0

    if args.cmd == "gen2" and args.service_config:
        # remote submit (ref cli/gen2.py --service): the request runs
        # on the generator service — no local Spark session needed
        import os

        from xcube_spark.pipeline.remote import (
            RemoteCubeGenerator, ServiceConfig)

        req_dict = _read_request_json(args.request)
        with open(args.service_config) as f:
            cfg = json.loads(os.path.expandvars(f.read()))
        gen = RemoteCubeGenerator(ServiceConfig(
            endpoint_url=cfg["endpoint_url"],
            access_token=cfg.get("access_token")))
        job = gen.generate_cube(req_dict)
        _emit_result(job, args.result_file)
        return 0 if (job.get("status") or {}).get("succeeded") else 1

    from xcube_spark.session import get_session
    from xcube_spark.sources.dsio import open_dataset, write_dataset

    spark = get_session(app_name=f"sparkcube-{args.cmd}")

    if args.cmd == "io":  # cli/io.py: store/opener introspection
        import dataclasses

        from xcube_spark.sources.dsio import FORMATS
        from xcube_spark.sources.store import _STORES, new_data_store

        if args.io_cmd == "list":
            print("stores: " + ", ".join(sorted(_STORES)))
            print("formats: " + ", ".join(sorted(FORMATS)))
            return 0
        params = dict(kv.split("=", 1) for kv in args.params)
        store = new_data_store(args.store, spark, **params)
        if args.io_cmd == "info":
            for did in store.get_data_ids():
                print(did)
            return 0
        d = store.describe_data(args.data_id)
        print(json.dumps(dataclasses.asdict(d), indent=2, default=str))
        return 0

    if args.cmd == "serve":
        from xcube_spark.server import CubeServer

        srv = CubeServer(spark)
        srv.add_dataset(args.id, open_dataset(spark, args.input),
                        _grid_from_args(args))
        port = srv.start(host=args.host, port=args.port)
        print(f"serving {args.id} on http://{args.host}:{port} "
              "(Ctrl-C to stop)")
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            srv.stop()
        return 0

    if args.cmd == "virtualize":
        from xcube_spark.sources.virtualize import virtualize_netcdf4_mf

        n = virtualize_netcdf4_mf(spark, args.inputs, args.output,
                                  var_names=args.variables)
        print(f"{n} chunk references -> {args.output}")
        return 0

    if args.cmd == "dump":
        from xcube_spark.sources.store import describe_dataframe

        df = open_dataset(spark, args.input)
        df.printSchema()
        desc = describe_dataframe(args.input, df)
        print(f"rows: {desc.num_rows}")
        print(f"dims: {desc.dims}")
        print(f"bbox: {desc.bbox}")
        print(f"time: {desc.time_range}")
        for v in desc.variables:
            print(f"var {v.name}: {v.dtype} valid={v.n_valid} "
                  f"min={v.vmin} max={v.vmax}")
        return 0

    if args.cmd == "verify":
        from xcube_spark.operators.maintenance import verify_cube

        report = verify_cube(open_dataset(spark, args.input),
                             _grid_from_args(args))
        if report:
            print("INVALID CUBE:")
            for r in report:
                print(f"- {r}")
            return 1
        print("OK")
        return 0

    if args.cmd == "extract":
        from xcube_spark.operators.extract import get_cube_values_for_points

        cube = open_dataset(spark, args.input)
        points = open_dataset(spark, args.points)
        out = get_cube_values_for_points(cube, _grid_from_args(args), points)
        write_dataset(out, args.output, mode="overwrite")
        return 0

    if args.cmd == "resample":
        from xcube_spark.operators.temporal import resample_in_time

        out = resample_in_time(open_dataset(spark, args.input),
                               args.frequency, methods=(args.method,))
        write_dataset(out, args.output, mode="overwrite")
        return 0

    if args.cmd == "subsample":
        from xcube_spark.operators.subsampling import subsample_dataset

        out = subsample_dataset(open_dataset(spark, args.input),
                                factor=args.factor, agg_methods=args.method)
        write_dataset(out, args.output, mode="overwrite")
        return 0

    if args.cmd == "levels":
        from xcube_spark.operators.levels import compute_levels

        cube = open_dataset(spark, args.input)
        levels = compute_levels(cube, _grid_from_args(args),
                                num=args.num_levels)
        for lvl, (df, _g) in enumerate(levels):
            write_dataset(df, f"{args.output}/L{lvl}", mode="overwrite")
        return 0

    if args.cmd == "chunk":
        from xcube_spark.sources.layout import write_cube_layout

        write_cube_layout(open_dataset(spark, args.input), args.output,
                          _grid_from_args(args),
                          files_per_partition=args.files_per_partition,
                          mode="overwrite")
        return 0

    if args.cmd == "optimize":
        if args.unchunk_coords:
            from xcube_spark.sources.zarrio import unchunk_dataset

            done = unchunk_dataset(args.input, coords_only=True)
            print(f"unchunked: {', '.join(done) if done else '(nothing)'}")
            if not args.output:
                return 0
        if not args.output:
            print("error: -o/--output is required unless -C alone",
                  file=sys.stderr)
            return 2
        from xcube_spark.operators.maintenance import optimize_dataset

        out = optimize_dataset(open_dataset(spark, args.input),
                               args.partitions)
        write_dataset(out, args.output, mode="overwrite")
        return 0

    if args.cmd == "genpts":
        from xcube_spark.cube.new import gen_points

        out = gen_points(spark, _grid_from_args(args), args.num_points,
                         seed=args.seed)
        write_dataset(out, args.output, mode="overwrite")
        return 0

    if args.cmd == "rectify":
        from xcube_spark.operators.resampling.rectify import rectify_dataset

        out = rectify_dataset(open_dataset(spark, args.input),
                              _grid_from_args(args),
                              lon_name=args.lon_name,
                              lat_name=args.lat_name,
                              interpolation=args.interpolation)
        write_dataset(out, args.output, mode="overwrite")
        return 0

    if args.cmd == "prune":
        from xcube_spark.operators.maintenance import prune_dataset

        out = prune_dataset(open_dataset(spark, args.input),
                            _grid_from_args(args))
        write_dataset(out, args.output, mode="overwrite")
        return 0

    if args.cmd == "patch":
        from xcube_spark.cube.metadata import edit_metadata

        with open(args.patch_file) as f:
            patch = json.load(f)
        df = open_dataset(spark, args.input)
        write_dataset(df, args.output, mode="overwrite")
        edit_metadata(args.output, patch)
        return 0

    if args.cmd == "curate":
        from pyspark.sql import functions as F

        from xcube_spark.pipeline.curation import (
            assign_split, pii_redact, substring_dedup_clean)
        from xcube_spark.pipeline.dedup import exact_dedup_map
        from xcube_spark.pipeline.text import quality_score

        docs = open_dataset(spark, args.input)
        q = quality_score(docs).where(
            F.round("quality", 6) >= args.min_quality)
        canon = exact_dedup_map(docs).where(
            F.col("doc_id") == F.col("canonical_id")).select("doc_id")
        kept = q.join(canon, "doc_id").select("doc_id", "text")
        if args.substring_window > 0:
            cleaned = substring_dedup_clean(
                kept, window=args.substring_window)
            kept = cleaned.where(F.col("n_tokens_kept") > 0).select(
                "doc_id", F.col("text_clean").alias("text"))
        out = assign_split(pii_redact(kept).select(
            "doc_id", F.col("text_redacted").alias("text")))
        write_dataset(out, args.output, mode="overwrite")
        return 0

    if args.cmd == "vars2dim":
        from xcube_spark.operators.vars2dim import vars_to_dim

        out = vars_to_dim(open_dataset(spark, args.input),
                          dim_name=args.dim_name,
                          data_name=args.value_name)
        write_dataset(out, args.output, mode="overwrite")
        return 0

    if args.cmd == "gen":
        from xcube_spark.pipeline.generator import (
            CubeGeneratorRequest,
            generate_cube,
        )

        with open(args.request) as f:
            req_dict = json.load(f)
        cube = open_dataset(spark, req_dict["input_path"])
        req = CubeGeneratorRequest.from_dict(req_dict)
        out, _ = generate_cube(spark, cube, _grid_from_args(args), req)
        if not req.output_path:
            print(f"rows: {out.count()}")
        return 0

    if args.cmd == "gen2":  # local generation (no --service)
        import dataclasses

        from xcube_spark.pipeline.generator import (
            CubeGeneratorRequest,
            generate_cube,
        )
        from xcube_spark.util.progress import observe_progress

        req_dict = _read_request_json(args.request)
        cube = open_dataset(spark, req_dict["input_path"])
        req = CubeGeneratorRequest.from_dict(req_dict)
        if args.info:
            # describe, don't write (ref cli/gen2.py --info)
            dry = dataclasses.replace(req, output_path=None)
            out, _ = generate_cube(spark, cube, _grid_from_args(args),
                                   dry)
            _emit_result({
                "status": {"succeeded": True},
                "result": {
                    "schema": dict(out.dtypes),
                    "rows": out.count(),
                    "output_path": req.output_path,
                },
            }, args.result_file)
            return 0
        with observe_progress("Generating cube", 2) as cm:
            out, _ = generate_cube(spark, cube, _grid_from_args(args),
                                   req)
            cm.worked(1)
            result: dict = {"output_path": req.output_path}
            if not req.output_path:
                result["rows"] = out.count()
            cm.worked(1)
        _emit_result({"status": {"succeeded": True}, "result": result},
                     args.result_file)
        return 0

    if args.cmd == "compute":
        # reference cli/compute.py: user SCRIPT defines compute(); here
        # the chunk contract is compute_dataset's (operators/compute.py
        # :47) — per-chunk numpy arrays + coords dict
        import importlib.util

        from xcube_spark.operators.compute import compute_dataset

        spec = importlib.util.spec_from_file_location(
            "sparkcube_user_compute", args.script)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        if not hasattr(mod, "compute"):
            print(f"error: {args.script} defines no compute() function",
                  file=sys.stderr)
            return 1
        cubes = [open_dataset(spark, c) for c in args.cubes]
        out = compute_dataset(
            mod.compute,
            *cubes,
            grid=_grid_from_args(args),
            var_name=args.name,
            input_var_names=(args.variables.split(",")
                             if args.variables else None),
            input_params=(json.loads(args.params)
                          if args.params else None),
            output_type=args.dtype,
        )
        if args.output:
            write_dataset(out, args.output, mode="overwrite")
        else:
            print(f"rows: {out.count()}")
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
