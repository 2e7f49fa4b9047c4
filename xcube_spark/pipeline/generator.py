"""Cube generation pipeline — xcube gen2 (core/gen2/*, SURVEY §3.2).

The reference turns a declarative JSON/YAML request into a fixed stage
pipeline: open -> subset -> resample_t -> resample_xy -> combine ->
user code -> metadata -> write (core/gen2/local/generator.py:96-206).
Spark-first, the stages collapse into ONE composed DataFrame plan that
Catalyst optimizes as a whole — subsetting pushes into the scan,
resamples fuse where possible — and the writer triggers execution,
exactly the reference's lazy-until-write contract.

``CubeGeneratorRequest`` mirrors the reference's ``CubeConfig``
(core/gen2/config.py:125-170): variable_names, bbox, time_range,
time_period, spatial downscale factor, plus optional user code
(callable, the CubeUserCodeExecutor analog) and output path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Mapping

from pyspark.sql import DataFrame, SparkSession

from xcube_spark.cube.grid import CubeGrid


@dataclass
class CubeGeneratorRequest:
    """Declarative cube request (core/gen2/config.py:125-170)."""

    variable_names: list[str] | None = None
    bbox: list[float] | None = None  # [x1, y1, x2, y2]
    time_range: tuple[str | None, str | None] | None = None
    time_period: str | None = None  # e.g. "1W" -> resample_in_time
    time_agg: str = "mean"
    spatial_factor: int | None = None  # k -> k x k block downscale
    spatial_agg: str = "mean"
    user_code: Callable[[DataFrame], DataFrame] | None = None
    output_path: str | None = None
    output_format: str | None = None
    metadata: Mapping[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "CubeGeneratorRequest":
        """Parse the JSON-ish request shape (cube_config subset).

        A ``code_config`` entry (inline_code / file_set + callable_ref,
        xcube core/gen2/request.py + core/byoa/config.py) resolves to
        the ``user_code`` stage via :class:`~xcube_spark.pipeline.byoa.
        CodeConfig`.
        """
        cc = dict(d.get("cube_config", d))
        code_cfg = d.get("code_config") or cc.pop("code_config", None)
        known = {f for f in cls.__dataclass_fields__}
        req = cls(**{k: v for k, v in cc.items() if k in known})
        if code_cfg is not None and req.user_code is None:
            from xcube_spark.pipeline.byoa import CodeConfig

            cfg = (code_cfg if isinstance(code_cfg, CodeConfig)
                   else CodeConfig.from_dict(code_cfg))
            fn = cfg.get_callable()
            params = cfg.callable_params
            req.user_code = (
                (lambda df: fn(df, **params)) if params else fn
            )
        return req


def generate_cube(
    spark: SparkSession,
    cube: DataFrame,
    grid: CubeGrid,
    request: CubeGeneratorRequest,
) -> tuple[DataFrame, CubeGrid]:
    """Run the gen2 stage pipeline over an opened cube.

    Stage order mirrors generator.py:96-206; every stage is a pure
    DataFrame transform, so the returned plan executes once at write
    (or whenever the caller acts on it)."""
    from xcube_spark.operators.compute import align_cubes  # noqa: F401
    from xcube_spark.operators.select import select_subset
    from xcube_spark.operators.subsampling import subsample_dataset
    from xcube_spark.operators.temporal import resample_in_time

    out = cube
    out_grid = grid

    # CubeSubsetter (local/subsetter.py:21)
    if request.variable_names or request.bbox or request.time_range:
        out = select_subset(
            out,
            var_names=request.variable_names,
            bbox=request.bbox,
            time_range=request.time_range,
        )

    # CubeResamplerT (local/resamplert.py:14)
    if request.time_period:
        vars_ = request.variable_names
        out = resample_in_time(
            out, request.time_period, methods=(request.time_agg,),
            var_names=vars_,
        )
        # the grid's time axis changed with the data: coarser period,
        # fewer steps (fixed-length units only — W/M/Q/Y bins are
        # calendar-shaped, so the step count stays declared)
        from dataclasses import replace as _dc_replace

        from xcube_spark.operators.temporal import parse_frequency

        n, unit = parse_frequency(request.time_period) \
            if request.time_period != "all" else (0, "all")
        unit_days = {"min": 1 / 1440, "T": 1 / 1440, "H": 1 / 24,
                     "D": 1.0}.get(unit)
        if request.time_period == "all":
            out_grid = _dc_replace(
                out_grid, time_periods=1,
                t_freq_days=out_grid.t_freq_days
                * out_grid.time_periods)
        elif unit_days is not None:
            new_freq = n * unit_days
            import math as _math

            out_grid = _dc_replace(
                out_grid,
                t_freq_days=new_freq,
                time_periods=max(1, _math.ceil(
                    out_grid.time_periods * out_grid.t_freq_days
                    / new_freq)),
            )
        # resample renames var -> var_<agg> (temporal.py:129); restore
        # the declared names so downstream stages see a cube
        for v in (vars_ or []):
            renamed = f"{v}_{request.time_agg}"
            if renamed in out.columns:
                out = out.withColumnRenamed(renamed, v)

    # CubeResamplerXY (local/resamplerxy.py:16)
    if request.spatial_factor and request.spatial_factor > 1:
        k = request.spatial_factor
        if request.time_period:
            # after temporal resample the time axis is (time), not t_i;
            # block-aggregate on the spatial indices only
            from pyspark.sql import functions as F

            vars_ = [c for c in out.columns
                     if c not in ("time", "t_i", "y_i", "x_i", "y", "x")]
            out = out.groupBy(
                "time",
                F.floor(F.col("y_i") / k).cast("int").alias("y_i"),
                F.floor(F.col("x_i") / k).cast("int").alias("x_i"),
            ).agg(*[
                getattr(F, "avg" if request.spatial_agg == "mean"
                        else request.spatial_agg)(v).alias(v)
                for v in vars_
            ])
        else:
            out = subsample_dataset(out, factor=k,
                                    agg_methods=request.spatial_agg)
            for v in (request.variable_names or []):
                renamed = f"{v}_{request.spatial_agg}"
                if renamed in out.columns:
                    out = out.withColumnRenamed(renamed, v)
        out_grid = out_grid.downsampled(k)

    # CubeUserCodeExecutor (local/usercode.py:24)
    if request.user_code is not None:
        out = request.user_code(out)

    # CubeWriter (local/writer.py) — where execution happens
    if request.output_path:
        from xcube_spark.sources.dsio import write_dataset

        write_dataset(out, request.output_path,
                      format_name=request.output_format, mode="overwrite")

    return out, out_grid


def run_cube_generator(
    spark: SparkSession,
    request: Mapping[str, Any],
    grid: CubeGrid,
    store_pool=None,
):
    """Service-level gen2 request runner (core/gen2/request.py:25-120 +
    local/generator.py): resolve ``input_config(s)`` through a
    :class:`~xcube_spark.sources.store.DataStorePool` (by
    ``store_instance_id``) or an ad-hoc store (by ``store_id`` +
    ``store_params``), combine multiple inputs variable-wise on the
    shared cell grid (the CubesCombiner stage), run the declarative
    stage pipeline, and write to ``output_config``'s store.

    Returns ``(cube, grid)`` like :func:`generate_cube`; the write —
    where execution actually happens — occurs only when
    ``output_config`` is present, preserving lazy-until-write.
    """
    from xcube_spark.sources.store import new_data_store

    def _resolve(cfg: Mapping[str, Any]):
        if "store_instance_id" in cfg:
            if store_pool is None:
                raise ValueError(
                    "store_instance_id given but no store_pool")
            return store_pool.get_store(cfg["store_instance_id"])
        return new_data_store(cfg["store_id"], spark,
                              **cfg.get("store_params", {}))

    ics = request.get("input_configs")
    if not ics:
        ic = request.get("input_config")
        if not ic:
            raise ValueError(
                "one of input_config and input_configs must be given")
        ics = [ic]
    elif request.get("input_config"):
        raise ValueError(
            "input_config and input_configs cannot be given both")

    cubes = []
    for ic in ics:
        store = _resolve(ic)
        cubes.append(
            store.open_data(ic["data_id"], **ic.get("open_params", {})))

    index_cols = ("t_i", "y_i", "x_i", "time", "y", "x")
    combined = cubes[0]
    for other in cubes[1:]:
        on = [c for c in index_cols
              if c in combined.columns and c in other.columns]
        if not on:
            raise ValueError(
                "input cubes share no grid index columns to combine on")
        # variable-wise merge on the shared cell grid: drop the other
        # side's duplicate non-key columns (first input wins, the
        # reference combiner's behavior)
        dup = [c for c in other.columns
               if c in combined.columns and c not in on]
        combined = combined.join(other.drop(*dup), on=on, how="inner")

    req = CubeGeneratorRequest.from_dict(request)
    out, out_grid = generate_cube(spark, combined, grid, req)

    oc = request.get("output_config")
    if oc:
        store = _resolve(oc)
        store.write_data(out, oc["data_id"], **oc.get("write_params", {}))
    return out, out_grid
