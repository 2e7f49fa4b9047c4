"""CI gate for the float-boundary oracle audit (r7, VERDICT r6 item
6): the registry must contain zero FLAGGED rows, and the lint itself
must still catch the known-bad patterns (the jp2 incident's shape)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.audit_float_boundaries import (  # noqa: E402
    all_alias_defs,
    final_select_list,
    is_safe,
    quantization_scales,
    is_power_of_two,
    run_audit,
)


def test_registry_has_no_flagged_float_boundaries():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                        "/root/testdata/sf0.001")
    rows, flagged = run_audit(sf)
    bad = [r for r in rows if r[2] == "FLAGGED"]
    assert flagged == 0, bad


def test_lint_catches_unrounded_aggregate():
    sql = "SELECT k, AVG(v) AS m FROM t GROUP BY k"
    sel = final_select_list(sql)
    defs = all_alias_defs(sql)
    assert not is_safe(sel["m"], defs)


def test_lint_catches_jp2_style_quantization():
    """The round-6 failure shape: ROUND(x * 200) — a non-power-of-two
    quantization scale."""
    sql = "SELECT CAST(ROUND(A * 200, 0) AS BIGINT) AS q FROM t"
    scales = quantization_scales(sql)
    assert scales and not is_power_of_two(scales[0][1])
    # the zarr-ingest pattern is the accepted one
    ok = "SELECT FLOOR(A / CAST(0.0078125 AS DOUBLE) + 0.5) AS q FROM t"
    s2 = quantization_scales(ok)
    assert s2 and is_power_of_two(s2[0][1])


def test_lint_accepts_safe_shapes():
    sql = """
        WITH h AS (SELECT k, ROUND(AVG(v), 6) AS vm FROM t GROUP BY k)
        SELECT k, vm, MAX(raw) AS picked,
               CASE WHEN vm IS NULL THEN other ELSE vm END AS chosen
        FROM h JOIN u USING (k) GROUP BY k, vm, other
    """
    sel = final_select_list(sql)
    defs = all_alias_defs(sql)
    assert is_safe(sel["vm"], defs)        # rounded upstream
    assert is_safe(sel["picked"], defs)    # order-stat passthrough
    assert is_safe(sel["chosen"], defs)    # case over safe picks


def test_lint_rejects_arithmetic_on_safe_inputs():
    sql = """
        WITH h AS (SELECT k, ROUND(AVG(v), 6) AS vm FROM t GROUP BY k)
        SELECT k, vm + 1.0 AS shifted FROM h
    """
    sel = final_select_list(sql)
    defs = all_alias_defs(sql)
    # any new float arithmetic after the ROUND re-opens the boundary
    assert not is_safe(sel["shifted"], defs)
