"""Float-boundary audit of the oracle registry (r7, VERDICT r6 item 6).

The round-6 jp2 incident: a query whose value hash rests on two engines
producing bit-identical doubles near a rounding boundary can be green
locally and red on the driver.  This audit mechanizes the zarr query's
margin analysis across the WHOLE registry:

- every FLOAT/DOUBLE output column of every oracle must be produced by
  an explicit ROUND(...) (the driver's comparator formats floats at 6
  decimals, so a ROUND at <= 6 decimals makes ulp noise unobservable
  unless a value sits exactly at a half-ulp boundary — which ROUND's
  own argument being a plain sum/avg of fixture data makes
  astronomically unlikely, and which the fixtures' margin notes cover),
  OR be integer-valued by construction, OR carry a documented margin in
  the allowlist below;
- quantization idioms (``ROUND(expr * k)``, ``FLOOR(expr / s + 0.5)``)
  must use power-of-two scales, the zarr pattern that keeps every
  quantization boundary a provable distance from any fixture value —
  non-power-of-two scales are flagged unless allowlisted with a
  rationale.

Usage: python scripts/audit_float_boundaries.py [sf_dir]
Writes AUDIT_FLOAT_BOUNDARIES.md and exits nonzero on any FLAGGED row.
tests/test_float_boundary_audit.py runs the same logic in CI.
"""

from __future__ import annotations

import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: alias -> rationale for double outputs that are NOT wrapped in
#: ROUND but are safe by construction; every entry must explain its
#: margin (this is the "documents its margin" leg of the contract).
DOCUMENTED_MARGINS: dict[tuple[str, str], str] = {
}

#: quantization scales that are not powers of two but are safe, with
#: the margin argument.
DOCUMENTED_SCALES: dict[tuple[str, str], str] = {
    # calendar arithmetic on EXACT integers: day is a BIGINT (< 2^20)
    # recovered from a dyadic-exact double, so FLOOR(day / year_days)
    # divides exact integers — IEEE division is exactly rounded and
    # the quotient is never a boundary case (the +0.5 quantization
    # idiom the lint hunts does not occur here)
    ("cube_cftime_decode", "365"): "exact BIGINT / year-length",
    ("cube_cftime_decode", "366"): "exact BIGINT / year-length",
    ("cube_cftime_decode", "360"): "exact BIGINT / year-length",
    ("cube_cftime_decode", "1461"): "exact BIGINT / quadrennium",
    ("cube_cftime_decode", "86400"): "exact BIGINT / day-seconds",
}

FLOATY = ("DOUBLE", "FLOAT", "REAL", "DECIMAL")


def strip_comments(sql: str) -> str:
    """Remove ``--`` line comments (quote-aware: a ``--`` inside a
    string literal survives; an apostrophe inside a comment cannot
    poison the quote state — the round-6 parser pitfall)."""
    out, i, n, quote = [], 0, len(sql), None
    while i < n:
        ch = sql[i]
        if quote:
            if ch == quote:
                quote = None
            out.append(ch)
        elif ch in "'\"":
            quote = ch
            out.append(ch)
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                i += 1
            continue
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def split_top_level(s: str, sep: str = ",") -> list[str]:
    out, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
            cur.append(ch)
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def final_select_list(sql: str) -> dict[str, str]:
    """alias -> expression of the OUTERMOST (depth-0) final SELECT."""
    sql = strip_comments(sql)
    depth, quote = 0, None
    sel_starts = []
    upper = sql.upper()
    i = 0
    while i < len(sql):
        ch = sql[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and upper.startswith("SELECT", i) and (
                i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
            sel_starts.append(i)
        i += 1
    if not sel_starts:
        return {}
    start = sel_starts[-1] + len("SELECT")
    # find matching FROM at depth 0 after start
    depth, quote = 0, None
    end = len(sql)
    i = start
    while i < len(sql):
        ch = sql[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and upper.startswith("FROM", i) and not (
                sql[i - 1].isalnum() or sql[i - 1] == "_"):
            end = i
            break
        i += 1
    cols = {}
    for entry in split_top_level(sql[start:end]):
        entry = entry.strip()
        if not entry:
            continue
        m = re.search(r"\s+AS\s+(\w+)\s*$", entry, re.IGNORECASE)
        if m:
            cols[m.group(1)] = entry[: m.start()].strip()
        else:
            cols[entry.split(".")[-1].strip()] = entry
    return cols


def all_alias_defs(sql: str) -> dict[str, list[str]]:
    """Every ``<expr> AS <name>`` in the SQL (any depth, all CTEs):
    name -> list of defining expressions.  An alias defined more than
    once (e.g. in two CTEs) must be safe under EVERY definition."""
    s = strip_comments(sql)
    defs: dict[str, list[str]] = {}
    for m in re.finditer(r"\s+AS\s+(\w+)", s, re.IGNORECASE):
        name = m.group(1)
        # walk backwards collecting a balanced expression: stop at a
        # same-level comma, an unmatched '(', or the SELECT keyword
        i = m.start() - 1
        depth = 0
        start = 0
        while i >= 0:
            ch = s[i]
            if ch == ")":
                depth += 1
            elif ch == "(":
                if depth == 0:
                    start = i + 1
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                start = i + 1
                break
            i -= 1
        expr = s[start:m.start()].strip()
        um = expr.upper()
        for kw in ("SELECT", "THEN", "ELSE", "WHEN"):
            p = um.rfind(kw + " ")
            if p >= 0 and (p == 0 or not (um[p - 1].isalnum()
                                          or um[p - 1] == "_")):
                expr = expr[p + len(kw):].strip()
                um = expr.upper()
        if expr:
            defs.setdefault(name, []).append(expr)
    return defs


#: order statistics / picks: preserve input values exactly — they add
#: no float operation of their own
_PASS_FUNCS = ("MIN", "MAX", "ARG_MAX", "ARG_MIN", "ANY_VALUE",
               "FIRST", "LAST", "FIRST_VALUE", "LAST_VALUE", "LAG",
               "LEAD", "MODE", "COALESCE", "NULLIF", "GREATEST",
               "LEAST")


def is_safe(expr: str, defs: dict[str, list[str]], depth: int = 0,
            visiting: frozenset = frozenset()) -> bool:
    """A double-valued expression is boundary-safe iff it is ROUNDed,
    integer by construction, an exact literal, or an exact PASSTHROUGH
    (order statistic / case-pick / plain reference) of safe inputs —
    raw parquet columns are safe (both engines read identical bits).
    ``visiting`` breaks self-referential aliases (``agg(value) AS
    value``: the inner name refers to the base/outer column)."""
    if depth > 6:
        return False
    e = expr.strip().rstrip(";").strip()
    e = re.sub(r"^DISTINCT\s+", "", e, flags=re.IGNORECASE)
    # strip a trailing OVER (...) window clause
    e = re.sub(r"\s+OVER\s*(\([^()]*(\([^()]*\))?[^()]*\)|\w+)\s*$", "",
               e, flags=re.IGNORECASE)
    u = e.upper()
    if re.match(r"^ROUND\s*\(", u):
        return True
    if re.match(r"^CAST\s*\(.*AS\s+(BIG|SMALL|TINY)?INT(EGER)?\s*\)$",
                u, re.DOTALL):
        return True
    if re.match(r"^(COUNT|ROW_NUMBER|RANK|DENSE_RANK)\s*\(", u):
        return True
    if re.match(r"^-?[0-9]+(\.[0-9]+)?$", u):
        return True  # literal: decimal->double is correctly rounded
    if re.match(r"^CAST\s*\(\s*-?[0-9]+(\.[0-9]+)?\s+AS\s+DOUBLE\s*\)$",
                u):
        return True
    m = re.match(r"^(\w+)\s*\((.*)\)$", e, re.DOTALL)
    if m and m.group(1).upper() in _PASS_FUNCS:
        inner = m.group(2)
        inner = re.sub(r"\s+IGNORE\s+NULLS\s*$", "", inner,
                       flags=re.IGNORECASE)
        args = split_top_level(inner)
        # only the VALUE argument matters for value provenance in the
        # two-arg pickers (arg_max(value, key)); order keys don't
        # enter the output — but checking all args is strictly safer
        # and they are usually safe refs anyway; check the first arg
        return is_safe(args[0], defs, depth + 1, visiting)
    if u.startswith("CASE") and u.endswith("END"):
        body = e[4:-3]
        picks = re.split(r"\bTHEN\b|\bELSE\b", body,
                         flags=re.IGNORECASE)[1:]
        outs = [split_top_level(p.strip(), " ")[0]
                if re.search(r"\bWHEN\b", p, re.IGNORECASE) is None
                else re.split(r"\bWHEN\b", p, flags=re.IGNORECASE)[0]
                for p in picks]
        return all(is_safe(o.strip(), defs, depth + 1, visiting)
                   for o in outs if o.strip())
    ref = re.match(r"^(\w+)\.(\w+)$", e) or re.match(r"^(\w+)$", e)
    if ref:
        name = ref.groups()[-1]
        if name in defs and name not in visiting:
            return all(
                is_safe(d, defs, depth + 1, visiting | {name})
                for d in defs[name])
        return True  # base parquet column: identical bits both engines
    return False


def rounded_or_integer(expr: str, defs: dict[str, list[str]]) -> bool:
    return is_safe(expr, defs)


def quantization_scales(sql: str):
    """(idiom, scale literal) pairs for ROUND(x * k [, 0]) and
    FLOOR(x / s + 0.5) quantizations."""
    out = []
    for m in re.finditer(
            r"ROUND\s*\([^()]*\*\s*([0-9]+(?:\.[0-9]+)?)\s*(?:,\s*0\s*)?\)",
            sql, re.IGNORECASE):
        out.append(("ROUND(x * k)", m.group(1)))
    for m in re.finditer(
            r"FLOOR\s*\([^()]*/\s*(?:CAST\s*\(\s*)?([0-9]+(?:\.[0-9]+)?)",
            sql, re.IGNORECASE):
        out.append(("FLOOR(x / s + 0.5)", m.group(1)))
    return out


def is_power_of_two(lit: str) -> bool:
    v = float(lit)
    if v <= 0:
        return False
    m, e = math.frexp(v)
    return m == 0.5


def run_audit(sf_dir: str):
    import duckdb

    from xcube_spark.queries import TABLES, load_all

    registry = load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    rows = []
    flagged = 0
    for name, q in registry.items():
        if not q.sql:
            rows.append((name, "-", "ROWS-ONLY", "no oracle SQL"))
            continue
        try:
            desc = con.execute(f"DESCRIBE {q.sql}").fetchall()
        except Exception as e:  # noqa: BLE001
            rows.append((name, "-", "FLAGGED", f"DESCRIBE failed: {e}"))
            flagged += 1
            continue
        sel = final_select_list(q.sql)
        defs = all_alias_defs(q.sql)
        for col, typ in ((d[0], d[1]) for d in desc):
            if not any(t in typ.upper() for t in FLOATY):
                continue
            expr = sel.get(col, "") or col  # SELECT * -> resolve alias
            if (name, col) in DOCUMENTED_MARGINS:
                rows.append((name, col, "DOCUMENTED",
                             DOCUMENTED_MARGINS[(name, col)]))
            elif rounded_or_integer(expr, defs):
                rows.append((name, col, "ROUNDED",
                             " ".join(expr.split())[:60]))
            else:
                rows.append((name, col, "FLAGGED",
                             f"un-rounded {typ}: "
                             f"{' '.join(expr.split())[:60]}"))
                flagged += 1
        for idiom, lit in quantization_scales(q.sql):
            if is_power_of_two(lit):
                rows.append((name, idiom, "POW2-SCALE", lit))
            elif (name, lit) in DOCUMENTED_SCALES:
                rows.append((name, idiom, "DOCUMENTED",
                             DOCUMENTED_SCALES[(name, lit)]))
            else:
                rows.append((name, idiom, "FLAGGED",
                             f"non-power-of-two scale {lit}"))
                flagged += 1
    return rows, flagged


def write_report(rows, flagged, path: str) -> None:
    lines = [
        "# Float-boundary audit of oracle outputs",
        "",
        "Generated by `scripts/audit_float_boundaries.py` "
        "(re-run any time; `tests/test_float_boundary_audit.py` "
        "enforces zero FLAGGED rows in CI).",
        "",
        "Contract: every FLOAT/DOUBLE oracle output is explicitly "
        "ROUNDed (<= 6 decimals, matching the driver comparator's "
        "float formatting), integer-valued by construction, or "
        "carries a documented margin; quantization scales are powers "
        "of two (the zarr-ingest margin pattern) or documented.",
        "",
        f"**Status: {flagged} flagged row(s).**",
        "",
        "| query | column / idiom | status | note |",
        "|---|---|---|---|",
    ]
    for name, col, status, note in rows:
        if status in ("ROUNDED", "POW2-SCALE"):
            continue  # keep the report readable: compliant rows elided
        lines.append(f"| {name} | {col} | {status} | {note} |")
    n_ok = sum(1 for r in rows if r[2] in ("ROUNDED", "POW2-SCALE"))
    lines.append("")
    lines.append(f"Elided {n_ok} compliant ROUNDED/POW2-SCALE rows; "
                 "ROWS-ONLY rows are queries with no SQL oracle "
                 "(weaker rows-only driver check by design).")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rows, flagged = run_audit(sf)
    write_report(rows, flagged, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "AUDIT_FLOAT_BOUNDARIES.md"))
    for name, col, status, note in rows:
        if status == "FLAGGED":
            print(f"FLAGGED {name}.{col}: {note}")
    print(f"{flagged} flagged")
    sys.exit(1 if flagged else 0)
