"""Documentation stays in sync with the registry — ``load_all()`` is
the single source of truth for the query count (three rounds of README
drift made this a test)."""

import re

from xcube_spark.queries import load_all


def test_readme_query_count_matches_registry():
    n = len(load_all())
    text = open("README.md").read()
    claimed = {int(m) for m in re.findall(r"(\d+) queries", text)}
    claimed |= {int(m) for m in
                re.findall(r"(\d+)/\1 pass", text)}
    assert claimed, "README no longer states a query count"
    assert claimed == {n}, (
        f"README claims {sorted(claimed)} queries but load_all() has "
        f"{n} — update README.md")


def test_every_query_has_oracle_and_matching_columns_promise():
    registry = load_all()
    missing = [name for name, q in registry.items() if not q.sql]
    assert missing == [], f"queries without DuckDB oracle: {missing}"
