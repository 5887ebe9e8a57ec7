"""Oracle-parity test over the whole registry: every query that declares
oracle SQL must match DuckDB at sf0.01 (same gate the driver runs);
queries without an oracle must at least execute and return a stable
schema."""

from __future__ import annotations

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_ORACLE
from tests.oracle import compare

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_ORACLE)
    ddf = duck.sql(q.oracle).df()
    ok, msg = compare(sdf, ddf)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_ORACLE)
    assert len(sdf.schema.fields) > 0
    assert sdf.count() >= 0


def test_compare_detects_differences(spark, duck):
    """Meta-test: the gate must actually fail on wrong results (guards
    against a vacuous comparator)."""
    q = REGISTRY["http_totals"]
    sdf = q.spark_fn(spark, SF_ORACLE).limit(5)  # wrong row count
    ok, msg = compare(sdf, duck.sql(q.oracle).df())
    assert not ok and "row count" in msg

    wrong_vals = duck.sql(q.oracle.replace("sum(bytes_sent)", "sum(bytes_sent) + 1")).df()
    ok, msg = compare(q.spark_fn(spark, SF_ORACLE), wrong_vals)
    assert not ok and "values differ" in msg


def test_readme_registry_count_matches_registry():
    """VERDICT r06 item 8: the README's registry count trailed reality
    two rounds running. Pin it to len(REGISTRY) so it can't drift
    silently — update README.md's "(N queries, N DuckDB" line when
    registering a new query."""
    import re
    from pathlib import Path

    readme = (Path(__file__).resolve().parent.parent / "README.md").read_text()
    m = re.search(r"\((\d+) queries, (\d+) DuckDB", readme)
    assert m, "README registry-count line not found"
    assert int(m.group(1)) == len(REGISTRY), (
        f"README says {m.group(1)} queries, registry has {len(REGISTRY)}"
    )
    assert int(m.group(2)) == len(REGISTRY)


def test_bench_core_set_is_registered_and_benched():
    """The frozen bench core-set (bench.py CORE_SET) must stay valid:
    every member registered and bench-flagged, so core_total is always
    computed over all 12."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import CORE_SET

    assert len(CORE_SET) == 12
    for n in CORE_SET:
        assert n in REGISTRY, n
        assert REGISTRY[n].bench, f"{n} lost its bench flag"
