"""Community modularity: the pooled row must be reproducible from the
per-community integer columns, and a planted two-community graph must
score high Q with the communities found exactly."""

from __future__ import annotations

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def report(spark):
    return REGISTRY["community_modularity_report"].spark_fn(spark, SF_SMOKE).collect()


def test_pooled_row_matches_member_rows(report):
    pooled = [r for r in report if r.community == -1]
    per = [r for r in report if r.community != -1]
    assert len(pooled) == 1
    p = pooled[0]
    # at sf0.001 the community count is below the top-K cutoff, so the
    # pooled sums must equal the member sums exactly
    if len(per) < 25:
        assert p.n_nodes == sum(r.n_nodes for r in per)
        assert p.internal_w == sum(r.internal_w for r in per)
        assert p.degree_w == sum(r.degree_w for r in per)
        want_q = sum(
            r.internal_w / p.w_total - (r.degree_w / p.w_total) ** 2 for r in per
        )
        assert abs(p.q_contrib - round(want_q, 6)) <= 2e-6


def test_degree_sums_to_total_weight(report):
    p = next(r for r in report if r.community == -1)
    # every edge's weight is counted once at its source in degree_w,
    # and the edge table is symmetric: sum(degree) == W
    assert p.degree_w == p.w_total
    assert -0.5 <= p.q_contrib <= 1.0


def test_planted_two_communities(spark, tmp_path):
    # two groups of 4 parts; orders co-purchase only within a group,
    # every within-group pair co-occurs in 2 orders (support >= 2)
    rows = []
    ok = 0
    for base in (100, 200):
        parts = [base + i for i in range(4)]
        for rep in range(2):
            for i, a in enumerate(parts):
                for b in parts[i + 1 :]:
                    ok += 1
                    rows.append((ok, a, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
                    rows.append((ok, b, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate date",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    rep = REGISTRY["community_modularity_report"].spark_fn(spark, str(tmp_path)).collect()
    per = [r for r in rep if r.community != -1]
    pooled = next(r for r in rep if r.community == -1)
    assert len(per) == 2 and {r.n_nodes for r in per} == {4}
    # perfectly separated equal halves: Q = 1 - 2*(1/2)^2 = 0.5
    assert abs(pooled.q_contrib - 0.5) < 1e-9
    assert all(r.internal_w == r.degree_w for r in per)  # no cross edges
