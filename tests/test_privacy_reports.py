"""Invariant checks for the privacy-audit trio's newest member
(t_closeness_report): bucket indices in range, per-stage row mass
sums to 1, the reported max TVD lies inside its bucket, and
anonymization does not worsen the release's t on this corpus (coarser
QI classes blend toward the global mixture)."""

from __future__ import annotations

from http_log_anonymizer_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_t_closeness_invariants(spark):
    rows = REGISTRY["t_closeness_report"].spark_fn(spark, SF).collect()
    assert rows, "empty report"
    stages = {r.stage for r in rows}
    assert stages == {"raw", "anon"}
    for st in stages:
        sub = [r for r in rows if r.stage == st]
        assert abs(sum(r.pct_rows for r in sub) - 1.0) < 1e-3
        for r in sub:
            assert 0 <= r.tvd_bucket <= 9
            # max TVD must lie inside its bucket (cap bucket 9 is open)
            assert r.max_tvd_in_bucket >= r.tvd_bucket / 10 - 1e-9
            if r.tvd_bucket < 9:
                assert r.max_tvd_in_bucket < (r.tvd_bucket + 1) / 10 + 1e-9
            assert r.n_classes >= 1 and r.n_rows >= r.n_classes
    # the release's t per stage = max TVD over all buckets
    t_raw = max(r.max_tvd_in_bucket for r in rows if r.stage == "raw")
    t_anon = max(r.max_tvd_in_bucket for r in rows if r.stage == "anon")
    assert t_anon <= t_raw + 1e-9
