"""Property-based tests (hypothesis): anonymize_ip invariants and
as-of join vs pandas merge_asof as an independent oracle."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from http_log_anonymizer_spark.functions.anonymize import anonymize_ip_py

octet = st.integers(0, 255)


@given(octet, octet, octet, octet)
def test_valid_ipv4_always_masks_last_octet(a, b, c, d):
    assert anonymize_ip_py(f"{a}.{b}.{c}.{d}") == f"{a}.{b}.{c}.x"


@given(st.text(alphabet=st.characters(blacklist_characters="0123456789"), max_size=30))
def test_digitless_strings_pass_through(s):
    # no digits -> can't be IPv4; only hex-y strings could be IPv6
    if ":" not in s:
        assert anonymize_ip_py(s) == s


@given(st.ip_addresses(v=6))
def test_ipv6_always_canonical_with_suffix(ip):
    out = anonymize_ip_py(str(ip))
    assert out == f"{ip.compressed}:xxxx"


@given(st.ip_addresses(v=4))
def test_ipv4_output_never_contains_full_address(ip):
    out = anonymize_ip_py(str(ip))
    assert out.endswith(".x") and out.count(".") == 3


# ---------------------------------------------------------------------------
# as-of join vs pandas merge_asof (independent third implementation)
# ---------------------------------------------------------------------------


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized (fixed seed) equivalence against pandas merge_asof —
    an independent third implementation of backward-inclusive as-of
    semantics (hypothesis is deliberately not used with the Spark
    fixture: one session-bound example set, many rows, beats many tiny
    examples on both coverage and runtime)."""
    import random

    from http_log_anonymizer_spark.operators import asof_join

    rng = random.Random(42)
    left_rows = [(rng.randint(0, 5), rng.randint(0, 10_000)) for _ in range(500)]
    right_rows = {
        (k := rng.randint(0, 5), t := rng.randint(0, 10_000)): (k, t, rng.randint(0, 99))
        for _ in range(500)
    }
    right_rows = list(right_rows.values())  # unique (key, ts): latest row unambiguous

    from pyspark.sql import functions as F

    left = spark.createDataFrame(left_rows, ["k", "t"]).select(
        "k", F.timestamp_seconds("t").alias("lts")
    )
    right = spark.createDataFrame(right_rows, ["k", "t", "v"]).select(
        "k", F.timestamp_seconds("t").alias("rts"), "v"
    )
    got = (
        asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")
        .select("k", "lts", "v")
        .toPandas()
        .astype({"v": "float64"})
        .sort_values(["k", "lts", "v"])
        .reset_index(drop=True)
    )

    lp = pd.DataFrame(
        [(k, pd.Timestamp(t, unit="s")) for k, t in left_rows], columns=["k", "lts"]
    ).sort_values("lts", kind="stable")
    rp = pd.DataFrame(
        [(k, pd.Timestamp(t, unit="s"), v) for k, t, v in right_rows],
        columns=["k", "rts", "v"],
    ).sort_values("rts", kind="stable")
    want = (
        pd.merge_asof(lp, rp, left_on="lts", right_on="rts", by="k", direction="backward")
        .loc[:, ["k", "lts", "v"]]
        .astype({"v": "float64"})
        .sort_values(["k", "lts", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_asof_join_matched_row_null_is_not_backfilled(spark):
    """A NULL attribute on the MATCHED right row must surface as NULL —
    never be back-filled from an older right row (the failure mode of
    carrying each column through its own last(ignorenulls=True) window
    instead of one struct). DuckDB ASOF LEFT JOIN returns the matched
    row's NULL; so must we."""
    from pyspark.sql import functions as F

    from http_log_anonymizer_spark.operators import asof_join

    right = spark.createDataFrame(
        [(1, 10, 7, "old"), (1, 20, None, "new")],
        "k int, t int, v int, tag string",
    ).select("k", F.timestamp_seconds("t").alias("rts"), "v", "tag")
    left = spark.createDataFrame([(1, 30)], "k int, t int").select(
        "k", F.timestamp_seconds("t").alias("lts")
    )

    row = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts").collect()[0]
    assert row["tag"] == "new"
    assert row["v"] is None  # matched row's NULL, not 7 from the older row
    assert row["rts_right" if "rts_right" in row.asDict() else "rts"] is not None


# ---------------------------------------------------------------------------
# band_widths (plans/dedup.py) and the Misra-Gries reference fold
# ---------------------------------------------------------------------------


@given(st.integers(8, 62), st.integers(0, 7))
def test_band_widths_tile_losslessly(bits, hamming_max):
    from http_log_anonymizer_spark.plans.dedup import band_widths

    w = band_widths(bits, hamming_max)
    assert len(w) == hamming_max + 1  # pigeonhole minimum
    assert sum(w) == bits  # exact tiling, no bit unused/reused
    assert max(w) - min(w) <= 1  # near-equal: widest keys possible
    assert sorted(w, reverse=True) == list(w)


@given(
    st.lists(
        st.lists(st.integers(0, 25).map(lambda i: f"i{i}"), min_size=0, max_size=60),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 8),
)
@settings(max_examples=50)
def test_misra_gries_fold_invariants(batches, m):
    """The reference fold (the exact algorithm the streaming sink
    replays) must keep <= m counters, only underestimate, stay within
    the N/(m+1) error bound, and retain every true heavy hitter."""
    import collections

    from tests.test_streaming_frequent import _reference_fold

    state = _reference_fold(batches, m)
    exact = collections.Counter(i for b in batches for i in b)
    n = sum(exact.values())
    assert len(state) <= m
    for item, est in state.items():
        assert 0 < est <= exact[item]
        assert exact[item] - est <= n / (m + 1)
    for item, c in exact.items():
        if c > n / (m + 1):
            assert item in state


@given(st.integers(0, 2**45 - 1))
def test_hdr_bucket_bounds_relative_error(v):
    """streaming/quantiles.py + plans/analytics.py HDR bucketing: the
    bucket lower bound never exceeds the value, the bucket width obeys
    the 2^-m relative-error contract, and bucketing is monotone."""
    import math

    m = 3
    if v < (1 << m):
        lb = v
    else:
        s = int(math.floor(math.log2(v))) - m
        lb = (v >> s) << s
    assert lb <= v
    assert 8 * (v - lb) <= v + 8  # relative error <= 1/8 (+unit slack)
    # monotone: the next value's bucket is never smaller
    if v + 1 < (1 << m):
        nlb = v + 1
    else:
        s2 = int(math.floor(math.log2(v + 1))) - m
        nlb = ((v + 1) >> s2) << s2
    assert nlb >= lb
