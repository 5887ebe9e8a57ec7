"""Planted-corpus semantics tests for the round-6 report operators
(classifier AUC, chi-squared independence, phrase search, edit-distance
join, source divergence, revenue concentration). The parity suite only
proves Spark and DuckDB agree on the synthetic corpus; these pin that
what they agree ON is the intended statistic — including the edge cases
the synthetic corpus never exercises (perfect separation, exact
independence, overlapping phrase matches, degenerate attributes).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare


def _write_docs(spark, tmp_path, docs):
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _oracle_agrees(spark, tmp_path, name, tables=("documents",)):
    q = REGISTRY[name]
    con = duckdb.connect()
    try:
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{tmp_path}/{t}.parquet/*.parquet'"
            )
        duck = con.execute(q.oracle).df()
        ok, msg = compare(q.spark_fn(spark, str(tmp_path)), duck)
        assert ok, f"{name}: {msg}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# classifier_auc_report
# ---------------------------------------------------------------------------

# 'slow' is blocklisted (label 0) but NOT a model stopword, so label and
# score can be steered independently.
_DIVERSE = " ".join(f"w{i}" for i in range(30))  # high uniq ratio -> high score
_REPET = "slow " * 30  # one distinct token -> low score


def test_auc_perfect_separation(spark, tmp_path):
    # positives (clean) all score HIGHER than negatives (blocklisted)
    docs = [(_DIVERSE, "s")] * 3 + [(_REPET.strip(), "s")] * 5
    _write_docs(spark, tmp_path, docs)
    rows = {
        r.cohort: r
        for r in REGISTRY["classifier_auc_report"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["ALL"].n_pos == 3 and rows["ALL"].n_neg == 5
    assert rows["ALL"].auc == 1.0
    assert rows["ALL"].recall_05 == 1.0  # diverse docs clear the 0.5 cut
    _oracle_agrees(spark, tmp_path, "classifier_auc_report")


def test_auc_reversed_and_tied(spark, tmp_path):
    # reversed: positives score LOWER than negatives -> AUC 0
    pos_low = "x " * 25  # repetitive clean doc -> low score
    neg_high = " ".join(f"y{i}" for i in range(29)) + " slow"  # diverse + block
    _write_docs(spark, tmp_path, [(pos_low.strip(), "s")] * 2 + [(neg_high, "s")] * 4)
    rows = {
        r.cohort: r
        for r in REGISTRY["classifier_auc_report"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["ALL"].auc == 0.0

    # tie: same (n_toks, uniq_ratio, stop_ratio) features either side of
    # the label -> every comparison is a tie -> AUC exactly 0.5
    pos_tie = " ".join(f"p{i}" for i in range(10))
    neg_tie = " ".join(f"q{i}" for i in range(9)) + " slow"
    _write_docs(spark, tmp_path, [(pos_tie, "s")] * 3 + [(neg_tie, "s")] * 3)
    rows = {
        r.cohort: r
        for r in REGISTRY["classifier_auc_report"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["ALL"].auc == 0.5


# ---------------------------------------------------------------------------
# chi_square_report
# ---------------------------------------------------------------------------


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        [
            (i, ts, 1, et, 1.0, "{}")
            for i, (ts, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_chi2_exact_independence_is_zero(spark, tmp_path):
    # counts exactly proportional across hours -> chi2 == 0 for the hour
    # test; single-day corpus -> day attrs are degenerate (dof 0,
    # cramers_v NULL), exercising the guard the synthetic corpus misses.
    base = dt.datetime(2024, 1, 1)
    rows = []
    for hour, mult in ((1, 1), (2, 2)):  # hour 2 has 2x the traffic
        for et, n in (("a", 10), ("b", 20)):
            rows += [(base.replace(hour=hour), et)] * (n * mult)
    _write_events(spark, tmp_path, rows)
    out = {
        r.attr_b: r
        for r in REGISTRY["chi_square_report"].spark_fn(spark, str(tmp_path)).collect()
    }
    assert out["hour_of_day"].chi2 == 0.0
    assert out["hour_of_day"].dof == 1
    assert out["day_of_week"].dof == 0
    assert out["day_of_week"].cramers_v is None
    _oracle_agrees(spark, tmp_path, "chi_square_report", tables=("events",))


def test_chi2_perfect_dependence(spark, tmp_path):
    # type 'a' only in hour 1, 'b' only in hour 2 -> chi2 = N, V = 1
    base = dt.datetime(2024, 1, 1)
    rows = [(base.replace(hour=1), "a")] * 15 + [(base.replace(hour=2), "b")] * 25
    _write_events(spark, tmp_path, rows)
    out = {
        r.attr_b: r
        for r in REGISTRY["chi_square_report"].spark_fn(spark, str(tmp_path)).collect()
    }
    assert out["hour_of_day"].n == 40
    assert abs(out["hour_of_day"].chi2 - 40.0) < 0.01  # 1e-4-grid floor
    assert abs(out["hour_of_day"].cramers_v - 1.0) < 0.01


# ---------------------------------------------------------------------------
# phrase_search_report
# ---------------------------------------------------------------------------


def test_phrase_overlaps_and_zero_row(spark, tmp_path):
    docs = [
        ("order order order", "s"),  # overlapping: 2 matches of 'order order'
        ("window join window join", "s"),  # 2 non-overlapping matches
        ("agg part filter agg part", "s"),  # 1 match of the 3-term phrase
    ]
    _write_docs(spark, tmp_path, docs)
    out = {
        r.phrase: r
        for r in REGISTRY["phrase_search_report"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert out["order order"].n_occurrences == 2
    assert out["order order"].n_docs == 1
    assert out["order order"].max_per_doc == 2
    assert out["window join"].n_occurrences == 2
    assert out["agg part filter"].n_occurrences == 1
    z = out["slow merge scan"]
    assert (z.n_docs, z.n_occurrences, z.max_per_doc) == (0, 0, 0)
    _oracle_agrees(spark, tmp_path, "phrase_search_report")


# ---------------------------------------------------------------------------
# fuzzy_editdist_join
# ---------------------------------------------------------------------------


def test_editdist_pairs_exact_set(spark, tmp_path):
    names = [
        "widget",   # ed(widget, widgey) = 1; ed(widget, gadget) = 2
        "widgey",
        "gadget",
        "sprocket",  # >= 3 from everything -> excluded
        "xanchor",  # first-char substitution: ed(xanchor, yanchor) = 1 —
        "yanchor",  # catches a first-char-blocking scheme (prefix filter must not miss it)
        "bolt",     # ed(bolt, bolts) = 1 (length differs)
        "bolts",
    ]
    spark.createDataFrame(
        [(i, n, "B", "T", 1, 1.0) for i, n in enumerate(names)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    got = {
        (r.name_a, r.name_b): r.ed
        for r in REGISTRY["fuzzy_editdist_join"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        ("widget", "widgey"): 1,
        ("gadget", "widget"): 2,
        ("xanchor", "yanchor"): 1,
        ("bolt", "bolts"): 1,
    }
    _oracle_agrees(spark, tmp_path, "fuzzy_editdist_join", tables=("part",))


# ---------------------------------------------------------------------------
# source_divergence_report
# ---------------------------------------------------------------------------


def test_divergence_single_source_is_zero(spark, tmp_path):
    _write_docs(spark, tmp_path, [("a b c", "only"), ("a b", "only")])
    row = REGISTRY["source_divergence_report"].spark_fn(
        spark, str(tmp_path)
    ).collect()[0]
    assert row.covered_mass == 1.0
    assert row.kl_div == 0.0
    assert row.js_div == 0.0


def test_divergence_disjoint_sources_match_reference(spark, tmp_path):
    # two sources with disjoint vocabularies and equal mass; compare
    # against a direct python evaluation of the same definitions
    _write_docs(
        spark,
        tmp_path,
        [("a a b c", "s1"), ("x x y z", "s2")],
    )
    rows = {
        r.source: r
        for r in REGISTRY["source_divergence_report"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }

    def ref(src_counts, corpus_counts):
        ns = sum(src_counts.values())
        n = sum(corpus_counts.values())
        kl = js = covered = 0.0
        for t, c in src_counts.items():
            ps, pc = c / ns, corpus_counts[t] / n
            covered += pc
            kl += ps * math.log(ps / pc)
            js += 0.5 * (
                ps * math.log(2 * ps / (ps + pc))
                + pc * math.log(2 * pc / (ps + pc))
            )
        js += 0.5 * math.log(2) * (1 - covered)
        return round(kl, 4), round(js, 4), round(covered, 4)

    corpus = {"a": 2, "b": 1, "c": 1, "x": 2, "y": 1, "z": 1}
    for src, counts in (
        ("s1", {"a": 2, "b": 1, "c": 1}),
        ("s2", {"x": 2, "y": 1, "z": 1}),
    ):
        kl, js, cov = ref(counts, corpus)
        assert rows[src].kl_div == kl
        assert rows[src].js_div == js
        assert rows[src].covered_mass == cov
    _oracle_agrees(spark, tmp_path, "source_divergence_report")


# ---------------------------------------------------------------------------
# revenue_concentration_report
# ---------------------------------------------------------------------------


def test_concentration_one_whale(spark, tmp_path):
    # 9 customers spend $1; 1 whale spends $10,000 -> near-total
    # concentration; expected numbers from a python replay of the
    # bucket-granular definitions
    orders = []
    for c in range(9):
        orders.append((c, c, "F", 1.0, dt.datetime(2024, 1, 1), "1-URGENT"))
    orders.append((9, 9, "F", 10_000.0, dt.datetime(2024, 1, 1), "1-URGENT"))
    spark.createDataFrame(
        [(i, *o[1:]) for i, o in enumerate(orders)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(c, f"c{c}", 0, 0.0, "SEG") for c in range(10)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    rows = {
        r.cohort: r
        for r in REGISTRY["revenue_concentration_report"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    all_row = rows["ALL"]
    assert all_row.n_customers == 10
    assert all_row.total_revenue == 10_009.0
    # whale bucket: 9 customers at 100 cents -> bucket 0; whale alone at top
    # gini = 1 - [9*(2*0+900) + 1*(2*900+1000000)] / (10 * 1000900)
    expected_gini = round(1 - (9 * 900 + (1800 + 1_000_000)) / (10 * 1_000_900), 4)
    assert all_row.gini == expected_gini
    assert all_row.n_top1 == 1 and all_row.n_top10 == 1
    assert all_row.top1_share == round(1_000_000 / 1_000_900, 4)
    assert rows["SEG"].gini == all_row.gini  # single segment mirrors ALL
    _oracle_agrees(
        spark, tmp_path, "revenue_concentration_report", tables=("orders", "customer")
    )


# ---------------------------------------------------------------------------
# event_path_trigrams
# ---------------------------------------------------------------------------


def test_event_paths_respect_session_boundaries(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # session 1: a -> b -> c -> d (paths a>b>c, b>c>d)
        (base, "a"),
        (base + dt.timedelta(minutes=1), "b"),
        (base + dt.timedelta(minutes=2), "c"),
        (base + dt.timedelta(minutes=3), "d"),
        # 31-minute gap -> new session: e -> f -> g (path e>f>g); no
        # path may bridge d into e
        (base + dt.timedelta(minutes=34), "e"),
        (base + dt.timedelta(minutes=35), "f"),
        (base + dt.timedelta(minutes=36), "g"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r.path: (r.n_occurrences, r.n_users)
        for r in REGISTRY["event_path_trigrams"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {"a>b>c": (1, 1), "b>c>d": (1, 1), "e>f>g": (1, 1)}
    _oracle_agrees(spark, tmp_path, "event_path_trigrams", tables=("events",))


# ---------------------------------------------------------------------------
# token_pmi_report
# ---------------------------------------------------------------------------


def test_pmi_perfect_collocation_ranks_first(spark, tmp_path):
    # 'x y' always adjacent; filler order is permuted per doc, so every
    # filler bigram stays under the min-count filter and only the true
    # collocation survives. Expected PMI from a direct evaluation.
    perms = ["a b c d", "b a d c", "c d a b", "d c b a", "a c b d", "b d a c"]
    _write_docs(spark, tmp_path, [(f"x y {p}", "s") for p in perms])
    rows = REGISTRY["token_pmi_report"].spark_fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1  # only (x, y) reaches the min count
    top = rows[0]
    assert (top.w1, top.w2) == ("x", "y")
    assert top.n_pair == 6
    n, b = 36, 30  # 6 docs * 6 tokens; 6 docs * 5 bigrams
    expected = round(math.log(6 * n * n / (b * 6 * 6)), 4)
    assert top.pmi == expected
    _oracle_agrees(spark, tmp_path, "token_pmi_report")


# ---------------------------------------------------------------------------
# Plan guard: broadcast discipline for the new operators at big-series
# scale (the test_chunk_type_tables_never_static_broadcast pattern)
# ---------------------------------------------------------------------------


def test_editdist_broadcasts_gram_vocab_not_name_grams(spark):
    """fuzzy_editdist_join's only legal broadcast is the gram-FREQUENCY
    table (bounded by |charset|^q); the name-gram table grows with
    distinct names and must never be the build side. Planned (not
    executed) against the biggest series on disk."""
    import os

    for d in ("/root/repo/.benchdata/sf100", "/root/repo/.benchdata/sf10"):
        if os.path.exists(os.path.join(d, "_DONE")):
            break
    else:
        d = "/root/testdata/sf0.01"
    plan = (
        REGISTRY["fuzzy_editdist_join"]
        .spark_fn(spark, d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every BroadcastExchange subtree must be the freq aggregate (keyed
    # on g with a count), never the gram GENERATION (explode/transform
    # over names)
    lines = plan.splitlines()
    for i, l in enumerate(lines):
        if "BroadcastExchange" not in l:
            continue
        indent = len(l) - len(l.lstrip())
        subtree = []
        for nxt in lines[i + 1 :]:
            if nxt.strip() and (len(nxt) - len(nxt.lstrip())) <= indent:
                break
            subtree.append(nxt)
        sub = "\n".join(subtree)
        assert "Generate explode" not in sub, f"name-gram side broadcast:\n{sub}"
