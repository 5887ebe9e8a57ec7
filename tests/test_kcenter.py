"""Planted semantics for kcenter_coreset: the trajectory equals a
pure-Python greedy replay on a random table, duplicate points drive
the radius to exactly 0 with min-id tie-breaks, a table smaller than
k ends the trajectory early in BOTH engines, and the coverage radii
are non-increasing."""

from __future__ import annotations

import hashlib
import math
import random

import duckdb
import numpy as np

from http_log_anonymizer_spark.plans import REGISTRY
from tests.oracle import compare


def _write_embeddings(spark, tmp_path, rows):
    """rows: list of (vec_id, [float components])."""
    spark.createDataFrame(
        [(i, [float(np.float32(x)) for x in v], 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))


def _run(spark, tmp_path):
    q = REGISTRY["kcenter_coreset"]
    got = [tuple(r) for r in q.spark_fn(spark, str(tmp_path)).collect()]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{tmp_path}/embeddings.parquet/*.parquet'"
        )
        ok, msg = compare(q.spark_fn(spark, str(tmp_path)), con.execute(q.oracle).df())
        assert ok, msg
    finally:
        con.close()
    return got


def _python_greedy(rows, k=8):
    """Exact replay of the operator's contract: floor(float32->double
    * 1000) integer grid, md5-first seed, farthest-unselected greedy
    with min-id ties."""
    q = {
        i: np.array(
            [math.floor(float(np.float32(x)) * 1000.0) for x in v], dtype=np.int64
        )
        for i, v in rows
    }
    seed = min(q, key=lambda i: (hashlib.md5(f"kc|{i}".encode()).hexdigest()[:15], i))
    sel = [seed]
    out = [(0, seed, None)]
    for r in range(1, k + 1):
        rest = [i for i in q if i not in sel]
        if not rest:
            break
        best = max(
            rest,
            key=lambda i: (int(min(((q[i] - q[s]) ** 2).sum() for s in sel)), -i),
        )
        d = int(min(((q[best] - q[s]) ** 2).sum() for s in sel))
        out.append((r, best, d))
        if r < k:
            sel.append(best)
    return out


def test_trajectory_equals_python_replay(spark, tmp_path):
    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(30)]
    _write_embeddings(spark, tmp_path, rows)
    got = _run(spark, tmp_path)
    assert got == _python_greedy(rows)
    radii = [r for _, _, r in got[1:]]
    assert radii == sorted(radii, reverse=True)  # greedy radii never increase


def test_duplicate_points_reach_zero_radius_with_min_id_ties(spark, tmp_path):
    # 3 distinct locations, each duplicated 4 times: after the 3
    # locations are selected every remaining point is at distance 0,
    # so later steps pick the smallest unselected vec_id at radius 0
    locs = [[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]]
    rows = [(i, locs[i % 3]) for i in range(12)]
    _write_embeddings(spark, tmp_path, rows)
    got = _run(spark, tmp_path)
    assert got == _python_greedy(rows)
    zero_steps = [t for t in got if t[2] == 0]
    assert len(zero_steps) >= 6  # only 3 distinct locations exist
    zero_ids = [v for _, v, _ in zero_steps]
    assert zero_ids == sorted(zero_ids)  # min-id order among the ties


def test_table_smaller_than_k_ends_trajectory_early(spark, tmp_path):
    rows = [(i, [float(i), float(-i)]) for i in range(5)]
    _write_embeddings(spark, tmp_path, rows)
    got = _run(spark, tmp_path)
    assert len(got) == 5  # seed + the 4 remaining points, then it ends
    assert got == _python_greedy(rows)
    assert sorted(v for _, v, _ in got) == [0, 1, 2, 3, 4]


def test_greedy_is_a_two_approximation_property():
    """Gonzalez's guarantee: the greedy coverage radius is <= 2x the
    OPTIMAL k-center radius (exact on small instances by enumerating
    all center subsets). Uses the same integer-grid distances and the
    already-proven-equal pure-Python replay, so the guarantee
    transfers to the registered query verbatim."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.tuples(st.floats(-1, 1, width=32), st.floats(-1, 1, width=32)),
            min_size=5,
            max_size=9,
            unique=True,
        ),
        st.integers(min_value=2, max_value=3),
    )
    def prop(pts, k):
        rows = [(i, list(p)) for i, p in enumerate(pts)]
        q = {
            i: np.array(
                [math.floor(float(np.float32(x)) * 1000.0) for x in v],
                dtype=np.int64,
            )
            for i, v in rows
        }

        def radius(centers):
            return max(
                int(min(((q[i] - q[c]) ** 2).sum() for c in centers)) for i in q
            )

        traj = _python_greedy(rows, k=k)
        # greedy centers = steps 0..k-1; the step-k row IS the greedy
        # coverage radius (the farthest remaining point's distance)
        centers = [v for step, v, _ in traj[:k]]
        greedy_r2 = radius(centers)
        if len(traj) > k:
            assert traj[k][2] == greedy_r2  # the trajectory's own claim
        opt_r2 = min(
            radius(list(c)) for c in itertools.combinations(q, min(k, len(q)))
        )
        # squared distances: (2x radius)^2 = 4x radius^2
        assert greedy_r2 <= 4 * opt_r2

    prop()


def test_empty_table_emits_the_oracle_null_row(spark, tmp_path):
    # the oracle's step-0 scalar subquery over an empty table yields
    # (0, NULL, NULL); the Spark side must mirror it instead of
    # crashing on an empty seed collect
    _write_embeddings(spark, tmp_path, [])
    got = _run(spark, tmp_path)
    assert got == [(0, None, None)]
