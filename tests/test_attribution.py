"""Multi-touch attribution: credits must match a brute-force journey
replay, conservation must hold (every model's total credit equals
total attributed purchase value, linear up to per-touch truncation
dust), and the direct bucket must catch touchless conversions."""

from __future__ import annotations

from collections import defaultdict

import pytest

from http_log_anonymizer_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def report(spark):
    return REGISTRY["attribution_report"].spark_fn(spark, SF_SMOKE).collect()


@pytest.fixture(scope="module")
def journeys(spark):
    """list of (cents, [channels in order]) per conversion, brute force."""
    from http_log_anonymizer_spark.sources.batch import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type, r.value))
    out = []
    for rows in by_user.values():
        rows.sort(key=lambda x: (x[0], x[1]))
        touches: list[str] = []
        for _, _, etype, value in rows:
            if etype == "purchase":
                out.append((round(value * 100), list(touches)))
                touches = []
            else:
                touches.append(etype)
    return out


def test_credits_match_bruteforce(report, journeys):
    first = defaultdict(int)
    last = defaultdict(int)
    linear = defaultdict(int)
    ntouch = defaultdict(int)
    for cents, chans in journeys:
        if not chans:
            first["(direct)"] += cents
            last["(direct)"] += cents
            linear["(direct)"] += cents * 1000
            ntouch["(direct)"] += 1
            continue
        first[chans[0]] += cents
        last[chans[-1]] += cents
        for c in chans:
            linear[c] += cents * 1000 // len(chans)
            ntouch[c] += 1
    got = {r.channel: r for r in report}
    assert set(got) == set(first)
    for ch, r in got.items():
        assert r.first_touch_cents == first[ch], ch
        assert r.last_touch_cents == last[ch], ch
        assert r.linear_milli == linear[ch], ch
        assert r.n_touches == ntouch[ch], ch


def test_conservation(report, journeys):
    total = sum(c for c, ch in journeys)
    assert sum(r.first_touch_cents for r in report) == total
    assert sum(r.last_touch_cents for r in report) == total
    lin = sum(r.linear_milli for r in report)
    dust_bound = sum(len(ch) for _, ch in journeys if ch)
    assert total * 1000 - dust_bound <= lin <= total * 1000


def test_channels_are_event_types(report):
    assert {r.channel for r in report} <= {
        "click", "view", "signup", "error", "(direct)"
    }
