"""Property-based tests for the SCD2 family (operators/scd.py).

A pure-Python reference implementation (per-key sequential fold — the
semantics a human would write imperatively) is compared against
scd2_from_events over hypothesis-generated adversarial logs: same-ts
collisions, null attribute values, single-event keys, long no-op runs.
A second property re-checks batching associativity (scd2_apply_log) at
random cut points, which the unit test only samples at fixed cuts.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_foundations_spark.operators.scd import (
    scd2_apply_log, scd2_from_events,
)

BASE = dt.datetime(2024, 1, 1)

# coarse grids: same-ts ties and equal-attribute runs must be common
_key = st.integers(min_value=0, max_value=2)
_ts = st.integers(min_value=0, max_value=8).map(
    lambda d: BASE + dt.timedelta(days=d))
_attr = st.one_of(st.none(), st.sampled_from(["a", "b"]))
_rows = st.lists(st.tuples(_key, _attr, _ts), min_size=1, max_size=14)


def _spark():
    from data_pipeline_foundations_spark.session import get_spark
    return get_spark("tests", shuffle_partitions=8)


def _events(spark, rows):
    # seq = list position: the deterministic same-ts tiebreak
    return spark.createDataFrame(
        [(k, a, ts, i) for i, (k, a, ts) in enumerate(rows)],
        "k long, a string, eff timestamp, seq long")


def _reference(rows):
    """Sequential per-key fold: keep an event iff its attributes differ
    from the previously kept ones; close each kept interval at the next
    kept event's time."""
    by_key: dict[int, list] = {}
    for i, (k, a, ts) in enumerate(rows):
        by_key.setdefault(k, []).append((ts, i, a))
    out = []
    for k, evs in by_key.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        kept: list[tuple] = []
        last = object()  # sentinel: != anything including None
        for ts, _i, a in evs:
            if a != last:
                kept.append((ts, a))
                last = a
        for (ts, a), nxt in zip(kept, kept[1:] + [None]):
            out.append((k, a, ts, nxt[0] if nxt else None))
    return sorted(out, key=lambda r: (r[0], r[2], r[1] or ""))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_rows)
def test_event_log_build_matches_sequential_fold(rows):
    spark = _spark()
    got = sorted(((r.k, r.a, r.valid_from, r.valid_to)
                  for r in scd2_from_events(
                      _events(spark, rows), key="k",
                      tracked=["a"]).collect()),
                 key=lambda r: (r[0], r[2], r[1] or ""))
    assert got == _reference(rows)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(_key, _attr, st.integers(0, 8)),
                     min_size=2, max_size=14),
       data=st.data())
def test_apply_log_associative_at_random_cut(rows, data):
    """Any time-ordered split: build(prefix) then apply(suffix) ==
    build(whole). Events are sorted by day first so every batch
    boundary respects the monotone precondition."""
    spark = _spark()
    rows = [(k, a, BASE + dt.timedelta(days=d))
            for k, a, d in sorted(rows, key=lambda r: r[2])]
    cut = data.draw(st.integers(min_value=1, max_value=len(rows) - 1))
    whole = scd2_from_events(_events(spark, rows), key="k",
                             tracked=["a"])
    # suffix events keep their ORIGINAL list positions as seq so the
    # same-ts tiebreak agrees between the two formulations
    sfx = spark.createDataFrame(
        [(k, a, ts, i) for i, (k, a, ts) in enumerate(rows)][cut:],
        "k long, a string, eff timestamp, seq long")
    acc = scd2_apply_log(
        scd2_from_events(_events(spark, rows[:cut]), key="k",
                         tracked=["a"]),
        sfx, key="k", tracked=["a"])
    key = lambda r: (r.k, r.valid_from, r.a or "", str(r.valid_to))  # noqa: E731
    assert sorted(map(key, acc.collect())) == \
           sorted(map(key, whole.collect()))
