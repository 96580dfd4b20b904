"""SCD Type-2 merge semantics (operators/scd.py).

Every merge path on a handcrafted dimension, plus the invariants a
history table must keep (non-overlapping contiguous intervals, one open
row per live key, idempotent re-merge) and the plan shape (one
full-outer key join, no cartesian)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_foundations_spark.operators.scd import scd2_merge

TS = dt.datetime


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, a string, b long, valid_from timestamp, "
              "valid_to timestamp")


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b long, "
                                       "eff timestamp")


def _merge(dim, upd):
    return scd2_merge(dim, upd, key="k", tracked=["a", "b"])


def test_all_merge_paths(spark):
    dim = _dim(spark, [
        # k=1: closed history row + open row that will CHANGE
        (1, "old", 1, TS(2020, 1, 1), TS(2021, 1, 1)),
        (1, "cur", 1, TS(2021, 1, 1), None),
        # k=2: open row receiving a NO-OP update
        (2, "same", 2, TS(2020, 6, 1), None),
        # k=3: open row with no update at all
        (3, "idle", 3, TS(2019, 1, 1), None),
    ])
    upd = _upd(spark, [
        (1, "new", 1, TS(2022, 3, 1)),   # tracked col a changes
        (2, "same", 2, TS(2022, 3, 1)),  # no-op
        (4, "born", 4, TS(2022, 3, 1)),  # unseen key
    ])
    got = {(r.k, r.a, r.b, r.valid_from, r.valid_to)
           for r in _merge(dim, upd).collect()}
    assert got == {
        (1, "old", 1, TS(2020, 1, 1), TS(2021, 1, 1)),   # closed untouched
        (1, "cur", 1, TS(2021, 1, 1), TS(2022, 3, 1)),   # closed at eff
        (1, "new", 1, TS(2022, 3, 1), None),             # new open
        (2, "same", 2, TS(2020, 6, 1), None),            # no-op survives
        (3, "idle", 3, TS(2019, 1, 1), None),            # untouched open
        (4, "born", 4, TS(2022, 3, 1), None),            # first open row
    }


def test_null_safe_change_detection(spark):
    """NULL -> value and value -> NULL are real changes; NULL -> NULL
    is not (eqNullSafe, mirroring the oracle's IS DISTINCT FROM)."""
    dim = _dim(spark, [(1, None, 1, TS(2020, 1, 1), None),
                       (2, "x", None, TS(2020, 1, 1), None),
                       (3, None, 3, TS(2020, 1, 1), None)])
    upd = _upd(spark, [(1, "v", 1, TS(2021, 1, 1)),    # NULL -> v: change
                       (2, "x", 9, TS(2021, 1, 1)),    # NULL -> 9: change
                       (3, None, 3, TS(2021, 1, 1))])  # NULL -> NULL: no-op
    out = _merge(dim, upd)
    assert out.filter(F.col("valid_to").isNotNull()).count() == 2
    assert out.filter(F.col("valid_to").isNull()).count() == 3


def test_remerge_is_idempotent(spark):
    dim = _dim(spark, [(1, "a", 1, TS(2020, 1, 1), None),
                       (2, "b", 2, TS(2020, 1, 1), None)])
    upd = _upd(spark, [(1, "z", 1, TS(2021, 1, 1)),
                       (3, "c", 3, TS(2021, 1, 1))])
    once = _merge(dim, upd)
    twice = _merge(once, upd)
    key = lambda r: (r.k, r.a, r.b, r.valid_from, r.valid_to)  # noqa: E731
    assert sorted(map(key, once.collect())) == \
           sorted(map(key, twice.collect()))


def test_history_invariants_on_real_data(spark, sf_dir):
    """On the registered x75 output: per key, intervals are disjoint
    and contiguous (each valid_to equals the next valid_from), exactly
    one open row per key, and open rows are the latest."""
    from data_pipeline_foundations_spark.registry import all_queries

    df = all_queries()["x75_scd2_customer_history"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.custkey, []).append(r)
    for k, hist in by_key.items():
        hist.sort(key=lambda r: r.valid_from)
        opens = [r for r in hist if r.valid_to is None]
        assert len(opens) == 1 and opens[0] is hist[-1], k
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from, k
        # consecutive rows always differ in a tracked attribute —
        # no-op updates never split an interval
        for a, b in zip(hist, hist[1:]):
            assert (a.order_status, a.order_priority) != \
                   (b.order_status, b.order_priority), k


def test_merge_plan_is_one_key_join(spark):
    dim = _dim(spark, [(1, "a", 1, TS(2020, 1, 1), None)])
    upd = _upd(spark, [(1, "z", 1, TS(2021, 1, 1))])
    plan = _merge(dim, upd)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join FullOuter") == 1
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def _ev(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b long, "
                                       "eff timestamp, seq long")


def test_event_log_build_equals_iterated_apply(spark):
    """Associativity pin: scd2_from_events over the whole log ==
    folding scd2_apply_log over ANY time-ordered batching — including
    batches with several events per key, no-op events, and keys born
    mid-stream."""
    from data_pipeline_foundations_spark.operators.scd import (
        scd2_apply_log, scd2_from_events,
    )
    rows = [
        (1, "a", 1, TS(2020, 1, 1), 1),
        (1, "a", 1, TS(2020, 2, 1), 2),   # no-op event
        (1, "b", 1, TS(2020, 3, 1), 3),
        (1, "b", 2, TS(2020, 3, 1), 4),   # same-ts change, seq-ordered
        (2, "x", 9, TS(2020, 6, 1), 5),
        (1, "a", 1, TS(2021, 1, 1), 6),   # back to an earlier value
        (2, "x", 9, TS(2021, 2, 1), 7),   # no-op
        (3, "n", 0, TS(2021, 3, 1), 8),   # key born in the last batch
    ]
    whole = scd2_from_events(_ev(spark, rows), key="k",
                             tracked=["a", "b"])
    for cut1, cut2 in [(4, 5), (1, 5), (4, 7), (2, 4)]:
        acc = scd2_from_events(_ev(spark, rows[:cut1]), key="k",
                               tracked=["a", "b"])
        for lo, hi in [(cut1, cut2), (cut2, len(rows))]:
            acc = scd2_apply_log(acc, _ev(spark, rows[lo:hi]),
                                 key="k", tracked=["a", "b"])
        key = lambda r: (r.k, r.valid_from, r.a, r.b,  # noqa: E731
                         r.valid_to)
        assert sorted(map(key, acc.collect())) == \
               sorted(map(key, whole.collect())), (cut1, cut2)


def test_event_log_plan_is_one_exchange(spark):
    """x76's scale contract: compression lag and interval-closing lead
    share ONE key exchange and one sort (same partitioning + sort key,
    filter preserves order)."""
    from data_pipeline_foundations_spark.operators.scd import (
        scd2_from_events,
    )
    ev = _ev(spark, [(1, "a", 1, TS(2020, 1, 1), 1)])
    df = scd2_from_events(ev, key="k", tracked=["a", "b"])
    df.collect()
    plan = (df._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])  # AQE echoes the pre-plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort [") == 1, plan


def test_as_of_read_picks_covering_interval(spark):
    from data_pipeline_foundations_spark.operators.scd import scd2_as_of
    dim = _dim(spark, [
        (1, "a", 1, TS(2020, 1, 1), TS(2021, 1, 1)),
        (1, "b", 1, TS(2021, 1, 1), None),
        (2, "x", 2, TS(2022, 1, 1), None),
    ])
    got = {(r.k, r.a) for r in scd2_as_of(dim, TS(2020, 6, 1)).collect()}
    assert got == {(1, "a")}  # k=2 not born yet
    got = {(r.k, r.a) for r in scd2_as_of(dim, TS(2022, 6, 1)).collect()}
    assert got == {(1, "b"), (2, "x")}
    # boundary: at exactly valid_to the NEXT interval owns the instant
    got = {(r.k, r.a) for r in scd2_as_of(dim, TS(2021, 1, 1)).collect()}
    assert got == {(1, "b")}


def test_point_in_time_join_exactly_one_interval_per_fact(spark, sf_dir):
    """x77's invariant: an inner PIT join returns exactly |facts| rows
    (every fact covered by exactly one interval) and the plan is a hash
    join, never a nested loop."""
    from data_pipeline_foundations_spark.registry import all_queries
    from data_pipeline_foundations_spark.tables import load

    df = all_queries()["x77_point_in_time_join"].fn(spark, sf_dir)
    n_orders = load(spark, sf_dir, "orders").count()
    assert df.count() == n_orders
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan


def test_merge_equals_apply_log_on_single_update_batches(spark):
    """Consistency across the two merge formulations: for a batch with
    at most one update per key (scd2_merge's contract), the full-outer
    join + explode path and the event-stitch + run-compression path
    produce the same history — so a caller can switch from daily-batch
    merging to event-log application without a backfill."""
    from data_pipeline_foundations_spark.operators.scd import (
        scd2_apply_log,
    )
    dim = _dim(spark, [
        (1, "old", 1, TS(2020, 1, 1), TS(2021, 1, 1)),  # closed
        (1, "cur", 1, TS(2021, 1, 1), None),            # will change
        (2, "same", 2, TS(2020, 6, 1), None),           # no-op update
        (3, "idle", 3, TS(2019, 1, 1), None),           # no update
    ])
    upd = _upd(spark, [(1, "new", 1, TS(2022, 3, 1)),
                       (2, "same", 2, TS(2022, 3, 1)),
                       (4, "born", 4, TS(2022, 3, 1))])
    via_merge = _merge(dim, upd)
    via_log = scd2_apply_log(
        dim, upd.withColumn("seq", F.lit(0)), key="k",
        tracked=["a", "b"])
    key = lambda r: (r.k, r.valid_from, r.a, r.b,  # noqa: E731
                     r.valid_to)
    assert sorted(map(key, via_merge.collect())) == \
           sorted(map(key, via_log.collect()))
