"""asof_join / range_join unit behavior + plan-shape pins.

Differential coverage (vs DuckDB ASOF JOIN / inequality join) lives in
the x16/x17 oracle rows; these tests pin the operator semantics on
hand-built frames — boundary inclusion, direction, tolerance, unmatched
rows — and the plan shapes that make them scale.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_pipeline_foundations_spark.operators.temporal import (
    asof_join, range_join,
)

T = dt.datetime


def _left(spark):
    return spark.createDataFrame(
        [(1, T(2024, 1, 1, 10), "l1"), (1, T(2024, 1, 1, 12), "l2"),
         (2, T(2024, 1, 1, 11), "l3"), (3, T(2024, 1, 1, 9), "l4")],
        "k long, ts timestamp, tag string")


def _right(spark):
    return spark.createDataFrame(
        [(1, T(2024, 1, 1, 9), 10.0), (1, T(2024, 1, 1, 11), 20.0),
         (2, T(2024, 1, 1, 11), 30.0),          # equal ts → matches
         (9, T(2024, 1, 1, 8), 99.0)],          # key absent from left
        "k long, ts timestamp, v double")


def test_asof_backward(spark):
    out = {r.tag: (r.r_v, r.r_ts)
           for r in asof_join(_left(spark), _right(spark), on="k").collect()}
    assert out["l1"] == (10.0, T(2024, 1, 1, 9))    # 11:00 row is later
    assert out["l2"] == (20.0, T(2024, 1, 1, 11))   # latest prior wins
    assert out["l3"] == (30.0, T(2024, 1, 1, 11))   # equal ts matches (<=)
    assert out["l4"] == (None, None)                # key 3: no right rows


def test_asof_forward(spark):
    out = {r.tag: r.r_v for r in
           asof_join(_left(spark), _right(spark), on="k",
                     direction="forward").collect()}
    assert out["l1"] == 20.0     # earliest right at/after 10:00
    assert out["l2"] is None     # nothing at/after 12:00
    assert out["l3"] == 30.0     # equal ts matches (>=)


def test_asof_tolerance(spark):
    out = {r.tag: r.r_v for r in
           asof_join(_left(spark), _right(spark), on="k",
                     tolerance=dt.timedelta(minutes=90)).collect()}
    assert out["l1"] == 10.0     # 1 h gap within tolerance
    assert out["l2"] == 20.0     # 1 h gap
    out2 = {r.tag: r.r_v for r in
            asof_join(_left(spark), _right(spark), on="k",
                      tolerance=dt.timedelta(minutes=30)).collect()}
    assert out2["l1"] is None    # 1 h gap exceeds 30 min
    assert out2["l3"] == 30.0    # 0 gap


def test_asof_null_right_attribute_still_matches(spark):
    """A right row whose attribute is NULL is still the match — the
    struct carry must not skip past it to an older row."""
    left = spark.createDataFrame([(1, T(2024, 1, 2))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 1), 5.0), (1, T(2024, 1, 1, 2), None)],
        "k long, ts timestamp, v double")
    [r] = asof_join(left, right, on="k").collect()
    assert r.r_ts == T(2024, 1, 1, 2) and r.r_v is None


def test_asof_rejects_bad_direction_and_collisions(spark):
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(_left(spark), _right(spark), on="k", direction="nearest")
    clash = _left(spark).withColumnRenamed("tag", "r_v")
    with pytest.raises(ValueError, match="collide"):
        asof_join(clash, _right(spark), on="k")


def test_asof_plan_is_single_key_shuffle(spark):
    """The scale contract: sort-merge over a union — no join node that
    materializes candidate pairs, no nested-loop."""
    plan = asof_join(_left(spark), _right(spark), on="k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def _skew(spark):
    """Key 1 holds ~50% of both sides, spread over ~116 days."""
    left = spark.range(400).selectExpr(
        "CASE WHEN id % 2 = 0 THEN CAST(1 AS LONG) ELSE 2 + id % 5 END AS k",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id*7 AS INT),0,0) AS ts",
        "CAST(id AS DOUBLE) AS lv")
    right = spark.range(300).selectExpr(
        "CASE WHEN id % 2 = 0 THEN CAST(1 AS LONG) ELSE 2 + id % 5 END AS k",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id*11 AS INT),0,0) AS ts",
        "CAST(id*10 AS DOUBLE) AS rv")
    return left, right


def test_asof_split_width_equals_plain_on_hot_key(spark):
    """The hot-key-split plan must be output-identical to the plain plan
    across directions and tolerance — the split is a physical rewrite,
    not a semantics change."""
    left, right = _skew(spark)
    for kwargs in (dict(), dict(direction="forward"),
                   dict(tolerance=dt.timedelta(hours=24))):
        plain = asof_join(left, right, on="k", **kwargs).collect()
        split = asof_join(left, right, on="k",
                          split_width=dt.timedelta(days=7),
                          **kwargs).collect()
        key = lambda r: tuple(str(x) for x in r)
        assert sorted(split, key=key) == sorted(plain, key=key), kwargs


def test_asof_split_carry_across_bin_boundary(spark):
    """A left row whose only match lives in an EARLIER bin must get it
    via the carry-in (backward), and symmetrically from a LATER bin
    (forward) — including a left row sitting exactly on the boundary."""
    wk = dt.timedelta(days=7)
    left = spark.createDataFrame(
        [(1, T(2024, 1, 8, 0, 0), "boundary"),   # exactly at bin edge
         (1, T(2024, 1, 9, 3, 0), "inside")],
        "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 7, 23, 0), 5.0)],        # previous bin only
        "k long, ts timestamp, v double")
    out = {r.tag: r.r_v for r in
           asof_join(left, right, on="k", split_width=wk).collect()}
    assert out == {"boundary": 5.0, "inside": 5.0}

    fwd = {r.tag: r.r_v for r in
           asof_join(left.filter("tag = 'boundary'"),
                     spark.createDataFrame([(1, T(2024, 1, 20), 9.0)],
                                           "k long, ts timestamp, v double"),
                     on="k", direction="forward",
                     split_width=wk).collect()}
    assert fwd == {"boundary": 9.0}


def test_asof_split_windows_partition_by_bin(spark):
    """The scale assertion: with split_width, the matching window
    partitions by (key, _bin) — the hot key's rows land on as many
    partitions as it has occupied bins (>1 here), instead of one."""
    import re

    from data_pipeline_foundations_spark.operators.temporal import bin_of
    left, right = _skew(spark)
    df = asof_join(left, right, on="k",
                   split_width=dt.timedelta(days=7))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"windowspecdefinition\(k#\d+L?, _bin#", plan), plan
    nbins = (left.filter("k = 1")
             .select(bin_of("ts", dt.timedelta(days=7)).alias("b"))
             .distinct().count())
    assert nbins > 1


def _points(spark):
    return spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 30), 1.0), (1, T(2024, 1, 1, 13, 30), 2.0),
         (1, T(2024, 1, 1, 9, 59), 4.0), (2, T(2024, 1, 1, 10, 30), 8.0)],
        "k long, ts timestamp, v double")


def _intervals(spark):
    return spark.createDataFrame(
        [(100, 1, T(2024, 1, 1, 10), T(2024, 1, 1, 14)),
         (200, 2, T(2024, 1, 1, 11), T(2024, 1, 1, 12))],
        "iid long, k long, w_start timestamp, w_end timestamp")


def test_range_join_containment(spark):
    out = range_join(_points(spark), _intervals(spark), on="k",
                     start_col="w_start", end_col="w_end")
    got = {(r.iid, r.v) for r in out.collect()}
    # 9:59 precedes window 100; 10:30 for k=2 precedes window 200
    assert got == {(100, 1.0), (100, 2.0)}


def test_range_join_half_open_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10), 1.0), (1, T(2024, 1, 1, 14), 2.0)],
        "k long, ts timestamp, v double")
    got = {r.v for r in range_join(pts, _intervals(spark), on="k",
                                   start_col="w_start",
                                   end_col="w_end").collect()}
    assert got == {1.0}          # start inclusive, end exclusive


def test_range_join_is_equi_join(spark):
    plan = range_join(_points(spark), _intervals(spark), on="k",
                      start_col="w_start", end_col="w_end") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_max_bins_guard(spark):
    wide = spark.createDataFrame(
        [(1, 1, T(2024, 1, 1), T(2024, 3, 1))],
        "iid long, k long, w_start timestamp, w_end timestamp")
    with pytest.raises(Exception, match="max_bins"):
        range_join(_points(spark), wide, on="k", start_col="w_start",
                   end_col="w_end", max_bins=10).collect()


def test_asof_split_random_frames_equal_plain(spark):
    """Seeded random frames with duplicate right timestamps (tie-break
    stress): the split plan must equal the plain plan in both
    directions — including the per-bin closing-state tie handling."""
    import random
    rng = random.Random(7)

    def mk(n, width_minutes):
        return [(rng.randrange(4),
                 T(2024, 1, 1) + dt.timedelta(
                     minutes=rng.randrange(0, width_minutes)),
                 float(i)) for i in range(n)]

    left = spark.createDataFrame(mk(120, 7 * 24 * 60),
                                 "k long, ts timestamp, lv double")
    rrows = mk(80, 7 * 24 * 60)
    rrows += [(k, ts, v + 1000.0) for k, ts, v in rrows[:15]]  # ts ties
    right = spark.createDataFrame(rrows, "k long, ts timestamp, rv double")
    key = lambda r: tuple(str(x) for x in r)
    for d in ("backward", "forward"):
        plain = sorted(asof_join(left, right, on="k", direction=d).collect(),
                       key=key)
        split = sorted(asof_join(left, right, on="k", direction=d,
                                 split_width=dt.timedelta(hours=26)).collect(),
                       key=key)
        assert split == plain, d
