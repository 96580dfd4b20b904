"""Property-based differential tests for the temporal joins.

asof_join's reference implementation is pandas.merge_asof (same
backward/<= semantics, same tolerance rule); range_join's is the
brute-force O(n*m) pair filter. Hypothesis drives both over adversarial
small inputs — equal timestamps, empty sides, repeated keys, boundary
gaps — where window/bin edge-cases live.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_foundations_spark.operators.temporal import (
    asof_join, range_join,
)

BASE = dt.datetime(2024, 1, 1)

# timestamps on a coarse grid so equal-ts collisions actually happen
_ts = st.integers(min_value=0, max_value=40).map(
    lambda m: BASE + dt.timedelta(minutes=15 * m))
_key = st.integers(min_value=0, max_value=2)

_left_rows = st.lists(st.tuples(_key, _ts), min_size=1, max_size=12)
_right_rows = st.lists(st.tuples(_key, _ts, st.integers(0, 99)),
                       min_size=0, max_size=12)


def _spark():
    # session fixture unavailable inside @given; reuse the active session
    from data_pipeline_foundations_spark.session import get_spark
    return get_spark("tests", shuffle_partitions=8)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=_left_rows, right=_right_rows,
       tol_minutes=st.one_of(st.none(), st.integers(0, 120)))
def test_asof_matches_pandas_merge_asof(left, right, tol_minutes):
    spark = _spark()
    # unique right rows per (k, ts): pandas merge_asof tie-breaks by row
    # position, the operator by payload ordering — dedupe to max v so
    # both references are deterministic and identical
    rmap = {}
    for k, ts, v in right:
        rmap[(k, ts)] = max(v, rmap.get((k, ts), -1))
    right_u = [(k, ts, v) for (k, ts), v in sorted(rmap.items())]

    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(right_u or [],
                                "k long, ts timestamp, v long")
    tol = dt.timedelta(minutes=tol_minutes) if tol_minutes is not None else None
    got = {r.lid: r.r_v for r in
           asof_join(ldf, rdf, on="k", tolerance=tol).collect()}

    if not right_u:
        want = {i: None for i in range(len(left))}
    else:
        lp = pd.DataFrame([(i, k, ts) for i, (k, ts) in enumerate(left)],
                          columns=["lid", "k", "ts"]).sort_values("ts")
        rp = pd.DataFrame(right_u, columns=["k", "ts", "v"]).sort_values("ts")
        merged = pd.merge_asof(
            lp, rp, on="ts", by="k",
            tolerance=pd.Timedelta(tol) if tol is not None else None)
        want = {int(r.lid): (None if pd.isna(r.v) else int(r.v))
                for r in merged.itertuples()}
    assert got == want


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(points=_right_rows, intervals=_left_rows,
       width_minutes=st.sampled_from([15, 45, 90]))
def test_range_join_matches_brute_force(points, intervals, width_minutes):
    spark = _spark()
    width = dt.timedelta(minutes=width_minutes)
    pdf = spark.createDataFrame(
        [(i, k, ts, v) for i, (k, ts, v) in enumerate(points)] or [],
        "pid long, k long, ts timestamp, v long")
    idf = spark.createDataFrame(
        [(i, k, ts, ts + width) for i, (k, ts) in enumerate(intervals)],
        "iid long, k long, w_start timestamp, w_end timestamp")
    got = {(r.pid, r.iid) for r in
           range_join(pdf, idf, on="k", start_col="w_start",
                      end_col="w_end",
                      bin_width=dt.timedelta(minutes=30)).collect()}
    want = {(pi, ii)
            for pi, (pk, pts, _) in enumerate(points)
            for ii, (ik, its) in enumerate(intervals)
            if pk == ik and its <= pts < its + width}
    assert got == want
