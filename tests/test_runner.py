"""DAG runner (SURVEY §7.1): ordering, per-stage isolation, blast radius.

The reference's run_etl.sh has no ``set -e`` — a failed extract still
lets the warehouse publish. These tests pin the fixed semantics: failed
stage → transitive dependents skipped (with the blocker named),
independent branches unaffected."""

from __future__ import annotations

import datetime as dt

import pytest

from data_pipeline_foundations_spark.runner import (
    FAILED, OK, SKIPPED, Stage, StageResult, reference_etl_dag, run_dag,
)

TS = dt.datetime
AS_OF = dt.datetime(2025, 7, 1, 12, 0, 0)


# ---------------------------------------------------------------------------
# run_dag semantics (synthetic stages)
# ---------------------------------------------------------------------------
def test_runs_in_dependency_order():
    seen = []

    def mk(name):
        return lambda r: seen.append(name) or name

    res = run_dag([
        Stage("c", mk("c"), deps=("b",)),
        Stage("a", mk("a")),
        Stage("b", mk("b"), deps=("a",)),
    ])
    assert seen == ["a", "b", "c"]
    assert all(r.status == OK for r in res.values())


def test_dep_results_are_passed():
    res = run_dag([
        Stage("a", lambda r: 21),
        Stage("b", lambda r: r["a"] * 2, deps=("a",)),
    ])
    assert res["b"].value == 42


def test_failure_skips_transitive_dependents_not_independents():
    def boom(r):
        raise RuntimeError("stage exploded")

    res = run_dag([
        Stage("a", boom),
        Stage("b", lambda r: "b", deps=("a",)),
        Stage("c", lambda r: "c", deps=("b",)),
        Stage("solo", lambda r: "solo"),
    ])
    assert res["a"].status == FAILED and "exploded" in str(res["a"].error)
    assert res["b"].status == SKIPPED and res["b"].blocked_by == ("a",)
    assert res["c"].status == SKIPPED and res["c"].blocked_by == ("b",)
    assert res["solo"].status == OK


def test_graph_bugs_raise():
    with pytest.raises(ValueError, match="duplicate"):
        run_dag([Stage("a", lambda r: 1), Stage("a", lambda r: 2)])
    with pytest.raises(ValueError, match="unknown"):
        run_dag([Stage("a", lambda r: 1, deps=("ghost",))])
    with pytest.raises(ValueError, match="cycle"):
        run_dag([Stage("a", lambda r: 1, deps=("b",)),
                 Stage("b", lambda r: 1, deps=("a",))])


# ---------------------------------------------------------------------------
# reference ETL DAG over FIXTURES-shaped inputs
# ---------------------------------------------------------------------------
@pytest.fixture()
def etl_inputs(spark, loan_inputs):
    mk = spark.createDataFrame
    full = dict(loan_inputs)
    full["raw_strategies"] = mk(
        [(3, TS(2025, 3, 12), 11, False), (5, TS(2025, 2, 20), 13, False)],
        schema="UserLoanId long, CreatedAt timestamp, Strategy int, IsDeleted boolean")
    # the arcus PIPELINE needs the full transaction schema (the loan
    # pipeline's channel aggs only need a slice, so conftest keeps it thin)
    full["arcus_transactions"] = mk(
        [(1, "e1", "r1", "c1", "d", 10.0, TS(2025, 6, 2, 5), TS(2025, 6, 2, 6),
          TS(2025, 6, 2, 7), 1, 0, "an", "ai", "nm", "tr", None)],
        schema=("ArcusTransactionId long, ExternalId string, Reference string, "
                "ArcusCustomerId string, Description string, Amount double, "
                "CreatedAt timestamp, ModifiedAt timestamp, CompletedAt timestamp, "
                "Status int, TransactionDirection int, ExternalAccountNumber string, "
                "ExternalAccountIdentifier string, ExternalAccountName string, "
                "TrackingId string, FailureCode string"))
    full["unallocated_payment_arcus_transactions"] = mk(
        [(1,)], schema="ArcusTransactionId long")
    full["facebook_raw"] = mk(
        [("Jan 5, 2025", "facebook", "ad-1", "1,234", "$12.50")],
        schema=("`Install Day` string, `Media Source` string, `Ad` string, "
                "`Impressions (sum)` string, `Cost (sum)` string"))
    return full


def test_reference_dag_all_green(spark, etl_inputs):
    published = {}
    res = run_dag(reference_etl_dag(
        spark, etl_inputs, as_of=AS_OF,
        sink=lambda name, df: published.__setitem__(name, df.count())))
    assert {n: r.status for n, r in res.items()} == {
        n: OK for n in res}, {n: r.error for n, r in res.items()
                              if r.status == FAILED}
    assert len(published) == 7
    assert published["calendar"] > 0
    # loan 6 (DisbursementFailed) is excluded: 7 fixture loans → 6 fact rows
    assert published["loan_detail"] == 6


def test_reference_dag_blast_radius(spark, etl_inputs):
    # poison the strategies input: its stage fails at construction time
    bad = dict(etl_inputs)
    del bad["raw_strategies"]
    res = run_dag(reference_etl_dag(spark, bad, as_of=AS_OF))
    assert res["collections_strategies"].status == FAILED
    assert res["loan_detail"].status == SKIPPED
    assert res["accounting_summary"].status == SKIPPED
    # independent branches survive
    assert res["calendar"].status == OK
    assert res["arcus_transactions"].status == OK
    assert res["growth_facebook"].status == OK
