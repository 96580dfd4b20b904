"""Fixture-faithful loan-detail pipeline: golden + property tests.

Fixtures follow FIXTURES.md §4 coverage guidance: zero payments, exact
pay, underpay-while-Repaid, overpay, partial-bucket waterfall split,
dispute, multi-channel mix, repaid-with-no-payments, strategy dedup with
ties, post-DD threshold overrides.

The waterfall property check compares the Spark columns against an
independent Python twin of the reference semantics (SURVEY.md §5.3).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from data_pipeline_foundations_spark.pipelines import (
    collections_strategies, loan_detail,
)

from tests.conftest import LOAN_AS_OF as AS_OF  # noqa: E402
TS = dt.datetime


def _py_waterfall(total_paid, principal, fee, tax_fee, late_fee, tax_late):
    """Python twin of the reference waterfall (extract_loan_detail.py:198-234
    semantics, reimplemented from SURVEY.md §2.9 U1)."""
    remaining = min(total_paid, principal + fee + tax_fee + late_fee + tax_late)
    if remaining >= late_fee + tax_late:
        lf, lft = late_fee, tax_late
        remaining -= late_fee + tax_late
    else:
        lf = round(remaining / 1.16, 2)
        lft = round(remaining - lf, 2)
        remaining = 0
    if remaining >= fee + tax_fee:
        fp, fpt = fee, tax_fee
        remaining -= fee + tax_fee
    else:
        fp = round(remaining / 1.16, 2)
        fpt = round(remaining - fp, 2)
        remaining = 0
    pp = min(remaining, principal)
    return {"LateFeePaid": lf, "TaxOnLateFeePaid": lft, "FeePaid": fp,
            "TaxOnFeePaid": fpt, "PrincipalPaid": pp}


@pytest.fixture(scope="module")
def fact(loan_fact_df):
    return {r["UserLoanId"]: r.asDict() for r in loan_fact_df.collect()}


def test_exclusions_and_shape(fact):
    assert set(fact) == {"1", "2", "3", "4", "5", "7"}  # loan 6 excluded, ids cast to string


def test_cohort_and_loan_number(fact):
    assert fact["1"]["LoanNumber"] == 1 and fact["1"]["LoanCohort"] == "First"
    assert fact["2"]["LoanNumber"] == 2 and fact["2"]["LoanCohort"] == "Repeat"
    for r in fact.values():
        assert (r["LoanNumber"] == 1) == (r["LoanCohort"] == "First")


def test_enum_decodes(fact):
    assert fact["1"]["LoanStatusDescription"] == "Repaid"
    assert fact["1"]["JitOfferPolicyName"] == "TenPercentFee"
    assert fact["1"]["CreditPolicyName"] == "Avocado"
    assert fact["3"]["CreditPolicyName"] is None          # 99 → ELSE null
    assert fact["4"]["JitOfferPolicyName"] is None        # no offer row (left join)


def test_underpaid_repaid_adjustment(fact):
    # loan 2: due = 1000+100+16 = 1116; paid 500 but Repaid → bumped to due
    r = fact["2"]
    assert r["TotalOriginalAmountPaid"] == pytest.approx(500.0)
    assert r["TotalAmountPaid"] == pytest.approx(r["TotalAmountDue"])
    assert r["PrincipalPaid"] == pytest.approx(1000.0)


def test_waterfall_matches_python_twin(fact):
    for r in fact.values():
        exp = _py_waterfall(r["TotalAmountPaid"], r["PrincipalAmount"], r["Fee"],
                            r["TaxOnFee"], r["LateFee"], r["TaxOnLateFee"])
        for k, v in exp.items():
            assert r[k] == pytest.approx(v, abs=1e-9), (r["UserLoanId"], k)
        # conservation within a cent (partial buckets round independently)
        allocated = (r["LateFeePaid"] + r["TaxOnLateFeePaid"] + r["FeePaid"]
                     + r["TaxOnFeePaid"] + r["PrincipalPaid"])
        assert allocated == pytest.approx(
            min(r["TotalAmountPaid"], r["TotalAmountDue"]), abs=0.011)


def test_partial_bucket_split(fact):
    # loan 3: late fee bucket = 80 + 12.8 = 92.8 > paid 200? no: paid 200 covers
    # late bucket then partially covers fee bucket (50 + 8 = 58 > 107.2 rem)
    r = fact["3"]
    assert r["LateFeePaid"] == pytest.approx(80.0)
    assert r["TaxOnLateFeePaid"] == pytest.approx(12.8)
    assert r["FeePaid"] == pytest.approx(50.0)
    assert r["TaxOnFeePaid"] == pytest.approx(8.0)
    # principal absorbs the remainder, unrounded min()
    assert r["PrincipalPaid"] == pytest.approx(200.0 - 92.8 - 58.0)


def test_settlement_edges(fact):
    # repaid with payments → last payment date
    assert fact["1"]["SettledAt"] == TS(2025, 1, 20)
    # repaid with NO payments → DueDate, CDMX twin copies the wall clock
    assert fact["4"]["SettledAt"] == TS(2025, 5, 1)
    assert fact["4"]["SettledAtCDMX"] == TS(2025, 5, 1)
    # outstanding → null
    assert fact["3"]["SettledAt"] is None
    assert fact["5"]["SettledAt"] is None


def test_days_late(fact):
    for r in fact.values():
        assert r["DaysLate"] >= 0
    # loan 5: unsettled, overdue since 2025-02-15 → as_of date - due
    assert fact["5"]["DaysLate"] == (AS_OF.date() - dt.date(2025, 2, 15)).days
    # loan 1: settled before due → clipped to 0
    assert fact["1"]["DaysLate"] == 0


def test_strategy_dedup_and_overrides(fact):
    # loan 3: latest row (Moonflow 11) wins the dedup; Moonflow + post-DD →
    # StrategyCreatedAt overridden to DueDate-midnight + 30h
    r = fact["3"]
    assert r["Strategy"] == 11
    assert r["StrategyCreatedAt"] == TS(2025, 3, 2, 6, 0, 0)
    assert bool(r["IsPostDD"]) is True
    # loan 5: explicit post-DD (13), stamp kept (not a Moonflow code)
    r5 = fact["5"]
    assert r5["Strategy"] == 13
    assert r5["StrategyCreatedAt"] == TS(2025, 2, 20)
    # pypper late strategy joined
    assert r5["LateStrategy"] == 14
    assert r5["LateStrategyName"] == "Pypper_late_20"
    # loans without post-DD strategies: Twilio fallback, no fan-out
    assert fact["1"]["StrategyName"] == "Twilio"
    assert fact["1"]["LateStrategy"] is None


def test_no_strategy_rows_do_not_fan_out(fact):
    # left join + dedup must keep exactly one row per loan
    assert len(fact) == 6
