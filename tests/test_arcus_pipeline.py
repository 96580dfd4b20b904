"""Arcus transactions pipeline (extract_arcus_transactions.py analog):
marked semi-join flag, null-safe key format, decodes, date filter."""

from __future__ import annotations

import datetime as dt

import pytest

from data_pipeline_foundations_spark.pipelines.arcus_transactions import (
    arcus_transactions,
)

TS = dt.datetime


@pytest.fixture(scope="module")
def out_rows(spark):
    mk = spark.createDataFrame
    ar = mk([
        (1, "e1", "r1", "c1", "d", 10.0, TS(2025, 6, 2, 5), TS(2025, 6, 2, 6),
         TS(2025, 6, 2, 7), 1, 0, "an", "ai", "nm", "tr", None),
        (2, "e2", "r2", "c2", "d", 20.0, TS(2025, 6, 3), TS(2025, 6, 3),
         None, 2, 1, "an", "ai", "nm", "tr", "F01"),
        (3, "e3", "r3", "c3", "d", 30.0, TS(2025, 5, 1), TS(2025, 5, 1),
         None, 1, 0, "an", "ai", "nm", "tr", None),  # before cutoff → dropped
    ], schema=("ArcusTransactionId long, ExternalId string, Reference string, "
               "ArcusCustomerId string, Description string, Amount double, "
               "CreatedAt timestamp, ModifiedAt timestamp, CompletedAt timestamp, "
               "Status int, TransactionDirection int, ExternalAccountNumber string, "
               "ExternalAccountIdentifier string, ExternalAccountName string, "
               "TrackingId string, FailureCode string"))
    ulat = mk([(1, 77, 0)],
              schema="ArcusTransactionId long, UserLoanId long, IsDistribution int")
    ua = mk([(2,)], schema="ArcusTransactionId long")
    df = arcus_transactions({
        "arcus_transactions": ar,
        "user_loan_arcus_transactions": ulat,
        "unallocated_payment_arcus_transactions": ua,
    })
    return {r.ArcusTransactionId: r for r in df.collect()}


def test_date_filter_and_shape(out_rows):
    assert set(out_rows) == {1, 2}  # tx 3 predates the cutoff


def test_marked_semi_join_flag(out_rows):
    assert out_rows[1].IsUnallocated == 0
    assert out_rows[2].IsUnallocated == 1  # in UnallocatedPaymentArcusTransactions


def test_null_safe_key_format(out_rows):
    assert out_rows[1].UserLoanId == "77"      # no ".0" float suffix
    assert out_rows[2].UserLoanId == "None"    # pandas astype(str) on NaN


def test_decodes_and_tz(out_rows):
    r1, r2 = out_rows[1], out_rows[2]
    assert r1.StatusDescription == "Succeeded"
    assert r2.StatusDescription == "Failed"
    assert r1.TransactionDirectionDescription == "Credit"
    assert r2.TransactionDirectionDescription == "Debit"
    assert r1.TransactionType == "In" and r2.TransactionType == "In"
    # UTC→CDMX twin (June = UTC-6)
    assert r1.CreatedAtCDMX == TS(2025, 6, 1, 23)
    assert r2.CompletedAt is None and r2.CompletedAtCDMX is None
