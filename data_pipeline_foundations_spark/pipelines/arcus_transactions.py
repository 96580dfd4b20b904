"""Arcus payment-processor transactions pipeline
(extract_arcus_transactions.py:9-71).

Two left joins onto the transaction fact — the loan bridge (enrichment)
and the unallocated-payments table, whose only purpose is the marked
semi-join flag ``IsUnallocated`` (P18 in SURVEY.md §2.2). Enum decodes
for status/direction/type, a pushed-down date-range predicate, the CDMX
wall-clock twins, and the reference's null-safe int→string key format
(U6: NaN floats render as "None", real ids without a ".0" suffix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CDMX = "America/Mexico_City"

STATUS_NAMES = {0: "Pending", 1: "Succeeded", 2: "Failed",
                3: "Refunded", 4: "Returned"}


def _decode(col: F.Column, mapping: dict[int, str]) -> F.Column:
    expr = None
    for code, name in mapping.items():
        expr = F.when(col == code, name) if expr is None else expr.when(col == code, name)
    return expr


def arcus_transactions(inputs: dict[str, DataFrame], *,
                       min_created_at: str = "2025-06-01") -> DataFrame:
    """(ArcusTransactions ⟕ UserLoanArcusTransactions ⟕
    UnallocatedPaymentArcusTransactions) → analytics_arcus_transactions.

    The min_created_at predicate is a parameter (the reference hard-codes
    it, :42) and reaches the parquet scan via pushdown.
    """
    ar = inputs["arcus_transactions"].alias("ar")
    ulat = inputs["user_loan_arcus_transactions"].alias("ulat")
    ua = inputs["unallocated_payment_arcus_transactions"].alias("ua")

    j = (ar
         .filter(F.col("ar.CreatedAt") >= F.lit(min_created_at).cast("timestamp"))
         .join(ulat, "ArcusTransactionId", "left")
         .join(ua.select(F.col("ArcusTransactionId").alias("_ua_id")),
               F.col("ar.ArcusTransactionId") == F.col("_ua_id"), "left"))

    return j.select(
        F.col("ar.ArcusTransactionId").alias("ArcusTransactionId"),
        "ExternalId", "Reference", "ArcusCustomerId",
        # U6 null-safe int→string: formatted like pandas' astype(str) after
        # the apply — nulls become the literal "None", ids have no ".0"
        F.coalesce(F.col("ulat.UserLoanId").cast("long").cast("string"),
                   F.lit("None")).alias("UserLoanId"),
        "Description", "Amount",
        F.col("ar.CreatedAt").alias("CreatedAt"),
        F.from_utc_timestamp("ar.CreatedAt", CDMX).alias("CreatedAtCDMX"),
        F.col("ar.ModifiedAt").alias("ModifiedAt"),
        F.from_utc_timestamp("ar.ModifiedAt", CDMX).alias("ModifiedAtCDMX"),
        F.col("ar.CompletedAt").alias("CompletedAt"),
        F.from_utc_timestamp("ar.CompletedAt", CDMX).alias("CompletedAtCDMX"),
        "IsDistribution",
        F.when(F.col("IsDistribution") == 1, "Out").otherwise("In").alias("TransactionType"),
        F.col("ar.Status").alias("Status"),
        _decode(F.col("ar.Status"), STATUS_NAMES).alias("StatusDescription"),
        "TransactionDirection",
        F.when(F.col("TransactionDirection") == 0, "Credit").otherwise("Debit")
         .alias("TransactionDirectionDescription"),
        "ExternalAccountNumber", "ExternalAccountIdentifier",
        "ExternalAccountName", "TrackingId",
        # P18 marked semi-join: flag, not a filter
        F.when(F.col("_ua_id").isNotNull(), 1).otherwise(0).alias("IsUnallocated"),
        "FailureCode",
    )
