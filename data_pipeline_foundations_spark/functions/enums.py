"""Enum decoding as column expressions.

The reference decodes integer enum codes to labels with long CASE blocks in
T-SQL (SURVEY.md P9: LoanStatus, OfferPolicy, CreditPolicy, Strategy, Status,
TransactionType/Direction — extract_loan_detail.py:29-70,
extract_collections_strategies.py:19-31, extract_arcus_transactions.py:22-32).

Spark-first form: one generic ``decode_enum`` building a chained
``when``-expression. For very large enum domains a broadcast-joined lookup
dim would be preferable; these domains are <20 values, so a codegen'd CASE
is both faster (no join) and plan-stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decode_enum(col: Column | str, mapping: dict, default=None) -> Column:
    """code → label CASE chain; unmapped codes get ``default`` (null = None).

    Keys are iterated in insertion order, matching the reference's CASE
    branch order (first match wins — irrelevant for disjoint keys but kept
    for faithful semantics).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for code, label in mapping.items():
        branch = (c == F.lit(code))
        expr = F.when(branch, F.lit(label)) if expr is None else expr.when(branch, F.lit(label))
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default))


def oracle_decode_enum(sql_col: str, mapping: dict, default=None) -> str:
    """The identical CASE chain in ANSI SQL for the DuckDB oracle."""
    branches = " ".join(
        f"WHEN {sql_col} = {code!r} THEN {label!r}" if isinstance(code, str)
        else f"WHEN {sql_col} = {code} THEN {label!r}"
        for code, label in mapping.items()
    )
    d = "NULL" if default is None else repr(default)
    return f"CASE {branches} ELSE {d} END"


# Example domains mirroring the reference's decoders, re-keyed onto the
# TESTDATA star schema (order status / priority play the role of LoanStatus /
# Strategy).
ORDER_STATUS = {"O": "Open", "F": "Finished", "P": "Partial"}
RETURN_FLAG = {"A": "Accepted", "N": "None", "R": "Returned"}
