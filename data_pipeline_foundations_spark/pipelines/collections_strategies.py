"""Collections-strategies pipeline (extract_collections_strategies.py:14-66).

Extract-filter-decode of strategy assignments: keep the known strategy
codes, decode names, classify PreDD/PostDD, add the CDMX wall-clock twin
column, and normalize the join key to string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CDMX = "America/Mexico_City"

STRATEGY_NAMES = {
    3: "CMD",
    4: "Integra",
    5: "IvrPreventativeAndReminderCollectionCallV2",
    7: "Vozy",
    8: "AgencyReminderCallV1",
    10: "MoonflowVariationV1",
    11: "MoonflowControlGroupV1",
    12: "MoonflowPaymentCommitmentV1",
    13: "Pypper",
    14: "Pypper_late_20",
}
PRE_DD = (5, 8)


def _decode(col: F.Column, mapping: dict[int, str]) -> F.Column:
    expr = None
    for code, name in mapping.items():
        expr = F.when(col == code, name) if expr is None else expr.when(col == code, name)
    return expr


def collections_strategies(strategies: DataFrame) -> DataFrame:
    """(LoanCollectionStrategies) -> collections_strategies contract
    (FIXTURES.md §3): UserLoanId string, CreatedAt/CreatedAtCDMX naive
    timestamps, Strategy, StrategyName, StrategyType, IsDeleted."""
    s = F.col("Strategy")
    return (
        strategies
        .filter(s.isin(list(STRATEGY_NAMES)))
        .select(
            F.col("UserLoanId").cast("string").alias("UserLoanId"),
            F.col("CreatedAt"),
            F.from_utc_timestamp("CreatedAt", CDMX).alias("CreatedAtCDMX"),
            s.alias("Strategy"),
            _decode(s, STRATEGY_NAMES).alias("StrategyName"),
            F.when(s.isin(list(PRE_DD)), "PreDD").otherwise("PostDD").alias("StrategyType"),
            F.col("IsDeleted"),
        )
    )
