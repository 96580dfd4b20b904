"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized partitions, but it only triggers on
sort-merge joins with accurate size stats. Salting is the explicit
fallback for the cases AQE can't see: a hot key concentrated in one
shuffle partition of a hash aggregate, or a join whose skewed side
defeats the splitter (e.g., after a transform that hides stats).

Both operators are RESULT-INVARIANT to the salt: the salt only spreads
rows across partitions, so the DuckDB oracle is the plain (unsalted)
equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_join(big: DataFrame, small: DataFrame, key: str, *,
                n_salts: int = DEFAULT_SALTS, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: the big side gets a uniform random salt in
    [0, n_salts); the small side is replicated once per salt value. The
    join key becomes (key, salt), so a hot key's rows spread across
    n_salts partitions instead of one straggler task.

    Cost model: small side shuffles n_salts× its size — only worth it
    when the small side is modest and the big side's key is genuinely
    hot. The salt uses a fixed seed; results are salt-invariant anyway.

    Only inner/left are supported: replication is result-invariant when
    every emitted row is anchored to a big-side row, but a right/full
    outer join would emit each UNMATCHED small-side row once per salt
    (n_salts duplicates). Anti/semi on the big side would be safe too
    but are cheaper unsalted (no payload moves); use a plain join.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            f"replicating the small side duplicates its unmatched rows "
            f"under right/full outer joins")
    big_s = big.withColumn("_salt", (F.rand(42) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_r = small.select("*", salts)
    out = big_s.join(small_r, [key, "_salt"], how)
    return out.drop("_salt")


def salted_agg_sum(df: DataFrame, key: str, value: Column | str, *,
                   out: str, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Two-phase sum for a skewed group key: partial-aggregate on
    (key, salt), then final-aggregate on key. The hot key's partial
    sums compute in n_salts parallel tasks; the final phase reduces
    n_salts rows per key.

    (Spark's hash aggregate already does map-side partials per input
    partition; explicit salting additionally bounds the REDUCE side when
    one key dominates an entire stage's output.)
    """
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("_salt", (F.rand(7) * n_salts).cast("int"))
    partial = (salted.groupBy(key, "_salt")
               .agg(F.sum(v).alias("_partial")))
    return partial.groupBy(key).agg(F.sum("_partial").alias(out))
