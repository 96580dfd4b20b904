"""Slowly-changing-dimension (Type 2) batch merge.

The classic warehouse history table the reference's overwrite-style sinks
(load_loan_detail.py's full-refresh ``to_sql``) cannot produce: instead of
replacing a dimension row when an attribute changes, the old row is CLOSED
(``valid_to`` set to the change's effective time) and a new OPEN row
(``valid_to`` NULL) is appended, so every query can reconstruct the
attribute as-of any time with a ``valid_from <= t < coalesce(valid_to,
'infinity')`` predicate.

Merge semantics (the standard daily-batch shape: at most one update row per
key per merge, effective times monotonically non-decreasing across merges):

- closed history rows pass through untouched;
- an open row whose key arrives with ANY tracked attribute changed
  (null-safe comparison) is closed at the update's effective time and a new
  open row is born there;
- a no-op update (all tracked attributes equal) leaves the open row alone —
  re-merging the same batch is idempotent;
- an update for an unseen key inserts its first open row;
- an open row with no update passes through.

Late-arriving updates (effective before an open row's ``valid_from``) are a
bitemporal problem this operator does not solve; the precondition is
asserted nowhere (it would cost a pass) but documented here and tested.

Scale shape: the closed/open split is a scan-local filter; the merge is ONE
full-outer join of the open slice against the update batch on the business
key, then a scan-local conditional explode that emits 0-2 rows per joined
pair. Nothing else shuffles — at 100 TB the cost is one key exchange of the
open slice (bounded by live keys, not history length) plus one of the
batch. With a small daily batch AQE plans the join's shuffle reads locally;
a broadcast variant is deliberately not forced because full-outer requires
both sides' unmatched rows. The output is partition-overwrite friendly:
only keys present in the batch produce changed rows, so a writer can
anti-filter untouched partitions exactly like o03's month refresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["scd2_merge", "scd2_from_events", "scd2_apply_log"]


def scd2_merge(dim: DataFrame, updates: DataFrame, *, key: str,
               tracked: list[str], eff_col: str = "eff") -> DataFrame:
    """Merge one update batch into an SCD2 history table.

    ``dim``:     (key, *tracked, valid_from, valid_to) — valid_to NULL marks
                 the open row; at most one open row per key.
    ``updates``: (key, *tracked, eff_col) — at most one row per key.
    Returns the merged history with the same columns as ``dim``.
    """
    closed = dim.filter(F.col("valid_to").isNotNull())
    open_ = dim.filter(F.col("valid_to").isNull())

    o = open_.select(F.col(key).alias("_k"),
                     *[F.col(c).alias(f"_o_{c}") for c in tracked],
                     F.col("valid_from").alias("_o_vf"))
    u = updates.select(F.col(key).alias("_k"),
                       *[F.col(c).alias(f"_u_{c}") for c in tracked],
                       F.col(eff_col).alias("_u_eff"))
    j = o.join(u, "_k", "full_outer")

    has_o = F.col("_o_vf").isNotNull()
    has_u = F.col("_u_eff").isNotNull()
    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_u_{c}"))

    def row(prefix: str, vf, vt):
        return F.struct(
            *[F.col(f"_{prefix}_{c}").alias(c) for c in tracked],
            vf.cast("timestamp").alias("valid_from"),
            vt.cast("timestamp").alias("valid_to"))

    null_ts = F.lit(None).cast("timestamp")
    rows = (
        F.when(has_o & has_u & changed,
               F.array(row("o", F.col("_o_vf"), F.col("_u_eff")),
                       row("u", F.col("_u_eff"), null_ts)))
        .when(has_o,  # no update, or a no-op update: open row survives
              F.array(row("o", F.col("_o_vf"), null_ts)))
        .otherwise(  # unseen key: first open row
            F.array(row("u", F.col("_u_eff"), null_ts))))

    merged = (j.select(F.col("_k").alias(key),
                       F.explode(rows).alias("_r"))
              .select(key, "_r.*"))
    return closed.select(key, *tracked, "valid_from", "valid_to") \
                 .unionByName(merged)


def scd2_from_events(events: DataFrame, *, key: str, tracked: list[str],
                     eff_col: str = "eff",
                     seq_col: str = "seq") -> DataFrame:
    """Build an SCD2 history table directly from a change-event log —
    the event-sourced twin of :func:`scd2_merge` (which applies one
    snapshot batch at a time).

    ``events``: (key, *tracked, eff_col, seq_col) — the full attribute
    observation log, any number of rows per key; ``seq_col`` breaks
    same-timestamp ties deterministically (e.g. the order key).

    Per key, ordered by (eff, seq): events equal to their immediate
    predecessor (null-safe on every tracked column) are dropped — run
    compression, which leaves exactly the change boundaries — and each
    surviving row becomes a history interval [its eff, next survivor's
    eff), the last one open.

    Scale shape: ONE hash exchange on the key serving two stacked
    window passes (the lag-compression and the lead that closes
    intervals — same partitioning AND sort key, so Catalyst reuses the
    exchange and the sort; the filter between them preserves order).
    Per-key state inside WindowExec is one spillable run, never a
    collected list.

    Run compression is associative: compressing a concatenation of
    batches (each batch stitched after the previous open row) equals
    compressing the whole log — which is what makes the streaming twin
    (streaming/scd_apply.py, per-batch :func:`scd2_apply_log`)
    bit-equal to this batch build under ANY batching. Pinned in
    tests/test_scd.py and tests/test_streaming.py.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(eff_col, seq_col)
    first = F.lag(F.lit(1)).over(w).isNull()
    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
    kept = (events.withColumn("_keep", first | changed)
            .filter(F.col("_keep")))
    return (kept.select(
        key, *tracked,
        F.col(eff_col).cast("timestamp").alias("valid_from"),
        F.lead(F.col(eff_col).cast("timestamp"))
        .over(W.partitionBy(key).orderBy(eff_col, seq_col))
        .alias("valid_to")))


def scd2_apply_log(dim: DataFrame, events: DataFrame, *, key: str,
                   tracked: list[str], eff_col: str = "eff",
                   seq_col: str = "seq") -> DataFrame:
    """Apply a batch of change events (any number per key) to an
    existing SCD2 history: closed rows pass through; each key's open
    row is re-emitted as a synthetic first event (its attributes at its
    ``valid_from``, ordered before every batch event) and the combined
    sequence goes through :func:`scd2_from_events`' run compression —
    so a batch event equal to the open row's attributes is a no-op, and
    consecutive equal events inside the batch collapse.

    Precondition as :func:`scd2_merge`: event times are >= the open
    rows' ``valid_from`` (monotone batches; late events are a
    bitemporal problem). Scale shape: the union is scan-local, then
    :func:`scd2_from_events`' single key exchange.
    """
    closed = dim.filter(F.col("valid_to").isNotNull()) \
                .select(key, *tracked, "valid_from", "valid_to")
    open_ev = (dim.filter(F.col("valid_to").isNull())
               .select(key, *tracked,
                       F.col("valid_from").alias(eff_col),
                       F.lit(0).alias("_tier"),
                       F.lit(None).cast("long").alias("_seq")))
    batch_ev = events.select(key, *tracked, F.col(eff_col),
                             F.lit(1).alias("_tier"),
                             F.col(seq_col).cast("long").alias("_seq"))
    seq = open_ev.unionByName(batch_ev).withColumn(
        "_ord", F.struct("_tier", "_seq"))
    hist = scd2_from_events(seq, key=key, tracked=tracked,
                            eff_col=eff_col, seq_col="_ord")
    return closed.unionByName(hist.select(key, *tracked,
                                          "valid_from", "valid_to"))


def scd2_as_of(dim: DataFrame, at, *, key: str | None = None) -> DataFrame:
    """Point-in-time read of an SCD2 history: the one row per key whose
    interval covers ``at`` (``valid_from <= at < valid_to``, open rows
    unbounded above). Scan-local filter — no shuffle; with the history
    stored partitioned or bucketed by key, downstream joins inherit
    that layout. ``at`` may be a Python datetime or a Column."""
    t = F.lit(at).cast("timestamp") if not hasattr(at, "over") else at
    return dim.filter((F.col("valid_from") <= t)
                      & (F.col("valid_to").isNull()
                         | (t < F.col("valid_to"))))


def scd2_point_in_time_join(facts: DataFrame, dim: DataFrame, *,
                            key: str, ts_col: str,
                            how: str = "left") -> DataFrame:
    """Join each fact row to the dimension attributes that were valid
    AT THE FACT'S OWN TIMESTAMP — the leakage-free feature-store join
    (a training example must never see attributes from its future).

    Equi-join on the business key with the interval predicate as a
    residual: per key a history holds one row per attribute CHANGE, so
    the join fan-out is bounded by change counts, never |facts|x|dim|.
    One key exchange per side (broadcast if the dim is small); the
    plan stays a hash join — pinned in tests (no cartesian, no BNLJ).
    For histories with millions of intervals per key, bin the time
    axis first (operators/temporal.py range_join's bin-and-verify)."""
    t = F.col(ts_col)
    cond = ((facts[key] == dim[key])
            & (dim["valid_from"] <= t)
            & (dim["valid_to"].isNull() | (t < dim["valid_to"])))
    return facts.join(dim, cond, how).drop(dim[key])
