"""Near-duplicate clustering: candidate pairs → connected components →
canonical document per cluster.

Every dedup operator in this package (exact fingerprints, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine) emits *pairs*; acting on them
— "keep one document per duplicate group" — needs the transitive
closure. This module turns a pair list into components with a
deterministic canonical choice (minimum doc id), the step a
training-data pipeline actually executes before dropping duplicates.

Algorithm: iterative min-label propagation ("hash-to-min" style) —
label(v) starts as v; each round sets
``label(v) = min(label(v), min over neighbors u of label(u))``
over the symmetrized edge list, to a fixed point. Rounds needed =
graph diameter, which for near-dup clusters (tight cliques chained by
borderline pairs) is small; the iteration cap is explicit and
non-convergence RAISES instead of returning silently-wrong labels.

Scale design:
  - Each round is two shuffles (edge join on vertex key + min
    aggregate), all longs. The pair list is orders of magnitude smaller
    than the corpus — it came out of a blocked candidate join.
  - ``localCheckpoint(eager=True)`` per round truncates lineage —
    without it round k's plan re-derives rounds 1..k-1 and the DAG
    grows quadratically (the standard Spark iterative-algorithm trap).
  - The driver-side loop is O(diameter) *rounds*, not O(rows): each
    round's work is fully distributed; only the single `changed`
    scalar comes back to the driver. For planet-scale graphs the
    two-phase large-star/small-star variant (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) drops
    rounds to O(log n) — same per-round shuffle shape as here.

The reference repo has no clustering operator; this is a BASELINE.json
north-star extension (VERDICT r1, next-round task #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .caching import (
    persistent_rdd_ids, track_checkpoint_rdds, unpersist_rdd_ids,
)

MAX_CC_ROUNDS = 25


def connected_components(vertices: DataFrame, edges: DataFrame, *,
                         id_col: str = "doc_id", src: str = "doc_a",
                         dst: str = "doc_b",
                         max_rounds: int = MAX_CC_ROUNDS) -> DataFrame:
    """(id_col, cluster_id) for every vertex; cluster_id = min id reachable.

    Vertices with no incident edge form singleton clusters. Raises
    RuntimeError if no fixed point within ``max_rounds`` (correctness
    over silent truncation).

    Checkpoint lifecycle (storage hygiene at scale): each round's eager
    localCheckpoint truncates lineage, so round k-1's checkpoint blocks
    are dead the moment round k materializes — they are unpersisted
    immediately, keeping peak storage at TWO label snapshots regardless
    of round count. The symmetrized edge list is freed at the fixed
    point; the FINAL label snapshot backs the returned DataFrame, so it
    is registered with the caching registry and reclaimed by the
    caller's ``release_cached_intermediates()``."""
    sc = vertices.sparkSession.sparkContext
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    before = persistent_rdd_ids(sc)
    sym = (half.union(half.select(F.col("b").alias("a"), F.col("a").alias("b")))
           .distinct()
           .localCheckpoint(eager=True))
    sym_ids = persistent_rdd_ids(sc) - before
    # Only vertices incident to an edge can ever change label: the loop
    # iterates over those participants alone, and every other vertex is a
    # self-labeled singleton unioned in at the end. At corpus scale this
    # is the difference between shuffling |pair participants| rows per
    # round (near-dup pairs are sparse) and shuffling the whole corpus
    # per round. The corpus is touched exactly once (the anti join).
    verts = vertices.select(F.col(id_col).alias("v"))
    participants = sym.select(F.col("a").alias("v")).distinct()
    labels = (verts.join(participants, "v", "leftsemi")
              .select("v", F.col("v").alias("label")))
    singletons = (verts.join(participants, "v", "leftanti")
                  .select("v", F.col("v").alias("label")))
    prev_ids: set[int] = set()
    for _ in range(max_rounds):
        nbr_min = (sym.join(labels, sym["a"] == labels["v"])
                   .select(F.col("b").alias("v"), F.col("label"))
                   .groupBy("v").agg(F.min("label").alias("nbr_label")))
        pre = persistent_rdd_ids(sc)
        nxt = (labels.join(nbr_min, "v", "left")
               .select("v", F.least("label", F.coalesce("nbr_label", "label"))
                       .alias("label"),
                       (F.col("nbr_label") < F.col("label")).alias("_chg"))
               .localCheckpoint(eager=True))
        new_ids = persistent_rdd_ids(sc) - pre
        # nxt is materialized; the previous round's checkpoint feeds
        # nothing downstream (lineage was truncated) — free it now.
        unpersist_rdd_ids(sc, prev_ids)
        prev_ids = new_ids
        changed = nxt.filter(F.col("_chg")).limit(1).count()
        labels = nxt.drop("_chg")
        if changed == 0:
            # sym stays alive: the returned plan's singleton branch
            # (anti join against the participants) still reads it — both
            # it and the final label snapshot go to the caching registry
            # for release after the caller's terminal action.
            track_checkpoint_rdds(sc, sym_ids | prev_ids)
            return (labels.unionByName(singletons)
                    .select(F.col("v").alias(id_col),
                            F.col("label").alias("cluster_id")))
    unpersist_rdd_ids(sc, sym_ids | prev_ids)
    raise RuntimeError(
        f"connected_components: no fixed point after {max_rounds} rounds "
        f"(component diameter exceeds the cap; raise max_rounds)")


def dedup_clusters(docs: DataFrame, pairs: DataFrame, *,
                   id_col: str = "doc_id", src: str = "doc_a",
                   dst: str = "doc_b",
                   max_rounds: int = MAX_CC_ROUNDS) -> DataFrame:
    """Cluster assignment for EVERY document given near-dup pairs.

    Output: (doc_id, cluster_id, cluster_size, is_canonical) — the
    canonical document is the minimum id of its component, so "drop
    non-canonical rows" is the deterministic dedup action.
    """
    comp = connected_components(docs.select(id_col), pairs, id_col=id_col,
                                src=src, dst=dst, max_rounds=max_rounds)
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (comp.join(sizes, "cluster_id")
            .select(id_col, "cluster_id", "cluster_size",
                    (F.col(id_col) == F.col("cluster_id"))
                    .cast("int").alias("is_canonical")))


def oracle_dedup_clusters_sql(pairs_sql: str, *, vertex_table: str = "documents",
                              id_col: str = "doc_id") -> str:
    """DuckDB twin: transitive closure via recursive CTE, then min per
    source vertex — exact label-propagation semantics."""
    return f"""
    WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ({pairs_sql}) _p
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ), reach AS (
        SELECT {id_col} AS src, {id_col} AS node FROM {vertex_table}
        UNION
        SELECT r.src, e.b AS node FROM reach r JOIN edges e ON e.a = r.node
    ), lab AS (
        SELECT src AS {id_col}, MIN(node) AS cluster_id
        FROM reach GROUP BY src
    )
    SELECT l.{id_col}, l.cluster_id, s.cluster_size,
           CAST(l.{id_col} = l.cluster_id AS INTEGER) AS is_canonical
    FROM lab l
    JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
          FROM lab GROUP BY cluster_id) s USING (cluster_id)
    """
