"""BM25 keyword retrieval over the document corpus.

The scale shape is classic inverted-index retrieval, expressed as one lazy
DataFrame plan:

  1. **Postings prune at the scan**: the token array is filtered to query
     terms *before* explode, so only matching (doc_id, term) postings ever
     leave the scan — the shuffle is O(postings for the query terms), not
     O(total tokens). On a 100 TB corpus with a 6-term query this is the
     difference between shuffling gigabytes and shuffling the corpus.
  2. **Tiny sides broadcast**: document frequencies (≤ |query terms| rows)
     and the corpus stats scalar (1 row) broadcast; the only shuffle is the
     (doc_id, term) → tf partial-aggregated groupBy.
  3. **Top-k is TakeOrderedAndProject**, never a global sort.

Cross-engine determinism: per-term scores are identical IEEE-754 double
expressions on both engines (all constants cast to double — DuckDB would
otherwise do exact DECIMAL arithmetic on literals like 0.5 and diverge),
then integer-scaled (floor(x·1e6 + 0.5)) before the per-document sum so
reduction order cannot produce last-ulp drift. The idf is the log-free
rational form idf = (N - df + ½)/(df + ½): monotone in rarity like the
classic BM25 idf, but free of ln(), whose last-ulp behavior differs between
libm implementations (documented deviation from the textbook formula).

Reference parity note: the reference repo has no retrieval operator; this
extends the training-data surface (SURVEY.md §7.6) — keyword search is the
standard first-stage filter in corpus curation (quality-biased sampling,
targeted decontamination sweeps).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

K1 = 1.2
B = 0.75
SCALE = 1e6


def bm25_topk(docs: DataFrame, terms: Sequence[str], k: int = 20,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` documents by (log-free) BM25 for a bag of query ``terms``.

    Returns (doc_id, score, n_terms) ordered by score desc, doc_id —
    the tie-break makes the limit deterministic on both engines.
    """
    toks = tokens(text_col)
    qarr = F.array(*[F.lit(t) for t in terms])
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        F.filter(toks, lambda t: F.array_contains(qarr, t)).alias("hits"))

    # One pass for corpus stats (scalar, broadcast via crossJoin below).
    stats = base.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("dl").alias("sum_dl"))

    # explode_outer, and no size(hits)>0 pre-filter: both the explicit
    # size filter and plain explode's inferred one inline the `hits` HOF
    # into the scan predicate, tokenizing every row twice. The outer
    # explode emits one null term for hit-less docs; the post-generate
    # null-drop is a cheap string check (see dedup.decontaminate).
    posts = (base.select("doc_id", "dl",
                         F.explode_outer("hits").alias("term"))
             .filter(F.col("term").isNotNull())
             .groupBy("doc_id", "term", "dl")
             .agg(F.count(F.lit(1)).alias("tf")))
    dfs = posts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    j = posts.join(F.broadcast(dfs), "term").crossJoin(F.broadcast(stats))
    half, one = F.lit(0.5), F.lit(1.0)
    idf = (F.col("n_docs") - F.col("df") + half) / (F.col("df") + half)
    denom = (F.col("tf") + F.lit(K1)
             * (one - F.lit(B)
                + F.lit(B) * F.col("dl") * F.col("n_docs") / F.col("sum_dl")))
    score = idf * (F.col("tf") * (F.lit(K1) + one)) / denom
    scaled = j.select(
        "doc_id",
        F.floor(score * F.lit(SCALE) + half).alias("su"))
    return (scaled.groupBy("doc_id")
            .agg(F.sum("su").alias("su"), F.count(F.lit(1)).alias("n_terms"))
            .orderBy(F.col("su").desc(), "doc_id")
            .limit(k)
            .select("doc_id",
                    (F.col("su").cast("double") / F.lit(SCALE)).alias("score"),
                    F.col("n_terms").cast("long").alias("n_terms")))


def oracle_bm25_topk_sql(terms: Sequence[str], k: int = 20,
                         table: str = "documents") -> str:
    """DuckDB twin: same double expression shape, constants cast to DOUBLE
    (bare 0.5 / 1.2 literals are DECIMALs in DuckDB and would compute in
    exact decimal arithmetic, diverging from Spark's IEEE doubles)."""
    lst = ", ".join(f"'{t}'" for t in terms)
    d = "CAST({} AS DOUBLE)".format
    k1, b = d(K1), d(B)
    half, one = d(0.5), d(1.0)
    return f"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM {table}
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               SUM(CAST(len(toks) AS BIGINT)) AS sum_dl
        FROM base
    ), hits AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
               unnest(list_filter(toks, t -> list_contains([{lst}], t))) AS term
        FROM base
    ), posts AS (
        SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM hits GROUP BY doc_id, dl, term
    ), dfs AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM posts GROUP BY term
    ), scored AS (
        SELECT p.doc_id,
               CAST(floor(
                   ((s.n_docs - f.df + {half}) / (f.df + {half}))
                   * (p.tf * ({k1} + {one}))
                   / (p.tf + {k1} * ({one} - {b}
                        + {b} * p.dl * s.n_docs / s.sum_dl))
                   * {d(SCALE)} + {half}) AS BIGINT) AS su
        FROM posts p JOIN dfs f USING (term) CROSS JOIN stats s
    )
    SELECT doc_id, CAST(SUM(su) AS DOUBLE) / {d(SCALE)} AS score,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM scored GROUP BY doc_id
    ORDER BY SUM(su) DESC, doc_id LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion — hybrid sparse + dense retrieval
# ---------------------------------------------------------------------------

RRF_KAPPA = 60
RRF_SCALE = 1_000_000


def rrf_fuse(sparse: DataFrame, dense: DataFrame, *, k: int = 20,
             kappa: int = RRF_KAPPA, id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09) of
    two ranked candidate lists: ``sparse`` and ``dense`` each carry
    (id_col, rank) with rank 1-based; the fused score of a document is
    sum over the lists it appears in of floor(SCALE / (kappa + rank)).

    The floor-of-double-division is cross-engine exact: both operands
    are small integers, the IEEE quotient is correctly rounded, and
    whenever the true quotient is an integer the division is exact — so
    the DuckDB twin reproduces every fused score bit-for-bit (the same
    reason the BM25 scaling above is portable). Documents in only one
    list still score (standard RRF — that asymmetry is the point: the
    fusion promotes agreement without requiring it).

    Returns (id, rrf_score, sparse_rank, dense_rank) ordered by fused
    score desc with the id tiebreak, limit ``k``. Scale shape: both
    inputs are top-k lists (tiny) — the fusion is a broadcast-size
    full-outer join; the heavy lifting happened in the retrievers.
    """
    contrib = (lambda r: F.when(
        r.isNotNull(),
        F.floor(F.lit(float(RRF_SCALE)) / (F.lit(kappa) + r)))
        .otherwise(F.lit(0)))
    s = sparse.select(F.col(id_col).alias("_id"),
                      F.col("rank").cast("long").alias("sparse_rank"))
    d = dense.select(F.col(id_col).alias("_id"),
                     F.col("rank").cast("long").alias("dense_rank"))
    return (s.join(d, "_id", "full_outer")
            .select(F.col("_id").alias(id_col),
                    (contrib(F.col("sparse_rank"))
                     + contrib(F.col("dense_rank"))).cast("long")
                    .alias("rrf_score"),
                    "sparse_rank", "dense_rank")
            .orderBy(F.col("rrf_score").desc(), id_col)
            .limit(k))


def oracle_rrf_hybrid_sql(terms: Sequence[str], *, k_sparse: int = 20,
                          k_dense: int = 20, k: int = 20,
                          kappa: int = RRF_KAPPA,
                          n2_query: int = 0) -> str:
    """DuckDB twin of the x81 hybrid: the BM25 top-k list ranked by
    (score desc, doc_id), the dense list = brute cosine top-k of query
    vector ``n2_query`` over embeddings (same quantized-cosine contract
    as oracle_cosine_topk_sql), fused with the floor(SCALE/(kappa+rank))
    arithmetic."""
    from ..operators.similarity import (
        oracle_idot, oracle_int_vec, oracle_qcos,
    )
    bm25 = oracle_bm25_topk_sql(terms, k_sparse)
    contrib = (f"CASE WHEN {{r}} IS NULL THEN 0 ELSE "
               f"CAST(floor(CAST({RRF_SCALE} AS DOUBLE)"
               f" / ({kappa} + {{r}})) AS BIGINT) END").format
    return f"""
    WITH sparse AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS sparse_rank
        FROM ({bm25})
    ), eb AS (
        SELECT vec_id, {oracle_int_vec('embedding')} AS sv FROM embeddings
    ), ebase AS (
        SELECT vec_id, sv, {oracle_idot('sv', 'sv')} AS n2 FROM eb
    ), eq AS (
        SELECT sv AS qv, n2 AS qn2 FROM ebase WHERE vec_id = {n2_query}
    ), dense AS (
        SELECT vec_id AS doc_id, CAST(rnk AS BIGINT) AS dense_rank FROM (
            SELECT b.vec_id,
                   row_number() OVER (ORDER BY
                       {oracle_qcos(oracle_idot('q.qv', 'b.sv'),
                                    'q.qn2', 'b.n2')} DESC,
                       b.vec_id ASC) AS rnk
            FROM ebase b, eq q
            WHERE b.vec_id <> {n2_query}
        ) WHERE rnk <= {k_dense}
    )
    SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
           {contrib(r='s.sparse_rank')} + {contrib(r='d.dense_rank')}
               AS rrf_score,
           s.sparse_rank, d.dense_rank
    FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT {k}
    """
