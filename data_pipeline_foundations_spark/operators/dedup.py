"""Near-duplicate detection operators: MinHash+LSH, SimHash, n-gram Jaccard.

Scale-first design (the 100 TB story):
  - **Signatures are scan-local.** MinHash signatures are computed per row
    with array higher-order functions (shingle → hash → array_min) — no
    explode, no shuffle, whole-stage codegen. A 100 TB corpus streams
    through the scan once.
  - **Candidate generation is banded.** Only the tiny (doc_id, band_key)
    projection shuffles; the O(n²) pair space is never materialized —
    pairs come from equi-joins on band buckets (LSH) / rare shingles
    (inverted index with frequency cap), the standard blocked designs.
  - **Everything is deterministic integers** (md5-derived 60-bit hashes,
    see functions.hashing), so the DuckDB oracle reproduces results
    bit-for-bit.

Cited reference scope: the reference repo has no dedup operators; these are
the BASELINE.json north-star extensions (SURVEY.md §7.2 slice 7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, oracle_md5_long
from ..functions.text import oracle_shingles, shingles, tokens
from ..tables import scale_out

# MinHash family size and LSH banding: K = BANDS * ROWS_PER_BAND.
MINHASH_K = 8
LSH_BANDS = 4
ROWS_PER_BAND = 2
# Universal-hash family over a 31-bit Mersenne prime: each shingle is
# md5-hashed ONCE (the expensive part), then the k family members are
# (A_i * (h mod P) + B_i) mod P — products stay under 2^62, so the same
# bigint arithmetic is exact in both engines. Constants are md5-derived
# (driver-side, deterministic), not RNG state.
HASH_P = 2_147_483_647  # 2^31 - 1


def _hash_family(k: int) -> list[tuple[int, int]]:
    import hashlib

    def h(tag: str) -> int:
        return int(hashlib.md5(tag.encode()).hexdigest()[:15], 16)

    return [((h(f"A{i}") % (HASH_P - 1)) + 1, h(f"B{i}") % HASH_P)
            for i in range(k)]
# SimHash width (bits of the 60-bit md5 hash used).
SIMHASH_BITS = 32
# Inverted-index blocking: shingles appearing in more docs than this are
# too common to be discriminative — skip them for candidate generation
# (intersections still count them).
MAX_SHINGLE_DF = 20


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signature(text_col: Column | str, n: int = 3,
                      k: int = MINHASH_K) -> list[Column]:
    """k MinHash values of the document's n-gram shingle set.

    One md5 per shingle, then k cheap universal-hash derivations and
    array_min — all inside codegen, scan-local, no shuffle.
    """
    base = F.transform(shingles(text_col, n), lambda s: md5_long(s) % HASH_P)

    def family(a: int, b: int):
        # arity-1 closure: pyspark treats 2-arg lambdas as (element, index)
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(HASH_P)

    return [
        F.array_min(F.transform(base, family(a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(_hash_family(k))
    ]


def _oracle_minhash_exprs(sql_col: str, n: int = 3, k: int = MINHASH_K) -> list[str]:
    base = (f"list_transform({oracle_shingles(sql_col, n)}, "
            f"s -> {oracle_md5_long('s')} % {HASH_P})")
    return [
        f"list_min(list_transform(base_h, h -> ({a} * h + {b}) % {HASH_P})) AS mh{i}"
        for i, (a, b) in enumerate(_hash_family(k))
    ], base


def minhash_lsh_pairs(docs: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      k: int = MINHASH_K, bands: int = LSH_BANDS,
                      threshold: float = 0.5) -> DataFrame:
    """Near-dup candidate pairs via LSH banding + MinHash similarity estimate.

    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b and
    est_jaccard = (#equal minhashes)/k >= threshold. Docs with fewer than
    n tokens have no shingles and are excluded (their signature is null).
    """
    r = k // bands
    sig = (
        scale_out(docs)
        .filter(F.size(tokens(text_col)) >= n)
        .select(F.col(id_col), *minhash_signature(text_col, n, k))
    )
    band_structs = [
        F.struct(
            F.lit(j).alias("band_id"),
            F.concat_ws("|", *[F.col(f"mh{j * r + i}") for i in range(r)]).alias("band_key"),
        )
        for j in range(bands)
    ]
    bands_df = (
        sig.select(id_col, F.explode(F.array(*band_structs)).alias("b"))
        .select(id_col, "b.band_id", "b.band_key")
    )
    x, y = bands_df.alias("x"), bands_df.alias("y")
    pairs = (
        x.join(y, ["band_id", "band_key"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("doc_a"), F.col(f"y.{id_col}").alias("doc_b"))
        .distinct()
    )
    a = sig.select(F.col(id_col).alias("doc_a"),
                   *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)])
    b = sig.select(F.col(id_col).alias("doc_b"),
                   *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)])
    matches = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                  for i in range(k))
    return (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b", (matches / F.lit(float(k))).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def oracle_minhash_lsh_sql(*, n: int = 3, k: int = MINHASH_K,
                           bands: int = LSH_BANDS,
                           threshold: float = 0.5) -> str:
    r = k // bands
    mh_exprs, base = _oracle_minhash_exprs("text", n, k)
    mh = ",\n               ".join(mh_exprs)
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {j} AS band_id, "
        + " || '|' || ".join(f"CAST(mh{j * r + i} AS VARCHAR)" for i in range(r))
        + " AS band_key FROM sig"
        for j in range(bands)
    )
    eq_sum = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(k))
    return f"""
    WITH pre AS (
        SELECT doc_id, {base} AS base_h
        FROM documents
        WHERE len(string_split(text, ' ')) >= {n}
    ), sig AS (
        SELECT doc_id,
               {mh}
        FROM pre
    ), bands AS (
        {band_selects}
    ), pairs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y USING (band_id, band_key)
        WHERE x.doc_id < y.doc_id
    )
    SELECT p.doc_a, p.doc_b, ({eq_sum}) / {float(k)} AS est_jaccard
    FROM pairs p
    JOIN sig a ON a.doc_id = p.doc_a
    JOIN sig b ON b.doc_id = p.doc_b
    WHERE ({eq_sum}) / {float(k)} >= {threshold}
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash(text_col: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """Token-multiset SimHash: bit b of the output is 1 when the majority of
    token hashes have bit b set. Scan-local (array filters), no shuffle."""
    toks = tokens(text_col)
    hashes = F.transform(toks, lambda t: md5_long(t))
    n = F.size(toks)

    def bit_set(b: int):
        # arity-1 closure (see hasher note in minhash_signature)
        return lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1

    out = F.lit(0).cast("long")
    for b in range(bits):
        cnt = F.size(F.filter(hashes, bit_set(b)))
        out = out + F.when(cnt * 2 > n, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def oracle_simhash_expr(sql_col: str, bits: int = SIMHASH_BITS) -> str:
    toks = f"string_split({sql_col}, ' ')"
    hashes = f"list_transform({toks}, t -> {oracle_md5_long('t')})"
    terms = " + ".join(
        f"CASE WHEN 2 * len(list_filter({hashes}, h -> (h >> {b}) & 1 = 1)) "
        f"> len({toks}) THEN CAST({2 ** b} AS BIGINT) ELSE 0 END"
        for b in range(bits)
    )
    return f"({terms})"


def simhash_pairs(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", bits: int = SIMHASH_BITS,
                  band_bits: int = 8, max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash banding: docs sharing any band byte are
    candidates; keep pairs with hamming distance <= max_hamming."""
    nbands = bits // band_bits
    mask = (1 << band_bits) - 1
    sig = scale_out(docs).select(F.col(id_col), simhash(text_col, bits).alias("sh"))
    band_structs = [
        F.struct(F.lit(j).alias("band_id"),
                 F.shiftright(F.col("sh"), j * band_bits).bitwiseAND(F.lit(mask)).alias("band_key"))
        for j in range(nbands)
    ]
    bands_df = (sig.select(id_col, "sh", F.explode(F.array(*band_structs)).alias("b"))
                .select(id_col, "sh", "b.band_id", "b.band_key"))
    x, y = bands_df.alias("x"), bands_df.alias("y")
    return (
        x.join(y, ["band_id", "band_key"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("doc_a"), F.col(f"y.{id_col}").alias("doc_b"),
                F.bit_count(F.col("x.sh").bitwiseXOR(F.col("y.sh"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def oracle_simhash_pairs_sql(*, bits: int = SIMHASH_BITS, band_bits: int = 8,
                             max_hamming: int = 6) -> str:
    nbands = bits // band_bits
    mask = (1 << band_bits) - 1
    sh = oracle_simhash_expr("text", bits)
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, sh, {j} AS band_id, (sh >> {j * band_bits}) & {mask} AS band_key FROM sig"
        for j in range(nbands)
    )
    return f"""
    WITH sig AS (
        SELECT doc_id, {sh} AS sh FROM documents
    ), bands AS (
        {band_selects}
    )
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(bit_count(xor(x.sh, y.sh)) AS INTEGER) AS hamming
    FROM bands x JOIN bands y USING (band_id, band_key)
    WHERE x.doc_id < y.doc_id AND bit_count(xor(x.sh, y.sh)) <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard over an inverted index
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(docs: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        max_df: int = MAX_SHINGLE_DF,
                        threshold: float = 0.2) -> DataFrame:
    """Exact Jaccard over n-gram shingle *sets* for candidate pairs that
    share at least one rare shingle (document frequency <= max_df).

    The frequency cap is the blocking step: ubiquitous shingles generate
    quadratic candidates without discriminating, so they're excluded from
    candidate generation (intersection counts still include every shared
    shingle). Classic inverted-index join; shuffle volume is bounded by
    sum over rare shingles of df².
    """
    sh = (scale_out(docs)
          .select(F.col(id_col),
                  F.explode(F.array_distinct(shingles(text_col, n))).alias("s")))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    rare = dfreq.filter(F.col("df") <= max_df).select("s")
    a, b = sh.alias("a"), sh.alias("b")
    cand = (
        a.join(b, "s")
        .join(F.broadcast(rare), "s")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    inter = (
        a.join(b, "s")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        cand.join(inter, ["doc_a", "doc_b"])
        .join(na, "doc_a").join(nb, "doc_b")
        .select(
            "doc_a", "doc_b", "shared",
            (F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double"))
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def oracle_ngram_jaccard_sql(*, n: int = 3, max_df: int = MAX_SHINGLE_DF,
                             threshold: float = 0.2) -> str:
    sh_list = oracle_shingles("text", n)
    return f"""
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct({sh_list})) AS s FROM documents
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), rare AS (
        SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {max_df}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b USING (s) JOIN rare USING (s)
        WHERE a.doc_id < b.doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        FROM sh a JOIN sh b USING (s)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT c.doc_a, c.doc_b, i.shared,
           i.shared / CAST(na.n_sh + nb.n_sh - i.shared AS DOUBLE) AS jaccard
    FROM cand c
    JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    JOIN sizes na ON na.doc_id = c.doc_a
    JOIN sizes nb ON nb.doc_id = c.doc_b
    WHERE i.shared / CAST(na.n_sh + nb.n_sh - i.shared AS DOUBLE) >= {threshold}
    """
