"""Arrow-vectorized kernels for the similarity family.

Each kernel is the NUMERICALLY IDENTICAL twin of a pure-SQL (higher-order
function) formulation in operators/similarity.py. That identity is not a
tolerance claim — it is exact, because the quantized-embedding contract
makes every reduction an int64 sum:

  - embeddings are scaled once to int64 (``floor(x * 1e6 + 0.5)``),
  - dot products / norms / PQ distances are integer sums (associative —
    any evaluation order, including numpy's, gives the same value),
  - the only floats are DERIVED at output from those exact ints via
    individually-rounded IEEE ops (``cast``, ``sqrt``, ``*``, ``/``) that
    every engine (Spark JVM, numpy/libm, DuckDB) rounds identically.

So a registry query may run the vectorized path by default and still hash-
match the DuckDB oracle bit-for-bit; tests assert kernel == SQL twin.

Why vectorize at all: HOF lambdas evaluate interpreted, one element at a
time (and are excluded from codegen subexpression elimination). A 16-bit
SRP signature over dim=64 is ~2k interpreted evals per row; a PQ code
assignment is ~2k more; a 64-dim cosine verification is ~128 per
candidate pair — these dominated every weak ANN query in VERDICT r3.
numpy does the same arithmetic as packed int64 matrix ops at ~100x the
throughput, and the Arrow exchange moves each vector ONCE (the kernels
are applied per-row or per-bucket, never per-pair).

Scale notes: pandas_udf kernels stream Arrow batches (bounded memory);
the per-bucket pair kernel materializes one LSH bucket per group — bucket
size is governed by the banding parameters, the same contract the
SQL-join formulation relies on for its join fan-out.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _require_nonzero_norms(rt: np.ndarray, what: str) -> None:
    """Cosine precondition: every norm strictly positive.

    A zero-norm vector or centroid makes the cosine 0/0 = NaN, and
    np.argmax over NaNs silently picks the first index while the SQL
    twin's NULL/NaN ordering differs — the bit-for-bit contract breaks
    without any error. Degenerate inputs therefore fail LOUDLY here
    (ADVICE r9): the int-grid quantization ``floor(x*1e6 + 0.5)`` maps
    only the near-zero ball (< 5e-7 per element) to the zero vector, so
    any real embedding corpus satisfies this for free.
    """
    if rt.size and not np.all(rt > 0):
        raise ValueError(
            f"zero-norm {what}: cosine undefined (0/0=NaN) and NaN "
            f"ordering diverges from the SQL twin — reject degenerate "
            f"inputs upstream or drop all-zero vectors before assignment")


def srp_sig_udf(signs, scale: float):
    """pandas_udf: embedding array<float> -> 64-bit SRP signature (long).

    ``signs`` is the (bits x dim) ±1 hyperplane matrix. Projection of the
    SCALED integer vector onto each hyperplane is an exact int64 sum;
    bit b is set when the projection is > 0 — identical to the SQL twin's
    per-bit integer folds.
    """
    sgn = np.asarray(signs, dtype=np.int64)
    bits = sgn.shape[0]
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))

    @F.pandas_udf("long")
    def sig(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int64")
        M = np.vstack(col.to_numpy()).astype(np.float64)
        sv = np.floor(M * scale + 0.5).astype(np.int64)
        proj = sv @ sgn.T                      # exact int64
        return pd.Series((proj > 0).astype(np.int64) @ weights)

    return sig


def bucket_pair_cosines(bands_df, id_col: str, threshold: float,
                        scale: float | None = None):
    """Per-LSH-bucket pairwise quantized cosines via one int64 matmul.

    ``bands_df``: (band_id, band_key, id, sv, [n2]) — one row per
    (vector, band). With ``scale=None`` (default), ``sv`` is the
    pre-quantized array<long> and ``n2`` its exact norm; with ``scale``
    set, ``sv`` is the RAW float embedding and quantization + norms
    happen INSIDE the kernel (the srp_sig_udf discipline — the scan
    ships raw floats and pays no interpreted int_vec/idot HOFs; the
    int64 arithmetic is identical either way). Returns (vec_a, vec_b,
    cosine) for every within-bucket pair with cosine >= threshold,
    a < b, NOT deduped across bands (caller applies .distinct();
    cosines are bit-identical across bands so the dedup is exact).

    The Gram matrix S @ S.T reproduces the SQL twin's idot fold exactly
    (integer sums); cosine = idot / (sqrt(na2) * sqrt(nb2)) with the same
    three IEEE roundings as the column expression.
    """
    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                              "vec_b": pd.Series([], dtype="int64"),
                              "cosine": pd.Series([], dtype="float64")})
        if n < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        if scale is not None:
            M = np.vstack(pdf["sv"].to_numpy()).astype(np.float64)
            S = np.floor(M * scale + 0.5).astype(np.int64)
            n2 = np.einsum("nd,nd->n", S, S)
        else:
            S = np.vstack(pdf["sv"].to_numpy()).astype(np.int64)
            n2 = pdf["n2"].to_numpy().astype(np.int64)
        rt = np.sqrt(n2.astype(np.float64))
        G = (S @ S.T).astype(np.float64)       # exact: |idot| < 2^53
        cos = G / (rt[:, None] * rt[None, :])
        iu = np.triu_indices(n, 1)
        a, b, cv = ids[iu[0]], ids[iu[1]], cos[iu]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        m = cv >= threshold
        return pd.DataFrame({"vec_a": lo[m], "vec_b": hi[m], "cosine": cv[m]})

    return (bands_df.groupBy("band_id", "band_key")
            .applyInPandas(per_bucket,
                           "vec_a long, vec_b long, cosine double"))


def pq_codes_udf(cents: list, m: int, block: int):
    """pandas_udf: scaled vector sv (array<long>) -> PQ code per subspace
    (array<int>, position s holds the chosen cid).

    ``cents`` is the collected codebook [(s, cid, cvec)] — a KB-sized
    broadcast-by-closure. Distances are exact int64 sums of squared
    diffs; argmin ties break to the SMALLEST cid, matching the SQL twin's
    array_min over (d, cid) structs (centroids are scanned in ascending
    cid order, np.argmin keeps the first minimum).
    """
    by_s = {}
    for s, cid, cvec in sorted((c["s"], c["cid"], c["cvec"]) for c in cents):
        by_s.setdefault(int(s), []).append((int(cid), np.asarray(cvec, dtype=np.int64)))
    cid_arrs = {s: np.array([cid for cid, _ in lst], dtype=np.int64)
                for s, lst in by_s.items()}
    cent_mats = {s: np.vstack([v for _, v in lst]) for s, lst in by_s.items()}

    @F.pandas_udf("array<int>")
    def codes(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="object")
        SV = np.vstack(col.to_numpy()).astype(np.int64)   # (n, dim)
        n = SV.shape[0]
        out = np.empty((n, m), dtype=np.int32)
        for s in range(m):
            sub = SV[:, s * block:(s + 1) * block]        # (n, block)
            C = cent_mats[s]                              # (ks_s, block)
            diff = sub[:, None, :] - C[None, :, :]
            d = np.einsum("nkb,nkb->nk", diff, diff)      # exact int64
            out[:, s] = cid_arrs[s][np.argmin(d, axis=1)]
        return pd.Series(list(out))

    return codes


def pq_adc_totals_udf(cents: list, qsvs: list, m: int, block: int,
                      scale: float | None = None):
    """pandas_udf: scaled vector sv -> per-query ADC distance totals
    (array<long>, position qi = Σ_s qtab[qi][s][code_s]).

    This is the classic ADC structure fused into one map stage: the
    kernel assigns this row's PQ codes (exact int64 argmin, ties to the
    smallest cid — identical to the SQL twin) and immediately sums each
    query's precomputed distance-to-centroid table at those codes. The
    (vec, s, cid) code rows never exist as exchanged data — the only
    shuffle left downstream is the per-query top-k.

    ``qsvs`` (the n_queries scaled query vectors) and ``cents`` are
    KB-sized driver values baked into the closure; all entries are exact
    ints so the totals are bit-identical to the join+sum formulation.

    With ``scale`` set, the input column is the RAW float embedding and
    the 1e-6-grid quantization happens inside the kernel (srp_sig_udf /
    ivf_cos_udf discipline) — the scan pays no interpreted int_vec HOF.
    """
    by_s = {}
    for s, cid, cvec in sorted((c["s"], c["cid"], c["cvec"]) for c in cents):
        by_s.setdefault(int(s), []).append((int(cid), np.asarray(cvec, dtype=np.int64)))
    cent_mats = {s: np.vstack([v for _, v in lst]) for s, lst in by_s.items()}
    Q = np.asarray(qsvs, dtype=np.int64) if qsvs else np.zeros((0, m * block), dtype=np.int64)
    nq = Q.shape[0]
    # qtab[s]: (nq, ks_s) — query q's exact distance to centroid j of s
    qtab = {}
    for s, C in cent_mats.items():
        qsub = Q[:, s * block:(s + 1) * block]
        qd = qsub[:, None, :] - C[None, :, :]
        qtab[s] = np.einsum("qkb,qkb->qk", qd, qd)

    @F.pandas_udf("array<long>")
    def totals(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="object")
        if scale is not None:
            M = np.vstack(col.to_numpy()).astype(np.float64)
            SV = np.floor(M * scale + 0.5).astype(np.int64)
        else:
            SV = np.vstack(col.to_numpy()).astype(np.int64)
        n = SV.shape[0]
        out = np.zeros((n, nq), dtype=np.int64)
        for s in range(m):
            sub = SV[:, s * block:(s + 1) * block]
            C = cent_mats[s]
            diff = sub[:, None, :] - C[None, :, :]
            d = np.einsum("nkb,nkb->nk", diff, diff)
            pos = np.argmin(d, axis=1)        # first min = smallest cid
            out += qtab[s][:, pos].T
        return pd.Series(list(out))

    return totals


def recall_totals_udf(cents: list, qsvs: list, m: int, block: int,
                      scale: float):
    """pandas_udf for the ANN-recall evaluation: RAW embedding
    (array<float>) -> length-2·nq array<double> where positions
    [0, nq) hold the per-query exact PQ-ADC totals (int64 values —
    exactly representable, bounded far below 2^53) and positions
    [nq, 2·nq) the per-query exact quantized cosines.

    ONE kernel produces both sides of a recall@k evaluation — the
    approximate index ranking (pq_adc_totals_udf's arithmetic, exact
    ints) and the brute-force ground truth (ivf_cos_udf's derived-float
    cosine contract: exact int Gram / product of two sqrts) — so each
    corpus vector crosses the Arrow boundary ONCE and the downstream
    plan needs a single exchange (the per-query window) to rank both.
    Quantization happens in-kernel from the raw floats; every value is
    bit-identical to the two-operator composition the SQL twin runs.
    """
    by_s = {}
    for s, cid, cvec in sorted((c["s"], c["cid"], c["cvec"]) for c in cents):
        by_s.setdefault(int(s), []).append(
            (int(cid), np.asarray(cvec, dtype=np.int64)))
    cent_mats = {s: np.vstack([v for _, v in lst]) for s, lst in by_s.items()}
    Q = (np.asarray(qsvs, dtype=np.int64) if qsvs
         else np.zeros((0, m * block), dtype=np.int64))
    nq = Q.shape[0]
    qtab = {}
    for s, C in cent_mats.items():
        qsub = Q[:, s * block:(s + 1) * block]
        qd = qsub[:, None, :] - C[None, :, :]
        qtab[s] = np.einsum("qkb,qkb->qk", qd, qd)
    qrt = np.sqrt(np.einsum("qd,qd->q", Q, Q).astype(np.float64))

    @F.pandas_udf("array<double>")
    def totals(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="object")
        M = np.vstack(col.to_numpy()).astype(np.float64)
        SV = np.floor(M * scale + 0.5).astype(np.int64)
        n = SV.shape[0]
        ap = np.zeros((n, nq), dtype=np.int64)
        for s in range(m):
            sub = SV[:, s * block:(s + 1) * block]
            C = cent_mats[s]
            diff = sub[:, None, :] - C[None, :, :]
            d = np.einsum("nkb,nkb->nk", diff, diff)
            pos = np.argmin(d, axis=1)        # first min = smallest cid
            ap += qtab[s][:, pos].T
        n2 = np.einsum("nd,nd->n", SV, SV)
        rt = np.sqrt(n2.astype(np.float64))
        Gq = (SV @ Q.T).astype(np.float64)    # exact: |idot| < 2^53
        ex = Gq / (rt[:, None] * qrt[None, :])
        # the ADC totals ride the double output column; their int64
        # values must stay exactly representable or the bit-identity
        # contract with pq_topk's pure-long path silently breaks
        if ap.size and int(ap.max()) > (1 << 53):
            raise ValueError(
                "recall_totals_udf: ADC total exceeds 2^53 and cannot "
                "round-trip through the double output exactly — "
                "embeddings are far outside the expected unit-norm "
                "scale; use the composed cosine_topk+pq_topk paths")
        return pd.Series(list(np.concatenate(
            [ap.astype(np.float64), ex], axis=1)))

    return totals


def ivfpq_totals_udf(ivf_cents: list, probe_sets: list, pq_cents: list,
                     qsvs: list, m: int, block: int):
    """pandas_udf: scaled vector sv -> per-query ADC totals restricted to
    IVF-probed lists (array<long>; position qi holds the exact int64 ADC
    total when this row's IVF list is in query qi's probe set, else -1).

    The whole IVF-PQ search side fused into ONE map stage: the kernel
    assigns the row's IVF list (cosine argmax over ``ivf_cents`` — exact
    ties to the LARGEST cid, matching array_max over (cos, cid)), its PQ
    codes (int64 argmin over ``pq_cents`` — ties to the smallest cid),
    and sums each probing query's precomputed distance table at those
    codes. ADC totals are >= 0, so -1 is a safe "not probed" sentinel
    for the downstream posexplode + filter. All model inputs are
    KB-sized driver values (closure-shipped broadcast equivalents); all
    arithmetic is exact int64 / derived-float, bit-identical to the SQL
    joins the DuckDB oracle runs.
    """
    # IVF side (ivf_assign_udf's layout: descending cid, argmax keeps first)
    rows = sorted(((int(c["cid"]), np.asarray(c["cv"], dtype=np.int64),
                    int(c["cn2"])) for c in ivf_cents), reverse=True)
    icids = np.array([cid for cid, _, _ in rows], dtype=np.int64)
    IC = np.vstack([cv for _, cv, _ in rows])
    icrt = np.sqrt(np.array([cn2 for _, _, cn2 in rows], dtype=np.float64))
    # probe membership: (nq, max_cid+1) boolean
    nq = len(probe_sets)
    max_cid = int(icids.max()) if len(icids) else 0
    probe_bool = np.zeros((nq, max_cid + 1), dtype=bool)
    for qi, cids in enumerate(probe_sets):
        for cid in cids:
            probe_bool[qi, int(cid)] = True
    # PQ side (pq_codes_udf's layout: ascending cid, argmin keeps first)
    by_s = {}
    for s, cid, cvec in sorted((c["s"], c["cid"], c["cvec"]) for c in pq_cents):
        by_s.setdefault(int(s), []).append(
            (int(cid), np.asarray(cvec, dtype=np.int64)))
    cent_mats = {s: np.vstack([v for _, v in lst]) for s, lst in by_s.items()}
    Q = (np.asarray(qsvs, dtype=np.int64) if qsvs
         else np.zeros((0, m * block), dtype=np.int64))
    qtab = {}
    for s, C in cent_mats.items():
        qsub = Q[:, s * block:(s + 1) * block]
        qd = qsub[:, None, :] - C[None, :, :]
        qtab[s] = np.einsum("qkb,qkb->qk", qd, qd)

    @F.pandas_udf("array<long>")
    def totals(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="object")
        SV = np.vstack(col.to_numpy()).astype(np.int64)
        n = SV.shape[0]
        n2 = np.einsum("nd,nd->n", SV, SV)
        G = (SV @ IC.T).astype(np.float64)     # exact: |idot| < 2^53
        cos = G / (np.sqrt(n2.astype(np.float64))[:, None] * icrt[None, :])
        cid = icids[np.argmax(cos, axis=1)]    # this row's IVF list
        tot = np.zeros((n, nq), dtype=np.int64)
        for s in range(m):
            sub = SV[:, s * block:(s + 1) * block]
            C = cent_mats[s]
            diff = sub[:, None, :] - C[None, :, :]
            d = np.einsum("nkb,nkb->nk", diff, diff)
            pos = np.argmin(d, axis=1)         # first min = smallest cid
            tot += qtab[s][:, pos].T
        probed = probe_bool[:, cid].T          # (n, nq)
        return pd.Series(list(np.where(probed, tot, np.int64(-1))))

    return totals


def minhash_sig_udf(family: list, n: int, hash_p: int, shingle_c: int):
    """pandas_udf: raw text -> k-member MinHash signature (array<long>,
    null when the document has fewer than ``n`` tokens).

    The NUMERICALLY IDENTICAL twin of dedup.with_minhash's HOF pipeline
    (token md5 → rolling-polynomial shingles → k universal-hash minima),
    one kernel call per document instead of ~k·T interpreted lambda
    evals. Exactness: the token hash is hashlib.md5 — bit-identical
    digests to JVM/DuckDB md5 — parsed exactly like md5_long
    (int(hexdigest[:15], 16), 60 bits) then reduced mod ``hash_p``; all
    downstream arithmetic is int64 modular math on values < 2^62, so
    numpy, Spark HOFs, and DuckDB produce the same integers. Token
    hashes are memoized per batch (documents share most tokens), which
    is where the kernel beats the JVM path: the md5+conv+decimal
    pipeline re-hashes every occurrence.
    """
    import hashlib

    fam_a = np.array([a for a, _ in family], dtype=np.int64)
    fam_b = np.array([b for _, b in family], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def sig(col: pd.Series) -> pd.Series:
        memo: dict = {}

        def th_of(tok: str) -> int:
            v = memo.get(tok)
            if v is None:
                v = int(hashlib.md5(tok.encode()).hexdigest()[:15],
                        16) % hash_p
                memo[tok] = v
            return v

        out = []
        for t in col:
            toks = t.split(" ")
            T = len(toks)
            if T < n:
                out.append(None)
                continue
            th = np.fromiter((th_of(tok) for tok in toks),
                             dtype=np.int64, count=T)
            w = T - n + 1
            acc = th[:w].copy()
            for j in range(1, n):
                acc = (acc * shingle_c + th[j:j + w]) % hash_p
            mh = ((fam_a[:, None] * acc[None, :] + fam_b[:, None])
                  % hash_p).min(axis=1)
            out.append(mh.tolist())
        return pd.Series(out)

    return sig


def ivf_cos_udf(cents: list, probe_sets: list, qsvs: list, scale: float):
    """pandas_udf: RAW embedding (array<float>) -> per-query exact
    cosines restricted to IVF-probed lists (array<double>; position qi
    holds the derived-float cosine when this row's IVF list is in query
    qi's probe set, else -9.0 — cosines live in [-1, 1], so the sentinel
    is filter-safe). Quantization (floor(x·scale + 0.5) → int64) happens
    INSIDE the kernel, exactly as srp_sig_udf does — the scan ships raw
    floats and pays no interpreted int_vec HOF.

    The whole IVF-flat search side fused into ONE map stage (the
    ivfpq_totals_udf shape with exact cosines instead of ADC totals):
    assign the row's list (argmax over the same derived-float centroid
    cosines as the SQL twin, exact ties to the LARGEST cid), check probe
    membership, and score against every probing query's vector — one
    int64 matmul per batch, each corpus vector moves once, and the only
    shuffle left downstream is the per-query top-k window. Cosine is the
    derived-float contract (exact int Gram / product of two sqrts — the
    same three IEEE roundings as the HOF fold), so the output is
    bit-identical to the assign→probe-join→score formulation.
    """
    rows = sorted(((int(c["cid"]), np.asarray(c["cv"], dtype=np.int64),
                    int(c["cn2"])) for c in cents), reverse=True)
    icids = np.array([cid for cid, _, _ in rows], dtype=np.int64)
    IC = np.vstack([cv for _, cv, _ in rows])
    icrt = np.sqrt(np.array([cn2 for _, _, cn2 in rows], dtype=np.float64))
    nq = len(probe_sets)
    max_cid = int(icids.max()) if len(icids) else 0
    probe_bool = np.zeros((nq, max_cid + 1), dtype=bool)
    for qi, cids in enumerate(probe_sets):
        for cid in cids:
            probe_bool[qi, int(cid)] = True
    Q = (np.asarray(qsvs, dtype=np.int64) if qsvs
         else np.zeros((0, IC.shape[1]), dtype=np.int64))
    qrt = np.sqrt(np.einsum("qd,qd->q", Q, Q).astype(np.float64))
    _require_nonzero_norms(icrt, "centroid")
    _require_nonzero_norms(qrt, "query vector")

    @F.pandas_udf("array<double>")
    def cosines(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="object")
        M = np.vstack(col.to_numpy()).astype(np.float64)
        SV = np.floor(M * scale + 0.5).astype(np.int64)
        n2 = np.einsum("nd,nd->n", SV, SV)
        rt = np.sqrt(n2.astype(np.float64))
        _require_nonzero_norms(rt, "input vector")
        Gc = (SV @ IC.T).astype(np.float64)    # exact: |idot| < 2^53
        ccos = Gc / (rt[:, None] * icrt[None, :])
        cid = icids[np.argmax(ccos, axis=1)]   # this row's IVF list
        Gq = (SV @ Q.T).astype(np.float64)     # (n, nq) exact int Gram
        qcos = Gq / (rt[:, None] * qrt[None, :])
        probed = probe_bool[:, cid].T          # (n, nq)
        return pd.Series(list(np.where(probed, qcos, -9.0)))

    return cosines


def ivf_assign_udf(cents: list, scale: float | None = None):
    """pandas_udf: scaled vector sv -> nearest-centroid cid (long).
    With ``scale`` set, the input is the RAW float embedding and the
    1e-6-grid quantization happens inside the kernel (srp_sig_udf
    discipline) — arithmetic identical either way.

    ``cents`` is the collected [(cid, cv, cn2)] centroid table. Cosines
    are the derived-float contract (exact int Gram row / product of two
    sqrt floats — the same three IEEE roundings as the SQL expression),
    so even near-ties resolve identically; exact ties break to the
    LARGEST cid, matching array_max over (cos, cid) structs (centroids
    scanned in descending cid order, np.argmax keeps the first maximum).
    """
    rows = sorted(((int(c["cid"]), np.asarray(c["cv"], dtype=np.int64),
                    int(c["cn2"])) for c in cents), reverse=True)
    cids = np.array([cid for cid, _, _ in rows], dtype=np.int64)
    C = np.vstack([cv for _, cv, _ in rows])
    crt = np.sqrt(np.array([cn2 for _, _, cn2 in rows], dtype=np.float64))
    _require_nonzero_norms(crt, "centroid")

    @F.pandas_udf("long")
    def assign(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int64")
        if scale is not None:
            M = np.vstack(col.to_numpy()).astype(np.float64)
            SV = np.floor(M * scale + 0.5).astype(np.int64)
        else:
            SV = np.vstack(col.to_numpy()).astype(np.int64)
        n2 = np.einsum("nd,nd->n", SV, SV)
        rt = np.sqrt(n2.astype(np.float64))
        _require_nonzero_norms(rt, "input vector")
        G = (SV @ C.T).astype(np.float64)      # exact: |idot| < 2^53
        cos = G / (rt[:, None] * crt[None, :])
        return pd.Series(cids[np.argmax(cos, axis=1)])

    return assign


def ivf_assign_hier_udf(cents: list, n_groups: int,
                        scale: float | None = None):
    """pandas_udf: vector -> (gid, cid) via TWO-LEVEL routing — the
    O(n·(√k + k/√k)·d) answer to flat assignment's O(n·k·d), which
    becomes the dominant super-linear term once the cluster count
    scales with the corpus (SCALING.md round-9 part 3 #3: constant
    occupancy ⇒ k ∝ n).

    Level 1: super groups are built on the CENTROID table exactly the
    way the base quantizer builds centroids on vectors — init partition
    by ``cid % n_groups``, integer-mean super-centroid (floor(int-sum /
    count), the SAME two IEEE casts), then ONE Lloyd refinement: every
    centroid re-assigns to its max-cosine super (ties → largest gid)
    and super-centroids recompute as the integer mean of their refined
    members (a group left empty disappears) — the proximity grouping a
    real two-level quantizer has. Honest calibration: on THIS engine's
    hash-init centroids the refinement is often a no-op and flat/hier
    agreement reads ~57% (k=16, g=4) — hash-partition centroids are
    near-orthogonal noise directions (measured median pairwise cosine
    0.002), so level-1 routing is bounded by quantizer separation, not
    by the router; with separated (trained) centroids the grouping and
    routing sharpen accordingly, and dedup/probing correctness never
    depended on centroid quality (clusters only bound the pair space).
    A vector routes
    to its max-cosine refined super, then exact argmax over that
    group's member centroids only (ties → largest cid). Routing is
    approximate exactly the way IVF probing is and deterministic:
    every cosine is the derived-float contract over exact ints, so the
    SQL twin reproduces the whole construction bit-for-bit.

    Returns a struct<gid: long, cid: long> column."""
    rows = sorted(((int(c["cid"]), np.asarray(c["cv"], dtype=np.int64),
                    int(c["cn2"])) for c in cents), reverse=True)
    all_cids = np.array([cid for cid, _, _ in rows], dtype=np.int64)
    C_all = np.vstack([cv for _, cv, _ in rows])
    crt_all = np.sqrt(np.array([cn2 for _, _, cn2 in rows],
                               dtype=np.float64))
    _require_nonzero_norms(crt_all, "centroid")

    def _super_means(membership: dict[int, list]) -> tuple:
        g_ids = np.array(sorted(membership, reverse=True), dtype=np.int64)
        g_vs = []
        for g in g_ids:
            mem = membership[int(g)]
            s = np.sum(np.vstack([cv for _, cv in mem]).astype(np.int64),
                       axis=0)
            g_vs.append(np.floor(s.astype(np.float64)
                                 / float(len(mem))).astype(np.int64))
        gv = np.vstack(g_vs)
        grt = np.sqrt(np.einsum("gd,gd->g", gv, gv).astype(np.float64))
        _require_nonzero_norms(grt, "super-centroid (integer mean)")
        return g_ids, gv, grt

    # init: hash-arbitrary partition of centroid ids
    init: dict[int, list] = {}
    for cid, cv, _ in rows:
        init.setdefault(cid % n_groups, []).append((cid, cv))
    gids0, GV0, grt0 = _super_means(init)
    # ONE refinement: centroids re-assign to max-cosine init super
    ccos = ((C_all @ GV0.T).astype(np.float64)
            / (crt_all[:, None] * grt0[None, :]))
    csel = gids0[np.argmax(ccos, axis=1)]
    refined: dict[int, list] = {}
    for (cid, cv, _), g in zip(rows, csel):
        refined.setdefault(int(g), []).append((cid, cv))
    gids, GV, grt = _super_means(refined)
    # per refined group: member cid/centroid matrices, descending cid
    mem_c = {int(g): (np.array([cid for cid, _ in refined[int(g)]],
                               dtype=np.int64),
                      np.vstack([cv for _, cv in refined[int(g)]]),
                      np.sqrt(np.array(
                          [float(sum(int(x) * int(x) for x in cv))
                           for _, cv in refined[int(g)]])))
             for g in gids}

    @F.pandas_udf("struct<gid: long, cid: long>")
    def assign(col: pd.Series) -> pd.DataFrame:
        if len(col) == 0:
            return pd.DataFrame({"gid": pd.Series([], dtype="int64"),
                                 "cid": pd.Series([], dtype="int64")})
        if scale is not None:
            M = np.vstack(col.to_numpy()).astype(np.float64)
            SV = np.floor(M * scale + 0.5).astype(np.int64)
        else:
            SV = np.vstack(col.to_numpy()).astype(np.int64)
        rt = np.sqrt(np.einsum("nd,nd->n", SV, SV).astype(np.float64))
        _require_nonzero_norms(rt, "input vector")
        gcos = (SV @ GV.T).astype(np.float64) / (rt[:, None] * grt[None, :])
        gsel = gids[np.argmax(gcos, axis=1)]
        cid_out = np.empty(len(SV), dtype=np.int64)
        for g in np.unique(gsel):
            mask = gsel == g
            cids_g, C_g, crt_g = mem_c[int(g)]
            cos = ((SV[mask] @ C_g.T).astype(np.float64)
                   / (rt[mask, None] * crt_g[None, :]))
            cid_out[mask] = cids_g[np.argmax(cos, axis=1)]
        return pd.DataFrame({"gid": gsel, "cid": cid_out})

    return assign


def query_topk_udf(cand_df, qvecs: dict, k: int, extra_col: str = None):
    """Per-query candidate scoring + top-k in one kernel.

    ``cand_df``: (query_id, neighbor_id, sv, n2) candidate rows, grouped
    by query_id; ``qvecs``: {query_id: (qsv list, qn2)} driver-side query
    vectors (KBs, closure-shipped). Emits (query_id, neighbor_id, rank,
    cosine) for the k best candidates per query — cosine is the derived-
    float contract (exact int Gram / product of sqrts, same roundings as
    the SQL expression), ordering cosine DESC then neighbor_id ASC, so
    the output is bit-identical to the join + HOF-fold + window twin.

    ``extra_col``: optional double column of ``cand_df`` carried through
    to the output unchanged (ivfpq_rerank_topk passes the ADC total that
    selected each candidate, avoiding a second read of the survivor
    table).
    """
    qnp = {int(q): (np.asarray(sv, dtype=np.int64), int(n2))
           for q, (sv, n2) in qvecs.items()}
    out_cols = ["query_id", "neighbor_id", "rank", "cosine"] + (
        [extra_col] if extra_col else [])

    def per_query(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(key[0])
        qv, qn2 = qnp[qid]
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        S = np.vstack(pdf["sv"].to_numpy()).astype(np.int64)
        n2 = pdf["n2"].to_numpy().astype(np.int64)
        G = (S @ qv).astype(np.float64)        # exact: |idot| < 2^53
        cos = G / (np.sqrt(n2.astype(np.float64)) * np.sqrt(float(qn2)))
        ids = pdf["neighbor_id"].to_numpy()
        order = np.lexsort((ids, -cos))[:k]
        out = {
            "query_id": np.full(len(order), qid, dtype=np.int64),
            "neighbor_id": ids[order],
            "rank": np.arange(1, len(order) + 1, dtype=np.int32),
            "cosine": cos[order],
        }
        if extra_col:
            out[extra_col] = pdf[extra_col].to_numpy()[order]
        return pd.DataFrame(out)

    schema = ("query_id long, neighbor_id long, rank int, cosine double"
              + (f", {extra_col} double" if extra_col else ""))
    return cand_df.groupBy("query_id").applyInPandas(per_query, schema)


def pq_totals_from_codes_udf(cents: list, qsvs: list, m: int, block: int):
    """pandas_udf: STORED PQ code array (array<int>, position s = cid) ->
    per-query ADC distance totals (array<long>) — the search half of the
    persisted-codes index. Identical tables and arithmetic to
    pq_adc_totals_udf, but the argmin already happened at encode time,
    so the scan reads m ints per vector and never touches raw
    embeddings; cid -> table position resolves via searchsorted on the
    ascending cid arrays (codebook buckets can be sparse)."""
    by_s = {}
    for s, cid, cvec in sorted((c["s"], c["cid"], c["cvec"]) for c in cents):
        by_s.setdefault(int(s), []).append(
            (int(cid), np.asarray(cvec, dtype=np.int64)))
    cid_arrs = {s: np.array([cid for cid, _ in lst], dtype=np.int64)
                for s, lst in by_s.items()}
    cent_mats = {s: np.vstack([v for _, v in lst]) for s, lst in by_s.items()}
    Q = (np.asarray(qsvs, dtype=np.int64) if qsvs
         else np.zeros((0, m * block), dtype=np.int64))
    nq = Q.shape[0]
    qtab = {}
    for s, C in cent_mats.items():
        qsub = Q[:, s * block:(s + 1) * block]
        qd = qsub[:, None, :] - C[None, :, :]
        qtab[s] = np.einsum("qkb,qkb->qk", qd, qd)

    @F.pandas_udf("array<long>")
    def totals(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="object")
        CO = np.vstack(col.to_numpy()).astype(np.int64)   # (n, m) codes
        n = CO.shape[0]
        out = np.zeros((n, nq), dtype=np.int64)
        for s in range(m):
            # membership check (ADVICE r4): a stored code that is not a
            # codebook cid means the codes table and the model disagree
            # (stale index / wrong model) — raise instead of silently
            # scoring against whatever row searchsorted lands on (or an
            # IndexError when the code exceeds the last cid).
            pos = np.searchsorted(cid_arrs[s], CO[:, s])
            bad = (pos >= len(cid_arrs[s])) | (
                cid_arrs[s][np.minimum(pos, len(cid_arrs[s]) - 1)]
                != CO[:, s])
            if bad.any():
                raise ValueError(
                    f"pq_totals_from_codes: code {int(CO[bad, s][0])} in "
                    f"subspace {s} is not a codebook cid — codes table "
                    f"was not produced by this model")
            out += qtab[s][:, pos].T
        return pd.Series(list(out))

    return totals


def feature_hash_udf(dim: int):
    """pandas_udf: token array -> dim-wide signed-count feature vector
    (array<long>) via the hashing trick: each token hashes once (the
    portable 60-bit md5), and its ±1 contribution to feature d is bit d
    of the hash (d mod 60). Exact integer sums — bit-identical to the
    SQL list-HOF twin at any reduction order — so the output plugs
    straight into the int-grid similarity contract (idot/qcos) with no
    quantization step.

    Python hashlib runs per DISTINCT token per batch (memoized dict —
    the corpus vocabulary is far smaller than the token stream), then
    the ±1 expansion is one numpy take + sum per document.
    """
    import hashlib

    shifts = np.arange(dim, dtype=np.uint64) % 60
    memo: dict = {}

    def hrow(tok: str):
        r = memo.get(tok)
        if r is None:
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            r = (((np.uint64(h) >> shifts) & np.uint64(1))
                 .astype(np.int64) * 2 - 1)
            memo[tok] = r
        return r

    @F.pandas_udf("array<long>")
    def feats(col: pd.Series) -> pd.Series:
        out = []
        for toks in col:
            if toks is None or len(toks) == 0:
                out.append(np.zeros(dim, dtype=np.int64))
                continue
            M = np.stack([hrow(t) for t in toks])
            out.append(M.sum(axis=0, dtype=np.int64))
        return pd.Series(out)

    return feats
