"""Documents-only scaled corpus for the id-derived scaling curves
(x62 canonical-URL dedup, x65 PageRank — both read ONLY doc_id; the
text column is pruned at the scan by both engines, so replicas reuse
the source text unchanged instead of paying make_scale10's token
prefixing, which exists for shingle-disjointness that these operators
never observe).

Usage: python scripts/make_scale_docs.py --factor 30 [--src ...]
       [--out /tmp/scale{factor}docs]
Every non-documents table is symlinked from --src so tables.load works.
"""
from __future__ import annotations

import argparse
import os

import duckdb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--prefix-tokens", action="store_true",
                    help="make replica shingle sets DISJOINT (make_scale10's "
                    "r{k}_ token prefix) so shingle/banding operators scale "
                    "linearly — required for x06/x15/x41/x48-style probes; "
                    "without it every replica is an exact text duplicate "
                    "and pair volume is quadratic corpus artifact")
    ap.add_argument("--mutate-near-dup", action="store_true",
                    help="NON-disjoint growth (r13, VERDICT r12 #3): each "
                    "replica k MUTATES its source doc by replacing every "
                    "token whose hash is 0 mod m(k) with a replica-specific "
                    "marker, m cycling over {6, 9, 15, 30} — expected "
                    "changed-shingle fraction ~3/m, so replica-vs-original "
                    "3-gram Jaccard lands in a controlled band "
                    "(~0.41/0.55/0.69/0.82) straddling x85's tau=0.5. "
                    "Near-dup mass then GROWS with the factor (every "
                    "anchor gains ~factor/2 true partners), which is the "
                    "real-corpus regime the disjoint modes deliberately "
                    "exclude")
    args = ap.parse_args()
    out = args.out or f"/tmp/scale{args.factor}docs"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    docs = f"{args.src}/documents.parquet"
    n = con.execute(f"SELECT MAX(doc_id) + 1 FROM '{docs}'").fetchone()[0]
    if args.mutate_near_dup:
        con.execute(f"""
        COPY (
            SELECT doc_id, text, lang, source, n_chars FROM '{docs}'
            UNION ALL
            SELECT d.doc_id + k.k * {n},
                   array_to_string(list_transform(
                       string_split(d.text, ' '),
                       t -> CASE WHEN hash(t) % (CASE k.k % 4
                                 WHEN 0 THEN 6 WHEN 1 THEN 9
                                 WHEN 2 THEN 15 ELSE 30 END) = 0
                            THEN 'r' || k.k || 'x' ELSE t END), ' ') AS text,
                   d.lang, d.source, d.n_chars
            FROM '{docs}' d, (SELECT unnest(range(1, {args.factor})) AS k) k
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """)
    elif args.prefix_tokens:
        con.execute(f"""
        COPY (
            SELECT doc_id, text, lang, source, n_chars FROM '{docs}'
            UNION ALL
            SELECT d.doc_id + k.k * {n},
                   array_to_string(list_transform(
                       string_split(d.text, ' '),
                       t -> 'r' || k.k || '_' || t), ' ') AS text,
                   d.lang, d.source, d.n_chars
            FROM '{docs}' d, (SELECT unnest(range(1, {args.factor})) AS k) k
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """)
    else:
        con.execute(f"""
        COPY (
            SELECT d.doc_id + k.k * {n} AS doc_id, d.text, d.lang,
                   d.source, d.n_chars
            FROM '{docs}' d, (SELECT unnest(range(0, {args.factor})) AS k) k
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        dst = f"{out}/{t}.parquet"
        # Re-point unconditionally (ADVICE r7): skipping existing links
        # after a --src change would leave a silently mixed corpus —
        # fresh documents.parquet next to stale old-source symlinks.
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(f"{args.src}/{t}.parquet", dst)
    print("wrote", out, "docs =", n * args.factor)


if __name__ == "__main__":
    main()
