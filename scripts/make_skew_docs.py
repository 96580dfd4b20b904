"""Dominant-span skew corpus for the x48 fp-window straggler probe
(VERDICT r10 #3): a fraction of documents are PURE repetitions of one
4-token span, so every window in them shares ONE fingerprint — the
worst case for the fp-partitioned window (one partition holds that
fraction of all window rows). The rest are r-prefixed unique-token
documents (no cross-doc window collisions), mirroring
make_scale_docs --prefix-tokens so the non-hot mass stays linear.

Usage: python scripts/make_skew_docs.py --docs 500000 --hot-frac 0.2
       [--tokens 48] [--out /tmp/skewdocs]
Every non-documents table is symlinked from --src so tables.load works.
"""
from __future__ import annotations

import argparse
import os

import duckdb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--hot-frac", type=float, default=0.2)
    ap.add_argument("--tokens", type=int, default=48)
    ap.add_argument("--out", default="/tmp/skewdocs")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    mod = max(2, int(round(1.0 / args.hot_frac)))
    t = args.tokens
    con = duckdb.connect()
    # hot docs (doc_id % mod = 0): "hot hot ... hot" — t-3 identical
    # windows per doc, all one fingerprint. cold docs: tokens unique to
    # the doc (u<doc>_<i>) — every window fingerprint is globally unique.
    con.execute(f"""
    COPY (
        SELECT i AS doc_id,
               CASE WHEN i % {mod} = 0
                    THEN array_to_string(list_transform(range(1, {t + 1}),
                                                        x -> 'hot'), ' ')
                    ELSE array_to_string(list_transform(range(1, {t + 1}),
                         x -> 'u' || i || '_' || x), ' ')
               END AS text,
               'xx' AS lang, 'skew' AS source, CAST({t} AS BIGINT) AS n_chars
        FROM range({args.docs}) t(i)
    ) TO '{args.out}/documents.parquet' (FORMAT PARQUET)
    """)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        dst = f"{args.out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{args.src}/{name}.parquet", dst)
    n_hot = args.docs // mod
    print(f"wrote {args.out}: {args.docs} docs, {n_hot} hot "
          f"({n_hot * (t - 3)} one-fp window rows of "
          f"{args.docs * (t - 3)} total)")


if __name__ == "__main__":
    main()
