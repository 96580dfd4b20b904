"""Structured 2M-vector corpus for the routed-semantic-dedup OUTPUT
validation (VERDICT r10 #5): the test fixture's jittered-direction-
family shape at scale. Family f's direction is two-hot — 1000 on axis
f and 150+10f on axis (f+1) mod dim — so families are pairwise
separated (near-orthogonal) while members differ only by a small
deterministic hash jitter. This is the corpus class where Lloyd
training SHOULD recover separated centroids and the agreement-gated
auto router SHOULD engage; contrast with make_scale_emb's independent
hash-random vectors, where the r10 probe measured 15% agreement and
the gate must fall back to flat.

Deterministic end-to-end (duckdb hash jitter, no RNG state).

Usage: python scripts/make_struct_emb.py --vectors 2000000
       [--families 64] [--dim 64] [--out /tmp/structemb]
Every non-embeddings table is symlinked from --src so tables.load works.
"""
from __future__ import annotations

import argparse
import os

import duckdb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--vectors", type=int, default=2_000_000)
    ap.add_argument("--families", type=int, default=64)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--out", default="/tmp/structemb")
    args = ap.parse_args()
    if args.families > args.dim:
        raise SystemExit("families > dim would collide family axes")
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    f = f"(i % {args.families})"
    con.execute(f"""
    COPY (
        SELECT i AS vec_id,
               list_transform(range(0, {args.dim}), d -> CAST(
                   (CASE WHEN d = {f} THEN 1000.0
                         WHEN d = ({f} + 1) % {args.dim}
                         THEN 150.0 + 10.0 * {f}
                         ELSE 0.0 END)
                   + (CAST(hash(i || ':' || d) % 1001 AS BIGINT) - 500)
                     / 100.0
                   AS FLOAT)) AS embedding,
               'fam' || {f} AS label
        FROM range({args.vectors}) t(i)
    ) TO '{args.out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        dst = f"{args.out}/{t}.parquet"
        if not (os.path.islink(dst) or os.path.exists(dst)):
            os.symlink(f"{args.src}/{t}.parquet", dst)
    cnt = con.execute(
        f"SELECT COUNT(*) FROM '{args.out}/embeddings.parquet'").fetchone()[0]
    print("wrote", args.out, "vectors =", cnt,
          "families =", args.families)


if __name__ == "__main__":
    main()
