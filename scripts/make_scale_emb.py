"""Embeddings-only scaled corpus with INDEPENDENT replica vectors — the
valid instrument for ANN/semantic-dedup scaling at large factors.

make_scale10's embedding replicas are base + per-element hash noise,
tuned so pair structure stays linear at factor 10. At factor 100 that
construction densifies: 100 replicas of one base sit at ~0.6-0.76
cosine to each other — below any dedup threshold (no false dups) but
high enough to co-bucket under SRP banding, so candidate-pair volume
inside each replica group grows ~quadratically and the probe measures
the corpus artifact, not the operator. Realistic corpus growth adds
mostly-INDEPENDENT new vectors; this script generates replicas as pure
hash-random vectors on the source's value range (per-element
``hash(vec_id:k:i)`` uniform in [lo, hi]), keeping the label
distribution by inheriting the base row's label.

Usage: python scripts/make_scale_emb.py --factor 100 [--src ...]
       [--out /tmp/scale{factor}emb]
Every non-embeddings table is symlinked from --src so tables.load works.
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
    args = ap.parse_args()
    out = args.out or f"/tmp/scale{args.factor}emb"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    emb = f"{args.src}/embeddings.parquet"
    n = con.execute(f"SELECT MAX(vec_id) + 1 FROM '{emb}'").fetchone()[0]
    lo, hi = con.execute(
        f"SELECT MIN(u), MAX(u) FROM (SELECT UNNEST(embedding) AS u "
        f"FROM '{emb}')").fetchone()
    span = hi - lo
    con.execute(f"""
    COPY (
        SELECT vec_id, embedding, label FROM '{emb}'
        UNION ALL
        SELECT e.vec_id + k.k * {n},
               list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST({lo} + {span} * (
                       (hash(e.vec_id || ':' || k.k || ':' || i)
                        % 1000001) / 1e6) AS FLOAT)) AS embedding,
               e.label
        FROM '{emb}' e, (SELECT unnest(range(1, {args.factor})) AS k) k
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        dst = f"{out}/{t}.parquet"
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(f"{args.src}/{t}.parquet", dst)
    # actual row count, not MAX(vec_id)+1 * factor — with sparse vec_ids
    # the derived figure overstates (ADVICE r9)
    cnt = con.execute(
        f"SELECT COUNT(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print("wrote", out, "vectors =", cnt)


if __name__ == "__main__":
    main()
