"""Build the 10x scaling corpus from SCALING.md's recipe (documents +
embeddings), so scaling rows are reproducible instead of ad-hoc.

- documents x10: replicas k=1..9 prefix EVERY token with ``r{k}_`` so
  replica shingle sets are disjoint — pair structure scales linearly
  instead of piling up artificial near-duplicates.
- embeddings x10: replicas add per-element hash-random noise
  ``0.6 * ((hash(vec_id:k:i) % 1000001) / 1e6 - 0.5)`` — fixed-frequency
  sinusoid offsets are pairwise-correlated and silently densify the
  near-dup graph (see SCALING.md for the rejected constructions).

Usage: python scripts/make_scale10.py [--src /root/testdata/sf0.1]
       [--out /tmp/scale10]
"""
from __future__ import annotations

import argparse
import os

import duckdb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale10")
    ap.add_argument("--factor", type=int, default=10,
                    help="total scale multiple (replicas k=1..factor-1)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    docs = f"{args.src}/documents.parquet"
    n_docs = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM '{docs}'").fetchone()[0]
    con.execute(f"""
    COPY (
        SELECT doc_id, text, lang, source, n_chars FROM '{docs}'
        UNION ALL
        SELECT d.doc_id + k.k * {n_docs},
               array_to_string(list_transform(
                   string_split(d.text, ' '),
                   t -> 'r' || k.k || '_' || t), ' ') AS text,
               d.lang, d.source, d.n_chars
        FROM '{docs}' d, (SELECT unnest(range(1, {args.factor})) AS k) k
    ) TO '{args.out}/documents.parquet' (FORMAT PARQUET)
    """)

    emb = f"{args.src}/embeddings.parquet"
    n_vecs = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM '{emb}'").fetchone()[0]
    con.execute(f"""
    COPY (
        SELECT vec_id, embedding, label FROM '{emb}'
        UNION ALL
        SELECT e.vec_id + k.k * {n_vecs},
               list_transform(
                   list_zip(e.embedding,
                            range(1, len(e.embedding) + 1)),
                   p -> CAST(p[1] + 0.6 * (
                       (hash(e.vec_id || ':' || k.k || ':' || p[2])
                        % 1000001) / 1e6 - 0.5) AS FLOAT)) AS embedding,
               e.label
        FROM '{emb}' e, (SELECT unnest(range(1, {args.factor})) AS k) k
    ) TO '{args.out}/embeddings.parquet' (FORMAT PARQUET)
    """)

    ev = f"{args.src}/events.parquet"
    n_users = con.execute(
        f"SELECT MAX(user_id) + 1 FROM '{ev}'").fetchone()[0]
    n_events = con.execute(
        f"SELECT MAX(event_id) + 1 FROM '{ev}'").fetchone()[0]
    # events x10: replicas shift users into disjoint id ranges and slide
    # time by k hours so funnel/retention structure scales linearly
    # (disjoint users -> no artificial cross-replica funnels)
    con.execute(f"""
    COPY (
        SELECT event_id, ts, user_id, event_type, value, props FROM '{ev}'
        UNION ALL
        SELECT e.event_id + k.k * {n_events},
               e.ts + to_hours(k.k), e.user_id + k.k * {n_users},
               e.event_type, e.value, e.props
        FROM '{ev}' e, (SELECT unnest(range(1, {args.factor})) AS k) k
    ) TO '{args.out}/events.parquet' (FORMAT PARQUET)
    """)

    # orders/lineitem x10 (for pl01/u01 scaling rows): replicas shift
    # order keys and customer keys into disjoint ranges, so per-order
    # aggregates and per-customer windows scale linearly (no artificial
    # cross-replica payment piles); all other columns ride unchanged.
    orders = f"{args.src}/orders.parquet"
    li = f"{args.src}/lineitem.parquet"
    cust = f"{args.src}/customer.parquet"
    n_ok = con.execute(
        f"SELECT MAX(o_orderkey) + 1 FROM '{orders}'").fetchone()[0]
    # stride for custkey shifts comes from the CUSTOMER table (every
    # o_custkey is a valid c_custkey but not vice versa) so replicated
    # customer keys stay disjoint across replicas AND replicated orders
    # keep a matching customer row (ADVICE r5: shifting orders while
    # symlinking customer unscaled dangled ~90% of replica FKs, silently
    # dropping rows from any customer-joining query timed on scale10)
    n_ck = con.execute(
        f"SELECT MAX(c_custkey) + 1 FROM '{cust}'").fetchone()[0]
    for dst in (f"{args.out}/orders.parquet", f"{args.out}/lineitem.parquet",
                f"{args.out}/customer.parquet"):
        if os.path.islink(dst):
            os.unlink(dst)
    con.execute(f"""
    COPY (
        SELECT * FROM '{cust}'
        UNION ALL
        SELECT c.* REPLACE (c.c_custkey + k.k * {n_ck} AS c_custkey)
        FROM '{cust}' c, (SELECT unnest(range(1, {args.factor})) AS k) k
    ) TO '{args.out}/customer.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
        SELECT * FROM '{orders}'
        UNION ALL
        SELECT o.* REPLACE (o.o_orderkey + k.k * {n_ok} AS o_orderkey,
                            o.o_custkey + k.k * {n_ck} AS o_custkey)
        FROM '{orders}' o, (SELECT unnest(range(1, {args.factor})) AS k) k
    ) TO '{args.out}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
        SELECT * FROM '{li}'
        UNION ALL
        SELECT l.* REPLACE (l.l_orderkey + k.k * {n_ok} AS l_orderkey)
        FROM '{li}' l, (SELECT unnest(range(1, {args.factor})) AS k) k
    ) TO '{args.out}/lineitem.parquet' (FORMAT PARQUET)
    """)

    # the remaining tables are consumed by relational queries that the
    # scaling study doesn't re-time — symlink them so tables.load works
    for t in ("region", "nation", "supplier", "part"):
        dst = f"{args.out}/{t}.parquet"
        # Re-point unconditionally (ADVICE r7): a stale symlink to an
        # old --src would silently mix corpora on rerun.
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(f"{args.src}/{t}.parquet", dst)
    print("wrote", args.out, f"docs x{args.factor} =", n_docs * args.factor,
          f"vecs x{args.factor} =", n_vecs * args.factor)


if __name__ == "__main__":
    main()
