"""Synthesize a sf1-scale fixture from sf0.1 for scale-evidence runs.

Replicates every sf0.1 table FACTOR× with per-replica key offsets so all
foreign-key joins stay valid and the co-purchase graph becomes FACTOR
disjoint copies of the sf0.1 graph (row counts, join fan-outs, and graph
|V|/|E| all scale ~linearly — the right shape for measuring scaling
exponents; dimension tables region/nation stay fixed like real TPC-H).

Caveat recorded in PLANS.md: document texts and embedding vectors repeat
across replicas, so dedup/similarity queries see FACTOR-sized duplicate
groups — a *worst-case* collision load for the LSH paths, not an organic
one. ``--mutate-docs PCT`` fixes that for the text family (round-9
verdict item 4): in replicas k>0, a seeded PCT% of each document's
tokens get a per-replica suffix, so replica texts are near- rather than
exact duplicates and per-gram document frequency no longer multiplies by
FACTOR — hot-fingerprint (winnow over-cap) selectivity at sf1 then
resembles organic sf0.1 instead of the everything-over-cap artifact.
The mutation is deterministic (hash of doc_id/position/replica), so
re-runs produce byte-identical fixtures.

Usage: python tools/scale_testdata.py [--src DIR] [--out DIR] [--factor N]
Writes DIR/*.parquet (default /root/repo/testdata_sf1, factor 10); --src
defaults to $SPARK_GRAFT_SF_DIR like bench.py, so the tool has no baked-in
machine path (round-5 ADVICE).
"""

from __future__ import annotations

import argparse
import os

import duckdb

DEFAULT_SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: table → columns shifted by (replica · family_offset); offsets are per
#: key family so e.g. l_orderkey and o_orderkey shift identically.
KEYED = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    # user_id is a customer key: stream_nation_event_revenue joins
    # events.user_id = customer.c_custkey, so it must shift with the
    # custkey family or replica events attach to replica-0 customers.
    "events": {"event_id": "event_id", "user_id": "custkey"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_AS_IS = ("region", "nation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=DEFAULT_SRC)
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--mutate-docs",
        type=int,
        default=0,
        metavar="PCT",
        help="percent of tokens to suffix per replica (k>0) in "
        "documents.text — makes replicas near- instead of exact "
        "duplicates so sketch-df statistics scale organically",
    )
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of keyed tables to build (dimension "
        "tables are always copied) — e.g. 'documents,embeddings' for a "
        "second-decade fixture of just the text/density families without "
        "paying for an 18M-row lineitem",
    )
    args = ap.parse_args()
    src = args.src
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    keyed = KEYED
    if args.tables:
        want = set(args.tables.split(","))
        unknown = want - set(KEYED)
        if unknown:
            raise SystemExit(f"unknown tables: {sorted(unknown)}")
        keyed = {t: c for t, c in KEYED.items() if t in want}

    offsets: dict[str, int] = {}
    for table, cols in keyed.items():
        for col, family in cols.items():
            m = con.execute(
                f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
            offsets[family] = max(offsets.get(family, 0), int(m) + 1)

    for table in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{args.out}/{table}.parquet' (FORMAT parquet)"
        )
        print(f"{table}: copied")

    for table, cols in keyed.items():
        shifted = ", ".join(
            f"{col} + r.k * {offsets[family]} AS {col}" for col, family in cols.items()
        )
        schema = con.execute(
            f"SELECT * FROM read_parquet('{src}/{table}.parquet') LIMIT 0"
        ).df().columns
        others = ", ".join(f'"{n}"' for n in schema if n not in cols)
        sel = shifted + (", " + others if others else "")
        if table == "documents" and args.mutate_docs:
            # seeded per-(doc, position, replica) token suffixing; replica
            # 0 stays byte-identical to the source corpus
            mut = (
                "array_to_string(list_transform(string_split(text, ' '), "
                "(t, i) -> CASE WHEN r.k > 0 AND "
                f"hash(doc_id * 1000003 + i * 7919 + r.k) % 100 "
                f"< {args.mutate_docs} "
                "THEN t || '~' || r.k ELSE t END), ' ') AS text"
            )
            sel = sel.replace('"text"', mut)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{table}.parquet'), "
            f"(SELECT unnest(range({args.factor})) AS k) r) "
            f"TO '{args.out}/{table}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
