"""Targeted oracle check: driver_sim's exact compare for NAMED queries only.

Usage: python tools/check_query.py name [name ...]   (sf0.01, like the driver)

Same normalization/compare as tools/driver_sim.py — a green line here is the
same evidence as a driver MATCH, minus the full-suite runtime.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.driver_sim import SF_ORACLE, norm_rows  # noqa: E402


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    names = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-query")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name in names:
        sdf = qs[name](spark, SF_ORACLE)
        scols = list(sdf.columns)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows-only rows={len(srows)} cols={scols}")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        if sorted(scols) != sorted(dcols):
            print(
                f"{name}: SCHEMA MISMATCH spark={sorted(scols)} "
                f"duck={sorted(dcols)}"
            )
            failed.append(name)
            continue
        if len(srows) != len(drows):
            print(
                f"{name}: ROWCOUNT MISMATCH spark={len(srows)} "
                f"duck={len(drows)}"
            )
            failed.append(name)
            continue
        ns, nd = norm_rows(scols, srows), norm_rows(dcols, drows)
        bad = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b]
        if bad:
            print(
                f"{name}: VALUE MISMATCH n={len(bad)} first: "
                f"spark={ns[bad[0]]} duck={nd[bad[0]]}"
            )
            failed.append(name)
        else:
            print(f"{name}: MATCH rows={len(srows)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
