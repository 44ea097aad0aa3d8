"""Simulate the driver's verify pass against __spark_entry__.py.

Creates a *plain* SparkSession (not the engine's tuned factory — the driver
won't use it either), then: (1) smoke-runs entry(spark) on sf0.001,
(2) runs every queries() entry at sf0.01, (3) runs the matching oracle_sql()
on DuckDB over the same parquet, (4) compares row count + sorted column names
+ order-insensitive values. Prints a per-query verdict line and exits nonzero
on any mismatch.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9) + 0.0
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = e.entry(spark)
    rows = df.collect()
    print(f"entry: OK rows={len(rows)} cols={df.columns}")

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
    extra = set(oracles) - set(qs)
    if extra:
        print(f"FATAL: oracle keys missing from queries(): {extra}")
        return 1

    failed = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_ORACLE)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows-only rows={len(srows)} cols={scols}")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        if sorted(scols) != sorted(dcols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            failed.append(name)
            continue
        if len(srows) != len(drows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}")
            failed.append(name)
            continue
        ns, nd = norm_rows(scols, srows), norm_rows(dcols, drows)
        bad = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b]
        if bad:
            print(
                f"{name}: VALUE MISMATCH n={len(bad)} first: spark={ns[bad[0]]} "
                f"duck={nd[bad[0]]}"
            )
            failed.append(name)
        else:
            print(f"{name}: MATCH rows={len(srows)}")

    print(f"\n{len(qs) - len(failed)}/{len(qs)} ok; oracle-checked={len(oracles)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
