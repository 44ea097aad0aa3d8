"""Time individual registry queries in isolation (cold session per process).

Measurement protocol = bench.py's: ``benchlib.materialize`` persists the
output then counts it, forcing FULL materialization of every column — a bare
``count()`` lets Catalyst eliminate aggregated-unique outer joins and
everything beneath them (triangle/dedup shapes measured 0.5-0.8s while the
real cost was 3-18s). Each run also reports the loadDataTime/costTime split
(``KMeansRunner.scala:132-133``): ``load`` = session-shared derivation builds
first-touched by this query, ``cost`` = wall − load (the reference's
costTime analogue; on ``--runs N`` the N>1 runs are warm = pure cost).

Usage: python tools/time_query.py q1 [q2 ...] [--runs=N]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 1
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from spark_ml_algo_lib_master_tongji_spark import benchlib
    from spark_ml_algo_lib_master_tongji_spark.registry import build_registry
    from spark_ml_algo_lib_master_tongji_spark.session import get_session

    spark = get_session(app_name="time_query")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    reg = build_registry()
    for name in args:
        fn = reg[name]
        for r in range(runs):
            load0 = benchlib.load_seconds()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = benchlib.materialize(df)
            dt = time.perf_counter() - t0
            load = benchlib.load_seconds() - load0
            print(
                f"{name} run{r}: {dt:.3f}s (load {load:.2f}s, "
                f"cost {dt - load:.2f}s) rows={n}",
                flush=True,
            )


if __name__ == "__main__":
    main()
