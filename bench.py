"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol mirrors the reference's costTime measurement: each query is timed
end-to-end (plan + execute + materialize via count) after a warm-up of the
session (``KMeansRunner.scala:132-133,156``; ``Utils.scala:150-161``).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from spark_ml_algo_lib_master_tongji_spark.registry import build_registry
    from spark_ml_algo_lib_master_tongji_spark.session import get_session

    spark = get_session(app_name="bench")
    # Warm up the JVM + parquet footer cache so per-query times measure the
    # plan, not session startup.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    total = 0.0
    rows: dict[str, int] = {}
    errors: dict[str, str] = {}
    # One bad query must cost one entry, never the whole artifact
    # (round 2: a single registry crash zeroed BENCH_r02.json).
    from pyspark.storagelevel import StorageLevel

    for name, fn in build_registry().items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            # Persist-then-count forces FULL materialization of every output
            # column. A bare count() lets Catalyst eliminate aggregated-
            # unique outer joins (and everything beneath them) — e.g. the
            # triangle relation and the dedup canonical-label joins timed as
            # ~0.8s while their real computation was 3-18s. The reference's
            # costTime includes saving the full output (saveAsTextFile,
            # ``PageRankRunner.scala:115``), so materializing all columns is
            # the faithful protocol. Only a fresh (uncached) frame is
            # persisted/unpersisted, so session-shared derivations returned
            # directly by a query keep their cache for later queries.
            fresh = df.storageLevel == StorageLevel.NONE
            if fresh:
                df.persist(StorageLevel.MEMORY_AND_DISK)
            n = df.count()
        except Exception as exc:  # noqa: BLE001 - record and continue
            dt = time.perf_counter() - t0
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"# {name}: ERROR after {dt:.3f}s: {errors[name]}", file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        if fresh:
            df.unpersist(blocking=False)
        timings[name] = round(dt, 4)
        rows[name] = n
        total += dt
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    # Reference-protocol run report (Utils.scala:150-161): params + costTime
    # + evaluation per bench invocation, one YAML artifact.
    try:
        from spark_ml_algo_lib_master_tongji_spark.report import write_run_report

        write_run_report(
            "bench",
            {"sf_dir": sf_dir, "n_queries": len(timings)},
            cost_time_s=total,
            evaluation={f"rows_{k}": v for k, v in sorted(rows.items())[:5]},
            out_dir=os.path.join(os.path.dirname(__file__), "report"),
        )
    except Exception as exc:  # noqa: BLE001 - report failure must not fail bench
        print(f"# report write skipped: {exc}", file=sys.stderr)

    # Stdout carries EXACTLY one line, compact separators + 2-decimal
    # timings, so the driver's tail-capture can parse it whole (round-1
    # BENCH_r01.json recorded ``"parsed": null`` — the default-separator,
    # 4-decimal line was truncated mid-JSON by the capture window).
    # The driver keeps only the LAST ~2000 chars, so the queries dict is
    # emitted in REVERSE registry order (tier-1 priority window last) and
    # value/errors/sf go after it — whatever gets cut is the low-priority
    # head, never the priority timings or the total (round-3 verdict item 2:
    # the tail capture dropped louvain and the tier-1 window entirely).
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "unit": "sec",
                "queries": {k: round(timings[k], 2) for k in reversed(timings)},
                **({"errors": errors} if errors else {}),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "value": round(total, 2),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
