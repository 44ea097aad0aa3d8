"""Physical-plan census over the whole registry: the scale-shape audit.

For every registry query (built lazily at sf0.001 — plans, never results),
counts the operators that decide 100 TB behavior and writes ONE JSON file:

- ``exchanges``: shuffle boundaries (Exchange hashpartitioning / rangepartitioning
  / SinglePartition) — every one is a full-data network pass at scale;
- ``broadcasts``: BroadcastExchange (small-side joins — the GOOD join);
- ``cartesian`` / ``bnlj``: CartesianProduct and BroadcastNestedLoopJoin —
  the quadratic plans that must never appear on a data-sized side;
- ``codegen_spans``: WholeStageCodegen regions (JVM-side fused pipelines);
- ``python_evals``: ArrowEvalPython / BatchEvalPython / FlatMapGroupsInPandas
  / MapInPandas / FlatMapCoGroupsInPandas — the Arrow/Python boundary, the
  deliberate slow path (multimodal stubs, cogrouped KNN kernels, stateful
  streaming); anything unexpected here is a regression;
- ``pushed_filters`` / ``partition_filters``: scans that reach parquet with
  predicate pushdown / partition pruning.

Streaming queries (which execute eagerly through a memory sink) and the few
store-building queries are censused over their BATCH-visible plan or skipped
with a note — the census is a static audit, not a run.

Usage: python tools/plan_census.py [out.json]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"

#: queries whose registry callable executes eagerly (streaming memory-sink
#: round-trips, store builders with driver-side counts) — a lazy plan isn't
#: reachable without running them, so the census skips rather than times out.
EAGER = {
    "stream_windowed_counts",
    "stream_distinct_pairs",
    "stream_sessionization",
    "stream_user_totals_stateful",
    "stream_nation_event_revenue",
    "stream_stream_join",
    "pipeline_global_shuffle",  # seeded permutation: collects shard ranks
    "sim_ivf_recall",  # anchor rows: scalar built from two executed arms
    "sim_ivf_delta_search",
    "ml_est_kmeans_wssse",
    "ml_est_linreg_rmse",
    "ml_est_logreg_acc",
    "ml_est_als_mse",
    "ml_est_als_rec_topk",
    "ml_est_clf_acc_anchors",
    "ml_est_reg_rmse_anchors",
    "ml_est_lda_ppx",
    "ml_est_spca_energy",
    "graph_betweenness_overlap",
}

#: queries whose plan legitimately contains a CartesianProduct: spark.ml's
#: ``recommendForUserSubset`` blockifies the (bounded, 50-user) factor
#: subset and cross-joins it against item-factor blocks internally — the
#: cross is user-capped by construction, not data×data. Anything NOT
#: listed here that plans a cartesian fails the census (exit 1).
KNOWN_CARTESIAN = {"ml_est_als_recommend"}

PATTERNS = {
    "exchanges": r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
    "broadcasts": r"\bBroadcastExchange\b",
    "cartesian": r"\bCartesianProduct\b",
    "bnlj": r"\bBroadcastNestedLoopJoin\b",
    "codegen_spans": r"\*\(\d+\)",
    "python_evals": (
        r"\b(?:ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas"
        r"|MapInPandas|FlatMapCoGroupsInPandas)\b"
    ),
    "pushed_filters": r"PushedFilters: \[[^\]]",
    "partition_filters": r"PartitionFilters: \[[^\]]",
}


def census(plan: str) -> dict[str, int]:
    out = {}
    for key, pat in PATTERNS.items():
        if key == "codegen_spans":
            out[key] = len(set(re.findall(pat, plan)))
        else:
            out[key] = len(re.findall(pat, plan))
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    from spark_ml_algo_lib_master_tongji_spark.registry import build_registry

    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLAN_CENSUS.json"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-census")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()
    rows: dict[str, dict] = {}
    totals = {k: 0 for k in PATTERNS}
    for name, fn in reg.items():
        if name in EAGER:
            rows[name] = {"skipped": "eager-execution query (no lazy plan)"}
            continue
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().toString()
        except Exception as ex:  # noqa: BLE001 — census must finish
            rows[name] = {"error": f"{type(ex).__name__}: {ex}"[:200]}
            continue
        c = census(plan.split("== Physical Plan ==")[-1])
        rows[name] = c
        for k, v in c.items():
            totals[k] += v
    unexpected = sorted(
        name
        for name, c in rows.items()
        if c.get("cartesian") and name not in KNOWN_CARTESIAN
    )
    for name in unexpected:
        print(f"!! {name}: unexpected CartesianProduct", file=sys.stderr)
    doc = {
        "sf": SF,
        "totals": totals,
        "known_cartesian": sorted(KNOWN_CARTESIAN),
        "unexpected_cartesian": unexpected,
        "queries": rows,
    }
    Path(out_path).write_text(json.dumps(doc, indent=1, sort_keys=True))
    print(
        f"{len(rows)} queries censused -> {out_path}; totals: "
        + ", ".join(f"{k}={v}" for k, v in totals.items())
    )
    return 1 if unexpected else 0


if __name__ == "__main__":
    raise SystemExit(main())
