"""Bucketed vs plain sketch-store sinks A/B (round-8 verdict item 5).

Question: does ``bucketBy(fp)``-ing the store's fps/winnow sinks drop the
store-side exchange of the delta joins, and what does that buy in wall
time? The regime bucketing exists for is "neither join side fits a
broadcast", so both arms run with autoBroadcastJoinThreshold = -1; the
plan-shape differential (2 exchanges → 1 on the fp join) is pinned by
``tests/test_plan_shapes.py::test_bucketed_store_sink_elides_store_side_exchange``.

Protocol (fair per PLANS round-7 notes): fresh session per arm (one arm
per process), unrelated warmup count, 3 runs with benchlib.materialize,
warm = min of runs 2-3.

Usage: python tools/bucketed_store_ab.py {plain|bucketed} [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_BUCKETS = 32


def main() -> None:
    arm = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from spark_ml_algo_lib_master_tongji_spark import benchlib
    from spark_ml_algo_lib_master_tongji_spark.operators import dedup
    from spark_ml_algo_lib_master_tongji_spark.session import get_session
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    spark = get_session(app_name=f"bucketed_ab_{arm}")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # JIT warmup

    cat = Catalog(spark, sf_dir)
    idx = dedup._dedup_index(cat)  # plain store build = one-time, untimed
    # BOTH arms join MATERIALIZED election/posting tables (the merged
    # min-election view is computed once, untimed) so the differential is
    # purely bucketed-vs-plain scan layout — round-10: delta_decisions no
    # longer carries a broadcast hint, so autoBroadcastJoinThreshold=-1
    # below genuinely forces the shuffle-join regime bucketing exists for.
    if arm == "bucketed":
        for t in ("ab_store_fps", "ab_store_winnow"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            # A fresh process's in-memory catalog does not know the table,
            # so the DROP is a no-op while the managed LOCATION survives
            # from the previous invocation (LOCATION_ALREADY_EXISTS) —
            # clear the warehouse dir itself.
            import shutil

            loc = spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
        idx.fps.write.bucketBy(N_BUCKETS, "fp").sortBy("fp").mode(
            "overwrite"
        ).saveAsTable("ab_store_fps")
        idx.winnow.write.bucketBy(N_BUCKETS, "fp").sortBy("fp").mode(
            "overwrite"
        ).saveAsTable("ab_store_winnow")
        fps, winnow = spark.table("ab_store_fps"), spark.table("ab_store_winnow")
    else:
        import tempfile

        d = tempfile.mkdtemp(prefix="ab_plain_store_")
        idx.fps.write.mode("overwrite").parquet(f"{d}/fps")
        idx.winnow.write.mode("overwrite").parquet(f"{d}/winnow")
        fps = spark.read.parquet(f"{d}/fps")
        winnow = spark.read.parquet(f"{d}/winnow")

    delta = dedup._delta_docs(cat)
    base_docs = cat.documents.select("doc_id", "text")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # plan-shape evidence alongside the timings: how many Exchange nodes
    # the REAL delta_decisions pays in this arm's store layout (the toy
    # single-join differential lives in
    # tests/test_plan_shapes.py::test_bucketed_store_sink_elides_store_side_exchange)
    frame = dedup.delta_decisions(delta, fps, idx.sigs, winnow, base_docs)
    plan = frame._jdf.queryExecution().toString().split("== Physical Plan ==")[-1]
    print(
        f"{arm} plan: exchanges={plan.count('Exchange ')} "
        f"bucketed_scans={plan.count('SelectedBucketsCount') + plan.count('Bucketed: true')}"
    )
    for r in range(3):
        t0 = time.perf_counter()
        n = benchlib.materialize(
            dedup.delta_decisions(delta, fps, idx.sigs, winnow, base_docs)
        )
        print(
            f"{arm} sf={sf_dir} run{r}: "
            f"{time.perf_counter() - t0:.3f}s rows={n}"
        )


if __name__ == "__main__":
    main()
