"""A/B the anchor-fit orchestration: sequential vs concurrent submission.

The clf/reg anchor rows each compute several INDEPENDENT seeded estimator
fits (session-shared `_derived_scalar`/`_derived_obj` builds). Sequentially,
each fit's many small stages leave most of local[N] idle (driver latency
between jobs, single-partition stages); guide §2.6 says independent jobs
submitted from a small thread pool back-fill each other's idle capacity.

This tool measures, in ONE session at $SPARK_GRAFT_SF_DIR:
  per-fit isolated wall (sequential, fresh keys)  vs
  the same set of fits submitted concurrently (fresh keys again)
Results are scalars memoized under different synthetic keys so the two arms
never share a cache entry. Prints a table; asserts the two arms' scalar
values are IDENTICAL (same seeds, same data, co-scheduling does not change
any fit's jobs).

Usage: python tools/fit_parallel_ab.py [clf|reg|all]
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from spark_ml_algo_lib_master_tongji_spark.operators import ml_estimators as me
    from spark_ml_algo_lib_master_tongji_spark.session import get_session
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    spark = get_session(app_name="fit-parallel-ab")
    os.path ; spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    cat = Catalog(spark, sf_dir)

    # Materialize the shared feature relation once, outside both arms.
    me._features(cat).count()

    fits = []
    if which in ("clf", "all"):
        fits += [
            ("centroid_multi", lambda: me._centroid_baselines(cat, binary=False)),
            ("centroid_bin", lambda: me._centroid_baselines(cat, binary=True)),
            ("dt_clf", lambda: me._dt_clf_acc(cat)),
            ("rf_clf", lambda: me._rf_clf_acc(cat)),
            ("gbt_clf", lambda: me._gbt_clf_acc(cat)),
            ("gbt_pipeline", lambda: me._gbt_pipeline_acc(cat)),
            ("svc", lambda: me._svc_acc(cat)),
            ("lrb", lambda: me._lrb_acc(cat)),
        ]
    if which in ("reg", "all"):
        fits += [
            ("dt_reg", lambda: me._dt_reg_rmse(cat)),
            ("rf_reg", lambda: me._rf_reg_rmse(cat)),
            ("gbt_reg", lambda: me._gbt_reg_rmse(cat)),
        ]

    # Arm A: sequential, timing each fit in isolation.
    seq_vals: dict[str, object] = {}
    seq_times: dict[str, float] = {}
    t_seq0 = time.perf_counter()
    for name, thunk in fits:
        t0 = time.perf_counter()
        seq_vals[name] = thunk()
        seq_times[name] = time.perf_counter() - t0
    t_seq = time.perf_counter() - t_seq0

    # Clear the scalar/obj memo entries so arm B recomputes for real.
    from spark_ml_algo_lib_master_tongji_spark.operators import graph as g

    app = spark.sparkContext.applicationId
    for cache in (g._SCALAR_CACHE, g._OBJ_CACHE):
        for key in [k for k in list(cache) if k[0] == app]:
            # keep the feature-frame deps: only drop fit scalars/models
            if key[2] in (
                "centroid_baselines", "centroid_baselines_bin", "dt_clf_acc",
                "rf_clf_acc", "gbt_clf_acc", "gbt_bin_model", "gbt_pipeline_acc",
                "svc_acc", "lrb_acc", "dt_reg_rmse", "rf_reg_rmse", "gbt_reg_rmse",
            ):
                del cache[key]

    # Arm B: all fits submitted concurrently.
    t_par0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=len(fits)) as ex:
        par_vals = dict(
            zip([n for n, _ in fits], ex.map(lambda t: t[1](), fits))
        )
    t_par = time.perf_counter() - t_par0

    print(f"{'fit':16s} {'seq_s':>8s}  value")
    for name, _ in fits:
        same = "OK" if par_vals[name] == seq_vals[name] else "DIFFER!"
        print(f"{name:16s} {seq_times[name]:8.2f}  {seq_vals[name]!r:20s} parallel={par_vals[name]!r} {same}")
    print(f"sequential total: {t_seq:.2f}s   parallel total: {t_par:.2f}s")
    bad = [n for n, _ in fits if par_vals[n] != seq_vals[n]]
    if bad:
        raise SystemExit(f"value drift under concurrency: {bad}")


if __name__ == "__main__":
    main()
