"""Full-data RDD-arm parity run (round-9 verdict item 5).

The mllib dispatch arms (`ml_est_dt_rdd`, `ml_est_gbdt_rdd`,
`ml_est_als_rdd`, `ml_est_lda_rdd`) train on a seeded 20% sample by
default (COVERAGE.md documented waiver — API parity, not throughput).
This tool runs them at SPARK_GRAFT_RDD_ARM_SAMPLE=1.0 alongside their
DataFrame twins on the SAME full input and prints both metric sets plus
wall times — the evidence that RDD-vs-DF agreement holds beyond the
sample (PLANS round-10 addendum). The default stays sampled.

Usage: python tools/rdd_arm_parity.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# must be set before ml_estimators is imported (module-level constant)
os.environ["SPARK_GRAFT_RDD_ARM_SAMPLE"] = "1.0"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from spark_ml_algo_lib_master_tongji_spark.operators import (
        ml_estimators as me,
    )
    from spark_ml_algo_lib_master_tongji_spark.session import get_session
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    assert me.RDD_ARM_SAMPLE == 1.0
    spark = get_session(app_name="rdd_arm_parity")
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, sf_dir)

    def run(name, fn):
        t = time.perf_counter()
        row = fn(cat).collect()[0].asDict()
        print(f"{name}: {row}  [{time.perf_counter() - t:.1f}s]")
        return row

    n = cat.embeddings.count()
    print(f"sf_dir={sf_dir} embeddings={n} sample=1.0 (full)")
    dt_r = run("ml_est_dt_rdd", me.ml_est_dt_rdd)
    dt_d = run("ml_est_dt_classifier", me.ml_est_dt_classifier)
    gb_r = run("ml_est_gbdt_rdd", me.ml_est_gbdt_rdd)
    gb_d = run("ml_est_gbt_classifier", me.ml_est_gbt_classifier)
    als_r = run("ml_est_als_rdd", me.ml_est_als_rdd)
    als_d = run("ml_est_als", me.ml_est_als)
    lda_r = run("ml_est_lda_rdd", me.ml_est_lda_rdd)
    run("ml_est_pca_rdd", me.ml_est_pca_rdd)

    assert dt_r["n"] == n, "full-sample arm must see every row"
    print("-- agreement (full data) --")
    # dt: the RDD arm is the reference's BINARY problem while the DF twin
    # is 10-class — behavioral floor only (pytest bar 0.5), not equality
    print(f"dt acc   rdd(binary)={dt_r['accuracy']:.4f} "
          f"df(10-class)={dt_d['accuracy']:.4f}")
    print(f"gbdt acc rdd={gb_r['accuracy']:.4f} df={gb_d['accuracy']:.4f}")
    print(f"als mse  rdd={als_r['mse']:.4f} df={als_d['mse']:.4f}")
    print(f"lda      vocab={lda_r['vocab']} topics_ok={lda_r['topics_ok']}")


if __name__ == "__main__":
    main()
