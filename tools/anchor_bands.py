"""Estimator-anchor band audit: print every anchored metric, its exact
SQL-recomputable baseline, the ratio/margin the anchor boolean tests, and
the configured band — at one or more scale factors.

The source of the measured ranges quoted in the band comments
(ml_estimators.py, ml_extra.py) and PLANS round-9 addendum 5. Re-run when
fixtures change to confirm every ratio still sits inside its band with
margin; a new fixture that pushes a ratio near a band edge means the band
(not the fixture) should be re-derived from this output.

Usage: python tools/anchor_bands.py [sf_dir ...]
       (default: /root/testdata/sf0.001 sf0.01 sf0.1)
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    from pyspark.sql import functions as F

    from spark_ml_algo_lib_master_tongji_spark.operators import ml_extra
    from spark_ml_algo_lib_master_tongji_spark.operators import (
        ml_estimators as me,
    )
    from spark_ml_algo_lib_master_tongji_spark.session import get_session
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import (
        Catalog,
        spread,
    )

    spark = get_session(app_name="anchor_bands")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        cat = Catalog(spark, d)
        cacc, _maj = me._centroid_baselines(cat, binary=False)
        bacc, bmaj = me._centroid_baselines(cat, binary=True)
        rows = [
            ("logreg/centroid", me._logreg_est_acc(cat) / cacc,
             me.LOGREG_CENTROID_BAND),
            ("dt/centroid", me._dt_clf_acc(cat) / cacc,
             (me.TREE_CLF_CENTROID_FLOORS["dt"], None)),
            ("rf/centroid", me._rf_clf_acc(cat) / cacc,
             (me.TREE_CLF_CENTROID_FLOORS["rf"], None)),
            ("gbt/bin_centroid", me._gbt_clf_acc(cat) / bacc,
             (me.TREE_CLF_CENTROID_FLOORS["gbt"], None)),
            ("pipe/bin_centroid", me._gbt_pipeline_acc(cat) / bacc,
             (me.TREE_CLF_CENTROID_FLOORS["pipe"], None)),
            ("svc-majority margin", me._svc_acc(cat) - bmaj,
             (me.BIN_CLF_MAJORITY_MARGIN, None)),
            ("lrb-majority margin", me._lrb_acc(cat) - bmaj,
             (me.BIN_CLF_MAJORITY_MARGIN, None)),
        ]
        sigma = float(
            me._features(cat).agg(F.sqrt(F.var_pop("y"))).first()[0]
        )
        for name, rmse in (
            ("dt_reg", me._dt_reg_rmse(cat)),
            ("rf_reg", me._rf_reg_rmse(cat)),
            ("gbt_reg", me._gbt_reg_rmse(cat)),
        ):
            rows.append((f"{name}/sigma", rmse / sigma, me.TREE_REG_SIGMA_BAND))
        vocab, _, logppx, unigram_h = me._lda_metrics(cat)
        rows.append(
            ("lda_ppx/lnV (ceil side)", logppx / math.log(vocab),
             (0.0, me.LDA_PPX_CEIL))
        )
        rows.append(
            ("lda_ppx/H (floor side)", logppx / unigram_h,
             (me.LDA_PPX_H_FLOOR, None))
        )
        rows.append(
            ("spca top-k mass", sum(ml_extra._spca_ratios(cat)),
             ml_extra.SPCA_MASS_BAND)
        )
        r = spread(me.ratings_table(cat))
        var = float(
            r.agg(
                F.avg(F.col("rating") * F.col("rating"))
                - F.avg("rating") * F.avg("rating")
            ).first()[0]
        )
        m = me._als_explicit_model(cat, r)
        mse = float(
            m.transform(r)
            .agg(
                F.avg(
                    (F.col("rating") - F.col("prediction"))
                    * (F.col("rating") - F.col("prediction"))
                )
            )
            .first()[0]
        )
        rows.append(("als_mse/var", mse / var, me.ALS_VAR_BAND))
        # -- round-10 anchors: shared measurement helpers (the audited
        # quantity is BY CONSTRUCTION the one the shipped anchor asserts)
        from spark_ml_algo_lib_master_tongji_spark.operators import knn as K
        from spark_ml_algo_lib_master_tongji_spark.operators import (
            graph_extra as ge,
        )

        _nu, _nr, _viol, top1, ar = me._als_rec_metrics(cat)
        rows.append(("als_rec top1/avg_rating", top1 / ar,
                     me.ALS_REC_TOP1_BAND))
        _nq, rec = K._ivf_recall(cat)
        rows.append(("ivf recall@k", rec, (K.IVF_RECALL_FLOOR, None)))
        *_dims, overlap = ge._betweenness_overlap_metrics(cat)
        rows.append(("betweenness top-k overlap", overlap,
                     (ge.BETW_OVERLAP_FLOOR, None)))
        print(f"== {d}")
        for name, val, band in rows:
            lo, hi = band if isinstance(band, tuple) else (band, None)
            ok = (val >= lo) and (hi is None or val <= hi)
            hi_s = f", {hi}" if hi is not None else ""
            print(f"  {name:24s} {val:8.4f}  band ({lo}{hi_s})  "
                  f"{'OK' if ok else 'OUT-OF-BAND'}")


if __name__ == "__main__":
    main()
