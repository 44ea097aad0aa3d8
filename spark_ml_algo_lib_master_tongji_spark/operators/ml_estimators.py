"""spark.ml estimator workloads (SURVEY §2.2) — the reference's primary API
surface re-expressed on the fixture tables.

Each runner mirrors one reference workload's lifecycle (§3.1): load →
assemble features → fit (seeded) → evaluate → return a small metrics/result
DataFrame. Fixed seeds follow the reference (``setSeed(2020)``,
``GBDTRunner.scala:182,198``; ``LDARunner.scala:158``). Iterative model fits
are not SQL-expressible, so the driver records rows-only checks for these;
pytest cross-checks the metrics against single-node numpy oracles and
against the exact deterministic twins in ``ml_exact.py`` using the
reference's tolerances (rel ≤ 0.005 scalars, 1e-6 |·| matrices,
``utils/Utils.scala:176-253``).

PrefixSpan is the exception: ``pyspark.ml.fpm.PrefixSpan`` output is exact
set semantics, so it shares the ``ml_prefixspan`` unrolled-SQL oracle —
estimator-level parity with a value-hash gate.

Feature columns use VectorUDT only at the estimator boundary
(``array_to_vector``); everything upstream stays a plain array column so
Catalyst can prune/push down (readers.py note).
"""

from __future__ import annotations

from pyspark.ml.classification import (
    DecisionTreeClassifier,
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    RandomForestClassifier,
)
from pyspark.ml.clustering import LDA, KMeans
from pyspark.ml.feature import PCA, CountVectorizer, IDF
from pyspark.ml.fpm import PrefixSpan
from pyspark.ml.functions import array_to_vector
from pyspark.ml.recommendation import ALS
from pyspark.ml.regression import (
    DecisionTreeRegressor,
    GBTRegressor,
    LinearRegression,
    RandomForestRegressor,
)
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from spark_ml_algo_lib_master_tongji_spark.functions.text import tokens
from spark_ml_algo_lib_master_tongji_spark.operators.ml_exact import PS_MIN_SUPPORT
from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog, spread

SEED = 2020  # GBDTRunner.scala:182,198; LDARunner.scala:158

#: LDA corpus geometry (LDARunner.scala:157-186) — shared between the
#: spark.ml fit and the ml_est_lda_ppx oracle twin (interpolated into the
#: SQL, never re-typed).
LDA_K = 5
LDA_VOCAB_SIZE = 500
LDA_MIN_DF = 2.0

#: Seeded training-input fraction for the mllib RDD dispatch arms. The
#: reference's ``rdd`` dispatch (``DTRunner.scala:377-382``) is an
#: API-parity surface, not a throughput workload — the Python mllib API is
#: inherently per-row lambdas, so training the RDD arms on the full fixture
#: only measures Python serialization. The DF arms train on 100%.
#:
#: DOCUMENTED WAIVER (round-3 ADVICE): the reference trains these arms on
#: the full input, so RDD-arm bench timings/metrics are *sampled*, not
#: reference-comparable. ``SPARK_GRAFT_RDD_ARM_SAMPLE=1.0`` restores a
#: full-data parity mode (any fraction in (0, 1] accepted); the waiver is
#: recorded in COVERAGE.md.
import os as _os

RDD_ARM_SAMPLE = float(_os.environ.get("SPARK_GRAFT_RDD_ARM_SAMPLE", "0.2"))


def _features(cat: Catalog) -> DataFrame:
    """(vec_id, features vector, label int, bin_label, y double).

    Session-shared (``_derived``): ~12 estimator workloads fit on this
    exact relation, and several fits make multiple passes over it — one
    persisted assembly is the reference's load-once-run-many lifecycle
    (§3.1) instead of a parquet re-read + vector re-assembly per query."""
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import _derived

    return _derived(
        cat,
        "ml_features",
        lambda: spread(cat.embeddings).select(
            "vec_id",
            array_to_vector(
                F.col("embedding").cast("array<double>")
            ).alias("features"),
            "label",
            (F.col("label") % 2).cast("double").alias("bin_label"),
            F.col("label").cast("double").alias("y"),
        ),
    )


def _shared_clf_acc(cat: Catalog, key: str, label_col: str, fit) -> float:
    """Session-shared train accuracy of a seeded classifier fit — the
    plain metric query and the ``ml_est_clf_acc_anchors`` row consume the
    SAME fit's scalar (the ``_kmeans_est_cost`` load-once-run-many
    pattern; one fit + one agg per (session, sf_dir, model))."""
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import (
        _derived_scalar,
    )

    def compute() -> float:
        df = _features(cat)
        row = (
            fit(df)
            .transform(df)
            .agg(
                F.avg(
                    (F.col(label_col) == F.col("prediction")).cast("double")
                ).alias("acc")
            )
            .first()
        )
        return round(float(row["acc"]), 4)

    return _derived_scalar(cat, key, compute)


def _features_n(cat: Catalog) -> int:
    """Session-shared row count of the feature relation."""
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import (
        _derived_scalar,
    )

    return int(_derived_scalar(cat, "ml_features_n", lambda: float(_features(cat).count())))


def _shared_reg_rmse(cat: Catalog, key: str, label_col: str, fit) -> float:
    """Session-shared train RMSE of a seeded regressor fit (see
    ``_shared_clf_acc``)."""
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import (
        _derived_scalar,
    )

    def compute() -> float:
        df = _features(cat)
        err = F.col(label_col) - F.col("prediction")
        row = (
            fit(df)
            .transform(df)
            .agg(F.sqrt(F.avg(err * err)).alias("rmse"))
            .first()
        )
        return round(float(row["rmse"]), 4)

    return _derived_scalar(cat, key, compute)


def _mllib_emb_rdd(cat: Catalog):
    """Session-shared cached RDD[mllib Vector] over the full embeddings —
    the kmeans/pca/svd RDD dispatch arms all pay the identical per-row
    Python vector conversion; one materialized RDD serves the family
    (stays cached for the session: |embeddings| is bounded)."""
    from pyspark.mllib.linalg import Vectors as OldVectors

    from spark_ml_algo_lib_master_tongji_spark.operators.graph import _derived_obj

    def build():
        rdd = (
            spread(cat.embeddings)
            .select(F.col("embedding").cast("array<double>").alias("v"))
            .rdd.map(lambda r: OldVectors.dense(r["v"]))
            .cache()
        )
        rdd.count()
        return rdd

    return _derived_obj(cat, "mllib_emb_rdd", build)


def _emb_rowmatrix(cat: Catalog):
    """Session-shared mllib ``RowMatrix`` over the embeddings, fed
    JVM-side: the vector column is assembled with ``array_to_vector`` +
    ``MLUtils.convertVectorColumnsFromML`` and the RowMatrix constructed
    from the DataFrame directly (``createRowMatrix``), so the
    PCA/SVD/covariance RDD arms never cross the Python boundary — the
    old path re-pickled the cached Python vector RDD JVM-ward on every
    mllib call (guide §4.1). The narrow projection preserves ``spread``'s
    partitioning, so every treeAggregate sums in the same order as the
    Python-RDD path did (value-identical; oracle-verified).
    ``_mllib_emb_rdd`` remains only for ``MllibKMeans.train``, whose API
    accepts nothing but an RDD."""
    from pyspark.mllib.linalg.distributed import RowMatrix

    from spark_ml_algo_lib_master_tongji_spark.operators.graph import _derived

    def build():
        from pyspark.ml.functions import array_to_vector
        from pyspark.mllib.util import MLUtils

        return MLUtils.convertVectorColumnsFromML(
            spread(cat.embeddings).select(
                array_to_vector(
                    F.col("embedding").cast("array<double>")
                ).alias("v")
            ),
            "v",
        )

    return RowMatrix(_derived(cat, "mllib_emb_vecdf", build))


def _lineitem_cov(cat: Catalog, cols: tuple[str, ...]):
    """Session-shared ``RowMatrix.computeCovariance`` over the lineitem
    numeric columns → driver-side ndarray. The covariance and pearson
    RDD arms both reduce to exactly this matrix (mllib's
    ``Statistics.corr(X, "pearson")`` IS ``RowMatrix(X).computeCovariance``
    + the normalization in ``PearsonCorrelation.scala`` — see
    ``_pearson_from_cov``).

    The RowMatrix is constructed from a DataFrame of mllib vectors
    assembled entirely JVM-side (``array_to_vector`` +
    ``MLUtils.convertVectorColumnsFromML``) instead of a
    ``.rdd.map(lambda ...)`` Python RDD: the old path pickled 600k rows
    JVM→Python, built Python vector objects, and re-pickled them
    Python→JVM on every mllib call — ~30s of pure serialization at sf0.1
    (guide §4.1: every Python path pays the boundary; here the boundary
    carried the whole matrix). The projection is narrow so the DataFrame
    keeps ``spread``'s partitioning — the same partition boundaries and
    row order the Python RDD had — so the treeAggregate inside
    ``computeCovariance`` sums in the identical order and the matrix is
    bit-for-bit the one the RDD arm produced (oracle-verified)."""
    from pyspark.mllib.linalg.distributed import RowMatrix

    from spark_ml_algo_lib_master_tongji_spark.operators.graph import _derived_obj

    def build():
        from pyspark.ml.functions import array_to_vector
        from pyspark.mllib.util import MLUtils

        vecdf = MLUtils.convertVectorColumnsFromML(
            spread(cat.lineitem.select(*cols)).select(
                array_to_vector(F.array(*cols)).alias("v")
            ),
            "v",
        )
        return RowMatrix(vecdf).computeCovariance().toArray()

    return _derived_obj(cat, f"lineitem_cov_{'_'.join(cols)}", build)


def _pearson_from_cov(cov) -> list[list[float]]:
    """mllib's ``PearsonCorrelation.computeCorrelationMatrixFromCovariance``
    mirrored exactly (same IEEE ops on the same doubles): diagonal σᵢ =
    0 if |covᵢᵢ| ≤ 1e-12 else √covᵢᵢ, off-diagonal corrᵢⱼ =
    covᵢⱼ/(σⱼ·σᵢ) (NaN when either σ is zero), 1.0 on the diagonal.
    ``Statistics.corr(X, "pearson")`` is defined as this normalization of
    ``RowMatrix(X).computeCovariance()`` — deriving it from the shared
    covariance matrix skips a second full pass + Python RDD round-trip."""
    import math

    n = len(cov)
    s = [
        0.0 if abs(float(cov[i][i])) <= 1e-12 else math.sqrt(float(cov[i][i]))
        for i in range(n)
    ]
    out = [[1.0] * n for _ in range(n)]
    for j in range(n):
        for i in range(j):
            if s[j] == 0.0 or s[i] == 0.0:
                corr = float("nan")
            else:
                corr = float(cov[i][j]) / (s[j] * s[i])
            out[i][j] = corr
            out[j][i] = corr
    return out


# ---- clustering ------------------------------------------------------------


def _kmeans_est_cost(cat: Catalog) -> float:
    """Session-shared seeded k=8 estimator fit → trainingCost. Both
    ml_est_kmeans and the ml_est_kmeans_wssse anchor consume the SAME
    fitted model's WSSSE — the reference's load-once-run-many lifecycle
    (``KMeansRunner.scala:132``) instead of two identical 10-iter fits."""
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import (
        _derived_scalar,
    )

    def fit() -> float:
        model = KMeans(
            k=8, maxIter=10, seed=SEED, featuresCol="features"
        ).fit(_features(cat))
        return float(model.summary.trainingCost)

    return _derived_scalar(cat, "kmeans_est_wssse", fit)


def ml_est_kmeans(cat: Catalog) -> DataFrame:
    """KMeans k=8 (``KMeansRunner.scala:134-154``; k/maxIter from yml
    ``ml/kmeans/kmeans.yml:4-7`` scaled to fixture size). Output: one row
    (k, wssse, n) — the WSSSE metric of ``KMeansRunner.scala:157``."""
    wssse = _kmeans_est_cost(cat)
    return cat.spark.createDataFrame(
        [(8, round(wssse, 2), _features_n(cat))],
        "k int, wssse double, n long",
    )


def ml_est_kmeans_rdd(cat: Catalog) -> DataFrame:
    """The RDD-API dispatch arm (``KMeansRunner.scala:96-99`` routes
    ``dataframe | rdd``; ``:177-180`` is the mllib path): mllib
    ``KMeans.train`` on an RDD of vectors → one row (k, wssse, n). pytest
    cross-checks WSSSE against the DataFrame estimator within the
    reference's 0.5% scalar tolerance."""
    from pyspark.mllib.clustering import KMeans as MllibKMeans

    rdd = _mllib_emb_rdd(cat)  # session-shared, stays cached
    model = MllibKMeans.train(
        rdd, k=8, maxIterations=10, seed=SEED, initializationMode="k-means||"
    )
    wssse = model.computeCost(rdd)
    n = rdd.count()
    return cat.spark.createDataFrame(
        [(8, round(float(wssse), 2), n)], "k int, wssse double, n long"
    )


#: ml_est_kmeans_wssse band: seeded 10-iter k-means|| (estimator) vs the
#: 3-iter deterministic-init exact Lloyd — two near-converged k=8
#: clusterings of the same points, so their WSSSE ratio sits in a narrow
#: band (measured 0.994–0.998 across sf0.001/0.01/0.1 and the synthetic
#: sf1). The band is generous on both sides so fixture growth never flips
#: the anchor; a broken estimator (wrong k, degenerate fit, unit mixup)
#: lands far outside it.
KMEANS_WSSSE_BAND = (0.5, 1.2)


def ml_est_kmeans_wssse(cat: Catalog) -> DataFrame:
    """Driver-verifiable WSSSE for the k-means family
    (``KMeansRunner.scala:157`` — the reference's headline metric): the
    deterministic exact-Lloyd run's WSSSE Σᵢ d²(vᵢ, c(aᵢ)) is recomputed
    relationally from the final centers + assignment with the oracle
    arithmetic (sequential-fold dots, 6-decimal half-up per point), so
    the unrolled SQL twin reproduces the identical double — promoting the
    family's quality scalar from a pytest pin to a value-hash driver row
    (round-7 verdict item 4). The seeded ml.KMeans estimator fit is
    anchored in the same row: ``est_in_band`` asserts its trainingCost
    sits inside KMEANS_WSSSE_BAND × the Lloyd WSSSE (the SQL twin emits
    TRUE — a drifted estimator flips the bit and the hash).

    One broadcast join + one aggregate over the session-shared Lloyd
    assignment — no new shuffle of the points."""
    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up,
        round_half_up_f,
    )
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import _OBJ_CACHE
    from spark_ml_algo_lib_master_tongji_spark.operators.ml_exact import (
        KMEANS_K,
        _dist2,
        _points_shared,
        kmeans_lloyd,
    )

    assign = kmeans_lloyd(cat)  # session-shared; memoizes final centers
    key = (
        cat.spark.sparkContext.applicationId,
        cat.sf_dir,
        f"kmeans_centers_k{KMEANS_K}",
    )
    if key not in _OBJ_CACHE:  # relational fallback built the assignment:
        # impossible below CENTERS_BC_MAX_ROWS (k=8 ≪ 100k), which every
        # fixture satisfies; fail loudly rather than re-deriving centers
        # with different arithmetic.
        raise ValueError("no driver-side final centers for the WSSSE surface")
    cids, cmat = _OBJ_CACHE[key]
    centers = cat.spark.createDataFrame(
        [(int(c), [float(x) for x in row]) for c, row in zip(cids, cmat)],
        "cid long, c array<double>",
    )
    row = (
        assign.join(_points_shared(cat), "vec_id")
        .join(F.broadcast(centers), "cid")
        .agg(
            round_half_up(F.sum(_dist2(F.col("v"), F.col("c"))), 2).alias("w")
        )
        .first()
    )
    lloyd_wssse = float(row["w"])
    ratio = _kmeans_est_cost(cat) / lloyd_wssse  # session-shared fit
    in_band = KMEANS_WSSSE_BAND[0] <= ratio <= KMEANS_WSSSE_BAND[1]
    return cat.spark.createDataFrame(
        [(KMEANS_K, round_half_up_f(lloyd_wssse, 2), bool(in_band))],
        "k int, wssse double, est_in_band boolean",
    )


def ml_est_linreg_rmse(cat: Catalog) -> DataFrame:
    """Driver-verifiable cross-anchor of the LinearRegression estimator to
    the closed-form OLS (``LinRRunner.scala:161-191``; the |Δ| ≤ 0.5%
    scalar tolerance of ``Utils.scala:176``): both solve the identical
    1-feature least-squares problem (l_extendedprice ~ l_quantity) with
    exact solvers, so their RMSEs agree to ~1e-9 relative. The emitted
    numerics are the closed form's (exactly SQL-computable); the
    estimator rides in ``est_within_tol`` — the SQL twin emits TRUE, so
    estimator drift flips the bit and the value hash (round-7 verdict
    item 4: convert the pytest-only cross-check into a driver row)."""
    from pyspark.ml.feature import VectorAssembler

    from spark_ml_algo_lib_master_tongji_spark.operators.ml_exact import (
        ml_linreg_ols,
    )

    ols = ml_linreg_ols(cat).first()  # (slope, intercept, rmse) — 1 row
    df = VectorAssembler(inputCols=["l_quantity"], outputCol="features").transform(
        spread(cat.lineitem.select("l_quantity", "l_extendedprice"))
    )
    m = LinearRegression(
        solver="normal", regParam=0.0, labelCol="l_extendedprice"
    ).fit(df)
    est_rmse = float(m.summary.rootMeanSquaredError)
    within = abs(est_rmse - float(ols["rmse"])) / float(ols["rmse"]) <= 0.005
    return cat.spark.createDataFrame(
        [
            (
                float(ols["slope"]),
                float(ols["intercept"]),
                float(ols["rmse"]),
                bool(within),
            )
        ],
        "slope double, intercept double, rmse double, est_within_tol boolean",
    )


def ml_est_pearson_rdd(cat: Catalog) -> DataFrame:
    """mllib ``Statistics.corr`` RDD arm (``PearsonRunner.scala:108-113``
    dispatches the same statistic through both APIs) → long-format
    (i, j, corr); pytest checks it equals the DataFrame-aggregate Pearson
    within 1e-6. ``Statistics.corr(X, "pearson")`` is, by its own source,
    ``RowMatrix(X).computeCovariance()`` + the PearsonCorrelation
    normalization — computed here from the session-shared covariance
    matrix (``_lineitem_cov``) via the exact mirrored formula
    (``_pearson_from_cov``), value-identical and one mllib pass for the
    whole covariance/pearson pair instead of two Python-RDD round trips
    (guide §4)."""
    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up_f,
    )

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    m = _pearson_from_cov(_lineitem_cov(cat, tuple(cols)))
    out = [
        (i, j, round_half_up_f(float(m[i][j]), 6))
        for i in range(len(cols))
        for j in range(len(cols))
    ]
    return cat.spark.createDataFrame(out, "i int, j int, corr double")


#: Partition count for the RDD dispatch arms. Every mllib training pass
#: schedules one Python worker per partition, so a 400-row parity input in
#: 32 partitions pays ~32 worker spin-ups per pass for ~12 rows each —
#: measured 6.8s just to materialize the LabeledPoint RDD. A handful of
#: partitions keeps the passes parallel without drowning in per-task
#: overhead. (The DF arms keep full ``spread`` parallelism — their inputs
#: and per-row work are real.)
RDD_ARM_PARTITIONS = 4


def _labeled_points(cat: Catalog):
    """mllib LabeledPoint RDD of a seeded ``RDD_ARM_SAMPLE`` fraction of the
    fixture features (binary label) — the shared input shape of the
    tree/boosting RDD dispatch arms."""
    from pyspark.mllib.linalg import Vectors as OldVectors
    from pyspark.mllib.regression import LabeledPoint

    df = (
        cat.embeddings.sample(RDD_ARM_SAMPLE, seed=SEED)
        .repartition(RDD_ARM_PARTITIONS)
        .select(
            F.col("embedding").cast("array<double>").alias("v"),
            (F.col("label") % 2).cast("double").alias("yb"),
        )
    )
    return df.rdd.map(lambda r: LabeledPoint(r["yb"], OldVectors.dense(r["v"])))


def _rdd_accuracy(cat: Catalog, model, pts) -> DataFrame:
    """Train-set accuracy of an mllib tree model → one row (accuracy, n)
    (the label/prediction zip of the mllib programming guide — the same
    filter(label === prediction)/count metric as the DF arms)."""
    preds = model.predict(pts.map(lambda p: p.features))
    pairs = pts.map(lambda p: p.label).zip(preds)
    n = pts.count()
    acc = pairs.filter(lambda t: t[0] == t[1]).count() / n
    pts.unpersist(blocking=False)  # per-invocation cache — metrics are scalars
    return cat.spark.createDataFrame(
        [(round(acc, 4), n)], "accuracy double, n long"
    )


def ml_est_dt_rdd(cat: Catalog) -> DataFrame:
    """mllib RDD dispatch arm of the decision tree
    (``DTRunner.scala:377-382`` routes ``dataframe | rdd``;
    ``mllib.tree.DecisionTree.trainClassifier`` path) — same maxDepth /
    gini params as ``ml_est_dt_classifier``; pytest cross-checks the two
    arms' accuracies."""
    from pyspark.mllib.tree import DecisionTree

    pts = _labeled_points(cat).cache()
    model = DecisionTree.trainClassifier(
        pts, numClasses=2, categoricalFeaturesInfo={}, maxDepth=5, impurity="gini"
    )
    return _rdd_accuracy(cat, model, pts)


def ml_est_gbdt_rdd(cat: Catalog) -> DataFrame:
    """mllib RDD dispatch arm of GBDT (``GBDTRunner.scala:271-289``:
    ``toJavaRDD`` + mllib ``GradientBoostedTrees``) — numIterations /
    maxDepth matching ``ml_est_gbt_classifier``."""
    from pyspark.mllib.tree import GradientBoostedTrees

    pts = _labeled_points(cat).cache()
    model = GradientBoostedTrees.trainClassifier(
        pts, categoricalFeaturesInfo={}, numIterations=10, maxDepth=5
    )
    return _rdd_accuracy(cat, model, pts)


def ml_est_als_rdd(cat: Catalog) -> DataFrame:
    """mllib RDD dispatch arm of explicit ALS (``ALSRunner.scala:252-254``:
    ``mllib.recommendation.ALS.train`` on a ``Rating`` RDD) → one row
    (mse, users, items) like ``ml_est_als``."""
    from pyspark.mllib.recommendation import ALS as MllibALS
    from pyspark.mllib.recommendation import Rating

    ratings = (
        ratings_table(cat)
        # Deterministic sample (round-14 verdict item 8): ``sample(f,
        # seed)`` draws per input partition, so the sampled row SET varied
        # with upstream splits — measured n 119419–120297 and mse
        # 0.249–0.263 across identical-code runs. A hash filter on the
        # unique rating key is a pure function of the VALUES (the
        # exact-integer-unit discipline of the SQL rows): the same rows
        # survive under any partitioning, keeping the same ~RDD_ARM_SAMPLE
        # fraction in expectation.
        .where(
            F.pmod(F.xxhash64("user", "item", F.lit(SEED)), F.lit(10000))
            < int(round(RDD_ARM_SAMPLE * 10000))
        )
        # Hash-partition + sort by the key so block contents AND
        # accumulation order are value-determined too (the former
        # round-robin ``repartition(n)`` inherited the input's split
        # layout) — with blocks pinned below, the whole fit is now
        # reproducible run-to-run.
        .repartition(RDD_ARM_PARTITIONS, "user", "item")
        .sortWithinPartitions("user", "item")
        .cache()
    )
    r = ratings.rdd.map(
        lambda x: Rating(int(x["user"]), int(x["item"]), float(x["rating"]))
    ).cache()
    # blocks: what the r13-era "~7s fixed block-model overhead" actually
    # was. ``blocks=-1`` (auto) resolves to defaultParallelism, so on
    # local[32] the 5-iteration solve ran a 32×32 user/item block model —
    # ~1k tiny in/out-link blocks per sweep — over a ~120k-row sample.
    # Block count must track DATA volume, not CPU count (the streaming
    # state-store lesson, guide §2): pin it to the arm's own partition
    # count. Measured train 5.3s → 1.2s, predictAll 2.8s → 1.6s, mse
    # unchanged within the arm's run-to-run spread (no value-hash oracle;
    # behavioral pytest bars only — and note blocks changes mllib's
    # per-block factor initialization, so the arm must STAY behaviorally
    # checked, r14 ADVICE). RDD_ARM_PARTITIONS itself is a pinned
    # fixture-scale constant (see its definition note); a full-data parity
    # run (SPARK_GRAFT_RDD_ARM_SAMPLE=1.0) should raise it — and blocks
    # with it — toward the input's real partition count.
    model = MllibALS.train(
        r, rank=8, iterations=5, lambda_=0.01, seed=SEED, blocks=RDD_ARM_PARTITIONS
    )
    # predictAll is the mllib API under test; the metric aggregation (join
    # + MSE + distinct counts) runs DataFrame-side — JVM hash joins/aggs
    # instead of three Python shuffle pipelines over pickled tuples.
    preds = cat.spark.createDataFrame(
        model.predictAll(r.map(lambda x: (x.user, x.product))),
        "user int, item int, pred double",
    )
    agg = (
        ratings.join(preds, ["user", "item"], "left")  # keep every rating:
        # users/items count the sampled table, avg() skips unpredictable
        # (cold-factor) pairs exactly like the former RDD inner join
        .agg(
            F.avg((F.col("rating") - F.col("pred")) ** 2).alias("mse"),
            F.countDistinct("user").alias("users"),
            F.countDistinct("item").alias("items"),
        )
        .collect()[0]
    )
    # These caches are per-invocation (not routed through _derived) — drop
    # them now that the metrics are scalars, or every bench/test invocation
    # leaks another cached copy into executor storage (round-3 ADVICE).
    ratings.unpersist(blocking=False)
    r.unpersist(blocking=False)
    return cat.spark.createDataFrame(
        [(round(float(agg["mse"]), 4), agg["users"], agg["items"])],
        "mse double, users long, items long",
    )


def ml_est_lda_rdd(cat: Catalog) -> DataFrame:
    """mllib RDD dispatch arm of LDA (``LDARunner.scala:248-254``: corpus
    RDD of (docId, termCountVector) → ``mllib.clustering.LDA``, EM
    optimizer) → one row (k, vocab, topics_ok): the EM topic matrix is a
    valid column-stochastic-ish nonnegative matrix — pytest pins shape and
    mass; exact likelihoods differ from the online-VB DF arm by design."""
    from pyspark.mllib.clustering import LDA as MllibLDA
    from pyspark.mllib.linalg import Vectors as OldVectors

    docs = cat.documents.sample(RDD_ARM_SAMPLE, seed=SEED).select(
        "doc_id", F.array_distinct(tokens("text")).alias("toks")
    )
    cv = CountVectorizer(
        inputCol="toks", outputCol="tf", vocabSize=500, minDF=2.0
    ).fit(docs)
    tf = cv.transform(docs)
    corpus = tf.select("doc_id", "tf").rdd.map(
        lambda r: [int(r["doc_id"]), OldVectors.fromML(r["tf"])]
    ).cache()
    model = MllibLDA.train(corpus, k=5, maxIterations=10, seed=SEED)
    topics = model.topicsMatrix()
    import numpy as np

    # topicsMatrix() returns a plain ndarray in current PySpark (older
    # releases returned a mllib Matrix with .toArray()) — accept both.
    mat = np.asarray(topics.toArray() if hasattr(topics, "toArray") else topics)
    ok = bool((mat >= 0).all() and mat.sum() > 0)
    corpus.unpersist(blocking=False)  # per-invocation cache
    return cat.spark.createDataFrame(
        [(5, model.vocabSize(), ok)], "k int, vocab int, topics_ok boolean"
    )


def ml_est_pca_rdd(cat: Catalog) -> DataFrame:
    """mllib RDD dispatch arm of PCA (``PCARunner.scala:218-223``:
    ``RowMatrix.computePrincipalComponents``) → (component,
    explained_variance): variance of the projected columns over total
    input variance — numerically the same spectrum as the DF arm's
    ``explainedVariance`` (pytest compares within 1e-4).
    ``Statistics.colStats`` is the same ``MultivariateOnlineSummarizer``
    treeAggregate as ``RowMatrix.computeColumnSummaryStatistics`` — used
    here on the JVM-fed shared RowMatrix (and on the projected matrix
    in place of pulling ``.rows`` through Python) so no vector crosses
    the boundary (guide §4)."""
    mat = _emb_rowmatrix(cat)  # session-shared, JVM-side
    pcs = mat.computePrincipalComponents(4)
    total_var = float(sum(mat.computeColumnSummaryStatistics().variance()))
    proj_var = mat.multiply(pcs).computeColumnSummaryStatistics().variance()
    rows = [
        (i, round(float(v) / total_var, 6)) for i, v in enumerate(proj_var)
    ]
    return cat.spark.createDataFrame(
        rows, "component int, explained_variance double"
    )


def _doc_tokens(cat: Catalog) -> DataFrame:
    """Session-shared (doc_id, toks) distinct-token corpus — the common
    input of the LDA and IDF estimator workloads, whose CountVectorizer
    fits each make two passes over it; one scan + tokenize serves both
    (the RDD LDA arm samples its input, so it stays separate)."""
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import _derived

    return _derived(
        cat,
        "doc_tokens_distinct",
        lambda: cat.documents.select(
            "doc_id", F.array_distinct(tokens("text")).alias("toks")
        ),
    )


def _lda_metrics(cat: Catalog) -> tuple[int, float, float, float]:
    """Session-shared online-LDA fit metrics (vocab, logLik, logPpx,
    unigram entropy) — ``ml_est_lda`` and the ``ml_est_lda_ppx`` anchor
    consume the SAME seeded fit's scalars. The 4th scalar is the
    per-token entropy H of the tf corpus's empirical unigram
    distribution (one ``Summarizer.sum`` pass over the cached tf
    vectors): the data-driven baseline the perplexity anchor's floor is
    set against — unlike ln(V), H tracks the corpus's actual token
    skew, so the floor stays valid as the corpus grows."""
    import numpy as np
    from pyspark.ml.stat import Summarizer

    from spark_ml_algo_lib_master_tongji_spark.operators.graph import _derived_obj

    def build() -> tuple[int, float, float, float]:
        docs = _doc_tokens(cat)
        cv = CountVectorizer(
            inputCol="toks",
            outputCol="tf",
            vocabSize=LDA_VOCAB_SIZE,
            minDF=LDA_MIN_DF,
        ).fit(docs)
        # The online-LDA fit samples the corpus every one of its 10
        # iterations, and the two eval scalars + the Summarizer pass scan
        # it twice more — ~13 passes total, each of which would re-run the
        # CountVectorizerModel UDF over the token arrays. Persist the
        # transformed tf ONCE for the build and release it before
        # returning (guide §5: cache only what is reused, unpersist when
        # done; values are untouched — same frame, fewer recomputes).
        tf = cv.transform(docs).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            lda = LDA(
                k=LDA_K, maxIter=10, seed=SEED, optimizer="online", featuresCol="tf"
            ).fit(tf)
            counts = np.asarray(
                tf.select(Summarizer.sum(F.col("tf")).alias("s"))
                .first()["s"]
                .toArray()
            )
            total_tokens = counts.sum()
            p = counts[counts > 0] / total_tokens
            unigram_h = float(-(p * np.log(p)).sum())
            # One eval pass, not two: ml.LDAModel.logPerplexity(ds) is
            # DEFINED as -logLikelihood(ds)/corpusTokenCount (it delegates
            # to mllib LocalLDAModel.logPerplexity, which computes exactly
            # that from the same variational bound). corpusTokenCount is a
            # sum of integer tf counts — equal to the Summarizer totals'
            # sum above, exact in float64 far beyond this corpus size — so
            # deriving the division reproduces logPerplexity's double
            # bit-for-bit while skipping a second full per-doc inference
            # pass over the corpus (guide §1.2: don't compute things
            # twice).
            ll = lda.logLikelihood(tf)
            return (
                len(cv.vocabulary),
                round(ll, 2),
                round(-ll / float(total_tokens), 4),
                unigram_h,
            )
        finally:
            tf.unpersist(blocking=False)

    return _derived_obj(cat, "lda_metrics", build)


def ml_est_lda(cat: Catalog) -> DataFrame:
    """LDA topic model (``LDARunner.scala:157-186``): CountVectorizer corpus
    → online LDA k=5; logLikelihood/logPerplexity eval on the training
    corpus (``LDARunner.scala:211-219`` uses a seeded sample)."""
    vocab, loglik, logppx, _ = _lda_metrics(cat)
    return cat.spark.createDataFrame(
        [(LDA_K, vocab, loglik, logppx)],
        "k int, vocab int, log_likelihood double, log_perplexity double",
    )


# ---- classification --------------------------------------------------------


def _logreg_est_acc(cat: Catalog) -> float:
    """Session-shared multinomial-LR train accuracy — ``ml_est_logreg``
    and the ``ml_est_logreg_acc`` anchor consume the SAME seeded fit's
    metric (the ``_kmeans_est_cost`` load-once-run-many pattern)."""
    return _shared_clf_acc(
        cat,
        "logreg_est_acc",
        "label",
        lambda df: LogisticRegression(
            maxIter=20, regParam=0.01, elasticNetParam=0.5, labelCol="label"
        ).fit(df),
    )


def ml_est_logreg(cat: Catalog) -> DataFrame:
    """Multinomial elastic-net LR (``LogRRunner.scala:146-179``)."""
    return cat.spark.createDataFrame(
        [(_logreg_est_acc(cat), _features_n(cat))], "accuracy double, n long"
    )


#: ml_est_logreg_acc band: the multinomial elastic-net LR's train accuracy
#: vs the nearest-class-centroid classifier's — two linear decision rules
#: over the same embeddings, so their ratio sits in a narrow band
#: (measured 0.90–1.07 across sf0.001/0.01/0.1). Generous on both sides
#: so fixture growth never flips the anchor; a degenerate fit
#: (constant/plurality prediction ≈ the majority baseline) lands at
#: ~0.52 × centroid on every fixture — far below the floor.
LOGREG_CENTROID_BAND = (0.7, 1.5)


def _centroid_baselines(cat: Catalog, binary: bool) -> tuple[float, float]:
    """Session-shared (centroid_acc, majority_acc) of the exact
    nearest-class-centroid classifier over the embeddings — the
    closed-form, SQL-recomputable decision rule the estimator anchors
    ride on (centroids = per-class coordinate means rounded at 9,
    assignment = argmin of the 6-decimal-rounded dot-identity d², ties
    to the smaller class — the Lloyd-assign oracle arithmetic).
    ``binary`` uses the bin_label (label % 2) classes."""
    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up,
        round_half_up_f,
    )
    from spark_ml_algo_lib_master_tongji_spark.functions.vectors import (
        as_double_array,
    )
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import _derived_obj
    from spark_ml_algo_lib_master_tongji_spark.operators.ml_exact import _dist2
    from pyspark.sql import Window

    def build() -> tuple[float, float]:
        lab = (F.col("label") % 2) if binary else F.col("label")
        pts = spread(cat.embeddings).select(
            "vec_id",
            as_double_array("embedding").alias("v"),
            lab.cast("int").alias("lab"),
        )
        cent = (
            pts.select("lab", F.posexplode("v").alias("pos", "x"))
            .groupBy("lab", "pos")
            .agg(round_half_up(F.avg("x"), 9).alias("m"))
            .groupBy("lab")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s"))
            .select(
                F.col("lab").alias("clab"),
                F.transform("s", lambda t: t["m"]).alias("c"),
            )
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("d2").asc(), F.col("clab").asc()
        )
        assigned = (
            pts.crossJoin(F.broadcast(cent))
            .select(
                "vec_id", "lab", "clab", _dist2(F.col("v"), F.col("c")).alias("d2")
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
        )
        row = assigned.agg(
            round_half_up(
                F.avg((F.col("lab") == F.col("clab")).cast("double")), 4
            ).alias("acc")
        ).first()
        mrow = (
            pts.groupBy("lab")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .agg(F.max("cnt").alias("mx"), F.sum("cnt").alias("n"))
            .first()
        )
        return (
            float(row["acc"]),
            round_half_up_f(mrow["mx"] / mrow["n"], 4),
        )

    key = "centroid_baselines_bin" if binary else "centroid_baselines"
    return _derived_obj(cat, key, build)


def ml_est_logreg_acc(cat: Catalog) -> DataFrame:
    """Driver-verifiable accuracy anchor for the multinomial LR
    (``LogRRunner.scala:200`` — filter(label === prediction)/count): the
    emitted numerics are the nearest-class-centroid classifier's train
    accuracy plus the majority-class baseline — both exact, closed-form,
    SQL-recomputable decision rules (``_centroid_baselines``). The seeded
    LR estimator rides in-band: ``est_in_band`` asserts its accuracy sits
    inside LOGREG_CENTROID_BAND × the centroid accuracy (the SQL twin
    emits TRUE — a drifted estimator flips the bit and the value hash;
    round-8 verdict item 6, the ``ml_est_kmeans_wssse`` template).

    One 10-row broadcast join + two aggregates over the shared embedding
    scan — no new shuffle of the points."""
    centroid_acc, majority_acc = _centroid_baselines(cat, binary=False)
    # zero guard: a degenerate fixture (centroid_acc 0) flips the bit
    # instead of raising ZeroDivisionError (round-9 ADVICE).
    in_band = centroid_acc > 0 and (
        LOGREG_CENTROID_BAND[0]
        <= _logreg_est_acc(cat) / centroid_acc
        <= LOGREG_CENTROID_BAND[1]
    )
    return cat.spark.createDataFrame(
        [(_features_n(cat), centroid_acc, majority_acc, bool(in_band))],
        "n long, centroid_acc double, majority_acc double, "
        "est_in_band boolean",
    )


def _lrb_acc(cat: Catalog) -> float:
    """Session-shared box-constrained binary LR accuracy."""

    def fit(df):
        from pyspark.ml.linalg import Matrices

        dim = len(df.first()["features"])
        return LogisticRegression(
            maxIter=20,
            labelCol="bin_label",
            lowerBoundsOnCoefficients=Matrices.dense(1, dim, [0.0] * dim),
        ).fit(df)

    return _shared_clf_acc(cat, "lrb_acc", "bin_label", fit)


def ml_est_logreg_bounded(cat: Catalog) -> DataFrame:
    """Box-constrained binary LR — coefficient lower bounds at 0, the
    ``lowerBoundsOnCoefficients`` path of ``LogRRunner.scala:152-153``."""
    return cat.spark.createDataFrame(
        [(_lrb_acc(cat), _features_n(cat))], "accuracy double, n long"
    )


def _svc_acc(cat: Catalog) -> float:
    """Session-shared LinearSVC accuracy."""
    return _shared_clf_acc(
        cat,
        "svc_acc",
        "bin_label",
        lambda df: LinearSVC(
            maxIter=20, regParam=0.01, labelCol="bin_label"
        ).fit(df),
    )


def ml_est_svc(cat: Catalog) -> DataFrame:
    """LinearSVC binary classification (``SVMRunner.scala:112-143``)."""
    return cat.spark.createDataFrame(
        [(_svc_acc(cat), _features_n(cat))], "accuracy double, n long"
    )


def _dt_clf_acc(cat: Catalog) -> float:
    """Session-shared DecisionTreeClassifier accuracy."""
    return _shared_clf_acc(
        cat,
        "dt_clf_acc",
        "label",
        lambda df: DecisionTreeClassifier(
            maxDepth=8, maxBins=32, seed=SEED, labelCol="label"
        ).fit(df),
    )


def ml_est_dt_classifier(cat: Catalog) -> DataFrame:
    """DecisionTreeClassifier (``DTRunner.scala:236-302``; maxDepth/maxBins
    from yml)."""
    return cat.spark.createDataFrame(
        [(_dt_clf_acc(cat), _features_n(cat))], "accuracy double, n long"
    )


def _rf_clf_acc(cat: Catalog) -> float:
    """Session-shared RandomForestClassifier accuracy."""
    return _shared_clf_acc(
        cat,
        "rf_clf_acc",
        "label",
        lambda df: RandomForestClassifier(
            numTrees=20, maxDepth=8, maxBins=32, seed=SEED, labelCol="label"
        ).fit(df),
    )


def ml_est_rf_classifier(cat: Catalog) -> DataFrame:
    """RandomForestClassifier 20 trees (``RFRunner.scala:210-247``,
    ``ml/rf/rf_arm.yml:5-19`` scaled)."""
    return cat.spark.createDataFrame(
        [(_rf_clf_acc(cat), _features_n(cat))], "accuracy double, n long"
    )


def gbt_bin_model(cat: Catalog):
    """Session-shared binary GBT fit — ``ml_est_gbt_classifier`` and the
    ``ml_est_xgboost`` GBT fallback train the byte-identical seeded
    estimator on the same features (``_derived_obj``)."""
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import _derived_obj

    return _derived_obj(
        cat,
        "gbt_bin_model",
        lambda: GBTClassifier(
            maxIter=20, maxDepth=5, seed=SEED, labelCol="bin_label"
        ).fit(_features(cat)),
    )


def _gbt_clf_acc(cat: Catalog) -> float:
    """Session-shared GBTClassifier accuracy (model itself shared via
    ``gbt_bin_model``)."""
    return _shared_clf_acc(
        cat, "gbt_clf_acc", "bin_label", lambda df: gbt_bin_model(cat)
    )


def ml_est_gbt_classifier(cat: Catalog) -> DataFrame:
    """GBTClassifier on the binary label (``GBDTRunner.scala:167-226``)."""
    return cat.spark.createDataFrame(
        [(_gbt_clf_acc(cat), _features_n(cat))], "accuracy double, n long"
    )


# ---- regression ------------------------------------------------------------


def ml_est_linreg(cat: Catalog) -> DataFrame:
    """LinearRegression with the exact normal-equation solver on lineitem
    numerics → extendedprice (``LinRRunner.scala:161-191``; MSE summary
    ``:211-218``). Deterministic solver; pytest cross-checks the 1-feature
    case against ``ml_exact.ml_linreg_ols``."""
    from pyspark.ml.feature import VectorAssembler

    li = spread(
        cat.lineitem.select("l_quantity", "l_discount", "l_tax", "l_extendedprice")
    )
    df = VectorAssembler(
        inputCols=["l_quantity", "l_discount", "l_tax"], outputCol="features"
    ).transform(li)
    m = LinearRegression(
        solver="normal", regParam=0.0, labelCol="l_extendedprice"
    ).fit(df)
    coefs = [round(float(c), 4) for c in m.coefficients]
    return df.sparkSession.createDataFrame(
        [
            (
                round(float(m.intercept), 4),
                coefs[0],
                coefs[1],
                coefs[2],
                round(m.summary.rootMeanSquaredError, 4),
            )
        ],
        "intercept double, b_quantity double, b_discount double, "
        "b_tax double, rmse double",
    )


def _dt_reg_rmse(cat: Catalog) -> float:
    return _shared_reg_rmse(
        cat,
        "dt_reg_rmse",
        "y",
        lambda df: DecisionTreeRegressor(
            maxDepth=8, seed=SEED, labelCol="y"
        ).fit(df),
    )


def ml_est_dt_regressor(cat: Catalog) -> DataFrame:
    return cat.spark.createDataFrame(
        [(_dt_reg_rmse(cat), _features_n(cat))], "rmse double, n long"
    )


def _rf_reg_rmse(cat: Catalog) -> float:
    return _shared_reg_rmse(
        cat,
        "rf_reg_rmse",
        "y",
        lambda df: RandomForestRegressor(
            numTrees=20, maxDepth=8, seed=SEED, labelCol="y"
        ).fit(df),
    )


def ml_est_rf_regressor(cat: Catalog) -> DataFrame:
    return cat.spark.createDataFrame(
        [(_rf_reg_rmse(cat), _features_n(cat))], "rmse double, n long"
    )


def _gbt_reg_rmse(cat: Catalog) -> float:
    return _shared_reg_rmse(
        cat,
        "gbt_reg_rmse",
        "y",
        lambda df: GBTRegressor(
            maxIter=20, maxDepth=5, seed=SEED, labelCol="y"
        ).fit(df),
    )


def ml_est_gbt_regressor(cat: Catalog) -> DataFrame:
    return cat.spark.createDataFrame(
        [(_gbt_reg_rmse(cat), _features_n(cat))], "rmse double, n long"
    )


# ---- decomposition ---------------------------------------------------------


def ml_est_pca(cat: Catalog) -> DataFrame:
    """PCA top-4 explained variance (``PCARunner.scala:154-175``): the
    variance spectrum is sign-invariant, so it is the stable comparator
    (SURVEY §5 matrix rule uses |·| for the components)."""
    df = _features(cat)
    m = PCA(k=4, inputCol="features", outputCol="pc").fit(df)
    rows = [(i, round(float(v), 6)) for i, v in enumerate(m.explainedVariance)]
    return df.sparkSession.createDataFrame(rows, "component int, explained_variance double")


def ml_est_svd(cat: Catalog) -> DataFrame:
    """Truncated SVD singular values via RowMatrix.computeSVD
    (``SVDRunner.scala:120-155``; mllib RDD API — no DF equivalent in
    PySpark, mirroring the reference's use)."""
    svd = _emb_rowmatrix(cat).computeSVD(5, computeU=False)
    out = [(i, round(float(s), 4)) for i, s in enumerate(svd.s)]
    return cat.spark.createDataFrame(out, "component int, singular_value double")


def ml_est_svd_energy(cat: Catalog) -> DataFrame:
    """Full-spectrum SVD energy (Parseval / ``SVDRunner.scala:120-155``
    surface): Σᵢ σᵢ² over ALL components of the embedding row matrix
    equals ‖A‖²_F — an invariant an exact SQL twin can compute
    (Σ over cells x², no eigensolver needed), which promotes the SVD
    family from a rows-only driver check to a value-hash oracle row
    (round-6 verdict item 4). → one row (n_components, energy); energy
    rounded at 2 decimals, far above the eigensolver's ~1e-9 relative
    error at fixture scales."""
    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up_f,
    )

    mat = _emb_rowmatrix(cat)  # session-shared, JVM-side
    svd = mat.computeSVD(int(mat.numCols()), computeU=False)
    vals = [float(s) for s in svd.s]
    return cat.spark.createDataFrame(
        [(len(vals), round_half_up_f(sum(s * s for s in vals), 2))],
        "n_components int, energy double",
    )


def ml_est_pca_energy(cat: Catalog) -> DataFrame:
    """Full-spectrum PCA energy (trace invariant /
    ``PCARunner.scala:154-175`` surface): Σᵢ λᵢ over ALL eigenvalues of
    the embedding sample covariance equals Σⱼ var_samp(column j) — an
    invariant an exact SQL twin computes without an eigensolver, which
    anchors the covariance-build + eigendecomposition pipeline to a
    value-hash oracle row (the PCA analogue of ``ml_est_svd_energy``;
    the per-component spectrum keeps its numpy-eigvalsh pytest). → one
    row (n_components, energy); rounded at 4 decimals, far above the
    ~1e-12 covariance summation-order noise (invariant verified to
    1e-16 against DuckDB at fixture scale)."""
    import numpy as np

    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up_f,
    )

    cov = _emb_rowmatrix(cat).computeCovariance().toArray()
    lam = np.linalg.eigvalsh(cov)
    return cat.spark.createDataFrame(
        [(int(lam.size), round_half_up_f(float(lam.sum()), 4))],
        "n_components int, energy double",
    )


def ml_est_covariance(cat: Catalog) -> DataFrame:
    """RowMatrix.computeCovariance (``CovRunner.scala:93-116``) over the
    lineitem numeric columns → long-format (i, j, cov). Half-up rounding
    (``functions/rounding``) so the DuckDB ``covar_samp`` twin hashes
    identically (driver value-hash row since round 7). The RowMatrix is
    fed JVM-side (``_lineitem_cov``) — no Python RDD boundary."""
    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up_f,
    )

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    cov = _lineitem_cov(cat, tuple(cols))
    out = [
        (i, j, round_half_up_f(float(cov[i][j]), 4))
        for i in range(len(cols))
        for j in range(len(cols))
    ]
    return cat.spark.createDataFrame(out, "i int, j int, cov double")


# ---- recommendation --------------------------------------------------------


def ratings_table(cat: Catalog) -> DataFrame:
    """(user, item, rating): customer×part mean ordered quantity — the
    ratings matrix shape of ``ALSRunner.scala:152-163``.

    Cached per (session, sf_dir) via the shared ``_derived`` store: four
    ALS workloads (explicit / implicit / recommend / RDD arm) all start
    from this lineitem⋈orders aggregate (~7s at sf0.1) — the reference's
    load-once-run-many lifecycle (``ALSRunner.scala:125``)."""
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import _derived

    def build() -> DataFrame:
        return (
            cat.lineitem.join(
                cat.orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy(
                F.col("o_custkey").cast("int").alias("user"),
                F.col("l_partkey").cast("int").alias("item"),
            )
            .agg(F.avg("l_quantity").alias("rating"))
        )

    return _derived(cat, "ratings_table", build)


def _als_explicit_model(cat: Catalog, r: DataFrame):
    """Session-shared explicit-ALS fit — the mse workload and the
    recommend surface train the byte-identical seeded estimator on the
    same ratings; one fit serves both (``_derived_obj``)."""
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import _derived_obj

    def build():
        return ALS(
            rank=8,
            maxIter=5,
            seed=SEED,
            coldStartStrategy="drop",
            userCol="user",
            itemCol="item",
            ratingCol="rating",
        ).fit(r)

    return _derived_obj(cat, "als_explicit_model", build)


def _als_run(cat: Catalog, implicit: bool) -> DataFrame:
    r = spread(ratings_table(cat)).cache()
    if implicit:
        m = ALS(
            rank=8,
            maxIter=5,
            seed=SEED,
            implicitPrefs=True,
            coldStartStrategy="drop",
            userCol="user",
            itemCol="item",
            ratingCol="rating",
        ).fit(r)
    else:
        m = _als_explicit_model(cat, r)
    pred = m.transform(r)
    # one agg job for mse + both cardinalities (was three separate jobs,
    # two of them re-scanning the ratings)
    row = pred.agg(
        F.avg(
            (F.col("rating") - F.col("prediction"))
            * (F.col("rating") - F.col("prediction"))
        ).alias("mse"),
        F.countDistinct("user").alias("users"),
        F.countDistinct("item").alias("items"),
    ).first()
    r.unpersist(blocking=False)  # per-invocation cache — metrics are scalars
    return r.sparkSession.createDataFrame(
        [(round(float(row["mse"]), 4), row["users"], row["items"])],
        "mse double, users long, items long",
    )


def ml_est_als(cat: Catalog) -> DataFrame:
    """Explicit ALS + train MSE (``ALSRunner.scala:179-208``, eval
    ``:215-234``)."""
    return _als_run(cat, implicit=False)


def ml_est_als_implicit(cat: Catalog) -> DataFrame:
    """Implicit-preference ALS (``ALSRunner.scala`` implicit variant)."""
    return _als_run(cat, implicit=True)


#: ml_est_clf_acc_anchors floors — each seeded classifier's train accuracy
#: over its exact SQL-recomputable baseline. Multiclass trees vs the
#: 10-class centroid accuracy (measured ratios across sf0.001/0.01/0.1:
#: DT 1.55–1.71, RF 2.38–4.2); the binary GBT vs the 2-class centroid
#: (1.58–1.64). Floors sit far below every measurement and far above the
#: degenerate plurality predictor (≈0.5–0.9× the respective centroid).
#: The 4-stage GBDT pipeline (binary, 10 boosting iters) measured
#: 1.47–1.55× the binary centroid.
TREE_CLF_CENTROID_FLOORS = {"dt": 1.2, "rf": 1.5, "gbt": 1.3, "pipe": 1.25}
#: Linear binary classifiers (SVC, bounded LR) on the weakly separable
#: parity label barely clear the 2-class centroid at sf0.1, so a centroid
#: ratio cannot separate them from degenerate there; the honest anchor is
#: a margin over the majority baseline (measured margins 0.036–0.148; an
#: exactly-degenerate constant predictor scores margin 0).
BIN_CLF_MAJORITY_MARGIN = 0.015


def ml_est_clf_acc_anchors(cat: Catalog) -> DataFrame:
    """Driver-verifiable accuracy anchors for the six remaining
    rows-only classifier workloads in ONE row (round-8 verdict item 6,
    extending the ``ml_est_kmeans_wssse`` template): the numerics are the
    exact nearest-class-centroid accuracies (10-class and binary) and the
    binary majority baseline — all SQL-recomputable; each seeded
    estimator rides in its own boolean (DT/RF vs the 10-class centroid
    floor, GBT and the 4-stage GBDT pipeline vs the binary centroid
    floor, SVC/bounded-LR vs the majority margin). The SQL twin emits six
    TRUEs — any single drifted estimator flips its bit and the value
    hash. All six fits are the session-shared ones their plain metric
    queries consume.

    The eight component computations (two exact centroid baselines + six
    seeded fits) are mutually independent, and sequentially each one's many
    small stages leave most of local[N] idle (driver latency between jobs,
    single-partition model stages). They are submitted from a thread pool so
    each job's tail is back-filled by the next (guide §2.6); values are
    unchanged — every fit is seeded and its jobs are identical under
    co-scheduling (tools/fit_parallel_ab.py asserts scalar equality). The
    shared feature relation is materialized BEFORE the pool so concurrent
    first-touch builds never race on the big input.

    Submission order is longest-fit-first: concurrent jobs are scheduled
    FIFO by submission time (guide §2.6 — "the earlier job gets resources
    first, later jobs use what is left"), and the row's wall is bounded by
    the slowest fit (the 20-iteration binary GBT, ~150 sequential boosting
    jobs), so the long poles must claim resources from their first job while
    the sub-5s fits back-fill their scheduling gaps — not the reverse, which
    is what alphabetical submission did (the GBT queued behind four short
    fits' early stages). Ordering changes only job priority, never any
    task's input: values are pinned by the same seeded-fit argument as the
    pooling itself."""
    from concurrent.futures import ThreadPoolExecutor

    _features(cat)
    n = _features_n(cat)
    with ThreadPoolExecutor(max_workers=8) as ex:
        f_gbt = ex.submit(_gbt_clf_acc, cat)
        f_pipe = ex.submit(_gbt_pipeline_acc, cat)
        f_svc = ex.submit(_svc_acc, cat)
        f_dt = ex.submit(_dt_clf_acc, cat)
        f_rf = ex.submit(_rf_clf_acc, cat)
        f_cm = ex.submit(_centroid_baselines, cat, False)
        f_cb = ex.submit(_centroid_baselines, cat, True)
        f_lrb = ex.submit(_lrb_acc, cat)
        centroid_acc, _ = f_cm.result()
        bin_centroid_acc, bin_majority_acc = f_cb.result()
    f = TREE_CLF_CENTROID_FLOORS
    dt_ok = f_dt.result() >= f["dt"] * centroid_acc
    rf_ok = f_rf.result() >= f["rf"] * centroid_acc
    gbt_ok = f_gbt.result() >= f["gbt"] * bin_centroid_acc
    pipe_ok = f_pipe.result() >= f["pipe"] * bin_centroid_acc
    svc_ok = f_svc.result() >= bin_majority_acc + BIN_CLF_MAJORITY_MARGIN
    lrb_ok = f_lrb.result() >= bin_majority_acc + BIN_CLF_MAJORITY_MARGIN
    return cat.spark.createDataFrame(
        [
            (
                n,
                centroid_acc,
                bin_centroid_acc,
                bin_majority_acc,
                bool(dt_ok),
                bool(rf_ok),
                bool(gbt_ok),
                bool(pipe_ok),
                bool(svc_ok),
                bool(lrb_ok),
            )
        ],
        "n long, centroid_acc double, bin_centroid_acc double, "
        "bin_majority_acc double, dt_ok boolean, rf_ok boolean, "
        "gbt_ok boolean, pipe_ok boolean, svc_ok boolean, lrb_ok boolean",
    )


#: ml_est_reg_rmse_anchors band: each seeded tree regressor's train RMSE
#: over the label's population σ (= the RMSE of the constant global-mean
#: predictor). Measured ratios across sf0.001/0.01/0.1: DT 0.47–0.82,
#: RF 0.56–0.76, GBT 0.26–0.66; a broken fit (constant/unjoined output)
#: scores ≥ 1×σ, a leak artifact ≈ 0.
TREE_REG_SIGMA_BAND = (0.05, 0.9)


def ml_est_reg_rmse_anchors(cat: Catalog) -> DataFrame:
    """Driver-verifiable RMSE anchors for the three rows-only tree
    regressors in ONE row: the numeric is the label's population σ
    (the constant-predictor baseline RMSE, exactly SQL-recomputable from
    the embeddings); each seeded regressor rides in its own boolean
    (train RMSE within TREE_REG_SIGMA_BAND × σ). The SQL twin emits
    three TRUEs. Fits are the session-shared ones the plain metric
    queries consume — submitted concurrently from a thread pool (guide
    §2.6, same rationale and safety argument as
    ``ml_est_clf_acc_anchors``; the shared feature relation is
    materialized by the σ aggregate before the pool starts)."""
    from concurrent.futures import ThreadPoolExecutor

    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up,
    )

    row = (
        _features(cat)
        .agg(round_half_up(F.sqrt(F.var_pop("y")), 4).alias("s"))
        .first()
    )
    sigma = float(row["s"])
    lo, hi = TREE_REG_SIGMA_BAND

    def ok(rmse: float) -> bool:
        return lo <= rmse / sigma <= hi

    # Longest-fit-first submission (same FIFO-priority reasoning as the
    # clf anchor row): the 20-iteration GBT bounds the pooled wall.
    with ThreadPoolExecutor(max_workers=3) as ex:
        f_gbt = ex.submit(_gbt_reg_rmse, cat)
        f_rf = ex.submit(_rf_reg_rmse, cat)
        f_dt = ex.submit(_dt_reg_rmse, cat)
    return cat.spark.createDataFrame(
        [
            (
                _features_n(cat),
                sigma,
                ok(f_dt.result()),
                ok(f_rf.result()),
                ok(f_gbt.result()),
            )
        ],
        "n long, baseline_rmse double, dt_ok boolean, rf_ok boolean, "
        "gbt_ok boolean",
    )


#: ml_est_lda_ppx band, recalibrated round 14 (round-13 verdict item 2).
#: Ceiling: logPerplexity ≤ LDA_PPX_CEIL · ln(V) — the fit may not be
#: meaningfully WORSE than the uniform unigram model (a broken
#: corpus/vocab/featurization lands far above). Floor: logPerplexity ≥
#: LDA_PPX_H_FLOOR · H, where H is the tf corpus's own empirical
#: unigram entropy — the data-driven baseline a bag-of-words mixture
#: hovers around on train data, so the floor scales WITH the corpus
#: instead of assuming "sits just above ln V" (true only on the sparse
#: small-SF fixtures: ratio-to-lnV measured 1.035–1.040 at
#: sf0.001–0.1 but 0.770 at the 10× fixture, where the fit genuinely
#: improves — the old [0.9, 1.2]·lnV floor broke there; judge-measured
#: ratio 0.770). Measured logppx/H (this round, seeded fit): sf0.001
#: 1.0473, sf0.01 1.0477, sf0.1 1.0422, 10× 0.9377 — corpus-size-stable
#: where the lnV ratio was not (1.0396/1.0401/1.0347/0.7700 on the same
#: runs); floor 0.75 gives ≥20% margin below the smallest measured
#: value while a leak/degenerate artifact (logppx ≈ 0) still breaches
#: it decisively.
LDA_PPX_CEIL = 1.2
LDA_PPX_H_FLOOR = 0.75


def ml_est_lda_ppx(cat: Catalog) -> DataFrame:
    """Driver-verifiable anchor for the LDA family: the numerics are the
    CountVectorizer vocabulary size (minDF ≥ 2, capped at 500 — exactly
    SQL-recomputable as least(#tokens in ≥2 docs, 500); a boundary tie
    changes the SET, never the COUNT) and the uniform-model log
    perplexity ln(V); the seeded online-LDA fit rides in
    ``est_in_band`` (LDA_PPX_H_FLOOR · H ≤ logPerplexity ≤
    LDA_PPX_CEIL · ln V — see the band constants' calibration note).
    The SQL twin emits TRUE. The fit is the session-shared one
    ``ml_est_lda`` consumes."""
    import math

    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up_f,
    )

    vocab, _, logppx, unigram_h = _lda_metrics(cat)
    uniform = round_half_up_f(math.log(vocab), 4)
    in_band = (
        LDA_PPX_H_FLOOR * unigram_h <= logppx <= LDA_PPX_CEIL * uniform
    )
    return cat.spark.createDataFrame(
        [(LDA_K, vocab, uniform, bool(in_band))],
        "k int, vocab int, uniform_logppx double, est_in_band boolean",
    )


#: ml_est_als_mse band: the explicit-ALS train MSE over the population
#: variance of the ratings (= the MSE of the constant global-mean
#: predictor, the weakest honest baseline). A rank-8, 5-iteration seeded
#: fit lands at 0.35–0.44 of the variance across sf0.001/0.01/0.1; the
#: band is generous on both sides so fixture growth never flips the
#: anchor. A broken fit (wrong column, unjoined predictions, constant
#: output) scores ≥ 1× the variance — far above the ceiling; a
#: leak/overfit artifact (mse ≈ 0) breaches the floor.
ALS_VAR_BAND = (0.05, 0.8)


def ml_est_als_mse(cat: Catalog) -> DataFrame:
    """Driver-verifiable MSE anchor for the ALS family
    (``ALSRunner.scala:215-234`` — the reference's headline metric): the
    emitted numeric is the ratings matrix's population variance
    avg(r²) − avg(r)² — the train MSE of the global-mean baseline,
    exactly SQL-recomputable from lineitem ⋈ orders. The seeded explicit
    ALS fit rides in-band: ``est_in_band`` asserts its train MSE sits
    inside ALS_VAR_BAND × the variance (the SQL twin emits TRUE — a
    drifted estimator flips the bit and the value hash; round-8 verdict
    item 6, the ``ml_est_kmeans_wssse`` template).

    One aggregate over the session-shared ratings table + the shared ALS
    fit's scoring pass — no new shuffle of the ratings."""
    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up,
    )

    r = spread(ratings_table(cat)).cache()
    base = r.agg(
        F.count(F.lit(1)).alias("n_ratings"),
        round_half_up(
            F.avg(F.col("rating") * F.col("rating"))
            - F.avg("rating") * F.avg("rating"),
            4,
        ).alias("baseline_mse"),
    ).first()
    m = _als_explicit_model(cat, r)
    est = (
        m.transform(r)
        .agg(
            F.avg(
                (F.col("rating") - F.col("prediction"))
                * (F.col("rating") - F.col("prediction"))
            ).alias("mse")
        )
        .first()
    )
    r.unpersist(blocking=False)  # per-invocation cache — metrics are scalars
    baseline = float(base["baseline_mse"])
    # zero guard: constant ratings (variance 0) flip the bit instead of
    # raising ZeroDivisionError (round-9 ADVICE).
    in_band = baseline > 0 and (
        ALS_VAR_BAND[0] <= float(est["mse"]) / baseline <= ALS_VAR_BAND[1]
    )
    return cat.spark.createDataFrame(
        [(base["n_ratings"], baseline, bool(in_band))],
        "n_ratings long, baseline_mse double, est_in_band boolean",
    )


# ---- feature weighting -----------------------------------------------------


def _gbt_pipeline_acc(cat: Catalog) -> float:
    """Session-shared accuracy of the full 4-stage GBDT pipeline fit —
    ``ml_est_gbt_pipeline`` and the clf-anchor row consume the same
    fit's scalar."""
    from spark_ml_algo_lib_master_tongji_spark.operators.graph import (
        _derived_scalar,
    )

    def compute() -> float:
        from pyspark.ml.feature import (
            IndexToString,
            StringIndexer,
            VectorIndexer,
        )

        df = _features(cat).withColumn(
            "label_str",
            F.concat(F.lit("c"), (F.col("label") % 2).cast("string")),
        )
        si = StringIndexer(inputCol="label_str", outputCol="indexedLabel")
        vi = VectorIndexer(
            inputCol="features", outputCol="indexedFeatures", maxCategories=4
        )
        gbt = GBTClassifier(
            labelCol="indexedLabel",
            featuresCol="indexedFeatures",
            maxIter=10,
            maxDepth=5,
            seed=SEED,
        )
        # The 4 stages are fitted/applied explicitly — the exact sequence
        # ``Pipeline(stages=[si, vi, gbt, its]).fit(df)`` runs internally
        # (fit each estimator on the cumulative transform) — so that (a)
        # the StringIndexer is fitted ONCE (the former shape fitted it a
        # second time inside Pipeline.fit just to read ``labels`` for
        # IndexToString), and (b) the indexed frame every GBT pass and the
        # scoring pass read is persisted instead of re-deriving the two
        # feature-indexing transforms per consumer (guide §5: reuse beats
        # recompute for a frame consumed by fit + transform). Stage inputs
        # are value- and partition-identical to the Pipeline path, so the
        # seeded fit and its accuracy scalar are unchanged.
        sim = si.fit(df)
        its = IndexToString(
            inputCol="prediction",
            outputCol="predictedLabel",
            labels=sim.labels,
        )
        indexed = sim.transform(df)
        prepared = vi.fit(indexed).transform(indexed)
        prepared = prepared.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            model = gbt.fit(prepared)
            # one agg job — the former filter-count / count / count trio
            # re-scored the whole pipeline three times
            row = (
                its.transform(model.transform(prepared))
                .agg(
                    F.avg(
                        (F.col("label_str") == F.col("predictedLabel")).cast(
                            "double"
                        )
                    ).alias("acc")
                )
                .first()
            )
        finally:
            prepared.unpersist(blocking=False)
        return round(float(row["acc"]), 4)

    return _derived_scalar(cat, "gbt_pipeline_acc", compute)


def ml_est_gbt_pipeline(cat: Catalog) -> DataFrame:
    """The reference's full GBDT pipeline (``GBDTRunner.scala:150-203``):
    StringIndexer → VectorIndexer → GBTClassifier → IndexToString, assembled
    as a spark.ml Pipeline → one row (accuracy, n, stages)."""
    return cat.spark.createDataFrame(
        [(_gbt_pipeline_acc(cat), _features_n(cat), 4)],
        "accuracy double, n long, stages int",
    )


def ml_est_als_recommend(cat: Catalog) -> DataFrame:
    """Top-3 item recommendations per user for the 50 smallest user ids —
    the recommendation-serving surface over the fitted ALS factors
    (``ALSRunner.scala`` predicts held-out ratings; ``recommendForAllUsers``
    is the spark.ml API for the same factors)."""
    r = spread(ratings_table(cat)).cache()
    m = _als_explicit_model(cat, r)
    users = r.select("user").distinct().orderBy("user").limit(50)
    recs = m.recommendForUserSubset(users, 3)
    # The fit materialized everything it needs into the model factors; the
    # lazy `users` recomputes from the session-cached ratings_table.
    r.unpersist(blocking=False)
    return recs.select(
        "user",
        F.transform(F.col("recommendations"), lambda s: s["item"]).alias("items"),
    )


#: ml_est_als_rec_topk band: the mean top-1 recommendation score over the
#: mean rating. The fitted factors' per-user maximum over ~|items| dot
#: products sits in (and extrapolates slightly past) the ratings' upper
#: tail. Measured across sf0.001/0.01/0.1: 2.48 / 2.85 / 2.92
#: (tools/anchor_bands.py reproduces; PLANS round-10 addendum). A broken
#: fit (zero or unjoined factors) lands at 0; even a perfect
#: max-rating-everywhere oracle sits at max/mean ≈ 2; an unregularized
#: blow-up lands far above the cap.
ALS_REC_TOP1_BAND = (1.5, 4.5)


def ml_est_als_rec_topk(cat: Catalog) -> DataFrame:
    """Driver-verifiable anchor for the recommendation-serving surface
    (round-9 verdict item 2d): one row over ``recommendForUserSubset``'s
    output for the 50 smallest user ids. Numerics are exactly
    SQL-recomputable from the ratings table (user count, rec row count =
    3 per user, mean rating); the model-dependent properties ride in
    booleans the twin asserts TRUE — ``sorted_ok`` (per-user rec scores
    non-increasing in rank: the API contract recommendForAllUsers
    documents) and ``est_in_band`` (mean top-1 score within
    ALS_REC_TOP1_BAND × the mean rating). The fit is the session-shared
    one ml_est_als / ml_est_als_mse / ml_est_als_recommend consume."""
    nu, nrec, viol, top1, avg_rating = _als_rec_metrics(cat)
    # zero guard: degenerate all-zero ratings flip the bit, never raise
    in_band = avg_rating > 0 and (
        ALS_REC_TOP1_BAND[0] <= top1 / avg_rating <= ALS_REC_TOP1_BAND[1]
    )
    return cat.spark.createDataFrame(
        [(nu, nrec, avg_rating, bool(viol == 0), bool(in_band))],
        "n_users long, n_recs long, avg_rating double, "
        "sorted_ok boolean, est_in_band boolean",
    )


def _als_rec_metrics(cat: Catalog) -> tuple[int, int, int, float, float]:
    """(n_users, n_recs, ordering violations, mean top-1 score, mean
    rating) over the shared fit's recommendForUserSubset output — the
    single measurement behind the ``ml_est_als_rec_topk`` anchor AND the
    ``tools/anchor_bands.py`` audit."""
    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up,
    )

    r = spread(ratings_table(cat)).cache()
    m = _als_explicit_model(cat, r)
    users = r.select("user").distinct().orderBy("user").limit(50)
    flat = m.recommendForUserSubset(users, 3).select(
        "user", F.posexplode("recommendations").alias("pos", "rec")
    )
    w = Window.partitionBy("user").orderBy("pos")
    row = (
        flat.select("user", "pos", F.col("rec.rating").alias("score"))
        .withColumn("prev", F.lag("score").over(w))
        .agg(
            F.count_distinct("user").alias("nu"),
            F.count(F.lit(1)).alias("nrec"),
            F.sum(
                F.when(F.col("prev") < F.col("score"), 1).otherwise(0)
            ).alias("viol"),
            F.avg(F.when(F.col("pos") == 0, F.col("score"))).alias("top1"),
        )
        .first()
    )
    base = r.agg(round_half_up(F.avg("rating"), 4).alias("ar")).first()
    r.unpersist(blocking=False)
    return (
        int(row["nu"]),
        int(row["nrec"]),
        int(row["viol"]),
        float(row["top1"]),
        float(base["ar"]),
    )


def ml_est_idf(cat: Catalog) -> DataFrame:
    """spark.ml IDF estimator over a CountVectorizer corpus
    (``IDFRunner.scala:102-111``) → (n_terms, idf_sum): aggregate of the
    model's idf vector, stable under vocabulary-order ties — the terms at
    a vocabSize cut boundary tie on document frequency, hence on idf, so
    the sum is cut-order invariant and an exact SQL twin exists (top-1000
    tokens by df; driver value-hash row since round 7). Half-up rounding
    on both sides."""
    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up_f,
    )

    docs = _doc_tokens(cat)
    cv = CountVectorizer(inputCol="toks", outputCol="tf", vocabSize=1000).fit(docs)
    tf = cv.transform(docs)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    vals = sorted(round_half_up_f(float(x), 6) for x in idf_model.idf)
    return docs.sparkSession.createDataFrame(
        [(len(vals), round_half_up_f(sum(vals), 4))], "n_terms long, idf_sum double"
    )


# ---- sequential patterns ---------------------------------------------------


def ml_est_prefixspan(cat: Catalog) -> DataFrame:
    """``pyspark.ml.fpm.PrefixSpan`` (``PrefixSpanRunner.scala:150-154``)
    with maxPatternLength=2 on per-user event-type sequences → (pattern,
    support). Exact set semantics ⇒ shares the ``ml_prefixspan`` SQL oracle
    (patterns canonicalized to the same a→b strings, the canonicalization
    mirror of ``PrefixSpanRunner.scala:156-161``)."""
    ev = cat.events.select("user_id", "ts", "event_id", "event_type")
    seqs = (
        ev.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: F.array(s["event_type"]),
            ).alias("sequence")
        )
    )
    ps = PrefixSpan(
        minSupport=PS_MIN_SUPPORT, maxPatternLength=2, sequenceCol="sequence"
    )
    found = ps.findFrequentSequentialPatterns(seqs)
    return found.select(
        F.concat_ws(
            "->", F.transform(F.col("sequence"), lambda s: s.getItem(0))
        ).alias("pattern"),
        F.col("freq").alias("support"),
    )


#: registry-exported query names (ordering lives in registry._ORDER)
QUERIES = (
    "ml_est_kmeans",
    "ml_est_kmeans_wssse",
    "ml_est_linreg_rmse",
    "ml_est_logreg_acc",
    "ml_est_als_mse",
    "ml_est_clf_acc_anchors",
    "ml_est_reg_rmse_anchors",
    "ml_est_lda_ppx",
    "ml_est_kmeans_rdd",
    "ml_est_pearson_rdd",
    "ml_est_dt_rdd",
    "ml_est_gbdt_rdd",
    "ml_est_als_rdd",
    "ml_est_lda_rdd",
    "ml_est_pca_rdd",
    "ml_est_lda",
    "ml_est_logreg",
    "ml_est_logreg_bounded",
    "ml_est_svc",
    "ml_est_dt_classifier",
    "ml_est_rf_classifier",
    "ml_est_gbt_classifier",
    "ml_est_linreg",
    "ml_est_dt_regressor",
    "ml_est_rf_regressor",
    "ml_est_gbt_regressor",
    "ml_est_pca",
    "ml_est_svd",
    "ml_est_svd_energy",
    "ml_est_pca_energy",
    "ml_est_covariance",
    "ml_est_als",
    "ml_est_als_implicit",
    "ml_est_als_recommend",
    "ml_est_als_rec_topk",
    "ml_est_gbt_pipeline",
    "ml_est_idf",
    "ml_est_prefixspan",
)
