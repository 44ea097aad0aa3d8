"""DBSCAN density clustering (SURVEY §2.2 #21).

The reference ships only the BoostKit runner (closed kernel,
``org/apache/spark/ml/clustering/DBSCANRunner.scala:52-73``); observable
surface: params (epsilon, minPoints), outputs = per-point cluster id plus
core/border/noise role counts (``:61-72``). This engine implements standard
DBSCAN semantics with a deterministic twist that makes the result exactly
oracle-checkable:

- ε-neighbor pairs by *rounded* squared L2 (6 decimals, dot-product
  identity — same bits in Spark and DuckDB);
- core = |N_ε(p)| + 1 ≥ minPts (self included, standard);
- clusters = fixed-round min-label components over the core-core ε-graph
  (DBSCAN_CC_ROUNDS supersteps — deterministic whether or not converged);
- border points take the *minimum* cluster label among their core
  neighbors (plain DBSCAN leaves this arbitrary);
- roles encoded core=0 / border=1 / noise=−1 like ``DBSCANRunner.scala:61-72``.

Scale: the ε-pair join here is the quadratic brute-force block (fine at
fixture scale, and the broadcast side is the smaller relation). The 100 TB
path documented in SURVEY §7 — partition by grid cell of the first
principal dims so candidate pairs are cell-local (the reference's
partition-local clustering + merge design) — changes only ``_eps_pairs``;
everything downstream is partition-oblivious.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ml_algo_lib_master_tongji_spark.operators.graph import _cached
from spark_ml_algo_lib_master_tongji_spark.operators.ml_exact import _points
from spark_ml_algo_lib_master_tongji_spark.plans.iterative import iterate
from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

EPS2 = 1.4  # squared-L2 radius (≈1% quantile of pairwise distances)
MIN_PTS = 4
DBSCAN_CC_ROUNDS = 12


def _eps_pairs(pts: DataFrame) -> DataFrame:
    """(i, j) with i<j and rounded |vi−vj|² ≤ EPS2. Per-point norms are
    hoisted out of the quadratic predicate (identical doubles — the same
    dot(v,v) value, computed n instead of n² times)."""
    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up,
    )
    from spark_ml_algo_lib_master_tongji_spark.functions.vectors import dot

    withn = pts.select("vec_id", "v", dot(F.col("v"), F.col("v")).alias("nn"))
    a = withn.toDF("i", "va", "na")
    b = withn.toDF("j", "vb", "nb")
    d2 = round_half_up(
        F.col("na") + F.col("nb") - 2 * dot(F.col("va"), F.col("vb")), 6
    )
    return (
        a.crossJoin(F.broadcast(b))
        .where(F.col("i") < F.col("j"))
        .where(d2 <= EPS2)
        .select("i", "j")
    )


def dbscan(cat: Catalog) -> DataFrame:
    """→ (vec_id, role, cluster): role ∈ {0 core, 1 border, −1 noise},
    cluster = min core id of the component (−1 for noise)."""
    pts = _cached(_points(cat))
    pr = _cached(_eps_pairs(pts))  # the quadratic block — computed once
    nbr = _cached(
        pr.select(F.col("i").alias("p"), F.col("j").alias("q")).unionByName(
            pr.select(F.col("j").alias("p"), F.col("i").alias("q"))
        )
    )
    ncnt = nbr.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    core = _cached(ncnt.where(F.col("c") + 1 >= MIN_PTS).select("p"))

    ce = _cached(
        nbr.join(core.toDF("cp"), nbr.p == F.col("cp"))
        .join(core.toDF("cq"), nbr.q == F.col("cq"))
        .select("p", "q")
    )

    state0 = core.select(F.col("p").alias("v"), F.col("p").alias("label"))

    def step(state: DataFrame, _i: int) -> DataFrame:
        m = (
            ce.join(F.broadcast(state), ce.p == state.v)
            .groupBy(F.col("q").alias("v"))
            .agg(F.min("label").alias("m"))
        )
        return state.join(F.broadcast(m), "v", "left").select(
            "v",
            F.least(F.col("label"), F.coalesce(F.col("m"), F.col("label"))).alias(
                "label"
            ),
        )

    corelab = _cached(iterate(state0, step, DBSCAN_CC_ROUNDS))

    border = (
        nbr.join(corelab.toDF("v", "qlab"), nbr.q == F.col("v"))
        .join(core.toDF("notp"), nbr.p == F.col("notp"), "left_anti")
        .groupBy(F.col("p").alias("bv"))
        .agg(F.min("qlab").alias("bcluster"))
    )

    return (
        pts.select("vec_id")
        .join(corelab.toDF("vec_id", "ccluster"), "vec_id", "left")
        .join(border.withColumnRenamed("bv", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.when(F.col("ccluster").isNotNull(), F.lit(0))
            .when(F.col("bcluster").isNotNull(), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("role"),
            F.coalesce(F.col("ccluster"), F.col("bcluster"), F.lit(-1)).alias(
                "cluster"
            ),
        )
    )


def ml_dbscan(cat: Catalog) -> DataFrame:
    return dbscan(cat)


def ml_dbscan_summary(cat: Catalog) -> DataFrame:
    """Role counts + cluster count — the evaluation surface of
    ``DBSCANRunner.scala:61-72`` (cluster/core/border/noise counts)."""
    d = dbscan(cat)
    return d.agg(
        F.sum((F.col("role") == 0).cast("long")).alias("n_core"),
        F.sum((F.col("role") == 1).cast("long")).alias("n_border"),
        F.sum((F.col("role") == -1).cast("long")).alias("n_noise"),
        F.count_distinct(
            F.when(F.col("cluster") >= 0, F.col("cluster"))
        ).alias("n_clusters"),
    )


#: registry-exported query names (ordering lives in registry._ORDER)
QUERIES = (
    "ml_dbscan",
    "ml_dbscan_summary",
)
