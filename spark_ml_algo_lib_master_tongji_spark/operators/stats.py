"""Statistics operators (SURVEY §2.2 #12-14: Covariance, Pearson, Spearman,
plus the summary() surface used by LinRRunner for MSE).

The reference computes these through ``mllib.stat.Statistics.corr`` /
``RowMatrix.computeCovariance`` (``CovRunner.scala:102``,
``PearsonRunner.scala:140``, ``SpearManRunner.scala:123``). Here the same
statistics are declared as DataFrame aggregates so Catalyst runs them as one
partial+final pass over the scan — no RowMatrix materialization, no driver
matrix. ``pyspark.ml.stat.Correlation`` remains available through
``operators.ml.linalg`` for VectorUDT callers; this module is the scalable
column-pair surface.

Scale: Pearson/covariance are single-pass aggregations (no shuffle of rows,
only of partial moments). Spearman needs per-column ranks — a global sort per
column, the same cost profile as Spark's own ``Correlation.corr(spearman)``
which also ranks globally.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_ml_algo_lib_master_tongji_spark.functions.rounding import round_half_up

from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

LINEITEM_NUMERIC = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _short(c: str) -> str:
    return c.split("_", 1)[-1]


def _fractional_ranks(df: DataFrame, col: str, n_parts: int = 32) -> DataFrame:
    """(value, _frank): average-ties fractional rank per distinct value of
    ``col``, computed distributed — the mllib-Spearman two-phase shape.

    frank(v) = |{x < v}| + (|{x = v}| + 1)/2. Phase 1 aggregates rows to
    (value, count) — one hash shuffle, data volume drops to the distinct
    count. Phase 2 range-partitions the value table and turns the global
    prefix sum into per-partition prefix sums plus partition offsets; the
    only single-partition window runs over the ``n_parts``-row totals
    table, never over data. (Round-1 carried an un-partitioned
    ``Window.orderBy`` that pulled the whole table through one task.)

    All terms are integers or exact halves in fp64, so the result is
    bit-identical to the windowed ``rank() + (ties−1)/2`` formula the SQL
    oracle uses."""
    vc = df.groupBy(col).agg(F.count(F.lit(1)).alias("_cnt"))
    vc = vc.repartitionByRange(n_parts, F.col(col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totals = vc.groupBy("_pid").agg(F.sum("_cnt").alias("_tot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        vc.withColumn("_lt", F.coalesce(F.sum("_cnt").over(w_local), F.lit(0)))
        .join(F.broadcast(offsets), "_pid")
        .select(
            col,
            (
                F.col("_off") + F.col("_lt") + (F.col("_cnt") + 1) / 2.0
            ).alias("_frank"),
        )
    )


def correlation_pairs(
    df: DataFrame, cols: tuple[str, ...], method: str = "pearson", digits: int = 4
) -> DataFrame:
    """Pairwise correlation of ``cols`` → one wide row
    (corr_<a>_<b> per pair). method ∈ {pearson, spearman}.

    Spearman = Pearson on average-ties fractional ranks (the reference's
    ``Correlation.corr(..., "spearman")`` semantics), with the ranks
    computed by the distributed two-phase scheme in ``_fractional_ranks``
    and joined back to rows on the value (one row per distinct value —
    many-to-one)."""
    if method == "spearman":
        # NULL-safe joins: a plain equi-join would silently drop NULL rows,
        # diverging from the windowed-rank formulation (which ranks NULLs
        # nulls-first). _fractional_ranks groups NULL as its own value, so
        # eqNullSafe carries its frank through.
        ranked = df.select(*cols)
        for c in cols:
            fr = (
                _fractional_ranks(df, c)
                .withColumnRenamed(c, f"_v_{c}")
                .withColumnRenamed("_frank", f"_r_{c}")
            )
            ranked = ranked.join(
                fr, F.col(c).eqNullSafe(F.col(f"_v_{c}"))
            ).drop(f"_v_{c}")
        df = ranked.select(*[F.col(f"_r_{c}").alias(c) for c in cols])
    # corr expressed as try_divide(covar, σa·σb): Spark 4 runs ANSI-on by
    # default, where builtin corr() RAISES DIVIDE_BY_ZERO on a zero-variance
    # column; this form returns NULL like DuckDB's corr (and the same
    # single-pass co-moment aggregation — values agree to 1 ulp, identical
    # after rounding).
    aggs = [
        round_half_up(
            F.try_divide(F.covar_samp(a, b), F.stddev_samp(a) * F.stddev_samp(b)),
            digits,
        ).alias(f"corr_{_short(a)}_{_short(b)}")
        for a, b in combinations(cols, 2)
    ]
    return df.agg(*aggs)


def covariance_pairs(
    df: DataFrame, cols: tuple[str, ...], digits: int = 4
) -> DataFrame:
    """Pairwise sample covariance (``RowMatrix.computeCovariance`` analogue,
    ``CovRunner.scala:101-102``) as one aggregation row."""
    aggs = [
        round_half_up(F.covar_samp(a, b), digits).alias(f"cov_{_short(a)}_{_short(b)}")
        for a, b in combinations(cols, 2)
    ]
    aggs += [
        round_half_up(F.var_samp(c), digits).alias(f"var_{_short(c)}") for c in cols
    ]
    return df.agg(*aggs)


def summary_stats(df: DataFrame, cols: tuple[str, ...], digits: int = 4) -> DataFrame:
    """min/max/mean/stddev/count per column — the ``df.summary``/``.mean()``
    surface (``LinRRunner.scala:216-218``, ``ALSRunner.scala:222``) as a
    single wide aggregation row."""
    aggs = []
    for c in cols:
        s = _short(c)
        aggs += [
            round_half_up(F.min(c), digits).alias(f"min_{s}"),
            round_half_up(F.max(c), digits).alias(f"max_{s}"),
            round_half_up(F.avg(c), digits).alias(f"avg_{s}"),
            round_half_up(F.stddev_samp(c), digits).alias(f"std_{s}"),
        ]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return df.agg(*aggs)


# ---- registry entries ------------------------------------------------------


def stat_pearson_lineitem(cat: Catalog) -> DataFrame:
    return correlation_pairs(cat.lineitem, LINEITEM_NUMERIC, "pearson")


def stat_spearman_lineitem(cat: Catalog) -> DataFrame:
    return correlation_pairs(cat.lineitem, LINEITEM_NUMERIC, "spearman")


def stat_covariance_lineitem(cat: Catalog) -> DataFrame:
    return covariance_pairs(cat.lineitem, LINEITEM_NUMERIC)


def stat_summary_lineitem(cat: Catalog) -> DataFrame:
    return summary_stats(cat.lineitem, LINEITEM_NUMERIC)


#: HLL sketch precision + accuracy floor. rsd = 0.01 (not the 0.05
#: default: at the 10× fixture's 1M-id regime the default sketch
#: measured 7.4% error — beyond its own rsd and the floor; the 0.01
#: sketch measures 0.2–0.7% across 150 / 15k / 10k / 100k / 1M
#: cardinalities). Floor 0.05 keeps ≥ 7× margin everywhere measured
#: while failing loudly on a real sketch regression.
HLL_RSD = 0.01
HLL_REL_ERR_MAX = 0.05


def stat_hll_accuracy(cat: Catalog) -> DataFrame:
    """Mergeable-sketch anchor — HyperLogLog (approx_count_distinct)
    versus exact distinct for two cardinality regimes (users and event
    ids — 150 / 10k at sf0.01, 15k / 1M at the 10× fixture) in one row (exact_users, exact_events, hll_users_ok,
    hll_events_ok). THE cardinality estimator of a 100 TB pipeline:
    HLL registers merge associatively across partitions (one pass, no
    Expand, no shuffle of distinct values — contrast
    ``pipeline_profile_columns``'s exact-distinct Expand, whose docstring
    names this sketch as the petabyte dial). The exact counts are
    SQL-recomputable; the measured relative error rides in the booleans
    (≤ ``HLL_REL_ERR_MAX`` = the sketch's own default rsd), the same
    measured-floor anchor shape as ``sim_ivf_recall``."""
    row = cat.events.agg(
        F.countDistinct("user_id").alias("eu"),
        F.countDistinct("event_id").alias("ee"),
        F.approx_count_distinct("user_id", HLL_RSD).alias("au"),
        F.approx_count_distinct("event_id", HLL_RSD).alias("ae"),
    ).first()

    def ok(approx: int, exact: int) -> bool:
        return abs(approx - exact) <= HLL_REL_ERR_MAX * exact

    return cat.spark.createDataFrame(
        [
            (
                row["eu"],
                row["ee"],
                ok(row["au"], row["eu"]),
                ok(row["ae"], row["ee"]),
            )
        ],
        "exact_users long, exact_events long, "
        "hll_users_ok boolean, hll_events_ok boolean",
    )


#: approx_percentile sketch accuracy (1/accuracy relative rank error)
#: and the rank-error audit slack. Bounds are exact percentiles at
#: p ± APPROX_PCTL_EPS where EPS = 2/accuracy: the sketch guarantees the
#: returned value is a real data element whose rank is within n/accuracy
#: of p·n, and the extra 1/accuracy of probability slack absorbs the
#: discrete-element-vs-interpolated-percentile gap (≤ 1/n, and
#: 1/n < 1/accuracy on every fixture the suite runs, n ≥ 6000).
APPROX_PCTL_ACCURACY = 1000
APPROX_PCTL_EPS = 2.0 / APPROX_PCTL_ACCURACY
APPROX_PCTL_PS = (0.5, 0.9, 0.99)


def stat_approx_quantile_accuracy(cat: Catalog) -> DataFrame:
    """Quantile-sketch anchor — ``approx_percentile`` (the KLL/GK-style
    mergeable sketch, THE petabyte percentile dial named by
    ``pipeline_profile_quantiles``) audited against exact percentiles of
    l_extendedprice in ONE aggregate pass → one row (p50, p90, p99,
    approx_ok). approx_ok asserts each sketch value lies between the
    exact percentiles at p ± ``APPROX_PCTL_EPS`` — the sketch's own
    rank-error contract (rank within n/accuracy of p·n), checked in
    value space via the monotonicity of the exact percentile function,
    so no second rank-counting pass over the data is needed and the
    whole anchor stays LAZY (census-visible, single job).

    The reported p50/p90/p99 are the exact values (SQL-recomputable —
    DuckDB's ``quantile_cont`` is bit-identical to Spark's
    ``percentile``, proven by ``pipeline_profile_quantiles``); the
    sketch audit rides in the boolean, the ``stat_hll_accuracy`` anchor
    shape. Scale: exact percentile is the expensive arm (per-partition
    value maps merged at the final agg) and exists only to ground the
    anchor; the production operator is the sketch alone — bounded-size
    registers, associative merge, no global sort. Both arms take their
    probability LISTS as arrays, so ONE value map serves all nine exact
    points and one sketch serves all three probes (the first cut ran 12
    independent aggregates, 12 copies of the value map per partition —
    measured 15.6s → 3.9s warm at sf0.1; the remaining cost is the one
    exact value map, i.e. the ground truth itself)."""
    c = F.col("l_extendedprice").cast("double")
    # exact points, 3 per p: [value, lower audit bound, upper audit bound]
    exact_ps = [
        x
        for p in APPROX_PCTL_PS
        for x in (p, p - APPROX_PCTL_EPS, p + APPROX_PCTL_EPS)
    ]
    wide = cat.lineitem.agg(
        F.percentile(
            c, F.array(*[F.lit(x) for x in exact_ps])
        ).alias("e"),
        F.percentile_approx(
            c,
            F.array(*[F.lit(p) for p in APPROX_PCTL_PS]),
            F.lit(APPROX_PCTL_ACCURACY),
        ).alias("a"),
    )
    checks = [
        (F.col("a")[i] >= F.col("e")[3 * i + 1])
        & (F.col("a")[i] <= F.col("e")[3 * i + 2])
        for i in range(len(APPROX_PCTL_PS))
    ]
    ok = checks[0]
    for chk in checks[1:]:
        ok = ok & chk
    return wide.select(
        *[
            round_half_up(F.col("e")[3 * i], 6).alias(
                f"p{int(p * 100)}"
            )
            for i, p in enumerate(APPROX_PCTL_PS)
        ],
        ok.alias("approx_ok"),
    )


#: Welch's t-test arms: the two event types whose value distributions
#: the test compares (unequal variances, unequal n — the A/B shape).
TTEST_GROUP_A = "click"
TTEST_GROUP_B = "purchase"


def stat_welch_ttest(cat: Catalog) -> DataFrame:
    """Welch's unequal-variance t-test between two event-type arms of
    ``events.value`` → one row (n_a, n_b, mean_diff, t_stat, df_welch).
    The experimentation primitive the stats family (Pearson/Spearman/
    covariance) doesn't cover: is the A arm's mean value different from
    B's? t = (m_a − m_b) / √(v_a/n_a + v_b/n_b); df via
    Welch–Satterthwaite.

    ONE conditional aggregate pass (count/avg/var_samp over CASE-gated
    columns — map-side partial moments, no per-arm scan, no shuffle of
    rows), then row-local arithmetic on the six scalars. Rounding at
    4–6 digits absorbs the cross-engine (and cross-partition-order)
    fp merge noise in the moment sums, ~1e-10 relative."""
    va = F.when(F.col("event_type") == TTEST_GROUP_A, F.col("value"))
    vb = F.when(F.col("event_type") == TTEST_GROUP_B, F.col("value"))
    wide = cat.events.agg(
        F.count(va).alias("n_a"),
        F.avg(va).alias("m_a"),
        F.var_samp(va).alias("v_a"),
        F.count(vb).alias("n_b"),
        F.avg(vb).alias("m_b"),
        F.var_samp(vb).alias("v_b"),
    )
    sa = F.col("v_a") / F.col("n_a")
    sb = F.col("v_b") / F.col("n_b")
    se2 = sa + sb
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se2)
    df = (se2 * se2) / (
        sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1)
    )
    return wide.select(
        "n_a",
        "n_b",
        round_half_up(F.col("m_a") - F.col("m_b"), 6).alias("mean_diff"),
        round_half_up(t, 4).alias("t_stat"),
        round_half_up(df, 2).alias("df_welch"),
    )


#: equal-width histogram bucket count
HIST_NBUCKETS = 20


def stat_value_histogram(cat: Catalog) -> DataFrame:
    """Equal-width histogram of ``events.value`` → one row per occupied
    bucket (bucket, bucket_lo, n, sum_value). The distribution-profiling
    primitive ``pipeline_profile_quantiles`` doesn't give (bin counts,
    not percentiles) — the input to drift monitors and bar-chart
    dashboards.

    TWO passes, both map-side-combinable: a min/max aggregate (one row),
    broadcast-cross-joined onto the scan, then a hash aggregate on the
    derived bucket id — never a global sort, never ntile over a
    SinglePartition window (the equal-FREQUENCY variant at scale is
    exact/approx percentile boundaries + this same bucket join; see
    ``stat_approx_quantile_accuracy`` for the sketch that supplies
    them). Bucket math is the same IEEE expression tree in both engines
    — floor((v − vmin) / ((vmax − vmin)/NB)), capped at NB−1 so
    v = vmax lands in the last bucket — making bucket ids bit-stable
    cross-engine; the degenerate all-equal-values frame (width 0) pins
    everything to bucket 0 explicitly rather than dividing by zero."""
    nb = HIST_NBUCKETS
    bounds = cat.events.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    width = (F.col("vmax") - F.col("vmin")) / F.lit(float(nb))
    bucket = F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("vmin")) / width),
            F.lit(nb - 1),
        )
    )
    return (
        cat.events.select("value")
        .crossJoin(F.broadcast(bounds))
        .select(
            bucket.cast("int").alias("bucket"), "value", "vmin", "vmax"
        )
        .groupBy("bucket", "vmin", "vmax")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_half_up(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "bucket",
            round_half_up(
                F.col("vmin") + F.col("bucket") * width, 6
            ).alias("bucket_lo"),
            "n",
            "sum_value",
        )
    )


#: registry-exported query names (ordering lives in registry._ORDER)
QUERIES = (
    "stat_pearson_lineitem",
    "stat_spearman_lineitem",
    "stat_covariance_lineitem",
    "stat_summary_lineitem",
    "stat_hll_accuracy",
    "stat_approx_quantile_accuracy",
    "stat_welch_ttest",
    "stat_value_histogram",
)
