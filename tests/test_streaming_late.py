"""Late-data handling: a watermark must drop rows arriving after it has
passed their event time — verified with two controlled micro-batches
(newest half first, oldest half late)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_watermark_drops_late_rows(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import (
        normalize_event_ts,
    )

    ev = normalize_event_ts(spark.read.parquet(src))
    median = ev.approxQuantile("value", [0.5], 0.0)  # noqa: F841 (warm-up)
    split_ts = ev.selectExpr(
        "percentile_approx(cast(ts as double), 0.5)"
    ).collect()[0][0]

    newer = ev.where(F.col("ts").cast("double") >= split_ts)
    older = ev.where(F.col("ts").cast("double") < split_ts)
    d = tmp_path / "stream_in"
    d.mkdir()
    # three micro-batches: the watermark computed from batch N's max event
    # time takes effect one batch later, so a buffer batch sits between the
    # on-time data and the late arrivals
    newer.coalesce(1).write.parquet(str(d / "batch1"))
    newer.orderBy(F.col("ts").desc()).limit(1).coalesce(1).write.parquet(
        str(d / "batch2")
    )
    older.coalesce(1).write.parquet(str(d / "batch3"))
    # file source processes files oldest-mtime-first: force the order
    for sub, mt in (
        ("batch1", 1_000_000_000),
        ("batch2", 1_500_000_000),
        ("batch3", 2_000_000_000),
    ):
        for f in (d / sub).glob("*.parquet"):
            os.utime(f, (mt, mt))

    schema = newer.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{d}/*/")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    got = {
        r["w"]["start"]: r["n"]
        for r in spark.table("late_test").collect()
    }
    # expected: on-time batches only (newer + the re-sent buffer row);
    # batch3's windows are all older than (max ts − 1h) ⇒ dropped
    on_time = newer.unionByName(newer.orderBy(F.col("ts").desc()).limit(1))
    want = {
        r["d"]: r["n"]
        for r in on_time.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    full = {
        r["d"]: r["n"]
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want, "stream result must equal the on-time subset only"
    assert got != full, "late rows must have been dropped by the watermark"


def test_stream_stream_join_matches_batch_self_join(spark):
    """Stream-stream time-bounded join ≡ the batch self-join on the smoke
    fixture (the driver row pins sf0.01; this pins sf0.001), and every
    emitted gap respects the attribution bounds."""
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import load_table
    from spark_ml_algo_lib_master_tongji_spark.streaming.pipeline import (
        stream_stream_join,
    )
    from tests.conftest import SF_SMOKE

    got = {
        (r["click_id"], r["purchase_id"], r["user_id"], r["gap_us"])
        for r in stream_stream_join(spark, SF_SMOKE).collect()
    }

    ev = load_table(spark, SF_SMOKE, "events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("c_us"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.unix_micros("ts").alias("p_us"),
    )
    want = {
        (r["click_id"], r["purchase_id"], r["user_id"], r["gap_us"])
        for r in c.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("p_us") >= F.col("c_us"))
            & (F.col("p_us") <= F.col("c_us") + 3_600_000_000),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.col("p_us") - F.col("c_us")).alias("gap_us"),
        )
        .collect()
    }
    assert got == want and got
    assert all(0 <= g <= 3_600_000_000 for *_, g in got)
