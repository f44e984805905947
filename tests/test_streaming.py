"""Structured Streaming operators: batch/stream parity over static input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dmid_spark.streaming import (
    run_stream_to_memory,
    sessionize_stream,
    stream_events,
    tumbling_counts_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    # streaming file sources require a directory; the testdata table is a
    # single parquet file — stage it into one
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_tumbling_counts_matches_batch(spark, events_path):
    stream = stream_events(spark, events_path)
    out = run_stream_to_memory(
        tumbling_counts_stream(stream, window="5 minutes"), output_mode="append"
    )
    got = {
        (r["win_start"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in out.collect()
    }
    batch = (
        spark.read.parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total")
    )
    want = {
        (r["win_start"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in batch.collect()
    }
    # append mode emits only windows finalized by the watermark: everything
    # emitted must match batch exactly, and every window that closed before
    # max_ts - watermark must have been emitted
    assert len(got) > 0
    assert got.items() <= want.items()
    import datetime

    max_ts = (
        spark.read.parquet(events_path)
        .agg(F.max(F.col("ts").cast("timestamp")).alias("m"))
        .first()["m"]
    )
    cutoff = max_ts - datetime.timedelta(minutes=15)  # window len + watermark
    finalized = {k: v for k, v in want.items() if k[0] < cutoff}
    assert finalized.items() <= got.items()


def test_sessionize_stream_matches_batch(spark, events_path):
    stream = stream_events(spark, events_path)
    out = run_stream_to_memory(
        sessionize_stream(stream, gap_seconds=1800), output_mode="update"
    )
    # memory sink in update mode may hold several versions per key; the
    # final (max n_events) row per user is the converged state
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in final.collect()}

    ev = spark.read.parquet(events_path).select(
        "user_id", F.col("ts").cast("timestamp").cast("long").alias("t")
    )
    wb = Window.partitionBy("user_id").orderBy("t")
    batch = (
        ev.withColumn("pt", F.lag("t").over(wb))
        .withColumn(
            "brk",
            F.when(F.col("pt").isNull() | (F.col("t") - F.col("pt") > 1800), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("brk").alias("n_sessions"), F.count("*").alias("n_events"))
    )
    want = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch.collect()}
    assert got == want
