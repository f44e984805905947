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
        out.filter("kind = 'totals'")
        .withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in final.collect()}
    # single availableNow batch: nothing can be late
    assert out.filter("kind = 'late'").count() == 0
    assert final.filter("n_late <> 0").count() == 0

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


def test_sessionize_stream_cross_trigger_late_event(spark, tmp_path):
    # trigger 1: user 1 events at t=1000 and t=5000 (two sessions, gap 1800);
    # trigger 2: an ON-TIME event t=5100 (same session) for user 2 context
    # plus an OUT-OF-ORDER event t=2000 (< user 1's max ts 5000). The late
    # event must NOT regress state or alter session counts, and must come
    # out as one flagged kind='late' row instead of vanishing.
    # Memory sink can't resume from a checkpoint — use foreachBatch.
    data_dir = tmp_path / "ev"
    ckpt = str(tmp_path / "ckpt")
    data_dir.mkdir()
    collected = []

    def sink(df, epoch_id):
        collected.extend(df.collect())

    def run_once():
        schema = "user_id long, ts timestamp"
        stream = spark.readStream.schema(schema).parquet(str(data_dir))
        q = (
            sessionize_stream(stream, gap_seconds=1800)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def write_batch(name, rows):
        spark.createDataFrame(rows, "user_id long, t long").select(
            "user_id", F.col("t").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(str(data_dir))

    write_batch("b1", [(1, 1000), (1, 5000)])
    run_once()
    write_batch("b2", [(1, 5100), (1, 2000)])
    run_once()

    totals = [r for r in collected if r["kind"] == "totals" and r["user_id"] == 1]
    late = [r for r in collected if r["kind"] == "late"]
    final = max(totals, key=lambda r: r["n_events"])
    # batch twin over the in-order events only: sessions {1000} and
    # {5000, 5100} -> 2 sessions, 3 events
    assert (final["n_sessions"], final["n_events"]) == (2, 3)
    assert final["n_late"] == 1
    assert len(late) == 1
    assert (late[0]["user_id"], late[0]["late_ts"]) == (1, 2000)


def test_dedup_stream_matches_batch_twin(spark, tmp_path):
    from dmid_spark.streaming import dedup_batch_twin, dedup_stream

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # plant exact dupes: re-emit 5 docs under fresh ids
    dupes = base.orderBy("doc_id").limit(5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    docs = base.unionByName(dupes)
    path = str(tmp_path / "docs")
    docs.write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    got = {
        r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
        for r in run_stream_to_memory(dedup_stream(stream), output_mode="update").collect()
    }
    want = {
        r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
        for r in dedup_batch_twin(spark.read.parquet(path)).collect()
    }
    assert got == want
    assert any(dup for _, dup in got.values())  # testdata plants real dupes


def test_dedup_stream_state_survives_across_triggers(spark, tmp_path):
    from dmid_spark.streaming import dedup_stream

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string"
    ).write.mode("append").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    def drain(name):
        # foreachBatch sink: supports checkpoint recovery (memory does not)
        rows = []

        def sink(bdf, _bid):
            rows.extend(bdf.collect())

        q = (
            dedup_stream(spark.readStream.schema(schema).parquet(in_dir))
            .writeStream.foreachBatch(sink).outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return {r["doc_id"]: r for r in rows}

    first = drain("dedup_t1")
    assert first[1]["is_duplicate"] is False
    assert first[3]["canonical_id"] == 1 and first[3]["is_duplicate"] is True

    # second trigger: new file with a repeat of 'alpha' and fresh content —
    # the hash state from trigger 1 must still name doc 1 canonical
    spark.createDataFrame(
        [(10, "alpha"), (11, "gamma")], "doc_id long, text string"
    ).write.mode("append").parquet(in_dir)
    second = drain("dedup_t2")
    assert second[10]["canonical_id"] == 1 and second[10]["is_duplicate"] is True
    assert second[11]["is_duplicate"] is False
    assert 1 not in second  # only the new batch re-emits


def test_windowed_distinct_stream_matches_batch_sketch(spark, events_path):
    """availableNow streaming HLL must be bit-exact the batch sketch:
    identical registers → identical estimates per (window, event_type)."""
    from dmid_spark.sketch import hll_estimate, hll_registers
    from dmid_spark.streaming import windowed_distinct_stream

    stream = stream_events(spark, events_path)
    out = run_stream_to_memory(
        windowed_distinct_stream(stream, p=6), output_mode="update"
    )
    got = {
        (r["win"], r["event_type"]): (r["distinct_estimate"], r["filled_registers"])
        for r in out.collect()
    }

    batch = spark.read.parquet(events_path).withColumn(
        "win", F.floor(F.col("ts").cast("timestamp").cast("long") / 300).cast("long")
    )
    regs = hll_registers(batch, "user_id", ["win", "event_type"], p=6, hash_mode="md5")
    exp = {}
    pdf = regs.toPandas()
    for (win, etype), sub in pdf.groupby(["win", "event_type"]):
        pairs = list(zip(sub["register"], sub["rho"]))
        exp[(win, etype)] = (hll_estimate(pairs, p=6), len(pairs))

    assert set(got) == set(exp)
    for k in exp:
        assert got[k][1] == exp[k][1], k          # same filled registers
        assert got[k][0] == exp[k][0], k          # bit-exact estimate


def test_windowed_distinct_stream_state_merges_across_triggers(spark, tmp_path):
    """Two triggers over split input: final estimates equal a single batch
    over the union (register max-merge is order-insensitive)."""
    import shutil

    from dmid_spark.sketch import hll_estimate, hll_registers
    from dmid_spark.streaming import windowed_distinct_stream

    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    d = tmp_path / "ev2"
    d.mkdir()
    src.filter("event_id % 2 = 0").coalesce(1).write.parquet(str(d / "a"))
    src.filter("event_id % 2 = 1").coalesce(1).write.parquet(str(d / "b"))
    stage = tmp_path / "stage"
    stage.mkdir()
    ckpt = str(tmp_path / "ckpt")

    rows = []

    def run_once():
        # foreachBatch sink: supports checkpoint recovery (memory does not)
        def sink(bdf, _bid):
            rows.extend(bdf.collect())

        stream = stream_events(spark, str(stage), schema=src.schema)
        q = (
            windowed_distinct_stream(stream, p=6)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for part in ("a", "b"):
        for f in (d / part).glob("*.parquet"):
            shutil.copy(f, stage / f"{part}.parquet")
        run_once()
    # update mode re-emits per trigger, but registers only grow — the
    # per-key MAX (filled, estimate) is the final merged state
    got = {}
    for r in rows:
        k = (r["win"], r["event_type"])
        v = (r["distinct_estimate"], r["filled_registers"])
        if k not in got or (v[1], v[0]) > (got[k][1], got[k][0]):
            got[k] = v

    batch = src.withColumn(
        "win", F.floor(F.col("ts").cast("timestamp").cast("long") / 300).cast("long")
    )
    pdf = hll_registers(batch, "user_id", ["win", "event_type"], p=6, hash_mode="md5").toPandas()
    exp = {}
    for (win, etype), sub in pdf.groupby(["win", "event_type"]):
        pairs = list(zip(sub["register"], sub["rho"]))
        exp[(win, etype)] = (hll_estimate(pairs, p=6), len(pairs))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == exp[k], k


def test_windowed_heavy_hitters_stream_matches_batch_cms(spark, events_path):
    """availableNow streaming CMS must emit exactly the batch sketch's
    integer estimates for keys at/over threshold, per window."""
    from dmid_spark.sketch import cms_build, cms_estimate
    from dmid_spark.streaming import windowed_heavy_hitters_stream

    stream = stream_events(spark, events_path)
    # daily windows: 300s windows hold <=2 events per user at this SF (vacuous)
    out = run_stream_to_memory(
        windowed_heavy_hitters_stream(
            stream, threshold=5, depth=4, width=64, window_seconds=86400
        ),
        output_mode="update",
    )
    got = {(r["win"], r["key"]): r["estimate"] for r in out.collect()}

    batch = spark.read.parquet(events_path).withColumn(
        "win", F.floor(F.col("ts").cast("timestamp").cast("long") / 86400).cast("long")
    )
    exp = {}
    for win_row in batch.select("win").distinct().collect():
        win = win_row["win"]
        sub = batch.filter(F.col("win") == win)
        sk = cms_build(sub, "user_id", depth=4, width=64, hash_mode="md5")
        keys = sub.select(F.col("user_id").cast("string").alias("key")).distinct()
        est = cms_estimate(sk, keys, "key", depth=4, width=64, hash_mode="md5")
        for r in est.filter(F.col("estimate") >= 5).collect():
            exp[(win, r["key"])] = r["estimate"]
    assert got == exp
    assert len(got) > 0  # non-vacuous on the events table


def test_windowed_heavy_hitters_cross_trigger_accumulation(spark, tmp_path):
    """A key under threshold in trigger 1 that crosses it in trigger 2
    must emit on the second trigger with the accumulated estimate."""
    import shutil

    from dmid_spark.streaming import windowed_heavy_hitters_stream

    stage = tmp_path / "stage"
    ck = str(tmp_path / "ck")
    stage.mkdir()
    schema = "ts double, event_type string, user_id long"
    per_trigger: list[list] = []

    def run_once():
        batch_rows: list = []

        # foreachBatch sink: supports checkpoint recovery (memory does not)
        def sink(bdf, _bid):
            batch_rows.extend(bdf.collect())

        stream = spark.readStream.schema(schema).parquet(str(stage))
        q = (windowed_heavy_hitters_stream(stream, threshold=5, depth=2, width=16)
             .writeStream.foreachBatch(sink).outputMode("update")
             .option("checkpointLocation", ck).trigger(availableNow=True).start())
        q.awaitTermination(120)
        per_trigger.append(batch_rows)

    rows1 = [(float(i), "e", 7) for i in range(3)]  # key 7: 3 arrivals
    rows2 = [(float(i + 10), "e", 7) for i in range(3)]  # +3 → crosses 5
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(str(stage))
    run_once()
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(stage))
    run_once()
    assert per_trigger[0] == []  # 3 < 5
    second = {(r["win"], r["key"]): r["estimate"] for r in per_trigger[1]}
    assert second == {(0, "7"): 6}


# ---------------------------------------------------------------------------
# batch event analytics: funnels + retention
# ---------------------------------------------------------------------------
def test_funnel_steps_matches_py_oracle(spark):
    import datetime as dt

    from dmid_spark.events import funnel_steps

    T = dt.datetime(2024, 1, 1)

    def ts(m):
        return T + dt.timedelta(minutes=m)

    rows = [
        # u1 completes view→click→buy in order
        (1, "view", ts(0)), (1, "click", ts(5)), (1, "buy", ts(9)),
        # u2 clicks BEFORE viewing: click must not count, then re-clicks
        (2, "click", ts(0)), (2, "view", ts(1)), (2, "click", ts(4)),
        # u3 views only
        (3, "view", ts(2)),
        # u4 never views (excluded entirely)
        (4, "click", ts(0)), (4, "buy", ts(1)),
        # u5: buy between view and click — buy must anchor AFTER click
        (5, "view", ts(0)), (5, "buy", ts(1)), (5, "click", ts(2)), (5, "buy", ts(7)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r.user: (r.steps_completed, r.t_1, r.t_2, r.t_3)
        for r in funnel_steps(ev, ["view", "click", "buy"]).collect()
    }
    assert set(out) == {1, 2, 3, 5}
    assert out[1] == (3, ts(0), ts(5), ts(9))
    assert out[2] == (2, ts(1), ts(4), None)
    assert out[3] == (1, ts(2), None, None)
    assert out[5] == (3, ts(0), ts(2), ts(7))

    # horizon: u1's buy at +9min is outside a 8-minute horizon from t_1
    out_h = {
        r.user: r.steps_completed
        for r in funnel_steps(ev, ["view", "click", "buy"], horizon_sec=8 * 60).collect()
    }
    assert out_h[1] == 2 and out_h[5] == 3


def test_retention_cohorts_matches_py_oracle(spark):
    import datetime as dt

    from dmid_spark.events import retention_cohorts

    base = dt.datetime(2024, 1, 4)  # aligned so day buckets are clean
    rows = []
    # u1 active day 0, 1, 3; u2 active day 1 only; u3 active day 0 and 3
    for u, days in ((1, [0, 1, 3]), (2, [1]), (3, [0, 3])):
        for d in days:
            rows.append((u, "view", base + dt.timedelta(days=d, hours=2)))
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        (r.cohort, r.offset): r.users
        for r in retention_cohorts(ev, bucket="day").collect()
    }
    c0 = min(c for c, _ in got)  # day-bucket index of base
    assert got[(c0, 0)] == 2          # u1, u3
    assert got[(c0, 1)] == 1          # u1
    assert got[(c0, 3)] == 2          # u1, u3
    assert got[(c0 + 1, 0)] == 1      # u2's own cohort
    assert set(got.values()) and all(v >= 1 for v in got.values())


def test_funnel_validates_steps(spark):
    from dmid_spark.events import funnel_steps

    ev = spark.createDataFrame([], "user_id long, event_type string, ts timestamp")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel_steps(ev, [])
    from dmid_spark.events import retention_cohorts

    with _pytest.raises(ValueError):
        retention_cohorts(ev, bucket="month")


def test_burst_windows_flags_spike_and_densifies_gaps(spark):
    import datetime as dt

    import numpy as np

    from dmid_spark.events import burst_windows

    base = dt.datetime(2024, 3, 1)
    rows = []
    # 12 steady hours at 5 events/h for type 'a', then hour 12 spikes to 60;
    # hour 7 is fully silent (densification must emit n=0, not skip it)
    for h in range(13):
        n = 0 if h == 7 else (60 if h == 12 else 5)
        for i in range(n):
            rows.append(("a", base + dt.timedelta(hours=h, seconds=i)))
    # a second type spans the same range so the global grid is shared
    rows.append(("b", base))
    rows.append(("b", base + dt.timedelta(hours=12)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = burst_windows(ev, bucket_sec=3600, trailing=24, z_thresh=3.0, min_prev=3)
    got = {(r.event_type, r.bucket): r for r in out.collect()}
    lo = min(b for _, b in got)
    # grid is dense: 13 buckets x 2 types
    assert len(got) == 26
    assert got[("a", lo + 7)].n == 0
    spike = got[("a", lo + 12)]
    # oracle z over the 12 preceding counts
    prev = np.array([5, 5, 5, 5, 5, 5, 5, 0, 5, 5, 5, 5], dtype=float)
    z_exp = (60 - prev.mean()) / prev.std(ddof=1)
    assert spike.z == pytest.approx(round(z_exp, 6))
    assert spike.is_burst
    # steady buckets are not bursts; early buckets (insufficient history
    # or zero variance) carry NULL z and false
    assert not got[("a", lo + 11)].is_burst
    assert got[("a", lo)].z is None and not got[("a", lo)].is_burst
    assert got[("a", lo + 3)].z is None  # constant history -> stddev 0


def test_sliding_window_counts_matches_bruteforce(spark):
    from datetime import datetime, timedelta

    from dmid_spark.events import sliding_window_counts

    base = datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (base + timedelta(seconds=s), typ, float(v))
        for s, typ, v in [
            (0, "a", 1), (100, "a", 2), (301, "a", 4), (650, "b", 8),
            (899, "a", 16), (900, "b", 32), (1199, "a", 64),
        ]
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["total"])
        for r in sliding_window_counts(ev, window_sec=600, slide_sec=300).collect()
    }
    # brute force: every 300s-aligned window [w, w+600) containing the event
    import math

    want = {}
    for ts, typ, v in rows:
        t = int(ts.timestamp())
        for k in range(2):
            w = (math.floor(t / 300) - k) * 300
            if w <= t < w + 600:
                key = (w, typ)
                n, tot = want.get(key, (0, 0.0))
                want[key] = (n + 1, tot + v)
    assert got == want
    # every event lands in exactly window/slide = 2 windows
    assert sum(n for n, _ in got.values()) == 2 * len(rows)


def test_sliding_window_validates_args(spark):
    import pytest as _pytest

    from dmid_spark.events import sliding_window_counts

    ev = spark.createDataFrame([], "ts timestamp, event_type string, value double")
    with _pytest.raises(ValueError):
        sliding_window_counts(ev, window_sec=500, slide_sec=300)
    with _pytest.raises(ValueError):
        sliding_window_counts(ev, window_sec=0, slide_sec=0)
