"""Structured Streaming operators over the events table.

The reference is entirely batch/BSP (SURVEY.md §1.4 — nothing streams), so
this module covers the engine-side streaming surface a production ingest
needs rather than any reference operator: watermarked tumbling-window
aggregation (late data dropped deterministically) and stateful
sessionization via ``applyInPandasWithState`` (the custom-stateful-operator
pattern from the brief).

Batch/stream parity is the test contract: running the streaming query with
``trigger(availableNow=True)`` over a static parquet directory must produce
exactly the batch groupBy result (tested in tests/test_streaming.py), so
the same code path is verified without a live source. At scale the
shuffle is keyed by (window, event_type) / user_id and state lives in the
state store — no driver residency.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_events(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """readStream over a parquet events directory (schema inferred from the
    static files unless given — streaming sources require an explicit
    schema)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def tumbling_counts_stream(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event_type. Append-safe:
    windows finalize once the watermark passes their end."""
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


_SESSION_STATE_SCHEMA = "last_ts long, n_events long, n_sessions long, n_late long"
_SESSION_OUT_SCHEMA = (
    "user_id long, kind string, n_sessions long, n_events long, n_late long, "
    "late_ts long"
)


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, timeout: str = "NoTimeout"
) -> DataFrame:
    """Per-user session counting as a custom stateful operator
    (``applyInPandasWithState``): state = (per-user max ts, running counts,
    late count); a gap > ``gap_seconds`` starts a new session. Emits the
    running per-user totals on every trigger (``kind='totals'``) — the
    streaming twin of the batch lag-window sessionizer
    (__spark_entry__.q_sessionize).

    Ordering contract: timestamps sort within a micro-batch, and the stored
    per-user max ts acts as a per-user watermark across triggers — an event
    arriving in a later trigger with ``t < max_ts`` is LATE: it is never
    folded into the session state (state never regresses, sessions are
    never double-counted) but it is NOT silently lost — each late event is
    emitted as a flagged ``kind='late'`` side-output row carrying its
    timestamp, and the cumulative ``n_late`` rides on every totals row, so
    a downstream reconciliation job can reprocess the stragglers. Exact
    batch parity on the totals rows holds for in-order or single-batch
    (availableNow) input."""

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(pdf["t"].tolist())
        ts_all.sort()
        if state.exists:
            last_ts, n_events, n_sessions, n_late = state.get
        else:
            last_ts, n_events, n_sessions, n_late = None, 0, 0, 0
        late = []
        if last_ts is not None:
            # per-user watermark: events older than already-folded state go
            # to the flagged side output instead of regressing the state
            late = [t for t in ts_all if t < last_ts]
            ts_all = [t for t in ts_all if t >= last_ts]
        for t in ts_all:
            if last_ts is None or t - last_ts > gap_seconds:
                n_sessions += 1
            last_ts = t
            n_events += 1
        n_late += len(late)
        state.update((last_ts, n_events, n_sessions, n_late))
        rows = {
            "user_id": [user_id] * (1 + len(late)),
            "kind": ["totals"] + ["late"] * len(late),
            "n_sessions": [n_sessions] + [None] * len(late),
            "n_events": [n_events] + [None] * len(late),
            "n_late": [n_late] + [None] * len(late),
            "late_ts": [None] + late,
        }
        yield pd.DataFrame(rows)

    prepared = events.select(
        "user_id", F.col("ts").cast("timestamp").cast("long").alias("t")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    stream_df: DataFrame, name: str | None = None, output_mode: str = "append"
) -> DataFrame:
    """Execute a streaming DataFrame with ``availableNow`` against a memory
    sink until all available input is processed; return the result as a
    (batch) DataFrame. This is the deterministic test/bench harness — the
    production sink would be writeStream.format('iceberg'/'parquet')."""
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)
