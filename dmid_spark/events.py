"""Batch event analytics over the events table: funnels and retention.

The two standard product-analytics queries a user of an events pipeline
runs daily, expressed as candidate-driven joins and map-side-combined
aggregates (no per-user collect, no window over the global table):

- :func:`funnel_steps` — ordered step completion ("of users who did A,
  how many later did B, then C?") with an optional horizon. Step k's
  earliest-qualifying timestamp comes from one filtered join against step
  k−1's table — k joins total, each bounded by the funnel's survivors,
  never a per-user event array.
- :func:`retention_cohorts` — first-seen cohort bucketing + per-offset
  distinct-user counts (the classic triangle matrix), two hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_sec: float | None = None,
) -> DataFrame:
    """Per-user earliest completion time of each ordered funnel step.

    Step 1 = the user's earliest ``steps[0]`` event; step k = the earliest
    ``steps[k-1]`` event STRICTLY AFTER the user's step k−1 time (and
    within ``horizon_sec`` of step 1 when set). Returns one row per user
    who completed step 1: ``(user, steps_completed, t_1 .. t_k)`` with
    NULL times for uncompleted steps — ``groupBy(steps_completed).count``
    is the funnel chart.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).alias("ts"),
    )
    cur = (
        ev.filter(F.col("etype") == steps[0])
        .groupBy("user")
        .agg(F.min("ts").alias("t_1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = ev.filter(F.col("etype") == step).select(
            "user", F.col("ts").alias("_ts")
        )
        cond = F.col("_ts") > F.col(f"t_{k - 1}")
        if horizon_sec is not None:
            # interval arithmetic works on TIMESTAMP and TIMESTAMP_NTZ alike
            # (a double cast would reject NTZ parquet columns)
            cond = cond & (
                F.col("_ts")
                <= F.col("t_1") + F.make_dt_interval(secs=F.lit(float(horizon_sec)))
            )
        cur = (
            cur.join(nxt, "user", "left")
            .select("*", F.when(cond, F.col("_ts")).alias("_q"))
            .groupBy("user", *[f"t_{i}" for i in range(1, k)])
            .agg(F.min("_q").alias(f"t_{k}"))
        )
    done = F.lit(1)
    for i in range(2, len(steps) + 1):
        done = done + F.col(f"t_{i}").isNotNull().cast("int")
    # steps_completed counts the PREFIX of non-null times (t_k is only
    # searched after t_{k-1}, so nulls are suffix-closed by construction)
    return cur.select(
        "user", done.alias("steps_completed"),
        *[f"t_{i}" for i in range(1, len(steps) + 1)],
    )


def retention_cohorts(
    events: DataFrame,
    bucket: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic retention triangle: cohort = the user's first-activity
    bucket; one row per (cohort, offset) with the distinct users from that
    cohort active ``offset`` buckets later. ``bucket`` ∈ {'day', 'week'}.

    Two aggregates: first-seen per user (map-side combined min), then
    distinct users per (cohort, offset) — both shuffle on small keys.
    """
    if bucket not in ("day", "week"):
        raise ValueError(f"bucket must be 'day' or 'week', got {bucket}")
    # date-floor arithmetic is timezone-free and identical on TIMESTAMP and
    # TIMESTAMP_NTZ; floor(epoch_days/7) == floor(epoch_secs/604800) for
    # non-negative timestamps, so an epoch(ts)-based twin agrees exactly
    days = F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date"))
    b = days.cast("long") if bucket == "day" else (days / 7).cast("long")
    ev = events.select(F.col(user_col).alias("user"), b.alias("b"))
    first = ev.groupBy("user").agg(F.min("b").alias("cohort"))
    return (
        ev.join(first, "user")
        .select("user", "cohort", (F.col("b") - F.col("cohort")).alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.countDistinct("user").alias("users"))
    )


def sliding_window_counts(
    events: DataFrame,
    window_sec: int = 600,
    slide_sec: int = 300,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Overlapping (sliding) window aggregates — the batch twin of
    Structured Streaming's ``window(ts, window, slide)``: per
    ``(win_start, event_type)`` the event count and value sum over every
    window of length ``window_sec`` advancing by ``slide_sec``.
    ``window_sec`` must be a multiple of ``slide_sec`` (each event then
    belongs to exactly ``window/slide`` windows).

    Scale: each event explodes into window/slide rows (a small constant)
    followed by ONE map-side-combined aggregate — the standard sliding
    window shape; no self-joins, no per-window scans. win_start is epoch
    seconds (integer arithmetic, engine-portable).
    """
    if window_sec <= 0 or slide_sec <= 0 or window_sec % slide_sec != 0:
        raise ValueError(
            f"window_sec must be a positive multiple of slide_sec, got "
            f"{window_sec}/{slide_sec}"
        )
    n_over = window_sec // slide_sec
    t = F.floor(F.col(ts_col).cast("timestamp").cast("double")).cast("long")
    exploded = events.select(
        F.col(type_col).alias("event_type"),
        F.col(value_col).alias("value"),
        t.alias("_t"),
        F.explode(F.sequence(F.lit(0), F.lit(n_over - 1))).alias("_k"),
    ).select(
        "event_type",
        "value",
        # win_start = (floor(t/slide) - k) * slide <= t for every k >= 0,
        # so each event lands in exactly window/slide valid windows —
        # no boundary filter is needed (pre-epoch timestamps included)
        ((F.floor(F.col("_t") / slide_sec) - F.col("_k")) * slide_sec).alias(
            "win_start"
        ),
    )
    return exploded.groupBy("win_start", "event_type").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )


def burst_windows(
    events: DataFrame,
    bucket_sec: int = 3600,
    trailing: int = 24,
    z_thresh: float = 3.0,
    min_prev: int = 3,
    type_col: str = "event_type",
    ts_col: str = "ts",
    round_dp: int = 6,
) -> DataFrame:
    """Per-type event-rate burst detection: tumbling ``bucket_sec`` counts,
    z-scored against the trailing ``trailing`` buckets → one row per
    (event_type, bucket) with ``(n, mean_prev, z, is_burst)``.

    The bucket grid is DENSIFIED per type over the globally observed
    range (one 1-row min/max aggregate broadcast into a sequence-explode),
    so silent hours count as 0 rather than vanishing from the trailing
    frame — absent-row sparsity would inflate the baseline exactly when a
    quiet period precedes the spike. ``z = (n − mean_prev)/stddev_prev``
    (sample stddev) is NULL until ``min_prev`` prior buckets exist and
    whenever the trailing window is constant (stddev 0); ``is_burst`` is
    true when ``z ≥ z_thresh``. z quantizes to ``round_dp`` (+0.0 folds
    IEEE −0.0) for cross-engine hash stability; mean_prev is an exact
    integer ratio and ships unrounded.

    Scale: one hash aggregate over the scan, then a per-type time-ordered
    window — the same bounded-cardinality partitioning note as the
    transition graph applies: partitions = distinct event types, each a
    time series of range/bucket_sec rows; never a global window. Epoch
    arithmetic is tz-free (``CAST(ts AS LONG)`` = ``FLOOR(epoch(ts))``).
    """
    from pyspark.sql import Window

    b = F.floor(F.col(ts_col).cast("timestamp").cast("long") / bucket_sec).cast("long")
    counts = (
        events.select(F.col(type_col).alias("event_type"), b.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )
    rng = counts.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    grid = (
        counts.select("event_type")
        .distinct()
        .join(F.broadcast(rng))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("bucket"))
    )
    dense = grid.join(counts, ["event_type", "bucket"], "left").select(
        "event_type", "bucket", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(-trailing, -1)
    dense = dense.select(
        "event_type",
        "bucket",
        "n",
        F.avg("n").over(w).alias("mean_prev"),
        F.stddev_samp("n").over(w).alias("_sd"),
        F.count("n").over(w).alias("_np"),
    )
    z_raw = (F.col("n") - F.col("mean_prev")) / F.col("_sd")
    z = F.when(
        (F.col("_np") >= min_prev) & F.col("_sd").isNotNull() & (F.col("_sd") > 0),
        F.round(z_raw, round_dp) + F.lit(0.0),
    )
    return dense.select(
        "event_type",
        "bucket",
        "n",
        "mean_prev",
        z.alias("z"),
        F.coalesce(z >= z_thresh, F.lit(False)).alias("is_burst"),
    )
