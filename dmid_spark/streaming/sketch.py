"""Streaming distinct counting: per-window HyperLogLog as a custom
stateful operator.

``windowed_distinct_stream`` maintains one HLL register array per
(tumbling window, event_type) group in the state store and emits the
group's distinct-count estimate on every trigger — the streaming twin of
the batch ``sketch.hll_registers`` rollup (__spark_entry__.q_window_hll).
Because the registers are deterministic integers (md5-prefix hash, the
engine-portable ``_hash64`` md5 mode), an ``availableNow`` run over a
static directory produces BIT-EXACT the batch sketch's estimates — the
same batch/stream parity contract as windows.py.

Scale: state is one ``2^p``-int array per group (p=6 → 64 ints), keyed by
(window, event_type) so groups distribute; per-trigger work is one md5 per
input row inside the Arrow batch. Registers merge monotonically
(element-wise max), so replays/retries are idempotent.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sketch.hll import _HASH_BITS, hll_estimate

_OUT_SCHEMA = "win long, event_type string, distinct_estimate double, filled_registers long"


def windowed_distinct_stream(
    events: DataFrame,
    key_col: str = "user_id",
    window_seconds: int = 300,
    p: int = 6,
) -> DataFrame:
    """Per-(tumbling window, event_type) HLL distinct-count estimates of
    ``key_col``, state = the register array. Output mode: update (the
    running estimate re-emits as a window's sketch absorbs more rows)."""
    m = 1 << p
    rem_bits = _HASH_BITS - p

    def update(key, pdfs, state: GroupState):
        win, etype = key
        regs = list(state.get[0]) if state.exists else [0] * m
        for pdf in pdfs:
            for k in pdf["k"]:
                h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
                reg = h >> rem_bits
                rem = h & ((1 << rem_bits) - 1)
                rho = rem_bits + 1 if rem == 0 else rem_bits - rem.bit_length() + 1
                if rho > regs[reg]:
                    regs[reg] = rho
        state.update((regs,))
        filled = [(i, r) for i, r in enumerate(regs) if r > 0]
        yield pd.DataFrame(
            {
                "win": [win],
                "event_type": [etype],
                "distinct_estimate": [hll_estimate(filled, p=p)],
                "filled_registers": [len(filled)],
            }
        )

    prepared = events.select(
        F.floor(F.col("ts").cast("timestamp").cast("long") / window_seconds)
        .cast("long")
        .alias("win"),
        "event_type",
        F.col(key_col).cast("string").alias("k"),
    )
    return prepared.groupBy("win", "event_type").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType="regs array<int>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HH_SCHEMA = "win long, key string, estimate long"


def windowed_heavy_hitters_stream(
    events: DataFrame,
    key_col: str = "user_id",
    window_seconds: int = 300,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
    threshold: int = 10,
) -> DataFrame:
    """Per-tumbling-window heavy hitters via a count-min sketch in the
    state store — the streaming twin of the batch ``cms_build`` +
    ``cms_estimate`` rollup (__spark_entry__.q_cms_heavy_hitters shape).

    State per window is ONE depth×width long grid (mergeable, counters
    only grow). Each trigger folds its rows into the grid, then emits
    ``(win, key, estimate)`` for every key SEEN IN THIS TRIGGER whose
    min-counter estimate has reached ``threshold`` — update-mode
    semantics: a key crossing the threshold on a later trigger emits
    then. Hashing is the engine-portable md5 device (sketch/cms.py md5
    mode), so an ``availableNow`` run over a static directory emits
    BIT-EXACT the batch sketch's integer estimates."""
    size = depth * width

    def update(key, pdfs, state: GroupState):
        (win,) = key
        grid = list(state.get[0]) if state.exists else [0] * size
        seen: set[str] = set()
        for pdf in pdfs:
            for k in pdf["k"]:
                seen.add(k)
                for d in range(depth):
                    h = int(
                        hashlib.md5(f"{d}:{seed}:{k}".encode()).hexdigest()[:15], 16
                    )
                    grid[d * width + h % width] += 1
        state.update((grid,))
        out_k, out_e = [], []
        for k in sorted(seen):
            est = min(
                grid[d * width
                     + int(hashlib.md5(f"{d}:{seed}:{k}".encode()).hexdigest()[:15], 16)
                     % width]
                for d in range(depth)
            )
            if est >= threshold:
                out_k.append(k)
                out_e.append(est)
        yield pd.DataFrame({"win": [win] * len(out_k), "key": out_k, "estimate": out_e})

    prepared = events.select(
        F.floor(F.col("ts").cast("timestamp").cast("long") / window_seconds)
        .cast("long")
        .alias("win"),
        F.col(key_col).cast("string").alias("k"),
    )
    return prepared.groupBy("win").applyInPandasWithState(
        update,
        outputStructType=_HH_SCHEMA,
        stateStructType="grid array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
