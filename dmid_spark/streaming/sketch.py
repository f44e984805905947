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
