"""Streaming exact dedup: a first-seen filter as a custom stateful operator.

The batch engine dedups with one hash groupBy (text/dedup.py
exact_duplicates); an ingest stream can't wait for "all the data", so state
must carry which content hashes have already been admitted. Keyed by
``sha2(text)`` with ``applyInPandasWithState``: state = the canonical
(first-admitted) doc_id for that content. Every arriving doc is emitted with
its verdict — ``(doc_id, content_sha, canonical_id, is_duplicate)`` — so the
downstream sink can keep ``is_duplicate = false`` rows and audit the rest.

Determinism contract: within one trigger, the canonical of a new hash is the
MIN doc_id in that trigger (not arrival order); across triggers, state wins
(first trigger's canonical stays canonical forever). Single-batch
(availableNow) runs are therefore bit-identical to the batch groupBy twin,
and multi-trigger runs are deterministic given the trigger partitioning.

At scale the shuffle is keyed by content hash (uniform by construction — no
skew), and state is one (hash → long) entry per distinct document ever
seen, living in the state store, never on the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "canonical_id long"
_OUT_SCHEMA = "doc_id long, content_sha string, canonical_id long, is_duplicate boolean"


def dedup_stream(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """First-seen exact dedup over a (streaming) docs DataFrame."""

    def update(key, pdfs, state: GroupState):
        (h,) = key
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        if state.exists:
            (canonical,) = state.get
        else:
            canonical = min(ids)
            state.update((canonical,))
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "content_sha": [h] * len(ids),
                "canonical_id": [canonical] * len(ids),
                "is_duplicate": [i != canonical for i in ids],
            }
        )

    prepared = docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("content_sha"),
    )
    return prepared.groupBy("content_sha").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_batch_twin(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The batch groupBy equivalent a single-trigger run must match."""
    h = docs.select(
        F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("content_sha")
    )
    canon = h.groupBy("content_sha").agg(F.min("doc_id").alias("canonical_id"))
    return h.join(canon, "content_sha").select(
        "doc_id", "content_sha", "canonical_id",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
    )
