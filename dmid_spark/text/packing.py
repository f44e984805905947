"""Training-sequence packing: concat-and-split document packing.

The standard pretraining data layout: documents are concatenated in a
deterministic order and the token stream is cut every ``budget`` tokens
into fixed-length training sequences ("packs"). Each document therefore
starts at a global token offset; the pack it starts in and its offset
within that pack are pure integer arithmetic over the exclusive prefix sum
of token counts — no bin-packing heuristics, no driver-side loop, and the
assignment is bitwise reproducible at any parallelism (integer sums have
one possible value).

Scale shape: one scan-stage token count, one distributed prefix sum
(kernel.distributed_cumsum — range partition + per-partition window + an
O(partitions) offset broadcast; never a single-partition global window).
At 100 TB the prefix sum is the only shuffle and it is keyed by the order
column, so the output can be written directly in pack order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernel as K


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Assign each document its place in the packed token stream.

    Documents are concatenated in ascending ``id_col`` order; the stream is
    cut every ``budget`` tokens (a document may span packs — the GPT-style
    layout, no padding waste). Tokens = whitespace-delimited words, or —
    when ``tokens_col`` names a precomputed count column (e.g. a real BPE
    tokenizer's counts produced upstream in a Pandas UDF) — that column
    drives the packing and ``text_col`` is never read. Returns
    ``(doc_id, n_tokens, start_token, pack_id, pack_offset)`` where
    ``pack_id = start_token // budget`` is the pack the document STARTS in
    and ``pack_offset = start_token % budget`` its offset there. Empty and
    NULL documents (or NULL counts) get ``n_tokens = 0`` and the position
    of their slot.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if tokens_col is not None:
        n_tokens = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0).cast("long"))
    else:
        # NULL folds into the zero branch: size(split(NULL)) is NULL (or -1
        # under legacy sizeOfNull), either of which would corrupt every later
        # doc's start_token through the prefix sum
        t = F.col(text_col)
        n_tokens = (
            F.when(t.isNull() | (F.trim(t) == ""), F.lit(0))
            .otherwise(F.size(F.split(F.trim(t), r"\s+")))
            .cast("long")
        )
    toks = docs.select(F.col(id_col).alias("doc_id"), n_tokens.alias("n_tokens"))
    packed = K.distributed_cumsum(
        toks, ["doc_id"], "n_tokens", out_col="start_token"
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        "start_token",
        (F.col("start_token") / budget).cast("long").alias("pack_id"),
        F.pmod(F.col("start_token"), F.lit(budget)).cast("long").alias("pack_offset"),
    )


def shard_assignments(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Deterministic global shuffle + balanced output sharding.

    Every pretraining pipeline's last step: assign each doc a shard in
    ``0..n_shards-1`` and a position within the shard such that reading
    shards in order yields a seeded pseudo-random permutation of the
    corpus — independent of input partitioning, rerun-stable, and
    engine-portable in ``hash_mode='md5'``.

    ``shard = hash64(id:shard:seed) mod n_shards`` (scan stage, balanced in
    expectation); ``pos`` ranks within the shard by a second independent
    hash with ``id_col`` tiebreak. The rank window is partitioned by shard
    — each shard sorts in one task, the same work the shard writer's
    ``sortWithinPartitions`` would do; size ``n_shards`` so corpus/n fits
    a task (at 100 TB with 4-GB shards that is ~25k tasks, not a funnel).

    Returns ``(id_col, shard, pos)``; join back on ``id_col`` or pass a
    wider frame and keep its columns.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window

    from .dedup import _hash64

    shard = F.pmod(
        _hash64(F.concat_ws(":", F.col(id_col), F.lit(f"shard:{seed}")), hash_mode),
        F.lit(n_shards),
    ).cast("int")
    order = F.pmod(
        _hash64(F.concat_ws(":", F.col(id_col), F.lit(f"order:{seed}")), hash_mode),
        F.lit(1_000_000_000),
    )
    w = Window.partitionBy("shard").orderBy("_ord", id_col)
    return (
        docs.withColumn("shard", shard)
        .withColumn("_ord", order)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("_ord")
    )
