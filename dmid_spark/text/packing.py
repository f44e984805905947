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
