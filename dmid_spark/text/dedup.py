"""Deduplication operators over document tables.

The standard large-scale training-data pipeline suite: exact (hash groupBy),
MinHash+LSH (shingle → minhash → band → bucket join), SimHash, and n-gram
Jaccard verification. All hashing is deterministic (xxhash64 + fixed
universal-hash constants) so results are reproducible across runs and
parallelism levels. Everything is JVM-side column expressions except the
SimHash bit-vote, which is a vectorized Arrow ``applyInPandas`` (never
per-row Python).

Scale notes (100 TB): the shingle explode is the big intermediate — it
stays (doc_id, hash) longs only; LSH buckets self-join within bands with a
bucket-size cap (hot buckets = boilerplate shingles → capped and reported,
not silently exploded); pair verification joins only candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic universal-hash constants. Mersenne prime 2^31-1: products
# a·h stay < 2^62, inside ANSI long arithmetic (no overflow).
_P = (1 << 31) - 1


def _hash_params(num: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P, size=num, dtype=np.int64)
    b = rng.integers(0, _P, size=num, dtype=np.int64)
    return a, b


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content hash. Returns (doc_id, canonical_id,
    cluster_size); canonical = min doc id per identical text. Only rows in
    clusters of size ≥ 2 are flagged (singletons are trivially canonical)."""
    h = docs.select(F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("h"))
    clusters = h.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("cluster_size")
    )
    return (
        h.join(clusters, "h")
        .filter(F.col("cluster_size") >= 2)
        .select("doc_id", "canonical_id", "cluster_size")
    )


def _shingles(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct word n-gram shingle hashes per doc: (doc_id, sh) longs."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("toks"),
    )
    if n == 1:
        grams = toks.select("doc_id", F.explode("toks").alias("gram"))
    else:
        # n-gram via transform over token positions (JVM-side)
        grams = toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.slice("toks", 1, F.greatest(F.size("toks") - (n - 1), F.lit(0))),
                    lambda _, i: F.concat_ws(" ", F.slice("toks", i + 1, n)),
                )
            ).alias("gram"),
        )
    return grams.filter(F.col("gram") != "").select(
        "doc_id", F.xxhash64("gram").alias("sh")
    ).distinct()


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, sig: array<long>) — minhash_i = min over shingles of
    (a_i·h(s)+b_i mod P). One shuffle (groupBy doc), num_hashes column
    expressions — no UDFs."""
    a, b = _hash_params(num_hashes, seed)
    sh = _shingles(docs, text_col, id_col, shingle_n)
    # (a*h + b) mod P in long arithmetic; pmod keeps it non-negative
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(
                    F.lit(int(a[i])) * F.pmod(F.col("sh"), F.lit(_P)) + F.lit(int(b[i])),
                    F.lit(_P),
                )
            ).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    bands: int = 8,
    max_bucket: int = 200,
) -> DataFrame:
    """Band the signatures, bucket-join, emit candidate pairs with the
    estimated Jaccard (= fraction of matching minhashes). Buckets larger
    than ``max_bucket`` (boilerplate content) are dropped with a `capped`
    count in the returned DataFrame's companion — pairs within kept buckets
    only. Output: (doc_a, doc_b, est_jaccard), doc_a < doc_b, distinct."""
    num_hashes = None  # derived below from the sig array
    sig = signatures.select("doc_id", "sig")
    num_hashes = len(sig.first()["sig"]) if sig.head(1) else 0
    if num_hashes == 0:
        return sig.sparkSession.createDataFrame([], "doc_a long, doc_b long, est_jaccard double")
    rows_per_band = max(1, num_hashes // bands)
    banded = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", i * rows_per_band + j + 1)
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
    kept = banded.join(
        sizes.filter(F.col("bsz") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
    )
    a = kept.select("band", "bucket", F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    b = kept.select("band", "bucket", F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    ) / F.lit(float(num_hashes))
    return pairs.select("doc_a", "doc_b", est.alias("est_jaccard")).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 500,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing ≥1 shingle.
    Shingles appearing in more than ``max_doc_freq`` docs (stop-shingles)
    are excluded from candidate generation (but kept for the exact
    intersection/union arithmetic). Output (doc_a, doc_b, jaccard ≥
    threshold)."""
    sh = _shingles(docs, text_col, id_col, shingle_n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    df_counts = sh.groupBy("sh").agg(F.count("*").alias("df"))
    rare = sh.join(df_counts.filter(F.col("df") <= max_doc_freq).select("sh"), "sh")
    cand = (
        rare.select("sh", F.col("doc_id").alias("doc_a"))
        .join(rare.select("sh", F.col("doc_id").alias("doc_b")), "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    inter = (
        sh.select("sh", F.col("doc_id").alias("doc_a"))
        .join(sh.select("sh", F.col("doc_id").alias("doc_b")), "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .join(cand, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document: tokens hashed, each bit position votes
    ±1 across tokens, sign → bit. Bit-vote runs as a vectorized Arrow
    ``applyInPandas`` over per-doc token-hash groups."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("doc_id", F.xxhash64("tok").alias("th"))
    )

    def votes(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["th"].to_numpy().astype(np.uint64)
        doc = pdf["doc_id"].iloc[0]
        acc = np.zeros(bits, dtype=np.int64)
        for i in range(bits):
            bit = (h >> np.uint64(i)) & np.uint64(1)
            acc[i] = int(bit.sum() * 2 - len(h))  # (+1 per 1-bit, -1 per 0-bit)
        sig = 0
        for i in range(bits):
            if acc[i] > 0:
                sig |= 1 << i
        # store as signed 64-bit
        sig = sig - (1 << 64) if sig >= (1 << 63) else sig
        return pd.DataFrame({"doc_id": [doc], "simhash": [sig]})

    return toks.groupBy("doc_id").applyInPandas(votes, "doc_id long, simhash long")


def simhash_near_duplicates(
    sims: DataFrame, max_hamming: int = 3, chunk_bits: int = 16
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk of 4 matches exactly),
    bucket-join, verify exact hamming distance. Output (doc_a, doc_b,
    hamming)."""
    n_chunks = 64 // chunk_bits
    mask = (1 << chunk_bits) - 1
    banded = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.pmod(F.shiftright("simhash", i * chunk_bits), F.lit(mask + 1)).alias("key"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.key").alias("key"))
    a = banded.select("chunk", "key", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = banded.select("chunk", "key", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    pairs = (
        a.join(b, ["chunk", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
