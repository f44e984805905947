"""Random-hyperplane (sign) LSH for cosine similarity over embeddings.

Charikar 2002 sign sketches: bit_i(v) = sign(r_i . v) for random
hyperplanes r_i; similar vectors agree on most bits, so banding the bit
signature buckets near-duplicates without the all-pairs join — the
embedding-space analog of MinHash-LSH (text/dedup.py), and the scale path
when IVF's coarse quantizer is too lossy for near-dup thresholds.

Engine-exactness: hyperplane entries are integers derived from the md5
hash of (seed, bit, dim) and embeddings are quantized to 1e-6 integers, so
every dot product is EXACT int64 arithmetic — the signature, the band
buckets, and the candidate pairs are bitwise-reproducible in any engine
(no float sign flips at the boundary). The optional cosine rerank is the
only float step and is rounded like the other ANN twins.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000  # embedding quantization: 1e-6 resolution
_R_SPAN = 1000  # hyperplane entries in [-1000, 1000]


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[int]]:
    """Deterministic integer hyperplanes: entry (i, j) = md5-60bit of
    'seed:i:j' mod (2*span+1) - span — the same derivation a SQL twin can
    evaluate with md5()."""
    out = []
    for i in range(n_bits):
        row = []
        for j in range(dim):
            h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:15], 16)
            row.append(h % (2 * _R_SPAN + 1) - _R_SPAN)
        out.append(row)
    return out


def rp_signatures(
    emb: DataFrame,
    dim: int,
    n_bits: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, sig) — the packed ``n_bits``-bit sign signature (bit i set
    iff r_i . v_quantized >= 0). Pure column expressions per row: the
    scan-stage cost is n_bits fixed-order integer folds of length dim."""
    if not 1 <= n_bits <= 60:
        raise ValueError(f"n_bits must be in [1, 60], got {n_bits}")
    planes = _hyperplanes(dim, n_bits, seed)
    q = F.transform(F.col(vec_col), lambda x: F.round(x.cast("double") * QUANT).cast("long"))
    sig = F.lit(0).cast("long")
    for i, row in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(q, F.lit(row), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return emb.select(F.col(id_col).alias("vec_id"), sig.alias("sig"))


def rp_lsh_candidates(
    sigs: DataFrame,
    bands: int = 4,
    n_bits: int = 16,
    max_bucket: int = 200,
) -> DataFrame:
    """Banded candidate pairs ``(doc_a, doc_b)`` with doc_a < doc_b: split
    the signature into ``bands`` contiguous bit slices; vectors sharing any
    slice value land in one bucket and pair up. ``max_bucket`` caps the
    per-bucket fan-out (the minhash-LSH skew guard) — oversized buckets are
    dropped, not exploded."""
    if n_bits % bands != 0:
        raise ValueError(f"bands ({bands}) must divide n_bits ({n_bits})")
    width = n_bits // bands
    mask = (1 << width) - 1
    slices = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("sig", b * width).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for b in range(bands)
    ])
    buckets = sigs.select("vec_id", F.explode(slices).alias("s")).select(
        "vec_id", F.col("s.band").alias("band"), F.col("s.key").alias("key")
    )
    sized = buckets.groupBy("band", "key").agg(
        F.collect_list("vec_id").alias("ids"), F.count("*").alias("n")
    ).filter((F.col("n") >= 2) & (F.col("n") <= max_bucket))
    a = F.explode("ids").alias("doc_a")
    pairs = (
        sized.select(a, F.col("ids"))
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    return pairs


def rp_near_duplicates(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_bucket: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed near-duplicate pairs with an exact cosine rerank:
    ``(doc_a, doc_b, cosine)`` for candidates with cosine >= threshold.
    Work is O(candidates * dim), never all-pairs."""
    sigs = rp_signatures(emb, dim, n_bits=n_bits, seed=seed, id_col=id_col, vec_col=vec_col)
    cand = rp_lsh_candidates(sigs, bands=bands, n_bits=n_bits, max_bucket=max_bucket)
    vecs = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x), F.lit(0.0), lambda a, x: a + x
    ))
    scored = (
        cand.join(vecs.withColumnRenamed("_id", "doc_a").withColumnRenamed("_v", "va"), "doc_a")
        .join(vecs.withColumnRenamed("_id", "doc_b").withColumnRenamed("_v", "vb"), "doc_b")
        .select(
            "doc_a", "doc_b",
            (dot / (norm(F.col("va")) * norm(F.col("vb")))).alias("cosine"),
        )
    )
    return scored.filter(F.col("cosine") >= threshold)
