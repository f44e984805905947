"""Deduplication operators over document tables.

The standard large-scale training-data pipeline suite: exact (hash groupBy),
MinHash+LSH (shingle → minhash → band → bucket join), SimHash, and n-gram
Jaccard verification. All hashing is deterministic (xxhash64 by default,
or the engine-portable md5-prefix mode via ``hash_mode='md5'`` for DuckDB
oracle twins) so results are reproducible across runs and parallelism
levels. Everything — including the SimHash bit-vote — is JVM-side column
expressions; no Python in any hot path.

Scale notes (100 TB): the shingle explode is the big intermediate — it
stays (doc_id, hash) longs only; LSH buckets self-join within bands with a
bucket-size cap (hot buckets = boilerplate shingles → capped and reported,
not silently exploded); pair verification joins only candidate pairs.
"""

from __future__ import annotations

import numpy as np
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


def _hash64(col, hash_mode: str) -> F.Column:
    """Deterministic 64-bit-ish hash of a string column.

    - ``'xxhash64'``: full 64-bit JVM hash (fastest).
    - ``'md5'``: first 15 hex chars of md5 as a 60-bit non-negative long —
      bitwise-reproducible in any engine (the DuckDB oracle twin uses
      ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``); the same trick as
      fingerprint.py's hash_mode.
    """
    if hash_mode == "md5":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return F.xxhash64(col)


def _shingles(
    docs: DataFrame, text_col: str, id_col: str, n: int, hash_mode: str = "xxhash64"
) -> DataFrame:
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
        "doc_id", _hash64(F.col("gram"), hash_mode).alias("sh")
    ).distinct()


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(doc_id, sig: array<long>) — minhash_i = min over shingles of
    (a_i·h(s)+b_i mod P). One shuffle (groupBy doc), num_hashes column
    expressions — no UDFs. ``hash_mode='md5'`` makes the shingle hash
    engine-portable (DuckDB twin)."""
    a, b = _hash_params(num_hashes, seed)
    sh = _shingles(docs, text_col, id_col, shingle_n, hash_mode=hash_mode)
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
    num_hashes: int | None = None,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Band the signatures, bucket-join, emit candidate pairs with the
    estimated Jaccard (= fraction of matching minhashes). Buckets larger
    than ``max_bucket`` (boilerplate content) are dropped with a `capped`
    count in the returned DataFrame's companion — pairs within kept buckets
    only. Output: (doc_a, doc_b, est_jaccard), doc_a < doc_b, distinct.

    Pass ``num_hashes`` explicitly to avoid a driver ``first()`` action on
    the signature table (it is only derived from the data as a fallback).
    ``hash_mode='md5'`` buckets by the md5 hex of the band slice instead of
    xxhash64 (DuckDB twin)."""
    sig = signatures.select("doc_id", "sig")
    if num_hashes is None:
        head = sig.head(1)
        num_hashes = len(head[0]["sig"]) if head else 0
    if num_hashes == 0:
        return sig.sparkSession.createDataFrame([], "doc_a long, doc_b long, est_jaccard double")
    rows_per_band = max(1, num_hashes // bands)

    def bucket_of(i: int) -> F.Column:
        slice_str = F.concat_ws(
            ",",
            *[F.element_at("sig", i * rows_per_band + j + 1) for j in range(rows_per_band)],
        )
        return F.md5(slice_str) if hash_mode == "md5" else F.xxhash64(slice_str).cast("string")

    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), bucket_of(i).alias("bucket"))
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
    kept = banded.join(
        sizes.filter(F.col("bsz") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
    )
    a = kept.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    b = kept.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    # distinct over bare (doc_a, doc_b) pairs — the signature arrays join
    # back AFTER dedup so they are not carried through the pair shuffle
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    ) / F.lit(float(num_hashes))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
    )


def _band_table(
    sig: DataFrame, bands: int, rows_per_band: int, hash_mode: str, id_alias: str
) -> DataFrame:
    """(id, band, bucket) rows from a (doc_id, sig) signature table — the
    same banding as :func:`minhash_lsh_candidates`, reusable against a
    stored index."""

    def bucket_of(i: int) -> F.Column:
        slice_str = F.concat_ws(
            ",",
            *[F.element_at("sig", i * rows_per_band + j + 1) for j in range(rows_per_band)],
        )
        return F.md5(slice_str) if hash_mode == "md5" else F.xxhash64(slice_str).cast("string")

    return sig.select(
        F.col("doc_id").alias(id_alias),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), bucket_of(i).alias("bucket"))
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_alias, F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))


def dedup_against(
    new_docs: DataFrame,
    existing_sigs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket: int = 200,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    capped_out: list | None = None,
) -> DataFrame:
    """Incremental dedup: LSH-match a NEW batch of documents against a
    STORED signature table without ever re-pairing the old corpus with
    itself — the daily-ingest shape of a training-data pipeline. Output
    ``(new_id, old_id, est_jaccard)``: every index document whose banded
    minhash signature collides with a new document's, with the estimated
    Jaccard (fraction of matching minhashes).

    ``existing_sigs`` is a ``minhash_signatures`` output (persisted from a
    previous run); ``shingle_n``/``num_hashes``/``seed``/``hash_mode`` MUST
    match the parameters the index was built with or the hash families
    disagree and nothing collides. Batch-internal duplicates are a separate
    concern: run :func:`minhash_lsh_candidates` on the new batch's
    signatures for those.

    Scale shape: the new batch's signatures are one scan + groupBy over the
    (small) batch; the bucket join touches only index rows whose (band,
    bucket) appears in the NEW batch — the old corpus never self-joins, so
    daily cost is O(batch + collisions), not O(corpus). Index-side buckets
    larger than ``max_bucket`` (boilerplate) are dropped with the same
    reported-never-silent cap as the other blockers: pass ``capped_out`` to
    receive one ``(band, bucket, bucket_size)`` tuple per drop."""
    new_sigs = minhash_signatures(
        new_docs, text_col=text_col, id_col=id_col, shingle_n=shingle_n,
        num_hashes=num_hashes, seed=seed, hash_mode=hash_mode,
    )
    rows_per_band = max(1, num_hashes // bands)
    nb = _band_table(new_sigs, bands, rows_per_band, hash_mode, "new_id")
    ob = _band_table(existing_sigs, bands, rows_per_band, hash_mode, "old_id")
    # the hot-bucket cap is measured on the INDEX side (that is where
    # boilerplate accumulates over time); a capped bucket drops from
    # matching entirely — reported, never silent
    sizes = ob.groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
    if capped_out is not None:
        capped_out.extend(
            (r["band"], r["bucket"], r["bsz"])
            for r in sizes.filter(F.col("bsz") > max_bucket).collect()
        )
    ob_kept = ob.join(
        sizes.filter(F.col("bsz") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
    )
    pairs = (
        nb.join(ob_kept, ["band", "bucket"])
        .select("new_id", "old_id")
        .distinct()
    )
    sn = new_sigs.select(F.col("doc_id").alias("new_id"), F.col("sig").alias("sig_n"))
    so = existing_sigs.select(F.col("doc_id").alias("old_id"), F.col("sig").alias("sig_o"))
    est = F.size(
        F.filter(F.zip_with("sig_n", "sig_o", lambda x, y: x == y), lambda v: v)
    ) / F.lit(float(num_hashes))
    return (
        pairs.join(sn, "new_id")
        .join(so, "old_id")
        .select("new_id", "old_id", est.alias("est_jaccard"))
    )


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
    # intersection driven by the candidate-pair set: expand each pair with
    # doc_a's shingles, keep those also present in doc_b. Work is
    # O(|cand| · doc-size); the old sh ⋈ sh over the unfiltered shingle
    # table cost k² rows for every stop-shingle appearing in k docs even
    # when those docs shared nothing rare.
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "sh"),
            ["doc_b", "sh"],
            "left_semi",
        )
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


def near_duplicate_clusters(
    pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b",
    driver_limit: int = 100_000,
) -> DataFrame:
    """Resolve near-dup candidate pairs into clusters and a canonical
    keep-list: ``(doc_id, canonical_id, cluster_size)`` — the output shape a
    training pipeline consumes (keep rows where doc_id == canonical_id,
    drop the rest). Canonical = min doc id per connected component of the
    pair graph. Only docs appearing in ``pairs`` are returned (singletons
    are trivially canonical). Works on the candidate pairs of any near-dup
    operator: minhash_lsh_candidates, simhash_near_duplicates,
    cosine_near_duplicates.

    Pair sets up to ``driver_limit`` rows resolve through a driver-side
    union-find (the iterative small-star/large-star CC costs several fixed
    job rounds — pure overhead on a small pair table); bigger sets run the
    distributed CC kernel (same as X2, so resolution scales like the graph
    engine, not like the pair count²). Both paths produce identical rows —
    components and min-id canonicals are algorithm-independent — mirroring
    the louvain rebase_limit small/large pattern."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).persist()
    n_pairs = edges.limit(driver_limit + 1).count()
    if n_pairs <= driver_limit:
        rows = edges.collect()
        edges.unpersist()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            a, b = int(r["src"]), int(r["dst"])
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp: dict[int, list[int]] = {}
        for v in parent:
            comp.setdefault(find(v), []).append(v)
        out = [
            (v, root, len(members))
            for root, members in comp.items()
            for v in members
        ]
        return pairs.sparkSession.createDataFrame(
            out, "doc_id long, canonical_id long, cluster_size long"
        )
    from ..algorithms.components import connected_components

    labels, _ = connected_components(edges.withColumn("weight", F.lit(1.0)))
    edges.unpersist()
    clusters = labels.groupBy("component").agg(
        F.min("id").alias("canonical_id"), F.count("*").alias("cluster_size")
    )
    return labels.join(clusters, "component").select(
        F.col("id").alias("doc_id"), "canonical_id", "cluster_size"
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """SimHash per document: tokens hashed, each bit position votes ±1
    across tokens, sign → bit.

    The bit-vote is ``bits`` JVM-side ``sum((th >> i) & 1)`` aggregate
    columns folded into the signature via one ``aggregate`` over the vote
    array — one map-side-combined shuffle, no Python anywhere (the previous
    ``applyInPandas`` made one pandas group per document: billions of tiny
    Python groups at scale). The fold is a higher-order-function loop, not
    a ``bits``-term expression chain: the old chained ``when`` sum generated
    a >64 KB ``processNext()`` that janino refused to compile, silently
    dropping the whole scan stage to interpreted execution. Bit i of
    token-hash ``th`` survives arithmetic shiftright because ``& 1`` reads
    the landed bit only; bit 63's shiftleft(1, 63) IS the signed long min —
    exactly the two's-complement value wanted (shifts are bitwise, exempt
    from ANSI overflow checks).

    ``hash_mode='md5'`` (use with bits=60): 60-bit md5-prefix token hashes,
    engine-portable for the DuckDB twin."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("doc_id", _hash64(F.col("tok"), hash_mode).alias("th"))
    )
    ones = [
        F.sum(F.shiftright("th", i).bitwiseAND(F.lit(1))).alias(f"o{i}")
        for i in range(bits)
    ]
    g = toks.groupBy("doc_id").agg(F.count("*").alias("n"), *ones)
    votes = F.array(
        *[(F.col(f"o{i}") * 2 > F.col("n")).cast("long") for i in range(bits)]
    )
    sig = F.expr(
        f"aggregate(zip_with(_votes, sequence(0, {bits - 1}),"
        " (v, i) -> shiftleft(v, CAST(i AS INT))),"
        " CAST(0 AS LONG), (acc, x) -> acc | x)"
    )
    return g.select("doc_id", votes.alias("_votes")).select(
        "doc_id", sig.alias("simhash")
    )


def simhash_near_duplicates(
    sims: DataFrame,
    max_hamming: int = 3,
    chunk_bits: int = 16,
    bits: int = 64,
    max_bucket: int = 200,
    capped_out: list | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the ``bits``-bit signature into
    ``chunk_bits``-bit chunks (pigeonhole: hamming < n_chunks ⇒ some chunk
    matches exactly), bucket-join, verify exact hamming distance. Output
    (doc_a, doc_b, hamming).

    Buckets holding more than ``max_bucket`` docs are dropped from pairing
    — the same hot-bucket cap as :func:`minhash_lsh_candidates`: short or
    templated corpora collapse many docs onto identical chunks (the
    all-zero chunk especially), and one hot (chunk, key) bucket is a
    quadratic all-pairs join in disguise. The drop is reported, never
    silent: pass a list as ``capped_out`` and it receives one
    ``(chunk, key, bucket_size)`` tuple per dropped bucket (an action —
    only runs when asked). A doc dropped from a hot chunk can still pair
    through its other, rarer chunks."""
    n_chunks = bits // chunk_bits
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
    sizes = banded.groupBy("chunk", "key").agg(F.count("*").alias("bsz"))
    if capped_out is not None:
        capped_out.extend(
            (r["chunk"], r["key"], r["bsz"])
            for r in sizes.filter(F.col("bsz") > max_bucket).collect()
        )
    banded = banded.join(
        sizes.filter(F.col("bsz") <= max_bucket).select("chunk", "key"),
        ["chunk", "key"],
    )
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
