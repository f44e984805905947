"""Deterministic stratified sampling for dataset mixing.

Training-data pipelines over-/under-sample sources and languages to hit a
target mixture ("keep 30% of web English, all of the code subset"). At
100 TB the sample must be content-addressed and seeded — never `rand()` —
so reruns, retries, and different partitionings keep the SAME rows, and an
engine twin can reproduce the sample bit-for-bit (``hash_mode='md5'``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hash64

# rate resolution: keep iff hash(id:seed) mod RES < round(rate * RES)
SAMPLE_RES = 1_000_000


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = 0.0,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Keep each row iff ``hash64(id:seed) mod 1e6 < round(rate[group]*1e6)``
    — a seeded coin per row, group-dependent rate, resolution 1e-6. Groups
    absent from ``rates`` use ``default_rate``. Pure column expressions
    (scan stage, no shuffle); deterministic at any parallelism."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thr = F.lit(round(default_rate * SAMPLE_RES))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == g, F.lit(round(r * SAMPLE_RES))).otherwise(thr)
    draw = F.pmod(
        _hash64(F.concat_ws(":", F.col(id_col), F.lit(str(seed))), hash_mode),
        F.lit(SAMPLE_RES),
    )
    return df.filter(draw < thr)


def group_sample(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Seeded uniform k-sample per group ("100 eval docs per source"):
    rank rows within each group by a content-addressed hash (id tiebreak)
    and keep the k smallest. Deterministic across reruns/partitionings and
    engine-portable in md5 mode. One window partitioned by group — the
    skew bound is the group size, same as any per-group top-k."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    h = _hash64(F.concat_ws(":", F.col(id_col), F.lit(str(seed))), hash_mode)
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mix_epochs(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_weight: float = 1.0,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Weighted dataset mixing with UP-sampling: repeat each row
    ``weight[group]`` times (fractional weights resolved by a seeded coin).

    Training mixtures over-sample small high-quality sources (e.g. an
    encyclopedia subset at weight 3.2: every doc appears 3 times, and a
    deterministic 20% of docs a 4th time) while ``stratified_sample`` can
    only drop rows. Emits one row per (doc, epoch) with an ``epoch`` column
    in ``1..n`` so downstream packing/shuffling sees distinct copies.

    Deterministic and content-addressed like the rest of this module:
    ``n = floor(w) + (hash64(id:mix:seed) mod 1e6 < frac(w)*1e6)``, all
    integer arithmetic — bit-reproducible at any parallelism and in the
    DuckDB twin (``hash_mode='md5'``). Pure scan stage: weight lookup and
    the coin are column expressions; the repeat is ``explode(sequence)``,
    no shuffle, no driver loop. Weights are capped at 1000 so a typo can't
    explode the corpus by 10^6.
    """
    for g, wgt in weights.items():
        if not 0.0 <= wgt <= 1000.0:
            raise ValueError(f"weight for {g!r} must be in [0, 1000], got {wgt}")
    if not 0.0 <= default_weight <= 1000.0:
        raise ValueError(f"default_weight must be in [0, 1000], got {default_weight}")
    wq = F.lit(round(default_weight * SAMPLE_RES))
    for g, wgt in sorted(weights.items()):
        wq = F.when(F.col(group_col) == g, F.lit(round(wgt * SAMPLE_RES))).otherwise(wq)
    coin = F.pmod(
        _hash64(F.concat_ws(":", F.col(id_col), F.lit(f"mix:{seed}")), hash_mode),
        F.lit(SAMPLE_RES),
    )
    n = (wq / SAMPLE_RES).cast("long") + (coin < wq % SAMPLE_RES).cast("long")
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") >= 1)  # sequence(1, 0) would step BACKWARD in Spark
        .withColumn("epoch", F.explode(F.sequence(F.lit(1).cast("long"), F.col("_n"))))
        .drop("_n")
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    by: str | None = None,
    seed: int = 42,
    default_budget: int = 0,
    hash_mode: str = "xxhash64",
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy per-group token-budget selection: order each group's docs by
    a priority, keep docs while the running token total is under the
    group's budget ("2M tokens of French, 10M of code").

    Priority is a seeded content hash (``by=None`` — a deterministic
    shuffle) or a named column descending (``by='quality_score'`` — best
    docs first), with ``id_col`` as tiebreak. A doc whose preceding total
    is under the budget is kept even if it crosses the line (greedy fill,
    same convention as sequence packing). Token counts follow
    ``pack_sequences``: whitespace tokens of ``text_col`` with NULL/empty
    → 0, or a precomputed ``tokens_col``.

    Scale path: the running total is kernel.distributed_cumsum over the
    (group, priority, id) ordering — range-partitioned prefix sum, never a
    per-group global window, so one huge group cannot funnel through a
    single task. Per-group exclusive totals are recovered by subtracting
    the group's minimum cumsum (an O(groups) broadcast join). Integer token
    counts make the totals bit-reproducible across engines.

    Returns the kept rows with ``n_tokens`` and ``tokens_before`` (the
    group-local exclusive running total) appended.
    """
    from .. import kernel as K

    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {g!r} must be >= 0, got {b}")
    if default_budget < 0:
        raise ValueError(f"default_budget must be >= 0, got {default_budget}")
    if tokens_col is not None:
        n_tokens = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0).cast("long"))
    else:
        t = F.col(text_col)
        n_tokens = (
            F.when(t.isNull() | (F.trim(t) == ""), F.lit(0))
            .otherwise(F.size(F.split(F.trim(t), r"\s+")))
            .cast("long")
        )
    if by is None:
        prio = F.pmod(
            _hash64(F.concat_ws(":", F.col(id_col), F.lit(f"budget:{seed}")), hash_mode),
            F.lit(SAMPLE_RES),
        )
    else:
        prio = -F.col(by)
    staged = df.withColumn("n_tokens", n_tokens).withColumn("_prio", prio)
    summed = K.distributed_cumsum(
        staged,
        [group_col, "_prio", id_col],
        "n_tokens",
        out_col="_cum",
        num_partitions=num_partitions,
    )
    group_base = summed.groupBy(group_col).agg(F.min("_cum").alias("_base"))
    budget = F.lit(int(default_budget)).cast("long")
    for g, b in sorted(budgets.items()):
        budget = F.when(F.col(group_col) == g, F.lit(int(b)).cast("long")).otherwise(budget)
    return (
        summed.join(F.broadcast(group_base), group_col)
        .withColumn("tokens_before", F.col("_cum") - F.col("_base"))
        .filter(F.col("tokens_before") < budget)
        .drop("_cum", "_base", "_prio")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Seeded weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each row draws ``u in (0, 1]`` from a content-addressed hash and
    gets key ``ln(u) / w``; the k LARGEST keys are the sample. Inclusion
    probability is proportional to ``weight_col`` ("sample 100k docs
    favoring high quality_score"), and the draw is deterministic across
    reruns, partitionings, and engines (``hash_mode='md5'``).

    The log formulation of the classic ``u^(1/w)`` key avoids pow
    over/underflow for extreme weights. Rows with weight <= 0 or NULL are
    excluded (their inclusion probability is 0). Ties (hash collisions)
    break on ``id_col`` so the sample is total-ordered.

    Scale path: ``ORDER BY key DESC LIMIT k`` is Spark's TakeOrdered — a
    per-partition top-k then a driver merge of k·partitions candidates,
    never a global sort of the corpus. Returns the sampled rows with
    ``sample_key`` appended (6 dp, hash-stable).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    draw = F.pmod(
        _hash64(F.concat_ws(":", F.col(id_col), F.lit(f"wsample:{seed}")), hash_mode),
        F.lit(SAMPLE_RES),
    )
    u = (draw + F.lit(1)).cast("double") / F.lit(float(SAMPLE_RES))
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, 6)
    return (
        df.filter(w > 0)
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.3,
    group_col: str = "lang",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Temperature-flattened mixture weights per group (the multilingual-LM
    resampling rule, mC4/XLM-R style): with p_g the group's share of total
    tokens, the target sampling distribution is q_g ∝ p_g^alpha — alpha=1
    keeps the natural mixture, alpha→0 approaches uniform over groups —
    and ``repeat_factor = (q_g / p_g) / min_h(q_h / p_h)`` is the pure
    up-sampling multiplier (min 1.0) to feed straight into
    :func:`mix_epochs` as ``weights``.

    Token counts follow ``pack_sequences``: whitespace tokens of
    ``text_col`` with NULL/empty → 0, or a precomputed ``tokens_col``
    (real BPE counts). NULL groups are a group of their own only if
    present; groups whose token total is 0 are excluded (p_g = 0 has no
    finite flatten) and reported implicitly by their absence.

    Returns one row per group: ``(group, n_docs, n_tokens, p, q,
    repeat_factor)``, each float rounded 9dp. Scale: one map-side-combined
    groupBy over the corpus; everything after operates on the O(groups)
    aggregate (broadcast scalar joins).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if tokens_col is not None:
        n_tokens = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0).cast("long"))
    else:
        t = F.col(text_col)
        n_tokens = (
            F.when(t.isNull() | (F.trim(t) == ""), F.lit(0))
            .otherwise(F.size(F.split(F.trim(t), r"\s+")))
            .cast("long")
        )
    groups = (
        df.select(F.col(group_col).alias("group"), n_tokens.alias("_t"))
        .groupBy("group")
        .agg(F.count("*").alias("n_docs"), F.sum("_t").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    total = groups.agg(F.sum("n_tokens").alias("_tot"))
    withp = groups.join(F.broadcast(total)).withColumn(
        "_p", F.col("n_tokens") / F.col("_tot")
    )
    withq_raw = withp.withColumn("_qr", F.pow(F.col("_p"), F.lit(float(alpha))))
    qsum = withq_raw.agg(F.sum("_qr").alias("_qs"))
    scored = (
        withq_raw.join(F.broadcast(qsum))
        .withColumn("_q", F.col("_qr") / F.col("_qs"))
        .withColumn("_r", F.col("_q") / F.col("_p"))
    )
    rmin = scored.agg(F.min("_r").alias("_rm"))
    return (
        scored.join(F.broadcast(rmin))
        .select(
            "group",
            "n_docs",
            "n_tokens",
            F.round("_p", 9).alias("p"),
            F.round("_q", 9).alias("q"),
            F.round(F.col("_r") / F.col("_rm"), 9).alias("repeat_factor"),
        )
    )
