"""Trained quality probe — distill heuristic gates into a linear scorer.

Not in the reference repo — LLM-pipeline extension: production corpus
filters are *trained* classifiers (CCNet's fastText LM filter, FineWeb's
quality classifiers), bootstrapped from cheap labels. This module closes
that loop inside the engine: featurize every document with the exact
quality columns :mod:`.quality` already computes, label with a heuristic
gate (or any caller-supplied label column), and train a linear probe by
full-batch gradient descent — then score the whole corpus with one scan.

Spark-first shape: everything is JVM column expressions — features,
residuals, gradients, scores; no UDF anywhere. One aggregate action per
GD iteration (D+1 sums + a count, map-side combined); the D+1 weights
live on the driver like k-means' centroids. Scoring is a scan.

Determinism — the cross-engine replay device of :mod:`..sim.kmeans`:
the squared-loss link keeps the whole computation inside IEEE +/*
(no transcendentals), and each document's per-feature gradient
contribution is **integer-quantized** (``floor(c·S + 0.5)`` as int64)
before summing, so gradients are EXACT integers independent of partition
layout and reduce order — the weight trajectory is bit-identical at any
parallelism and replayable in an engine twin (text_quality_probe).
Overflow headroom at scale: |contribution| ≤ |resid|·|x|·S ≈ 1e11 at the
defaults, so int64 holds ~1e7 such rows per partial — beyond ~1e12 docs,
lower ``quant_scale`` (the same dial as kmeans.QUANT_SCALE).

``link='logistic'`` swaps in the sigmoid for production use — still
deterministic within Spark (one JVM ``exp``), but exp()'s last-ulp
variance across engines breaks bit-replay, so the SQL-twinned driver
query pins ``link='linear'`` (the pytest covers logistic against a NumPy
transliteration at 1e-9 instead).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PROBE_SCALE = 1_000_000_000


@dataclass
class ProbeModel:
    weights: list[float]
    feature_cols: list[str]
    link: str = "linear"
    iterations: int = 0
    lr: float = 0.5
    n_docs: int = 0
    loss_per_iter: list[float] = field(default_factory=list)
    wall_sec: float = 0.0


def probe_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The probe's feature relation: bias + 4 exact-arithmetic quality
    features (same definitions as :func:`.quality.quality_scores`, and
    exactly replayable in SQL — integer counts divided once):

    - ``x0`` = 1.0 (bias)
    - ``x1`` = n_chars / 1000
    - ``x2`` = n_tokens / 100
    - ``x3`` = mean token length / 10 (kept ≲ 1 so the default lr sits
      inside full-batch GD's stable region — λ_max ≈ Σ E[x_j²])
    - ``x4`` = stopword ratio

    plus ``y`` — the heuristic gate label (1.0 for docs passing
    ``n_tokens >= 20 AND stopword_ratio >= 0.04``, the cheap "looks like
    prose" positive class a production probe would bootstrap from).
    """
    from .quality import quality_scores

    q = quality_scores(docs, text_col=text_col)
    return q.select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / 1000.0).alias("x1"),
        (F.col("n_tokens") / 100.0).alias("x2"),
        (F.col("mean_token_len") / 10.0).alias("x3"),
        F.col("stopword_ratio").alias("x4"),
        F.when(
            (F.col("n_tokens") >= 20) & (F.col("stopword_ratio") >= 0.04), 1.0
        ).otherwise(0.0).alias("y"),
    )


def _z(weights: list[float], cols: list[str]) -> Column:
    """The fixed left-to-right linear combination w0*x0 + w1*x1 + … —
    the exact association order the SQL twin writes out, so both engines
    produce the identical double."""
    z = F.lit(float(weights[0])) * F.col(cols[0])
    for w, c in zip(weights[1:], cols[1:]):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def train_probe(
    features: DataFrame,
    feature_cols: list[str] | None = None,
    label_col: str = "y",
    lr: float = 0.5,
    iterations: int = 3,
    link: str = "linear",
    quant_scale: int = PROBE_SCALE,
) -> ProbeModel:
    """Full-batch GD from ``w = 0``. Each iteration is ONE aggregate
    action: per-feature exact int64 gradient sums (quantized per-doc
    contributions) + the doc count; the weight update happens on the
    driver as one IEEE division per feature. ``link='linear'`` minimizes
    squared loss (gradient ``(w·x − y)·x``); ``link='logistic'`` minimizes
    log loss (gradient ``(σ(w·x) − y)·x``)."""
    if link not in ("linear", "logistic"):
        raise ValueError(f"link must be 'linear' or 'logistic', got {link!r}")
    cols = feature_cols or [c for c in features.columns if c.startswith("x")]
    t0 = time.time()
    w = [0.0] * len(cols)
    model = ProbeModel(weights=w, feature_cols=cols, link=link, lr=lr)
    feats = features.select(*cols, F.col(label_col).cast("double").alias("__y"))
    for _ in range(iterations):
        z = _z(w, cols)
        pred = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) if link == "logistic" else z
        resid = pred - F.col("__y")
        aggs = [
            F.sum(
                F.floor(resid * F.col(c) * F.lit(float(quant_scale)) + F.lit(0.5))
                .cast("long")
            ).alias(f"s{j}")
            for j, c in enumerate(cols)
        ]
        loss = (
            F.sum(resid * resid).alias("__loss")
            if link == "linear"
            else F.sum(
                -(F.col("__y") * F.log(pred)
                  + (F.lit(1.0) - F.col("__y")) * F.log(F.lit(1.0) - pred))
            ).alias("__loss")
        )
        row = feats.agg(*aggs, F.count("*").alias("n"), loss).collect()[0]
        n = row["n"]
        if n == 0:
            raise ValueError("train_probe: empty feature table")
        w = [
            w[j] - lr * (float(row[f"s{j}"]) / (n * float(quant_scale)))
            for j in range(len(cols))
        ]
        model.loss_per_iter.append(float(row["__loss"]) / n)
        model.n_docs = n
    model.weights = w
    model.iterations = iterations
    model.wall_sec = time.time() - t0
    return model


def probe_scores(
    features: DataFrame, model: ProbeModel, round_dp: int | None = None
) -> DataFrame:
    """Score every row with the trained probe: one scan, pure column
    arithmetic (plus one ``exp`` for the logistic link). Returns the
    input's ``doc_id`` and label (when present) with ``score``;
    ``round_dp`` quantizes for engine-twin hash stability (with the
    ``+ 0.0`` negative-zero collapse)."""
    z = _z(model.weights, model.feature_cols)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) if model.link == "logistic" else z
    if round_dp is not None:
        score = F.round(score, round_dp) + F.lit(0.0)
    keep = ["doc_id"] + (["y"] if "y" in features.columns else [])
    return features.select(*keep, score.alias("score"))
