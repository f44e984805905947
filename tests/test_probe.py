"""Trained quality probe (text/probe.py): NumPy-transliteration parity
(bit-exact for the linear link — the integer-quantized gradient device),
partition invariance, logistic-link behavior, and planted-signal
separation."""

from __future__ import annotations

import numpy as np
import pytest

from dmid_spark.text import probe_features, probe_scores, train_probe
from dmid_spark.text.probe import PROBE_SCALE

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the fox "
    "rests in the shade of a tall tree with all of its friends nearby"
)
BAD = "x1 9f3k zz"


def _docs_df(spark, n_good=12, n_bad=8):
    rows = [(i, GOOD + " again and again" * (i % 3)) for i in range(n_good)]
    rows += [(100 + i, BAD * (1 + i % 2)) for i in range(n_bad)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _probe_numpy_oracle(feats_rows, lr, iters, link="linear", scale=PROBE_SCALE):
    """Transliteration of train_probe: fixed left-to-right dot, per-doc
    contributions quantized floor(c*scale + 0.5) as int64, exact sums,
    one IEEE division per feature per step."""
    X = np.array([[r[f"x{j}"] for j in range(5)] for r in feats_rows])
    y = np.array([r["y"] for r in feats_rows])
    w = np.zeros(5)
    for _ in range(iters):
        z = np.zeros(len(X))
        for j in range(5):  # fixed left-to-right association
            z = z + w[j] * X[:, j]
        pred = 1.0 / (1.0 + np.exp(-z)) if link == "logistic" else z
        resid = pred - y
        for j in range(5):
            q = np.floor(resid * X[:, j] * float(scale) + 0.5).astype(np.int64)
            w[j] = w[j] - lr * (float(q.sum()) / (len(X) * float(scale)))
    return w


def test_linear_probe_matches_numpy_bit_exact(spark):
    feats = probe_features(_docs_df(spark))
    rows = feats.collect()
    model = train_probe(feats, lr=0.5, iterations=3, link="linear")
    exp_w = _probe_numpy_oracle(rows, lr=0.5, iters=3)
    # transcendental-free + exact int sums: the trajectory is bit-identical
    np.testing.assert_allclose(model.weights, exp_w, rtol=0, atol=0)
    assert model.n_docs == 20 and model.iterations == 3
    # scores replay the same fixed-order dot
    got = {r["doc_id"]: r["score"] for r in probe_scores(feats, model).collect()}
    for r in rows:
        z = 0.0
        for j in range(5):
            z = z + exp_w[j] * r[f"x{j}"]
        np.testing.assert_allclose(got[r["doc_id"]], z, rtol=0, atol=0)


def test_probe_partition_invariant(spark):
    feats = probe_features(_docs_df(spark, n_good=20, n_bad=15))
    m1 = train_probe(feats.repartition(1), iterations=2)
    m7 = train_probe(feats.repartition(7), iterations=2)
    np.testing.assert_allclose(m1.weights, m7.weights, rtol=0, atol=0)


def test_logistic_probe_converges_and_matches_numpy(spark):
    feats = probe_features(_docs_df(spark))
    model = train_probe(feats, lr=1.0, iterations=5, link="logistic")
    # log-loss must fall from the w=0 start (ln 2)
    assert model.loss_per_iter[0] == pytest.approx(np.log(2.0), abs=1e-9)
    assert model.loss_per_iter[-1] < model.loss_per_iter[0]
    exp_w = _probe_numpy_oracle(
        feats.collect(), lr=1.0, iters=5, link="logistic"
    )
    # exp() last-ulp variance compounds across iterations: close, not exact
    np.testing.assert_allclose(model.weights, exp_w, atol=1e-9)


def test_probe_separates_planted_quality(spark):
    feats = probe_features(_docs_df(spark, n_good=15, n_bad=15))
    model = train_probe(feats, lr=0.5, iterations=8, link="linear")
    scored = probe_scores(feats, model).collect()
    good = [r["score"] for r in scored if r["y"] == 1.0]
    bad = [r["score"] for r in scored if r["y"] == 0.0]
    assert good and bad
    # the trained probe must rank every prose doc above every junk doc
    assert min(good) > max(bad)


def test_probe_validations(spark):
    feats = probe_features(_docs_df(spark))
    with pytest.raises(ValueError, match="link"):
        train_probe(feats, link="hinge")
    with pytest.raises(ValueError, match="empty"):
        train_probe(feats.filter("doc_id < 0"), iterations=1)
