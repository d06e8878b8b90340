"""Learned quality classifier (operators/quality_model.py): the model must
separate held-out docs from two token distributions — the semantic gate the
rows-only registered query can't express in SQL."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rabitq_spark.operators.quality_model import (
    score_quality,
    train_quality_classifier,
    weak_label_quality_filter,
)

GOOD_VOCAB = ["theorem", "proof", "lemma", "algebra", "measure", "bound"]
BAD_VOCAB = ["click", "win", "free", "casino", "pills", "offer"]
COMMON = ["the", "a", "and", "of"]


def _doc(rng, vocab):
    words = []
    for _ in range(30):
        pool = vocab if rng.random() < 0.6 else COMMON
        words.append(pool[rng.integers(0, len(pool))])
    return " ".join(words)


def _corpus(spark, n=300, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        good = i % 2 == 0
        rows.append((i, _doc(rng, GOOD_VOCAB if good else BAD_VOCAB), float(good)))
    return spark.createDataFrame(rows, "doc_id bigint, text string, label double")


def test_classifier_separates_held_out(spark):
    df = _corpus(spark)
    train = df.filter(F.col("doc_id") < 200)
    test = df.filter(F.col("doc_id") >= 200)
    model = train_quality_classifier(train)
    scored = score_quality(model, test).toPandas()
    truth = test.select(F.col("doc_id").alias("id"), "label").toPandas()
    j = scored.merge(truth, on="id")
    good = j[j["label"] == 1.0]["prob"]
    bad = j[j["label"] == 0.0]["prob"]
    assert good.mean() > 0.8, good.mean()
    assert bad.mean() < 0.2, bad.mean()
    # hard separation on this easy synthetic: every held-out doc classified
    assert (good > 0.5).mean() >= 0.95
    assert (bad < 0.5).mean() >= 0.95


def test_weak_label_filter_generalizes(spark):
    """The weak-label rule sees only HALF the good docs (doc_id % 4 == 0, the
    'reference corpus'); the other good half sits UNLABELED inside the
    negative class — the GPT-3 situation (the crawl negatives contain good
    docs). The learned scores must still RANK the unlabeled good half above
    the bad docs (the usable signal; absolute probabilities are depressed by
    the label noise, which is why GPT-3 thresholds by rank, not at 0.5)."""
    df = _corpus(spark, n=400, seed=12)
    out = weak_label_quality_filter(
        df, good_condition=F.col("doc_id") % 4 == 0
    ).toPandas()
    truth = df.select(F.col("doc_id").alias("id"), "label").toPandas()
    j = out.merge(truth, on="id")
    missed_good = j[(j["label"] == 1.0) & (j["id"] % 4 == 2)]["prob"].values
    labeled_bad = j[j["label"] == 0.0]["prob"].values
    # AUC of unlabeled-good vs bad
    auc = (missed_good[:, None] > labeled_bad[None, :]).mean()
    assert auc >= 0.95, auc
    # keep is exactly the thresholded prob (plumbing, not calibration)
    assert (j["keep"] == (j["prob"] >= 0.5)).all()
