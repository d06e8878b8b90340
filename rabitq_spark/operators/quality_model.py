"""Model-based quality filtering: the GPT-3-style logistic-regression
corpus classifier (Brown et al. 2020, Appendix A: an LR classifier over
hashed token features, trained "good reference corpus vs raw crawl", then
used to score and filter the crawl).

This engine's heuristic `quality_score` (functions/text.py) is the rule-
based filter; this operator is the LEARNED one. Weak labels come from any
signal the caller trusts — a curated source, the heuristic's extremes, an
allowlist — so no human labels are needed.

Spark shape: tokenization and HashingTF featurization are per-row map work;
MLlib LogisticRegression trains with distributed treeAggregate; scoring is
one broadcast of the coefficient vector. Nothing driver-sized scales with
the corpus. Like the MLlib LSH entries, the trained state is not
SQL-expressible → the registered query is rows-only; the pytest gate
asserts the semantics (held-out separation) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rabitq_spark.functions.text import tokens


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 16,
    reg_param: float = 0.01,
    max_iter: int = 30,
):
    """Train LR over hashed token counts. `labeled` needs (text_col,
    label_col ∈ {0.0, 1.0}); returns the fitted model (coefficients live on
    the driver, broadcast at scoring time)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    feat = HashingTF(
        inputCol="__tokens", outputCol="features", numFeatures=num_features
    )
    df = labeled.select(
        F.col(label_col).cast("double").alias("label"),
        tokens(F.col(text_col)).alias("__tokens"),
    )
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param)
    model = lr.fit(feat.transform(df))
    # Drop the training summary before the model is ever captured in a task
    # closure: Spark 4's BinaryLogisticRegressionSummaryImpl pins the fitting
    # SparkSession, whose ObservationManager is not java-serializable — a
    # later model.transform then dies in task serialization (seen when any
    # df.observe ran earlier in the session). A save/load round-trip yields
    # an identical, summary-free model.
    import os
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    path = os.path.join(tempfile.mkdtemp(prefix="rabitq_lrq_"), "model")
    model.write().overwrite().save(path)
    return LogisticRegressionModel.load(path)


def score_quality(
    model,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 16,
) -> DataFrame:
    """(id, prob) — P(high quality) per document."""
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    feat = HashingTF(
        inputCol="__tokens", outputCol="features", numFeatures=num_features
    )
    df = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__tokens")
    )
    scored = model.transform(feat.transform(df))
    return scored.select(
        "id", vector_to_array("probability").getItem(1).alias("prob")
    )


def weak_label_quality_filter(
    docs: DataFrame,
    good_condition,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float = 0.5,
    num_features: int = 1 << 16,
) -> DataFrame:
    """End-to-end GPT-3 shape: weak-label by `good_condition` (a Column over
    `docs`), train, score EVERY doc, keep those the model scores above
    `keep_threshold` — including raw docs the label rule missed (the point:
    the model generalizes the rule). Output: (id, prob, keep)."""
    labeled = docs.select(
        F.col(text_col).alias("text"),
        good_condition.cast("double").alias("label"),
    )
    model = train_quality_classifier(
        labeled, num_features=num_features
    )
    scored = score_quality(
        model, docs, id_col=id_col, text_col=text_col, num_features=num_features
    )
    return scored.select(
        "id", "prob", (F.col("prob") >= keep_threshold).alias("keep")
    )
