"""End-to-end training-data pipeline: the composition a real pretraining
corpus build runs, as ONE declarative DataFrame program.

    exact dedup (keep-first) →
    decontamination vs a held-out eval set →
    exact-substring duplicate-span accounting (Lee et al. coverage) →
    minimum-clean-length floor →
    greedy token-budget packing into training bins

Every stage is an already-oracle-checked operator; the pipeline's value is
demonstrating that the stages COMPOSE as lazy DataFrames — one Spark job
graph end to end, no materialization barriers between stages, so Catalyst
can push the survivor filters into every downstream scan.

Scale: the stages are each one-or-two keyed shuffles (fingerprint, gram,
doc id, shard); composition adds no new shuffle beyond its parts. The
only Python stage is the per-shard packer (Arrow-batched, (id, count)
columns only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def training_pipeline(
    docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    min_clean_tokens: int = 8,
    budget: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Returns the packed training manifest (doc_id, shard, bin_id, n_tok)
    over the curated survivor set, where n_tok is the POST-span-removal
    token count (what actually enters the training batch).

    Stage order matters and is deliberate: dedup before decontamination
    (cheaper predicate first on fewer docs is wrong here — dedup's
    fingerprint pass is the cheapest stage and shrinks the gram explosion
    for decontamination); span coverage is computed on the SURVIVOR corpus
    so a document's duplicate spans are measured against what remains, not
    against copies that were already dropped."""
    from rabitq_spark.operators.chunking import pack_sequences
    from rabitq_spark.operators.curate import decontaminate
    from rabitq_spark.operators.dedup import dedup_exact
    from rabitq_spark.operators.spans import dup_span_profile

    keep = (
        dedup_exact(docs, id_col=id_col, text_col=text_col)
        .filter(F.col("is_dup") == 0)
        .select("doc_id")
    )
    surv = docs.join(
        keep.withColumnRenamed("doc_id", id_col).select(id_col), id_col
    )
    # barrier at the fan-out point: dup_span_profile references its input
    # TWICE (gram explosion + per-doc token counts) and Spark re-executes
    # rather than CSE-ing — without this the decontamination stage computes
    # 2-3x inside one job (measured at sf1.0; PLAN.md part-8 law #2). A lazy
    # localCheckpoint collapses the references to one shared RDD while
    # keeping the pipeline a single driver program.
    dc = decontaminate(
        surv, eval_docs, id_col=id_col, text_col=text_col, ngram=4
    ).localCheckpoint(eager=False)
    prof = dup_span_profile(
        dc, id_col=id_col, text_col=text_col, k=k, min_docs=min_docs
    ).withColumn("n_tok_clean", F.col("n_tokens") - F.col("dup_tokens"))
    final = prof.filter(F.col("n_tok_clean") >= min_clean_tokens)
    return pack_sequences(
        final,
        budget=budget,
        n_shards=n_shards,
        id_col="doc_id",
        count_col="n_tok_clean",
    )
