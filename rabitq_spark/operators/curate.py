"""Corpus curation operators — the composition layer of the training-data
pipeline (north-star extension, SURVEY.md §7 phase 6): boilerplate-token
pruning by global document frequency, train-vs-eval decontamination, and
an end-to-end keep/drop verdict that chains the quality family.

All deterministic and DuckDB-mirrorable (integers, strings, and +,-,*,/
over bit-identical operands only — the same bit-exactness contract as
operators/corpus.py).

Scale notes (100 TB):

* token_df_prune shuffles twice, both keyed (token for the DF table,
  doc_id for reassembly) — no all-pairs step; the vocabulary table is tiny
  relative to the corpus and broadcast-eligible (AQE decides).
* decontaminate's eval side is the small side by construction (an eval
  set, not a corpus): its distinct gram set broadcasts; the train side is
  one exploded projection, one semi-join keyed by gram, one anti-join
  keyed by doc id.
* curate_corpus is a union of per-doc flag tables each produced by ONE
  keyed shuffle, joined back on doc_id — flags compute independently (no
  sequential barrier between filters) and the final join is AQE-planned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rabitq_spark.functions.text import (
    fingerprint,
    quality_score,
    shingles_from_tokens,
    tokens,
)


def token_df_prune(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Drop tokens whose corpus-wide document frequency falls outside
    [min_df, max_df_frac x n_docs] and rebuild each document's text in the
    original token order — the CCNet-style boilerplate/noise vocabulary
    prune (too-common tokens are boilerplate, singletons are noise).

    Output: (doc_id, text_pruned, n_tok_orig, n_tok_kept); docs whose
    every token is pruned survive with text_pruned = ''.

    Plan shape: posexplode -> distinct(token, doc) -> count per token (the
    DF table, one token-keyed shuffle); kept tokens join back to the
    exploded stream (vocab side is small -> broadcast/AQE); reassembly is
    one doc_id-keyed aggregation sorting (pos, token) structs — collect_list
    order is partition-dependent, array_sort makes it deterministic. The
    corpus row count rides a broadcast 1-row aggregate, never a driver
    action.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )
    df_tab = (
        tok.select("token", "doc_id")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    keep_tok = (
        df_tab.crossJoin(F.broadcast(total))
        .filter(
            (F.col("df") >= F.lit(min_df))
            & (
                F.col("df").cast("double")
                <= F.lit(max_df_frac) * F.col("n_docs").cast("double")
            )
        )
        .select("token")
    )
    pruned = (
        tok.join(keep_tok, "token")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("text_pruned"),
            F.count(F.lit(1)).cast("int").alias("n_tok_kept"),
        )
    )
    orig = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).alias("n_tok_orig"),
    )
    return orig.join(pruned, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("text_pruned"), F.lit("")).alias("text_pruned"),
        "n_tok_orig",
        F.coalesce(F.col("n_tok_kept"), F.lit(0)).cast("int").alias("n_tok_kept"),
    )


def contaminated_ids(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 4,
) -> DataFrame:
    """Train doc ids sharing at least one word-`ngram`-gram with the eval
    set (the GPT-3-style decontamination predicate, appendix-C analogue).

    One column out: (doc_id). The eval side is exploded to a DISTINCT gram
    set (small — it is an eval set); the train side explodes and
    semi-joins it keyed by gram. No all-pairs step.
    """
    # both sides: token array behind a barrier before the shingle lambda
    # (inlined tokens() re-splits per element_at — PLAN.md pitfall #2)
    eg = (
        eval_docs.select(tokens(F.col(text_col)).alias("__w"))
        .localCheckpoint(eager=False)
        .select(F.explode(shingles_from_tokens(F.col("__w"), ngram)).alias("gr"))
        .distinct()
    )
    tg = (
        train.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__w")
        )
        .localCheckpoint(eager=False)
        .select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("__w"), ngram)).alias("gr"),
        )
    )
    return tg.join(eg, "gr", "left_semi").select("doc_id").distinct()


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 4,
) -> DataFrame:
    """The filtering form of decontamination: train rows that share NO
    word-`ngram`-gram with the eval set, all original columns intact.
    contaminated_ids + one anti-join keyed by doc id."""
    bad = contaminated_ids(train, eval_docs, id_col, text_col, ngram).select(
        F.col("doc_id").alias("__contaminated_id")
    )
    return train.join(
        bad, F.col(id_col) == F.col("__contaminated_id"), "left_anti"
    )


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.73,
    contam_ngram: int = 4,
    max_top_token_frac: float = 0.12,
    max_dup_2gram_frac: float = 0.12,
    max_dup_3gram_frac: float = 0.05,
) -> DataFrame:
    """End-to-end keep/drop verdict per document, chaining the pipeline's
    quality family in the standard curation order:

      duplicate > contaminated > repetitive > low_quality > kept

    (first matching reason wins — a doc that is both a duplicate and low
    quality reports 'duplicate', matching how curation pipelines attribute
    drops). Output: (doc_id, keep, reason), keep = 1 iff reason = 'kept'.

    * duplicate    — exact-fingerprint dup that is not its group's min id
                     (the canonical survivor is NOT a duplicate).
    * contaminated — shares a word-`contam_ngram`-gram with `eval_docs`.
    * repetitive   — fails the Gopher-style repetition thresholds
                     (operators/corpus.py::repetition_stats).
    * low_quality  — quality_score < quality_min.

    Each flag is ONE keyed shuffle over its own projection; flags compute
    independently (no barrier) and meet in a doc_id-keyed left-join fan-in.
    """
    from rabitq_spark.operators.corpus import repetition_stats

    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )

    fp = d.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    canon = fp.groupBy("fp").agg(F.min("doc_id").alias("canon_id"))
    dup = (
        fp.join(canon, "fp")
        .filter(F.col("doc_id") != F.col("canon_id"))
        .select("doc_id", F.lit(1).alias("is_dup"))
    )

    rep = repetition_stats(
        d,
        max_top_token_frac=max_top_token_frac,
        max_dup_2gram_frac=max_dup_2gram_frac,
        max_dup_3gram_frac=max_dup_3gram_frac,
    ).select("doc_id", (F.col("keep") == 0).cast("int").alias("is_rep"))

    lowq = d.select(
        "doc_id",
        (quality_score(F.col("text")) < F.lit(quality_min)).cast("int").alias(
            "is_lowq"
        ),
    )

    out = d.select("doc_id").join(dup, "doc_id", "left")
    if eval_docs is not None:
        contam = contaminated_ids(
            d, eval_docs, "doc_id", "text", contam_ngram
        ).select("doc_id", F.lit(1).alias("is_contam"))
        out = out.join(contam, "doc_id", "left")
    else:
        out = out.withColumn("is_contam", F.lit(None).cast("int"))
    out = out.join(rep, "doc_id", "left").join(lowq, "doc_id", "left")

    reason = (
        F.when(F.col("is_dup") == 1, F.lit("duplicate"))
        .when(F.col("is_contam") == 1, F.lit("contaminated"))
        .when(F.col("is_rep") == 1, F.lit("repetitive"))
        .when(F.col("is_lowq") == 1, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
    )
    return out.select(
        "doc_id",
        reason.alias("reason"),
    ).withColumn("keep", (F.col("reason") == "kept").cast("int"))


def quality_filter_quantile(
    docs: DataFrame,
    keep_frac: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quantile-calibrated quality filter: drop (about) the worst
    `1 - keep_frac` of the corpus by quality_score, with the threshold
    LEARNED from the corpus instead of hard-coded.

    Cut rule: v_cut = the largest quality value whose cumulative doc count
    is <= floor((1-keep_frac) * N); docs with quality > v_cut are kept.
    Ties at the cut never straddle (a value is wholly kept or dropped), so
    the result is partitioning-independent. Output: (doc_id, quality).

    Plan shape: quality is one codegen projection; the histogram is one
    groupBy(quality) shuffle; the cumulative window runs over DISTINCT
    quality values only (bounded by the score's value domain, not the
    corpus — the same trick as value_percentiles); the scalar cut
    broadcasts back. No global row-number over the corpus.
    """
    from pyspark.sql import Window

    drop_frac = 1.0 - keep_frac  # compute ONCE; the oracle injects repr()
    q = docs.select(
        F.col(id_col).alias("doc_id"),
        quality_score(F.col(text_col)).alias("quality"),
    )
    tot = q.agg(F.count(F.lit(1)).alias("n"))
    hist = q.groupBy("quality").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("quality").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select("quality", F.sum("c").over(w).alias("cum"))
    cut = (
        cum.crossJoin(F.broadcast(tot))
        .filter(
            F.col("cum")
            <= F.floor(F.lit(drop_frac) * F.col("n").cast("double"))
        )
        .agg(F.max("quality").alias("v_cut"))
    )
    return (
        q.crossJoin(F.broadcast(cut))
        .filter(F.col("v_cut").isNull() | (F.col("quality") > F.col("v_cut")))
        .select("doc_id", "quality")
    )


def source_mix_sample(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    target_frac: float = 0.5,
    salt: str = "mix-v1",
) -> DataFrame:
    """Sqrt-weighted source mixing (temperature-sampled data mixing at
    alpha = 0.5, the GPT-3 appendix-A shape): sample the corpus down to
    ~`target_frac` of its rows with per-source rates proportional to
    sqrt(n_s)/n_s — upweighting small sources, flattening large ones.

        rate_s = least(1, target_frac * N * (sqrt(n_s)/W) / n_s),
        W = sum over sources (in source order) of sqrt(n_s)

    alpha is FIXED at 0.5 because sqrt is IEEE-correctly-rounded (pow is
    not), keeping every rate bit-identical across engines. W folds in
    source order via a running-sum window (deterministic order, unlike a
    plain SUM of doubles); membership is the md5-bucket coin every sampler
    in this repo uses (partitioning-independent, reproducible by salt).

    Output: the kept (doc_id, source) rows. Plan shape: one
    groupBy(source) aggregate (tiny, broadcast back), the cumulative
    window over |sources| rows, one scan with a codegen filter — the
    corpus itself never shuffles.
    """
    from pyspark.sql import Window

    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    )
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    weights = counts.select(
        "source",
        "n_s",
        F.sqrt(F.col("n_s").cast("double")).alias("w_s"),
        F.sum(F.sqrt(F.col("n_s").cast("double"))).over(w).alias("cum_w"),
    )
    tot = weights.agg(
        F.sum("n_s").alias("n_total"), F.max("cum_w").alias("w_total")
    )
    rates = weights.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.lit(target_frac)
            * F.col("n_total").cast("double")
            * (F.col("w_s") / F.col("w_total"))
            / F.col("n_s").cast("double"),
        ).alias("rate"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}|"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(u < F.col("rate"))
        .select("doc_id", "source")
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Canonical-representative selection per near-dup group: instead of
    keeping the minimum doc id (neardup_groups' is_dup contract), keep the
    HIGHEST-QUALITY member of each connected component — the policy real
    dedup pipelines want (drop the truncated/boilerplate copy, keep the
    clean one).

    Returns (doc_id, group_id, group_size, quality, keep). Ties break on
    ascending doc id, so the verdict is deterministic. One extra window
    over the already-grouped table; quality is the oracle-checked
    quality_score expression, so comparisons see bit-identical doubles in
    both engines.

    Scale: the component labels come from neardup_groups (min-label
    propagation, O(diameter) keyed rounds); the argmax is one window over
    group_id — groups are tiny (near-dup clusters), so no skew concern.
    """
    from pyspark.sql import Window

    from rabitq_spark.functions.text import quality_score
    from rabitq_spark.operators.graph import neardup_groups

    groups = neardup_groups(docs, pairs, id_col=id_col)
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        quality_score(F.col(text_col)).alias("quality"),
    )
    w = Window.partitionBy("group_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        groups.join(scored, "doc_id")
        .withColumn("__rk", F.row_number().over(w))
        .select(
            "doc_id",
            "group_id",
            "group_size",
            "quality",
            (F.col("__rk") == 1).cast("int").alias("keep"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ws-v1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): row i draws u_i from an md5 hash of (salt, id) and gets
    key_i = ln(u_i)/w_i (the log of the classic u^(1/w) key — same order,
    no pow); the k LARGEST keys are an exact weight-proportional sample.
    The pretraining use: quality- or length-weighted corpus subsampling
    that is reproducible across runs, partitionings, and engines — unlike
    rand()-based sampling.

    Scale shape: one scan computes the key in codegen; selection is a
    global top-k (WindowGroupLimit — only k rows survive each partition's
    local sort before the single-reducer final pick). Rows with
    non-positive weight never win (key −∞ via a NULL filter).

    Determinism note: ln() is the one transcendental in this repo's
    oracle-checked surface; Spark (Java Math.log) and DuckDB (libm) may
    disagree in the last ulp, but only the ORDER of keys matters and
    md5-derived keys are ~1/n² apart — flips need two keys within 1e-16
    relative, never observed and vanishing in probability."""
    from pyspark.sql import Window

    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967296.0)
    keyed = docs.filter(F.col(weight_col) > 0).withColumn(
        "__key", F.log(u) / F.col(weight_col).cast("double")
    )
    w = Window.orderBy(F.col("__key").desc(), F.col(id_col).asc())
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__key", "__rn")
    )


def source_quota(
    docs: DataFrame,
    quota: int,
    source_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document cap — the domain-cap staple of crawl curation
    (no domain may contribute more than `quota` docs; keep the best by
    `order_col` descending, id ascending as the deterministic tiebreak).
    One shuffle keyed by source; rank ≤ quota compiles to WindowGroupLimit
    so each map task forwards at most `quota` rows per source before the
    reduce — at 100 TB the shuffle carries O(sources × quota), not the
    corpus."""
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )
