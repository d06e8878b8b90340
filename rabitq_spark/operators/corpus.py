"""Corpus-level quality / retrieval operators for the training-data
pipeline (north-star extension, SURVEY.md §7 phase 6): Gopher-style
repetition filters, train/test contamination measurement, BM25 ranked
retrieval, and per-group TF-IDF terms.

All deterministic and DuckDB-mirrorable:

* hashes are md5-derived (identical hex in any engine),
* floats are built exclusively from +,-,*,/ over values both engines hold
  bit-identically (integer counts cast to double, shared literals) — IEEE
  754 requires correctly-rounded results for those, so matching the
  expression tree left-to-right makes every emitted double bit-exact.
  That is why BM25 here uses the RATIONAL idf `(N - df + 0.5)/(df + 0.5)
  + 1` — the Lucene/Robertson idf without the final log. log/ln is the one
  step whose last ulp is libm-dependent; dropping it keeps the score a
  deterministic, monotone-per-term variant (documented deviation, same
  candidate ordering per term).

Scale notes (100 TB):

* repetition/contamination shuffle once, keyed by doc or by n-gram — no
  all-pairs step anywhere.
* BM25's document-frequency and corpus-stats sides are tiny aggregates
  (|terms| rows, 1 row) and broadcast; the per-posting work is one
  map-side filter + one groupBy(doc) shuffle bounded by |matching
  postings|.
* the exploded-token shape (explode -> HashAggregate) is deliberate: it
  vectorizes map-side and avoids per-row lambda re-evaluation (PLAN.md
  Catalyst pitfall #4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rabitq_spark.functions.text import shingles_from_tokens, tokens


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_token_frac: float = 0.12,
    max_dup_2gram_frac: float = 0.12,
    max_dup_3gram_frac: float = 0.05,
) -> DataFrame:
    """Gopher-style repetition metrics per document (Rae et al. 2021 §A1.1
    analogues for a line-less corpus): most-frequent-token mass and
    duplicate word-n-gram fraction, plus the keep/drop verdict.

    Output: (doc_id, n_tok, top_token, top_token_frac, dup_2gram_frac,
    dup_3gram_frac, keep).

    Plan shape: one projection computes the token array and the n-gram
    distinct counts (pure codegen); the top-token branch explodes tokens
    into a HashAggregate (map-side partial) and takes the per-doc argmax
    with a window (WindowGroupLimit) — one shuffle keyed by doc_id, then a
    single join back. Ties on the top token break to the lexicographically
    smallest token so the result is partitioning-independent.
    """
    # materialize the token array ONCE behind a barrier: inlined, every
    # element_at inside the shingle lambdas re-evaluates the split+filter
    # (no CSE across lambda boundaries — PLAN.md Catalyst pitfall #2;
    # measured 11.7 -> 1.6 s at sf0.1), and both branches below share it
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__w")
    ).localCheckpoint(eager=False)
    w = F.col("__w")
    per_doc = toks.select(
        "doc_id",
        F.size(w).alias("n_tok"),
        # total n-gram counts are sizes, not arrays: no allocation
        F.greatest(F.size(w) - 1, F.lit(0)).alias("tot2"),
        F.size(shingles_from_tokens(w, 2)).alias("d2"),
        F.greatest(F.size(w) - 2, F.lit(0)).alias("tot3"),
        F.size(shingles_from_tokens(w, 3)).alias("d3"),
    )

    ex = toks.select("doc_id", F.explode(w).alias("token"))
    counts = ex.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    top = (
        counts.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("cnt").desc(), F.col("token").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("token").alias("top_token"), "cnt")
    )

    j = per_doc.join(top, "doc_id", "left")
    top_frac = F.when(F.col("n_tok") == 0, F.lit(0.0)).otherwise(
        F.col("cnt").cast("double") / F.col("n_tok").cast("double")
    )
    dup2 = F.when(F.col("tot2") == 0, F.lit(0.0)).otherwise(
        (F.col("tot2") - F.col("d2")).cast("double") / F.col("tot2").cast("double")
    )
    dup3 = F.when(F.col("tot3") == 0, F.lit(0.0)).otherwise(
        (F.col("tot3") - F.col("d3")).cast("double") / F.col("tot3").cast("double")
    )
    out = j.select(
        "doc_id",
        "n_tok",
        F.coalesce(F.col("top_token"), F.lit("")).alias("top_token"),
        top_frac.alias("top_token_frac"),
        dup2.alias("dup_2gram_frac"),
        dup3.alias("dup_3gram_frac"),
    )
    keep = (
        (F.col("top_token_frac") <= max_top_token_frac)
        & (F.col("dup_2gram_frac") <= max_dup_2gram_frac)
        & (F.col("dup_3gram_frac") <= max_dup_3gram_frac)
    ).cast("int")
    return out.withColumn("keep", keep)


def contamination_check(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    test_pct: int = 10,
    salt: str = "contam-v1",
) -> DataFrame:
    """Train/test contamination: for every TEST document (md5-bucket split,
    reproducible across engines/partitionings), the fraction of its
    distinct word-`ngram`-grams that appear anywhere in the TRAIN split —
    the standard n-gram-overlap decontamination measure (GPT-3 appendix C
    style, word 8-grams by default).

    Output: (doc_id, n_grams, n_contaminated, contamination_frac) for each
    test doc, including gram-less short docs at frac 0.0.

    Plan shape: the train side is an exploded DISTINCT gram set (one
    shuffle keyed by gram); the test side explodes and LEFT-joins it on the
    gram string — also gram-keyed, no all-pairs. At 100 TB swap the gram
    string for its 60-bit hash to shrink the shuffle (same plan; string
    form kept here because the oracle joins on the same key).
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}|"), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    # token array materialized behind a barrier before the shingle lambda
    # (inlined tokens() re-evaluates the split per element_at — pitfall #2;
    # measured 35 -> 2.2 s at sf0.1 with ngram=8)
    g = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            bucket.alias("bucket"),
            tokens(F.col(text_col)).alias("__w"),
        )
        .localCheckpoint(eager=False)
        .select(
            "doc_id",
            "bucket",
            shingles_from_tokens(F.col("__w"), ngram).alias("grams"),
        )
    )
    train_g = (
        g.filter(F.col("bucket") < 100 - test_pct)
        .select(F.explode("grams").alias("gr"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    test_g = g.filter(F.col("bucket") >= 100 - test_pct).select(
        "doc_id", F.explode_outer("grams").alias("gr")
    )
    joined = test_g.join(train_g, "gr", "left")
    agg = joined.groupBy("doc_id").agg(
        F.count("gr").alias("n_grams"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_contaminated"),
    )
    frac = F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
        F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double")
    )
    return agg.select(
        "doc_id", "n_grams", "n_contaminated", frac.alias("contamination_frac")
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under rational-idf BM25
    (Robertson/Lucene BM25 with the final log dropped — see module
    docstring for why: log is the only libm-dependent step; without it
    every arithmetic op is IEEE-correctly-rounded and the score is
    bit-reproducible in any engine).

        idf(t)  = (N - df_t + 0.5) / (df_t + 0.5) + 1
        s(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b*dl/avgdl))
        score   = sum over `terms` IN GIVEN ORDER of s(d, t)

    The fixed summation order (one conditional sum per term, added in the
    `terms` list order) keeps the float fold deterministic regardless of
    partitioning.

    Plan shape: corpus stats (N, sum dl) are a 1-row aggregate; document
    frequency is |terms| rows — both broadcast. The posting side is a
    map-side `isin` filter over exploded tokens, one groupBy(doc, term)
    shuffle bounded by matching postings, then broadcast joins + a global
    top-k (TakeOrderedAndProject).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"), F.size(tokens(F.col(text_col))).alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col(text_col)))).alias("sum_dl"),
    )
    tf = (
        toks.filter(F.col("token").isin(*terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = (
        F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5)) + F.lit(1.0)
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + (F.lit(b) * F.col("dl").cast("double")) / avgdl
    )
    s = idf * ((tf_d * F.lit(k1 + 1.0)) / denom)
    scored = scored.select("doc_id", "token", s.alias("s"))

    agg_cols = [
        F.coalesce(
            F.sum(F.when(F.col("token") == t, F.col("s"))), F.lit(0.0)
        ).alias(f"s{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = scored.groupBy("doc_id").agg(*agg_cols)
    total = None
    for i in range(len(terms)):
        c = F.col(f"s{i}")
        total = c if total is None else total + c
    # global top-k via sort+limit (TakeOrderedAndProject — per-partition
    # partial top-k, no single-partition window shuffle); the rank window
    # then runs over only k rows.
    topk = (
        per_doc.select("doc_id", total.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    return topk.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        ),
    ).select("doc_id", "score", "rank")


def hybrid_rrf(
    text_ranked: DataFrame,
    vector_ranked: DataFrame,
    k_rrf: int = 60,
    topn: int = 10,
) -> DataFrame:
    """Hybrid-retrieval fusion: Reciprocal Rank Fusion (Cormack et al.
    2009) of a lexical ranking and a vector ranking —

        rrf(d) = 1/(k + rank_text(d)) + 1/(k + rank_vec(d))

    with a missing system contributing 0. Inputs are (doc_id, rank)
    top-k lists. Output: (doc_id, rrf_score, rank), topn rows, ties broken
    by doc_id.

    The two contributions are explicit columns added in fixed order (not a
    SUM over a union), so the double result is partitioning-independent —
    the same determinism discipline as bm25_scores' per-term fold. The
    global rank window runs over at most |text list| + |vector list| rows
    (both already top-k-bounded upstream), so the single-partition window
    is over k-dozens of rows, never the corpus.
    """
    t = text_ranked.select("doc_id", F.col("rank").alias("r_text"))
    v = vector_ranked.select("doc_id", F.col("rank").alias("r_vec"))
    fused = t.join(v, "doc_id", "full_outer")
    kk = F.lit(float(k_rrf))
    c_text = F.when(
        F.col("r_text").isNotNull(),
        F.lit(1.0) / (kk + F.col("r_text").cast("double")),
    ).otherwise(F.lit(0.0))
    c_vec = F.when(
        F.col("r_vec").isNotNull(),
        F.lit(1.0) / (kk + F.col("r_vec").cast("double")),
    ).otherwise(F.lit(0.0))
    scored = fused.select("doc_id", (c_text + c_vec).alias("rrf_score"))
    return (
        scored.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
            ),
        )
        .filter(F.col("rank") <= topn)
        .select("doc_id", "rrf_score", "rank")
    )


def tfidf_top_terms(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per group by rational TF-IDF:
    `tf_group * (N_docs + 1)/(df_docs + 1)` (df = documents containing the
    term, corpus-wide). Log-free for the same bit-exactness reason as
    BM25; the +1s are the standard smoothing.

    Output: (group, token, tf, score, rank); ties break to the
    lexicographically smaller token.

    Plan: two HashAggregates over the exploded tokens (one keyed by
    (group, token), one by token after a doc-distinct), broadcast df join,
    per-group window top-k (WindowGroupLimit).
    """
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    tf = toks.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        toks.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(F.broadcast(dfreq), "token").crossJoin(F.broadcast(n_docs))
    score = F.col("tf").cast("double") * (
        (F.col("n_docs").cast("double") + F.lit(1.0))
        / (F.col("df").cast("double") + F.lit(1.0))
    )
    ranked = scored.select(
        F.col("grp").alias(group_col), "token", "tf", score.alias("score")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                F.col("score").desc(), F.col("token").asc()
            )
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        group_col, "token", "tf", "score", "rank"
    )


def bigram_coherence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-trained bigram-LM predictability score per document — a
    perplexity-style fluency signal with no external model: how well the
    CORPUS's own bigram statistics predict each document's token
    transitions. Low scores flag shuffled/garbled text whose unigrams look
    fine (the failure mode length/ratio heuristics miss).

    Per document: pair_support = Σ_i c(w_{i-1}, w_i) and prev_support =
    Σ_i c(w_{i-1}), summed over token positions, where c(·) are corpus
    occurrence counts. coherence = pair_support / prev_support — a single
    IEEE division of two bigints, so the score is bit-exact across engines
    (deliberately NOT a mean of per-position float ratios, whose sum order
    would be partial-aggregation-dependent; see module docstring). Each
    per-position ratio is ≤ 1, so coherence ∈ (0, 1]; docs with < 2 tokens
    emit zeros.

    Scale: count tables are vocabulary-sized — usually small enough that
    AQE broadcasts them, but bigram types can reach billions at 100 TB, so
    the joins are left UNHINTED (keyed shuffle joins when AQE measures the
    count side as large); the per-position table shuffles keyed by token
    then by doc id — no all-pairs step.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("w")
    ).localCheckpoint(eager=False)
    pairs = toks.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("w") >= 2,
                F.zip_with(
                    F.slice("w", 1, F.size("w") - 1),
                    F.slice("w", 2, F.size("w") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(
                F.array().cast("array<struct<w1:string,w2:string>>")
            )
        ).alias("pos", "bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    uni = (
        toks.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
    )
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_pair"))
    scored = (
        pairs.join(bi, ["w1", "w2"])
        .join(uni.withColumnRenamed("tok", "w1"), "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("c_pair").alias("pair_support"),
            F.sum("c_tok").alias("prev_support"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce("pair_support", F.lit(0)).cast("bigint").alias("pair_support"),
        F.coalesce("prev_support", F.lit(0)).cast("bigint").alias("prev_support"),
        F.when(
            F.coalesce("prev_support", F.lit(0)) > 0,
            F.col("pair_support").cast("double")
            / F.col("prev_support").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("coherence"),
    )


def oov_rate(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Vocabulary-coverage audit: build the top-`vocab_size` token
    vocabulary by global frequency (count desc, token asc — deterministic),
    then per group report total tokens, out-of-vocabulary tokens, and the
    OOV rate (one division — bit-exact). The tokenizer-fairness check a
    multilingual pretraining pipeline runs before fixing a vocabulary:
    minority languages' OOV rates reveal vocabulary skew.

    Plan: one explode feeds BOTH the vocabulary top-k (WindowGroupLimit)
    and the per-group count; the vocabulary (vocab_size rows) broadcasts
    back for a null-producing left join — the token stream shuffles once,
    keyed by token, and once keyed by group."""
    from rabitq_spark.functions.text import tokens
    from rabitq_spark.operators.topk import topk_per_group

    toks = docs.select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = topk_per_group(
        counts.withColumn("__g", F.lit(1)),
        ["__g"],
        [F.col("cnt").desc(), F.col("token").asc()],
        vocab_size,
    ).select("token", F.lit(1).alias("__in_vocab"))
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("__in_vocab").isNull()).cast("bigint")).alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")
        )
    )
