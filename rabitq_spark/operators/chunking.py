"""Document chunking and deterministic dataset splitting — training-data
pipeline staples (north-star extension).

Both are pure Column expressions: chunking explodes windowed token slices
(no Python, no shuffle until the consumer aggregates); splitting assigns
rows to train/val/test by md5-hash buckets, which is reproducible across
engines, runs, and partitionings — the property random() splits lack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rabitq_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into token windows of `chunk_tokens` with
    `overlap` tokens shared between consecutive chunks.

    Output: (doc_id, chunk_no, chunk_text, n_chunk_tokens). Chunks start at
    token offsets 0, stride, 2*stride... (stride = chunk_tokens - overlap);
    the last window may be shorter but is never empty.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    w = tokens(F.col(text_col))
    n = F.size(w)
    # number of chunks = 1 + ceil(max(n - chunk_tokens, 0) / stride)
    extra = F.greatest(n - chunk_tokens, F.lit(0))
    n_chunks = F.lit(1) + F.ceil(extra.cast("double") / stride).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.struct(
            c.alias("chunk_no"),
            F.slice(w, c * stride + 1, chunk_tokens).alias("toks"),
        ),
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(chunks).alias("ch")
    )
    return out.select(
        "doc_id",
        F.col("ch.chunk_no").alias("chunk_no"),
        F.array_join(F.col("ch.toks"), " ").alias("chunk_text"),
        F.size(F.col("ch.toks")).alias("n_chunk_tokens"),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment by md5 bucket of the id.

    bucket = first 8 md5 hex chars of (salt|id) mod 100; rows keep their
    split across runs, partitionings, and engines. Returns the input plus a
    `split` column.
    """
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def shuffle_shards(
    docs: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global training shuffle + shard export — the last
    mile of a pretraining pipeline: give every document a reproducible
    pseudo-random read position, split into `n_shards` uniform shards.

    shard_id  = md5(salt|id) first-15-hex mod n_shards (uniform, engine-
                and partitioning-independent, re-runs land identically);
    pos       = rank of the full md5 within the shard — reading each shard
                in pos order IS the global shuffle (md5 order is
                pseudo-random w.r.t. any corpus attribute);
    n_tok     = per-doc token count, so shard manifests can report token
                budgets without re-touching text.

    Output: (doc_id, shard_id, pos, n_tok).

    Scale: ONE shuffle keyed by shard_id; the within-shard window sorts
    |N|/n_shards rows per group — pick n_shards ≥ cluster cores and no
    single sort is corpus-sized. No global ordering or driver state
    anywhere (contrast orderBy(rand()), which is neither reproducible nor
    shard-stable)."""
    key = F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    n_tok = (
        F.col(count_col).cast("bigint")
        if count_col
        else F.size(tokens(F.col(text_col))).cast("bigint")
    )
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tok"),
        key.alias("__k"),
        (
            F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint")
            % n_shards
        ).alias("shard_id"),
    )
    w = Window.partitionBy("shard_id").orderBy("__k", "doc_id")
    return keyed.select(
        "doc_id",
        "shard_id",
        F.row_number().over(w).alias("pos"),
        "n_tok",
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat-v1",
) -> DataFrame:
    """Deterministic per-stratum sampling: row kept iff its md5 bucket (of
    salt|id, 0..9999) falls below rate(stratum)·10000. The training-data
    rebalancing staple (e.g. downsample dominant languages): reproducible
    across runs, partitionings, and engines — unlike df.sample, whose
    output depends on partitioning. One scan, no shuffle; the filter is
    pure codegen and pushes column pruning through.
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    cutoff = None
    for stratum, rate in rates.items():
        clause = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(rate * 10000)))
        )
        cutoff = clause if cutoff is None else cutoff.when(
            F.col(strata_col) == stratum, F.lit(int(round(rate * 10000)))
        )
    cutoff = (
        cutoff.otherwise(F.lit(int(round(default_rate * 10000))))
        if cutoff is not None
        else F.lit(int(round(default_rate * 10000)))
    )
    return df.filter(bucket < cutoff)


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
) -> DataFrame:
    """Greedy next-fit sequence packing: assign documents to token-budget
    bins for training-batch assembly. Documents are sharded by `id % n_shards`
    and packed INDEPENDENTLY per shard in ascending id order: a doc joins
    the current bin if its tokens fit, else opens the next bin (a doc longer
    than the budget occupies a bin alone, overflowing it).

    Output: (doc_id, shard, bin_id, n_tok).

    Scale design: global greedy packing is inherently sequential, so the
    unit of sequentiality is the SHARD — shards pack in parallel
    (applyInPandas, one shuffle keyed by shard) and the result is
    deterministic and partitioning-independent because the within-shard
    order is total (doc id). Only (id, count) columns enter the Python
    stage; text never leaves the JVM. At 100 TB pick n_shards ~ cores so
    each shard's (id, n_tok) slice fits an Arrow batch.
    """
    import pandas as pd

    # count_col: pack by a PRECOMPUTED token count (e.g. the post-span-
    # removal count from dup_span_profile) instead of tokenizing text_col
    n_tok = (
        F.col(count_col).cast("int")
        if count_col
        else F.size(tokens(F.col(text_col)))
    )
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_shards).alias("shard"),
        n_tok.alias("n_tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        bins, fill, cur = [], 0, 0
        for t in pdf["n_tok"]:
            t = int(t)
            if bins and fill + t > budget:
                cur += 1
                fill = t
            else:
                fill += t
            bins.append(cur)
        pdf["bin_id"] = pd.array(bins, dtype="int32")
        return pdf[["doc_id", "shard", "bin_id", "n_tok"]]

    return per_doc.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard long, bin_id int, n_tok int"
    )


def concat_chunk_pack(
    docs: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk packing: conceptually concatenate every
    document's token stream in ascending id order and slice the stream
    into fixed `seq_len` training sequences; a document whose tokens
    straddle a boundary contributes a span to EACH sequence it touches
    (the other packing discipline beside pack_sequences' greedy bins —
    zero padding waste, documents may split).

    Output, one row per (document, sequence) contribution:
      (doc_id, seq_id, span_start, span_end, doc_off) — global token
      positions [span_start, span_end) and the span's within-doc offset.

    Scale design: the global token offset is a prefix sum over unique
    doc ids — computed as a TWO-LEVEL range-partitioned scan (the zorder
    rank-scan shape): level 1 cum-sums within doc_id ranges in parallel;
    level 2 windows over n_parts partition totals (rows = cluster
    parallelism, never data). No single-task global window. The
    boundary explode is F.sequence(first_seq, last_seq) — pure codegen,
    ≤ ceil(L/seq_len)+1 rows per doc. Only (id, n_tok) enter the scan;
    text never moves.
    """
    n_tok_expr = (
        F.col(count_col).cast("bigint")
        if count_col
        else F.size(tokens(F.col(text_col))).cast("bigint")
    )
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"), n_tok_expr.alias("n_tok")
    ).filter(F.col("n_tok") > 0)

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    ranged = (
        per_doc.repartitionByRange(n_parts, "doc_id")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.select(
        "doc_id",
        "n_tok",
        "__pid",
        F.coalesce(F.sum("n_tok").over(w_local), F.lit(0)).alias("__local"),
    )
    totals = ranged.groupBy("__pid").agg(F.sum("n_tok").alias("__t"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off")
    )
    placed = local.join(F.broadcast(offsets), "__pid").select(
        "doc_id",
        "n_tok",
        (F.col("__local") + F.col("__off")).alias("__start"),
    )
    s = F.lit(int(seq_len)).cast("bigint")
    sl = int(seq_len)
    spans = placed.select(
        "doc_id",
        "n_tok",
        "__start",
        # integer `div`, not double `/`: token offsets at extreme scale can
        # pass 2^53, where double division would mis-floor
        F.explode(
            F.sequence(
                F.expr(f"__start div {sl}"),
                F.expr(f"(__start + n_tok - 1) div {sl}"),
            )
        ).alias("seq_id"),
    )
    span_start = F.greatest(F.col("__start"), F.col("seq_id") * s)
    span_end = F.least(F.col("__start") + F.col("n_tok"), (F.col("seq_id") + 1) * s)
    return spans.select(
        "doc_id",
        "seq_id",
        span_start.alias("span_start"),
        span_end.alias("span_end"),
        (span_start - F.col("__start")).alias("doc_off"),
    )


def group_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "gsplit-v1",
) -> DataFrame:
    """Leakage-safe train/val/test split: assign by the md5 bucket of the
    NEAR-DUP GROUP id (connected component of `pairs`), so near-duplicate
    documents can never straddle train and eval — the contamination mode a
    per-document hash_split cannot prevent (a train doc's 0.95-Jaccard twin
    landing in test inflates eval scores exactly like true leakage).

    Output: (doc_id, group_id, split). Same determinism contract as
    hash_split — a pure function of the data, reproducible across engines
    and partitionings. Scale shape: components via star contraction
    (O(log d) keyed rounds, operators/graph.py), then one codegen md5
    bucket per GROUP — no extra shuffle beyond the components themselves.
    """
    from rabitq_spark.operators.graph import neardup_groups

    groups = neardup_groups(docs, pairs, id_col).select("doc_id", "group_id")
    return hash_split(groups, "group_id", train_pct, val_pct, salt).select(
        "doc_id", "group_id", "split"
    )
