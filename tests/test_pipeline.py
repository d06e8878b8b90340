def test_training_pipeline_stages_filter(spark, sf_dir):
    from pyspark.sql import functions as F
    from rabitq_spark.operators.pipeline import training_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srcn = F.substring("source", 4, 10).cast("int")
    train, ev = docs.filter(srcn < 18), docs.filter(srcn >= 18)
    out = training_pipeline(train, ev)
    rows = out.collect()
    n_train = train.count()
    assert 0 < len(rows) < n_train  # something survived, something dropped
    assert all(r.n_tok >= 8 for r in rows)  # length floor applied
    # bins respect the budget unless a single doc overflows alone
    from collections import defaultdict
    bins = defaultdict(list)
    for r in rows:
        bins[(r.shard, r.bin_id)].append(r.n_tok)
    for toks in bins.values():
        assert sum(toks) <= 512 or len(toks) == 1
