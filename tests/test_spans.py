"""Exact repeated-substring span detection (operators/spans.py)."""


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_shared_run_yields_merged_span(spark):
    from rabitq_spark.operators.spans import duplicate_spans

    # tokens 0..9 of doc0 == tokens 5..14 of doc1: one shared 10-token run.
    shared = " ".join(f"s{i}" for i in range(10))
    docs = _docs(
        spark,
        [
            shared + " " + " ".join(f"a{i}" for i in range(6)),
            " ".join(f"b{i}" for i in range(5)) + " " + shared,
        ],
    )
    rows = {
        r.doc_id: (r.span_start, r.span_end, r.n_grams)
        for r in duplicate_spans(docs, k=8, min_docs=2).collect()
    }
    # a 10-token shared run has 3 duplicate 8-grams (starts 0,1,2) merging
    # into one [start, start+10) span per doc
    assert rows[0] == (0, 10, 3)
    assert rows[1] == (5, 15, 3)


def test_disjoint_runs_stay_separate_spans(spark):
    from rabitq_spark.operators.spans import duplicate_spans

    run1 = " ".join(f"x{i}" for i in range(8))
    run2 = " ".join(f"y{i}" for i in range(8))
    gap = " ".join(f"g{i}" for i in range(9))  # > k so islands split
    docs = _docs(spark, [f"{run1} {gap} {run2}", f"{run2} {gap.upper()} {run1}"])
    spans = duplicate_spans(docs, k=8, min_docs=2)
    per_doc = (
        spans.groupBy("doc_id").count().orderBy("doc_id").collect()
    )
    assert [r["count"] for r in per_doc] == [2, 2]
    d0 = sorted(
        (r.span_start, r.span_end)
        for r in spans.filter("doc_id = 0").collect()
    )
    assert d0 == [(0, 8), (17, 25)]


def test_profile_zeros_for_unique_docs(spark):
    from rabitq_spark.operators.spans import dup_span_profile

    shared = " ".join(f"s{i}" for i in range(8))
    docs = _docs(
        spark,
        [shared, shared, " ".join(f"u{i}" for i in range(12))],
    )
    rows = {r.doc_id: r for r in dup_span_profile(docs, k=8, min_docs=2).collect()}
    assert rows[0].dup_tokens == 8 and rows[0].dup_fraction == 1.0
    assert rows[1].dup_tokens == 8
    assert rows[2].dup_tokens == 0 and rows[2].dup_fraction == 0.0


def test_remove_spans_cuts_shared_run_and_roundtrips_unique(spark):
    from rabitq_spark.operators.spans import remove_duplicate_spans

    shared = " ".join(f"s{i}" for i in range(10))
    uniq = " ".join(f"u{i}" for i in range(12))
    tail = " ".join(f"a{i}" for i in range(6))
    docs = _docs(spark, [f"{shared} {tail}", shared, uniq])
    rows = {
        r.doc_id: r for r in remove_duplicate_spans(docs, k=8, min_docs=2).collect()
    }
    # doc0: the 10 shared tokens cut, the unique tail kept verbatim
    assert rows[0].clean_text == tail
    assert (rows[0].n_tokens_kept, rows[0].n_tokens_removed) == (6, 10)
    # doc1 is entirely duplicated -> empty
    assert rows[1].clean_text == "" and rows[1].n_tokens_kept == 0
    # doc2 has no duplicate span -> byte-identical round trip
    assert rows[2].clean_text == uniq and rows[2].n_tokens_removed == 0


def test_spans_match_duckdb_oracle(spark, sf_dir):
    """Bit-exact parity with the registered DuckDB oracle at test SF."""
    import duckdb

    from rabitq_spark.queries import _sql_duplicate_spans, q_duplicate_spans

    got = sorted(
        tuple(r) for r in q_duplicate_spans(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(_sql_duplicate_spans()).fetchall())
    assert got == want
