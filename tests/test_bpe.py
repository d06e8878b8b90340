"""BPE training: the Spark merge sequence must equal an independent
pure-Python reference implementation symbol-for-symbol."""

from collections import Counter


def _ref_bpe(texts, n_merges, lowercase=True):
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w.lower() if lowercase else w] += 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, f in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        # argmax with (count desc, pair lexical asc) tie-break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_matches_reference_implementation(spark):
    from rabitq_spark.operators.bpe import bpe_train

    texts = [
        "the theater there then the the",
        "banana bandana ban banana",
        "low lower lowest low low slow",
        "aaa aaaa aa aaa",  # overlapping-merge greedy semantics
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(docs, n_merges=12)
    want = _ref_bpe(texts, 12)
    assert got == want


def test_bpe_early_stop_when_fully_merged(spark):
    from rabitq_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame([(0, "ab ab ab")], "doc_id long, text string")
    got = bpe_train(docs, n_merges=10)
    # one merge exhausts every pair: ('a','b') then nothing remains
    assert got == [("a", "b", 3)]


def _ref_tokenize(text, merges, lowercase=True):
    out = []
    for w in text.split(" "):
        if not w:
            continue
        s = list(w.lower() if lowercase else w)
        for a, b, *_ in merges:
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            s = ns
        out.extend(s)
    return out


def test_bpe_tokenize_matches_reference(spark):
    from rabitq_spark.operators.bpe import bpe_tokenize, bpe_train

    texts = [
        "the theater there then the the",
        "banana bandana ban banana",
        "low lower lowest low slow",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=8)
    rows = {r.doc_id: r for r in bpe_tokenize(docs, merges).collect()}
    for i, t in enumerate(texts):
        want = _ref_tokenize(t, merges)
        assert list(rows[i].bpe_tokens) == want
        assert rows[i].n_bpe == len(want)


def test_bpe_token_counts_equal_full_tokenize(spark):
    from rabitq_spark.operators.bpe import (
        bpe_token_counts,
        bpe_tokenize,
        bpe_train,
    )

    texts = [
        "the theater there then the the",
        "banana bandana ban banana",
        "low lower lowest low slow",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=6)
    full = {r.doc_id: r.n_bpe for r in bpe_tokenize(docs, merges).collect()}
    fast = {r.doc_id: r.n_bpe for r in bpe_token_counts(docs, merges).collect()}
    assert full == fast


def test_segmented_tokenize_equals_plain(spark, sf_dir):
    import pandas as pd

    from rabitq_spark.operators.bpe import (
        bpe_tokenize,
        bpe_tokenize_segmented,
        bpe_train,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    merges = bpe_train(docs, n_merges=30)
    assert len(merges) == 30

    def norm(df: "pd.DataFrame"):
        df = df.sort_values("doc_id", ignore_index=True)
        df["bpe_tokens"] = df["bpe_tokens"].apply(list)
        return df

    plain = norm(bpe_tokenize(docs, merges).toPandas())
    # segment size far smaller than the list → several checkpoint barriers
    seg = norm(bpe_tokenize_segmented(docs, merges, segment_every=7).toPandas())
    assert plain.equals(seg)


def test_committed_fixture_matches_reference(spark):
    """The committed oracle fixtures (fixtures/bpe_*_sf0.01.parquet) must
    equal a FRESH pure-Python reference run over the sf0.01 corpus —
    catches corpus or semantics drift that would silently stale the
    DuckDB oracle."""
    import os

    import pyarrow.parquet as pq

    from scripts.make_bpe_fixture import (
        N_MERGES,
        ref_bpe_train,
        ref_token_counts,
    )

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):  # driver hosts always have it
        import pytest

        pytest.skip("sf0.01 testdata not present")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    texts = dict(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    merges = ref_bpe_train(list(texts.values()), N_MERGES)

    got_m = pq.read_table(
        os.path.join(repo, "fixtures", "bpe_merges_sf0.01.parquet")
    ).to_pydict()
    assert (
        list(zip(got_m["left"], got_m["right"], got_m["pair_count"])) == merges
    )
    assert got_m["step"] == list(range(len(merges)))

    counts = sorted(ref_token_counts(texts, merges))
    got_c = pq.read_table(
        os.path.join(repo, "fixtures", "bpe_tokenize_sf0.01.parquet")
    ).to_pydict()
    assert sorted(zip(got_c["doc_id"], got_c["n_ws"], got_c["n_bpe"])) == counts
