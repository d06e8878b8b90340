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
