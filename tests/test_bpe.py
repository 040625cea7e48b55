"""BPE training-loop parity: the Spark driver loop
(textstats.bpe_train_merges) against a canonical token-list BPE
reference (Sennrich et al. 2016, arXiv:1508.07909 Algorithm 1), on
the real corpus vocabulary and on adversarial overlap shapes the
double-replace rewrite must get right."""
from __future__ import annotations

import collections

import pytest

from stirling_pdf_spark.operators.textstats import (
    bpe_encode_tokens, bpe_train_merges, bpe_train_table,
)


def _canonical_bpe(freq: dict[str, int], n_merges: int):
    """Reference implementation: token LISTS, leftmost scan, argmax
    by (count desc, 'lhs rhs' asc)."""
    vocab = {w: list(w) + ["</w>"] for w in freq}
    merges = []
    for _ in range(n_merges):
        pc: collections.Counter = collections.Counter()
        for w, f in freq.items():
            t = vocab[w]
            for i in range(len(t) - 1):
                pc[(t[i], t[i + 1])] += f
        if not pc:
            break
        (a, b), tot = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        merges.append((a, b, tot))
        for w in freq:
            t, out, i = vocab[w], [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _corpus_freq(spark, sf_smoke):
    rows = spark.read.parquet(f"{sf_smoke}/documents.parquet") \
        .select("text").collect()
    freq: collections.Counter = collections.Counter()
    for r in rows:
        for w in r["text"].split():
            freq[w] += 1
    return dict(freq)


def test_train_merges_match_canonical(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    merges, vocab = bpe_train_merges(docs, n_merges=6)
    ref_merges, ref_vocab = _canonical_bpe(_corpus_freq(spark, sf_smoke), 6)
    assert merges == ref_merges
    got = {r["word"]: r["seq"].split(" ") for r in vocab.collect()}
    vocab.unpersist()
    assert got == ref_vocab


def test_train_table_shape(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    t = bpe_train_table(docs, n_merges=4).collect()
    assert [r["rank"] for r in t] == [1, 2, 3, 4]
    for r in t:
        assert r["merged"] == r["lhs"] + r["rhs"]
        assert r["total"] > 0


def test_encode_census_matches_canonical(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = bpe_encode_tokens(docs, n_merges=6, k=25).collect()
    freq = _corpus_freq(spark, sf_smoke)
    _, vocab = _canonical_bpe(freq, 6)
    cens: collections.Counter = collections.Counter()
    for w, f in freq.items():
        for s in vocab[w]:
            cens[s] += f
    ref = sorted(cens.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert [(r["symbol"], r["total"]) for r in out] == ref
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))


@pytest.mark.parametrize("word,n", [
    ("abab", 3),        # back-to-back 'a b' occurrences share a space
    ("bbbbb", 2),       # same-symbol run: leftmost pairing, odd tail
    ("aaabab", 3),      # run followed by alternation
    ("xyxyxyxy", 4),    # long alternation needs the second pass
])
def test_overlap_words_match_canonical(spark, word, n):
    docs = spark.createDataFrame(
        [(1, f"{word} {word} filler")], "doc_id long, text string")
    merges, vocab = bpe_train_merges(docs, n_merges=n)
    freq = {word: 2, "filler": 1}
    ref_merges, ref_vocab = _canonical_bpe(freq, n)
    got = {r["word"]: r["seq"].split(" ") for r in vocab.collect()}
    vocab.unpersist()
    assert merges == ref_merges
    assert got == ref_vocab


def test_quality_classifier_matches_python_and_is_map_only(spark, sf_smoke):
    import hashlib

    from stirling_pdf_spark.operators.textstats import (
        QC_BUCKETS, QC_WEIGHTS, quality_classifier_score,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = quality_classifier_score(docs)
    # map-only claim: a classifier pass must not cost a shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["id"]: (r["n_tokens"], r["score"], r["label"])
           for r in out.collect()}
    for r in docs.select("doc_id", "text").collect():
        toks = r["text"].split()
        score = sum(
            QC_WEIGHTS[int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                       % QC_BUCKETS]
            for t in toks)
        assert got[r["doc_id"]] == (len(toks), score,
                                    1 if score > 0 else 0)


def _py_train(docs: list[tuple[int, str]], buckets: int):
    import hashlib

    n = {}
    tp = tn = 0
    for y, text in docs:
        for t in text.split():
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % buckets
            pos, neg = n.get(b, (0, 0))
            n[b] = (pos + y, neg + (1 - y))
            tp += y
            tn += 1 - y
    tp, tn = max(tp, 1), max(tn, 1)
    return {b: (pos, neg, pos * 1_000_000 // tp - neg * 1_000_000 // tn)
            for b, (pos, neg) in n.items()}


def test_train_quality_classifier_matches_python(spark):
    from stirling_pdf_spark.operators.textstats import (
        QC_BUCKETS, train_quality_classifier,
    )

    docs = [(1, "good fine nice good"), (1, "fine day"),
            (0, "bad awful bad"), (0, "awful junk day")]
    df = spark.createDataFrame(docs, "label long, text string")
    got = {r["bucket"]: (r["n_pos"], r["n_neg"], r["weight"])
           for r in train_quality_classifier(df).collect()}
    assert got == _py_train(docs, QC_BUCKETS)


def test_train_then_score_separates_classes(spark):
    from stirling_pdf_spark.operators.textstats import (
        quality_classifier_score,
        train_quality_classifier,
        trained_weights_list,
    )

    pos = [(i, 1, "alpha beta gamma delta") for i in range(8)]
    neg = [(i + 8, 0, "omega sigma tau rho") for i in range(8)]
    df = spark.createDataFrame(pos + neg,
                               "doc_id int, label long, text string")
    ws = trained_weights_list(train_quality_classifier(df))
    scored = {r["id"]: r["label"]
              for r in quality_classifier_score(df, weights=ws).collect()}
    # a linearly separable vocabulary must be perfectly recovered
    for doc_id, y, _ in pos + neg:
        assert scored[doc_id] == y
