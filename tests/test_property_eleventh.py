"""Randomized (seeded) brute-force cross-checks for the
eleventh-session operators: every case batches into ONE Spark job and
compares against an independent pure-Python reference."""

from __future__ import annotations

import hashlib
import random
from collections import Counter


def _rand_docs(rng, n, vocab, lo=2, hi=14):
    return [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(lo, hi))))
            for i in range(n)]


def test_containment_superset_of_jaccard_and_brute_force(spark):
    from stirling_pdf_spark.operators.dedup import (
        containment_pairs, ngram_jaccard_pairs,
    )

    rng = random.Random(11)
    vocab = [f"w{k}" for k in range(6)]
    docs = _rand_docs(rng, 24, vocab)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t = 50
    cont = {(r["id_a"], r["id_b"]) for r in
            containment_pairs(df, threshold_pct=t).collect()}
    jac = {(r["id_a"], r["id_b"]) for r in
           ngram_jaccard_pairs(df, threshold_pct=t).collect()}
    # containment >= jaccard for every pair, so the qualifying set
    # can only grow
    assert jac <= cont

    def shingles(text):
        w = text.split()
        return {f"{a} {b}" for a, b in zip(w, w[1:])}

    want = set()
    for i, (ia, ta) in enumerate(docs):
        for ib, tb in docs[i + 1:]:
            sa, sb = shingles(ta), shingles(tb)
            if not sa or not sb:
                continue
            common = len(sa & sb)
            if 100 * common >= t * min(len(sa), len(sb)):
                want.add((ia, ib))
    assert cont == want


def test_trigram_backoff_matches_pure_python_reference(spark):
    from stirling_pdf_spark.operators.textstats import lm_trigram_backoff

    rng = random.Random(23)
    vocab = [f"t{k}" for k in range(5)]
    docs = _rand_docs(rng, 20, vocab, lo=1, hi=10)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: (r["n_trigrams"], r["n_seen"], r["n_backoff"],
                     r["fit_x1000"])
           for r in lm_trigram_backoff(df).collect()}

    c12, c1, c123 = Counter(), Counter(), Counter()
    for i, text in docs:
        if i % 2:
            continue
        w = text.split()
        for a, b in zip(w, w[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
        for a, b, c in zip(w, w[1:], w[2:]):
            c123[(a, b, c)] += 1
    want = {}
    for i, text in docs:
        if i % 2 == 0:
            continue
        w = text.split()
        tri = list(zip(w, w[1:], w[2:]))
        n_seen = n_bo = total = 0
        for a, b, c in tri:
            if (a, b, c) in c123:
                n_seen += 1
                total += (1000 * c123[(a, b, c)]) // c12[(a, b)]
            elif (b, c) in c12 and b in c1:
                n_bo += 1
                total += (4 * ((1000 * c12[(b, c)]) // c1[b])) // 10
        want[i] = (len(tri), n_seen, n_bo,
                   total // len(tri) if tri else 0)
    assert got == want
    assert any(v[2] > 0 for v in want.values())  # backoff must fire


def test_audio_downsample_matches_numpy_reference(spark):
    import numpy as np

    from stirling_pdf_spark.kernel import wav
    from stirling_pdf_spark.operators.multimodal import audio_downsample

    rng = random.Random(5)
    rows, want = [], {}
    for i in range(8):
        ch = rng.choice([1, 2])
        nf = rng.randint(3, 40)
        samples = [rng.randint(-3000, 3000) for _ in range(nf * ch)]
        ref = f"m{i}"
        rows.append((ref, "wav", wav.encode_pcm16(ch, 8000, samples)))
        fr = np.array(samples, np.int64).reshape(-1, ch)
        nb = (fr.shape[0] // 4) * 4
        ds = np.floor_divide(fr[:nb].reshape(-1, 4, ch).sum(axis=1), 4)
        a = np.abs(ds)
        want[ref] = (ds.shape[0], int(a.max()) if a.size else 0,
                     int(a.sum()), int((a * a).sum()))
    df = spark.createDataFrame(
        rows, "media_ref string, fmt string, payload binary")
    got = {r["media_ref"]: (r["n_out_frames"], r["peak_out"],
                            r["sumabs_out"], r["energy_out"])
           for r in audio_downsample(df, factor=4).collect()}
    assert got == want


def test_cms_point_estimates_match_python_sketch(spark):
    from stirling_pdf_spark.operators.sketch import cms_heavy_estimates

    rng = random.Random(77)
    vocab = [f"v{k}" for k in range(40)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(30)))
            for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["term"]: r for r in cms_heavy_estimates(df, k=6).collect()}

    toks = [t for _, text in docs for t in text.split()]
    truth = Counter(toks)
    cells = Counter()
    for t in toks:
        for r in range(4):
            h = int(hashlib.md5(f"cms{r}:{t}".encode())
                    .hexdigest()[:8], 16) % 256
            cells[(r, h)] += 1
    top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:6]
    assert set(got) == {t for t, _ in top}
    for term, cnt in top:
        est = min(cells[(r, int(hashlib.md5(f"cms{r}:{term}".encode())
                                .hexdigest()[:8], 16) % 256)]
                  for r in range(4))
        assert got[term]["true_cnt"] == cnt
        assert got[term]["est_cnt"] == est
        assert est >= cnt
