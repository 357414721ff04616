"""Parity tests for the hashed-n-gram quality classifier
(llm/quality_clf.py) against a pure-numpy reference implementing the
identical contract: [a-z]+ tokens, _-joined bigrams, md5-prefix
feature hashing, count/ng features, intercept-as-feature, full-batch
GD with 9-decimal per-epoch weight rounding."""
import hashlib
import math
import re

import numpy as np
import pytest

from xclim_spark.llm import quality_clf as qc

CORPUS = [
    (0, "The quick brown fox jumps over the lazy dog near the river", 1),
    (1, "Buy cheap pills now best price click here now now", 0),
    (2, "A thoughtful essay on the history of the printing press and "
        "its impact on the spread of ideas in early modern Europe", 1),
    (3, "win win win free free free money money casino casino", 0),
    (4, "She walked along the shore while the tide pulled the light "
        "sand from under her feet", 1),
    (5, "CLICK subscribe smash like CLICK subscribe smash like", 0),
    (6, "Measurements of the cosmic microwave background constrain "
        "the curvature of the universe", 1),
    (7, "zzz qqq xxx zzz qqq xxx", 0),
    (8, "In the beginning the committee reviewed the proposal and "
        "the budget for the coming year", 1),
    (9, "lol lol lol omg omg wow", 0),
]
DIM = 64
EPOCHS = 10
LR = 5.0


def _np_feats(text, dim=DIM):
    toks = re.findall(r"[a-z]+", text.lower())
    grams = toks + [a + "_" + b for a, b in zip(toks, toks[1:])]
    ng = len(grams)
    xs = {}
    for g in grams:
        idx = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % dim
        xs[idx] = xs.get(idx, 0.0) + 1.0 / ng
    xs[dim] = 1.0
    return xs


def _np_train(rows, dim=DIM, epochs=EPOCHS, lr=LR):
    feats = [( _np_feats(t, dim), float(y)) for _, t, y in rows]
    n = len(feats)
    w = np.zeros(dim + 1)
    for _ in range(epochs):
        grad = np.zeros(dim + 1)
        for xs, y in feats:
            m = sum(x * w[j] for j, x in xs.items())
            r = 1.0 / (1.0 + math.exp(-m)) - y
            for j, x in xs.items():
                grad[j] += r * x
        w = np.array([round(wj - lr * gj / n, 9)
                      for wj, gj in zip(w, grad)])
    return w


def test_train_matches_numpy_reference(spark):
    docs = spark.createDataFrame(
        CORPUS, "doc_id LONG, text STRING, label INT")
    got = np.array(qc.quality_clf_train(
        docs, label_col="label", dim=DIM, epochs=EPOCHS, lr=LR))
    want = _np_train(CORPUS)
    np.testing.assert_allclose(got, want, atol=2e-9)
    assert got[DIM] != 0.0                      # intercept moved
    assert np.count_nonzero(got[:DIM]) > 10     # features learned


def test_score_matches_numpy_and_separates(spark):
    docs = spark.createDataFrame(
        CORPUS, "doc_id LONG, text STRING, label INT")
    w = qc.quality_clf_train(
        docs, label_col="label", dim=DIM, epochs=EPOCHS, lr=LR)
    scored = {r["doc_id"]: r["quality_score"]
              for r in qc.quality_clf_score(docs, w).collect()}
    wv = np.array(w)
    for did, text, _y in CORPUS:
        xs = _np_feats(text)
        m = sum(x * wv[j] for j, x in xs.items())
        want = 1.0 / (1.0 + math.exp(-m))
        assert scored[did] == pytest.approx(want, abs=1e-9)
    pos = np.mean([scored[d] for d, _, y in CORPUS if y == 1])
    neg = np.mean([scored[d] for d, _, y in CORPUS if y == 0])
    assert pos > neg + 0.1                     # it actually classifies


def test_score_zero_gram_doc_gets_intercept_only(spark):
    docs = spark.createDataFrame(
        CORPUS + [(99, "12345 678", 0)],
        "doc_id LONG, text STRING, label INT")
    w = qc.quality_clf_train(
        docs.where("doc_id < 99"), label_col="label", dim=DIM)
    got = {r["doc_id"]: r["quality_score"]
           for r in qc.quality_clf_score(docs, w).collect()}
    b = w[DIM]
    assert got[99] == pytest.approx(1.0 / (1.0 + math.exp(-b)), abs=1e-12)


UNICODE_CORPUS = [
    (0, "The QUICK Brown FOX — naïve café RÉSUMÉ über straße", 1),
    (1, None, 0),
    (2, "", 0),
    (3, "İstanbul KK kelvin-sign and DOTTED İ edge cases", 1),
    (4, "plain lowercase words repeat repeat repeat", 0),
    (5, "MiXeD CaSe BiGrAm BoUnDaRiEs 123 separated456by789digits", 1),
    (6, "  nbsp separated words and\ttabs\nnewlines", 0),
    (7, "a", 1),                       # single token: no bigrams
    (8, "zz " * 500, 0),               # clone-heavy: cache hits
]


def test_score_arrow_matches_column_twin(spark):
    """The vectorized Arrow scorer and the pure-Column fold are the
    same function: identical scores on mixed-case/Unicode/NULL
    fixtures (tokenizer divergence between Python re/str.lower and JVM
    regexp_extract_all/lower would show up here)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in UNICODE_CORPUS],
        "doc_id LONG, text STRING")
    w = _np_train(CORPUS).tolist()
    got_arrow = {r["doc_id"]: r["quality_score"]
                 for r in qc.quality_clf_score(
                     docs, w, arrow=True).collect()}
    got_col = {r["doc_id"]: r["quality_score"]
               for r in qc.quality_clf_score(
                   docs, w, arrow=False).collect()}
    assert set(got_arrow) == set(got_col) == {i for i, _, _ in
                                              UNICODE_CORPUS}
    for did in got_col:
        assert got_arrow[did] == pytest.approx(got_col[did], abs=1e-12)


def test_score_arrow_matches_numpy_reference(spark):
    docs = spark.createDataFrame(
        CORPUS, "doc_id LONG, text STRING, label INT")
    w = qc.quality_clf_train(
        docs, label_col="label", dim=DIM, epochs=EPOCHS, lr=LR)
    scored = {r["doc_id"]: r["quality_score"]
              for r in qc.quality_clf_score(docs, w, arrow=True)
              .collect()}
    wv = np.array(w)
    for did, text, _y in CORPUS:
        xs = _np_feats(text)
        m = sum(x * wv[j] for j, x in xs.items())
        want = 1.0 / (1.0 + math.exp(-m))
        assert scored[did] == pytest.approx(want, abs=1e-9)
