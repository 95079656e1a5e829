"""Differential fuzzers for the round-10 TRAINING operators.

Both trainers have exact python models (the published algorithms,
implemented independently in tests/test_properties.py and here); random
corpora, dimensions, learning rates and merge budgets sweep the
parameter space the hand-written cases can't. Any divergence is a bug
by construction — training is deterministic integer arithmetic on both
sides.
"""

from __future__ import annotations

import random

import pytest

from test_properties import _ref_bpe_train, _ref_bpe_train_batched

N_BPE = 10
N_BPE_BATCHED = 8
N_CLF = 6

_ALPHABETS = ["ab", "abc", "abcd", "abcdef", "xyzq"]


def _random_corpus(rng: random.Random):
    alpha = rng.choice(_ALPHABETS)
    n_docs = rng.randint(3, 10)
    docs = []
    for i in range(n_docs):
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        ]
        # salt with repeats so merges actually fire
        words += rng.choices(words, k=rng.randint(0, 6))
        docs.append((i, " ".join(words)))
    return docs


@pytest.mark.parametrize("seed", range(N_BPE))
def test_fuzz_bpe_train_matches_model(seed, spark):
    from real_estate_project1_etl_spark.operators.textstats import (
        bpe_train_merges,
    )

    rng = random.Random(40_000 + seed)
    docs = _random_corpus(rng)
    n_merges = rng.randint(1, 15)
    min_freq = rng.choice([1, 2, 3])
    score = rng.choice(["count", "count", "wordpiece"])
    want = _ref_bpe_train(
        [t for _, t in docs], n_merges, min_frequency=min_freq,
        pair_score=score,
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(
            df, n_merges, min_frequency=min_freq, checkpoint_every=3,
            pair_score=score,
        ).orderBy("rank").collect()
    ]
    assert got == want, (seed, n_merges, min_freq, score, got, want)


@pytest.mark.parametrize("seed", range(N_BPE_BATCHED))
def test_fuzz_bpe_train_batched_matches_model(seed, spark):
    from real_estate_project1_etl_spark.operators.textstats import (
        bpe_train_merges_batched,
    )

    rng = random.Random(50_000 + seed)
    docs = _random_corpus(rng)
    n_merges = rng.randint(2, 14)
    bs = rng.randint(1, 5)
    rule = rng.choice(["blocking", "greedy"])
    want = _ref_bpe_train_batched(
        [t for _, t in docs], n_merges, bs, accept_rule=rule
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r["rank"], r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges_batched(
            df, n_merges, batch_size=bs, checkpoint_every=2,
            accept_rule=rule,
        ).orderBy("rank").collect()
    ]
    assert got == want, (seed, n_merges, bs, rule, got, want)


def _ref_train_classifier(
    texts_labels, dim, n_iters, lr_num, lr_den,
    fit_bias=False, l2_num=0, l2_den=1, n_batches=1,
):
    import hashlib

    def h(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dim

    def bhash(did):
        return int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16) % n_batches

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    feats, ys = {}, {}
    for did, (t, y) in enumerate(texts_labels):
        ys[did] = y
        c: dict = {}
        for tok in t.lower().split():
            c[h(tok)] = c.get(h(tok), 0) + 1
        if fit_bias:
            c[dim] = 1  # always-on intercept feature
        feats[did] = c
    n_w = dim + (1 if fit_bias else 0)
    w = [0] * n_w
    for _ in range(n_iters):
        for b in range(n_batches):
            batch = [
                did for did in feats
                if n_batches == 1 or bhash(did) == b
            ]
            resid = {}
            for did in batch:
                m = sum(n * w[j] for j, n in feats[did].items())
                p = min(max(500 + tdiv(m, 4), 0), 1000)
                resid[did] = p - 1000 * ys[did]
            grad = [0] * n_w
            for did in batch:
                for j, n in feats[did].items():
                    grad[j] += resid[did] * n
            w = [
                wj - tdiv(g * lr_num, lr_den)
                - (tdiv(wj * l2_num, l2_den) if l2_num and j < dim else 0)
                for j, (wj, g) in enumerate(zip(w, grad))
            ]
    return w


@pytest.mark.parametrize("seed", range(N_CLF))
def test_fuzz_classifier_train_matches_model(seed, spark):
    from real_estate_project1_etl_spark.operators.quality import (
        train_hashed_classifier,
    )

    rng = random.Random(60_000 + seed)
    docs = _random_corpus(rng)
    labeled = [(t, rng.randint(0, 1)) for _, t in docs]
    dim = rng.choice([8, 16, 32])
    n_iters = rng.randint(1, 5)
    lr_den = rng.choice([8, 32, 128])
    fit_bias = rng.random() < 0.5
    l2_num, l2_den = rng.choice([(0, 1), (1, 16), (1, 64)])
    n_batches = rng.choice([1, 1, 2, 3])
    want = _ref_train_classifier(
        labeled, dim, n_iters, 1, lr_den,
        fit_bias=fit_bias, l2_num=l2_num, l2_den=l2_den,
        n_batches=n_batches,
    )
    df = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(labeled)],
        "doc_id long, text string, label int",
    )
    got = {
        r["feature_id"]: r["weight_milli"]
        for r in train_hashed_classifier(
            df, dim=dim, n_iters=n_iters, lr_num=1, lr_den=lr_den,
            fit_bias=fit_bias, l2_num=l2_num, l2_den=l2_den,
            n_batches=n_batches,
        ).collect()
    }
    assert got == {j: want[j] for j in range(len(want))}, (
        seed, dim, n_iters, lr_den, fit_bias, l2_num, l2_den, n_batches,
    )
