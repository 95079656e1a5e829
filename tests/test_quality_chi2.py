"""Chi-square feature selection (operators/quality.py
feature_label_chi2): exact-fraction python model parity and the
zero-margin NULL rule."""

from __future__ import annotations

import hashlib

from real_estate_project1_etl_spark.operators.quality import (
    feature_label_chi2,
)


def _fid(tok: str, dim: int = 512) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dim


def _py_chi2(docs, dim=512):
    # docs: list of (doc_id, text, label)
    import re

    pres = {}
    ys = {}
    for did, text, y in docs:
        ys[did] = y
        toks = re.sub(r"\s+", " ", text).strip().lower().split(" ")
        for t in toks:
            pres.setdefault(_fid(t, dim), set()).add(did)
    n = len(ys)
    p = sum(ys.values())
    out = {}
    for f, dset in pres.items():
        a = sum(1 for d in dset if ys[d] == 1)
        b = len(dset) - a
        c, d = p - a, (n - p) - b
        den = (a + b) * (c + d) * (a + c) * (b + d)
        if den == 0:
            out[f] = (a + b, None)
        else:
            num = 1_000_000 * n * (a * d - b * c) ** 2
            out[f] = (a + b, num // den)  # all terms non-negative
    return out


def test_chi2_matches_python_model(spark):
    rows = []
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i in range(60):
        y = i % 2
        # make 'alpha' label-correlated, 'zeta' everywhere (zero margin)
        toks = ["zeta", words[(i * 7) % 6]]
        if y:
            toks.append("alpha")
        rows.append((i, " ".join(toks), y))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, label int")
    got = {
        r["feature_id"]: (r["df_docs"], r["chi2_ppm"])
        for r in feature_label_chi2(df, dim=512).collect()
    }
    assert got == _py_chi2(rows)
    # the everywhere-feature has a zero margin -> NULL
    assert got[_fid("zeta")][1] is None
    # the label-correlated feature dominates
    best = max(
        (v for _, v in got.values() if v is not None)
    )
    assert got[_fid("alpha")][1] == best and best > 0
