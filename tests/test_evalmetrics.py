"""Classifier-eval battery vs an independent pure-python model —
midrank AUC (ties), tie-grouped AP, Brier/ECE integer identities, and
the degenerate single-class / empty-confusion NULL contracts."""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from real_estate_project1_etl_spark.operators.evalmetrics import (
    binary_classifier_eval,
    calibration_bins,
)


def _py_eval(rows, thr=0):
    """(s, y, p) triples -> dict of exact-integer metrics, written as an
    INDEPENDENT model: sorts + pair counting in rationals, the module's
    floor-division convention applied only at the ppm boundary."""
    n = len(rows)
    n_pos = sum(y for _, y, _ in rows)
    n_neg = n - n_pos
    out = {"n": n, "n_pos": n_pos, "n_neg": n_neg}
    # AUC by literal pair counting (the definition, not the rank identity)
    if n_pos and n_neg:
        num = Fraction(0)
        for s1, y1, _ in rows:
            if y1 != 1:
                continue
            for s0, y0, _ in rows:
                if y0 != 0:
                    continue
                if s1 > s0:
                    num += 1
                elif s1 == s0:
                    num += Fraction(1, 2)
        v = Fraction(1_000_000) * num / (n_pos * n_neg)
        out["auc_ppm"] = v.numerator // v.denominator
    else:
        out["auc_ppm"] = None
    # AP: descending distinct-score sweep, nested floor divisions
    if n_pos:
        groups = {}
        for s, y, _ in rows:
            c, cp = groups.get(s, (0, 0))
            groups[s] = (c + 1, cp + y)
        cum_n = cum_tp = 0
        ap_num = 0
        for s in sorted(groups, reverse=True):
            c, cp = groups[s]
            cum_n += c
            cum_tp += cp
            ap_num += cp * ((1_000_000 * cum_tp) // cum_n)
        out["ap_ppm"] = ap_num // n_pos
    else:
        out["ap_ppm"] = None
    out["brier_ppm"] = sum((p - 1000 * y) ** 2 for _, y, p in rows) // n
    bins = {}
    for _, y, p in rows:
        b = min(p * 10 // 1000, 9)
        sp, pos = bins.get(b, (0, 0))
        bins[b] = (sp + p, pos + y)
    out["ece_ppm"] = (
        1000 * sum(abs(sp - 1000 * pos) for sp, pos in bins.values())
    ) // n
    tp = sum(1 for s, y, _ in rows if s >= thr and y == 1)
    fp = sum(1 for s, y, _ in rows if s >= thr and y == 0)
    fn = sum(1 for s, y, _ in rows if s < thr and y == 1)
    out["accuracy_ppm"] = (1_000_000 * (n - fp - fn)) // n
    out["precision_ppm"] = (
        (1_000_000 * tp) // (tp + fp) if tp + fp else None
    )
    out["recall_ppm"] = (1_000_000 * tp) // n_pos if n_pos else None
    out["f1_ppm"] = (
        (2_000_000 * tp) // (2 * tp + fp + fn) if 2 * tp + fp + fn else None
    )
    return out


def _run(spark, rows, thr=0):
    df = spark.createDataFrame(rows, "s bigint, y int, p bigint")
    got = binary_classifier_eval(
        df, score_col="s", label_col="y", p_milli_col="p", threshold_milli=thr
    ).collect()[0]
    return {k: got[k] for k in got.asDict()}


def test_eval_matches_python_model_with_ties(spark):
    # deterministic pseudo-random triples with heavy score ties
    rows = []
    for i in range(200):
        h = (i * 2654435761) % 997
        s = (h % 21) - 10          # 21 distinct scores -> many ties
        y = 1 if (h % 3) else 0
        p = min(max(500 + s * 37, 0), 1000)
        rows.append((s, y, p))
    assert _run(spark, rows) == _py_eval(rows)


def test_eval_perfect_and_reversed_ranking(spark):
    perfect = [(i, 1 if i >= 50 else 0, min(i * 10, 1000)) for i in range(100)]
    assert _run(spark, perfect)["auc_ppm"] == 1_000_000
    reverse = [(-i, 1 if i >= 50 else 0, 500) for i in range(100)]
    assert _run(spark, reverse)["auc_ppm"] == 0
    allties = [(7, i % 2, 500) for i in range(10)]
    assert _run(spark, allties)["auc_ppm"] == 500_000


def test_eval_single_class_nulls(spark):
    rows = [(i, 1, 800) for i in range(5)]
    got = _run(spark, rows)
    assert got["auc_ppm"] is None
    assert got["recall_ppm"] == 1_000_000
    assert got == _py_eval(rows)
    rows0 = [(-i - 1, 0, 100) for i in range(5)]
    got0 = _run(spark, rows0, thr=0)
    assert got0["auc_ppm"] is None and got0["ap_ppm"] is None
    assert got0["precision_ppm"] is None  # no predicted positives
    assert got0 == _py_eval(rows0)


def test_eval_threshold_moves_confusion(spark):
    rows = [(s, y, 500) for s, y in [(-5, 0), (-1, 1), (2, 0), (9, 1)]]
    lo = _run(spark, rows, thr=-10)
    hi = _run(spark, rows, thr=5)
    assert lo["recall_ppm"] == 1_000_000 and lo["precision_ppm"] == 500_000
    assert hi["recall_ppm"] == 500_000 and hi["precision_ppm"] == 1_000_000
    assert lo == _py_eval(rows, thr=-10) and hi == _py_eval(rows, thr=5)


def test_calibration_bins_identity_and_clip(spark):
    rows = []
    for i in range(300):
        h = (i * 1103515245 + 12345) % 2048
        p = h % 1001            # includes p == 1000 (clips into bin 9)
        y = 1 if h % 5 < 2 else 0
        rows.append((0, y, p))
    df = spark.createDataFrame(rows, "s bigint, y int, p bigint")
    got = {
        r["bin"]: (r["n"], r["conf_ppm"], r["acc_ppm"])
        for r in calibration_bins(
            df, p_milli_col="p", label_col="y", n_bins=10
        ).collect()
    }
    bins = {}
    for _, y, p in rows:
        b = min(p * 10 // 1000, 9)
        n, sp, pos = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, sp + p, pos + y)
    want = {
        b: (n, (1000 * sp) // n, (1_000_000 * pos) // n)
        for b, (n, sp, pos) in bins.items()
    }
    assert got == want
    # ECE identity: report's ece_ppm == bin-weighted |conf - acc| gap
    rep = binary_classifier_eval(
        df, score_col="s", label_col="y", p_milli_col="p"
    ).collect()[0]
    ece_num = sum(abs(sp - 1000 * pos) for _, sp, pos in bins.values())
    assert rep["ece_ppm"] == (1000 * ece_num) // len(rows)


def test_calibration_bins_rejects_bad_n_bins(spark):
    df = spark.createDataFrame([(0, 1, 500)], "s bigint, y int, p bigint")
    with pytest.raises(ValueError):
        calibration_bins(df, p_milli_col="p", label_col="y", n_bins=0)


def test_holdout_eval_auc_beats_chance(spark, sf_dir):
    # the registered train->holdout-eval loop separates the planted
    # doc_id%2 labels on unseen docs well above chance (the weak but
    # real signal: label correlates with doc content via the generator)
    import __spark_entry__ as entry

    got = entry.queries()["trained_classifier_holdout_eval"](
        spark, sf_dir
    ).collect()[0]
    assert got["n"] > 0 and got["n_pos"] > 0 and got["n_neg"] > 0
    assert got["auc_ppm"] is not None and got["auc_ppm"] > 500_000


def test_grouped_auc_matches_per_group_python_model(spark):
    from real_estate_project1_etl_spark.operators.evalmetrics import (
        grouped_auc_ppm,
    )

    rows = []
    for i in range(300):
        h = (i * 48271) % 1009
        grp = ["en", "de", "cs"][h % 3]
        s = (h % 13) - 6
        y = 1 if h % 4 else 0
        rows.append((grp, s, y))
    # single-class slice: every 'xx' row positive -> NULL AUC
    rows += [("xx", i, 1) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, s bigint, y int")
    got = {
        r["g"]: (r["n"], r["n_pos"], r["n_neg"], r["auc_ppm"])
        for r in grouped_auc_ppm(
            df, ["g"], score_col="s", label_col="y"
        ).collect()
    }
    for grp in ("en", "de", "cs", "xx"):
        sub = [(s, y, 500) for g, s, y in rows if g == grp]
        want = _py_eval(sub)
        assert got[grp] == (
            want["n"],
            want["n_pos"],
            want["n_neg"],
            want["auc_ppm"],
        ), grp


def test_roc_points_staircase_and_trapezoid_equals_auc(spark):
    from fractions import Fraction as Fr

    from real_estate_project1_etl_spark.operators.evalmetrics import (
        roc_points,
    )

    rows = []
    for i in range(240):
        h = (i * 69621) % 1013
        s = (h % 17) - 8
        y = 1 if h % 3 else 0
        rows.append((s, y, 500))
    df = spark.createDataFrame(rows, "s bigint, y int, p bigint")
    pts = sorted(
        (
            (r["threshold"], r["tp"], r["fp"], r["tpr_ppm"], r["fpr_ppm"])
            for r in roc_points(
                df, score_col="s", label_col="y"
            ).collect()
        ),
        key=lambda t: -t[0],
    )
    n_pos = sum(y for _, y, _ in rows)
    n_neg = len(rows) - n_pos
    # python staircase from scratch
    want = []
    tp = fp = 0
    for thr in sorted({s for s, _, _ in rows}, reverse=True):
        tp += sum(1 for s, y, _ in rows if s == thr and y == 1)
        fp += sum(1 for s, y, _ in rows if s == thr and y == 0)
        want.append(
            (thr, tp, fp, 1_000_000 * tp // n_pos, 1_000_000 * fp // n_neg)
        )
    assert pts == want
    # trapezoid area under the tie-grouped staircase == midrank AUC
    area = Fr(0)
    prev_tp = prev_fp = 0
    for _, tp, fp, _, _ in want:
        area += Fr(tp + prev_tp, 2) * (fp - prev_fp)
        prev_tp, prev_fp = tp, fp
    auc = _py_eval([(s, y, p) for s, y, p in rows])["auc_ppm"]
    v = Fr(1_000_000) * area / (n_pos * n_neg)
    assert v.numerator // v.denominator == auc


def test_ks_statistic_matches_python_model(spark):
    from fractions import Fraction as Fr

    from real_estate_project1_etl_spark.operators.evalmetrics import (
        ks_statistic,
    )

    def run(va, vb):
        a = spark.createDataFrame([(v,) for v in va], "v bigint")
        b = spark.createDataFrame([(v,) for v in vb], "v bigint")
        r = ks_statistic(a, b, "v").collect()[0]
        return (r["n_a"], r["n_b"], r["ks_ppm"], r["at_value"])

    def model(va, vb):
        na, nb = len(va), len(vb)
        vals = sorted(set(va) | set(vb))
        best, at = -1, None
        ca = cb = 0
        for v in vals:
            ca += sum(1 for x in va if x == v)
            cb += sum(1 for x in vb if x == v)
            d = abs(ca * nb - cb * na)
            if d > best:
                best, at = d, v
        p = Fr(1_000_000) * best / (na * nb)
        return (na, nb, p.numerator // p.denominator, at)

    # shifted, overlapping, tied-heavy pseudo-random samples
    va = [((i * 48271) % 53) - 10 for i in range(140)]
    vb = [((i * 16807) % 53) - 3 for i in range(90)]
    assert run(va, vb) == model(va, vb)

    # identical multisets -> KS 0
    assert run(va, va)[2] == 0
    # disjoint supports -> KS exactly 1e6 at the lower sample's max
    lo = [1, 2, 3]
    hi = [10, 11]
    assert run(lo, hi) == (3, 2, 1_000_000, 3)
    # empty side -> NULL
    r = ks_statistic(
        spark.createDataFrame([(1,)], "v bigint"),
        spark.createDataFrame([], "v bigint"),
        "v",
    ).collect()[0]
    assert r["ks_ppm"] is None and r["at_value"] is None


def test_registered_gate_ks_separates_label_classes(spark, sf_dir):
    import __spark_entry__ as entry

    r = entry.queries()["gate_score_ks"](spark, sf_dir).collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert r["ks_ppm"] is not None and 0 <= r["ks_ppm"] <= 1_000_000


def test_pr_points_staircase_and_ap_identity(spark):
    from real_estate_project1_etl_spark.operators.evalmetrics import (
        binary_classifier_eval,
        pr_points,
    )

    rows = []
    for i in range(220):
        h = (i * 40503) % 1021
        s = (h % 15) - 7
        y = 1 if h % 3 else 0
        rows.append((s, y, 500))
    df = spark.createDataFrame(rows, "s bigint, y int, p bigint")
    pts = sorted(
        (
            (
                r["threshold"],
                r["tp"],
                r["fp"],
                r["precision_ppm"],
                r["recall_ppm"],
            )
            for r in pr_points(df, score_col="s", label_col="y").collect()
        ),
        key=lambda t: -t[0],
    )
    n_pos = sum(y for _, y, _ in rows)
    tp = cum = 0
    want = []
    for thr in sorted({s for s, _, _ in rows}, reverse=True):
        grp = [(s, y) for s, y, _ in rows if s == thr]
        tp += sum(y for _, y in grp)
        cum += len(grp)
        want.append(
            (
                thr,
                tp,
                cum - tp,
                (1_000_000 * tp) // cum,
                (1_000_000 * tp) // n_pos,
            )
        )
    assert pts == want
    # AP identity: tp-delta-weighted precision over the staircase ==
    # the report's ap_ppm
    ap_num = 0
    prev_tp = 0
    for _, tp_k, _, prec, _ in want:
        ap_num += (tp_k - prev_tp) * prec
        prev_tp = tp_k
    rep = binary_classifier_eval(
        df, score_col="s", label_col="y", p_milli_col="p"
    ).collect()[0]
    assert rep["ap_ppm"] == ap_num // n_pos


def test_standing_eval_matches_holdout_and_serves_cached_weights(
    spark, sf_dir
):
    # round-13 standing-weights regime: (a) value-identical to the
    # honest build+eval chain (they share the oracle verbatim, this pins
    # it engine-side too), (b) the second call serves the SAME cached
    # weight artifact — no re-train
    import __spark_entry__ as entry
    from real_estate_project1_etl_spark.plans import session_cache

    def n_weight_entries():
        return sum(
            1
            for k in session_cache.cache_info()
            if k[1] == "trained_classifier_weights"
        )

    q = entry.queries()["trained_classifier_standing_eval"]
    got1 = q(spark, sf_dir).collect()
    n1 = n_weight_entries()
    assert n1 >= 1
    got2 = q(spark, sf_dir).collect()
    assert n_weight_entries() == n1  # HIT — no new build
    assert got1 == got2
    want = entry.queries()["trained_classifier_holdout_eval"](
        spark, sf_dir
    ).collect()
    assert got1 == want


def test_standing_eval_training_slice_drift_rebuilds(spark, sf_dir):
    # a CHANGED training slice (different fold predicate over the same
    # parquet-rooted generator shape the query uses) must be a
    # fingerprint MISS — fresh train, never a stale serve
    from pyspark.sql import functions as F

    from real_estate_project1_etl_spark.plans.session_cache import (
        get_or_build,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter(F.col("doc_id") % 3 != 0)
    b = docs.filter(F.col("doc_id") % 5 != 0)
    calls = []

    def mk(df):
        def build():
            calls.append(1)
            return df.select("doc_id").limit(1)

        return build

    get_or_build(a, "t13_weights_drift", mk(a))
    get_or_build(a, "t13_weights_drift", mk(a))  # identical slice: HIT
    assert len(calls) == 1
    get_or_build(b, "t13_weights_drift", mk(b))  # drifted slice: MISS
    assert len(calls) == 2


def test_isotonic_calibration_matches_classic_pav(spark):
    # the minimax closed form must equal CLASSIC pool-adjacent-violators
    # run with exact fractions, floored to ppm (floor commutes with the
    # pooling's min/max structure)
    from fractions import Fraction

    from real_estate_project1_etl_spark.operators.evalmetrics import (
        isotonic_calibration_ppm,
    )

    rows = []
    for i in range(500):
        h = (i * 48271) % 1009
        s = h % 40  # 40 distinct scores, plenty of ties
        # noisy monotone-ish signal with deliberate violations
        y = 1 if (h % 100) < 30 + s + (15 if s % 7 == 0 else 0) else 0
        rows.append((s, y))
    df = spark.createDataFrame(rows, "score_milli bigint, label int")
    got = {
        r["s"]: (r["n"], r["n_pos"], r["iso_ppm"])
        for r in isotonic_calibration_ppm(df).collect()
    }

    # classic PAV over distinct-score blocks, exact rationals
    blocks = {}
    for s, y in rows:
        c, p = blocks.get(s, (0, 0))
        blocks[s] = (c + 1, p + y)
    order = sorted(blocks)
    stack = []  # (count, pos) pooled blocks, with their score members
    members = []
    for s in order:
        c, p = blocks[s]
        stack.append((c, p))
        members.append([s])
        while len(stack) > 1 and Fraction(stack[-1][1], stack[-1][0]) < (
            Fraction(stack[-2][1], stack[-2][0])
        ):
            c2, p2 = stack.pop()
            c1, p1 = stack.pop()
            stack.append((c1 + c2, p1 + p2))
            m2 = members.pop()
            members[-1].extend(m2)
    want = {}
    for (c, p), ms in zip(stack, members):
        fit = (1_000_000 * p) // c
        for s in ms:
            want[s] = (blocks[s][0], blocks[s][1], fit)
    assert got == want
    # monotone in s
    vals = [got[s][2] for s in order]
    assert vals == sorted(vals)


# ------------------------------------------------------- split conformal


def test_conformal_threshold_planted(spark):
    # 99 calibration scores 1..99, alpha=0.1: k = ceil(0.9*100) = 90,
    # q_hat = 90; test scores 1..100 -> 90 covered
    from real_estate_project1_etl_spark.operators.evalmetrics import (
        split_conformal_coverage,
    )

    cal = spark.createDataFrame(
        [("g", i) for i in range(1, 100)], "g string, s int"
    )
    tst = spark.createDataFrame(
        [("g", i) for i in range(1, 101)], "g string, s int"
    )
    r = split_conformal_coverage(cal, tst, ["g"], "s").collect()[0]
    assert (r.n_cal, r.k, r.q_hat) == (99, 90, 90)
    assert (r.n_test, r.n_covered) == (100, 90)
    assert r.coverage_ppm == 900000


def test_conformal_python_model_parity(spark):
    from real_estate_project1_etl_spark.operators.evalmetrics import (
        split_conformal_coverage,
    )

    cal_rows = [("a", (i * 37) % 101) for i in range(57)] + [
        ("b", (i * 11) % 53) for i in range(23)
    ]
    tst_rows = [("a", (i * 13) % 97) for i in range(31)] + [
        ("b", (i * 7) % 41) for i in range(17)
    ]
    cal = spark.createDataFrame(cal_rows, "g string, s int")
    tst = spark.createDataFrame(tst_rows, "g string, s int")
    got = {
        r.g: (r.n_cal, r.k, r.q_hat, r.n_test, r.n_covered,
              r.coverage_ppm)
        for r in split_conformal_coverage(cal, tst, ["g"], "s").collect()
    }
    for g in ("a", "b"):
        scores = sorted(s for gg, s in cal_rows if gg == g)
        n = len(scores)
        k = (9 * (n + 1) + 9) // 10
        qh = scores[k - 1] if k <= n else None
        ts = [s for gg, s in tst_rows if gg == g]
        cov = sum(1 for s in ts if qh is None or s <= qh)
        assert got[g] == (
            n, k, qh, len(ts), cov, 10**6 * cov // len(ts)
        )


def test_conformal_tiny_group_trivial_threshold(spark):
    # n_cal = 5 < 9: k = ceil(0.9*6) = 6 > 5 -> +inf threshold (NULL),
    # full coverage
    from real_estate_project1_etl_spark.operators.evalmetrics import (
        split_conformal_coverage,
    )

    cal = spark.createDataFrame(
        [("g", i) for i in range(5)], "g string, s int"
    )
    tst = spark.createDataFrame(
        [("g", 10**6)], "g string, s int"
    )
    r = split_conformal_coverage(cal, tst, ["g"], "s").collect()[0]
    assert (r.n_cal, r.k, r.q_hat) == (5, 6, None)
    assert (r.n_covered, r.coverage_ppm) == (1, 1000000)
