"""Unit tests for the statistical-analysis operators: hand-computed
contingency/Gini/MAD values on planted inputs, plus the dyadic-exactness
property that makes the MAD oracle safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_project1_etl_spark.operators.stats import (
    chi2_contingency,
    gini_impurity,
    mad_per_group,
)


def test_chi2_independent_table_is_zero(spark):
    # perfectly independent 2x2: O == E for every cell -> contrib 0
    rows = []
    for s in ["a", "b"]:
        for l in ["en", "de"]:
            rows += [(s, l)] * 10
    df = spark.createDataFrame(rows, "source string, lang string")
    out = chi2_contingency(df, "source", "lang").collect()
    assert len(out) == 4
    assert all(r["contrib_scaled"] == 0 for r in out)


def test_chi2_dependent_table_positive(spark):
    # diagonal-heavy table: dependence -> strictly positive contributions
    rows = [("a", "en")] * 30 + [("a", "de")] * 5 + [("b", "en")] * 5 + [("b", "de")] * 30
    df = spark.createDataFrame(rows, "source string, lang string")
    out = {(r["row_val"], r["col_val"]): r for r in chi2_contingency(df, "source", "lang").collect()}
    # N=70, R_a=35, C_en=35, O=30: contrib = 1e6*(30*70-35*35)^2/(70*35*35)
    expected = (10**6 * (30 * 70 - 35 * 35) ** 2) // (70 * 35 * 35)
    assert out[("a", "en")]["contrib_scaled"] == expected
    assert all(r["contrib_scaled"] > 0 for r in out.values())


def test_gini_concentrated_vs_uniform(spark):
    rows = [("pure", "en")] * 20 + [("mixed", "en")] * 10 + [("mixed", "de")] * 10
    df = spark.createDataFrame(rows, "source string, lang string")
    out = {r["grp"]: r for r in gini_impurity(df, "source", "lang").collect()}
    assert out["pure"]["gini_scaled"] == 0  # single class -> impurity 0
    # two uniform classes -> 1 - 2*(1/2)^2 = 0.5
    assert out["mixed"]["gini_scaled"] == 500000
    assert out["mixed"]["n_classes"] == 2


def test_mad_hand_computed(spark):
    # values 1.00..5.00: median 3.00 (=300 cents), deviations {0,100,200}
    # doubled coverage -> MAD = 100 cents
    df = spark.createDataFrame(
        [("t", float(v)) for v in [1, 2, 3, 4, 5]], "event_type string, value double"
    )
    r = mad_per_group(df, "event_type", "value").collect()[0]
    assert r["median_cents"] == 300.0 and r["mad_cents"] == 100.0 and r["n"] == 5


def test_mad_even_count_dyadic(spark):
    # even count: median of {1.00, 2.00} = 150.0 cents exactly (dyadic);
    # deviations {50, 50} -> MAD 50.0
    df = spark.createDataFrame(
        [("t", 1.0), ("t", 2.0)], "event_type string, value double"
    )
    r = mad_per_group(df, "event_type", "value").collect()[0]
    assert r["median_cents"] == 150.0 and r["mad_cents"] == 50.0


def test_mad_outlier_insensitive(spark):
    base = [("t", float(v)) for v in [10, 11, 12, 13, 14]]
    spiked = base + [("t", 10000.0)]
    df = spark.createDataFrame(spiked, "event_type string, value double")
    r = mad_per_group(df, "event_type", "value").collect()[0]
    # stddev would explode; MAD stays at ~1.5 units (150 cents)
    assert r["mad_cents"] <= 200.0


def test_profile_columns_nulls_and_exact_mode(spark):
    from real_estate_project1_etl_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "b", None), (4, "a", 4.0)],
        "k long, s string, v double",
    )
    out = {
        r["column"]: r
        for r in profile_columns(
            df, {"k": "int", "s": "string", "v": "money"}
        ).collect()
    }
    assert out["k"]["n_rows"] == 4 and out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 4
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "b"
    assert out["v"]["n_nulls"] == 1
    assert out["v"]["min_value"] == "1.50" and out["v"]["max_value"] == "4.00"
    # approx mode keeps the schema (HLL++ path for 100 TB)
    approx = profile_columns(df, {"k": "int"}, exact=False).collect()[0]
    assert approx["n_distinct"] >= 3


# ---------------------------------------------------------------------------
# property-based: scaled-integer statistics vs exact Python integer models
# (guards the div/floor semantics beyond the fixed oracle datasets)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_COUNTS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]), st.sampled_from(["x", "y", "z"])
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=5, deadline=None)
@given(_COUNTS)
def test_hypothesis_gini_matches_integer_model(spark, pairs):
    from collections import Counter

    df = spark.createDataFrame(pairs, "g string, c string")
    got = {r["grp"]: r["gini_scaled"] for r in gini_impurity(df, "g", "c").collect()}
    by_grp: dict = {}
    for g, c in pairs:
        by_grp.setdefault(g, Counter())[c] += 1
    for g, cnt in by_grp.items():
        t = sum(cnt.values())
        exp = 10**6 - sum((10**6 * k * k) // (t * t) for k in cnt.values())
        assert got[g] == exp, (g, got[g], exp)


@settings(max_examples=5, deadline=None)
@given(_COUNTS)
def test_hypothesis_chi2_matches_integer_model(spark, pairs):
    from collections import Counter

    df = spark.createDataFrame(pairs, "r string, c string")
    got = {
        (r["row_val"], r["col_val"]): r["contrib_scaled"]
        for r in chi2_contingency(df, "r", "c").collect()
    }
    cells = Counter(pairs)
    n = len(pairs)
    rtot = Counter(r for r, _ in pairs)
    ctot = Counter(c for _, c in pairs)
    for (rv, cv), o in cells.items():
        num = 10**6 * (o * n - rtot[rv] * ctot[cv]) ** 2
        exp = num // (n * rtot[rv] * ctot[cv])
        assert got[(rv, cv)] == exp, ((rv, cv), got[(rv, cv)], exp)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(100, 105)),
        min_size=2,
        max_size=40,
    )
)
def test_hypothesis_association_rules_match_integer_model(spark, rows):
    from collections import Counter

    from real_estate_project1_etl_spark.operators.basket import association_rules

    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["c_pair"],
            r["support_scaled"],
            r["confidence_scaled"],
            r["lift_scaled"],
        )
        for r in association_rules(df, min_pair_orders=1).collect()
    }
    baskets: dict = {}
    for ok, pk in rows:
        baskets.setdefault(ok, set()).add(pk)
    n_orders = len(baskets)
    item = Counter()
    pair = Counter()
    for items in baskets.values():
        for p in items:
            item[p] += 1
        for a in items:
            for b in items:
                if a < b:
                    pair[(a, b)] += 1
    exp = {}
    for (a, b), c in pair.items():
        for ant, cons in [(a, b), (b, a)]:
            exp[(ant, cons)] = (
                c,
                (10**6 * c) // n_orders,
                (10**6 * c) // item[ant],
                (10**6 * c * n_orders) // (item[ant] * item[cons]),
            )
    assert got == exp


def test_winsorize_per_group_hand_computed(spark):
    from real_estate_project1_etl_spark.operators.stats import (
        winsorize_per_group,
    )

    # group g: 1..20 (cents 100..2000), pct=10 -> k_lo=2, k_hi=19:
    # clip to [200, 1900]; one row clipped each side
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 21)] + [("h", 5.0)],
        "k string, v double",
    )
    out = {
        r["k"]: r for r in winsorize_per_group(df, "k", "v", pct=10).collect()
    }
    g = out["g"]
    assert g["n"] == 20 and g["lo_cents"] == 200 and g["hi_cents"] == 1900
    assert g["n_clipped_low"] == 1 and g["n_clipped_high"] == 1
    # sum(2..19)*100 + 200 + 1900 = 18900 + 2100
    assert g["winsorized_sum_cents"] == sum(range(2, 20)) * 100 + 200 + 1900
    # singleton group: k_lo = k_hi = 1, nothing clipped
    h = out["h"]
    assert h["n"] == 1 and h["lo_cents"] == 500 and h["hi_cents"] == 500
    assert h["n_clipped_low"] == 0 and h["n_clipped_high"] == 0
    assert h["winsorized_sum_cents"] == 500


def test_winsorize_per_group_rejects_out_of_range_pct(spark):
    import pytest as _pytest

    from real_estate_project1_etl_spark.operators.stats import (
        winsorize_per_group,
    )

    df = spark.createDataFrame([("g", 1.0)], "k string, v double")
    for bad in (0, 50, 60, -5):
        with _pytest.raises(ValueError):
            winsorize_per_group(df, "k", "v", pct=bad)


# ------------------------------------------------------- target encoding


def _enc_model(rows, n_folds=5, m=20, scale=10**6):
    # rows: (category, fold, y) -> {(c, f): (n_excl, pos_excl, enc_ppm)}
    from collections import defaultdict

    n_cf, pos_cf = defaultdict(int), defaultdict(int)
    for c, f, y in rows:
        n_cf[(c, f)] += 1
        pos_cf[(c, f)] += y
    n_c, pos_c = defaultdict(int), defaultdict(int)
    for (c, f), n in n_cf.items():
        n_c[c] += n
        pos_c[c] += pos_cf[(c, f)]
    n_f, pos_f = defaultdict(int), defaultdict(int)
    for (c, f), n in n_cf.items():
        n_f[f] += n
        pos_f[f] += pos_cf[(c, f)]
    n_g, pos_g = sum(n_c.values()), sum(pos_c.values())
    out = {}
    for (c, f), n in n_cf.items():
        ne = n_c[c] - n
        pe = pos_c[c] - pos_cf[(c, f)]
        nf, pf = n_g - n_f[f], pos_g - pos_f[f]
        out[(c, f)] = (
            ne, pe, scale * (pe * nf + m * pf) // ((ne + m) * nf)
        )
    return out


def test_target_encoding_python_model_parity(spark):
    import hashlib

    from real_estate_project1_etl_spark.operators.stats import (
        kfold_target_encoding,
    )

    rows = [
        (f"id{i}", ["a", "b", "c"][i % 3], (i * 7) % 2)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id string, cat string, y int")
    got = {
        (r.category, r.fold): (r.n_excl, r.pos_excl, r.enc_ppm)
        for r in kfold_target_encoding(
            df, "cat", "y", "id", n_folds=5, smoothing=20
        ).collect()
    }
    folded = [
        (c, int(hashlib.md5(i.encode()).hexdigest()[:15], 16) % 5, y)
        for i, c, y in rows
    ]
    assert got == _enc_model(folded)


def test_target_encoding_is_leakage_free(spark):
    # flipping every label INSIDE fold f must not change enc(c, f) for
    # that fold (its rows are excluded) while other folds' encodings of
    # the same category move — the definition of out-of-fold encoding.
    # Fold membership is md5-derived, so flip by recomputing the fold.
    import hashlib

    from real_estate_project1_etl_spark.operators.stats import (
        kfold_target_encoding,
    )

    def fold(i):
        return int(hashlib.md5(i.encode()).hexdigest()[:15], 16) % 5

    rows = [(f"id{i}", "a", (i * 3) % 2) for i in range(200)]
    target_fold = 0
    flipped = [
        (i, c, 1 - y if fold(i) == target_fold else y)
        for i, c, y in rows
    ]
    base_n_pos = sum(
        y for i, _, y in rows if fold(i) == target_fold
    )
    assert 0 < base_n_pos  # the flip actually changes fold-0 labels

    def enc(data):
        df = spark.createDataFrame(data, "id string, cat string, y int")
        return {
            r.fold: r.enc_ppm
            for r in kfold_target_encoding(
                df, "cat", "y", "id", n_folds=5, smoothing=20
            ).collect()
        }

    a, b = enc(rows), enc(flipped)
    assert a[target_fold] == b[target_fold]
    assert any(a[f] != b[f] for f in a if f != target_fold)


def test_seasonal_index_planted_two_cells(spark):
    # one type, two hour-of-week cells with means 10 and 30 -> global
    # mean 20, indices 0.5 and 1.5 exactly
    import __spark_entry__ as e
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1, 0, 0)  # a Monday, UTC -> how=0
    rows = []
    for i in range(4):
        rows.append((1000 + i, base, 1, "t", 10.0, None))
    for i in range(4):
        rows.append(
            (2000 + i, base + timedelta(hours=5), 1, "t", 30.0, None)
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r.hour_of_week: (r.n, r.avg_value, r.seasonality_ppm)
        for r in e.queries()["seasonal_hour_profile"](spark, d).collect()
    }
    assert got == {0: (4, 10.0, 500000), 5: (4, 30.0, 1500000)}


def test_tvd_planted_distributions(spark):
    # source A mirrors the global mix exactly (TVD ~ 0 vs pooled-with-B
    # shift); plant a fully disjoint source: TVD = 1
    import __spark_entry__ as e
    import tempfile, os

    rows = (
        [(i, "x", "en", "A", 10) for i in range(8)]
        + [(100 + i, "x", "de", "A", 10) for i in range(8)]
        + [(200 + i, "x", "zh", "B", 10) for i in range(16)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        r.source: (r.n_docs, r.tvd_ppm)
        for r in e.queries()["source_lang_tvd_drift"](spark, d).collect()
    }
    # global mix: en 1/4, de 1/4, zh 1/2.
    # A: en 1/2, de 1/2, zh 0 -> TVD = (1/4 + 1/4 + 1/2)/2 = 1/2
    # B: zh 1 -> TVD = (1/4 + 1/4 + 1/2)/2 = 1/2
    assert got == {"A": (16, 500000), "B": (16, 500000)}
