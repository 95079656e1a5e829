"""Reference-fidelity gates (round-2 verdict items 1-2).

The DuckDB oracle can never catch constant drift because the engine and the
oracle share the same Python constants.  These tests break that
self-consistency loop two ways:

1. ``test_constants_match_reference_source`` — AST-parses the reference's
   ``transform.py`` (read-only, at /root/reference) and asserts our
   RENT/SALE keyword lists and region whitelist equal the reference's list
   literals *as written in the reference text*.  A vendored fixture below is
   the fallback pin when the reference tree is absent (e.g. CI elsewhere).

2. ``test_pandas_differential`` — an independent pandas re-implementation of
   the reference's ``clean_and_transform_data`` semantics (transform.py:
   25-116; written from the documented behavior, not copied) is run on a
   generated bronze fixture and compared row-for-row with
   ``clean_properties``.  Documented divergences handled in the fixture
   design, not papered over in the compare:

   - C4 digit-extract throws on zero-digit price in the reference; the
     fixture has no zero-digit prices after the EUR filter.
   - D1 dedup: the reference keeps first-in-file-order; Spark's
     deterministic first is row_number over ``dedup_order``.  Duplicate-link
     rows in the fixture are exact copies, so both "firsts" agree.
   - transform.py:101 ``replace(0, None)`` is a pandas version footgun
     (value=None historically meant method='pad'); both sides implement the
     documented intent: price_per_m2 is NULL when size is 0.
"""

from __future__ import annotations

import ast
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from real_estate_project1_etl_spark.functions.text import (
    _DIACRITICS_DST,
    _DIACRITICS_SRC,
)
from real_estate_project1_etl_spark.operators.cleaning import (
    RENT_KEYWORDS,
    SALE_KEYWORDS,
    clean_properties,
    scraped_rows_to_bronze,
)
from real_estate_project1_etl_spark.schemas import CZECH_REGIONS, PROPERTIES_RAW

REFERENCE_TRANSFORM = "/root/reference/scripts/transform.py"

# Vendored pin of the reference's list literals (transform.py:26-60),
# transcribed 2026-08-14.  If the reference file is present the AST test
# below checks against the live text instead.
REFERENCE_CONSTANTS = {
    "czech_regions": [
        "Praha",
        "Jihocesky kraj",
        "Jihomoravsky kraj",
        "Karlovarsky kraj",
        "Kralovehradecky kraj",
        "Liberecky kraj",
        "Moravskoslezsky kraj",
        "Olomoucky kraj",
        "Pardubicky kraj",
        "Plzensky kraj",
        "Stredocesky kraj",
        "Ustecky kraj",
        "Kraj Vysocina",
        "Zlinsky kraj",
    ],
    "rent_wrong_price_keywords": [
        "Pronajem kancelare",
        "Pronajem nebytoveho prostoru",
        "Pronajem chaty, chalupy",
        "Pronajem domu",
        "Pronajem pozemku",
    ],
    "sale_wrong_price_keywords": [
        "Prodej bytu",
        "Prodej domu",
        "Prodej nebytoveho prostoru",
        "Prodej pozemku",
        "Prodej chaty, chalupy",
        "Prodej garaze",
        "Prodej kancelare",
    ],
}


def _reference_list_literals() -> dict[str, list[str]]:
    """Extract every ``name = [str, ...]`` assignment from the reference's
    transform.py text.  The same names are assigned twice (module constants
    are re-declared mid-function, transform.py:73-74); both must agree."""
    tree = ast.parse(open(REFERENCE_TRANSFORM, encoding="utf-8").read())
    found: dict[str, list[list[str]]] = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.Assign) or len(node.targets) != 1:
            continue
        tgt = node.targets[0]
        if not isinstance(tgt, ast.Name) or not isinstance(node.value, ast.List):
            continue
        elts = node.value.elts
        if elts and all(
            isinstance(e, ast.Constant) and isinstance(e.value, str) for e in elts
        ):
            found.setdefault(tgt.id, []).append([e.value for e in elts])
    out = {}
    for name, versions in found.items():
        for v in versions[1:]:
            assert v == versions[0], f"reference declares {name} inconsistently"
        out[name] = versions[0]
    return out


def test_constants_match_vendored_pin():
    assert CZECH_REGIONS == REFERENCE_CONSTANTS["czech_regions"]
    assert RENT_KEYWORDS == REFERENCE_CONSTANTS["rent_wrong_price_keywords"]
    assert SALE_KEYWORDS == REFERENCE_CONSTANTS["sale_wrong_price_keywords"]


def test_constants_match_reference_source():
    if not os.path.exists(REFERENCE_TRANSFORM):
        import pytest

        pytest.skip("reference tree not mounted; vendored pin test covers")
    ref = _reference_list_literals()
    assert CZECH_REGIONS == ref["czech_regions"]
    assert RENT_KEYWORDS == ref["rent_wrong_price_keywords"]
    assert SALE_KEYWORDS == ref["sale_wrong_price_keywords"]
    # the vendored pin itself must not drift from the live reference
    for k, v in REFERENCE_CONSTANTS.items():
        assert ref[k] == v, f"vendored pin stale for {k}"


# ---------------------------------------------------------------------------
# Pandas differential
# ---------------------------------------------------------------------------

_TRANSLATE = str.maketrans(_DIACRITICS_SRC, _DIACRITICS_DST)


def _pandas_reference_clean(
    df: pd.DataFrame, file_name: str, dump_date: str
) -> pd.DataFrame:
    """Independent pandas model of transform.py:25-116 (same operator order,
    same constants, reference semantics; see module docstring for the three
    documented divergences)."""
    df = df.apply(lambda s: s.str.translate(_TRANSLATE).str.strip())  # extract.py:45
    df = df.drop_duplicates(subset=["link"])
    df = df.replace(" ", " ", regex=True)
    df = df[~df["price_czk"].str.contains("EUR")]
    df = df.assign(
        price_czk=df["price_czk"]
        .str.replace("Kc", "", regex=False)
        .map(lambda s: int("".join(ch for ch in s if ch.isdigit())))
    )
    df = df[df["price_czk"] >= 500]
    # deliberately the VENDORED pin, not the engine's imports — so this
    # differential stays red if the engine's constants ever drift again
    rent_rx = "|".join(REFERENCE_CONSTANTS["rent_wrong_price_keywords"])
    sale_rx = "|".join(REFERENCE_CONSTANTS["sale_wrong_price_keywords"])
    df = df[~(df["purpose"].str.contains(rent_rx) & (df["price_czk"] <= 1000))]
    df = df[~(df["purpose"].str.contains(sale_rx) & (df["price_czk"] <= 20000))]
    size = pd.to_numeric(
        df["size_m2"].str.replace("m2", "", regex=False), errors="coerce"
    )
    df = df.assign(size_m2=size.fillna(0).astype(int))

    def last2(a: str) -> str:
        w = a.split()
        return " ".join(w[-2:]).rstrip(",") if len(w) >= 2 else ""

    df = df.assign(
        region=df["address"].map(
            lambda a: last2(a) if "kraj" in a.lower() else "Praha"
        ),
        address=df["address"].map(
            lambda a: " ".join(a.split()[:-2]).rstrip(",")
            if "kraj" in a.lower()
            else a
        ),
    )
    df = df[df["region"].isin(REFERENCE_CONSTANTS["czech_regions"])]
    ppm = np.where(df["size_m2"] != 0, df["price_czk"] / df["size_m2"], np.nan)
    df = df.assign(
        price_per_m2=[
            None if math.isnan(v) else int(math.ceil(v)) for v in ppm
        ]
    )
    df = df[
        ~(
            df["purpose"].str.contains("Prodej pozemku")
            & df["price_per_m2"].map(lambda v: v is not None and v > 80000)
        )
    ]
    df = df.assign(dump_date=dump_date, file_name=file_name)
    return df[
        [
            "purpose", "address", "region", "size_m2", "design",
            "price_czk", "price_per_m2", "link", "dump_date", "file_name",
        ]
    ]


def _bronze_fixture_rows() -> list[tuple]:
    """Deterministic grid over every cleaning-chain branch: all rent/sale
    keywords at both sides of their price bounds, every whitelist region plus
    two rejects, junk/empty/superscript sizes, NBSP prices, multi-trailing
    commas (the rstrip parity case), EUR rows, and duplicate links."""
    purposes = (
        [k + " u nadrazi" for k in RENT_KEYWORDS]
        + [k + " 3+kk" for k in SALE_KEYWORDS]
        + ["Byt k pronájmu", "Drazba domu"]
    )
    addresses = [
        "Sokolovská, Praha 8",                  # no 'kraj' -> Praha
        "Brno, Jihomoravský kraj",
        "Jihlava, Kraj Vysočina",               # inverted official form
        "Okres,, Ústecký kraj",                 # double comma -> rstrip parity
        "Kdesi, Dolný kraj",                    # F5 reject
        "Ves, Moravskoslezský kraj",
    ]
    prices = [
        "450 EUR",            # F1
        "300 Kč",             # F2
        "900 Kc",             # F3 bound
        "15 000 Kc",     # F4 bound, NBSP
        "1 200 000 Kč",
        "95 000 000 Kc",      # drives F6 for pozemek rows
        "21 000 Kc",
    ]
    sizes = ["43 m²", "", "xx", "120 m2", "0 m2", "17,5"]
    rows = []
    i = 0
    for p in purposes:
        for a_i, a in enumerate(addresses):
            price = prices[i % len(prices)]
            size = sizes[(i // 7) % len(sizes)]
            link = f"/n/{i}"
            rows.append((p, a, size, f"d{i:04d}", price, link))
            if i % 11 == 0:  # exact duplicate link (D1)
                rows.append((p, a, size, f"d{i:04d}", price, link))
            i += 1
    return rows


def test_pandas_differential(spark):
    rows = _bronze_fixture_rows()
    raw_pd = pd.DataFrame(
        rows, columns=["purpose", "address", "size_m2", "design", "price_czk", "link"]
    )
    expected = _pandas_reference_clean(
        raw_pd, "raw_properties_diff.csv", "2026_01_01_000000"
    )

    bronze = scraped_rows_to_bronze(spark.createDataFrame(rows, PROPERTIES_RAW))
    silver = clean_properties(
        bronze,
        dedup_order=["design"],
        file_name_col=F.lit("raw_properties_diff.csv"),
        dump_ts=F.to_timestamp(F.lit("2026-01-01 00:00:00")),
    ).withColumn("dump_date", F.date_format("dump_date", "yyyy_MM_dd_HHmmss"))
    got = silver.toPandas()

    def canon(df: pd.DataFrame) -> list[tuple]:
        out = []
        for row in df.itertuples(index=False):
            vals = []
            for v in row:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    vals.append("NULL")
                elif isinstance(v, float):
                    # toPandas renders nullable int columns as float64
                    vals.append(str(int(v)) if v.is_integer() else repr(v))
                elif isinstance(v, (int, np.integer)):
                    vals.append(str(int(v)))
                else:
                    vals.append(str(v))
            out.append(tuple(vals))
        return sorted(out)

    exp_c, got_c = canon(expected), canon(got)
    assert len(exp_c) > 30, "fixture must keep a meaningful survivor set"
    assert got_c == exp_c, (
        f"differential mismatch: {len(got_c)} spark vs {len(exp_c)} pandas rows; "
        f"first diffs: {[x for x in exp_c if x not in got_c][:3]} | "
        f"{[x for x in got_c if x not in exp_c][:3]}"
    )


# ---------------------------------------------------------------------------
# Transliteration breadth (round-2 verdict item 3): the reference unidecodes
# ANY Unicode (extract.py:45); strip_diacritics must cover at least every
# Latin-1 Supplement + Latin Extended-A letter with unidecode-identical
# output, so a German/Polish/Nordic character in an address never passes
# through untouched where the reference would ASCII-fold it.
# ---------------------------------------------------------------------------

# real-text samples with hand-transcribed unidecode outputs (vendored — the
# unidecode package is not a runtime dep; if it IS importable the full
# per-char parity test below runs too)
_TRANSLIT_SAMPLES = {
    "Łódź": "Lodz",
    "Kraków": "Krakow",
    "Ærøskøbing": "AEroskobing",
    "Großstraße": "Grossstrasse",
    "İstanbul": "Istanbul",
    "Þingvellir": "Thingvellir",
    "François": "Francois",
    "Señor Ñandú": "Senor Nandu",
    "œuvre d'Œdipe": "oeuvre d'OEdipe",
    "Ĳsselmeer": "IJsselmeer",
    "ďáblův mlýn": "dabluv mlyn",
    "Tübingen–Gauß": "Tübingen–Gauss".replace("ü", "u"),  # dash outside blocks passes through
    "ʒoker": "ʒoker",  # IPA block NOT covered — documented pass-through
}


def test_transliteration_parity_samples(spark):
    from real_estate_project1_etl_spark.functions.text import strip_diacritics

    df = spark.createDataFrame([(s,) for s in _TRANSLIT_SAMPLES], "s string")
    got = {r.s: r.t for r in df.select("s", strip_diacritics(F.col("s")).alias("t")).collect()}
    for s, want in _TRANSLIT_SAMPLES.items():
        assert got[s] == want, (s, got[s], want)


def test_transliteration_covers_every_latin_letter(spark):
    import unicodedata

    from real_estate_project1_etl_spark.functions.text import (
        _DIACRITIC_PAIRS,
        _MULTI_PAIRS,
        strip_diacritics,
    )

    covered = {src for src, _ in _DIACRITIC_PAIRS} | {s for s, _ in _MULTI_PAIRS}
    missing = []
    for cp in range(0xC0, 0x180):  # Latin-1 letters + Latin Extended-A
        ch = chr(cp)
        if not unicodedata.category(ch).startswith("L"):
            continue
        if ch == "ŉ":  # ŉ — deprecated codepoint, unidecode "'n"; excluded
            continue
        if ch not in covered:
            missing.append(f"U+{cp:04X} {ch}")
    assert not missing, missing

    # and every covered char folds to pure ASCII through the real expression
    chars = sorted(covered)
    df = spark.createDataFrame([(c,) for c in chars], "c string")
    rows = df.select("c", strip_diacritics(F.col("c")).alias("t")).collect()
    for r in rows:
        assert r.t.isascii() and r.t != "", (r.c, r.t)


def test_transliteration_matches_unidecode_if_available(spark):
    import pytest

    try:
        from unidecode import unidecode
    except ImportError:
        pytest.skip("unidecode not installed; vendored-sample parity covers")
    from real_estate_project1_etl_spark.functions.text import (
        _DIACRITIC_PAIRS,
        _MULTI_PAIRS,
        strip_diacritics,
    )

    chars = [src for src, _ in _DIACRITIC_PAIRS if src not in (" ", " ")]
    chars += [s for s, _ in _MULTI_PAIRS]
    df = spark.createDataFrame([(c,) for c in chars], "c string")
    got = {r.c: r.t for r in df.select("c", strip_diacritics(F.col("c")).alias("t")).collect()}
    for c in chars:
        assert got[c] == unidecode(c), (hex(ord(c)), got[c], unidecode(c))
