"""String Column expressions.

Every function here returns a native ``Column`` built from
``pyspark.sql.functions`` — no Python UDFs — so the whole cleaning chain
stays inside whole-stage codegen and remains pushdown/prune-friendly. The
reference implements these as row-at-a-time Python (``applymap(unidecode)``
extract.py:45, digit-extract lambda transform.py:68, ``extract_last_two_words``
transform.py:81-87); replacing them with native expressions is the single
biggest idiomatic-Spark win (SURVEY.md §2 "UDF surface").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Czech/Slovak diacritics -> ASCII, 1:1 char map (covers every character the
# reference's ``unidecode`` call meets in this domain, incl. the superscript
# in 'm²' -> 'm2' noted in README.md:97). A finite translate() map keeps the
# operation deterministic and codegen-native; a full Unicode unidecode would
# need a vectorized pandas_udf (optimization barrier) for no domain benefit.
_DIACRITIC_PAIRS = [
    ("\u00e1", "a"), ("\u00e4", "a"), ("\u010d", "c"), ("\u010f", "d"),
    ("\u00e9", "e"), ("\u011b", "e"), ("\u00eb", "e"), ("\u00ed", "i"),
    ("\u0148", "n"), ("\u00f3", "o"), ("\u00f6", "o"), ("\u0159", "r"),
    ("\u0161", "s"), ("\u0165", "t"), ("\u00fa", "u"), ("\u016f", "u"),
    ("\u00fc", "u"), ("\u00fd", "y"), ("\u017e", "z"),
    ("\u00c1", "A"), ("\u00c4", "A"), ("\u010c", "C"), ("\u010e", "D"),
    ("\u00c9", "E"), ("\u011a", "E"), ("\u00cb", "E"), ("\u00cd", "I"),
    ("\u0147", "N"), ("\u00d3", "O"), ("\u00d6", "O"), ("\u0158", "R"),
    ("\u0160", "S"), ("\u0164", "T"), ("\u00da", "U"), ("\u016e", "U"),
    ("\u00dc", "U"), ("\u00dd", "Y"), ("\u017d", "Z"),
    ("\u013e", "l"), ("\u0139", "L"), ("\u013a", "l"), ("\u0155", "r"),
    ("\u00f4", "o"), ("\u013d", "L"), ("\u0154", "R"), ("\u00d4", "O"),
    ("\u00b2", "2"), ("\u00a0", " "),
]
_DIACRITICS_SRC = "".join(p[0] for p in _DIACRITIC_PAIRS)
_DIACRITICS_DST = "".join(p[1] for p in _DIACRITIC_PAIRS)


def strip_diacritics(col: Column | str) -> Column:
    """C1 — transliterate Czech diacritics to ASCII (extract.py:45)."""
    return F.translate(F.col(col) if isinstance(col, str) else col,
                       _DIACRITICS_SRC, _DIACRITICS_DST)


def nbsp_to_space(col: Column | str) -> Column:
    """C2 — non-breaking space -> plain space (transform.py:63)."""
    return F.regexp_replace(col, " ", " ")


def digits_only(col: Column | str) -> Column:
    """C4 — keep only digits, cast to int (transform.py:68).

    Divergence (documented, not replicated): the reference *throws* on
    zero-digit input; this yields NULL (regexp leaves '', cast('') -> NULL
    with ANSI off) — same lenient semantics as DuckDB TRY_CAST.
    """
    return F.regexp_replace(col, "[^0-9]", "").cast("int")


def collapse_whitespace(col: Column | str) -> Column:
    """Normalize runs of whitespace to single spaces and trim."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _words(col: Column | str) -> Column:
    return F.split(F.trim(F.col(col) if isinstance(col, str) else col), r"\s+")


def last_two_words(col: Column | str) -> Column:
    """C10 — last two whitespace-separated tokens joined by a space, with
    trailing commas stripped; '' when fewer than two words
    (transform.py:85-91). ``,+$`` mirrors the reference's ``rstrip(',')``,
    which removes *all* trailing commas, not just one."""
    w = _words(col)
    return F.when(
        F.size(w) >= 2,
        F.regexp_replace(F.concat_ws(" ", F.slice(w, -2, 2)), ",+$", ""),
    ).otherwise(F.lit(""))


def drop_last_two_words(col: Column | str) -> Column:
    """C12 helper — the string minus its last two words, trailing commas
    stripped (transform.py:95 strips the region suffix from the address;
    ``,+$`` = Python ``rstrip(',')``)."""
    w = _words(col)
    return F.when(
        F.size(w) > 2,
        F.regexp_replace(F.concat_ws(" ", F.slice(w, 1, F.size(w) - 2)), ",+$", ""),
    ).otherwise(F.lit(""))


def basename(col: Column | str) -> Column:
    """C15 — last path segment (transform.py:112)."""
    return F.element_at(F.split(col, "/"), -1)
