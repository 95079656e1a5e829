"""Numeric Column expressions (reference C5-C9, SURVEY.md §2)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lenient_int(col: Column | str, fill: int = 0) -> Column:
    """C5+C6 — lenient cast to int with null-fill (``pd.to_numeric(
    errors='coerce').fillna(0).astype(int)``, transform.py:77-78)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("double").cast("int"), F.lit(fill))


def lenient_double(col: Column | str) -> Column:
    """C5 — cast yielding NULL on failure (ANSI off ⇒ exact match for
    pandas ``errors='coerce'``, transform.py:77)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")


def guarded_ratio_int(num: Column | str, den: Column | str) -> Column:
    """C7+C8+C9 collapsed — ``ceil(num/den)`` as nullable int, NULL when the
    denominator is 0/NULL (the reference takes four steps: np.where guard,
    fillna(0), ceil+astype, replace(0, None) — transform.py:96-102; one
    ``when`` expression is the idiomatic-Spark equivalent)."""
    n = F.col(num) if isinstance(num, str) else num
    d = F.col(den) if isinstance(den, str) else den
    return F.when(d != 0, F.ceil(n / d).cast("int"))
