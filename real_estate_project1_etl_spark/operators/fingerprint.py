"""Winnowing document fingerprints (rolling k-gram hash window minima).

Implements the winnowing fingerprint selection of Schleimer, Wilkerson &
Aiken, "Winnowing: Local Algorithms for Document Fingerprinting"
(SIGMOD 2003): hash every word k-gram of a document, slide a window of
``w`` consecutive k-gram hashes, and keep the minimum hash of each window.
The selected set is a position-robust fingerprint: any shared substring of
at least ``w + k - 1`` words between two documents is guaranteed to
produce at least one shared fingerprint, while the expected density of
selected hashes is only ``2 / (w + 1)`` of all k-grams.

Scale design (100 TB): fingerprint selection is a pure per-row expression
chain (split -> k-gram hash -> window minima -> distinct), so it runs in
the scan stage with zero shuffle; candidate pairing is an equi-join on the
fingerprint value — exactly the banding shape of minhash LSH, never an
all-pairs comparison. Hot fingerprints (boilerplate shared by thousands of
docs) are capped by document frequency before the self-join, which bounds
the worst-case join fan-out the same way stop-word removal bounds an
inverted index.

The reference has no near-dup operator at all (its only dedup is the exact
``drop_duplicates(subset=['link'])``, reference: transform.py:62); this is
part of the north-star LLM-curation layer (SURVEY.md §2b).

With ``hash_fn='md5_60'`` every selected fingerprint is bit-reproducible
in DuckDB (same md5-prefix hash, same window minima), so the whole
pipeline — selection AND pairing — is differentially testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hash_expr

__all__ = [
    "kgram_hash_array",
    "winnow",
    "winnowing_fingerprints",
    "winnowing_near_duplicates",
]


def _words(text: Column) -> Column:
    # normalized word stream: lowercase, collapse whitespace — identical to
    # operators/dedup.word_shingles so fingerprints and shingles agree
    return F.split(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))), " ")


def kgram_hash_array(text: Column | str, k: int = 3, hash_fn: str = "md5_60") -> Column:
    """Positional array of 64-bit hashes of every word k-gram.

    Unlike ``word_shingles`` this keeps POSITION (no distinct) — winnowing
    needs the k-gram sequence, not the k-gram set. Pure narrow expression:
    no shuffle, stays in whole-stage codegen.
    """
    text = F.col(text) if isinstance(text, str) else text
    w = _words(text)
    n = F.greatest(F.size(w) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(w, i, k)),
    )
    return F.transform(grams, lambda g: shingle_hash_expr(g, hash_fn))


def winnow(hashes: Column, w: int = 4) -> Column:
    """Distinct window minima of a hash sequence (the winnowing selection).

    For each of the ``n - w + 1`` windows of ``w`` consecutive hashes, keep
    ``min(window)``; return the distinct selected hashes. Documents shorter
    than one window contribute ``min(all hashes)`` (the standard
    degenerate-window rule). ``slice`` clamps at the array end in both
    Spark and DuckDB, so the mirror is exact.
    """
    n_win = F.greatest(F.size(hashes) - (w - 1), F.lit(1))
    minima = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.array_min(F.slice(hashes, i, w)),
    )
    return F.array_distinct(minima)


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    hash_fn: str = "md5_60",
) -> DataFrame:
    """One row per (document, selected fingerprint).

    Exploded form feeds the inverted fingerprint index / candidate join;
    everything before the explode is a narrow per-row expression.
    """
    fps = winnow(kgram_hash_array(F.col(text_col), k, hash_fn), w)
    return df.select(F.col(id_col), F.explode(fps).alias("fingerprint"))


def winnowing_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    hash_fn: str = "md5_60",
) -> DataFrame:
    """Candidate near-duplicate pairs: documents sharing >= ``min_shared``
    winnowing fingerprints, with hot fingerprints (document frequency >
    ``max_df``) dropped before pairing.

    Returns (id_a, id_b, n_shared) with ``id_a < id_b``.

    Scale shape: fingerprint df-count is one partial+final agg exchange;
    the pair generator is an equi-join on the fingerprint value whose
    fan-out is bounded by ``max_df``^2 per fingerprint (boilerplate can't
    explode the join); the pair count is one more agg on the (a, b) key.
    No similarity verify step here — compose with ``ngram_jaccard`` or
    minhash verify when an exact score is needed.
    """
    fps = winnowing_fingerprints(df, text_col, id_col, k, w, hash_fn)
    rare = (
        fps.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
        .select("fingerprint")
    )
    kept = fps.join(rare, "fingerprint")
    a = kept.select(F.col("fingerprint"), F.col(id_col).alias("id_a"))
    b = kept.select(F.col("fingerprint"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
