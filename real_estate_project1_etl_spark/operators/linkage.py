"""Blocked fuzzy matching (entity resolution / record linkage).

The classic two-phase shape every large-scale record-linkage system uses
(and the string-similarity-join literature in PAPERS.md formalizes):

1. **Blocking** — generate one or more cheap candidate keys per record
   (here: each word token of the name) and equi-join on the key, so only
   records sharing a block are ever compared. This replaces the O(n^2)
   all-pairs distance matrix with an inverted-index-shaped join whose cost
   is sum(block_size^2) — the same reason minhash banding scales
   (operators/dedup.py).
2. **Verification** — compute the exact edit distance only on candidate
   pairs (JVM ``levenshtein``, no Python).

The reference has no fuzzy matching (its only match-like op is the exact
region IN-list, reference: transform.py:92); this generalizes the
messy-string-equality problem its address/region columns actually have.

Recall caveat (inherent to blocking, documented not hidden): a pair whose
names share NO complete token is never compared — e.g. pure
transposition-of-everything typos. Multi-key blocking (add a second key
family like first-char + length band) trades join fan-out for recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_fuzzy_matches"]


def blocked_fuzzy_matches(
    df: DataFrame,
    name_col: str,
    max_distance: int = 3,
    block_max_df: int = 500,
) -> DataFrame:
    """Distinct value pairs of ``name_col`` within edit distance
    ``max_distance`` that share at least one word token.

    Returns (name_a, name_b, distance) with ``name_a < name_b``.

    Blocks with more than ``block_max_df`` distinct names (stop-word
    tokens — think 'inc', 'the') are dropped before pairing, bounding the
    join fan-out exactly like the hot-fingerprint cap in
    :func:`~.fingerprint.winnowing_near_duplicates`.

    Scale shape: names are deduplicated FIRST (one agg exchange on the
    name — at 100 TB the distinct-name table is orders of magnitude
    smaller than the row table), tokens explode from the distinct names
    only, candidate generation is an equi-join on the token, and the
    per-pair verify is one JVM levenshtein call. ``distinct()`` on the
    pair kills the duplicate candidates that multi-token overlap creates
    before the distance is computed.
    """
    names = df.select(F.col(name_col).alias("name")).distinct()
    toks = names.select(
        "name", F.explode(F.split(F.col("name"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    rare = (
        toks.groupBy("tok")
        .agg(F.countDistinct("name").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= block_max_df))
        .select("tok")
    )
    kept = toks.join(rare, "tok")
    a = kept.select("tok", F.col("name").alias("name_a"))
    b = kept.select("tok", F.col("name").alias("name_b"))
    cands = (
        a.join(b, "tok")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return cands.withColumn(
        "distance", F.levenshtein("name_a", "name_b")
    ).filter(F.col("distance") <= max_distance)
