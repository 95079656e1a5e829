"""Skew-handling utilities: salting for hot keys (north-star scale
discipline — a 100 TB fact table always has hot keys; AQE's skew-join
split covers sort-merge joins, salting covers aggregations and the cases
AQE can't re-plan).

Semantics are preserved exactly: salted aggregation = two-phase (partial
per salt, final merge); salted join replicates the *small* side per salt
value so every (key, salt) partition joins locally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Uniform random-ish salt derived deterministically from a stable row
    hash (monotonically_increasing_id is partition-stable; no rand() so
    retries/recomputes are consistent)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets))
    )


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    value: Column,
    buckets: int = 16,
) -> DataFrame:
    """Skew-proof groupBy: phase 1 aggregates (key, salt) — hot keys spread
    over ``buckets`` reducers — phase 2 merges partials per key. Returns
    (keys..., n, total). Total is an exact decimal sum; cast at the caller.
    """
    partial = (
        with_salt(df, buckets)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(value).alias("__t"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("__n").alias("n"), F.sum("__t").alias("total"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: the big side gets a salt in [0, buckets); the
    small side is exploded ``buckets``-fold with every salt value, so each
    hot key's rows split across ``buckets`` reducers while joining against
    a local copy of the matching small-side rows."""
    big_s = with_salt(big, buckets)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(buckets)]))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Key-distribution diagnosis — the measurement that decides whether a
    join/agg needs salting or AQE skew handling BEFORE it runs at scale.

    Returns the ``top_n`` heaviest keys with their share of all rows and
    the ratio to a perfectly uniform key (>> 1 means a hot key: e.g.
    ratio 50 on a 32-way shuffle means one task does ~50/32 of the
    average work). One count aggregate + a tiny top-k; run it on a
    sample for a quick look, the full table for the real decision.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    # orderBy().limit() compiles to TakeOrderedAndProject — per-partition
    # partial top-k, no single-partition sort of the (possibly huge)
    # distinct-key table; the rank window then runs on top_n rows only
    top = counts.orderBy(F.col("n").desc(), F.col(key_col).asc()).limit(top_n)
    w = Window.orderBy(F.col("n").desc(), F.col(key_col).asc())
    return (
        top.join(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            F.col(key_col).alias("key"),
            "n",
            (F.col("n") / F.col("total")).alias("share"),
            (F.col("n") * F.col("n_keys") / F.col("total")).alias(
                "uniform_ratio"
            ),
        )
    )
