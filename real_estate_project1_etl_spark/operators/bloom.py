"""Bloom-filter semi-join reduction, entirely in native column
expressions — the runtime-filter technique every distributed engine
uses to keep a selective dimension filter from forcing a full fact
shuffle (Bloom 1970, CACM 13(7); Spark's own runtime bloom filters,
SPARK-32268, apply the same idea inside the optimizer — this is the
EXPLICIT, composable form for when the planner can't see the
opportunity, e.g. keys produced by an upstream engine stage).

Design: the filter is a TABLE, not a driver-side object — ``(word_idx,
bits)`` with ``n_bits/64`` rows (8 KiB of longs at the default 2^16
bits), built by one aggregation (per-key bit masks bit_or-folded,
map-side combined) and consumed by ``n_hashes`` broadcast joins that
keep only rows whose every probe bit is set. Nothing leaves the JVM,
nothing is collected to the driver, and the filter broadcasts like any
small dim table.

Correctness contract: a Bloom filter has NO FALSE NEGATIVES, so
``bloom_prefilter(facts)`` followed by the exact join is
RESULT-IDENTICAL to the plain join — which is exactly how the
registered query is oracled (the oracle is the plain join; no bloom
modeling needed). False positives only cost work, bounded by
``(1 - e^(-k*n/m))^k`` (~5% at n=10k keys, m=2^16, k=3).

Hashes are ``xxhash64(key, seed)`` — JVM-native speed is fine here
precisely because the filter never has to be engine-reproducible: it
prunes, the exact join decides.

Scale shape: at 100 TB the fact side never shuffles for keys the dim
filter killed — the 8 KiB bitmap rides the broadcast, the probes are
scan-stage expressions, and the pruned stream enters the real join
orders of magnitude smaller. Size ``n_bits`` to ~10 bits/key for ~1%
fpp; the builder aggregation is one exchange of <= n_bits/64 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_prefilter"]


def _probe(key: Column, seed: int, n_bits: int) -> tuple[Column, Column]:
    h = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))
    word = F.shiftright(h, 6).cast("int")
    # F.shiftleft only takes a python-int bit count — call the SQL
    # function directly for a column-valued shift
    mask = F.call_function(
        "shiftleft",
        F.lit(1).cast("bigint"),
        h.bitwiseAND(F.lit(63)).cast("int"),
    )
    return word, mask


def _check_params(n_bits: int, n_hashes: int) -> None:
    if n_bits < 64 or n_bits % 64:
        raise ValueError(
            f"bloom: n_bits must be a positive multiple of 64, got {n_bits!r}"
        )
    if not 1 <= n_hashes <= 16:
        raise ValueError(
            f"bloom: n_hashes must be in [1, 16], got {n_hashes!r}"
        )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Build the ``(word_idx, bits)`` filter table over the key column
    (NULL keys are ignored — NULL never equi-joins anyway). One
    aggregation to <= ``n_bits/64`` rows; words no key touched are
    absent (absent == all-zero)."""
    _check_params(n_bits, n_hashes)
    key = F.col(key_col)
    pairs = []
    for s in range(n_hashes):
        w, m = _probe(key, s, n_bits)
        pairs.append(F.struct(w.alias("w"), m.alias("m")))
    return (
        keys.filter(key.isNotNull())
        .select(F.explode(F.array(*pairs)).alias("p"))
        .groupBy(F.col("p.w").alias("word_idx"))
        .agg(F.bit_or("p.m").alias("bits"))
    )


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the filter (every probe bit
    set) — plus NULL-key rows are dropped (they cannot equi-join).
    ``n_bits``/``n_hashes`` must match the build. Returns ``df``'s
    columns unchanged; false positives pass (the exact join after this
    removes them), true members always pass."""
    _check_params(n_bits, n_hashes)
    out = df.filter(F.col(key_col).isNotNull())
    for s in range(n_hashes):
        w, m = _probe(F.col(key_col), s, n_bits)
        b = bloom.select(
            F.col("word_idx").alias(f"_bl_w{s}"),
            F.col("bits").alias(f"_bl_b{s}"),
        )
        out = (
            out.join(F.broadcast(b), w == F.col(f"_bl_w{s}"))
            .filter(F.col(f"_bl_b{s}").bitwiseAND(m) == m)
            .drop(f"_bl_w{s}", f"_bl_b{s}")
        )
    return out
