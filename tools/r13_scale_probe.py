#!/usr/bin/env python
"""Round-13 verdict item 4: 100x spot-gate for the round-12 families —
quantile-sketch rollup, component-atomic split, grouped AUC — at ~100x
the sf0.1 row counts (synthetic replication, the similarity-gate
method).

Each family's scale claim is that the post-scan state is BOUNDED:
<=63 sketch cells per rollup group, a label table that never exceeds
the near-dup component membership, and a distinct-(group, score) table
that is Zipf-bounded regardless of row count. The probe runs a
1x / 10x / 100x ladder of sf0.1-shaped synthetic data, timing the
honest checksum action and printing the dominant-stage row count next
to the wall so sub-linearity is measured, not asserted.

Usage: python tools/r13_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from real_estate_project1_etl_spark.session import get_spark  # noqa: E402


def checksum(df):
    cols = [F.xxhash64(F.col(c).cast("string")) for c in df.columns]
    df.select(F.sum(sum(cols[1:], cols[0]))).collect()


def timeit(df, runs=3):
    checksum(df)  # warm
    ts = []
    for _ in range(runs):
        t0 = time.time()
        checksum(df)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    from real_estate_project1_etl_spark.operators.evalmetrics import (
        grouped_auc_ppm,
    )
    from real_estate_project1_etl_spark.operators.quality import (
        component_atomic_split,
        split_leakage_count,
    )
    from real_estate_project1_etl_spark.operators.sketch import (
        hist_merge_quantiles,
        log2_hist_sketch,
    )

    spark = get_spark(
        "r13-probe", cpus=32, shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. daily->monthly quantile-sketch rollup (sf0.1 orders = 150k) --
    print("== log2-hist daily->monthly rollup (base = sf0.1 orders 150k) ==",
          flush=True)
    for mult in (1, 10, 100):
        n = 150_000 * mult
        # ~7 years of days, cents heavy-tailed like o_totalprice
        facts = spark.range(n).select(
            F.concat(
                F.lit("199"),
                (F.col("id") % 7).cast("string"), F.lit("-"),
                F.lpad(((F.col("id") % 12) + 1).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad(((F.col("id") % 28) + 1).cast("string"), 2, "0"),
            ).alias("day"),
            (F.abs(F.xxhash64("id")) % 50_000_000 + 100).alias("cents"),
        )
        daily = log2_hist_sketch(facts, ["day"], "cents")
        monthly = hist_merge_quantiles(
            daily.select(F.substring("day", 1, 7).alias("month"),
                         "bucket", "cnt"),
            ["month"],
        )
        t = timeit(monthly)
        cells = daily.count()
        print(f"  facts={n:>12,}: {t:6.2f}s  sketch cells={cells:,} "
              f"(months=84, <=63 cells each)", flush=True)

    # -- 2. component-atomic split + leakage audit (sf0.1 docs = 5k) --
    print("== component-atomic split + audit (base = sf0.1 docs 5k) ==",
          flush=True)
    for mult in (1, 10, 100):
        n = 5_000 * mult
        ids = spark.range(n).select(F.col("id").alias("doc_id"))
        # ~8% of docs sit in near-dup components of size 2-5 (the sf0.1
        # minhash shape); component rep = the lowest member id
        m = n // 25  # number of components
        labels = (
            spark.range(m)
            .select(
                F.col("id").alias("comp0"),
                (F.abs(F.xxhash64("id")) % 4 + 2).alias("sz"),
            )
            .select(
                "comp0",
                F.explode(F.sequence(F.lit(0), F.col("sz") - 1)).alias("k"),
            )
            .select(
                (F.col("comp0") * 25 + F.col("k")).alias("id"),
                (F.col("comp0") * 25).alias("comp"),
            )
            .filter(F.col("id") < n)
        )
        pairs = (
            labels.alias("a")
            .join(labels.alias("b"), "comp")
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
        sp = component_atomic_split(ids, labels, 1 << 59)
        audit = split_leakage_count(pairs, sp)
        t0 = time.time()
        row = audit.collect()[0]
        t = time.time() - t0
        nl = labels.count()
        assert row["leaked_pairs"] == 0, row
        print(f"  ids={n:>12,}: {t:6.2f}s  labels={nl:,} leaked=0 "
              f"(split hash is scan-stage; audit joins are id-keyed)",
              flush=True)

    # -- 3. grouped AUC (base = sf0.1 gate slice 5k docs, 12 langs) --
    print("== grouped AUC by lang (base = sf0.1 gate slice 5k) ==",
          flush=True)
    for mult in (1, 10, 100):
        n = 5_000 * mult
        df = spark.range(n).select(
            F.concat(F.lit("l"), (F.abs(F.xxhash64("id")) % 12)
                     .cast("string")).alias("lang"),
            # Zipf-bounded integer scores: the distinct-(lang, score)
            # table is what the rank sweep windows over
            (F.xxhash64("id", F.lit("s")) % 4001 - 2000).alias("s"),
            (F.abs(F.xxhash64("id", F.lit("y"))) % 3 > 0)
            .cast("int").alias("y"),
        )
        auc = grouped_auc_ppm(df, ["lang"], score_col="s", label_col="y")
        t = timeit(auc)
        nd = df.select("lang", "s").distinct().count()
        print(f"  rows={n:>11,}: {t:6.2f}s  distinct (lang,score)={nd:,}",
              flush=True)


def kmeans_ladder(spark):
    # -- 4. integer Lloyd k-means (base = sf0.1 embeddings 2k x 64d) --
    from real_estate_project1_etl_spark.operators.clustering import (
        kmeans_quantized,
    )

    print("== k-means 8 cells x 3 iters (base = sf0.1 embeddings 2k) ==",
          flush=True)
    for mult in (1, 10, 100):
        n = 2_000 * mult
        cols = [
            (
                (F.abs(F.xxhash64("id", F.lit(str(i)))) % 2001)
                .cast("double") / 1000.0 - 1.0
            ).alias(f"x{i}")
            for i in range(64)
        ]
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
        )
        t0 = time.time()
        assign, _ = kmeans_quantized(emb, k=8, n_iters=3)
        n_out = assign.count()
        t = time.time() - t0
        print(f"  vectors={n:>9,}: {t:6.2f}s end-to-end "
              f"(assignments={n_out:,}; per-iter state = 8x64 ints)",
              flush=True)


if __name__ == "__main__":
    main()
    from real_estate_project1_etl_spark.session import get_spark as _gs

    kmeans_ladder(_gs("r13-probe", cpus=32, shuffle_partitions=32))
