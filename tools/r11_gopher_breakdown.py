#!/usr/bin/env python
"""Round-11 probe: stage breakdown of gopher_repetition at sf0.1.

Times progressively larger prefixes of the pipeline (each forced with a
full-width checksum so nothing prunes):
  occ      — explode of all (n, gram-span) rows + substring gram cut
  occ+cnt  — plus the per-(doc,n,gram) occurrence-count window
  top      — the top-gram branch alone
  dup      — the duplicate-coverage branch alone
  full     — the assembled query
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from real_estate_project1_etl_spark.session import get_spark  # noqa: E402
from real_estate_project1_etl_spark.functions.text import (  # noqa: E402
    collapse_whitespace,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def checksum(df):
    return (
        df.select(F.xxhash64(*df.columns).alias("_h"))
        .agg(F.count("_h"), F.sum("_h"))
        .collect()[0]
    )


def timeit(build, label, runs=3):
    checksum(build())  # warm
    best = None
    for _ in range(runs):
        d = build()
        t0 = time.perf_counter()
        checksum(d)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: best-of-{runs} {best:.3f}s")


def main():
    from pyspark.sql import Window

    spark = get_spark("r11-gopher-breakdown", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    top_ns, dup_ns = (2, 3, 4), (5, 6, 7, 8, 9, 10)
    all_ns = sorted(set(top_ns) | set(dup_ns))

    def occ_df():
        df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        base = df.select(
            F.col("doc_id"),
            F.lower(collapse_whitespace(F.col("text"))).alias("t"),
        ).withColumn("n_chars", F.length("t").cast("long"))
        starts = F.expr(
            "aggregate(split(t, ' '), "
            "struct(cast(1 as bigint) as p, cast(array() as array<bigint>) as a), "
            "(acc, x) -> struct(acc.p + length(x) + 1, acc.a || array(acc.p)), "
            "acc -> acc.a)"
        )
        words = (
            base.withColumn("ws", F.split(F.col("t"), " "))
            .withColumn("st", starts)
            .withColumn("nw", F.size("ws").cast("long"))
            .withColumn("en", F.zip_with("st", "ws", lambda a, b: a + F.length(b) - 1))
        )

        def spans_for(n):
            ln = F.greatest(F.col("nw") - F.lit(n) + 1, F.lit(0)).cast("int")
            return F.arrays_zip(
                F.array_repeat(F.lit(n).cast("int"), ln).alias("n"),
                F.slice("st", 1, ln).alias("s"),
                F.slice("en", n, ln).alias("e"),
            )

        return words.select(
            "doc_id",
            "n_chars",
            "t",
            F.explode(F.flatten(F.array(*[spans_for(n) for n in all_ns]))).alias("o"),
        ).select(
            "doc_id",
            "n_chars",
            F.col("o.n").alias("n"),
            F.expr("substring(t, o.s, o.e - o.s + 1)").alias("g"),
            F.col("o.s").alias("s"),
            F.col("o.e").alias("e"),
        )

    cnt_w = Window.partitionBy("doc_id", "n", "g")

    timeit(lambda: occ_df(), "occ (explode + substring)")
    timeit(
        lambda: occ_df().withColumn("cnt", F.count(F.lit(1)).over(cnt_w)),
        "occ + cnt window",
    )
    # groupBy-count variant of cnt: how much cheaper than the window?
    timeit(
        lambda: occ_df().groupBy("doc_id", "n", "g").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("s").alias("s0"),
        ),
        "occ -> groupBy(doc,n,g) count",
    )
    # hash the gram before the shuffle: does dropping the string help?
    timeit(
        lambda: occ_df()
        .withColumn("gh", F.xxhash64("g"))
        .drop("g", "t")
        .withColumn(
            "cnt",
            F.count(F.lit(1)).over(Window.partitionBy("doc_id", "n", "gh")),
        ),
        "occ(hash g) + cnt window",
    )
    spark.stop()


if __name__ == "__main__":
    main()
