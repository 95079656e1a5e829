#!/usr/bin/env python
"""Round-11 probe: which part of gopher's SCAN stage costs?

Pieces, each forced with an un-prunable aggregate:
  split        — normalize + split to words
  starts-fold  — the aggregate() fold building word-start offsets
                 (suspected O(W^2): `acc.a || array(acc.p)` copies)
  en-zip       — zip_with end offsets
  explode      — the 9-way span struct explode (no substring)
  substring    — explode + gram substring cut
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
ALL_NS = (2, 3, 4, 5, 6, 7, 8, 9, 10)


def timeit(build, label, runs=3):
    build().collect()
    best = None
    for _ in range(runs):
        d = build()
        t0 = time.perf_counter()
        d.collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: best-of-{runs} {best:.3f}s")


def main():
    spark = get_spark("r11-gopher-scan", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def base():
        df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        return df.select(
            F.col("doc_id"),
            F.lower(collapse_whitespace(F.col("text"))).alias("t"),
        )

    starts = F.expr(
        "aggregate(split(t, ' '), "
        "struct(cast(1 as bigint) as p, cast(array() as array<bigint>) as a), "
        "(acc, x) -> struct(acc.p + length(x) + 1, acc.a || array(acc.p)), "
        "acc -> acc.a)"
    )

    timeit(
        lambda: base()
        .withColumn("ws", F.split("t", " "))
        .agg(F.sum(F.size("ws"))),
        "split only",
    )
    timeit(
        lambda: base()
        .withColumn("ws", F.split("t", " "))
        .withColumn("st", starts)
        .agg(F.sum(F.element_at("st", -1))),
        "split + starts fold",
    )
    timeit(
        lambda: base()
        .withColumn("ws", F.split("t", " "))
        .withColumn("st", starts)
        .withColumn("en", F.zip_with("st", "ws", lambda a, b: a + F.length(b) - 1))
        .agg(F.sum(F.element_at("en", -1))),
        "split + starts + en",
    )

    def spans(n):
        ln = F.greatest(F.col("nw") - F.lit(n) + 1, F.lit(0)).cast("int")
        return F.arrays_zip(
            F.array_repeat(F.lit(n).cast("int"), ln).alias("n"),
            F.slice("st", 1, ln).alias("s"),
            F.slice("en", n, ln).alias("e"),
        )

    def words():
        return (
            base()
            .withColumn("ws", F.split("t", " "))
            .withColumn("st", starts)
            .withColumn("nw", F.size("ws").cast("long"))
            .withColumn("en", F.zip_with("st", "ws", lambda a, b: a + F.length(b) - 1))
        )

    timeit(
        lambda: words()
        .select("doc_id", "t", F.explode(
            F.flatten(F.array(*[spans(n) for n in ALL_NS]))).alias("o"))
        .agg(F.sum("o.s"), F.sum("o.e"), F.count(F.lit(1))),
        "explode (no substring)",
    )
    timeit(
        lambda: words()
        .select("doc_id", "t", F.explode(
            F.flatten(F.array(*[spans(n) for n in ALL_NS]))).alias("o"))
        .select(F.expr("substring(t, o.s, o.e - o.s + 1)").alias("g"))
        .agg(F.sum(F.length("g")), F.count(F.lit(1))),
        "explode + substring",
    )
    spark.stop()


if __name__ == "__main__":
    main()
