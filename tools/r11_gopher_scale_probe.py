#!/usr/bin/env python
"""Round-11 scale probe for the string-free gopher battery.

1. Corpus scale: 1x vs 10x the sf0.1 documents corpus — wall time
   should scale ~linearly (the battery is scan + per-doc windows +
   gram-key aggs; nothing super-linear).
2. Long-document hazard: a single 100k-word document through (a) the
   NEW window running-sum offset path and (b) the OLD in-row
   ``aggregate`` fold (reconstructed inline), which copies the offset
   accumulator array per word = O(W^2).  This is the failure mode the
   round-11 rewrite removed — on 100 TB corpora single pathological
   documents (concatenated logs, minified dumps) are routine.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from real_estate_project1_etl_spark.operators.textstats import (  # noqa: E402
    gopher_repetition,
)
from real_estate_project1_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def checksum(df):
    return (
        df.select(F.xxhash64(*df.columns).alias("_h"))
        .agg(F.count("_h"), F.sum("_h"))
        .collect()[0]
    )


def main():
    spark = get_spark("r11-gopher-scale", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )

    # --- 1. 1x vs 10x corpus -------------------------------------------
    big = docs.crossJoin(
        spark.range(10).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("doc_id") * 10 + F.col("_rep")).alias("doc_id"), "text"
    )
    big.write.mode("overwrite").parquet("/tmp/r11_gopher_10x")
    big = spark.read.parquet("/tmp/r11_gopher_10x")

    for label, d in (("1x", docs), ("10x", big)):
        checksum(gopher_repetition(d))  # warm
        t0 = time.time()
        checksum(gopher_repetition(d))
        print(f"gopher {label} ({d.count()} docs): {time.time() - t0:.1f}s")

    # --- 2. long-document hazard ----------------------------------------
    for n_words in (20_000, 60_000):
        long_doc = spark.range(1).select(
            F.lit(0).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_words)),
                    lambda i: F.concat(F.lit("w"), (i % 977).cast("string")),
                ),
            ).alias("text"),
        ).localCheckpoint()

        t0 = time.time()
        checksum(gopher_repetition(long_doc))
        new_s = time.time() - t0

        # the OLD offset construction: in-row aggregate fold with
        # array-append accumulator (O(W^2) copies) — timed on the fold
        # alone (the cheapest part of the old path that still shows the
        # blowup)
        starts = F.expr(
            "aggregate(split(t, ' '), "
            "struct(cast(1 as bigint) as p, cast(array() as array<bigint>) as a), "
            "(acc, x) -> struct(acc.p + length(x) + 1, acc.a || array(acc.p)), "
            "acc -> acc.a)"
        )
        t0 = time.time()
        long_doc.select(F.lower(F.col("text")).alias("t")).select(
            F.element_at(starts, -1)
        ).collect()
        old_s = time.time() - t0
        print(
            f"single {n_words}-word doc: NEW full battery {new_s:.1f}s; "
            f"OLD offset fold alone {old_s:.1f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
