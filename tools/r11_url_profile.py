#!/usr/bin/env python
"""Round-11 probe: where does url_canonical_dedup's time go at sf0.1?

Pieces: corpus scan + messy-URL mint, + canonicalize, + groupBy agg,
+ localCheckpoint, full query.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from real_estate_project1_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timeit(build, label, runs=3):
    build()
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        build()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: best-of-{runs} {best:.3f}s")


def main():
    spark = get_spark("r11-url", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from real_estate_project1_etl_spark.functions.psl_data import (
        DEFAULT_PSL_RULES,
    )
    from real_estate_project1_etl_spark.functions.web import (
        canonicalize_url,
        registrable_domain_psl,
        url_hostport,
    )

    q = entry_mod.queries()["url_canonical_dedup"]
    timeit(lambda: q(spark, SF_DIR).count(), "full query")

    # reconstruct the messy column the same way the query does
    import inspect

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id"
    )
    p = (F.col("doc_id") % 150).cast("string")
    d = ((F.col("doc_id") % 150) % 20).cast("string")
    ids = F.col("doc_id").cast("string")
    v = F.col("doc_id") % 6
    messy = (
        F.when(v == 0, F.concat(F.lit("https://WWW.Src"), d,
               F.lit(".Example.COM:443/%7Eu/a//b"), p,
               F.lit("/?utm_source=feed&id="), p, F.lit("#top")))
        .when(v == 1, F.concat(F.lit("https://www.src"), d,
              F.lit(".example.com/~u/a/b"), p, F.lit("?id="), p,
              F.lit("&utm_campaign=x")))
        .when(v == 2, F.concat(F.lit("HTTPS://www.SRC"), d,
              F.lit(".example.com/%7eu/a/b"), p, F.lit("/?fbclid=z"), ids,
              F.lit("&id="), p))
        .when(v == 3, F.concat(F.lit("https://www.src"), d,
              F.lit(".example.com:443/a/b"), p, F.lit("#f?gclid=1&id="), ids))
        .when(v == 4, F.concat(F.lit("//WWW.src"), d,
              F.lit(".example.com/%7Eu/a//b"), p, F.lit("/?id="), p,
              F.lit("&utm_z=1#frag")))
        .otherwise(F.concat(F.lit("https://www.src"), d,
                   F.lit(".example.com:443/a/b"), p, F.lit("%2f?id="), p))
    )

    timeit(lambda: docs.select(messy.alias("m")).agg(
        F.sum(F.length("m"))).collect(), "scan + mint")
    timeit(lambda: docs.select(canonicalize_url(messy).alias("c")).agg(
        F.sum(F.length("c"))).collect(), "scan + mint + canonicalize")

    def agg_df():
        return (
            docs.withColumn("canon", canonicalize_url(messy))
            .groupBy("canon")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("first_doc"))
        )

    timeit(lambda: agg_df().count(), "+ groupBy agg")
    timeit(
        lambda: agg_df()
        .withColumn("__host", url_hostport(F.col("canon")))
        .localCheckpoint()
        .count(),
        "+ localCheckpoint",
    )

    def full():
        agg = (
            agg_df()
            .withColumn("__host", url_hostport(F.col("canon")))
            .localCheckpoint()
        )
        return registrable_domain_psl(
            agg, "__host", list(DEFAULT_PSL_RULES)
        ).select("canon", "domain", "n_docs", "first_doc").count()

    timeit(full, "+ registrable_domain_psl")
    spark.stop()


if __name__ == "__main__":
    main()
