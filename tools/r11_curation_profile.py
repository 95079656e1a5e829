#!/usr/bin/env python
"""Round-11 probe: stage costs of documents_curation_v2 at sf0.1.

Interleaved (same session) timings of cumulative prefixes:
  gate      — gopher gate (top2/dup5) -> surviving doc ids
  clean     — + strip_markup + scrub_pii projection
  surv      — + token gate + fingerprint first-wins + localCheckpoint
  despan    — + corpus ExactSubstr span removal + final join (= full)
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as em  # noqa: E402
from pyspark.sql import Window  # noqa: E402
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
    import real_estate_project1_etl_spark.operators.textstats as T
    from real_estate_project1_etl_spark.operators.textstats import (
        scrub_pii,
        strip_markup,
    )
    from __spark_entry__ import content_fingerprint
    from real_estate_project1_etl_spark.operators.dedup import (
        remove_repeated_spans,
    )

    spark = get_spark("r11-curation", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def docs():
        return em._t(spark, SF_DIR, "documents")

    def ok_ids():
        sig = T.gopher_repetition(docs(), top_ns=(2,), dup_ns=(5,))
        return sig.filter(
            (F.col("top_2gram_char_frac") <= 0.12)
            & (F.col("dup_5gram_char_frac") == 0.0)
        ).select("doc_id")

    timeit(lambda: ok_ids().count(), "gate (gopher top2/dup5)")

    def cleaned():
        return docs().join(ok_ids(), "doc_id").select(
            "doc_id", "lang", scrub_pii(strip_markup(F.col("text"))).alias("t")
        )

    timeit(
        lambda: cleaned().agg(F.sum(F.length("t"))).collect(),
        "+ strip/scrub projection",
    )

    def surv():
        feat = cleaned().select(
            "doc_id", "lang", "t",
            T.whitespace_token_count(F.col("t")).alias("n_tokens"),
            content_fingerprint(F.col("t")).alias("fp"),
        )
        w = Window.partitionBy("fp").orderBy("doc_id")
        return (
            feat.filter(F.col("n_tokens") >= 20)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "lang", "n_tokens", "t")
            .localCheckpoint(eager=True)
        )

    timeit(lambda: surv().count(), "+ gate/dedup/checkpoint (surv)")

    def full():
        s = surv()
        despan = remove_repeated_spans(s, "t", "doc_id", k=em._KGRAM_K)
        return s.select("doc_id", "lang", "n_tokens").join(
            despan, "doc_id"
        ).select(
            "doc_id", "lang", "n_tokens", "clean_text", "n_removed_chars"
        )

    def checksum(df):
        return df.select(F.xxhash64(*df.columns).alias("_h")).agg(
            F.count("_h"), F.sum("_h")
        ).collect()

    timeit(lambda: checksum(full()), "full (checksum action)")
    spark.stop()


if __name__ == "__main__":
    main()
