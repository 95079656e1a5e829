#!/usr/bin/env python
"""Round-11 probe: is gopher_repetition_signals' count() action
elimination-prone (the round-9 "count() can lie" failure mode)?

Times the query at $SPARK_GRAFT_SF_DIR under (a) plain count() and
(b) the full-width xxhash64 checksum aggregate bench.py uses for
ELIMINATION_PRONE queries, and prints whether the physical plan under
count() still contains the gram explode.
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


def main():
    spark = get_spark("r11-probe", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    q = entry_mod.queries()["gopher_repetition_signals"]

    # plan under count(): does Generate (the explode) survive?
    df = q(spark, SF_DIR)
    cnt_plan = df.groupBy().count()._jdf.queryExecution().executedPlan().toString()
    has_generate = "Generate" in cnt_plan
    print(f"count()-plan contains Generate/explode: {has_generate}")

    def t(action, label):
        best = None
        for _ in range(3):
            d = q(spark, SF_DIR)
            t0 = time.perf_counter()
            action(d)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: best-of-3 {best:.3f}s")
        return best

    # warmup
    q(spark, SF_DIR).count()
    q(spark, SF_DIR).select(F.xxhash64(*df.columns).alias("_h")).agg(
        F.count("_h"), F.sum("_h")
    ).collect()

    t(lambda d: d.count(), "count()")
    t(
        lambda d: d.select(F.xxhash64(*d.columns).alias("_h"))
        .agg(F.count("_h"), F.sum("_h"))
        .collect(),
        "xxhash64 checksum",
    )
    spark.stop()


if __name__ == "__main__":
    main()
