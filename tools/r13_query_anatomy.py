"""Round-13 optimization: per-query execution anatomy.

A declared query can run MANY SQL executions inside one bench sample
(eager localCheckpoints, training-loop collects, session-cache builds).
This tool times one warm sample and lists every execution the
statusStore recorded during it — id, wall ms, and the first line of its
description — so the sample decomposes into its real components.

Run: python tools/r13_query_anatomy.py <query> [query...]
     ($SPARK_GRAFT_SF_DIR for the data dir; REPS=n for timed reps)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def executions(store):
    out = {}
    it = store.executionsList().iterator()
    while it.hasNext():
        e = it.next()
        out[e.executionId()] = e
    return out


def main() -> None:
    names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "1"))

    import bench
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from real_estate_project1_etl_spark.session import get_spark

    spark = get_spark(
        "r13-anatomy", cpus=32, shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    store = spark._jsparkSession.sharedState().statusStore()
    qs = entry.queries()

    def consume(df, use_checksum):
        if use_checksum:
            return df.select(F.xxhash64(*df.columns).alias("_h")).agg(
                F.count("_h"), F.sum("_h")).collect()[0][0]
        return df.count()

    for name in names:
        df = qs[name](spark, sf)
        use_checksum = bench._count_prunes(df)
        consume(df, use_checksum)  # warm (rest of chain)
        for rep in range(reps):
            before = set(executions(store).keys())
            t0 = time.perf_counter()
            consume(qs[name](spark, sf), use_checksum)
            wall = time.perf_counter() - t0
            after = executions(store)
            new = sorted(set(after.keys()) - before)
            print(f"\n== {name} rep {rep+1}: wall {wall:.3f}s, "
                  f"{len(new)} executions "
                  f"(action={'checksum' if use_checksum else 'count'})")
            tot = 0.0
            for eid in new:
                e = after[eid]
                sub = e.submissionTime()
                comp = e.completionTime()
                ms = (comp.get().getTime() - sub) if comp.isDefined() else -1
                tot += max(ms, 0) / 1000.0
                desc = str(e.description()).split("\n")[0][:100]
                print(f"   exec {eid}: {ms/1000.0:7.3f}s  {desc}")
            print(f"   sum of execution walls: {tot:.3f}s "
                  f"(gaps = driver-side work)")


if __name__ == "__main__":
    main()
