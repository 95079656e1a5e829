"""Round-12: executed-plan metrics audit for the DSIR query (the NOTES
rule: audit with METRICS via statusStore, not plan strings — AQE's
toString double-prints stage subtrees).  Prints every Generate/Scan/
Exchange node of the execution with its actual output rows, so a
re-executed tokenize subtree shows up as N nodes with identical rows.

Run: python tools/r12_dsir_plan_audit.py [sf_dir] [query]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _parse_metric(s: str) -> int:
    # "1,234" or "total (min, med, max)\n1,234 (..)" forms
    head = s.split("\n")[0].split("(")[0].strip().replace(",", "")
    try:
        return int(head)
    except ValueError:
        return -1


def node_rows(store, eids, want=("Generate", "Scan parquet", "Exchange",
                                 "HashAggregate", "Join")):
    out = []
    for eid in sorted(eids):
        try:
            graph = store.planGraph(eid)
            metrics = store.executionMetrics(eid)
        except Exception:
            continue
        nodes = graph.allNodes()
        for i in range(nodes.size()):
            node = nodes.apply(i)
            name = node.name()
            if not any(w in name for w in want):
                continue
            rows = None
            ms = node.metrics()
            for j in range(ms.size()):
                met = ms.apply(j)
                if met.name() == "number of output rows":
                    v = metrics.get(met.accumulatorId())
                    if v.isDefined():
                        rows = _parse_metric(v.get())
            out.append((name, rows))
    return out


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    qname = sys.argv[2] if len(sys.argv) > 2 else "dsir_importance_weights"
    import __spark_entry__ as entry
    from real_estate_project1_etl_spark.session import get_spark

    spark = get_spark(
        "r12-dsir-audit", cpus=8, shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    store = spark._jsparkSession.sharedState().statusStore()

    def eids():
        out, it = set(), store.executionsList().iterator()
        while it.hasNext():
            out.add(it.next().executionId())
        return out

    from pyspark.sql import functions as F

    before = eids()
    t0 = time.time()
    df = entry.queries()[qname](spark, sf)
    # full-width checksum action — count() would let Catalyst eliminate
    # the scored subtree entirely (the bench.py honesty lesson)
    n = df.select(F.xxhash64(*df.columns).alias("_h")).agg(
        F.count("_h"), F.sum("_h")).collect()[0][0]
    dt = time.time() - t0
    print(f"{qname}: {n} rows in {dt:.2f}s")
    from collections import Counter
    rows = node_rows(store, eids() - before)
    c = Counter(rows)
    for (name, r), k in sorted(c.items()):
        print(f"  x{k}  {name:<60s} rows={r}")


if __name__ == "__main__":
    main()
