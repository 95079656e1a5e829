"""Round-12 verdict item 2: exchange-count audit for the corpus builds.

Counts executed-plan nodes (Exchange vs ReusedExchange, parquet scans,
Generate/explode, Window, aggregates) for documents_corpus_build_v4 and
v5, plus interleaved wall-times — the method that caught the x10 subtree
re-execution in the triangles query. A subtree that shows up as N
Exchanges with no ReusedExchange, or N scans of one table, is executing
N times.

Note v5's BPE training runs ITERATIVE driver-side jobs (batched merge
rounds) whose plans never appear in the final returned plan — the node
counts below cover the final plan only; training cost shows in the wall
time. Run: python tools/r12_exchange_audit.py [sf_dir]
"""
from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NODE_PATTERNS = {
    "Exchange": re.compile(r"^\s*[+:*-]*\s*Exchange ", re.M),
    "ReusedExchange": re.compile(r"ReusedExchange", re.M),
    "Scan parquet": re.compile(r"Scan parquet", re.M),
    "Generate/explode": re.compile(r"Generate explode", re.M),
    "Window": re.compile(r"^\s*[+:*-]*\s*Window ", re.M),
    "WindowGroupLimit": re.compile(r"WindowGroupLimit", re.M),
    "HashAggregate": re.compile(r"HashAggregate", re.M),
    "SortMergeJoin": re.compile(r"SortMergeJoin", re.M),
    "BroadcastHashJoin": re.compile(r"BroadcastHashJoin", re.M),
    "BatchEvalPython": re.compile(r"BatchEvalPython|ArrowEvalPython", re.M),
}


def audit(spark, fn, sf: str, label: str, reps: int = 3) -> None:
    df = fn(spark, sf)
    df.count()  # warm + finalize AQE plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = {k: len(p.findall(plan)) for k, p in NODE_PATTERNS.items()}
    ts = []
    for _ in range(reps):
        t0 = time.time()
        n = fn(spark, sf).count()
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"\n== {label}: {n} rows, median {med:.2f}s "
          f"(min {min(ts):.2f} max {max(ts):.2f})")
    for k, v in counts.items():
        if v:
            print(f"   {k}: {v}")
    tables = sorted(set(re.findall(r"Scan parquet [^\s\[]*\.?(\w+)", plan)))
    if tables:
        print(f"   scanned tables: {tables}")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as entry
    from real_estate_project1_etl_spark.session import get_spark

    spark = get_spark(
        "r12-exchange-audit",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry.queries()
    for name in sys.argv[2:] or (
        "documents_corpus_build_v4",
        "documents_corpus_build_v5",
    ):
        audit(spark, qs[name], sf, name)


if __name__ == "__main__":
    main()
