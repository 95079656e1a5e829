"""Round-12 continuation: interleaved round-robin profile of the heavy
headline queries on a freshly-rebooted idle host.

Method (the only one the verdicts accept): warm every query once, decide
the honest action per query exactly as bench.py does (checksum when
count() prunes Join/Generate/Window), then time all queries ROUND-ROBIN
for R rounds so ambient drift hits every query equally. Prints median +
min/max per query plus executed-plan node counts for the slowest.

Run: python tools/r12_heavy_profile.py [sf_dir] [query ...]
"""
from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "copurchase_triangles",
    "documents_curation_v2",
    "incremental_classifier_weights",
    "prefix_filter_jaccard_pairs",
    "quality_canonical_docs",
    "ivfpq_adc_topk",
    "incremental_dedup_docs",
    "documents_corpus_build_v5",
]

NODE_PATTERNS = {
    "Exchange": re.compile(r"^\s*[+:*-]*\s*Exchange ", re.M),
    "ReusedExchange": re.compile(r"ReusedExchange", re.M),
    "Scan parquet": re.compile(r"Scan parquet", re.M),
    "Generate": re.compile(r"Generate ", re.M),
    "Window": re.compile(r"^\s*[+:*-]*\s*Window ", re.M),
    "HashAggregate": re.compile(r"HashAggregate", re.M),
    "SortMergeJoin": re.compile(r"SortMergeJoin", re.M),
    "BroadcastHashJoin": re.compile(r"BroadcastHashJoin", re.M),
    "ArrowEval": re.compile(r"BatchEvalPython|ArrowEvalPython|FlatMapsInPandas|MapInPandas|FlatMapGroupsInPandas", re.M),
}


def main() -> None:
    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if not os.path.isdir(a)] or DEFAULT
    rounds = int(os.environ.get("PROFILE_ROUNDS", "5"))

    import bench  # reuse _count_prunes
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from real_estate_project1_etl_spark.session import get_spark

    spark = get_spark(
        "r12-heavy-profile", cpus=32, shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    checksum = {}

    def consume(df, name):
        if checksum[name]:
            return df.select(F.xxhash64(*df.columns).alias("_h")).agg(
                F.count("_h"), F.sum("_h")).collect()[0][0]
        return df.count()

    plans = {}
    for name in names:
        df = qs[name](spark, sf)
        checksum[name] = bench._count_prunes(df)
        t0 = time.perf_counter()
        consume(df, name)
        print(f"# warm {name}: {time.perf_counter()-t0:.2f}s "
              f"action={'checksum' if checksum[name] else 'count'}",
              file=sys.stderr)
        plans[name] = df._jdf.queryExecution().executedPlan().toString()

    samples = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            t0 = time.perf_counter()
            consume(qs[name](spark, sf), name)
            samples[name].append(time.perf_counter() - t0)
        print(f"# round {r+1}/{rounds} loadavg={os.getloadavg()[0]:.1f}",
              file=sys.stderr)

    print(f"\n{'query':38s} {'median':>7s} {'min':>7s} {'max':>7s}  action")
    for name in sorted(names, key=lambda n: -sorted(samples[n])[rounds // 2]):
        s = sorted(samples[name])
        print(f"{name:38s} {s[rounds//2]:7.2f} {s[0]:7.2f} {s[-1]:7.2f}  "
              f"{'checksum' if checksum[name] else 'count'}")
        counts = {k: len(p.findall(plans[name]))
                  for k, p in NODE_PATTERNS.items()}
        print("   " + "  ".join(f"{k}={v}" for k, v in counts.items() if v))


if __name__ == "__main__":
    main()
