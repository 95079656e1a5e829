#!/usr/bin/env python
"""PSL-join scale probe (round-5 verdict item 4): prove rule count and
host cardinality don't bend registrable_domain_psl's cost curve.

Sweeps {rule set: vendored 377 vs synthetic full-scale 9000} x
{distinct hosts: 100k, 1M} on synthetic hosts whose shapes mirror a real
crawl's distinct-host table (2-5 labels, known multi-part registries,
wildcard/exception neighborhoods, unknown TLDs), and reports per config:

- wall-clock of the full operator (candidate explode -> broadcast rule
  join -> winner reduction -> host->domain map attach) to a count sink,
- candidate-volume = melted rows entering the rule join
  (2 spellings x labels per host — measured, not estimated),
- broadcast payload = serialized rule-table bytes (sum of rule lengths),
- distinct output domains (sanity that matching actually happened).

Run: python tools/psl_scale_probe.py [n_hosts ...]   (default 100000 1000000)
Prints one JSON line per (rules, n_hosts) config; the measured entry
lives in SCALE.md under "Web/URL operators at scale".
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")

from real_estate_project1_etl_spark.functions.psl_data import (  # noqa: E402
    DEFAULT_PSL_RULES,
    synth_full_psl,
)
from real_estate_project1_etl_spark.functions.web import (  # noqa: E402
    registrable_domain_psl,
)

# suffix mix: flat TLDs, multi-part registries, wildcard and exception
# neighborhoods, platform suffixes, and unknown TLDs (default rule)
_SUFFIXES = [
    "com", "org", "de", "co.uk", "com.au", "co.jp", "tmall.com.cn",
    "kawasaki.jp", "city.kawasaki.jp", "www.ck", "b.kobe.ck",
    "blogspot.com", "github.io", "compute.amazonaws.com",
    "nsw.edu.au", "unknowntld", "internal", "co.in", "com.br", "io",
]


def _hosts(spark: SparkSession, n: int):
    ids = spark.range(n)
    sfx = F.element_at(
        F.array(*[F.lit(s) for s in _SUFFIXES]),
        (F.col("id") % len(_SUFFIXES) + 1).cast("int"),
    )
    extra = (
        F.when(F.col("id") % 7 == 0, F.lit("a.b."))
        .when(F.col("id") % 7 == 1, F.lit("deep.x."))
        .otherwise(F.lit(""))
    )
    return ids.select(
        F.concat(
            extra, F.lit("h"), F.col("id").cast("string"), F.lit("."), sfx
        ).alias("h")
    )


def probe(spark: SparkSession, n_hosts: int, rules, label: str) -> dict:
    df = _hosts(spark, n_hosts)
    # candidate volume: 2 melted spellings per label position per host
    cand = df.select(
        (F.size(F.split(F.col("h"), r"\.")) * 2).alias("c")
    ).agg(F.sum("c")).collect()[0][0]
    walls = []
    for _ in range(2):  # cold (plan+codegen+broadcast) then warm
        t0 = time.time()
        out = registrable_domain_psl(df, "h", list(rules))
        got = out.agg(
            F.count("domain").alias("n"),
            F.countDistinct("domain").alias("nd"),
        ).collect()[0]
        walls.append(round(time.time() - t0, 2))
    return {
        "config": label,
        "n_hosts": n_hosts,
        "n_rules": len(rules),
        "wall_sec_cold": walls[0],
        "wall_sec_warm": walls[1],
        "candidate_rows": int(cand),
        "broadcast_rule_bytes": sum(len(r) for r in rules),
        "rows_with_domain": int(got["n"]),
        "distinct_domains": int(got["nd"]),
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    full = synth_full_psl(9000)
    for n in sizes:
        for rules, label in [
            (DEFAULT_PSL_RULES, "vendored377"),
            (full, "synthfull9000"),
        ]:
            print(json.dumps(probe(spark, n, rules, label)), flush=True)


if __name__ == "__main__":
    main()
