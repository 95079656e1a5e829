#!/usr/bin/env python
"""Driver-contract simulation: smoke + side-by-side DuckDB oracle compare.

Replicates the grading driver: run ``entry(spark)`` (smoke), then every
``queries()`` entry against ``oracle_sql()`` on the same parquet tables,
comparing sorted column names + the multiset of stringified rows
(NaN/None -> "NULL"). Exit code 0 iff everything matches.

Usage: python tools/driver_sim.py [sf_dir] [name_substr ...]
(default sf_dir /root/testdata/sf0.01; optional substrings restrict the run
to matching query names — fast single-query oracle checks while iterating)
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        # STRICT stringification: floats keep their float form ("5.0", not
        # "5") so int-vs-float dtype drift between Spark and DuckDB is caught
        # here before the (format-sensitive) grading driver sees it.  DuckDB
        # sum(integer) returns HUGEINT -> pandas float64, while Spark's sum
        # of ints is bigint -> int64; without strict mode that divergence is
        # invisible (bit us: event_sessionization, CORRECTNESS_r01).
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            return repr(v)
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return cols, rows


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filters = sys.argv[2:]

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    assert len(mod.entry(spark).collect()) > 0, "smoke: entry() returned 0 rows"
    print("SMOKE OK")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = mod.queries(), mod.oracle_sql()
    if name_filters:
        queries = {
            n: q for n, q in queries.items()
            if any(f in n for f in name_filters)
        }
        oracles = {n: o for n, o in oracles.items() if n in queries}
        if not queries:
            # a typo'd filter must not report success having run nothing
            print(f"RESULT: FAIL no query matches filters {name_filters}")
            return 1
    bad: list[str] = []
    t0 = time.time()
    for name in sorted(queries):
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            if name in oracles:
                ddf = con.execute(oracles[name]).df()
                if canon(sdf) != canon(ddf):
                    bad.append(name)
                    print(f"MISMATCH {name}")
        except Exception as exc:  # noqa: BLE001 — report and continue
            bad.append(name)
            print(f"EXC {name}: {str(exc)[:200]}")
    print(
        f"{len(queries)} queries, {len(oracles)} oracles, "
        f"{time.time() - t0:.1f}s @ {sf_dir}"
    )
    print("RESULT:", "FAIL " + ",".join(bad) if bad else "ALL MATCH")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
