#!/usr/bin/env python
"""Round-12 fresh-seed differential sweep (the round-8+ discipline):
re-run every fuzz family's generator on seed ranges NEVER used by the
committed test suite, engine vs DuckDB (or vs the python training
models), exact compare.  Zero divergences expected; any failure prints
the seed + generated case for a permanent regression test.

Ranges (all disjoint from the suites' range(N) and from every prior
sweep recorded in NOTES.md, incl. r11's):
  relational 5000-5899, window 2100-2499, nulls 1900-2299,
  text 2100-2499, numeric 1700-1999, datetime 1500-1799,
  training(bpe batched) 1000-1099

An integer argv[1] OFFSET shifts every range (third-session sweep used
OFFSET=900 -> relational 5900-6799 etc.), keeping each re-sweep on
seeds disjoint from all committed suites and prior sweeps.
"""
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from real_estate_project1_etl_spark.session import get_spark  # noqa: E402
from real_estate_project1_etl_spark.sources.parquet import load_table  # noqa: E402
from tools.driver_sim import canon  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main():
    offset = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    spark = get_spark("r12-fuzz-sweep", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    failures = []

    def check(family, seed, fn):
        try:
            fn()
        except AssertionError as exc:
            failures.append((family, seed, str(exc)[:500]))
            print(f"DIVERGENCE {family} seed={seed}", flush=True)
        except Exception:
            failures.append((family, seed, traceback.format_exc()[-500:]))
            print(f"ERROR {family} seed={seed}", flush=True)

    # --- relational ---------------------------------------------------
    import test_fuzz_relational as tfr

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    for seed in range(5000 + offset, 5900 + offset):
        def _r():
            build, sql = tfr._gen_case(seed)
            assert canon(build(spark, li, orders).toPandas()) == canon(
                con.execute(sql).df()
            ), sql
        check("relational", seed, _r)
    print("relational sweep done", flush=True)

    # --- window --------------------------------------------------------
    import test_fuzz_window as tfw

    for seed in range(2100 + offset, 2500 + offset):
        def _w():
            build, sql = tfw._gen_case(seed)
            assert canon(build(li).toPandas()) == canon(
                con.execute(sql).df()
            ), sql
        check("window", seed, _w)
    print("window sweep done", flush=True)

    # --- numeric -------------------------------------------------------
    import test_fuzz_numeric as tfn

    for seed in range(1700 + offset, 2000 + offset):
        def _n():
            s_expr, d_expr = tfn._gen_case(seed)
            s = canon(
                li.select(
                    "l_orderkey", "l_linenumber",
                    F.expr(s_expr).cast("bigint").alias("v"),
                ).toPandas()
            )
            o = canon(
                con.execute(
                    f"SELECT l_orderkey, l_linenumber, cast({d_expr} AS bigint)"
                    " AS v FROM lineitem"
                ).df()
            )
            assert s == o, s_expr
        check("numeric", seed, _n)
    print("numeric sweep done", flush=True)
    con.close()

    # --- nulls (self-contained per seed) --------------------------------
    import random

    import test_fuzz_nulls as tfnl

    for seed in range(1900 + offset, 2300 + offset):
        def _nl():
            rng = random.Random(10_000 + seed)
            c2 = duckdb.connect()
            try:
                t, u = tfnl._mk_tables(rng, spark, c2)
                build, sql = tfnl._gen_case(rng)
                assert canon(build(t, u).toPandas()) == canon(
                    c2.execute(sql).df()
                ), sql
            finally:
                c2.close()
        check("nulls", seed, _nl)
    print("nulls sweep done", flush=True)

    # --- text ----------------------------------------------------------
    import test_fuzz_text as tft

    cd = duckdb.connect()
    cd.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    docs = load_table(spark, SF_DIR, "documents")
    for seed in range(2100 + offset, 2500 + offset):
        def _t():
            spark_e, sql_e = tft._gen_expr(seed)
            s = canon(
                docs.select("doc_id", F.expr(spark_e).alias("v")).toPandas()
            )
            o = canon(
                cd.execute(f"SELECT doc_id, {sql_e} AS v FROM documents").df()
            )
            assert s == o, f"{spark_e} vs {sql_e}"
        check("text", seed, _t)
    cd.close()
    print("text sweep done", flush=True)

    # --- datetime --------------------------------------------------------
    import test_fuzz_datetime as tfd

    ce = duckdb.connect()
    ce.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    events = load_table(spark, SF_DIR, "events")
    for seed in range(1500 + offset, 1800 + offset):
        def _d():
            spark_e, sql_e = tfd._gen_expr(seed)
            s = canon(
                events.select("event_id", F.expr(spark_e).alias("v")).toPandas()
            )
            o = canon(
                ce.execute(f"SELECT event_id, {sql_e} AS v FROM events").df()
            )
            assert s == o, f"{spark_e} vs {sql_e}"
        check("datetime", seed, _d)
    ce.close()
    print("datetime sweep done", flush=True)

    # --- training (batched BPE + classifier, fresh seeds) ----------------
    import test_fuzz_training as tftr
    from test_properties import _ref_bpe_train_batched

    from real_estate_project1_etl_spark.operators.textstats import (
        bpe_train_merges_batched,
    )

    for seed in range(1000 + offset, 1100 + offset):
        def _b():
            rng = random.Random(50_000 + seed)
            dd = tftr._random_corpus(rng)
            n_merges = rng.randint(2, 14)
            bs = rng.randint(1, 5)
            rule = rng.choice(["blocking", "greedy"])
            want = _ref_bpe_train_batched(
                [t for _, t in dd], n_merges, bs, accept_rule=rule
            )
            df = spark.createDataFrame(dd, "doc_id long, text string")
            got = [
                (r["rank"], r["round"], r["left"], r["right"], r["pair_count"])
                for r in bpe_train_merges_batched(
                    df, n_merges, batch_size=bs, checkpoint_every=2,
                    accept_rule=rule,
                ).orderBy("rank").collect()
            ]
            assert got == want, (n_merges, bs, rule)
        check("bpe_batched", seed, _b)
    print("training sweep done", flush=True)

    total = 900 + 400 + 300 + 400 + 400 + 300 + 100
    print(f"SWEEP COMPLETE: {total} cases, {len(failures)} failures")
    for fam, seed, msg in failures[:20]:
        print(f"  {fam} seed={seed}: {msg[:200]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
