#!/usr/bin/env python
"""Round-13b spot-gate: scale ladders for the session's new families —
HLL registers, K-fold target encoding, SCD2 history, KM life table,
and label propagation.

Claims under test, measured not asserted:
- HLL: post-scan state is <=64 (bucket, rho) rows per group no matter
  the row count (no distinct pass at all);
- target encoding: the encoding map is (category x fold)-sized;
- SCD2: cost is the one per-key exchange + sort (linear in rows, no
  join); the output is runs-sized;
- KM life table: the windowed table is the distinct-duration table
  (observation-window-bounded), subjects never sort;
- LPA: per-round cost is the message shuffle (|E| rows), state is
  vertex-sized.

Usage: python tools/r13b_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from real_estate_project1_etl_spark.session import get_spark  # noqa: E402


def checksum(df):
    cols = [F.xxhash64(F.col(c).cast("string")) for c in df.columns]
    df.select(F.sum(sum(cols[1:], cols[0]))).collect()


def timeit(df, runs=3):
    checksum(df)  # warm
    ts = []
    for _ in range(runs):
        t0 = time.time()
        checksum(df)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    from real_estate_project1_etl_spark.operators.graph import (
        label_propagation_fixed,
    )
    from real_estate_project1_etl_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from real_estate_project1_etl_spark.operators.snapshots import (
        scd2_history,
    )
    from real_estate_project1_etl_spark.operators.stats import (
        kfold_target_encoding,
    )
    from real_estate_project1_etl_spark.operators.timeseries import (
        km_life_table,
    )

    spark = get_spark(
        "r13b-probe", cpus=32, shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. HLL registers + estimate (base = sf0.1 events 100k) --
    print("== HLL distinct per group (base = sf0.1 events 100k) ==",
          flush=True)
    for mult in (1, 10, 100):
        n = 100_000 * mult
        ev = spark.range(n).select(
            F.concat(F.lit("t"), (F.col("id") % 8).cast("string"))
            .alias("g"),
            (F.abs(F.xxhash64("id")) % (n // 10)).alias("v"),
        )
        reg = hll_registers(ev, ["g"], "v")
        est = hll_estimate(reg, ["g"])
        t = timeit(est)
        nr = reg.count()
        print(f"  rows={n:>12,}: {t:6.2f}s  register rows={nr} "
              f"(<=64 x 8 groups, row-count-free)", flush=True)

    # -- 2. K-fold target encoding (base = sf0.1 orders 150k) --
    print("== K-fold target encoding (base = sf0.1 orders 150k) ==",
          flush=True)
    for mult in (1, 10, 100):
        n = 150_000 * mult
        df = spark.range(n).select(
            F.col("id"),
            F.concat(F.lit("c"), (F.abs(F.xxhash64("id", F.lit("c")))
                                  % 40).cast("string")).alias("cat"),
            (F.abs(F.xxhash64("id", F.lit("y"))) % 2).alias("y"),
        )
        enc = kfold_target_encoding(df, "cat", "y", "id")
        t = timeit(enc)
        cells = enc.count()
        print(f"  rows={n:>12,}: {t:6.2f}s  encoding map={cells} rows "
              f"(40 cats x 5 folds)", flush=True)

    # -- 3. SCD2 history (base = sf0.1 events 100k, 1k keys) --
    print("== SCD2 type-2 history (base = sf0.1 events 100k) ==",
          flush=True)
    for mult in (1, 10, 100):
        n = 100_000 * mult
        keys = max(1_000, n // 100)
        df = spark.range(n).select(
            (F.col("id") % keys).alias("k"),
            (F.abs(F.xxhash64("id")) % 5).cast("string").alias("attr"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + F.floor(F.col("id") / keys) * 3600
            ).alias("ts"),
            F.col("id").alias("eid"),
        )
        h = scd2_history(df, "k", "attr", "ts", "eid")
        t = timeit(h)
        runs = h.count()
        print(f"  rows={n:>12,}: {t:6.2f}s  versions={runs:,} "
              f"(one exchange on key; no join)", flush=True)

    # -- 4. KM life table (base = sf0.1 users ~8k) --
    print("== KM life table (base = 8k subjects) ==", flush=True)
    for mult in (1, 10, 100):
        n = 8_000 * mult
        subj = spark.range(n).select(
            (F.abs(F.xxhash64("id")) % 400).alias("t_days"),
            (F.abs(F.xxhash64("id", F.lit("d"))) % 4 > 0)
            .cast("int").alias("d"),
        )
        lt = km_life_table(subj, "t_days", "d")
        t = timeit(lt)
        nd = lt.count()
        print(f"  subjects={n:>10,}: {t:6.2f}s  life-table rows={nd} "
              f"(distinct durations; window-bounded)", flush=True)

    # -- 5. label propagation (base = sf0.1 copurchase |E| ~ 1.2M) --
    print("== LPA 3 rounds on synthetic graph (base |E| = 1.2M) ==",
          flush=True)
    for mult in (1, 10):
        m = 1_200_000 * mult
        nv = 20_000 * mult
        edges = spark.range(m).select(
            (F.abs(F.xxhash64("id")) % nv).alias("a"),
            (F.abs(F.xxhash64("id", F.lit("b"))) % nv).alias("b"),
        ).filter(F.col("a") != F.col("b"))
        t0 = time.time()
        out = label_propagation_fixed(edges, iters=3)
        nl = out.count()
        t = time.time() - t0
        print(f"  edges={m:>10,}: {t:6.2f}s end-to-end  vertices={nl:,} "
              f"(per-round = one |E| message shuffle)", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
