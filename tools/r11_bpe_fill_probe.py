#!/usr/bin/env python
"""Round-11 probe: batched-BPE fill rate (merges/round) under the two
acceptance rules AFTER the round-11 product-conflict rule landed
(conflict = shared symbol OR symbol==other's concatenation).

Same realistic Zipf-ish corpus generator as tools/r10_scale_probe.py.
Verdict item 5's bar: >= 3.5 merges/round on this corpus (fewer
training rounds at 100 TB = fewer barriers).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from real_estate_project1_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark(app_name="r11-bpe-fill-probe")
    spark.sparkContext.setLogLevel("ERROR")
    words = [
        F.concat(
            F.lit("w"),
            ((F.col("id") * (i + 3)) % (3 + (F.col("id") + i) % 997)).cast(
                "string"
            ),
        )
        for i in range(40)
    ]
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
    )
    docs.write.mode("overwrite").parquet("/tmp/r11_probe_docs")
    corpus = spark.read.parquet("/tmp/r11_probe_docs")

    from real_estate_project1_etl_spark.operators.textstats import (
        bpe_train_merges_batched,
    )

    for rule in ("blocking", "greedy"):
        t0 = time.time()
        rows = bpe_train_merges_batched(
            corpus, 32, batch_size=8, accept_rule=rule
        ).collect()
        dt = time.time() - t0
        rounds = len({r["round"] for r in rows})
        print(
            f"accept_rule={rule}: {len(rows)} merges in {rounds} rounds "
            f"({len(rows) / max(rounds, 1):.2f} merges/round), {dt:.1f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
