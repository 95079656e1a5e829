"""Round-13 verdict item 2: per-stage floor anatomy of
documents_corpus_build_v6 — nobody had measured where the ~5.7 s calm
cost sits across the four composed stages.

The query's own localCheckpoint barriers (the r12b narrow-waist pinning)
are natural stage boundaries, so each stage can be timed HONESTLY — the
checkpoint forces full materialization of everything since the previous
barrier:

  S1 ccnet_keep : scan+bigram-explode LM scoring -> per-lang rank
                  buckets -> `kept` checkpoint
  S2 kdocs      : survivors join back to text -> `kdocs` checkpoint
  S3 dsir_select: hashed-n-gram DSIR fit+score over kdocs -> top-150
                  order-sample -> `sel` checkpoint
  S4 pack+emit  : whitespace token counts (fresh documents scan) ->
                  shard/offset window -> final joins -> checksum

Method: R full-chain rounds back to back (stages are sequentially
dependent, so drift is absorbed by cross-round medians, the
r12_heavy_profile convention); prints per-stage median/min/max and the
stage shares. Run: python tools/r13_v6_stage_profile.py [sf_dir]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(os.environ.get("PROFILE_ROUNDS", "5"))

    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from real_estate_project1_etl_spark.operators import textstats as T
    from real_estate_project1_etl_spark.operators.corpus import (
        bigram_lm_scores,
    )
    from real_estate_project1_etl_spark.operators.packing import (
        pack_sequences,
    )
    from real_estate_project1_etl_spark.operators.quality import (
        dsir_importance_weights,
        grouped_rank_buckets,
        sequential_poisson_sample,
    )
    from real_estate_project1_etl_spark.session import get_spark

    spark = get_spark(
        "r13-v6-profile", cpus=32, shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_once():
        t = {}
        docs = entry._t(spark, sf, "documents")

        t0 = time.monotonic()
        scores = bigram_lm_scores(docs).filter(F.col("n_bigrams") > 0)
        scored = scores.join(docs.select("doc_id", "lang"), "doc_id")
        buck = grouped_rank_buckets(
            scored, "lang", "lm_score", "doc_id", n_buckets=3
        )
        kept = (
            buck.filter(F.col("bucket") <= 1)
            .select("doc_id", "lang", "bucket")
            .localCheckpoint(eager=True)
        )
        t["S1 ccnet_keep"] = time.monotonic() - t0

        t0 = time.monotonic()
        kdocs = (
            docs.select("doc_id", "text", "lang")
            .join(kept.select("doc_id"), "doc_id")
            .localCheckpoint(eager=True)
        )
        t["S2 kdocs"] = time.monotonic() - t0

        t0 = time.monotonic()
        weights = dsir_importance_weights(
            kdocs,
            kdocs.filter(F.col("lang") == "en"),
            dim=entry._DSIR_DIM,
            scale=entry._DSIR_SCALE,
        ).filter(F.col("n_grams") > 0)
        sel = (
            sequential_poisson_sample(
                weights, "dsir_weight_ppm", 150, ["doc_id"],
                id_order_col="doc_id",
            )
            .select("doc_id", "dsir_weight_ppm")
            .localCheckpoint(eager=True)
        )
        t["S3 dsir_select"] = time.monotonic() - t0

        t0 = time.monotonic()
        tok = (
            docs.join(F.broadcast(sel.select("doc_id")), "doc_id")
            .select(
                "doc_id",
                T.whitespace_token_count("text").cast("long").alias(
                    "n_toks"
                ),
            )
        )
        plan = pack_sequences(
            sel.join(tok, "doc_id"), "doc_id", "n_toks",
            seq_len=512, n_shards=4,
        )
        out = (
            plan.join(kept, "doc_id")
            .join(sel, "doc_id")
            .select(
                "doc_id", "lang",
                F.when(F.col("bucket") == 0, "head")
                .otherwise("middle").alias("bucket_label"),
                "dsir_weight_ppm", "n_tokens", "shard",
                F.col("offset"), "first_seq", "last_seq",
            )
        )
        # checksum action (bench.py convention — count() would prune)
        out.agg(
            F.sum(F.xxhash64(*out.columns)).alias("c")
        ).collect()
        t["S4 pack+emit"] = time.monotonic() - t0
        return t

    run_once()  # warm (JIT, parquet footer cache, python imports)
    acc: dict[str, list[float]] = {}
    for r in range(rounds):
        for k, v in run_once().items():
            acc.setdefault(k, []).append(v)

    print(f"\nv6 per-stage anatomy @ {sf}, {rounds} rounds "
          f"(loadavg {os.getloadavg()[0]:.2f})")
    total_med = sum(statistics.median(v) for v in acc.values())
    print(f"{'stage':<16} {'med':>7} {'min':>7} {'max':>7} {'share':>6}")
    for k, v in acc.items():
        m = statistics.median(v)
        print(f"{k:<16} {m:7.3f} {min(v):7.3f} {max(v):7.3f} "
              f"{100 * m / total_med:5.1f}%")
    print(f"{'TOTAL (sum med)':<16} {total_med:7.3f}")


if __name__ == "__main__":
    main()
