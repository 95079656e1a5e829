#!/usr/bin/env python
"""Round-10 operator scale probes (results recorded in SCALE.md).

Synthesizes corpora well past the grading scales and measures:

1. ``textstats.bpe_train_merges`` vs ``bpe_train_merges_batched`` on a
   ~1000-word-vocabulary corpus (the sf0.1 documents table has only 31
   distinct words, so this is the probe that actually exercises the
   vocabulary-sized iteration cost and the batching round count).
2. ``quality.train_hashed_classifier`` — full training loop over ~200k
   labeled docs with 4096 hashed features, then inference with the
   trained weights (the end-to-end fit+score path).
3. ``corpus.trigram_lm_scores`` — trigram backoff scoring over ~200k
   docs / ~8M tokens.
4. ``quality.rrf_ensemble`` vs ``rrf_ensemble_approx`` — 2.5M rows x 4
   signals (the m-sorts-vs-one-pass comparison).

Usage: python tools/r10_scale_probe.py [n_docs] [n_rrf]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from real_estate_project1_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_rrf = int(sys.argv[2]) if len(sys.argv) > 2 else 2_500_000
    spark = get_spark(app_name="r10-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # --- corpus: ~40 words/doc, Zipf-ish vocabulary (r9 probe shape) ----
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
    docs.write.mode("overwrite").parquet("/tmp/r10_probe_docs")
    corpus = spark.read.parquet("/tmp/r10_probe_docs")
    n_tokens = n_docs * 40

    # --- 1. BPE training: sequential vs batched -------------------------
    from real_estate_project1_etl_spark.operators.textstats import (
        bpe_train_merges,
        bpe_train_merges_batched,
    )

    vocab_n = (
        corpus.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
        .count()
    )
    t0 = time.time()
    seq = bpe_train_merges(corpus, 32).collect()
    seq_s = time.time() - t0
    t0 = time.time()
    bat = bpe_train_merges_batched(corpus, 32, batch_size=8).collect()
    bat_s = time.time() - t0
    rounds = len({r["round"] for r in bat})
    overlap = len(
        {(r["left"], r["right"]) for r in seq}
        & {(r["left"], r["right"]) for r in bat}
    )
    print(
        f"bpe_train 32 merges over {vocab_n}-word vocab: sequential "
        f"{seq_s:.1f}s ({seq_s / max(len(seq), 1):.2f}s/iter); "
        f"batched(B=8) {bat_s:.1f}s in {rounds} rounds; "
        f"merge-set overlap {overlap}/{len(seq)}"
    )

    # --- 2. classifier training end to end ------------------------------
    from real_estate_project1_etl_spark.operators.quality import (
        hashed_linear_classifier,
        train_hashed_classifier,
    )

    labeled = corpus.withColumn("label", (F.col("doc_id") % 2 == 0).cast("int"))
    t0 = time.time()
    w = train_hashed_classifier(labeled, dim=4096, n_iters=5, lr_den=256)
    w.count()
    train_s = time.time() - t0
    t0 = time.time()
    kept = (
        hashed_linear_classifier(corpus, w, dim=4096, threshold_milli=0)
        .filter("kept")
        .count()
    )
    infer_s = time.time() - t0
    print(
        f"train_hashed_classifier: {n_docs} docs / 4096 features / 5 iters"
        f" in {train_s:.1f}s ({train_s / 5:.1f}s/iter); inference with the"
        f" trained weights {infer_s:.1f}s ({kept} kept)"
    )

    # --- 3. trigram backoff LM ------------------------------------------
    from real_estate_project1_etl_spark.operators.corpus import (
        trigram_lm_scores,
    )

    # elimination-proof action (round-9 lesson: count() prunes the final
    # left join and would time a fraction of the query)
    t0 = time.time()
    out = trigram_lm_scores(corpus)
    n = (
        out.select(F.xxhash64(*out.columns).alias("_h"))
        .agg(F.count("_h"))
        .collect()[0][0]
    )
    lm_s = time.time() - t0
    print(
        f"trigram_lm_scores: {n_docs} docs / {n_tokens} tokens -> {n} rows "
        f"in {lm_s:.1f}s ({n_tokens / lm_s / 1e6:.1f}M tokens/s)"
    )

    # --- 4. exact vs approximate RRF ------------------------------------
    from real_estate_project1_etl_spark.operators.quality import (
        rrf_ensemble,
        rrf_ensemble_approx,
    )

    sig = spark.range(n_rrf).select(
        F.col("id").alias("doc_id"),
        *[
            ((F.col("id") * p) % 999983).cast("bigint").alias(f"s{i}")
            for i, p in enumerate((37, 101, 7919, 104729))
        ],
    ).localCheckpoint()
    cols = ["s0", "s1", "s2", "s3"]
    for name, fn in (("exact", rrf_ensemble), ("approx", rrf_ensemble_approx)):
        fn(sig, "doc_id", cols).select(F.sum("rrf_scaled")).collect()  # warm
        t0 = time.time()
        fn(sig, "doc_id", cols).select(F.sum("rrf_scaled")).collect()
        print(
            f"rrf_{name}: {n_rrf} rows x {len(cols)} signals in "
            f"{time.time() - t0:.1f}s"
        )


if __name__ == "__main__":
    main()
