#!/usr/bin/env python
"""WordPiece max-munch 10x scale probe.

Claim under test (textstats.wordpiece_token_frequencies): the encoder
fold runs once per DISTINCT word (Zipf collapse), so scaling the corpus
10x with a near-fixed vocabulary should grow runtime ~linearly in scan
volume (the explode+count stages), NOT in fold work — and a widened
DISTINCT vocabulary grows only the fold stage.

Probe A: corpus 1x vs 10x (same word distribution -> distinct words
constant). Probe B: 10x corpus with 50x distinct-word vocabulary
(random letter words) — the fold-work axis isolated.
"""

from __future__ import annotations

import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from real_estate_project1_etl_spark.session import get_spark  # noqa: E402
from real_estate_project1_etl_spark.operators.textstats import (  # noqa: E402
    wordpiece_token_frequencies,
)

VOCAB = [c for c in "abcdefghijklmnopqrstuvxyz"] + [
    "th", "the", "er", "in", "on", "st", "an", "re", "es", "sc", "ta",
]
BASE_WORDS = (
    "join hash row batch scan customer column filter small slow merge "
    "order vector line data table agg value key stream window spark a "
    "group part big sort query fast the dup"
).split()


def corpus(spark, n_docs: int, words: list[str], seed: int):
    # distributed synthesis: 300 words per doc drawn by xxhash64 index
    # into the word list — no driver-side materialization, so the probe
    # can scale past what createDataFrame ships through the gateway
    arr = F.array(*[F.lit(w) for w in words])
    pick = F.transform(
        F.sequence(F.lit(0), F.lit(299)),
        lambda i: F.element_at(
            arr,
            (
                F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.size(arr))
                + 1
            ).cast("int"),
        ),
    )
    df = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(pick, " ").alias("text"),
        )
        .persist()
    )
    df.count()
    return df


def timed(df) -> float:
    best = float("inf")
    for _ in range(3):
        t = time.time()
        df.count()
        best = min(best, time.time() - t)
    return best


def main() -> None:
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    c1 = corpus(spark, 20_000, BASE_WORDS, 1)
    c10 = corpus(spark, 200_000, BASE_WORDS, 2)

    q1 = wordpiece_token_frequencies(c1, VOCAB, top_k=20)
    q10 = wordpiece_token_frequencies(c10, VOCAB, top_k=20)
    t1, t10 = timed(q1), timed(q10)
    print(f"A: corpus 1x (20k docs x 300 words): {t1:.2f}s; "
          f"10x: {t10:.2f}s; ratio {t10 / t1:.2f} (linear=10)")

    rng = random.Random(3)
    wide_words = BASE_WORDS + [
        "".join(rng.choice("abcdefghijklmnopqrst") for _ in range(rng.randint(3, 16)))
        for _ in range(1_500)
    ]
    cw = corpus(spark, 200_000, wide_words, 4)
    qw = wordpiece_token_frequencies(cw, VOCAB, top_k=20)
    tw = timed(qw)
    dw = cw.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).distinct().count()
    print(f"B: 10x corpus, {dw} distinct words (50x vocab): {tw:.2f}s; "
          f"vs A-10x {t10:.2f}s -> fold-work ratio {tw / t10:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
