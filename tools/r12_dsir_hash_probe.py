"""Round-12: DSIR feature-hash throughput probe — md5_60 (the
oracle-reproducible default) vs xxhash64 (the JVM-native production
choice), same corpus, warm best-of-3.  The classifier's equivalent
probe measured ~3.5x for xxhash64; DSIR hashes uni+bigrams (≈2 grams
per token) so the hash is a bigger fraction of its cost.

Run: python tools/r12_dsir_hash_probe.py [k]   (default 10x sf0.1 docs)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from real_estate_project1_etl_spark.session import get_spark
    from real_estate_project1_etl_spark.operators.quality import (
        dsir_importance_weights,
    )

    spark = get_spark(
        "r12-dsir-hash",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text", "lang")
    copies = base.crossJoin(
        spark.range(k).select(F.col("id").alias("_copy"))
    ).select(
        (F.col("doc_id") + F.col("_copy") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" v"), F.col("_copy").cast("string"))
        .alias("text"),
        "lang",
    )
    path = f"/tmp/r12_dsir_hash_{k}x"
    copies.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    n_tokens = docs.select(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
    ).collect()[0][0]
    print(f"corpus: {n_docs} docs, {n_tokens} tokens (~{2*n_tokens} grams)")

    for hash_fn in ("md5_60", "xxhash64"):
        best = None
        for _ in range(3):
            t0 = time.time()
            dsir_importance_weights(
                docs, docs.filter(F.col("lang") == "en"),
                dim=4096, hash_fn=hash_fn,
            ).select(F.sum("dsir_weight_ppm")).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"  {hash_fn:9s}: {best:.2f}s "
              f"({2 * n_tokens / best / 1e6:.1f}M grams/s)")


if __name__ == "__main__":
    main()
