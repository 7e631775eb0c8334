#!/usr/bin/env python
"""The staged exact-dedup path at production shape: shingle table staged
ONCE to parquet (hash-distributed on the shingle), then reused by the
exact prefix-filter join (dd14-identical) and summarized next to the
sketch tiers; plus the round-5 additions — asymmetric containment
(quote/excerpt detection), source-precedence keep decisions, and the
product-quantization compression audit.
Run: python examples/dedup_at_scale.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyconnect_spark.catalog import load_table
from pyconnect_spark.operators.dedup import (
    dd14_staged,
    dd20,
    dd21,
    stage_shingles,
)
from pyconnect_spark.operators.similarity import sm16
from pyconnect_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example-dedup-at-scale", cores=8)

    docs = load_table(spark, sf_dir, "documents")
    print(f"corpus: {docs.count()} docs")

    with tempfile.TemporaryDirectory(prefix="staged-shingles-") as tmp:
        staged = os.path.join(tmp, "shingles")
        stage_shingles(docs, staged)
        pairs = dd14_staged(spark, staged)
        print(f"exact Jaccard>=0.8 pairs (staged table): {pairs.count()}")

    contained = dd20(spark, sf_dir)
    print(f"containment>=0.9 (quote/excerpt) directed pairs: {contained.count()}")

    ledger = dd21(spark, sf_dir)
    print("source precedence ledger (top 5 by shadowed):")
    for r in ledger.orderBy("source").limit(5).collect():
        print(
            f"  {r['source']}: docs={r['n_docs']} kept={r['n_kept']} "
            f"self_dup={r['n_self_dup']} shadowed={r['n_shadowed']}"
        )

    pq = sm16(spark, sf_dir)
    from pyspark.sql import functions as F

    stats = pq.agg(
        F.round(F.avg("recon_cos"), 4).alias("mean_recon_cos"),
        F.round(F.min("recon_cos"), 4).alias("min_recon_cos"),
    ).collect()[0]
    print(
        f"PQ (64x compression) reconstruction cosine: "
        f"mean={stats['mean_recon_cos']} min={stats['min_recon_cos']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
