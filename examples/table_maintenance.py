#!/usr/bin/env python
"""The parquet-lake maintenance lifecycle, end-to-end on one table: the
operations a 100 TB corpus needs between ingest and training — MERGE
upsert, right-to-be-forgotten delete, small-file compaction, Z-order
clustering, dynamic-partition-overwrite backfill, and the streaming CDC
twin — each verified in place (row counts / file counts / pruning), all
partition-scoped so a day's maintenance costs a day's rewrite.
Run: python examples/table_maintenance.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyconnect_spark.catalog import load_table
from pyconnect_spark.session import get_spark
from pyconnect_spark.sources.layout import (
    compact_parquet,
    delete_keys,
    merge_upsert,
    write_zordered,
)


def n_files(path: str) -> int:
    return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example-table-maintenance", cores=8)
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    orders = load_table(spark, sf_dir, "orders").select(*cols)

    with tempfile.TemporaryDirectory(prefix="maintenance-") as tmp:
        target = os.path.join(tmp, "orders_lake")

        # 1. initial load + MERGE upsert (updates replace, inserts add,
        #    moved keys leave their old directory)
        initial = orders.filter(F.col("o_orderkey") % 4 != 0)
        merge_upsert(spark, target, initial,
                     key_cols=["o_orderkey"], partition_by=["o_orderpriority"])
        updates = orders.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
            F.when(F.col("o_orderkey") % 8 == 2, F.lit("1-URGENT"))
            .otherwise(F.col("o_orderpriority")).alias("o_orderpriority"),
        )
        merge_upsert(spark, target, updates,
                     key_cols=["o_orderkey"], partition_by=["o_orderpriority"])
        state = spark.read.parquet(target)
        print(f"after merge: {state.count()} rows, "
              f"{state.filter(F.col('o_orderstatus') == 'U').count()} updated")

        # 2. right-to-be-forgotten: delete a key set, partition-scoped
        doomed = orders.filter(F.col("o_orderkey") % 1000 == 7).select("o_orderkey")
        removed = delete_keys(spark, target, doomed,
                              key_cols=["o_orderkey"], partition_by=["o_orderpriority"])
        print(f"after delete: removed {removed} rows for {doomed.count()} doomed keys")

        # 3. small-file compaction (partition layout preserved)
        before = n_files(target)
        compacted = os.path.join(tmp, "orders_compacted")
        out_count = compact_parquet(spark, target, compacted,
                                    target_file_bytes=8 << 20,
                                    partition_by=["o_orderpriority"])
        assert spark.read.parquet(compacted).count() == spark.read.parquet(target).count()
        print(f"compaction: {before} files -> {out_count} (rows unchanged)")

        # 4. Z-order the compacted copy on (key, price) and show pruning
        zpath = os.path.join(tmp, "orders_zordered")
        write_zordered(spark.read.parquet(compacted), zpath,
                       zorder_by=["o_orderkey", "o_totalprice"], n_files=8)
        zread = spark.read.parquet(zpath).filter(
            (F.col("o_orderkey") <= 1000) & (F.col("o_totalprice") <= 50000)
        )
        print(f"z-ordered 2-column selective read: {zread.count()} rows "
              f"(file ranges tight on BOTH columns -> row-group pruning at scale)")

        # 5. dynamic-overwrite backfill: recompute ONE partition in place
        fixed = (spark.read.parquet(compacted)
                 .filter(F.col("o_orderpriority") == "1-URGENT")
                 .withColumn("o_orderstatus", F.lit("B")))
        (fixed.write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("o_orderpriority").parquet(compacted))
        post = spark.read.parquet(compacted)
        assert post.filter((F.col("o_orderpriority") == "1-URGENT")
                           & (F.col("o_orderstatus") != "B")).count() == 0
        print(f"backfill: 1-URGENT partition rewritten in place; "
              f"total rows still {post.count()} (other partitions untouched)")

        # 6. streaming CDC twin: the same merge applied from a stream
        from pyconnect_spark.streaming.cdc import cdc_upsert_stream

        incoming = os.path.join(tmp, "changes")
        cdc_target = os.path.join(tmp, "cdc_state")
        initial.coalesce(1).write.mode("append").parquet(incoming)
        q = cdc_upsert_stream(
            spark.readStream.schema(initial.schema).parquet(incoming),
            target_dir=cdc_target,
            checkpoint_dir=os.path.join(tmp, "ckpt"),
            key_cols=["o_orderkey"], partition_by=["o_orderpriority"],
        )
        q.awaitTermination()
        print(f"streaming CDC load: {spark.read.parquet(cdc_target).count()} rows "
              f"(same merge path, checkpoint = offset commit)")

    spark.stop()
    print("table_maintenance example OK")


if __name__ == "__main__":
    main()
