"""Streaming CDC upsert (the S28 scenario productized, round 11):
change batches applied to a parquet target through ``merge_upsert``
inside ``foreachBatch`` — the streaming twin of the batch maintenance
path (operators/io_infra.py io03), and the sink shape of a real
change-data-capture pipeline (REF parity: the
reference's sink loop applies each polled record batch to its target
and only then commits offsets — ``pyconnectsink.py:270-337``; here the
micro-batch IS the record batch and the streaming checkpoint IS the
offset commit).

Semantics
  - Each micro-batch is compacted to ONE row per key (latest by
    ``seq_col`` when given — the CDC log-sequence-number move; without
    a seq_col the caller promises upstream per-batch compaction, the
    standard Debezium/connector contract), then merge-upserted:
    matching keys replace, new keys insert, moved keys vanish from
    their old partition directory.
  - At-least-once replay is IDEMPOTENT: re-applying a batch re-replaces
    the same keys with the same rows, so a crash between the merge and
    the checkpoint commit cannot duplicate or corrupt state (pinned by
    test_s28b's replay assertion).
  - At 100 TB the merge is partition-scoped (see merge_upsert's doc):
    a micro-batch touching 0.1% of partitions rewrites 0.1% of the
    table, which is what makes continuous upsert ingestion affordable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_upsert_stream(
    stream: DataFrame,
    *,
    target_dir: str,
    checkpoint_dir: str,
    key_cols: Sequence[str],
    partition_by: Sequence[str] = (),
    seq_col: str | None = None,
):
    """Start (availableNow) a stream merge-upserting each micro-batch
    into ``target_dir``. Returns the StreamingQuery; awaitTermination()
    drains it."""
    from pyconnect_spark.sources.layout import merge_upsert

    keys = list(key_cols)

    def apply(batch: DataFrame, epoch_id: int) -> None:
        if seq_col is not None:
            from pyspark.sql import Window

            w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
            batch = (
                batch.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn", seq_col)
            )
        merge_upsert(
            batch.sparkSession,
            target_dir,
            batch,
            key_cols=keys,
            partition_by=partition_by,
        )

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
