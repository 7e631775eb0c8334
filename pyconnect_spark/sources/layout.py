"""Training-shard output layout: the write-side counterpart of the LLM
operators.

A 100 TB training corpus is consumed by data loaders that care about
physical layout, not just logical content:

- **partition directories** (split=train/lang=en/...) so a loader mounts
  exactly the slice it trains on — partition pruning for readers;
- **bounded shard sizes** (``maxRecordsPerFile``) so loader workers get
  even units of work and no shard stalls an epoch;
- **within-shard ordering** (e.g. by content fingerprint) so shuffling
  can be seeded/deterministic and resume is positional;
- **a manifest** with per-shard row counts, so loaders can plan epochs
  without listing/streaming the data.

``write_training_shards`` encodes those once, Spark-natively:
``repartitionByRange`` on (partition cols, sort cols) clusters rows so
each output file covers a contiguous sort range within its partition
(range exchange + per-file count cap — no driver involvement), then
``sortWithinPartitions`` fixes intra-file order, then the DataFrame
writer fans out per-partition directories. The manifest is computed from
the written footers (a metadata-only read), not by re-scanning data.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str],
    sort_within: Sequence[str],
    target_rows_per_shard: int = 100_000,
    shards_hint: int | None = None,
) -> None:
    """Write ``df`` as a partitioned, sorted, size-bounded parquet corpus.

    At 100 TB the range exchange is the only shuffle; every downstream
    knob (file count, per-file cap, directory layout) is executor-side.
    """
    cluster_cols = [*partition_by, *sort_within]
    n = shards_hint or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    (
        df.repartitionByRange(n, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_shard)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def shard_manifest(spark: SparkSession, path: str) -> list[dict]:
    """Per-shard manifest: (relative file, partition values, rows) for
    every data file under ``path`` — row counts come from parquet footers
    via a metadata-only aggregation, not a data scan."""
    df = spark.read.parquet(path)
    part_cols = [
        f.name
        for f in df.schema.fields
        if f"{f.name}=" in "|".join(_partition_dirs(path))
    ]
    counted = (
        df.groupBy(F.input_file_name().alias("file"), *part_cols)
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    base = os.path.abspath(path)
    out = []
    for r in sorted(counted, key=lambda r: r["file"]):
        rel = r["file"]
        rel = rel[len("file:"):] if rel.startswith("file:") else rel
        rel = os.path.relpath(rel, base)
        out.append(
            {
                "file": rel,
                "rows": r["rows"],
                **{c: r[c] for c in part_cols},
            }
        )
    return out


def write_manifest(spark: SparkSession, path: str) -> str:
    """Materialize the manifest as ``_manifest.json`` beside the data."""
    manifest = shard_manifest(spark, path)
    target = os.path.join(path, "_manifest.json")
    with open(target, "w") as fh:
        json.dump(manifest, fh, indent=1)
    return target


def _partition_dirs(path: str) -> list[str]:
    names: list[str] = []
    for root, dirs, _ in os.walk(path):
        names.extend(d for d in dirs if "=" in d)
    return names


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    target_file_bytes: int = 128 << 20,
    partition_by: Sequence[str] = (),
) -> int:
    """Compact a small-file parquet dataset into ~``target_file_bytes``
    files; returns the output file count.

    The small-file problem is the classic operational failure of long-
    running ingestion at scale: a streaming sink or frequent batch
    appends leave thousands of KB-sized files, and every downstream scan
    pays per-file open/footer costs (and the driver pays listing costs).
    Compaction is a rewrite: size the output file count from the INPUT's
    on-disk bytes (a driver-side metadata walk — no data read), then one
    round-robin repartition to that count so output files are even.

    ``repartition`` (a shuffle) rather than ``coalesce``: coalesce would
    avoid the exchange but inherits input skew — one fat output file
    stalls later scans, which is what compaction exists to fix.

    With ``partition_by`` the round-robin form would re-fragment: each of
    the n shuffle tasks holds rows of EVERY partition value, so the
    partitioned writer emits up to n × |partitions| files. Instead the
    shuffle key becomes (partition cols, salt), where each partition
    value's salt width is its own size-proportional file budget — rows of
    one partition value land in exactly that many tasks, so the directory
    layout is preserved AND each directory gets ~size/target files. The
    per-partition budgets come from one tiny aggregation (one row per
    partition value) scaled by the input's measured bytes-per-row. At
    100 TB this runs as a scheduled job compacting only partitions whose
    file count exceeds a threshold.
    """
    import math

    total = 0
    for root, _dirs, files in os.walk(src):
        for name in files:
            if not name.startswith("_") and not name.startswith("."):
                total += os.path.getsize(os.path.join(root, name))
    df = spark.read.parquet(src)
    if not partition_by:
        n_files = max(1, math.ceil(total / target_file_bytes))
        df.repartition(n_files).write.mode("overwrite").parquet(dst)
    else:
        counts = df.groupBy(*partition_by).agg(F.count("*").alias("_rows"))
        budget = counts.select(
            *partition_by,
            F.greatest(
                F.lit(1),
                F.ceil(
                    F.col("_rows")
                    * F.lit(float(total))
                    / F.lit(float(target_file_bytes))
                    / F.sum("_rows").over(Window.partitionBy())
                ),
            )
            .cast("int")
            .alias("_files"),
        )
        n_out = budget.agg(F.sum("_files")).collect()[0][0]
        data_cols = [c for c in df.columns if c not in partition_by]
        salted = (
            df.join(F.broadcast(budget), list(partition_by))
            .withColumn(
                "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), F.col("_files"))
            )
            .repartition(int(n_out), *partition_by, F.col("_salt"))
            .drop("_files", "_salt")
        )
        salted.write.mode("overwrite").partitionBy(*partition_by).parquet(dst)
    written = 0
    for root, _dirs, files in os.walk(dst):
        written += sum(
            1 for f in files if not f.startswith("_") and not f.startswith(".")
        )
    return written
