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


def zorder_value(cols: Sequence[str], stats: dict[str, tuple[float, float]], n_bits: int = 16):
    """Morton (Z-order) key as a pure column expression: each column is
    linearly quantized to ``n_bits`` against its (min, max) from ``stats``,
    then the quantized values are bit-interleaved. Rows close in Z-value
    are close in EVERY interleaved dimension, so sorting by it clusters a
    file's min/max ranges on all the columns at once — multi-column
    data-skipping from one sort key (the Delta/Iceberg OPTIMIZE ZORDER
    idea, expressed as plain Spark expressions).

    ``stats`` comes from one agg pass (see :func:`write_zordered`); linear
    quantization is the standard trade — heavy skew in a column wastes its
    low bits (the known ZORDER caveat; percentile-based binning is the
    remedy when it matters)."""
    # Interleaved bits must fit a signed long WITHOUT touching bit 63 (the
    # sign bit — a high value landing there would sort before low values).
    # With many columns, shrink per-column resolution instead of failing:
    # 4 cols at the default 16 bits quietly becomes 4 × 15 = 60 bits.
    n_bits = min(n_bits, 63 // max(len(cols), 1))
    if n_bits < 1:
        raise ValueError(f"zorder_value: too many columns ({len(cols)}) for a 63-bit key")
    terms = []
    for ci, c in enumerate(cols):
        lo, hi = stats[c]
        span = (hi - lo) or 1.0
        # Clamp BOTH ends: incremental writers reuse an earlier run's stats
        # (the documented grid-stability contract), so new data may fall
        # below lo — an unclamped negative q shifts into garbage bits.
        q = F.greatest(
            F.lit(0),
            F.least(
                F.lit((1 << n_bits) - 1),
                ((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit((1 << n_bits) - 1))
                .cast("long"),
            ),
        )
        for b in range(n_bits):
            # bit b of column ci lands at interleaved position b*len(cols)+ci
            terms.append(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)), b * len(cols) + ci
                )
            )
    z = terms[0]
    for t_ in terms[1:]:
        z = z.bitwiseOR(t_)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    zorder_by: Sequence[str],
    n_files: int = 8,
    n_bits: int = 16,
) -> dict[str, tuple[float, float]]:
    """Write ``df`` clustered by a Z-order key over ``zorder_by``: one
    stats pass (min/max per column), one range exchange on the Z-value,
    one within-partition sort, one write. Each output file then covers a
    tight min/max range on ALL the z-ordered columns, so parquet
    row-group/file pruning skips most files for a predicate on ANY of
    them — the layout move that turns a full scan into a few-file read at
    100 TB. Returns the stats used, so incremental writers can reuse the
    same quantization grid (stable Z-values across backfills)."""
    stats_row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"{c}__min") for c in zorder_by],
        *[F.max(F.col(c).cast("double")).alias(f"{c}__max") for c in zorder_by],
    ).collect()[0]
    stats = {c: (stats_row[f"{c}__min"], stats_row[f"{c}__max"]) for c in zorder_by}
    z = zorder_value(zorder_by, stats, n_bits=n_bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return stats


def merge_upsert(
    spark: SparkSession,
    target: str,
    updates: DataFrame,
    *,
    key_cols: Sequence[str],
    partition_by: Sequence[str] = (),
) -> int:
    """MERGE-style upsert into a parquet dataset without a table format:
    rows in ``updates`` replace target rows with the same key; new keys
    insert. Returns the number of rows written.

    Without Delta/Iceberg, parquet has no row-level MERGE INTO — the
    engine-native move is *partition-scoped rewrite*: find the partitions
    the updates touch (one tiny distinct over the updates), read ONLY
    those partitions back (partition pruning on the target scan), anti-
    join out the superseded keys, union the updates, and rewrite just
    those directories via dynamic partitionOverwriteMode. Untouched
    partitions are never read OR written — at 100 TB an upsert batch
    touching 0.1% of partitions costs 0.1% of a full rewrite, which is
    the entire point of partitioning the target by an update-locality
    column (ingest date, source). The final exchange keys on the
    partition columns so each directory is written by tasks that own it.

    Unpartitioned targets degrade to a full rewrite (documented, same as
    Hive's INSERT OVERWRITE semantics) — partition the target if upserts
    are a steady workload.
    """
    import glob as _glob

    existing = bool(
        _glob.glob(os.path.join(target, "*")) or _glob.glob(os.path.join(target, "**", "*"))
    )
    if not existing:
        w = updates.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)
        return updates.count()

    tgt = spark.read.parquet(target)
    if partition_by:
        # Touched = the updates' NEW partition values UNION the partitions
        # currently holding the updated keys: an update that moves a key to
        # a different partition value must also rewrite the OLD directory,
        # or the superseded row survives there as a duplicate. The key
        # lookup scans only key+partition columns (column pruning).
        upd_keys = updates.select(*key_cols).distinct()
        touched = (
            updates.select(*partition_by)
            .unionByName(
                tgt.join(F.broadcast(upd_keys), list(key_cols), "left_semi").select(*partition_by)
            )
            .distinct()
        )
        # partition pruning: the semi join narrows the target scan to the
        # touched directories (tiny broadcast of partition values)
        scoped = tgt.join(F.broadcast(touched), list(partition_by), "left_semi")
    else:
        scoped = tgt
    keep = scoped.join(
        F.broadcast(updates.select(*key_cols).distinct()), list(key_cols), "left_anti"
    )
    merged = keep.select(*updates.columns).unionAll(updates)
    # A key moving OUT may empty its old partition entirely; dynamic
    # overwrite only rewrites partitions present in the staged frame, so
    # snapshot the touched partitions' current files for post-write cleanup.
    old_files = (
        _partition_files(spark, target, partition_by, [tuple(r) for r in touched.collect()])
        if partition_by
        else []
    )
    # The merged plan READS the target — materialize it to a staging dir
    # before overwriting, or the write would consume the files it is
    # replacing. The staging write holds only the touched partitions'
    # worth of data, so this is small relative to the target.
    staging = target.rstrip("/") + ".staging-merge"
    merged.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    try:
        spark.conf.set(mode_key, "dynamic")
        w = staged.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)
    finally:
        spark.conf.set(mode_key, prev)
    _remove_stale_files(old_files)
    n = staged.count()
    import shutil as _shutil

    _shutil.rmtree(staging, ignore_errors=True)
    return n


def _partition_files(
    spark: SparkSession,
    target: str,
    partition_by: Sequence[str],
    touched_rows: Sequence,
) -> list[str]:
    """Local filesystem paths of every parquet file in the touched
    partitions — collected BEFORE a rewrite so emptied partitions can be
    cleaned after. Metadata-scale: one path string per file, not per row,
    over the touched slice only (the partition-value predicate prunes the
    listing). A fresh single-source scan, because input_file_name() is
    rejected on multi-source (joined) plans. (Local-FS form of what a
    Hadoop FileSystem.listStatus pass does on HDFS/S3.)"""
    from urllib.parse import unquote, urlparse

    if not touched_rows:
        return []
    pred = None
    for row in touched_rows:
        c = None
        for col, val in zip(partition_by, row):
            e = F.col(col) == F.lit(val)
            c = e if c is None else c & e
        pred = c if pred is None else pred | c
    return [
        unquote(urlparse(r[0]).path)
        for r in spark.read.parquet(target)
        .filter(pred)
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]


def _remove_stale_files(old_files: Sequence[str]) -> None:
    """Delete pre-rewrite files that survived a dynamic partition
    overwrite. Partitions that received staged rows had their files
    replaced (the old names are gone — skipped here); a partition whose
    every row was removed appears in no staged row, so dynamic overwrite
    never touches its directory and its old files must go explicitly, or
    the deleted rows silently survive."""
    for f in old_files:
        if os.path.isfile(f):
            os.remove(f)


def delete_keys(
    spark: SparkSession,
    target: str,
    keys: DataFrame,
    *,
    key_cols: Sequence[str],
    partition_by: Sequence[str] = (),
) -> int:
    """Row-level DELETE on a parquet dataset (the right-to-be-forgotten /
    retention-expiry primitive): rows matching ``keys`` are removed by
    rewriting ONLY the partitions that contain them. Returns the number
    of rows deleted.

    Same partition-scoped shape as :func:`merge_upsert`: locate the
    touched partitions (one semi join of the partition values against
    the target scan — when the key is not the partition column, the
    touched set comes from scanning just the key+partition columns),
    anti-join the doomed keys out, rewrite those directories under
    dynamic partitionOverwriteMode. Untouched partitions keep their
    files byte-for-byte — a deletion request touching one user costs
    one partition rewrite, not a table rewrite. A partition emptied of
    ALL its rows ends as an empty-but-present directory: dynamic
    overwrite only rewrites partitions the staged frame still has rows
    for, so the emptied directory's old files are deleted explicitly
    (their paths are snapshotted from the scoped scan before the write —
    without that step the doomed rows would silently survive).
    """
    tgt = spark.read.parquet(target)
    if partition_by:
        touched = (
            tgt.join(F.broadcast(keys.select(*key_cols).distinct()), list(key_cols), "left_semi")
            .select(*partition_by)
            .distinct()
        )
        scoped = tgt.join(F.broadcast(touched), list(partition_by), "left_semi")
    else:
        scoped = tgt
    before = scoped.count()
    old_files = (
        _partition_files(spark, target, partition_by, [tuple(r) for r in touched.collect()])
        if partition_by
        else []
    )
    keep = scoped.join(
        F.broadcast(keys.select(*key_cols).distinct()), list(key_cols), "left_anti"
    )
    staging = target.rstrip("/") + ".staging-delete"
    keep.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    try:
        spark.conf.set(mode_key, "dynamic")
        w = staged.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)
    finally:
        spark.conf.set(mode_key, prev)
    _remove_stale_files(old_files)
    deleted = before - staged.count()
    import shutil as _shutil

    _shutil.rmtree(staging, ignore_errors=True)
    return deleted
