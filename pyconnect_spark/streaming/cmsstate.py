"""Streaming Count-Min heavy-hitter state: tx31's mergeable frequency
sketch maintained incrementally over an unbounded document stream.

CMS counters are plain additive — merging a batch's sketch into the
persisted state is a SUM per (row, bucket), which makes the streamed
sketch EXACTLY equal (not approximately) to a batch sketch of the same
corpus: mergeability is algebraic, and because the bucket hashes are
the md5-derived tx31 family, the equality is testable table-for-table.

Additivity is also why replay is dangerous: re-merging a replayed
batch double-counts. State versions are therefore keyed by the
micro-batch epoch exactly like streaming/sketchstate.py (a replayed
batch REBUILDS its epoch from the parent version) — the shared
``_versions`` / ``_latest_state`` helpers implement that discipline.

The exchange per batch carries at most depth x width counters per map
task (map-side combine over a fixed key domain); the state is a
depth x width table of longs regardless of stream length. Heavy-hitter
queries probe candidate words against the state (min over rows) and
never touch historical raw documents.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyconnect_spark.streaming.sketchstate import _latest_state, _versions

_DEPTH = 4
_WIDTH = 1024


def _bucket(r: int, word_col):
    """tx31's md5 hash family — streaming and batch bucket identically."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cms{r}:"), word_col)), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % _WIDTH
    )


def cms_sketch(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(r, bucket, c) counter table for a document frame."""
    words = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    )
    keyed = words.select(
        F.posexplode(
            F.array(*[_bucket(r, F.col("word")) for r in range(_DEPTH)])
        ).alias("r", "bucket")
    )
    return keyed.groupBy("r", "bucket").agg(
        F.count("*").cast("long").alias("c")
    )


def cms_rollup_stream(
    stream: DataFrame,
    *,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Start (availableNow) a stream folding each micro-batch's CMS into
    the persisted counter state. Returns the StreamingQuery."""

    def update(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        fresh = cms_sketch(batch, text_col)
        prev = _latest_state(spark, state_dir, below=epoch_id)
        merged = (
            fresh
            if prev is None
            else prev.unionByName(fresh)
            .groupBy("r", "bucket")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        target = os.path.join(state_dir, f"v={epoch_id}")
        if os.path.isdir(target):  # replay: rebuild from parent, never re-add
            shutil.rmtree(target)
        merged.write.parquet(target)
        # Retain the parent version across the commit boundary (see
        # sketchstate.py): the checkpoint commits this epoch only after
        # foreachBatch returns, so a replay after a crash-at-this-point
        # still needs the parent to rebuild from. Keep {epoch, parent}.
        versions = _versions(state_dir)
        parents = [v for v in versions if v < epoch_id]
        keep = {epoch_id} | ({parents[-1]} if parents else set())
        for v in versions:
            if v not in keep:
                shutil.rmtree(
                    os.path.join(state_dir, f"v={v}"), ignore_errors=True
                )

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def query_heavy_hitters(
    spark: SparkSession, state_dir: str, candidates: DataFrame
) -> DataFrame:
    """Estimate each candidate word's frequency from the counter state
    (min over the depth rows — the CMS read path; guaranteed >= truth)."""
    state = _latest_state(spark, state_dir)
    if state is None:
        raise FileNotFoundError(f"no CMS state under {state_dir}")
    probes = candidates.select(
        "word",
        F.posexplode(
            F.array(*[_bucket(r, F.col("word")) for r in range(_DEPTH)])
        ).alias("r", "bucket"),
    )
    return (
        probes.join(state, ["r", "bucket"])
        .groupBy("word")
        .agg(F.min("c").cast("long").alias("cms_est"))
    )
