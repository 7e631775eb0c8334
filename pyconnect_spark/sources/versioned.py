"""Versioned parquet table: copy-on-write snapshots with time-travel
reads and audit-preserving rollback — the Delta/Iceberg transaction-log
move re-expressed as plain parquet + JSON manifests, no table-format
dependency.

Layout::

    <root>/data/<part>=<val>/v{N}-part-*.parquet   # immutable data files
    <root>/_versions/v{N}.json                     # manifest: file list

A version IS its manifest: an ordered list of data files relative to
``data/``. Writers never mutate or delete a committed file — a merge
stages new files for the touched partitions only, then commits a new
manifest listing (untouched old files + new files). Readers resolve a
manifest and scan exactly that file list (``basePath`` keeps hive
partition-column inference), so

  - **time travel**: any historical version stays readable bit-for-bit
    after later merges (pinned by io14's oracle: v1's hash must still
    match the pre-merge aggregate AFTER v2 commits);
  - **snapshot isolation**: a reader holding version N's file list is
    unaffected by a concurrent commit of N+1 (immutable files);
  - **rollback**: ``vt_rollback`` commits a NEW version whose manifest
    equals the target's — history is never erased, so the bad version
    remains auditable (the Delta RESTORE semantic);
  - **atomic commit**: the manifest lands via write-temp + ``os.rename``
    (atomic on POSIX), so readers see either the old or the new version,
    never a partial list.

At 100 TB the economics are the same as any log-structured table
format: a merge touching 0.1% of partitions writes 0.1% of the data and
one KB-sized manifest; old versions cost only the retained files of
REWRITTEN partitions (untouched files are shared across every manifest
that lists them — pinned by test_versioned's file-sharing assertion);
vacuuming old versions is manifest set-difference (not implemented here
— retention policy is deployment-specific).

Partition values must round-trip through ``<col>=<value>`` directory
names verbatim (true for this repo's fixtures; values needing hive
percent-escaping raise ``NotImplementedError`` rather than silently
corrupting the touched-partition computation).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ESCAPE_NEEDED = set('"#%\'*/:=?\\{[]^\x7f') | {chr(c) for c in range(32)}


def _data_dir(root: str) -> str:
    return os.path.join(root, "data")


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "_versions")


def vt_versions(root: str) -> list[int]:
    d = _manifest_dir(root)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    )


def vt_latest(root: str) -> int:
    versions = vt_versions(root)
    if not versions:
        raise FileNotFoundError(f"no versions at {root}")
    return versions[-1]


def _read_manifest(root: str, version: int) -> list[str]:
    with open(os.path.join(_manifest_dir(root), f"v{version}.json")) as fh:
        return json.load(fh)["files"]


def _commit(root: str, files: Sequence[str], version: int) -> int:
    os.makedirs(_manifest_dir(root), exist_ok=True)
    target = os.path.join(_manifest_dir(root), f"v{version}.json")
    tmp = target + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump({"version": version, "files": sorted(files)}, fh, indent=1)
    os.rename(tmp, target)  # atomic on POSIX: readers never see a partial list
    return version


def _part_dir(col: str, value) -> str:
    s = "__HIVE_DEFAULT_PARTITION__" if value is None else str(value)
    if any(ch in _ESCAPE_NEEDED for ch in s):
        raise NotImplementedError(
            f"partition value {s!r} needs hive escaping — out of scope"
        )
    return f"{col}={s}"


def _stage_in(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    partition_by: Sequence[str],
    version: int,
) -> list[str]:
    """Write ``df`` into data/ under its partition dirs as immutable
    ``v{version}-``-prefixed files; return the new files' relative paths."""
    staging = tempfile.mkdtemp(prefix=f"vt-stage-v{version}-")
    try:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(staging)
        out: list[str] = []
        for dirpath, _dirs, files in os.walk(staging):
            rel_dir = os.path.relpath(dirpath, staging)
            for i, name in enumerate(sorted(files)):
                if not name.endswith(".parquet"):
                    continue
                dst_dir = (
                    _data_dir(root)
                    if rel_dir == "."
                    else os.path.join(_data_dir(root), rel_dir)
                )
                os.makedirs(dst_dir, exist_ok=True)
                dst_name = f"v{version}-{i:05d}-{name}"
                shutil.move(  # rename when same-device, copy otherwise
                    os.path.join(dirpath, name),
                    os.path.join(dst_dir, dst_name),
                )
                out.append(
                    dst_name
                    if rel_dir == "."
                    else os.path.join(rel_dir, dst_name)
                )
        return out
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def vt_init(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    *,
    partition_by: Sequence[str] = (),
) -> int:
    """Create version 1 from ``df``. ``root`` must not already be a
    versioned table."""
    if vt_versions(root):
        raise FileExistsError(f"versioned table already exists at {root}")
    files = _stage_in(spark, root, df, partition_by, 1)
    return _commit(root, files, 1)


def vt_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a version (latest when None) by its exact manifest file list;
    ``basePath`` preserves hive partition-column inference."""
    v = vt_latest(root) if version is None else version
    files = [os.path.join(_data_dir(root), f) for f in _read_manifest(root, v)]
    return spark.read.option("basePath", _data_dir(root)).parquet(*files)


def vt_merge(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    *,
    key_cols: Sequence[str],
    partition_by: Sequence[str] = (),
) -> int:
    """Copy-on-write MERGE: updates replace matching keys, new keys
    insert, moved keys vanish from their old partition — all without
    touching any committed file. Only the TOUCHED partitions' rows are
    rewritten into new files; untouched partitions' files are shared
    with the previous manifest verbatim."""
    keys = list(key_cols)
    prev_v = vt_latest(root)
    prev_files = _read_manifest(root, prev_v)
    cur = vt_read(spark, root, prev_v)
    if not partition_by:
        # unpartitioned: full rewrite (same degradation as merge_upsert)
        keep = cur.join(
            F.broadcast(updates.select(*keys).distinct()), keys, "left_anti"
        )
        new_files = _stage_in(
            spark, root, keep.unionByName(updates), (), prev_v + 1
        )
        return _commit(root, new_files, prev_v + 1)

    upd_keys = updates.select(*keys).distinct()
    # touched = updates' NEW partition values UNION partitions currently
    # holding the updated keys (a moved key must vanish from its OLD
    # directory — the io03 cross-partition-move contract)
    touched = (
        updates.select(*partition_by)
        .unionByName(
            cur.join(F.broadcast(upd_keys), keys, "left_semi").select(
                *partition_by
            )
        )
        .distinct()
    )
    touched_rows = touched.collect()
    touched_dirs = {
        os.path.join(*(_part_dir(c, r[c]) for c in partition_by))
        for r in touched_rows
    }
    scoped = cur.join(F.broadcast(touched), list(partition_by), "left_semi")
    keep = scoped.join(F.broadcast(upd_keys), keys, "left_anti")
    new_rows = keep.unionByName(updates.select(*cur.columns))
    new_files = _stage_in(spark, root, new_rows, partition_by, prev_v + 1)
    kept_old = [
        f for f in prev_files if os.path.dirname(f) not in touched_dirs
    ]
    return _commit(root, kept_old + new_files, prev_v + 1)


def vt_rollback(root: str, to_version: int) -> int:
    """Commit a NEW version whose manifest equals ``to_version``'s (the
    Delta RESTORE semantic) — history stays auditable, nothing is
    deleted."""
    files = _read_manifest(root, to_version)
    return _commit(root, files, vt_latest(root) + 1)
