"""Driver-style strict sweep: every queries() entry vs its oracle_sql() at
sf0.01, comparing pandas-level dtypes AND canonical values.

Catches the class of bug the round-1 verify probe missed: DuckDB SUM(BIGINT)
returns HUGEINT which pandas renders float64 (15.0) while Spark renders int64
(15) — identical values, different canonical strings, driver hash mismatch.

Usage: python tools/strict_sweep.py [name ...]   (no args = all queries)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """Sort columns by name, stringify values distinguishing int vs float,
    sort rows. Returns (dtype summary, canonical rows)."""
    df = df[sorted(df.columns)]
    dtypes = [f"{c}:{df[c].dtype}" for c in df.columns]

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float) and (v != v):  # NaN
            return "∅"
        if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
            return f"i:{int(v)}"
        if isinstance(v, (np.floating, float)):
            return f"f:{round(float(v), 9)!r}"
        if isinstance(v, (np.bool_, bool)):
            return f"b:{bool(v)}"
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return f"s:{v}"

    try:
        rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    except TypeError:
        rows = sorted(
            (tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)),
            key=lambda t: str(t),
        )
    return dtypes, rows


# ---------------------------------------------------------------------------
# Bounds checks for the declared rows-only queries (oracle=None): the sketch
# tx27's zlib scorer has no DuckDB twin (external codec), but DuckDB CAN
# bound the quantities it reports — the one remaining rows-only query
# prints a bounds verdict instead of a bare "rows-only". (x49/ts40/dd24
# left this class in round 7: their sketches are md5-deterministic now
# and hash-checked like everything else.)
# ---------------------------------------------------------------------------








def _bounds_tx27(spd, con) -> list[str]:
    """zlib ratio: no SQL twin exists for the codec, but DuckDB's raw byte
    lengths bound it — compressed bytes are positive and cannot exceed
    raw + zlib envelope overhead (~11 B + 5 B per 16 KiB block); the
    flagged column must re-derive from the ratio; doc_id sets match."""
    o = con.sql(
        "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS raw "
        "FROM documents"
    ).df().set_index("doc_id")["raw"]
    probs = []
    if set(spd["doc_id"]) != set(o.index):
        probs.append("doc_id sets differ")
        return probs
    for r in spd.itertuples(index=False):
        raw = max(int(o[r.doc_id]), 1)
        comp = r.zlib_ratio * raw
        if not (8.0 <= comp <= raw + 11 + 5 * (raw // 16384 + 1)):
            probs.append(f"doc {r.doc_id}: ratio {r.zlib_ratio} out of zlib envelope")
        expect_flag = 1 if (r.zlib_ratio < 0.25 or r.zlib_ratio > 0.95) else 0
        if int(r.flagged) != expect_flag:
            probs.append(f"doc {r.doc_id}: flagged {r.flagged} != {expect_flag}")
    return probs


BOUNDS_CHECKS = {
    "tx27_compression_quality": _bounds_tx27,
}


def main() -> None:
    # SWEEP_CORES / SWEEP_PARTITIONS let a second sweep run under a
    # DIFFERENT partitioning (e.g. cores=5, partitions=7): any query whose
    # result depends on partition count or intra-partition order (an
    # unpinned collect_list, a first() without sort) flips its hash there
    # even though the default sweep is green.
    cores = os.environ.get("SWEEP_CORES", "8")
    parts = os.environ.get("SWEEP_PARTITIONS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.default.parallelism", cores)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{SF}/{tname}.parquet')"
        )

    names = sys.argv[1:] or list(qs)
    n_bad = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF)
            spd = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} SPARK-ERR {type(exc).__name__}: {exc}", flush=True)
            n_bad += 1
            continue
        if name not in osql:
            check = BOUNDS_CHECKS.get(name)
            if check is None:
                print(
                    f"{name:28s} rows-only  n={len(spd)}  {time.time()-t0:.1f}s",
                    flush=True,
                )
                continue
            try:
                probs = check(spd, con)
            except Exception as exc:  # noqa: BLE001
                probs = [f"{type(exc).__name__}: {exc}"]
            if probs:
                n_bad += 1
                print(f"{name:28s} BOUNDS-FAIL  {' | '.join(probs)[:300]}", flush=True)
            else:
                print(
                    f"{name:28s} bounds-ok  n={len(spd)}  {time.time()-t0:.1f}s",
                    flush=True,
                )
            continue
        try:
            opd = con.sql(osql[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ORACLE-ERR {type(exc).__name__}: {exc}", flush=True)
            n_bad += 1
            continue
        sd, sr = canon_frame(spd)
        od, orows = canon_frame(opd)
        issues = []
        if sorted(spd.columns) != sorted(opd.columns):
            issues.append(f"COLS spark={sorted(spd.columns)} oracle={sorted(opd.columns)}")
        if sd != od:
            issues.append(f"DTYPES spark={sd} oracle={od}")
        if len(sr) != len(orows):
            issues.append(f"NROWS spark={len(sr)} oracle={len(orows)}")
        elif sr != orows:
            diffs = [(a, b) for a, b in zip(sr, orows) if a != b][:3]
            issues.append(f"VALUES first-diffs={diffs}")
        if issues:
            n_bad += 1
            print(f"{name:28s} STRICT-FAIL  {' | '.join(issues)}", flush=True)
        else:
            print(f"{name:28s} ok  n={len(sr)}  {time.time()-t0:.1f}s", flush=True)
    print(f"DONE bad={n_bad}/{len(names)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
