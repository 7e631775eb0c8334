"""Sequential reference checks for the round-6 algorithmic operators:
each distributed formulation must equal the obvious single-process
loop a row-at-a-time engine would run. This is the strongest possible
evidence for the re-expression claims ("FIFO without iteration",
"cumulative-distinct without running state", "occupancy without a
per-day explode")."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from pyconnect_spark.registry import get

SF = "/root/testdata/sf0.001"


def test_x71_equals_sequential_fifo_loop(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li["q"] = li["l_quantity"].round(2)
    li["d"] = pd.to_datetime(li["l_shipdate"]).dt.date
    li = li.sort_values(["l_partkey", "d", "l_orderkey", "l_linenumber"])
    matched: dict[int, tuple[int, float, float]] = {}
    for pk, grp in li.groupby("l_partkey"):
        layers = [
            [q] for q in grp.loc[grp.l_returnflag != "R", "q"].tolist()
        ]  # FIFO queue of remaining layer quantities
        rets = grp.loc[grp.l_returnflag == "R", "q"].tolist()
        if not rets:
            continue
        n_matches = 0
        mq = 0.0
        li_idx = 0
        for r in rets:
            need = r
            while need > 1e-9 and li_idx < len(layers):
                take = min(need, layers[li_idx][0])
                if take > 1e-9:
                    n_matches += 1
                    mq += take
                    layers[li_idx][0] -= take
                    need -= take
                if layers[li_idx][0] <= 1e-9:
                    li_idx += 1
        matched[pk] = (n_matches, mq, float(sum(rets)))
    top = sorted(matched.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    got = get("x71_fifo_return_matching").builder(spark, SF).collect()
    assert len(got) == min(20, len(top))
    for row, (pk, (nm, mq, rq)) in zip(got, top):
        assert row["part_id"] == pk
        assert row["n_matches"] == nm
        assert abs(row["matched_qty"] - round(mq, 2)) < 1e-6
        assert abs(row["unmatched_qty"] - round(rq - mq, 2)) < 1e-6


def test_sm31_equals_sequential_greedy_kcenter(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    # seed: md5-ranked (hash of the decimal string, then id)
    h = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    first = int(ids[np.lexsort((ids, np.array(h)))[0]])
    chosen = [first]
    radii = [0.0]
    for _ in range(4):
        mind = None
        for cid in chosen:
            c = mat[ids == cid][0]
            # same left-to-right fold as the operator (rounded at 9 dp)
            d = np.round(((mat - c) ** 2).sum(axis=1), 9)
            mind = d if mind is None else np.minimum(mind, d)
        mask = ~np.isin(ids, chosen)
        cand_ids = ids[mask]
        cand_d = mind[mask]
        k = np.lexsort((cand_ids, -cand_d))[0]
        chosen.append(int(cand_ids[k]))
        radii.append(float(cand_d[k]))
    got = get("sm31_farthest_first_coreset").builder(spark, SF).collect()
    assert [r["vec_id"] for r in got] == chosen
    for r, rad in zip(got, radii):
        assert abs(r["radius"] - round(rad, 6)) < 1e-6


def test_ts50_equals_sequential_binseg_scan(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    ev["v2"] = ev["value"].round(2)
    daily = (
        ev.groupby(["event_type", "day"])["v2"]
        .agg(["sum", "count"])
        .reset_index()
    )
    daily["m"] = (daily["sum"] / daily["count"]).round(6)
    got = {
        r["event_type"]: r
        for r in get("ts50_changepoint_binseg").builder(spark, SF).collect()
    }
    for et, grp in daily.groupby("event_type"):
        m = grp.sort_values("day")["m"].to_numpy()
        days = grp.sort_values("day")["day"].tolist()
        best = None
        for k in range(1, len(m)):
            l, r = m[:k], m[k:]
            sse = round(
                float(((l - l.mean()) ** 2).sum() + ((r - r.mean()) ** 2).sum()),
                6,
            )
            if best is None or sse < best[0]:
                best = (sse, k, days[k - 1])
        row = got[et]
        assert row["n_pre"] == best[1]
        assert str(row["split_day"]) == str(best[2])
        assert abs(row["split_sse"] - best[0]) < 2e-6


def test_x74_equals_per_day_brute_force(spark):
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li["d"] = pd.to_datetime(li["l_shipdate"]).dt.normalize()
    close = li.groupby("l_orderkey")["d"].max()
    spans = orders[["o_orderkey", "o_orderdate"]].copy()
    spans["open"] = pd.to_datetime(spans["o_orderdate"]).dt.normalize()
    spans = spans.join(close.rename("close"), on="o_orderkey", how="inner")
    spans["close"] = spans[["close", "open"]].max(axis=1)
    # brute force: count open orders on every single day
    per_month_days = {}
    for _, r in spans.iterrows():
        for d in pd.date_range(r["open"], r["close"], freq="D"):
            key = d.strftime("%Y-%m")
            per_month_days.setdefault(key, 0)
            per_month_days[key] += 1
    got = {
        r["month"]: r
        for r in get("x74_littles_law_audit").builder(spark, SF).collect()
    }
    for month, od_days in per_month_days.items():
        if month not in got:
            continue  # months with occupancy but no arrivals are excluded
        dim = pd.Period(month).days_in_month
        assert abs(got[month]["l_observed"] - round(od_days / dim, 6)) < 1e-6
