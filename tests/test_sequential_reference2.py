"""Second batch of sequential/numpy reference checks (round-6 waves):
sm27's pruned MIPS must equal unpruned brute force; sm29's probe must
equal the textbook diagonal-LDA computation; ts51 must equal per-segment
polyfit; x72 must equal a pandas basket count."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyconnect_spark.registry import get

SF = "/root/testdata/sf0.001"


def test_sm27_equals_unpruned_brute_force(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = mat[ids == 2][0]
    mask = ids != 2
    ip = np.round(mat[mask] @ q, 9)
    cand = sorted(zip(-ip, ids[mask]))[:10]
    got = get("sm27_mips_norm_pruned").builder(spark, SF).collect()
    assert [r["vec_id"] for r in got] == [int(i) for _, i in cand]
    for r, (nip, _) in zip(got, cand):
        assert abs(r["ip"] - round(-nip, 6)) < 2e-6


def test_sm29_equals_textbook_diag_lda(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    y = (emb["label"].to_numpy() % 2).astype(int)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    m0 = np.round(mat[y == 0].mean(axis=0), 6)
    m1 = np.round(mat[y == 1].mean(axis=0), 6)
    s0 = np.round(mat[y == 0].var(axis=0, ddof=1), 6)
    s1 = np.round(mat[y == 1].var(axis=0, ddof=1), 6)
    n0, n1 = (y == 0).sum(), (y == 1).sum()
    vp = np.round(((n0 - 1) * s0 + (n1 - 1) * s1) / (n0 + n1 - 2), 9)
    w = np.round((m1 - m0) / (vp + 1e-6), 6)
    c = float(np.sum(np.round(w * (m0 + m1) / 2, 9)))
    s = mat @ w
    pred = (np.round(s - c, 9) > 0).astype(int)
    want = (
        pd.DataFrame({"cls": y, "pred": pred})
        .groupby(["cls", "pred"])
        .size()
        .to_dict()
    )
    got = {
        (r["cls"], r["pred"]): r["n"]
        for r in get("sm29_diag_lda_probe").builder(spark, SF).collect()
    }
    assert got == {k: int(v) for k, v in want.items()}


def test_ts51_equals_per_segment_polyfit(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.normalize()
    ev["v2"] = ev["value"].round(2)
    daily = (
        ev.groupby(["event_type", "day"])["v2"].agg(["sum", "count"]).reset_index()
    )
    daily["m"] = (daily["sum"] / daily["count"]).round(6)
    got = {
        r["event_type"]: r
        for r in get("ts51_interrupted_time_series").builder(spark, SF).collect()
    }
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day")
        t = (grp["day"] - grp["day"].min()).dt.days.to_numpy()
        m = grp["m"].to_numpy()
        split = t.max() // 2
        pre, post = t <= split, t > split
        if pre.sum() < 3 or post.sum() < 3 or et not in got:
            continue
        b1, a1 = np.polyfit(t[pre], m[pre], 1)
        b2, a2 = np.polyfit(t[post], m[post], 1)
        row = got[et]
        assert abs(row["pre_slope"] - b1) < 1e-5
        assert abs(row["post_slope"] - b2) < 1e-5
        assert (
            abs(row["level_change_at_split"] - ((a2 + b2 * split) - (a1 + b1 * split)))
            < 1e-4
        )


def test_x72_equals_pandas_basket_count(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_baskets = items["l_orderkey"].nunique()
    item_n = items.groupby("l_partkey").size()
    pairs = {}
    for _, grp in items.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"].tolist())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pairs[(ps[i], ps[j])] = pairs.get((ps[i], ps[j]), 0) + 1
    scored = [
        (
            round(n_baskets * n / (item_n[a] * item_n[b]), 9),
            a,
            b,
            n,
        )
        for (a, b), n in pairs.items()
        if n >= 3
    ]
    top = sorted(scored, key=lambda x: (-x[0], x[1], x[2]))[:20]
    got = get("x72_association_rules").builder(spark, SF).collect()
    assert len(got) == len(top)
    for r, (lift, a, b, n) in zip(got, top):
        assert (r["part_a"], r["part_b"], r["n_pair"]) == (a, b, n)
        assert abs(r["lift"] - round(lift, 6)) < 2e-6
