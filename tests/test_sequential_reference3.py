"""Third batch of independent reference checks: ts49's rolling frames vs
pandas.rolling, sm28's mined negatives vs a numpy argsort, dd30's
contamination counts vs a numpy pairwise sweep, and tx44's first-prefix
min-agg vs the sequential cumulative-distinct scan it replaces."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyconnect_spark.registry import get

SF = "/root/testdata/sf0.001"


def test_ts49_matches_pandas_rolling(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.sort_values(["ts", "event_id"])
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    closes = (
        ev.groupby(["event_type", "day"], as_index=False)
        .last()[["event_type", "day", "value"]]
        .sort_values(["event_type", "day"])
    )
    got = {
        r["event_type"]: r
        for r in get("ts49_bollinger_bands").builder(spark, SF).collect()
    }
    for et, grp in closes.groupby("event_type"):
        c = grp["value"].reset_index(drop=True)
        mid = c.rolling(20).mean()
        sd = c.rolling(20).std(ddof=1)
        ok = sd.notna() & (sd > 1e-9)
        up = (round(c - (mid + 2 * sd), 6) > 0) & ok
        dn = (round((mid - 2 * sd) - c, 6) > 0) & ok
        if et not in got:
            assert ok.sum() == 0
            continue
        row = got[et]
        assert row["n_scored"] == int(ok.sum())
        assert row["n_breakout_up"] == int(up.sum())
        assert row["n_breakout_down"] == int(dn.sum())
        assert abs(row["mean_band_width"] - round((4 * sd[ok]).mean(), 6)) < 1e-5


def test_sm28_matches_numpy_argsort(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    got = get("sm28_hard_negative_mining").builder(spark, SF).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid in (1, 2, 3, 4, 5):
        q = mat[ids == qid][0]
        ql = labels[ids == qid][0]
        mask = labels != ql
        cos = np.round(
            (mat[mask] @ q) / (norms[mask] * np.linalg.norm(q)), 9
        )
        order = np.lexsort((ids[mask], -cos))[:3]
        want = list(zip(ids[mask][order], np.round(cos[order], 6)))
        rows = sorted(by_q[qid], key=lambda r: r["rk"])
        assert [(r["neg_id"], r["cos_sim"]) for r in rows] == [
            (int(i), float(c)) for i, c in want
        ]


def test_dd30_matches_numpy_pairwise(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    ev_mask = ids % 20 == 0
    tr_mask = ~ev_mask
    sims = np.round(
        (mat[tr_mask] @ mat[ev_mask].T)
        / np.outer(norms[tr_mask], norms[ev_mask]),
        9,
    )
    hits = sims >= 0.4
    got = {
        r["label"]: r
        for r in get("dd30_semantic_decontamination").builder(spark, SF).collect()
    }
    for lbl in np.unique(labels[tr_mask]):
        lm = labels[tr_mask] == lbl
        row = got[int(lbl)]
        assert row["n_train"] == int(lm.sum())
        assert row["n_pairs"] == int(hits[lm].sum())
        assert row["n_flagged"] == int(hits[lm].any(axis=1).sum())


def test_tx44_min_agg_equals_sequential_prefix_scan(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["bkt"] = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 8 + 1
        for i in docs["doc_id"]
    ]
    # sequential cumulative-distinct scan over prefixes 1..8
    seen: set[str] = set()
    vocab_at, tokens_at = [], []
    tok_total = 0
    for k in range(1, 9):
        for text in docs.loc[docs.bkt == k, "text"]:
            ws = text.strip().split()
            if len(ws) < 3:
                continue
            for i in range(len(ws) - 2):
                g = " ".join(ws[i : i + 3])
                seen.add(g)
                tok_total += 1
        vocab_at.append(len(seen))
        tokens_at.append(tok_total)
    got = get("tx44_heaps_law").builder(spark, SF).collect()[0]
    assert got["n_tokens"] == tokens_at[-1]
    assert got["vocab"] == vocab_at[-1]
    # the fitted beta must equal the closed-form OLS over the same points
    x = np.round(np.log(tokens_at), 9)
    y = np.round(np.log(vocab_at), 9)
    beta = ((len(x) * (x * y).sum() - x.sum() * y.sum())
            / (len(x) * (x * x).sum() - x.sum() ** 2))
    assert abs(got["beta"] - beta) < 1e-5
