"""Fourth batch of independent reference checks: tx41's trained NB vs a
numpy implementation, tx42's novelty rate vs a python set sweep, tx43's
ablation grid vs pandas boolean masks, ts52's peaks vs a numpy scan,
x73's blocking audit vs a pandas loop with python Levenshtein."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from pyconnect_spark.registry import get

SF = "/root/testdata/sf0.001"

_STOP = re.compile(r"\b(the|a|of|and|value|row)\b")
_PUNCT = re.compile(r"[^\w\s]")


def _md5_bucket(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def test_tx41_matches_numpy_naive_bayes(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    rows = []
    for _, r in docs.iterrows():
        for w in r["text"].strip().split():
            rows.append((r["doc_id"], r["source"], _md5_bucket(w, 512)))
    df = pd.DataFrame(rows, columns=["doc", "src", "b"])
    counts = df.groupby(["doc", "src", "b"]).size().rename("n").reset_index()
    classes = sorted(df["src"].unique())
    cb = df.groupby(["src", "b"]).size()
    cs = df.groupby("src").size()
    nd = counts.groupby("src")["doc"].nunique()
    d_total = counts["doc"].nunique()
    buckets = sorted(df["b"].unique())
    ll = {
        (c, b): round(float(np.log((cb.get((c, b), 0) + 1) / (cs[c] + 512))), 9)
        for c in classes
        for b in buckets
    }
    prior = {c: round(float(np.log(nd[c] / d_total)), 9) for c in classes}
    pred_rows = []
    for (doc, src), grp in counts.groupby(["doc", "src"]):
        scores = {}
        for c in classes:
            s = prior[c] + sum(
                round(n * ll[(c, b)], 9)
                for b, n in zip(grp["b"], grp["n"])
            )
            scores[c] = round(s, 9)
        best = min(classes, key=lambda c: (-scores[c], c))
        pred_rows.append((src, best))
    want = pd.DataFrame(pred_rows, columns=["source", "pred"]).groupby(
        ["source", "pred"]
    ).size().to_dict()
    got = {
        (r["source"], r["pred_source"]): r["n_docs"]
        for r in get("tx41_nb_source_classifier").builder(spark, SF).collect()
    }
    assert got == {k: int(v) for k, v in want.items()}


def test_tx42_matches_python_set_sweep(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    split = {
        r["doc_id"]: (
            "train"
            if int(hashlib.md5(r["text"].encode()).hexdigest()[:8], 16) % 100 < 80
            else "eval"
        )
        for _, r in docs.iterrows()
    }
    train_set, ev = set(), []
    for _, r in docs.iterrows():
        ws = r["text"].strip().split()
        grams = [" ".join(ws[i : i + 4]) for i in range(len(ws) - 3)]
        if split[r["doc_id"]] == "train":
            train_set.update(grams)
        else:
            ev.extend((r["source"], g) for g in grams)
    want = {}
    for src, g in ev:
        tot, hit = want.get(src, (0, 0))
        want[src] = (tot + 1, hit + (g in train_set))
    got = {
        r["source"]: (r["n_eval_grams"], r["n_seen_in_train"])
        for r in get("tx42_ngram_novelty_rate").builder(spark, SF).collect()
    }
    assert got == want


def test_tx43_matches_pandas_masks(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n_tok = docs["text"].str.strip().str.split(r"\s+").str.len()
    n_stop = docs["text"].apply(lambda t: len(_STOP.findall(t)))
    n_punct = docs["text"].apply(lambda t: len(_PUNCT.findall(t)))
    len_ok = docs["text"].str.len() >= 200
    stop_ok = n_stop * 20 >= n_tok
    punct_ok = n_punct * 5 <= docs["text"].str.len()
    got = {
        r["filters"]: (r["n_docs"], r["n_tokens"])
        for r in get("tx43_filter_ablation_grid").builder(spark, SF).collect()
    }
    combos = {
        "none": pd.Series(True, index=docs.index),
        "len": len_ok,
        "stop": stop_ok,
        "punct": punct_ok,
        "len+stop": len_ok & stop_ok,
        "len+punct": len_ok & punct_ok,
        "stop+punct": stop_ok & punct_ok,
        "len+stop+punct": len_ok & stop_ok & punct_ok,
    }
    for name, mask in combos.items():
        assert got[name] == (int(mask.sum()), int(n_tok[mask].sum())), name


def test_ts52_matches_numpy_peak_scan(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    ev["v2"] = ev["value"].round(2)
    daily = (
        ev.groupby(["event_type", "day"])["v2"].agg(["sum", "count"]).reset_index()
    )
    daily["m"] = (daily["sum"] / daily["count"]).round(6)
    want = []
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day").reset_index(drop=True)
        m = grp["m"].to_numpy()
        for i in range(2, len(m) - 2):
            if not (m[i] > m[i - 1] and m[i] > m[i - 2] and m[i] > m[i + 1] and m[i] > m[i + 2]):
                continue
            lo, hi = i - 7, i + 8
            if lo < 0 or hi > len(m):
                continue
            med = float(np.median(m[lo:hi]))
            prom = round(float(m[i]) - med, 6)
            if prom > 0:
                want.append((prom, et, str(grp["day"][i])))
    want = sorted(want, key=lambda x: (-x[0], x[1], x[2]))[:20]
    got = get("ts52_peak_prominence").builder(spark, SF).collect()
    assert [(r["prominence"], r["event_type"], r["day"]) for r in got] == want


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_x73_matches_pandas_blocking_loop(spark):
    part = pd.read_parquet(f"{SF}/part.parquet")
    part["blk"] = part["p_name"].str.split(" ").str[0]
    want = {}
    for blk, grp in part.groupby("blk"):
        names = grp.sort_values("p_partkey")["p_name"].tolist()
        n_pairs = n_exact = n_near = 0
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                d = _lev(names[i], names[j])
                n_pairs += 1
                n_exact += d == 0
                n_near += 1 <= d <= 3
        if n_pairs:
            want[blk] = (len(names), n_pairs, n_exact, n_near)
    top = sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    got = get("x73_er_blocking_audit").builder(spark, SF).collect()
    assert [(r["blk"], r["n_members"], r["n_pairs"], r["n_exact"], r["n_near"]) for r in got] == [
        (blk, nm, np_, ne, nn) for blk, (nm, np_, ne, nn) in top
    ]
