"""Fifth batch of independent reference checks: sm32 vs numpy prefix
cosines, tx45 vs a pandas data card, ts53 vs a pandas detector ensemble."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from pyconnect_spark.registry import get

SF = "/root/testdata/sf0.001"

_STOP = re.compile(r"\b(the|a|of|and|value|row)\b")
_PUNCT = re.compile(r"[^\w\s]")


def test_sm32_matches_numpy_prefix_cosines(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = mat[ids == 3][0]
    mask = ids != 3

    def top5(d):
        m = mat[mask][:, :d]
        qq = q[:d]
        cos = np.round(
            (m @ qq) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qq)), 9
        )
        return set(ids[mask][np.lexsort((ids[mask], -cos))[:5]])

    full = top5(64)
    got = {
        r["n_dims"]: r["n_overlap"]
        for r in get("sm32_matryoshka_recall").builder(spark, SF).collect()
    }
    for d in (64, 32, 16, 8):
        assert got[d] == len(top5(d) & full), d


def test_tx45_matches_pandas_card(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n_tok = docs["text"].str.strip().str.split(r"\s+").str.len()
    n_stop = docs["text"].apply(lambda t: len(_STOP.findall(t)))
    n_punct = docs["text"].apply(lambda t: len(_PUNCT.findall(t)))
    qpass = (
        (docs["text"].str.len() >= 200)
        & (n_stop * 20 >= n_tok)
        & (n_punct * 5 <= docs["text"].str.len())
    )
    fp = docs["text"].apply(lambda t: hashlib.md5(t.encode()).hexdigest())
    got = get("tx45_data_card").builder(spark, SF).collect()[0]
    assert got["n_docs"] == len(docs)
    assert got["n_tokens"] == int(n_tok.sum())
    assert got["n_langs"] == docs["lang"].nunique()
    assert got["n_sources"] == docs["source"].nunique()
    assert abs(got["exact_dup_rate"] - round(1 - fp.nunique() / len(docs), 6)) < 1e-9
    assert abs(got["quality_pass_rate"] - round(qpass.mean(), 6)) < 1e-9
    top = docs.groupby("source").size().reset_index(name="c").sort_values(
        ["c", "source"], ascending=[False, True]
    ).iloc[0]
    assert got["top_source"] == top["source"]
    assert abs(got["top_source_share"] - round(top["c"] / len(docs), 6)) < 1e-9


def test_ts53_matches_pandas_ensemble(spark):
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
        m = grp["m"].to_numpy(dtype=float)
        mu, sd = m.mean(), m.std(ddof=1)
        med = float(np.median(m))
        mad = float(np.median(np.abs(m - med)))
        dd = np.diff(m)
        dsd = dd.std(ddof=1) if len(dd) > 1 else 0.0
        for i in range(len(m)):
            fz = int(sd > 1e-9 and round(abs(m[i] - mu) / sd, 6) > 2)
            fm = int(mad > 1e-9 and round(abs(m[i] - med) / (1.4826 * mad), 6) > 3)
            fj = int(
                i > 0 and dsd > 1e-9 and round(abs(m[i] - m[i - 1]) / dsd, 6) > 2
            )
            if fz + fm + fj >= 2:
                want.append((et, str(grp["day"][i]), fz + fm + fj))
    got = [
        (r["event_type"], r["day"], r["votes"])
        for r in get("ts53_anomaly_ensemble").builder(spark, SF).collect()
    ]
    assert got == sorted(want)


def test_tx46_matches_python_mask_plan(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    agg = {}
    for _, r in docs.iterrows():
        n = len(r["text"].strip().split())
        n_spans = int(n * 0.15 // 3)
        if n_spans < 1:
            continue
        pos = set()
        for k in range(1, n_spans + 1):
            h = hashlib.md5(f"{r['doc_id']}-{k}".encode()).hexdigest()
            start = 1 + int(h[:15], 16) % max(n - 2, 1)
            pos.update(min(start + o, n) for o in range(3))
        d, t, s, m = agg.get(r["source"], (0, 0, 0, 0))
        agg[r["source"]] = (d + 1, t + n, s + n_spans, m + len(pos))
    got = {
        r["source"]: (r["n_docs_masked"], r["n_tokens"], r["n_spans"], r["n_masked"])
        for r in get("tx46_span_corruption_plan").builder(spark, SF).collect()
    }
    assert got == agg


def test_tx54_matches_pandas_mattr(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    W = 20

    def mattr(text):
        w = re.split(r"\s+", text.strip())
        if len(w) >= W:
            s = sum(
                len(set(w[i : i + W])) for i in range(len(w) - W + 1)
            )
            return round(s / (W * (len(w) - W + 1)), 9)
        return round(len(set(w)) / len(w), 9)

    docs["m"] = docs["text"].map(mattr)
    ref = docs.groupby("source")["m"].mean()
    got = {
        r["source"]: r.asDict()
        for r in get("tx54_mattr_lexical_diversity")
        .builder(spark, SF)
        .collect()
    }
    for src, mean_m in ref.items():
        assert abs(got[src]["mean_mattr"] - mean_m) < 1e-5


def test_sm39_matches_numpy_quantized_ranking(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }
    q = vecs[3]
    qn = q / np.linalg.norm(q)

    def top10(bits):
        rows = []
        for vid, v in vecs.items():
            if vid == 3:
                continue
            if bits is not None:
                lim = {8: 127, 4: 7, 2: 1}[bits]
                mx = np.abs(v).max()
                scale = mx / lim if mx > 0 else 1.0
                # engine rounds HALF-UP (F.round); numpy rounds half-even
                qv = np.floor(np.abs(v / scale) + 0.5) * np.sign(v / scale)
                v = qv * scale
            nv = np.linalg.norm(v)
            c = v @ qn / (nv if nv > 0 else 1.0)
            rows.append((round(c, 9), vid))
        rows.sort(key=lambda t: (-t[0], t[1]))
        return [vid for _, vid in rows[:10]]

    exact = set(top10(None))
    got = {
        int(r["bits"]): r.asDict()
        for r in get("sm39_quantization_recall_curve")
        .builder(spark, SF)
        .collect()
    }
    for bits in (8, 4, 2):
        ref_overlap = len(set(top10(bits)) & exact)
        assert got[bits]["n_overlap"] == ref_overlap
        assert abs(got[bits]["recall_at_10"] - ref_overlap / 10) < 1e-9


def test_tx55_matches_scipy_free_jsd(spark):
    from collections import Counter

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    dists = {}
    for src, sub in docs.groupby("source"):
        c = Counter()
        for text in sub["text"]:
            c.update(re.split(r"\s+", text.strip()))
        tot = sum(c.values())
        dists[src] = {w: n / tot for w, n in c.items()}
    got = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in get("tx55_jsd_source_matrix").builder(spark, SF).collect()
    }
    srcs = sorted(dists)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            p, q = dists[sa], dists[sb]
            jsd = 0.0
            for w in set(p) | set(q):
                pw, qw = p.get(w, 0.0), q.get(w, 0.0)
                m = (pw + qw) / 2
                if pw > 0:
                    jsd += 0.5 * pw * np.log2(pw / m)
                if qw > 0:
                    jsd += 0.5 * qw * np.log2(qw / m)
            row = got[(sa, sb)]
            assert abs(row["jsd_bits"] - jsd) < 1e-5
            assert row["n_common_vocab"] == len(set(p) & set(q))
