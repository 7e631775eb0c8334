"""Sixth batch of independent reference checks (round-8 waves 11-18):
each new numeric operator recomputed with pandas/numpy textbook code —
the non-DuckDB leg of the verification triangle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyconnect_spark.registry import get

SF = "/root/testdata/sf0.001"


def test_x91_matches_numpy_theil_decomposition(spark):
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    rev = orders.groupby("o_custkey")["o_totalprice"].sum()
    df = (
        rev.rename("x")
        .reset_index()
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    )
    x = df["x"].to_numpy()
    mu = x.sum() / len(x)
    t_total = float(np.sum((x / x.sum()) * np.log(x / mu)))
    got = {r["n_name"]: r for r in get("x91_theil_inequality").builder(spark, SF).collect()}
    # per-nation rows recompute
    within_sum, between_sum = 0.0, 0.0
    for name, g in df.groupby("n_name"):
        xg = g["x"].to_numpy()
        mug = xg.sum() / len(xg)
        share = xg.sum() / x.sum()
        t_g = float(np.sum((xg / xg.sum()) * np.log(xg / mug)))
        r = got[name]
        assert r["n_customers"] == len(xg)
        assert abs(r["revenue_share"] - share) < 2e-6, name
        assert abs(r["theil_within"] - t_g) < 2e-6, name
        within_sum += r["within_contribution"]
        between_sum += r["between_term"]
    # additive decomposition: rows sum to the corpus Theil index
    assert abs((within_sum + between_sum) - t_total) < 1e-4


def test_ts68_matches_numpy_folded_r2(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    days = ev["ts"].dt.normalize()
    d = ((days - pd.Timestamp("1970-01-01")).dt.days).to_numpy()
    counts = pd.Series(1, index=range(len(d))).groupby(d).sum()
    dd, x = counts.index.to_numpy(), counts.to_numpy().astype(float)
    sst = float(np.sum((x - x.mean()) ** 2))
    got = {r["period"]: r for r in get("ts68_period_scan").builder(spark, SF).collect()}
    for p in range(2, 15):
        groups = pd.Series(x).groupby(dd % p)
        ssb = float(sum(len(g) * (g.mean() - x.mean()) ** 2 for _, g in groups))
        assert abs(got[p]["r2"] - ssb / sst) < 2e-6, p


def test_ts69_matches_pandas_lag_backtest(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    daily = (
        ev.assign(d=ev["ts"].dt.normalize())
        .groupby(["event_type", "d"])
        .size()
        .rename("x")
        .reset_index()
        .sort_values(["event_type", "d"])
    )
    got = {r["event_type"]: r for r in get("ts69_seasonal_naive_backtest").builder(spark, SF).collect()}
    for et, g in daily.groupby("event_type"):
        x = g["x"].to_numpy().astype(float)
        f1, f7 = x[6:-1], x[:-7]
        y = x[7:]
        assert got[et]["n_eval"] == len(y)
        assert abs(got[et]["mae_naive"] - np.abs(y - f1).mean()) < 2e-6
        assert abs(got[et]["mae_snaive"] - np.abs(y - f7).mean()) < 2e-6
        assert abs(got[et]["rmse_snaive"] - np.sqrt(((y - f7) ** 2).mean())) < 2e-6


def test_x92_matches_numpy_capability(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    lag = (m["l_shipdate"].dt.normalize() - m["o_orderdate"].dt.normalize()).dt.days
    got = {r["o_orderpriority"]: r for r in get("x92_cpk_ship_lag").builder(spark, SF).collect()}
    for pr, g in lag.groupby(m["o_orderpriority"]):
        v = g.to_numpy().astype(float)
        mean, sigma = v.mean(), v.std(ddof=1)
        r = got[pr]
        assert r["n_lines"] == len(v)
        assert abs(r["mean_lag"] - mean) < 2e-6
        assert abs(r["sigma_lag"] - sigma) < 2e-6
        assert abs(r["cpu_upper"] - (365 - mean) / (3 * sigma)) < 2e-6
        assert abs(r["pct_below_lsl"] - (v < 0).mean()) < 2e-6


def test_x93_matches_numpy_assortativity(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    basket = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    m = basket.merge(basket, on="l_orderkey")
    edges = m[m["l_partkey_x"] < m["l_partkey_y"]][
        ["l_partkey_x", "l_partkey_y"]
    ].drop_duplicates()
    directed = np.concatenate(
        [edges.to_numpy(), edges.to_numpy()[:, ::-1]], axis=0
    )
    deg = pd.Series(directed[:, 0]).value_counts()
    dx = deg[directed[:, 0]].to_numpy().astype(float)
    dy = deg[directed[:, 1]].to_numpy().astype(float)
    r_ref = np.corrcoef(dx, dy)[0, 1]
    got = get("x93_degree_assortativity").builder(spark, SF).collect()[0]
    assert got["n_nodes"] == len(deg)
    assert got["n_edges"] == len(edges)
    assert abs(got["assortativity"] - r_ref) < 2e-6


def test_ts70_matches_numpy_share_slopes(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    wk = ((ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days // 7)
    counts = ev.groupby([wk.rename("wk"), "event_type"]).size().rename("c").reset_index()
    counts["wk"] -= counts["wk"].min()
    tot = counts.groupby("wk")["c"].sum()
    got = {r["event_type"]: r for r in get("ts70_mix_share_drift").builder(spark, SF).collect()}
    for et in counts["event_type"].unique():
        g = counts[counts["event_type"] == et].set_index("wk")["c"]
        weeks = tot.index.to_numpy()
        h = np.round(g.reindex(weeks, fill_value=0).to_numpy() / tot.to_numpy(), 9)
        slope = np.polyfit(weeks.astype(float), h, 1)[0]
        assert abs(got[et]["share_slope_per_week"] - slope) < 2e-6, et
        assert abs(got[et]["mean_share"] - h.mean()) < 2e-6, et


def test_ts71_matches_pandas_run_lengths(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    daily = (
        ev.assign(d=(ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days)
        .groupby(["event_type", "d"])
        .size()
        .rename("x")
        .reset_index()
    )
    got = {r["event_type"]: r for r in get("ts71_anomaly_run_lengths").builder(spark, SF).collect()}
    for et, g in daily.groupby("event_type"):
        x = g["x"].to_numpy().astype(float)
        mu, sd = x.mean(), x.std(ddof=0)  # population, matching the gate
        anom_days = g["d"].to_numpy()[np.abs(x - mu) > 2 * sd]
        runs = np.split(anom_days, np.where(np.diff(anom_days) != 1)[0] + 1)
        runs = [r for r in runs if len(r)]
        if et not in got:
            assert not runs, et
            continue
        assert got[et]["n_anom_days"] == sum(len(r) for r in runs)
        assert got[et]["n_runs"] == len(runs)
        assert got[et]["max_run_len"] == max(len(r) for r in runs)


def test_x94_matches_pandas_percentiles(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["event_type"].isin(["view", "purchase"])]
    # resolution-proof epoch microseconds (pandas may surface the
    # TIMESTAMP(NANOS) column as datetime64[us] or [ns])
    us = (ev["ts"] - pd.Timestamp(0)) // pd.Timedelta("1us")
    fv = us[ev["event_type"] == "view"].groupby(ev["user_id"]).min()
    fp = us[ev["event_type"] == "purchase"].groupby(ev["user_id"]).min()
    both = pd.concat([fv.rename("v"), fp.rename("p")], axis=1).dropna()
    conv = both[both["p"] >= both["v"]]
    delta = (conv["p"] - conv["v"]).astype("int64")
    order = np.lexsort((conv.index.to_numpy(), delta.to_numpy()))
    d_sorted = delta.to_numpy()[order]
    n = len(d_sorted)
    got = get("x94_time_to_convert").builder(spark, SF).collect()[0]
    assert got["n_viewers"] == fv.notna().sum()
    assert got["n_converted"] == n
    assert got["p50_delta_s"] == d_sorted[int(np.ceil(0.5 * n)) - 1] // 1_000_000
    assert got["p90_delta_s"] == d_sorted[int(np.ceil(0.9 * n)) - 1] // 1_000_000
    assert abs(got["mean_delta_s"] - d_sorted.mean() / 1e6) < 2e-6


def test_sm42_matches_numpy_knn_vote(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(nrm, nrm)
    np.fill_diagonal(cos, -np.inf)
    correct = {}
    agree_n = {}
    for i in range(len(ids)):
        order = np.lexsort((ids, -cos[i]))[:5]
        nn_labels = labels[order]
        vals, cnts = np.unique(nn_labels, return_counts=True)
        pred = vals[np.lexsort((vals, -cnts))][0]
        lbl = labels[i]
        correct.setdefault(lbl, []).append(pred == lbl)
        agree_n.setdefault(lbl, []).append((nn_labels == lbl).sum())
    got = {r["label"]: r for r in get("sm42_knn_label_agreement").builder(spark, SF).collect()}
    for lbl in correct:
        r = got[lbl]
        assert r["n_vecs"] == len(correct[lbl])
        assert r["n_correct"] == sum(correct[lbl]), lbl
        assert abs(r["mean_neighbor_agreement"] - sum(agree_n[lbl]) / (5 * len(agree_n[lbl]))) < 2e-6


def test_ts72_matches_numpy_profile_cosines(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    wk = ((ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days // 7)
    hr = ev["ts"].dt.hour
    counts = ev.groupby(["event_type", wk.rename("wk"), hr.rename("hr")]).size()
    got = {r["event_type"]: r for r in get("ts72_hourly_profile_stability").builder(spark, SF).collect()}
    for et in counts.index.get_level_values(0).unique():
        g = counts[et].unstack(fill_value=0)
        weeks = sorted(g.index)
        cos = []
        for w1, w2 in zip(weeks, weeks[1:]):
            # consecutive calendar weeks only (the engine joins wk+1)
            if w2 != w1 + 1:
                continue
            a, b = g.loc[w1].to_numpy(float), g.loc[w2].to_numpy(float)
            cos.append(
                (w1, round(float(a @ b / np.sqrt((a @ a) * (b @ b))), 9))
            )
        r = got[et]
        assert r["n_week_pairs"] == len(cos)
        assert abs(r["mean_cos"] - np.mean([c for _, c in cos])) < 2e-6
        assert abs(r["min_cos"] - min(c for _, c in cos)) < 2e-6
        assert r["worst_week_start"] == min(cos, key=lambda t: (t[1], t[0]))[0]
