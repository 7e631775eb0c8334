"""Independent numpy/pandas reference checks for the round-9 operators.

The DuckDB oracle proves cross-ENGINE determinism; these prove
cross-IMPLEMENTATION correctness: a third, textbook/brute-force
computation in numpy/pandas must agree with the distributed result
(operators round outputs at 6 dp, so tolerances are 1e-5 unless the
quantity is an exact integer)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyconnect_spark.registry import get

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb():
    return pd.read_parquet(f"{SF}/embeddings.parquet")


def _rows(spark, name):
    return [r.asDict() for r in get(name).builder(spark, SF).collect()]


def _daily(events):
    d = events.copy()
    d["day"] = d["ts"].dt.date
    return d.groupby(["event_type", "day"]).size().rename("x").reset_index()


def test_ts73_matches_numpy_records(spark, events):
    daily = _daily(events)
    got = {r["event_type"]: r for r in _rows(spark, "ts73_record_breaking_days")}
    for et, g in daily.groupby("event_type"):
        x = g.sort_values("day")["x"].to_numpy()
        rec = sum(1 for i in range(len(x)) if i == 0 or x[i] > x[:i].max())
        n = len(x)
        hn = sum(1.0 / i for i in range(1, n + 1))
        hn2 = sum(1.0 / (i * i) for i in range(1, n + 1))
        row = got[et]
        assert row["n_days"] == n and row["n_records"] == rec
        assert abs(row["expected_records"] - hn) < 1e-5
        assert abs(row["z_score"] - (rec - hn) / np.sqrt(hn - hn2)) < 1e-5


def test_ts74_matches_numpy_turning_points(spark, events):
    daily = _daily(events)
    got = {r["event_type"]: r for r in _rows(spark, "ts74_turning_points_test")}
    for et, g in daily.groupby("event_type"):
        x = g.sort_values("day")["x"].to_numpy()
        tp = sum(
            1
            for i in range(1, len(x) - 1)
            if (x[i] > x[i - 1] and x[i] > x[i + 1])
            or (x[i] < x[i - 1] and x[i] < x[i + 1])
        )
        n = len(x)
        row = got[et]
        assert row["n_days"] == n and row["n_turning"] == tp
        exp = 2.0 * (n - 2) / 3
        assert abs(row["expected_turning"] - exp) < 1e-5
        assert (
            abs(row["z_score"] - (tp - exp) / np.sqrt((16.0 * n - 29) / 90))
            < 1e-5
        )


def _gini_sorted(x):
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = len(x)
    i = np.arange(1, n + 1)
    return (2.0 * (i * x).sum() - (n + 1.0) * x.sum()) / (n * x.sum())


def test_ts75_matches_numpy_gini(spark, events):
    daily = _daily(events)
    got = {r["event_type"]: r for r in _rows(spark, "ts75_traffic_concentration")}
    for et, g in daily.groupby("event_type"):
        x = g["x"].to_numpy()
        row = got[et]
        assert row["n_days"] == len(x) and row["total_events"] == x.sum()
        assert abs(row["gini"] - _gini_sorted(x)) < 1e-5
        assert abs(row["peak_day_share"] - x.max() / x.sum()) < 1e-5
        top7 = np.sort(x)[-7:].sum() if len(x) >= 7 else x.sum()
        assert abs(row["top7_share"] - top7 / x.sum()) < 1e-5


def test_ts78_matches_numpy_user_concentration(spark, events):
    uc = events.groupby(["event_type", "user_id"]).size()
    got = {r["event_type"]: r for r in _rows(spark, "ts78_user_concentration")}
    for et in uc.index.get_level_values(0).unique():
        x = uc.loc[et].to_numpy()
        row = got[et]
        assert row["n_users"] == len(x) and row["n_events"] == x.sum()
        assert abs(row["gini"] - _gini_sorted(x)) < 1e-5
        xs = np.sort(x)[::-1]
        for q, col in ((0.01, "top1pct_share"), (0.1, "top10pct_share")):
            m = int(np.ceil(q * len(x)))
            assert abs(row[col] - xs[:m].sum() / x.sum()) < 1e-5


def test_x95_matches_pandas_spearman(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    got = {r["l_returnflag"]: r for r in _rows(spark, "x95_spearman_dependence")}
    for flag, g in li.groupby("l_returnflag"):
        # scipy-free Spearman: Pearson over average ranks
        rx = g["l_discount"].rank(method="average").to_numpy()
        ry = g["l_quantity"].rank(method="average").to_numpy()
        rho = np.corrcoef(rx, ry)[0, 1]
        row = got[flag]
        assert row["n_rows"] == len(g)
        assert abs(row["spearman_rho"] - rho) < 1e-5


def test_x96_matches_bruteforce_skyline(spark):
    part = pd.read_parquet(f"{SF}/part.parquet")
    pts = part[["p_retailprice", "p_size"]].to_numpy()

    def dominated(p):
        return bool(
            (
                (pts[:, 0] <= p[0])
                & (pts[:, 1] >= p[1])
                & ((pts[:, 0] < p[0]) | (pts[:, 1] > p[1]))
            ).any()
        )

    frontier = {
        (float(p[0]), int(p[1])) for p in pts if not dominated(p)
    }
    got = _rows(spark, "x96_pareto_skyline")
    assert {(r["p_retailprice"], r["p_size"]) for r in got} == frontier
    for r in got:
        at_point = part[
            (part.p_retailprice == r["p_retailprice"])
            & (part.p_size == r["p_size"])
        ]
        assert r["n_parts"] == len(at_point)
        assert r["exemplar_partkey"] == at_point.p_partkey.min()


def test_x98_matches_pandas_repurchase(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    cp = (
        j.groupby(["o_custkey", "l_partkey"])["l_orderkey"]
        .nunique()
        .rename("n_orders")
        .reset_index()
        .merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    )
    got = {r["p_brand"]: r for r in _rows(spark, "x98_sku_repurchase")}
    for brand, g in cp.groupby("p_brand"):
        row = got[brand]
        assert row["n_cust_part_pairs"] == len(g)
        assert row["n_repeat_pairs"] == int((g.n_orders >= 2).sum())
        assert abs(row["mean_orders_per_pair"] - g.n_orders.mean()) < 1e-5
        assert row["max_orders_one_pair"] == g.n_orders.max()


def test_tx60_matches_numpy_lognormal_fit(spark, docs):
    n_tok = docs["text"].str.strip().str.split(r"\s+").str.len()
    got = {r["source"]: r for r in _rows(spark, "tx60_length_lognormal_fit")}
    for src, g in n_tok.groupby(docs["source"]):
        ln = np.log(g.to_numpy(dtype=np.float64))
        row = got[src]
        assert row["n_docs"] == len(g)
        assert abs(row["mu_log"] - ln.mean()) < 1e-5
        assert abs(row["sigma_log"] - ln.std(ddof=1)) < 1e-5
        # exact median: value at rank ceil(0.5 n) of the sorted lengths
        xs = np.sort(g.to_numpy())
        assert row["median_tokens"] == xs[int(np.ceil(0.5 * len(xs))) - 1]
        assert abs(row["lognormal_median"] - np.exp(ln.mean())) < 1e-4


def test_tx58_matches_pandas_char_coverage(spark, docs):
    got = {(r["lang"], r["k"]): r for r in _rows(spark, "tx58_char_coverage_curve")}
    for lang, g in docs.groupby("lang"):
        counts = pd.Series(list("".join(g["text"]))).value_counts()
        # deterministic tiebreak: count desc, char asc
        counts = counts.reset_index()
        counts.columns = ["c", "n"]
        counts = counts.sort_values(["n", "c"], ascending=[False, True])
        tot = counts["n"].sum()
        for k in (4, 8, 16):
            row = got[(lang, k)]
            assert row["n_distinct_chars"] == len(counts)
            cov = counts["n"].head(k).sum() / tot
            assert abs(row["coverage"] - cov) < 1e-5


def test_ts77_matches_pandas_retention(spark, events):
    d = events.copy()
    d["wk"] = (d["ts"].dt.normalize() - pd.Timestamp("1970-01-05")).dt.days // 7
    uw = d[["user_id", "wk"]].drop_duplicates()
    firsts = uw.groupby("user_id")["wk"].min()
    mw = uw["wk"].max()
    got = {r["week_offset"]: r for r in _rows(spark, "ts77_weekly_retention_curve")}
    offsets = uw.merge(firsts.rename("fw"), on="user_id")
    offsets["k"] = offsets["wk"] - offsets["fw"]
    for k, row in got.items():
        eligible = int((firsts <= mw - k).sum())
        active = int((offsets["k"] == k).sum())
        assert row["n_eligible"] == eligible
        assert row["n_active"] == active
        assert abs(row["retention"] - active / eligible) < 1e-5


def test_ts79_matches_pandas_merge_asof_nearest(spark, events):
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    got = {r["o_orderkey"]: r for r in _rows(spark, "ts79_asof_nearest")}
    ev = events.sort_values("ts")
    od = orders.sort_values("o_orderdate")
    m = pd.merge_asof(
        od,
        ev[["user_id", "ts", "event_id"]],
        left_on="o_orderdate",
        right_on="ts",
        left_by="o_custkey",
        right_by="user_id",
        direction="nearest",
    )
    for _, r in m.iterrows():
        row = got[r["o_orderkey"]]
        if pd.isna(r["event_id"]):
            assert row["nearest_event_id"] is None
            continue
        # equidistant pairs resolve differently in pandas; compare deltas,
        # which are unambiguous, and ids only when the delta is unique
        delta_p = abs(
            (r["ts"] - r["o_orderdate"]).value // 1000
        )  # ns -> us
        assert row["delta_us"] == delta_p
        assert row["nearest_event_id"] is not None


def test_sm46_matches_numpy_margins(spark, emb):
    mat = np.array(emb["embedding"].tolist(), dtype=np.float64)
    labels = emb["label"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(norms, norms)
    got = {r["label"]: r for r in _rows(spark, "sm46_class_margin_matrix")}
    n = len(labels)
    iu = np.triu_indices(n, k=1)
    la, lb, cv = labels[iu[0]], labels[iu[1]], cos[iu]
    for lab in np.unique(labels):
        intra = cv[(la == lab) & (lb == lab)]
        inter = cv[((la == lab) ^ (lb == lab))]
        row = got[int(lab)]
        assert row["n_intra"] == len(intra) and row["n_inter"] == len(inter)
        assert abs(row["mean_intra_cos"] - intra.mean()) < 1e-5
        assert abs(row["mean_inter_cos"] - inter.mean()) < 1e-5
        assert abs(row["margin"] - (intra.mean() - inter.mean())) < 1e-5


def test_sm47_matches_numpy_anova(spark, emb):
    mat = np.array(emb["embedding"].tolist(), dtype=np.float64)
    labels = emb["label"].to_numpy()
    centered = mat - mat.mean(axis=0)
    nrm = np.linalg.norm(centered, axis=1)
    groups = [nrm[labels == g] for g in np.unique(labels)]
    k, nt = len(groups), len(nrm)
    grand = nrm.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    row = _rows(spark, "sm47_centroid_distance_anova")[0]
    assert row["n_labels"] == k and row["n_vecs"] == nt
    assert abs(row["f_stat"] - f) < 1e-3
    assert abs(row["eta_squared"] - ssb / (ssb + ssw)) < 1e-5
