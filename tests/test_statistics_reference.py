"""Independent numpy reference checks for the classical-statistics
operators (x76-x80). The DuckDB oracle proves cross-ENGINE determinism;
these prove cross-IMPLEMENTATION correctness: a third, textbook-formula
computation in numpy/pandas must agree with the distributed result to
1e-5 (the operators round outputs at 6 dp)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyconnect_spark.registry import get

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events():
    df = pd.read_parquet(f"{SF}/events.parquet")
    df["value"] = df["value"].round(2)  # operators cast to DECIMAL(12,2)
    return df


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _row(spark, name):
    out = get(name).builder(spark, SF).collect()
    assert len(out) == 1
    return out[0].asDict()


def test_x79_matches_textbook_welch(spark, events):
    a = events.loc[events.event_type == "view", "value"].to_numpy()
    b = events.loc[events.event_type == "click", "value"].to_numpy()
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se = v1 / len(a) + v2 / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se)
    dof = se**2 / (
        (v1 / len(a)) ** 2 / (len(a) - 1) + (v2 / len(b)) ** 2 / (len(b) - 1)
    )
    got = _row(spark, "x79_welch_t_test")
    assert got["n1"] == len(a) and got["n2"] == len(b)
    assert abs(got["t_stat"] - t) < 1e-5
    assert abs(got["welch_dof"] - dof) < 1e-3


def test_x80_matches_textbook_mann_whitney(spark, events):
    a = events.loc[events.event_type == "view", "value"].to_numpy()
    b = events.loc[events.event_type == "click", "value"].to_numpy()
    pooled = np.concatenate([a, b])
    # average ranks with ties (scipy.stats.rankdata 'average' semantics)
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled))
    sorted_vals = pooled[order]
    i = 0
    while i < len(sorted_vals):
        j = i
        while j + 1 < len(sorted_vals) and sorted_vals[j + 1] == sorted_vals[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    r1 = ranks[: len(a)].sum()
    u1 = r1 - len(a) * (len(a) + 1) / 2
    n1, n2, nn = len(a), len(b), len(a) + len(b)
    _, counts = np.unique(pooled, return_counts=True)
    tie_t = float((counts**3 - counts).sum())
    var = n1 * n2 / 12 * ((nn + 1) - tie_t / (nn * (nn - 1)))
    z = (u1 - n1 * n2 / 2) / np.sqrt(var)
    got = _row(spark, "x80_mann_whitney_u")
    assert got["n1"] == n1 and got["n2"] == n2
    assert abs(got["u_stat"] - u1) < 1e-5
    assert abs(got["z_stat"] - z) < 1e-5


def test_x78_matches_textbook_anova(spark, events):
    groups = [g["value"].to_numpy() for _, g in events.groupby("event_type")]
    grand = np.concatenate(groups)
    ssb = sum(len(g) * (g.mean() - grand.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(grand)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = _row(spark, "x78_anova_oneway")
    assert got["n_groups"] == k and got["n_rows"] == n
    assert abs(got["f_stat"] - f) < 1e-4
    assert abs(got["ss_between"] - ssb) < 1e-2
    assert abs(got["ss_within"] - ssw) < 1e-2


def test_x76_matches_textbook_chi2(spark, docs):
    ct = pd.crosstab(docs["source"], docs["lang"]).to_numpy().astype(float)
    rowt = ct.sum(axis=1, keepdims=True)
    colt = ct.sum(axis=0, keepdims=True)
    e = rowt @ colt / ct.sum()
    chi2 = ((ct - e) ** 2 / e).sum()
    v = np.sqrt(chi2 / (ct.sum() * min(ct.shape[0] - 1, ct.shape[1] - 1)))
    got = _row(spark, "x76_chi_square_independence")
    assert got["n_cells"] == ct.size
    assert got["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert abs(got["chi2"] - chi2) < 1e-4
    assert abs(got["cramers_v"] - v) < 1e-5


def test_x77_matches_textbook_ks(spark, events):
    a = np.sort(events.loc[events.event_type == "view", "value"].to_numpy())
    b = np.sort(events.loc[events.event_type == "click", "value"].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(f1 - f2).max()
    got = _row(spark, "x77_ks_two_sample")
    assert got["n1"] == len(a) and got["n2"] == len(b)
    assert abs(got["ks_d"] - d) < 1e-5


def test_x75_bootstrap_ci_brackets_sample_mean(spark):
    # not a formula identity (the resamples are md5-deterministic), but
    # the CI must bracket the plain sample mean and be ordered
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    mean = orders["o_totalprice"].round(2).mean()
    got = _row(spark, "x75_poisson_bootstrap_ci")
    assert got["n_resamples"] == 32
    assert got["ci_lo"] < got["ci_hi"]
    assert got["ci_lo"] < mean < got["ci_hi"]


def test_x86_matches_textbook_kruskal_wallis(spark, events):
    vals = events["value"].to_numpy()
    groups = events["event_type"].to_numpy()
    order = np.argsort(vals, kind="mergesort")
    ranks = np.empty(len(vals))
    sv = vals[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2  # 1-based average rank
        i = j
    n = len(vals)
    h = 0.0
    for g in np.unique(groups):
        r = ranks[groups == g]
        h += r.sum() ** 2 / len(r)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _, counts = np.unique(sv, return_counts=True)
    tie = 1 - (counts**3 - counts).sum() / (n**3 - n)
    got = _row(spark, "x86_kruskal_wallis")
    assert got["n_rows"] == n
    assert got["n_groups"] == len(np.unique(groups))
    assert abs(got["h_stat"] - h) < 1e-5
    assert abs(got["h_tie_corrected"] - h / tie) < 1e-5


def test_x87_pvalues_match_erfc_and_bh_step_up(spark):
    import math

    out = (
        get("x87_fdr_bh_screen")
        .builder(spark, SF)
        .collect()
    )
    rows = sorted((r.asDict() for r in out), key=lambda r: r["bh_rank"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    na = pd.read_parquet(f"{SF}/nation.parquet")
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(na, left_on="c_nationkey", right_on="n_nationkey")
    )
    g = j.groupby("n_name").agg(
        n=("l_returnflag", "size"),
        x=("l_returnflag", lambda s: (s == "R").sum()),
    )
    p0 = g.x.sum() / g.n.sum()
    ref = {}
    for name, r in g.iterrows():
        z = (r.x / r.n - p0) / math.sqrt(p0 * (1 - p0) / r.n)
        ref[name] = 2 * 0.5 * math.erfc(abs(z) / math.sqrt(2))
    m = len(rows)
    assert m == len(ref)
    for r in rows:
        # A&S 26.2.17 polynomial vs the exact erfc: |err| < 7.5e-8,
        # both under the engine's 6-dp output rounding tolerance
        assert abs(r["p_value"] - ref[r["n_name"]]) < 1e-5
        assert abs(r["bh_threshold"] - r["bh_rank"] / m * 0.10) < 1e-9
    # BH step-up: rejected == rank <= largest i with p_(i) <= i/m*alpha
    flags = [r["p_value"] <= r["bh_rank"] / m * 0.10 + 1e-12 for r in rows]
    kstar = max((r["bh_rank"] for r, f in zip(rows, flags) if f), default=0)
    for r in rows:
        assert r["rejected"] == (r["bh_rank"] <= kstar)


def test_ts65_matches_pandas_durbin_levinson(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    got = {
        r["event_type"]: r.asDict()
        for r in get("ts65_pacf_yule_walker").builder(spark, SF).collect()
    }
    for etype, sub in ev.groupby("event_type"):
        daily = sub.groupby("day").size().astype(float)
        daily = daily.reindex(sorted(daily.index))  # day order; gaps stay absent
        r = [
            round(daily.corr(daily.shift(k)), 9) for k in (1, 2, 3)
        ]
        phi22 = (r[1] - r[0] ** 2) / (1 - r[0] ** 2)
        phi21 = r[0] * (1 - phi22)
        phi33 = (r[2] - phi21 * r[1] - phi22 * r[0]) / (
            1 - phi21 * r[0] - phi22 * r[1]
        )
        row = got[etype]
        assert abs(row["acf_1"] - r[0]) < 1e-5
        assert abs(row["pacf_2"] - phi22) < 1e-5
        assert abs(row["pacf_3"] - phi33) < 1e-5


def test_ts66_matches_pandas_variance_ratio(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    got = {
        r["event_type"]: r.asDict()
        for r in get("ts66_variance_ratio").builder(spark, SF).collect()
    }
    for etype, sub in ev.groupby("event_type"):
        x = sub.groupby("day").size().astype(float).sort_index()
        d1 = (x - x.shift(1)).dropna()
        d5 = (x - x.shift(5)).dropna()
        vr = d5.var(ddof=1) / (5 * d1.var(ddof=1))
        n = len(d5)
        z = (vr - 1) / np.sqrt(2.0 * 9 * 4 / (15.0 * n))
        row = got[etype]
        assert row["n_q"] == n
        assert abs(row["vr_5"] - vr) < 1e-5
        assert abs(row["z_stat"] - z) < 1e-4


def test_x88_shapley_efficiency_and_textbook_values(spark):
    import itertools
    import math

    ev = pd.read_parquet(f"{SF}/events.parquet")
    u = ev.groupby("user_id")["event_type"].agg(set)
    conv = u.map(lambda s: "purchase" in s)
    chans = ["view", "click", "signup"]
    mask = u.map(
        lambda s: sum((1 << i) for i, c in enumerate(chans) if c in s)
    )
    df = pd.DataFrame({"m": mask, "conv": conv})
    v = df.groupby("m")["conv"].mean().to_dict()  # missing masks -> 0

    def val(m):
        return round(v.get(m, 0.0), 9)

    k = len(chans)
    ref = {}
    for i, c in enumerate(chans):
        bit = 1 << i
        s = 0.0
        for r in range(k):
            for sub in itertools.combinations(
                [b for b in range(k) if b != i], r
            ):
                sm = sum(1 << b for b in sub)
                w = (
                    math.factorial(r)
                    * math.factorial(k - r - 1)
                    / math.factorial(k)
                )
                s += w * (val(sm + bit) - val(sm))
        ref[c] = s
    got = {
        r["channel"]: r.asDict()
        for r in get("x88_shapley_attribution").builder(spark, SF).collect()
    }
    for c in chans:
        assert abs(got[c]["shapley_value"] - ref[c]) < 1e-5
    # efficiency: sum of Shapley values = v(grand) - v(empty)
    total = sum(ref.values())
    assert abs(total - (val(7) - val(0))) < 1e-6


def test_x89_matches_pandas_price_indices(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li["y"] = pd.to_datetime(li["l_shipdate"]).dt.year
    py = li.groupby(["l_partkey", "y"]).agg(
        q=("l_quantity", "sum"), rev=("l_extendedprice", "sum")
    )
    py = py[py.q > 0]
    py["p"] = py.rev / py.q
    got = {
        int(r["year_base"]): r.asDict()
        for r in get("x89_price_index_fisher").builder(spark, SF).collect()
    }
    years = sorted(py.index.get_level_values("y").unique())
    for yb in years[:-1]:
        b = py.xs(yb, level="y")
        t2 = py.xs(yb + 1, level="y")
        j = b.join(t2, lsuffix="_b", rsuffix="_t", how="inner")
        if not len(j):
            continue
        lasp = (j.p_t * j.q_b).sum() / (j.p_b * j.q_b).sum()
        paas = (j.p_t * j.q_t).sum() / (j.p_b * j.q_t).sum()
        row = got[yb]
        assert row["n_parts"] == len(j)
        assert abs(row["laspeyres"] - lasp) < 1e-4
        assert abs(row["paasche"] - paas) < 1e-4
        assert abs(row["fisher"] - np.sqrt(lasp * paas)) < 1e-4


def test_ts67_matches_pandas_bartlett_bands(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    got = {
        (r["event_type"], r["lag"]): r.asDict()
        for r in get("ts67_acf_significance").builder(spark, SF).collect()
    }
    for etype, sub in ev.groupby("event_type"):
        x = sub.groupby("day").size().astype(float).sort_index()
        n = len(x)
        rs = [round(x.corr(x.shift(k)), 9) for k in range(1, 8)]
        cum = 0.0
        for k in range(1, 8):
            se = np.sqrt((1 + 2 * cum) / n)
            row = got[(etype, k)]
            assert abs(row["acf"] - rs[k - 1]) < 1e-5
            assert abs(row["bartlett_se"] - se) < 1e-5
            assert row["significant"] == (abs(rs[k - 1]) > 1.96 * round(se, 9))
            cum += rs[k - 1] ** 2


def test_x90_matches_wilson_formulas(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    ny = pd.to_datetime(li["l_shipdate"]).dt.year.nunique()
    dem = li.groupby("l_partkey")["l_quantity"].sum()
    j = part.set_index("p_partkey").join(dem.rename("qty"), how="inner")
    j = j[j.p_retailprice > 0]
    d = j.qty / ny
    h = 0.2 * j.p_retailprice
    j["eoq"] = np.sqrt(2 * d * 100 / h)
    j["cost"] = np.sqrt(2 * d * 100 * h)
    ref = j.groupby("p_brand").agg(
        n=("eoq", "size"), mean_eoq=("eoq", "mean"), tot=("cost", "sum")
    )
    got = {
        r["brand"]: r.asDict()
        for r in get("x90_eoq_policy").builder(spark, SF).collect()
    }
    for brand, row in ref.iterrows():
        g = got[brand]
        assert g["n_parts"] == row.n
        assert abs(g["mean_eoq"] - row.mean_eoq) < 1e-4
        assert abs(g["total_annual_cost"] - row.tot) < 1e-3
