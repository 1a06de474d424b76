"""Independent-math checks for the model-evaluation pack.

The DuckDB oracles prove Spark and DuckDB compute the same thing, but
both sides share the formula text — a transcription error would
hash-match and still be wrong. These tests re-derive every statistic
from first principles in numpy/pure Python on a synthetic corpus with
engineered signal (a real arm shift, a genuinely predictive scorer,
heavy ties) and compare within 1e-9, closing that loop.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pytest

from magictables_spark.plans.queries import REGISTRY

from tests.test_regression_pack import tiny_events_dir  # noqa: F401  (fixture reuse)


# ---------------------------------------------------------------------------
# embeddings fixture for roc_auc
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_embed_dir(tmp_path_factory):
    """Embeddings whose label correlates with the pack's fixed linear
    scorer: positives get a bump along the weight direction, so AUC
    must land well above 0.5 (plus exact-tie bins via duplication)."""
    rng = np.random.default_rng(77)
    n, d = 1200, 64
    w = np.array([((i + 1) * 2654435761) % 1001 - 500 for i in range(d)], float)
    w_unit = w / np.linalg.norm(w)
    base = rng.normal(0, 0.25, (n, d))
    label = rng.integers(0, 10, n)
    y = (label % 2 == 1).astype(float)
    emb = base + np.outer(y * 0.35 + rng.normal(0, 0.1, n), w_unit)
    emb[n // 2 :] = emb[: n // 2]  # exact duplicates => guaranteed bin ties
    label[n // 2 :] = label[: n // 2]
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in emb],
            "label": label.astype(np.int32),
        }
    )
    dirp = tmp_path_factory.mktemp("tiny_embed")
    df.to_parquet(os.path.join(str(dirp), "embeddings.parquet"), index=False)
    return str(dirp), df


def _binned_scores(df) -> tuple[np.ndarray, np.ndarray]:
    w = np.array([((i + 1) * 2654435761) % 1001 - 500 for i in range(64)], np.int64)
    q = np.stack(
        [np.round(np.asarray(e, np.float64) * 1_000_000).astype(np.int64) for e in df["embedding"]]
    )
    score = (q * w).sum(axis=1)
    # int64 `div` truncates toward zero (both engines)
    bins = np.trunc(score / 16777216.0).astype(np.int64)
    y = (df["label"].to_numpy() % 2 == 1).astype(np.int64)
    return bins, y


def test_roc_auc_matches_rank_formula(spark, tiny_embed_dir):
    d, df = tiny_embed_dir
    out = REGISTRY["roc_auc"].fn(spark, d).toPandas().iloc[0]
    bins, y = _binned_scores(df)
    # average-rank AUC over the binned scores, pure numpy
    order = np.argsort(bins, kind="stable")
    ranks = np.empty(len(bins), float)
    sb = bins[order]
    i = 0
    while i < len(bins):
        j = i
        while j < len(bins) and sb[j] == sb[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n1, n0 = int(y.sum()), int((1 - y).sum())
    u1 = ranks[y == 1].sum() - n1 * (n1 + 1) / 2.0
    auc = u1 / (n1 * n0)
    assert out["n_pos"] == n1 and out["n_neg"] == n0
    assert out["n_bins"] == len(np.unique(bins))
    assert out["auc"] == pytest.approx(auc, rel=1e-12)
    assert out["gini"] == pytest.approx(2 * auc - 1, rel=1e-9)
    # the engineered signal must be detected, ties notwithstanding
    assert out["auc"] > 0.75


def test_welch_matches_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["welch_ttest"].fn(spark, d).toPandas().iloc[0]
    sub = df[df["event_type"] == "purchase"]
    y = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
    grp = (sub["user_id"].to_numpy() % 2).astype(np.int64)
    a, b = y[grp == 0].astype(float), y[grp == 1].astype(float)
    n0, n1 = len(a), len(b)
    v0, v1 = a.var(ddof=1), b.var(ddof=1)
    se2 = v0 / n0 + v1 / n1
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dfw = se2**2 / ((v0 / n0) ** 2 / (n0 - 1) + (v1 / n1) ** 2 / (n1 - 1))
    assert out["n0"] == n0 and out["n1"] == n1
    assert out["mean0_cents"] == pytest.approx(a.mean(), rel=1e-12)
    assert out["mean1_cents"] == pytest.approx(b.mean(), rel=1e-12)
    assert out["t_stat"] == pytest.approx(t, rel=1e-9)
    assert out["df_welch"] == pytest.approx(dfw, rel=1e-9)
    # the engineered +2500-cent arm-1 shift must be detected
    assert bool(out["significant_95"]) and out["t_stat"] < 0


def test_moments_match_numpy(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = (
        REGISTRY["moments_skew_kurtosis"].fn(spark, d).toPandas().set_index("event_type")
    )
    y_all = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    for t in sorted(df["event_type"].unique()):
        y = y_all[(df["event_type"] == t).to_numpy()].astype(float)
        m, m2 = y.mean(), y.var()  # population moments
        m3 = ((y - m) ** 3).mean()
        m4 = ((y - m) ** 4).mean()
        row = out.loc[t]
        assert row["n"] == len(y)
        assert row["mean_cents"] == pytest.approx(m, rel=1e-12)
        assert row["var_pop"] == pytest.approx(m2, rel=1e-9)
        assert row["skewness"] == pytest.approx(m3 / m2**1.5, rel=1e-7)
        assert row["kurtosis_excess"] == pytest.approx(m4 / m2**2 - 3.0, rel=1e-7)


def _user_frame(df) -> pd.DataFrame:
    g = df.groupby("user_id")
    score = g["event_type"].apply(lambda s: int(s.isin(["click", "view"]).sum()))
    pos = g["event_type"].apply(lambda s: int((s == "purchase").any()))
    return pd.DataFrame({"score": score, "pos": pos})


def test_gains_table_matches_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["gains_decile_table"].fn(spark, d).toPandas()
    u = _user_frame(df)
    tot_u, tot_p = len(u), int(u["pos"].sum())
    per = (
        u.groupby("score")
        .agg(nu=("pos", "size"), np_=("pos", "sum"))
        .sort_index(ascending=False)
    )
    above = per["nu"].cumsum().shift(fill_value=0)
    band = (above * 10 // tot_u).astype(int)
    ref = per.assign(band=band).groupby("band").agg(n_users=("nu", "sum"), n_pos=("np_", "sum"))
    assert list(out["band"]) == list(ref.index)
    assert list(out["n_users"]) == list(ref["n_users"])
    assert list(out["n_pos"]) == list(ref["n_pos"])
    cum = ref["n_pos"].cumsum()
    for i, (_, r) in enumerate(ref.iterrows()):
        assert out["cum_capture"].iloc[i] == pytest.approx(
            cum.iloc[i] / tot_p, rel=1e-12
        )
        assert out["lift"].iloc[i] == pytest.approx(
            (r["n_pos"] / r["n_users"]) / (tot_p / tot_u), rel=1e-12
        )
    # capture is monotone and ends at 100%
    assert out["cum_capture"].is_monotonic_increasing
    assert out["cum_capture"].iloc[-1] == pytest.approx(1.0)


def test_calibration_matches_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["calibration_bins"].fn(spark, d).toPandas()
    u = _user_frame(df)
    p_milli = (u["score"] * 1000 // (u["score"] + 5)).astype(int)
    ref = (
        pd.DataFrame({"bin": p_milli // 100, "p": p_milli, "pos": u["pos"]})
        .groupby("bin")
        .agg(n_users=("p", "size"), sum_milli=("p", "sum"), n_pos=("pos", "sum"))
    )
    assert list(out["bin"]) == list(ref.index)
    for i, (_, r) in enumerate(ref.iterrows()):
        assert out["n_users"].iloc[i] == r["n_users"]
        assert out["avg_predicted"].iloc[i] == pytest.approx(
            r["sum_milli"] / (1000.0 * r["n_users"]), rel=1e-12
        )
        assert out["observed_rate"].iloc[i] == pytest.approx(
            r["n_pos"] / r["n_users"], rel=1e-12
        )


def test_ndcg_matches_reference(spark, tiny_embed_dir):
    d, df = tiny_embed_dir
    out = REGISTRY["ndcg_at_k"].fn(spark, d).toPandas().set_index("query_id")
    q = np.stack(
        [np.round(np.asarray(e, np.float64) * 1_000_000).astype(np.int64) for e in df["embedding"]]
    )
    labels = df["label"].to_numpy()
    w = [round(1e15 / math.log2(i + 1)) for i in range(1, 11)]
    for qid in range(5):
        dots = (q @ q[qid]).astype(np.float64)
        nrm = np.sqrt((q.astype(np.float64) ** 2).sum(axis=1))
        cos = dots / (nrm * nrm[qid])
        order = sorted(
            (i for i in range(len(q)) if i != qid),
            key=lambda i: (-cos[i], i),
        )
        rel = [int(labels[i] == labels[qid]) for i in order[:10]]
        dcg_s = sum(r * wi for r, wi in zip(rel, w))
        n_rel = int(sum(labels[i] == labels[qid] for i in range(len(q)) if i != qid))
        idcg_s = sum(w[: min(n_rel, 10)])
        row = out.loc[qid]
        assert row["n_rel"] == n_rel
        assert row["dcg"] == pytest.approx(dcg_s / 1e15, rel=1e-12)
        assert row["idcg"] == pytest.approx(idcg_s / 1e15, rel=1e-12)
        assert row["ndcg"] == pytest.approx(dcg_s / idcg_s, rel=1e-12)
        # engineered same-label bump => ranking beats random
        assert row["ndcg"] > 0.2


def test_kaplan_meier_matches_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["kaplan_meier_retention"].fn(spark, d).toPandas()
    by = df.groupby("user_id")["ts"]
    fd, ld = by.min().dt.normalize(), by.max().dt.normalize()
    mxd = ld.max()
    life = (ld - fd).dt.days.to_numpy()
    ev = (ld < mxd - pd.Timedelta(days=2)).astype(int).to_numpy()
    surv_ref, risk_ref = {}, {}
    s = 1.0
    for dd in sorted(set(life)):
        at_risk = int((life >= dd).sum())
        deaths = int(ev[life == dd].sum())
        s *= (at_risk - deaths) / at_risk
        surv_ref[dd] = s
        risk_ref[dd] = (at_risk, deaths)
    assert list(out["lifetime_days"]) == sorted(surv_ref)
    for _, row in out.iterrows():
        at_risk, deaths = risk_ref[row["lifetime_days"]]
        assert row["n_risk"] == at_risk and row["n_events"] == deaths
        assert row["survival"] == pytest.approx(surv_ref[row["lifetime_days"]], rel=1e-12)
    # survival is a monotone non-increasing curve from <=1.0
    sv = out["survival"].to_numpy()
    assert (np.diff(sv) <= 1e-15).all() and sv[0] <= 1.0


def test_join_view_incremental_matches_full_join(spark):
    sf = "/root/testdata/sf0.001"
    out = REGISTRY["join_view_incremental_store"].fn(spark, sf).toPandas()
    # the view is returned unsorted (order-insensitive driver canon;
    # the per-read total sort was dropped in r11) — canonicalize on the
    # unique key before the row-identity checks
    out = out.sort_values("o_orderkey").reset_index(drop=True)
    o = pd.read_parquet(os.path.join(sf, "orders.parquet"))
    c = pd.read_parquet(os.path.join(sf, "customer.parquet"))
    ref = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    assert len(out) == len(ref)
    # row-identical maintenance: same keyset and same per-key payloads
    ref_sorted = ref.sort_values("o_orderkey")
    assert list(out["o_orderkey"]) == list(ref_sorted["o_orderkey"])
    assert list(out["cust_name"]) == list(ref_sorted["c_name"])
    assert list(out["price_cents"]) == list(
        np.round(ref_sorted["o_totalprice"].to_numpy() * 100).astype(np.int64)
    )


def test_avg_precision_matches_reference(spark, tiny_embed_dir):
    d, df = tiny_embed_dir
    out = REGISTRY["avg_precision_at_k"].fn(spark, d).toPandas().set_index("query_id")
    q = np.stack(
        [np.round(np.asarray(e, np.float64) * 1_000_000).astype(np.int64) for e in df["embedding"]]
    )
    labels = df["label"].to_numpy()
    for qid in range(5):
        dots = (q @ q[qid]).astype(np.float64)
        nrm = np.sqrt((q.astype(np.float64) ** 2).sum(axis=1))
        cos = dots / (nrm * nrm[qid])
        order = sorted(
            (i for i in range(len(q)) if i != qid),
            key=lambda i: (-cos[i], i),
        )
        rel = [int(labels[i] == labels[qid]) for i in order[:10]]
        n_rel = int(sum(labels[i] == labels[qid] for i in range(len(q)) if i != qid))
        cum, ap_terms = 0, []
        for i, r in enumerate(rel, start=1):
            cum += r
            if r:
                ap_terms.append(cum / i)
        ap = sum(ap_terms) / min(n_rel, 10) if n_rel else 0.0
        row = out.loc[qid]
        assert row["n_rel"] == n_rel
        assert row["ap_at_k"] == pytest.approx(ap, rel=1e-12)


def test_uplift_bands_match_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["uplift_by_band"].fn(spark, d).toPandas()
    g = df.groupby("user_id")
    u = pd.DataFrame(
        {
            "score": g["event_type"].apply(lambda s: int(s.isin(["click", "view"]).sum())),
            "pos": g["event_type"].apply(lambda s: int((s == "purchase").any())),
        }
    )
    u["arm"] = (u.index % 2).astype(int)
    tot_u = len(u)
    per = (
        u.groupby("score")
        .agg(
            nu=("pos", "size"),
            nt=("arm", "sum"),
            pt=("pos", lambda s: int(s[u.loc[s.index, "arm"] == 1].sum())),
            pc=("pos", lambda s: int(s[u.loc[s.index, "arm"] == 0].sum())),
        )
        .sort_index(ascending=False)
    )
    per["nc"] = per["nu"] - per["nt"]
    above = per["nu"].cumsum().shift(fill_value=0)
    per["band"] = (above * 10 // tot_u).astype(int)
    ref = per.groupby("band").agg(
        n_treat=("nt", "sum"), n_ctrl=("nc", "sum"),
        pos_treat=("pt", "sum"), pos_ctrl=("pc", "sum"),
    )
    assert list(out["band"]) == list(ref.index)
    for i, (_, r) in enumerate(ref.iterrows()):
        assert out["n_treat"].iloc[i] == r["n_treat"]
        assert out["n_ctrl"].iloc[i] == r["n_ctrl"]
        assert out["pos_treat"].iloc[i] == r["pos_treat"]
        assert out["pos_ctrl"].iloc[i] == r["pos_ctrl"]
        if r["n_treat"] and r["n_ctrl"]:
            assert out["uplift"].iloc[i] == pytest.approx(
                r["pos_treat"] / r["n_treat"] - r["pos_ctrl"] / r["n_ctrl"], rel=1e-12
            )


def test_khop_bfs_matches_networkx_free_reference(spark):
    sf = "/root/testdata/sf0.001"
    out = REGISTRY["khop_reachability"].fn(spark, sf).toPandas()
    pairs = REGISTRY["dedup_ngram_jaccard"].fn(spark, sf).toPandas()
    adj: dict[int, set[int]] = {}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    hops = {v: 0 for v in range(5)}
    frontier = set(hops)
    for h in (1, 2, 3):
        nxt = set()
        for v in frontier:
            nxt |= adj.get(v, set())
        nxt -= set(hops)
        for v in nxt:
            hops[v] = h
        frontier = nxt
    got = dict(zip(out["doc_id"].astype(int), out["hop"].astype(int)))
    assert got == hops
    # hop-0 seeds always present
    assert all(got.get(v) == 0 for v in range(5))


def test_permutation_test_matches_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["permutation_test_diff"].fn(spark, d).toPandas().iloc[0]
    sub = df[df["event_type"] == "purchase"]
    y = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
    u = sub["user_id"].to_numpy().astype(np.int64)
    d_obs = y[u % 2 == 1].mean() - y[u % 2 == 0].mean()
    n_ge = 0
    for j in range(32):
        arm = ((u * 2654435761 + j * 40503) % 4294967296) // 2147483648
        d_j = y[arm == 1].mean() - y[arm == 0].mean()
        if abs(d_j) >= abs(d_obs):
            n_ge += 1
    assert out["diff_obs_cents"] == pytest.approx(d_obs, rel=1e-12)
    assert out["n_perms"] == 32
    assert out["n_ge"] == n_ge
    assert out["p_value"] == pytest.approx((1 + n_ge) / 33.0, rel=1e-12)
    # the engineered +2500-cent arm shift dwarfs hash-permuted diffs
    assert out["p_value"] == pytest.approx(1 / 33.0, rel=1e-12)


def test_hhi_matches_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["hhi_concentration"].fn(spark, d).toPandas().set_index("event_type")
    for t in sorted(df["event_type"].unique()):
        c = df[df["event_type"] == t].groupby("user_id").size().to_numpy().astype(float)
        hhi = (c**2).sum() / c.sum() ** 2
        row = out.loc[t]
        assert row["n_users"] == len(c)
        assert row["total_events"] == int(c.sum())
        assert row["hhi"] == pytest.approx(hhi, rel=1e-12)
        assert row["effective_users"] == pytest.approx(1.0 / hhi, rel=1e-12)
        # bounds: 1/n <= HHI <= 1
        assert 1.0 / len(c) - 1e-12 <= row["hhi"] <= 1.0 + 1e-12


def test_cramervonmises_matches_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["cramervonmises_2sample"].fn(spark, d).toPandas().iloc[0]
    sub = df[df["event_type"] == "purchase"]
    y = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
    grp = (sub["user_id"].to_numpy() % 2).astype(np.int64)
    x1, x2 = np.sort(y[grp == 0]), np.sort(y[grp == 1])
    n1, n2 = len(x1), len(x2)
    vals = np.unique(y)
    f1 = np.searchsorted(x1, vals, side="right") / n1
    f2 = np.searchsorted(x2, vals, side="right") / n2
    wts = np.array([(y == v).sum() for v in vals], float) / (n1 + n2)
    # T = n*m/(n+m) * integral (F-G)^2 dH
    t_ref = n1 * n2 / (n1 + n2) * ((f1 - f2) ** 2 * wts).sum()
    assert out["n1"] == n1 and out["n2"] == n2
    assert out["cvm_t"] == pytest.approx(t_ref, rel=1e-9)
    # the engineered arm shift must register
    assert out["cvm_t"] > 1.0


def test_energy_distance_matches_bruteforce(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["energy_distance_2sample"].fn(spark, d).toPandas().iloc[0]
    sub = df[df["event_type"] == "purchase"]
    y = np.round(sub["value"].to_numpy() * 100).astype(np.float64)
    grp = (sub["user_id"].to_numpy() % 2).astype(np.int64)
    a, b = y[grp == 0], y[grp == 1]
    exy = np.abs(a[:, None] - b[None, :]).mean()
    exx = np.abs(a[:, None] - a[None, :]).mean()
    eyy = np.abs(b[:, None] - b[None, :]).mean()
    e_ref = 2 * exy - exx - eyy
    assert out["n1"] == len(a) and out["n2"] == len(b)
    assert out["energy_distance"] == pytest.approx(e_ref, rel=1e-9)
    assert out["energy_distance"] > 0  # distributions engineered distinct


def test_brier_murphy_identity_and_values(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["brier_score_decomposition"].fn(spark, d).toPandas().iloc[0]
    u = _user_frame(df)
    p_milli = (u["score"] * 1000 // (u["score"] + 5)).astype(int)
    p = p_milli.to_numpy() / 1000.0
    y = u["pos"].to_numpy().astype(float)
    n = len(y)
    brier = ((p - y) ** 2).mean()
    ybar = y.mean()
    bins = (p_milli // 100).to_numpy()
    rel = res = 0.0
    for k in range(10):
        m = bins == k
        if m.sum():
            rel += m.sum() * (p[m].mean() - y[m].mean()) ** 2
            res += m.sum() * (y[m].mean() - ybar) ** 2
    rel, res = rel / n, res / n
    assert out["n_users"] == n and out["n_pos"] == int(y.sum())
    assert out["brier"] == pytest.approx(brier, rel=1e-12)
    assert out["reliability"] == pytest.approx(rel, rel=1e-9)
    assert out["resolution"] == pytest.approx(res, rel=1e-9)
    assert out["uncertainty"] == pytest.approx(ybar * (1 - ybar), rel=1e-12)
    # Murphy identity holds exactly for the BINNED forecaster: the
    # decomposition must reconstruct numpy's binned Brier to 1e-12
    pbin = np.empty_like(p)
    for k in range(10):
        m = bins == k
        if m.sum():
            pbin[m] = p[m].mean()
    brier_binned = ((pbin - y) ** 2).mean()
    assert out["reliability"] - out["resolution"] + out["uncertainty"] == pytest.approx(
        brier_binned, abs=1e-12
    )


def test_mase_matches_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = (
        REGISTRY["forecast_eval_mase"].fn(spark, d).toPandas().set_index("event_type")
    )
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    daily = (
        pd.DataFrame(
            {"t": df["event_type"], "day": df["ts"].dt.normalize(), "c": cents}
        )
        .groupby(["t", "day"])["c"]
        .sum()
    )
    cutoff = pd.Timestamp("2024-01-25")
    for t in sorted(df["event_type"].unique()):
        s = daily.loc[t].sort_index()
        season = s.shift(7)
        prev = s.shift(1)
        test_m = (s.index >= cutoff) & season.notna()
        train_m = (s.index < cutoff) & prev.notna()
        if not test_m.any() or not train_m.any():
            continue
        mae_f = (s[test_m] - season[test_m]).abs().mean()
        mae_n = (s[train_m] - prev[train_m]).abs().mean()
        row = out.loc[t]
        assert row["mae_forecast"] == pytest.approx(mae_f, rel=1e-12)
        assert row["mae_naive_insample"] == pytest.approx(mae_n, rel=1e-12)
        assert row["mase"] == pytest.approx(mae_f / mae_n, rel=1e-12)


def test_embedding_drift_matches_numpy(spark, tiny_embed_dir):
    d, df = tiny_embed_dir
    out = REGISTRY["embedding_drift_by_label"].fn(spark, d).toPandas().set_index("label")
    q = np.stack(
        [np.round(np.asarray(e, np.float64) * 1_000_000).astype(np.int64) for e in df["embedding"]]
    )
    labels = df["label"].to_numpy()
    half = (df["vec_id"].to_numpy() % 2).astype(int)
    for lab in sorted(np.unique(labels)):
        a = q[(labels == lab) & (half == 0)].astype(float)
        b = q[(labels == lab) & (half == 1)].astype(float)
        gap = ((a.mean(axis=0) - b.mean(axis=0)) ** 2).sum() / 1e12
        row = out.loc[lab]
        assert row["na"] == len(a) and row["nb"] == len(b)
        assert row["centroid_gap_sq"] == pytest.approx(gap, rel=1e-9)
    # the fixture duplicates halves => per-label drift is small but >= 0
    assert (out["centroid_gap_sq"] >= 0).all()


def test_mcnemar_matches_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["mcnemar_paired"].fn(spark, d).toPandas().iloc[0]
    cutoff = pd.Timestamp("2024-01-16")
    g = df.groupby("user_id")
    p1 = g.apply(
        lambda s: int(
            (
                (s["event_type"] == "purchase")
                & (s["value"] > 100.0)
                & (s["ts"] < cutoff)
            ).any()
        ),
        include_groups=False,
    )
    p2 = g.apply(
        lambda s: int(
            (
                (s["event_type"] == "purchase")
                & (s["value"] > 100.0)
                & (s["ts"] >= cutoff)
            ).any()
        ),
        include_groups=False,
    )
    b = int(((p1 == 1) & (p2 == 0)).sum())
    c = int(((p1 == 0) & (p2 == 1)).sum())
    assert out["only_first"] == b and out["only_second"] == c
    assert out["both_"] == int(((p1 == 1) & (p2 == 1)).sum())
    assert out["neither"] == int(((p1 == 0) & (p2 == 0)).sum())
    if b + c:
        assert out["chi2_stat"] == pytest.approx((b - c) ** 2 / (b + c), rel=1e-12)


def test_lorenz_matches_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["lorenz_curve_table"].fn(spark, d).toPandas()
    v = (
        pd.DataFrame(
            {"u": df["user_id"], "c": np.round(df["value"].to_numpy() * 100).astype(np.int64)}
        )
        .groupby("u")["c"]
        .sum()
    )
    per = v.groupby(v).size().sort_index()  # distinct spend -> user count
    tot_u, tot_v = len(v), int(v.sum())
    below = per.cumsum().shift(fill_value=0)
    band = (below * 10 // tot_u).astype(int)
    ref = (
        pd.DataFrame({"band": band, "nu": per.values, "val": per.index * per.values})
        .groupby("band")
        .agg(n_users=("nu", "sum"), value_cents=("val", "sum"))
    )
    assert list(out["decile"]) == list(ref.index)
    assert list(out["n_users"]) == list(ref["n_users"])
    assert list(out["value_cents"]) == list(ref["value_cents"])
    # Lorenz curve properties: monotone, convex-ish, ends at 1
    cs = out["cum_value_share"].to_numpy()
    assert (np.diff(cs) >= -1e-15).all() and cs[-1] == pytest.approx(1.0)
    # ascending-spend deciles: later bands hold larger shares
    assert out["value_share"].iloc[-1] >= out["value_share"].iloc[0]


def test_pinball_matches_reference(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["pinball_loss_eval"].fn(spark, d).toPandas()
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    day = df["ts"].dt.normalize()
    cutoff = pd.Timestamp("2024-01-25")
    # tiny fixture spans < Jan 25 — empty test split means empty result
    if (day >= cutoff).sum() == 0:
        assert len(out) == 0
        return
    for t in out["event_type"]:
        m = (df["event_type"] == t).to_numpy()
        tr = cents[m & (day < cutoff).to_numpy()]
        te = cents[m & (day >= cutoff).to_numpy()]
        q50 = np.sort(tr)[int(np.ceil(len(tr) * 0.5)) - 1]
        q90 = np.sort(tr)[int(np.ceil(len(tr) * 0.9)) - 1]
        row = out.set_index("event_type").loc[t]
        assert row["q50_pred_cents"] == q50 and row["q90_pred_cents"] == q90
        p50 = np.where(te >= q50, 0.5 * (te - q50), 0.5 * (q50 - te)).mean()
        p90 = np.where(te >= q90, 0.9 * (te - q90), 0.1 * (q90 - te)).mean()
        assert row["pinball50"] == pytest.approx(p50, rel=1e-12)
        assert row["pinball90"] == pytest.approx(p90, rel=1e-12)


def test_pinball_on_real_fixture(spark, sf_dir):
    out = REGISTRY["pinball_loss_eval"].fn(spark, sf_dir).toPandas()
    assert len(out) == 5
    # true quantiles minimize pinball loss: the P90 predictor must not
    # beat the P50 predictor at the 0.5 loss, and vice versa (weak
    # sanity — equality possible on degenerate splits)
    assert (out["pinball50"] >= 0).all() and (out["pinball90"] >= 0).all()
    assert (out["q90_pred_cents"] >= out["q50_pred_cents"]).all()


def test_bh_stepup_matches_reference(spark, tiny_events_dir):  # noqa: F811
    from statistics import NormalDist

    d, df = tiny_events_dir
    out = REGISTRY["multiple_testing_bh"].fn(spark, d).toPandas()
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    grp = (df["user_id"].to_numpy() % 2).astype(int)
    zs = {}
    for t in sorted(df["event_type"].unique()):
        m = (df["event_type"] == t).to_numpy()
        a, b = cents[m & (grp == 0)].astype(float), cents[m & (grp == 1)].astype(float)
        se2 = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        zs[t] = (a.mean() - b.mean()) / np.sqrt(se2)
    ordered = sorted(zs, key=lambda t: (-abs(zs[t]), t))
    thr = [NormalDist().inv_cdf(1 - (i / 5) * 0.10 / 2) for i in range(1, 6)]
    passes = [abs(zs[t]) >= thr[i] for i, t in enumerate(ordered)]
    kstar = max((i + 1 for i, p in enumerate(passes) if p), default=0)
    ref_rej = {t: (i + 1 <= kstar) for i, t in enumerate(ordered)}
    got = out.set_index("event_type")
    for t, z in zs.items():
        assert got.loc[t, "z_stat"] == pytest.approx(z, rel=1e-9)
        assert bool(got.loc[t, "rejected"]) == ref_rej[t]
    # the engineered arm shift must reject at least one test
    assert out["rejected"].any()


def test_link_prediction_matches_bruteforce(spark):
    from magictables_spark.plans.textops import _jaccard_pairs

    sf = "/root/testdata/sf0.001"
    out = REGISTRY["link_prediction_jaccard"].fn(spark, sf).toPandas()
    pairs = _jaccard_pairs(spark, sf, threshold=0.02).toPandas()
    adj: dict[int, set[int]] = {}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    scores = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for w in nodes[i + 1 :]:
            if w in adj[u]:
                continue
            cn = len(adj[u] & adj[w])
            if cn:
                scores[(u, w)] = (cn, cn / len(adj[u] | adj[w]))
    ref = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    assert len(out) == min(20, len(scores))
    for i, ((u, w), (cn, js)) in enumerate(ref):
        assert (out["u"].iloc[i], out["w"].iloc[i]) == (u, w)
        assert out["cn"].iloc[i] == cn
        assert out["jaccard_score"].iloc[i] == pytest.approx(js, rel=1e-12)


def test_collocation_lift_matches_reference(spark):
    sf = "/root/testdata/sf0.001"
    out = REGISTRY["collocation_lift_topk"].fn(spark, sf).toPandas()
    import collections

    docs = pd.read_parquet(os.path.join(sf, "documents.parquet"))
    bg = collections.Counter()
    uni = collections.Counter()
    for text in docs["text"]:
        ws = text.split(" ")
        for i in range(len(ws) - 1):
            bg[(ws[i], ws[i + 1])] += 1
            uni[ws[i]] += 1
    n = sum(bg.values())
    scored = {
        p: (c, c * n / (uni[p[0]] * uni[p[1]]))
        for p, c in bg.items()
        if c >= 5
    }
    ref = sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    for i, ((w1, w2), (c, lift)) in enumerate(ref):
        assert (out["w1"].iloc[i], out["w2"].iloc[i]) == (w1, w2)
        assert out["c12"].iloc[i] == c
        assert out["lift"].iloc[i] == pytest.approx(lift, rel=1e-12)


def test_mrr_matches_reference(spark, tiny_embed_dir):
    d, df = tiny_embed_dir
    out = REGISTRY["mrr_at_k"].fn(spark, d).toPandas().iloc[0]
    q = np.stack(
        [np.round(np.asarray(e, np.float64) * 1_000_000).astype(np.int64) for e in df["embedding"]]
    )
    labels = df["label"].to_numpy()
    total, hits = 0, 0
    for qid in range(5):
        dots = (q @ q[qid]).astype(np.float64)
        nrm = np.sqrt((q.astype(np.float64) ** 2).sum(axis=1))
        cos = dots / (nrm * nrm[qid])
        order = sorted(
            (i for i in range(len(q)) if i != qid),
            key=lambda i: (-cos[i], i),
        )
        first = next(
            (r + 1 for r, i in enumerate(order[:10]) if labels[i] == labels[qid]), 0
        )
        if first:
            hits += 1
            total += 2520 // first
    assert out["n_queries"] == 5 and out["n_hit"] == hits
    assert out["mrr"] == pytest.approx(total / (2520 * 5), rel=1e-12)


def test_sliced_auc_matches_rank_formula(spark, tiny_embed_dir):
    d, df = tiny_embed_dir
    out = REGISTRY["roc_auc_sliced"].fn(spark, d).toPandas().set_index("segment")
    bins, y = _binned_scores(df)
    seg = (df["vec_id"].to_numpy() % 3).astype(int)
    for s in range(3):
        m = seg == s
        bs, ys = bins[m], y[m]
        order = np.argsort(bs, kind="stable")
        ranks = np.empty(len(bs), float)
        sb = bs[order]
        i = 0
        while i < len(bs):
            j = i
            while j < len(bs) and sb[j] == sb[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0
            i = j
        n1, n0 = int(ys.sum()), int((1 - ys).sum())
        u1 = ranks[ys == 1].sum() - n1 * (n1 + 1) / 2.0
        row = out.loc[s]
        assert row["n_pos"] == n1 and row["n_neg"] == n0
        assert row["auc"] == pytest.approx(u1 / (n1 * n0), rel=1e-12)


def test_auc_store_stream_equals_batch_auc(spark, sf_dir):
    streamed = REGISTRY["auc_store_stream"].fn(spark, sf_dir).toPandas()
    batch = REGISTRY["roc_auc"].fn(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(
        streamed.reset_index(drop=True), batch.reset_index(drop=True)
    )
    # re-invocation (checkpoint replay, no new files) serves identically
    again = REGISTRY["auc_store_stream"].fn(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(
        streamed.reset_index(drop=True), again.reset_index(drop=True)
    )


def test_auc_store_stream_crash_before_commit_recovers_exactly_once(spark, sf_dir):
    """Kill the maintainer in the ADVICE-flagged window — merged
    store_v{batch} written, CURRENT pointer NOT yet flipped — then
    restart from the checkpoint. The replayed batch re-merges from the
    untouched pre-merge version (the half-committed store is simply
    overwritten), so the served AUC still equals the from-scratch
    batch computation: no double-count."""
    import hashlib
    import os
    import shutil

    from magictables_spark.plans.mleval_pack import auc_store_stream
    from magictables_spark.warehouse import corpus_fingerprint, store_root

    cfp = corpus_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    tag = hashlib.md5(
        f"v2:4:{os.path.realpath(sf_dir)}:{cfp}".encode()
    ).hexdigest()[:12]
    root = store_root(f"aucstream_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # force a cold build

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="injected crash"):
        auc_store_stream(spark, sf_dir, _crash_after_write=frozenset({1}))

    with open(os.path.join(root, "CURRENT")) as f:
        last_applied = int(f.read().splitlines()[0])
    assert last_applied == 0  # batch 1 wrote store_v1 but never committed

    recovered = auc_store_stream(spark, sf_dir).toPandas()
    batch = REGISTRY["roc_auc"].fn(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(
        recovered.reset_index(drop=True), batch.reset_index(drop=True)
    )


def test_roc_curve_table_consistency(spark, tiny_embed_dir):
    out = REGISTRY["roc_curve_table"].fn(spark, tiny_embed_dir[0]).toPandas()
    auc_row = REGISTRY["roc_auc"].fn(spark, tiny_embed_dir[0]).toPandas().iloc[0]
    # terminal point is (1, 1); curve is monotone in both axes as the
    # threshold loosens
    assert out["tpr"].iloc[-1] == pytest.approx(1.0)
    assert out["fpr"].iloc[-1] == pytest.approx(1.0)
    assert out["tpr"].is_monotonic_increasing
    assert out["fpr"].is_monotonic_increasing
    # trapezoid integral of the curve (with the (0,0) anchor) must equal
    # the binned doubled-rank AUC — the two formulations agree exactly
    fpr = np.concatenate([[0.0], out["fpr"].to_numpy()])
    tpr = np.concatenate([[0.0], out["tpr"].to_numpy()])
    auc_trap = np.trapz(tpr, fpr)
    assert auc_row["auc"] == pytest.approx(auc_trap, rel=1e-9)


def test_qq_table_matches_numpy_quantiles(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["qq_plot_table"].fn(spark, d).toPandas()
    sub = df[df["event_type"] == "purchase"]
    y = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
    grp = (sub["user_id"].to_numpy() % 2).astype(int)
    a, b = np.sort(y[grp == 0]), np.sort(y[grp == 1])
    assert list(out["pct"]) == [5 * i for i in range(1, 20)]
    for _, row in out.iterrows():
        lv = row["pct"] // 5
        qa = a[int(np.ceil(lv * len(a) / 20)) - 1]
        qb = b[int(np.ceil(lv * len(b) / 20)) - 1]
        assert row["q_ctrl_cents"] == qa and row["q_treat_cents"] == qb
        assert row["gap_cents"] == qb - qa
    # the +2500-cent arm-1 shift shows as positive gaps
    assert (out["gap_cents"] > 0).mean() > 0.8


def test_cindex_matches_bruteforce(spark, tiny_events_dir):  # noqa: F811
    d, df = tiny_events_dir
    out = REGISTRY["concordance_cindex"].fn(spark, d).toPandas().iloc[0]
    g = df.groupby("user_id")
    fd, ld = g["ts"].min().dt.normalize(), g["ts"].max().dt.normalize()
    mxd = ld.max()
    life = (ld - fd).dt.days.to_numpy()
    ev = (ld < mxd - pd.Timedelta(days=2)).astype(int).to_numpy()
    score = g["event_type"].apply(lambda s: int(s.isin(["click", "view"]).sum())).to_numpy()
    conc2 = comparable = 0
    n = len(life)
    for i in range(n):
        if not ev[i]:
            continue
        for j in range(n):
            if life[i] < life[j]:
                comparable += 1
                if score[i] < score[j]:
                    conc2 += 2
                elif score[i] == score[j]:
                    conc2 += 1
    assert out["n_comparable_pairs"] == comparable
    if comparable:
        assert out["c_index"] == pytest.approx(conc2 / (2 * comparable), rel=1e-12)


def test_delong_matches_bruteforce(spark, tiny_embed_dir):
    d, df = tiny_embed_dir
    out = REGISTRY["roc_auc_ci_delong"].fn(spark, d).toPandas().iloc[0]
    auc_row = REGISTRY["roc_auc"].fn(spark, d).toPandas().iloc[0]
    bins, y = _binned_scores(df)
    pos, neg = bins[y == 1], bins[y == 0]
    n1, n0 = len(pos), len(neg)
    # structural components on the binned scores, brute force
    v10 = np.array(
        [((neg < p).sum() + 0.5 * (neg == p).sum()) / n0 for p in pos]
    )
    v01 = np.array(
        [((pos > q).sum() + 0.5 * (pos == q).sum()) / n1 for q in neg]
    )
    auc = v10.mean()
    se = math.sqrt(v10.var(ddof=1) / n1 + v01.var(ddof=1) / n0)
    assert out["n_pos"] == n1 and out["n_neg"] == n0
    # mean of v10 IS the AUC — and matches the rank-formula slug
    assert out["auc"] == pytest.approx(auc, rel=1e-12)
    assert out["auc"] == pytest.approx(auc_row["auc"], rel=1e-12)
    assert out["auc_se"] == pytest.approx(se, rel=1e-9)
    assert out["ci_lo"] == pytest.approx(auc - 1.959963984540054 * se, rel=1e-9)
    assert out["ci_hi"] == pytest.approx(auc + 1.959963984540054 * se, rel=1e-9)
    # engineered real signal: the CI must exclude 0.5
    assert out["ci_lo"] > 0.5


def test_decision_stump_matches_bruteforce_gini(spark, tiny_events_dir):
    """Re-derive the best split with a brute-force float Gini scan —
    the exact-integer cross-multiplied argmin must pick the same
    threshold and report matching counts and impurity."""
    d, df = tiny_events_dir
    row = REGISTRY["decision_stump_gini"].fn(spark, d).collect()
    assert len(row) == 1
    row = row[0]
    h = df["ts"].dt.hour.to_numpy()
    y = (df["event_type"] == "purchase").to_numpy().astype(int)
    n_t = len(y)
    best, best_cost = None, None
    for t in sorted(set(h))[:-1]:
        m = h <= t
        n_l, n_r = int(m.sum()), int((~m).sum())
        pl, pr = int(y[m].sum()), int(y[~m].sum())
        gini_l = 1 - (pl / n_l) ** 2 - ((n_l - pl) / n_l) ** 2
        gini_r = 1 - (pr / n_r) ** 2 - ((n_r - pr) / n_r) ** 2
        cost = (n_l * gini_l + n_r * gini_r) / n_t
        if best_cost is None or cost < best_cost - 1e-12:
            best, best_cost = (t, n_l, pl, n_r, pr), cost
    t, n_l, pl, n_r, pr = best
    assert (row.threshold_hour, row.n_left, row.pos_left,
            row.n_right, row.pos_right) == (t, n_l, pl, n_r, pr)
    assert row.weighted_gini == pytest.approx(best_cost, rel=1e-9)


def test_naive_bayes_matches_pure_python(spark, tiny_events_dir):
    """Re-derive priors, Laplace conditionals, per-cell posterior and
    prediction in pure Python fractions — counts, argmax and the
    truncated millesimal must agree exactly."""
    from fractions import Fraction

    d, df = tiny_events_dir
    got = {
        (r.hour_bucket, r.day_bucket): r
        for r in REGISTRY["naive_bayes_classify"].fn(spark, d).collect()
    }
    v1 = (df["ts"].dt.hour // 6).to_numpy()
    v2 = ((df["ts"].dt.day - 1) // 8).to_numpy()
    y = (df["event_type"] == "purchase").to_numpy().astype(int)
    n1, n0 = int(y.sum()), int(len(y) - y.sum())
    for a in sorted(set(v1)):
        for b in sorted(set(v2)):
            m = (v1 == a) & (v2 == b)
            if not m.any():
                continue
            r = got[(a, b)]
            assert (r.n_pos, r.n_neg) == (int(y[m].sum()), int((1 - y[m]).sum()))
            p1 = int(y[v1 == a].sum())
            q1 = int((1 - y)[v1 == a].sum())
            p2 = int(y[v2 == b].sum())
            q2 = int((1 - y)[v2 == b].sum())
            s1 = Fraction(n1 * (p1 + 1) * (p2 + 1), (n1 + 4) * (n1 + 4))
            s0 = Fraction(n0 * (q1 + 1) * (q2 + 1), (n0 + 4) * (n0 + 4))
            assert r.predicted == (1 if s1 > s0 else 0)
            assert r.posterior_milli == (1000 * s1.numerator * s0.denominator) // (
                s0.numerator * s1.denominator + s1.numerator * s0.denominator
            )
