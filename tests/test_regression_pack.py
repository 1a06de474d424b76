"""Independent-math checks for the regression/hypothesis-test pack.

The DuckDB oracles prove the Spark plans compute the same thing the
oracle SQL computes — but both sides were written from the same
formulas, so a transcription error would hash-match and still be
wrong. These tests recompute every statistic from first principles in
numpy/pure Python on a tiny synthetic events table and compare within
1e-9, closing that loop.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pytest

from magictables_spark.plans.queries import REGISTRY


@pytest.fixture(scope="module")
def tiny_events_dir(tmp_path_factory):
    """A small events table with known structure: trends per type,
    shifted value distributions between the user_id%2 arms, skewed
    per-user load, and deliberate ties in the cents values."""
    rng = np.random.default_rng(1234)
    n = 4000
    base = pd.Timestamp("2024-01-01 00:00:00")
    types = np.array(["view", "click", "purchase", "signup", "error"])
    event_type = types[rng.integers(0, 5, n)]
    # skewed user load: ~zipf over 60 users
    user_id = (rng.zipf(1.5, n) % 60).astype(np.int64)
    hours = rng.integers(0, 200, n)
    ts = base + pd.to_timedelta(hours * 3600 + rng.integers(0, 3600, n), unit="s")
    # value: per-type trend in hours + arm shift + coarse grid (ties)
    slope = {"view": 0.5, "click": -0.3, "purchase": 1.0, "signup": 0.0, "error": 0.2}
    cents = (
        5000
        + np.array([slope[t] for t in event_type]) * hours * 100
        + (user_id % 2) * 2500
        + rng.integers(0, 50, n) * 100  # 50-value grid => heavy ties
    ).astype(np.int64)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": user_id,
            "event_type": event_type,
            "value": cents / 100.0,
            "props": "{}",
        }
    )
    d = tmp_path_factory.mktemp("tiny_events")
    df.to_parquet(os.path.join(str(d), "events.parquet"), index=False)
    return str(d), df


def _cents(df):
    return np.round(df["value"].to_numpy() * 100).astype(np.int64)


def _hour_idx(df):
    anchor = pd.Timestamp("2024-01-01 00:00:00")
    return (
        (df["ts"].dt.floor("h") - anchor).dt.total_seconds().to_numpy().astype(np.int64)
        // 3600
    )


def test_linreg_matches_numpy(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["linreg_by_group"].fn(spark, d).toPandas().set_index("event_type")
    x_all, y_all = _hour_idx(df), _cents(df)
    for t in sorted(df["event_type"].unique()):
        m = (df["event_type"] == t).to_numpy()
        x, y = x_all[m].astype(float), y_all[m].astype(float)
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        row = out.loc[t]
        assert row["slope_cents_per_hour"] == pytest.approx(slope, rel=1e-9)
        assert row["intercept_cents"] == pytest.approx(intercept, rel=1e-9)
        assert row["r2"] == pytest.approx(r * r, rel=1e-9)
        # the synthetic trend itself is recovered (cents/hour = 100*slope)
        assert row["slope_cents_per_hour"] == pytest.approx(
            {"view": 50, "click": -30, "purchase": 100, "signup": 0, "error": 20}[t],
            abs=25.0,
        )


def test_mannwhitney_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["mannwhitney_u"].fn(spark, d).toPandas().iloc[0]
    sub = df[df["event_type"] == "purchase"]
    y = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
    grp = (sub["user_id"].to_numpy() % 2).astype(np.int64)
    # average ranks with ties (1-based), pure numpy
    order = np.argsort(y, kind="stable")
    ranks = np.empty(len(y), float)
    sorted_y = y[order]
    i = 0
    while i < len(y):
        j = i
        while j < len(y) and sorted_y[j] == sorted_y[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        i = j
    n1, n2 = int((grp == 0).sum()), int((grp == 1).sum())
    r1 = ranks[grp == 0].sum()
    u1 = n1 * n2 + n1 * (n1 + 1) / 2.0 - r1
    assert out["n1"] == n1 and out["n2"] == n2
    assert out["u1_doubled"] / 2.0 == pytest.approx(u1, abs=1e-9)
    # tie-corrected z
    nn = n1 + n2
    _, counts = np.unique(y, return_counts=True)
    tie3 = float((counts.astype(np.int64) ** 3 - counts).sum())
    sigma = math.sqrt(n1 * n2 / 12.0 * ((nn + 1) - tie3 / (nn * (nn - 1))))
    z = (u1 - n1 * n2 / 2.0) / sigma
    assert out["z"] == pytest.approx(z, rel=1e-9)
    # the engineered +2500-cent arm shift must be detected
    assert bool(out["significant_95"])


def test_chi2_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["chi2_independence"].fn(spark, d).toPandas().iloc[0]
    obs = pd.crosstab(df["event_type"], df["user_id"] % 2).to_numpy().astype(float)
    r = obs.sum(axis=1, keepdims=True)
    c = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    e = r @ c / n
    chi2 = float(((obs - e) ** 2 / e).sum())
    assert out["n"] == n
    assert out["chi2"] == pytest.approx(chi2, rel=1e-9)
    assert out["cramers_v"] == pytest.approx(math.sqrt(chi2 / n), rel=1e-9)
    # type and arm are independent by construction here
    assert not bool(out["dependent_95"])


def test_theilsen_matches_bruteforce(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["theilsen_trend"].fn(spark, d).toPandas().set_index("event_type")
    x_all, y_all = _hour_idx(df), _cents(df)
    for t in ("purchase", "view"):
        m = (df["event_type"] == t).to_numpy()
        sub = pd.DataFrame({"x": x_all[m], "y": y_all[m]})
        hr = sub.groupby("x")["y"].agg(["sum", "count"]).reset_index()
        xs = hr["x"].to_numpy()
        means = hr["sum"].to_numpy() / hr["count"].to_numpy()
        slopes = []
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                slopes.append((means[j] - means[i]) / (xs[j] - xs[i]))
        slopes.sort()
        med = slopes[(len(slopes) - 1) // 2]  # PERCENTILE_DISC(0.5): lower middle
        row = out.loc[t]
        assert row["n_pairs"] == len(slopes)
        assert row["slope_cents_per_hour"] == pytest.approx(med, abs=1e-9)
        resid = sorted(means - med * xs)
        assert row["intercept_cents"] == pytest.approx(
            resid[(len(resid) - 1) // 2], abs=1e-9
        )


def test_ewma_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["ewma_windowed"].fn(spark, d).toPandas()
    sub = df[df["event_type"] == "click"].copy()
    sub["h"] = sub["ts"].dt.floor("h")
    sub["cents"] = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
    hr = sub.groupby("h")["cents"].agg(["sum", "count"]).sort_index()
    means = hr["sum"].to_numpy() / hr["count"].to_numpy()
    w = [0.5**j for j in range(8)]
    got = out[out["event_type"] == "click"].sort_values("hour")
    assert len(got) == len(means)
    for t in (0, 1, 3, len(means) - 1):
        taps = [means[t - j] for j in range(8) if t - j >= 0]
        ref = sum(mm * ww for mm, ww in zip(taps, w)) / sum(w[: len(taps)])
        assert got.iloc[t]["ewma_cents"] == pytest.approx(ref, rel=1e-12)


def _seasonal_reference(df, t):
    """STL-lite seasonal strength recomputed from first principles."""
    h_all = _hour_idx(df)
    lo, hi = int(h_all.min()), int(h_all.max())
    m_mask = (df["event_type"] == t).to_numpy()
    v = np.zeros(hi - lo + 1, dtype=np.int64)
    for h in h_all[m_mask]:
        v[h - lo] += 1
    d_lo = (lo + 11 + 23) // 24
    d_hi = (hi - 12 + 1) // 24 - 1
    m = d_hi - d_lo + 1
    hs = np.arange(d_lo * 24, d_hi * 24 + 24)
    s24 = np.array([v[h - 11 - lo : h + 13 - lo].sum() for h in hs])
    D = 24 * v[hs - lo] - s24
    ks = hs % 24
    sumd = {k: int(D[ks == k].sum()) for k in range(24)}
    rp = m * D - np.array([sumd[k] for k in ks])
    dm = m * D
    n = len(D)
    ss = lambda x: float(n * (x.astype(float) ** 2).sum() - x.astype(float).sum() ** 2)
    strength = 1.0 - ss(rp) / ss(dm)
    maxd = max(sumd.values())
    peak = min(k for k, s in sumd.items() if s == maxd)
    return m, n, strength, peak, maxd / (24.0 * m)


def test_seasonal_strength_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = (
        REGISTRY["seasonal_strength_hourly"].fn(spark, d).toPandas()
        .set_index("event_type")
    )
    for t in ("view", "purchase"):
        m, n, strength, peak, peakvol = _seasonal_reference(df, t)
        row = out.loc[t]
        assert row["n_days"] == m and row["n_hours"] == n
        assert row["seasonal_strength"] == pytest.approx(strength, abs=1e-9)
        assert row["peak_hour"] == peak
        assert row["peak_seasonal_volume"] == pytest.approx(peakvol, rel=1e-12)
        assert 0.0 <= row["seasonal_strength"] <= 1.0


def test_seasonal_strength_detects_daily_cycle(spark, tmp_path):
    """A corpus with a hard 24h cycle must score high; the uniform
    corpus scores near zero — the diagnostic separates them."""
    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for day in range(14):
        for hod in range(24):
            # strong cycle: 9am-5pm business hours carry 10x the volume
            n = 20 if 9 <= hod <= 17 else 2
            for i in range(n):
                rows.append(
                    (len(rows), base + pd.Timedelta(days=day, hours=hod, minutes=int(rng.integers(0, 60))),
                     int(rng.integers(0, 50)), "view", 10.0, "{}")
                )
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    df.to_parquet(os.path.join(str(tmp_path), "events.parquet"), index=False)
    out = REGISTRY["seasonal_strength_hourly"].fn(spark, str(tmp_path)).toPandas().iloc[0]
    assert out["seasonal_strength"] > 0.8
    assert 9 <= out["peak_hour"] <= 17


def test_cohens_d_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["effect_size_cohens_d"].fn(spark, d).toPandas().iloc[0]
    sub = df[df["event_type"] == "purchase"]
    y = np.round(sub["value"].to_numpy() * 100).astype(np.float64)
    grp = (sub["user_id"].to_numpy() % 2).astype(np.int64)
    a, b2 = y[grp == 0], y[grp == 1]
    n1, n2 = len(a), len(b2)
    sp = math.sqrt(
        ((n1 - 1) * a.var(ddof=1) + (n2 - 1) * b2.var(ddof=1)) / (n1 + n2 - 2)
    )
    d_ref = (b2.mean() - a.mean()) / sp
    assert out["n1"] == n1 and out["n2"] == n2
    assert out["mean_diff_cents"] == pytest.approx(b2.mean() - a.mean(), rel=1e-9)
    assert out["pooled_sd_cents"] == pytest.approx(sp, rel=1e-9)
    assert out["cohens_d"] == pytest.approx(d_ref, rel=1e-9)
    g_ref = d_ref * (1 - 3 / (4 * (n1 + n2) - 9))
    assert out["hedges_g"] == pytest.approx(g_ref, rel=1e-9)
    # the +2500-cent arm shift is a visible standardized effect
    assert out["cohens_d"] > 0.2


def test_diff_in_diff_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["diff_in_diff"].fn(spark, d).toPandas().iloc[0]
    h = _hour_idx(df)
    mid = (int(h.min()) + int(h.max())) // 2
    y = np.round(df["value"].to_numpy() * 100).astype(np.float64)
    grp = (df["user_id"].to_numpy() % 2).astype(np.int64)
    cells = {}
    for c, g, late in (("a1", 0, False), ("a2", 0, True), ("b1", 1, False), ("b2", 1, True)):
        m = (grp == g) & ((h > mid) == late)
        cells[c] = y[m]
    did_ref = (cells["b2"].mean() - cells["b1"].mean()) - (
        cells["a2"].mean() - cells["a1"].mean()
    )
    se_ref = math.sqrt(sum(c.var(ddof=1) / len(c) for c in cells.values()))
    for c in ("a1", "a2", "b1", "b2"):
        assert out[f"n_{c}"] == len(cells[c])
    assert out["did_cents"] == pytest.approx(did_ref, rel=1e-9)
    assert out["se_cents"] == pytest.approx(se_ref, rel=1e-9)
    assert out["z"] == pytest.approx(did_ref / se_ref, rel=1e-9)
    # the arm shift is constant over time, so the DID nets it out
    assert not bool(out["significant_95"])


def test_ljung_box_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = (
        REGISTRY["ljung_box_white_noise"].fn(spark, d).toPandas()
        .set_index("event_type")
    )
    h_all = _hour_idx(df)
    lo, hi = int(h_all.min()), int(h_all.max())
    for t in ("view", "error"):
        v = np.zeros(hi - lo + 1, dtype=np.int64)
        for h in h_all[(df["event_type"] == t).to_numpy()]:
            v[h - lo] += 1
        n = len(v)
        q = 0.0
        for k in range(1, 9):
            x, y = v[k:].astype(float), v[:-k].astype(float)
            r = float(np.corrcoef(x, y)[0, 1])
            q += r * r / (n - k)
        q *= n * (n + 2)
        row = out.loc[t]
        assert row["n_hours"] == n
        assert row["q_stat"] == pytest.approx(q, rel=1e-9)
        assert bool(row["reject_white_noise_95"]) == (q > 15.50731305586545)


def test_cusum_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["cusum_drift"].fn(spark, d).toPandas().set_index("event_type")
    h_all = _hour_idx(df)
    for t in ("view", "purchase"):
        hs = np.sort(np.unique(h_all[(df["event_type"] == t).to_numpy()]))
        v = {h: int(((df["event_type"] == t).to_numpy() & (h_all == h)).sum()) for h in hs}
        tot = sum(v.values())
        n = len(hs)
        # textbook recursion in the N-scaled integer domain
        s_val, peak, alarms, first = 0, 0, 0, None
        for h in hs:
            s_val = max(0, s_val + n * v[h] - tot)
            peak = max(peak, s_val)
            if s_val > 4 * tot:
                alarms += 1
                first = h if first is None else first
        row = out.loc[t]
        assert row["max_cusum_scaled"] == peak
        assert row["n_alarm_hours"] == alarms
        if first is None:
            assert row["first_alarm_hour"] is None or np.isnan(row["first_alarm_hour"])
        else:
            assert row["first_alarm_hour"] == first


def test_cusum_detects_level_shift(spark, tmp_path):
    """A volume step-change mid-series must alarm shortly after the
    shift; a flat series must stay quiet."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for h in range(400):
        n = 5 if h < 300 else 15  # 3x volume jump at hour 300
        for i in range(n):
            rows.append((len(rows), base + pd.Timedelta(hours=h, minutes=i % 60),
                         i % 10, "view", 10.0, "{}"))
    for h in range(400):  # flat control series
        for i in range(5):
            rows.append((len(rows), base + pd.Timedelta(hours=h, minutes=i % 60),
                         i % 10, "click", 10.0, "{}"))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    df.to_parquet(os.path.join(str(tmp_path), "events.parquet"), index=False)
    out = REGISTRY["cusum_drift"].fn(spark, str(tmp_path)).toPandas().set_index("event_type")
    assert out.loc["view"]["n_alarm_hours"] > 0
    assert 300 <= out.loc["view"]["first_alarm_hour"] <= 320
    assert out.loc["click"]["n_alarm_hours"] == 0


def _avg_ranks(v):
    """1-based average ranks with ties, pure numpy."""
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), float)
    sv = v[order]
    i = 0
    while i < len(v):
        j = i
        while j < len(v) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def test_spearman_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["spearman_corr"].fn(spark, d).toPandas().set_index("event_type")
    x_all, y_all = _hour_idx(df), _cents(df)
    for t in ("purchase", "click", "signup"):
        m = (df["event_type"] == t).to_numpy()
        rx, ry = _avg_ranks(x_all[m]), _avg_ranks(y_all[m])
        ref = float(np.corrcoef(rx, ry)[0, 1])
        row = out.loc[t]
        assert row["n"] == int(m.sum())
        assert row["rho"] == pytest.approx(ref, rel=1e-9)
    # engineered monotone trends: purchase up, click down, signup flat
    assert out.loc["purchase"]["rho"] > 0.1
    assert out.loc["click"]["rho"] < -0.05
    assert abs(out.loc["signup"]["rho"]) < 0.1


def test_anova_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["anova_oneway"].fn(spark, d).toPandas().iloc[0]
    y = _cents(df).astype(float)
    groups = [y[(df["event_type"] == t).to_numpy()] for t in
              ("click", "error", "purchase", "signup", "view")]
    grand = y.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(y)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert out["n"] == n
    assert out["ss_between"] == pytest.approx(ssb, rel=1e-9)
    assert out["ss_total"] == pytest.approx(ssb + ssw, rel=1e-9)
    assert out["f_stat"] == pytest.approx(f_ref, rel=1e-9)
    assert out["eta_sq"] == pytest.approx(ssb / (ssb + ssw), rel=1e-9)
    # the engineered per-type trends make the group means differ hard
    assert out["f_stat"] > 10.0


def test_wilson_ci_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["conversion_wilson_ci"].fn(spark, d).toPandas()
    conv = (
        df.assign(hit=((df["event_type"] == "purchase") & (df["value"] > 95)))
        .groupby("user_id")["hit"]
        .max()
    )
    z = 1.959963984540054
    for variant in (0, 1):
        arm = conv[conv.index % 2 == variant]
        n, c = len(arm), int(arm.sum())
        p = c / n
        den = 1 + z * z / n
        ctr = (p + z * z / (2 * n)) / den
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
        row = out[out["variant"] == variant].iloc[0]
        assert row["n"] == n and row["c"] == c
        assert row["rate"] == pytest.approx(p, rel=1e-12)
        assert row["ci_lo"] == pytest.approx(ctr - half, rel=1e-9)
        assert row["ci_hi"] == pytest.approx(ctr + half, rel=1e-9)
        # Wilson pulls the interval INSIDE [0,1]; at p=1 the upper
        # bound sits just below the point estimate — that's the point
        assert 0.0 <= row["ci_lo"] < row["ci_hi"] <= 1.0
        assert row["ci_lo"] < row["rate"]


def test_ks_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["ks_test_2sample"].fn(spark, d).toPandas().iloc[0]
    sub = df[df["event_type"] == "purchase"]
    y = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
    grp = (sub["user_id"].to_numpy() % 2).astype(np.int64)
    y1, y2 = np.sort(y[grp == 0]), np.sort(y[grp == 1])
    n1, n2 = len(y1), len(y2)
    vals = np.unique(y)
    f1 = np.searchsorted(y1, vals, side="right") / n1
    f2 = np.searchsorted(y2, vals, side="right") / n2
    dref = float(np.abs(f1 - f2).max())
    assert out["n1"] == n1 and out["n2"] == n2
    assert out["d"] == pytest.approx(dref, abs=1e-12)
    crit = 1.3581015157406195 * math.sqrt((n1 + n2) / (n1 * n2))
    assert bool(out["significant_95"]) == (dref > crit)
    # the engineered +2500-cent arm shift is a distributional difference
    assert bool(out["significant_95"])


def test_benford_matches_reference(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["benford_deviation"].fn(spark, d).toPandas().iloc[0]
    cents = _cents(df)
    cents = cents[cents > 0]
    digits = np.array([int(str(c)[0]) for c in cents])
    n = len(digits)
    p = np.log10(1.0 + 1.0 / np.arange(1, 10))
    o = np.array([(digits == dd).sum() for dd in range(1, 10)], dtype=float)
    e = n * p
    chi2 = float(((o - e) ** 2 / e).sum())
    mad = float(np.abs(o / n - p).mean())
    assert out["n"] == n
    assert out["chi2"] == pytest.approx(chi2, rel=1e-9)
    assert out["mad"] == pytest.approx(mad, rel=1e-9)
    # the synthetic grid amounts are decidedly non-Benford
    assert bool(out["nonconforming_95"])


def test_acf_matches_numpy(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["acf_volume"].fn(spark, d).toPandas()
    sub = df[df["event_type"] == "view"]
    hours = _hour_idx(sub)
    lo, hi = _hour_idx(df).min(), _hour_idx(df).max()
    v = np.zeros(hi - lo + 1, dtype=np.int64)
    for h in hours:
        v[h - lo] += 1
    for lag in (1, 24):
        x, y = v[lag:], v[:-lag]  # (v_h, v_{h-lag})
        ref = float(np.corrcoef(x, y)[0, 1])
        row = out[(out["event_type"] == "view") & (out["lag"] == lag)].iloc[0]
        assert row["n"] == len(x)
        assert row["acf"] == pytest.approx(ref, rel=1e-9)


def test_bootstrap_matches_bruteforce(spark, tiny_events_dir):
    import hashlib

    from magictables_spark.plans.regression_pack import _BOOT_B, _BOOT_T

    d, df = tiny_events_dir
    out = REGISTRY["bootstrap_ci_mean"].fn(spark, d).toPandas().iloc[0]
    sub = df[df["event_type"] == "purchase"]
    y = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
    ids = sub["event_id"].to_numpy()

    def weight(eid, b):
        u = int(hashlib.md5(f"{eid}:{b}".encode()).hexdigest()[:15], 16)
        for k, t in enumerate(_BOOT_T):
            if u < t:
                return k
        return 6

    means = []
    for b in range(1, _BOOT_B + 1):
        w = np.array([weight(e, b) for e in ids], dtype=np.int64)
        means.append(float((w * y).sum()) / float(w.sum()))
    means.sort()
    # PERCENTILE_DISC: value at ceil(p*m) in sorted order (1-based)
    lo = means[math.ceil(0.025 * _BOOT_B) - 1]
    hi = means[math.ceil(0.975 * _BOOT_B) - 1]
    assert out["n"] == len(y)
    assert out["mean_cents"] == pytest.approx(y.sum() / len(y), rel=1e-12)
    assert out["ci_lo_cents"] == pytest.approx(lo, abs=1e-9)
    assert out["ci_hi_cents"] == pytest.approx(hi, abs=1e-9)
    # the interval is a real CI: brackets the point estimate, nonzero width
    assert out["ci_lo_cents"] < out["mean_cents"] < out["ci_hi_cents"]


def test_gini_matches_bruteforce(spark, tiny_events_dir):
    d, df = tiny_events_dir
    out = REGISTRY["key_skew_gini"].fn(spark, d).toPandas().iloc[0]
    counts = df.groupby("user_id").size().to_numpy().astype(np.int64)
    n_keys, total = len(counts), counts.sum()
    s_abs = np.abs(counts[:, None] - counts[None, :]).sum()
    gini = s_abs / (2.0 * n_keys * total)
    assert out["n_keys"] == n_keys and out["n_events"] == total
    assert out["max_key_load"] == counts.max()
    assert out["gini"] == pytest.approx(gini, rel=1e-9)
    # zipf load is genuinely skewed — the diagnostic must say so
    assert out["gini"] > 0.3


def test_kendall_tau_matches_bruteforce_reference(spark, tiny_events_dir):
    """Re-derive tau-b from first principles (itertools over the daily
    frame, textbook tie-corrected formula) — concordant/discordant
    counts and tau must agree exactly."""
    import itertools
    import math
    from collections import Counter

    d, df = tiny_events_dir
    got = {r.event_type: r for r in REGISTRY["kendall_tau_daily"].fn(spark, d).collect()}
    pdf = df.copy()
    pdf["day"] = pdf["ts"].dt.date
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    daily = (
        pdf.groupby(["event_type", "day"])
        .agg(x=("event_id", "count"), y=("cents", "sum"))
        .reset_index()
    )
    for et, sub in daily.groupby("event_type"):
        xs, ys = sub["x"].tolist(), sub["y"].tolist()
        n = len(xs)
        c = d_ = 0
        for i, j in itertools.combinations(range(n), 2):
            s = (xs[i] - xs[j]) * (ys[i] - ys[j])
            if s > 0:
                c += 1
            elif s < 0:
                d_ += 1
        n0 = n * (n - 1) // 2
        n1 = sum(v * (v - 1) // 2 for v in Counter(xs).values())
        n2 = sum(v * (v - 1) // 2 for v in Counter(ys).values())
        r = got[et]
        assert (r.n_days, r.concordant, r.discordant) == (n, c, d_)
        denom = math.sqrt(n0 - n1) * math.sqrt(n0 - n2)
        if denom == 0:
            assert r.tau_b is None
        else:
            assert r.tau_b == pytest.approx((c - d_) / denom, rel=1e-12)


def test_ols_normal_equations_matches_numpy_lstsq(spark, tiny_events_dir):
    """The exact-integer Cramer solve must agree with numpy's float
    least-squares solution of the same design matrix (micro-unit
    truncation tolerance)."""
    d, df = tiny_events_dir
    row = REGISTRY["ols_normal_equations"].fn(spark, d).collect()[0]
    sub = df[df["event_type"] == "purchase"]
    x1 = sub["ts"].dt.hour.to_numpy()
    x2 = sub["ts"].dt.day.to_numpy()
    y = (sub["value"] * 100).round().to_numpy()
    X = np.column_stack([np.ones_like(x1), x1, x2]).astype(np.float64)
    beta, *_ = np.linalg.lstsq(X, y.astype(np.float64), rcond=None)
    assert row.n == len(sub)
    assert int(row.det) > 0
    got = np.array([row.b0_micro, row.b_hour_micro, row.b_day_micro]) / 1e6
    assert np.allclose(got, beta, atol=2e-6, rtol=1e-9), (got, beta)


def test_changepoint_matches_bruteforce_sse(spark, tiny_events_dir):
    """Re-derive the best split with a brute-force float SSE scan per
    event type — the exact-integer argmin must pick the same split and
    the reported segment means must match."""
    d, df = tiny_events_dir
    got = {
        r.event_type: r
        for r in REGISTRY["changepoint_binary_seg"].fn(spark, d).collect()
    }
    pdf = df.copy()
    pdf["day"] = pdf["ts"].dt.date
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    daily = (
        pdf.groupby(["event_type", "day"])["cents"].sum().reset_index(name="y")
    )
    for et, sub in daily.groupby("event_type"):
        ys = sub.sort_values("day")["y"].to_numpy().astype(np.float64)
        days = sub.sort_values("day")["day"].tolist()
        n = len(ys)

        def sse(a):
            return float(((a - a.mean()) ** 2).sum()) if len(a) else 0.0

        costs = [sse(ys[:i]) + sse(ys[i:]) for i in range(1, n)]
        best = int(np.argmin(costs))
        r = got[et]
        assert r.split_day == days[best].isoformat()
        assert (r.n_left, r.n_right) == (best + 1, n - best - 1)
        assert r.mean_left_micro == (int(ys[: best + 1].sum()) * 10**6) // (best + 1)
        assert r.mean_right_micro == (
            int(ys[best + 1 :].sum()) * 10**6
        ) // (n - best - 1)
