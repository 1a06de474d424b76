"""Hypothesis property tests for the mleval pack's ALGEBRA — the
closed forms the SQL implements, checked against brute force in pure
Python (no Spark session: these verify the math, the engine parity is
devcheck's job).

Three identities carry the whole family:
  1. the doubled-rank collapse (AUC / Mann-Whitney): per-distinct-value
     counts reproduce exact average ranks;
  2. the below-cumulative pairwise-|a-b| collapse (energy distance);
  3. the LCM(1..10) rationalization of AP@k.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

counts2 = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(lambda t: sum(t) > 0),
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(counts2)
def test_doubled_rank_collapse_equals_average_ranks(groups):
    """r1d = sum c1*(2*below + c + 1) is exactly twice the average-rank
    sum of group-1 members — for ANY tie structure."""
    # expand to a flat multiset with labels; value = index in groups
    vals, labs = [], []
    for v, (c1, c0) in enumerate(groups):
        vals += [v] * (c1 + c0)
        labs += [1] * c1 + [0] * c0
    vals, labs = np.array(vals), np.array(labs)
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals), float)
    sv = vals[order]
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    r1_true = ranks[labs == 1].sum()

    below = 0
    r1d = 0
    for _, (c1, c0) in enumerate(groups):
        c = c1 + c0
        r1d += c1 * (2 * below + c + 1)
        below += c
    assert r1d == int(round(2 * r1_true))

    n1, n0 = int((labs == 1).sum()), int((labs == 0).sum())
    if n1 and n0:
        u1 = r1_true - n1 * (n1 + 1) / 2.0
        auc_ref = u1 / (n1 * n0)
        auc_sql = (r1d - n1 * (n1 + 1)) / (2.0 * n1 * n0)
        assert abs(auc_sql - auc_ref) < 1e-12


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 4), st.integers(0, 4)),
        min_size=1,
        max_size=10,
    )
)
def test_energy_pair_sum_collapse(rows):
    """sum over v of c_v*(v*C_below - S_below) equals the brute-force
    sum of |a-b| over unordered cross/within pairs."""
    # dedupe values (distinct-value frame), keep deterministic counts
    seen = {}
    for v, c1, c2 in rows:
        a, b = seen.get(v, (0, 0))
        seen[v] = (a + c1, b + c2)
    frame = sorted(seen.items())
    xs, ys = [], []
    for v, (c1, c2) in frame:
        xs += [v] * c1
        ys += [v] * c2
    xs, ys = np.array(xs, float), np.array(ys, float)

    cb1 = sb1 = cb2 = sb2 = 0
    sxy = sxx = syy = 0
    for v, (c1, c2) in frame:
        sxy += c1 * (v * cb2 - sb2) + c2 * (v * cb1 - sb1)
        sxx += c1 * (v * cb1 - sb1)
        syy += c2 * (v * cb2 - sb2)
        cb1 += c1
        sb1 += c1 * v
        cb2 += c2
        sb2 += c2 * v

    brute_xy = (
        np.abs(xs[:, None] - ys[None, :]).sum() if len(xs) and len(ys) else 0.0
    )
    brute_xx = (
        np.abs(xs[:, None] - xs[None, :]).sum() / 2 if len(xs) else 0.0
    )
    brute_yy = (
        np.abs(ys[:, None] - ys[None, :]).sum() / 2 if len(ys) else 0.0
    )
    assert sxy == int(brute_xy)
    assert sxx == int(brute_xx)
    assert syy == int(brute_yy)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=10), st.integers(1, 400))
def test_ap_lcm_rationalization(rel, n_rel_extra):
    """The 2520-scaled integer AP numerator equals the float AP
    computed from precision-at-hit-ranks, exactly."""
    k = len(rel)
    n_rel = sum(rel) + n_rel_extra  # corpus-wide relevant >= top-k hits
    cum = 0
    num_scaled = 0
    ap_terms = []
    for i, r in enumerate(rel, start=1):
        cum += int(r)
        if r:
            num_scaled += cum * (2520 // i)
            ap_terms.append(cum / i)
    denom = min(n_rel, 10)
    ap_float = sum(ap_terms) / denom if denom else 0.0
    ap_sql = num_scaled / (2520.0 * denom) if denom else 0.0
    assert math.isclose(ap_sql, ap_float, rel_tol=1e-12, abs_tol=1e-15)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 60), min_size=2, max_size=40))
def test_moment_expansion_matches_numpy(vals):
    """The raw-moment expansion (m2/m3/m4 from power sums) matches
    numpy's central moments."""
    y = np.array(vals, float)
    n = len(y)
    s1, s2, s3, s4 = y.sum(), (y**2).sum(), (y**3).sum(), (y**4).sum()
    m = s1 / n
    m2 = s2 / n - m * m
    m3 = s3 / n - 3 * m * (s2 / n) + 2 * m**3
    m4 = s4 / n - 4 * m * (s3 / n) + 6 * m * m * (s2 / n) - 3 * m**4
    assert math.isclose(m2, y.var(), rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(m3, ((y - m) ** 3).mean(), rel_tol=1e-9, abs_tol=1e-7)
    assert math.isclose(m4, ((y - m) ** 4).mean(), rel_tol=1e-9, abs_tol=1e-6)
