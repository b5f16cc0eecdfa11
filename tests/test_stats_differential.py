"""Third-implementation differentials for the statistics family: the
DuckDB oracles prove cross-engine CONSISTENCY, but a formula that is
wrong the same way in both dialects sails through (the r5 advisory found
exactly this class in canonicalize_url). These tests re-derive each
statistic from first principles in numpy/pure Python on the same fixture
and compare."""

from __future__ import annotations

import pytest

import numpy as np

from .conftest import SF_ORACLE


def _duck(sql):
    from .oracle_utils import duckdb_df

    return duckdb_df(sql, SF_ORACLE)


def _events():
    import pandas as pd  # noqa: F401

    return _duck("SELECT user_id, event_id, event_type, ts, value FROM events")


def _rankdata(x):
    """Average ranks (scipy.stats.rankdata 'average', 1-based)."""
    x = np.asarray(x)
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=np.float64)
    sx = x[order]
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def test_spearman_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.event_type: (r.n, r.spearman)
        for r in all_queries()["q_spearman_corr"](spark, SF_ORACLE).collect()
    }
    ev = _events()
    for et, g in ev.groupby("event_type"):
        rv = _rankdata(g["value"].to_numpy())
        rt = _rankdata(g["ts"].astype("int64").to_numpy())
        rho = np.corrcoef(rv, rt)[0, 1]
        n, sp = got[et]
        assert n == len(g)
        assert abs(sp - rho) < 1e-4, (et, sp, rho)


def test_mannwhitney_matches_direct_formula(spark):
    from aram_matchdata_etl_spark.operators.stats import MWU_A, MWU_B
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_mannwhitney_u"](spark, SF_ORACLE).collect()[0]
    ev = _events()
    a = ev[ev.event_type == MWU_A]["value"].to_numpy()
    b = ev[ev.event_type == MWU_B]["value"].to_numpy()
    na, nb = len(a), len(b)
    ranks = _rankdata(np.concatenate([a, b]))
    ra = ranks[:na].sum()
    u = ra - na * (na + 1) / 2.0
    # tie-corrected normal approximation
    combined = np.concatenate([a, b])
    _, counts = np.unique(combined, return_counts=True)
    tie = (counts**3 - counts).sum()
    n = na + nb
    sigma = np.sqrt(na * nb / 12.0 * ((n + 1) - tie / (n * (n - 1.0))))
    z = (u - na * nb / 2.0) / sigma
    assert row.na == na and row.nb == nb
    assert abs(row.u_stat - u) < 0.51  # u rounded to 2 decimals
    assert abs(row.z_stat - z) < 1e-4


def test_kaplan_meier_matches_direct(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.duration: (r.n_risk, r.n_events, r.n_censored, r.survival)
        for r in all_queries()["q_kaplan_meier"](spark, SF_ORACLE).collect()
    }
    ev = _events()
    spells = []
    for _, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"]["ts"]
        if views.empty:
            continue
        tv = views.min()
        purch = g[(g.event_type == "purchase") & (g.ts >= tv)]["ts"]
        if not purch.empty:
            end, obs = purch.min(), 1
        else:
            end, obs = g["ts"].max(), 0
        d = int((end.value - tv.value) // (86400 * 10**9))
        spells.append((d, obs))
    spells.sort()
    total = len(spells)
    assert sum(v[1] + v[2] for v in got.values()) == total
    # walk the life table
    s = 1.0
    removed = 0
    for d in sorted({d for d, _ in spells}):
        deaths = sum(1 for x, o in spells if x == d and o)
        cens = sum(1 for x, o in spells if x == d and not o)
        at_risk = total - removed
        if deaths and at_risk:
            s *= 1 - deaths / at_risk
        removed += deaths + cens
        nr, nev, ncen, surv = got[d]
        assert (nr, nev, ncen) == (at_risk, deaths, cens), d
        assert abs(surv - s) < 1e-5, (d, surv, s)


def test_cohens_kappa_matches_direct(spark):
    from aram_matchdata_etl_spark.operators.stats import (
        KAPPA_CHAR_CUTS,
        KAPPA_WORD_CUTS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_cohens_kappa"](spark, SF_ORACLE).collect()[0]
    docs = _duck("SELECT n_chars, len(string_split(text, ' ')) AS nw FROM documents")
    ra = np.digitize(docs["n_chars"], KAPPA_CHAR_CUTS)
    rb = np.digitize(docs["nw"], KAPPA_WORD_CUTS)
    po = (ra == rb).mean()
    pe = sum((ra == k).mean() * (rb == k).mean() for k in range(3))
    kappa = (po - pe) / (1 - pe)
    assert row.n == len(docs)
    assert abs(row.po - po) < 1e-6
    assert abs(row.kappa - kappa) < 1e-5


def test_ndcg_bounds_and_ideal(spark):
    """NDCG invariants: 0 <= ndcg <= 1; a group ranked exactly by
    relevance (ideal) would have ndcg 1 — verify dcg <= idcg always and
    idcg equals the explicit ideal-order computation."""
    from aram_matchdata_etl_spark.operators.stats import NDCG_K
    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_ndcg_eval"](spark, SF_ORACLE).collect()
    assert rows
    from aram_matchdata_etl_spark.operators.stats import KAPPA_WORD_CUTS

    docs = _duck(
        "SELECT source, len(string_split(text, ' ')) AS nw FROM documents"
    )
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        assert r.dcg <= r.idcg + 1e-9
        rel = np.sort(
            np.digitize(
                docs[docs.source == r.source]["nw"].to_numpy(), KAPPA_WORD_CUTS
            )
        )[::-1][:NDCG_K]
        ideal = ((2.0**rel - 1) / np.log2(np.arange(2, len(rel) + 2))).sum()
        assert abs(r.idcg - ideal) < 1e-4


def test_ewma_matches_pandas_semantics(spark):
    """The closed-form window unrolling equals pandas ewm(adjust=False)."""
    import pandas as pd

    from aram_matchdata_etl_spark.operators.stats import load_table  # noqa: F401
    from aram_matchdata_etl_spark.operators.events_analytics import EWMA_ALPHA
    from aram_matchdata_etl_spark.registry import all_queries

    got = all_queries()["q_ewma"](spark, SF_ORACLE).toPandas()
    ev = _events()
    ev["day"] = ev["ts"].dt.floor("D")
    daily = ev.groupby(["event_type", "day"])["value"].mean().reset_index()
    for et, g in daily.groupby("event_type"):
        want = g.sort_values("day")["value"].ewm(alpha=EWMA_ALPHA, adjust=False).mean()
        mine = got[got.event_type == et].sort_values("day")["ewma"].to_numpy()
        assert np.allclose(mine, want.to_numpy(), atol=1e-4), et


def _md5_52(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


@pytest.mark.slow
def test_bootstrap_ci_matches_pure_python(spark):
    """Re-derive the Poisson-bootstrap CI from first principles: python
    hashlib md5 weights, numpy replicate means, manual percentile ranks.
    Catches a formula wrong the same way in both SQL dialects."""
    from aram_matchdata_etl_spark.operators.stats import (
        _BOOT_HI_RN,
        _BOOT_LO_RN,
        _POIS1_CUTS,
        BOOTSTRAP_B,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.event_type: r
        for r in all_queries()["q_bootstrap_ci"](spark, SF_ORACLE).collect()
    }
    ev = _events()

    import hashlib

    def pois_w(i, b):
        # one digest per replicate PAIR; halves are independent 52-bit
        # uniforms (mirrors the operator's grid scheme)
        d = hashlib.md5(f"{i}:{b // 2}".encode()).hexdigest()
        h = int(d[13 * (b % 2) : 13 * (b % 2) + 13], 16)
        for k, c in enumerate(_POIS1_CUTS):
            if h < c:
                return k
        return 8

    for et, g in ev.groupby("event_type"):
        ids = g["event_id"].to_numpy()
        vals = g["value"].to_numpy()
        means = []
        for b in range(BOOTSTRAP_B):
            w = np.array([pois_w(i, b) for i in ids], dtype=float)
            means.append(float((w * vals).sum() / w.sum()))
        means.sort()
        row = got[et]
        assert abs(row.mean - vals.mean()) < 1e-5
        assert abs(row.ci_lo - means[_BOOT_LO_RN - 1]) < 1e-5, et
        assert abs(row.ci_hi - means[_BOOT_HI_RN - 1]) < 1e-5, et
        # a 95% CI must bracket the point estimate on this benign fixture
        assert row.ci_lo < row.mean < row.ci_hi


def test_permutation_test_matches_pure_python(spark):
    from aram_matchdata_etl_spark.operators.stats import PERM_P
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_permutation_test"](spark, SF_ORACLE).collect()[0]
    ev = _events()
    v1 = ev.loc[ev.user_id % 2 == 1, "value"].mean()
    v0 = ev.loc[ev.user_id % 2 == 0, "value"].mean()
    diff_obs = v1 - v0
    assert abs(row.diff_obs - diff_obs) < 1e-5
    ids = ev["event_id"].to_numpy()
    vals = ev["value"].to_numpy()
    import hashlib

    n_ext = 0
    for p in range(PERM_P):
        # bit = parity of hex char 31 or 32 of the PAIR digest
        bits = np.array(
            [
                int(
                    hashlib.md5(f"{i}#{p // 2}".encode()).hexdigest()[
                        30 + p % 2
                    ],
                    16,
                )
                % 2
                for i in ids
            ]
        )
        d = vals[bits == 1].mean() - vals[bits == 0].mean()
        if abs(d) >= abs(diff_obs):
            n_ext += 1
    assert row.n_extreme_plus_one == n_ext + 1
    assert abs(row.p_value - (n_ext + 1) / (PERM_P + 1)) < 1e-6


def test_ks_test_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_ks_test"](spark, SF_ORACLE).collect()[0]
    ev = _events()
    x0 = np.sort(ev.loc[ev.user_id % 2 == 0, "value"].to_numpy())
    x1 = np.sort(ev.loc[ev.user_id % 2 == 1, "value"].to_numpy())
    grid = np.unique(np.concatenate([x0, x1]))
    f0 = np.searchsorted(x0, grid, side="right") / len(x0)
    f1 = np.searchsorted(x1, grid, side="right") / len(x1)
    d = np.abs(f0 - f1).max()
    assert row.n0 == len(x0) and row.n1 == len(x1)
    assert abs(row.d_stat - d) < 1e-6
    lam2 = (d * np.sqrt(len(x0) * len(x1) / (len(x0) + len(x1)))) ** 2
    p = min(
        1.0,
        2
        * sum((-1) ** (k - 1) * np.exp(-2 * k * k * lam2) for k in range(1, 5)),
    )
    assert abs(row.p_value - p) < 1e-6


def test_autocorr_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.stats import ACF_MAX_LAG
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.lag: (r.n_days, r.acf)
        for r in all_queries()["q_autocorr"](spark, SF_ORACLE).collect()
    }
    ev = _events()
    days = ev["ts"].dt.normalize()
    series = (
        days.value_counts()
        .reindex(
            __import__("pandas").date_range(days.min(), days.max(), freq="D"),
            fill_value=0,
        )
        .to_numpy(dtype=float)
    )
    for lag in range(1, ACF_MAX_LAG + 1):
        a, b = series[lag:], series[:-lag]
        r = np.corrcoef(a, b)[0, 1]
        n_days, acf = got[lag]
        assert n_days == len(a)
        assert abs(acf - r) < 1e-5, (lag, acf, r)


def test_gini_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.event_type: (r.n_users, r.gini)
        for r in all_queries()["q_gini"](spark, SF_ORACLE).collect()
    }
    ev = _events()
    for et, g in ev.groupby("event_type"):
        x = np.sort(g.groupby("user_id")["value"].sum().to_numpy())
        n = len(x)
        gini = 2 * (np.arange(1, n + 1) * x).sum() / (n * x.sum()) - (n + 1) / n
        nu, gv = got[et]
        assert nu == n
        assert abs(gv - gini) < 1e-5, (et, gv, gini)
        assert 0.0 <= gv <= 1.0


def test_burstiness_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.user_id: (r.n_gaps, r.mean_gap_s, r.burstiness)
        for r in all_queries()["q_interarrival_burstiness"](
            spark, SF_ORACLE
        ).collect()
    }
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    for uid, g in ev.groupby("user_id"):
        # .dt.total_seconds(), not int64/1e9: pandas 2 keeps DuckDB
        # timestamps at datetime64[us] resolution, so the int64 view is
        # MICROseconds
        gaps = g["ts"].diff().dropna().dt.total_seconds().to_numpy()
        if len(gaps) < 2:
            assert uid not in got
            continue
        mu, sd = gaps.mean(), gaps.std()  # std ddof=0 == STDDEV_POP
        b = (sd - mu) / (sd + mu)
        n_gaps, mean_gap, bv = got[uid]
        assert n_gaps == len(gaps)
        assert abs(mean_gap - mu) < 1e-4
        assert abs(bv - b) < 1e-5, (uid, bv, b)


def test_cramers_v_and_chi2_match_numpy(spark):
    """The numpy crosstab includes EMPTY (lang, source) cells, which
    still contribute (0-e)^2/e — this test caught the observed-cells-
    only formulation both dialects originally shared (chi2 undercounted
    by ~10.45 on the fixture)."""
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_cramers_v"](spark, SF_ORACLE).collect()[0]
    chi_row = all_queries()["q_chi_squared"](spark, SF_ORACLE).collect()[0]
    docs = _duck("SELECT lang, source FROM documents")
    ct = docs.groupby(["lang", "source"]).size().unstack(fill_value=0).to_numpy(dtype=float)
    n = ct.sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2 = ((ct - e) ** 2 / e).sum()
    r, c = ct.shape
    v = np.sqrt(chi2 / (n * min(r - 1, c - 1)))
    assert row.n == int(n)
    assert row.min_dim == min(r - 1, c - 1)
    assert abs(row.chi2 - chi2) < 1e-4
    assert abs(row.cramers_v - v) < 1e-6
    assert 0.0 <= row.cramers_v <= 1.0
    assert abs(chi_row.chi2 - chi2) < 1e-4
    assert chi_row.dof == (r - 1) * (c - 1)
    assert chi_row.n == int(n)


def test_zipf_fit_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_zipf_fit"](spark, SF_ORACLE).collect()[0]
    docs = _duck("SELECT text FROM documents")
    from collections import Counter

    freq = Counter(w for t in docs["text"] for w in t.split(" "))
    counts = np.array(sorted(freq.values(), reverse=True), dtype=float)
    assert row.vocab_size == len(counts)
    assert row.n_tokens == int(counts.sum())
    x = np.log(np.arange(1, len(counts) + 1))
    y = np.log(counts)
    slope, _ = np.polyfit(x, y, 1)
    assert abs(row.zipf_slope - slope) < 1e-4
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert abs(row.r2 - r2) < 1e-4


def test_auc_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.event_type: (r.n_pos, r.n_neg, r.auc)
        for r in all_queries()["q_auc_eval"](spark, SF_ORACLE).collect()
    }
    ev = _events()
    scores = ev["value"].to_numpy()
    ranks = _rankdata(scores)
    for et in ev["event_type"].unique():
        pos = (ev["event_type"] == et).to_numpy()
        npos, nneg = int(pos.sum()), int((~pos).sum())
        auc = (ranks[pos].sum() - npos * (npos + 1) / 2.0) / (npos * nneg)
        gp, gn, ga = got[et]
        assert (gp, gn) == (npos, nneg)
        assert abs(ga - auc) < 1e-5, (et, ga, auc)


def test_calibration_brier_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.stats import AUC_POS, CAL_BINS
    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_calibration_bins"](spark, SF_ORACLE).collect()
    ev = _events()
    v = ev["value"].to_numpy()
    p = (v - v.min()) / (v.max() - v.min())
    y = (ev["event_type"] == AUC_POS).to_numpy().astype(float)
    brier = np.mean((p - y) ** 2)
    bins = np.minimum((p * CAL_BINS).astype(int), CAL_BINS - 1)
    for r in rows:
        m = bins == r.bin
        assert r.n == int(m.sum())
        assert abs(r.mean_p - p[m].mean()) < 1e-5
        assert abs(r.frac_pos - y[m].mean()) < 1e-5
        assert abs(r.brier - brier) < 1e-5


@pytest.mark.slow
def test_lift_deciles_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.stats import AUC_POS, LIFT_DECILES
    from aram_matchdata_etl_spark.registry import all_queries

    rows = {r.decile: r for r in
            all_queries()["q_lift_deciles"](spark, SF_ORACLE).collect()}
    ev = _events()
    # grouped-data deciles: a tied score lands in the decile of its
    # cumulative END position, scores ranked descending
    vals, counts = np.unique(ev["value"].to_numpy(), return_counts=True)
    pos = np.array([
        ((ev["value"] == v) & (ev["event_type"] == AUC_POS)).sum()
        for v in vals
    ])
    order = np.argsort(-vals)
    cume = np.cumsum(counts[order])
    n = cume[-1]
    dec = np.minimum(np.ceil(cume * LIFT_DECILES / n).astype(int),
                     LIFT_DECILES)
    base = pos.sum() / n
    for d in np.unique(dec):
        m = dec == d
        nr = counts[order][m].sum()
        npos = pos[order][m].sum()
        r = rows[int(d)]
        assert r.n_rows == nr and r.n_pos == npos
        assert abs(r.response_rate - npos / nr) < 1e-6
        assert abs(r.lift - (npos / nr) / base) < 1e-5


def test_psi_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.stats import PSI_BINS, PSI_SMOOTH
    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_psi"](spark, SF_ORACLE).collect()
    ev = _events()
    v = ev["value"].to_numpy()
    us = ev["ts"].astype("int64").to_numpy() // 1000  # ns -> us
    split = (us.min() + us.max()) // 2
    bins = np.minimum(
        ((v - v.min()) / (v.max() - v.min()) * PSI_BINS).astype(int),
        PSI_BINS - 1,
    )
    in_a = us < split
    ca = np.array([(bins[in_a] == b).sum() for b in range(PSI_BINS)])
    cb = np.array([(bins[~in_a] == b).sum() for b in range(PSI_BINS)])
    pa = (ca + PSI_SMOOTH) / (ca.sum() + PSI_SMOOTH * PSI_BINS)
    pb = (cb + PSI_SMOOTH) / (cb.sum() + PSI_SMOOTH * PSI_BINS)
    terms = (pa - pb) * np.log(pa / pb)
    assert len(rows) == PSI_BINS
    for r in rows:
        assert r.n_first_half == ca[r.bin] and r.n_second_half == cb[r.bin]
        assert abs(r.psi_term - terms[r.bin]) < 1e-5
        assert abs(r.psi_total - terms.sum()) < 1e-5


def test_bh_fdr_matches_pure_python(spark):
    import math

    from aram_matchdata_etl_spark.registry import all_queries

    rows = {r.event_type: r for r in
            all_queries()["q_bh_fdr"](spark, SF_ORACLE).collect()}
    ev = _events()
    stats = {}
    allv = ev["value"].to_numpy()
    for et in ev["event_type"].unique():
        g = ev[ev.event_type == et]["value"].to_numpy()
        rest = ev[ev.event_type != et]["value"].to_numpy()
        z = (g.mean() - rest.mean()) / math.sqrt(
            g.var(ddof=1) / len(g) + rest.var(ddof=1) / len(rest)
        )
        # math.erfc is the exact reference; the operator uses the A&S
        # 7.1.26 polynomial (|err| < 1.5e-7)
        p = math.erfc(abs(z) / math.sqrt(2))
        stats[et] = (len(g), z, p)
    assert len(allv) == sum(s[0] for s in stats.values())
    m = len(stats)
    ordered = sorted(stats.items(), key=lambda kv: (kv[1][2], kv[0]))
    adj, run = {}, 1.0
    for i in range(m, 0, -1):
        et, (_, _, p) = ordered[i - 1]
        run = min(run, p * m / i)
        adj[et] = run
    for et, (n, z, p) in stats.items():
        r = rows[et]
        assert r.n == n
        assert abs(r.z_stat - z) < 1e-4
        assert abs(r.p_value - p) < 1e-5
        assert abs(r.p_adj - adj[et]) < 1e-5


def test_mann_kendall_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_mann_kendall"](spark, SF_ORACLE).collect()[0]
    ev = _events()
    daily = (
        ev.assign(day=ev["ts"].dt.floor("D"))
        .groupby("day")["value"].sum().sort_index().to_numpy()
    )
    n = len(daily)
    s = 0
    for i in range(n):
        s += int(np.sign(daily[i + 1:] - daily[i]).sum())
    _, counts = np.unique(daily, return_counts=True)
    tt = (counts * (counts - 1.0) * (2 * counts + 5))[counts > 1].sum()
    var = (n * (n - 1.0) * (2 * n + 5) - tt) / 18.0
    z = 0.0 if s == 0 else (s - np.sign(s)) / np.sqrt(var)
    assert row.n_days == n and row.s_stat == s
    assert abs(row.z_stat - z) < 1e-5


def test_theil_sen_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_theil_sen"](spark, SF_ORACLE).collect()[0]
    ev = _events()
    daily = (
        ev.assign(day=ev["ts"].dt.floor("D"))
        .groupby("day")["value"].sum().sort_index()
    )
    y = daily.to_numpy()
    x = np.arange(len(y), dtype=float)
    slopes = [
        (y[j] - y[i]) / (x[j] - x[i])
        for i in range(len(y)) for j in range(i + 1, len(y))
    ]
    slopes.sort()
    m = len(slopes)
    med = (slopes[(m - 1) // 2] + slopes[m // 2]) / 2.0
    resid = np.sort(y - med * x)
    k = len(resid)
    intercept = (resid[(k - 1) // 2] + resid[k // 2]) / 2.0
    assert row.n_days == k and row.n_pairs == m
    assert abs(row.slope_per_day - med) < 1e-5
    assert abs(row.intercept - intercept) < 1e-4


def test_kendall_tau_matches_pure_python(spark):
    from aram_matchdata_etl_spark.operators.stats import (
        KAPPA_CHAR_CUTS,
        KAPPA_WORD_CUTS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_kendall_tau"](spark, SF_ORACLE).collect()[0]
    docs = _duck("SELECT n_chars, len(string_split(text, ' ')) AS nw "
                 "FROM documents")
    ra = np.digitize(docs["n_chars"].to_numpy(), KAPPA_CHAR_CUTS)
    rb = np.digitize(docs["nw"].to_numpy(), KAPPA_WORD_CUTS)
    n = len(ra)
    conc = disc = 0
    for i in range(n):
        da, db = ra[i + 1:] - ra[i], rb[i + 1:] - rb[i]
        conc += int(((da * db) > 0).sum())
        disc += int(((da * db) < 0).sum())
    n0 = n * (n - 1) / 2.0
    n1 = sum(t * (t - 1) / 2.0 for t in np.bincount(ra))
    n2 = sum(t * (t - 1) / 2.0 for t in np.bincount(rb))
    tau = (conc - disc) / np.sqrt((n0 - n1) * (n0 - n2))
    assert row.concordant == conc and row.discordant == disc
    assert abs(row.tau_b - tau) < 1e-5


def test_js_divergence_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.text import KL_SMOOTH
    from aram_matchdata_etl_spark.registry import all_queries

    got = {r.source: (r.js_divergence, r.js_bits) for r in
           all_queries()["q_js_divergence"](spark, SF_ORACLE).collect()}
    docs = _duck("SELECT source, text FROM documents")
    from collections import Counter

    corpus = Counter()
    per_src = {}
    for src, text in zip(docs["source"], docs["text"]):
        words = [w for w in text.split(" ") if w]
        corpus.update(words)
        per_src.setdefault(src, Counter()).update(words)
    vocab = sorted(corpus)
    v = len(vocab)
    n_all = sum(corpus.values())
    q = np.array([(corpus[w] + KL_SMOOTH) / (n_all + KL_SMOOTH * v)
                  for w in vocab])
    for src, cnt in per_src.items():
        n_src = sum(cnt.values())
        p = np.array([(cnt[w] + KL_SMOOTH) / (n_src + KL_SMOOTH * v)
                      for w in vocab])
        m = (p + q) / 2
        js = 0.5 * (p * np.log(p / m)).sum() + 0.5 * (q * np.log(q / m)).sum()
        assert abs(got[src][0] - js) < 1e-5, src
        assert abs(got[src][1] - js / np.log(2)) < 1e-5, src
        assert -1e-9 <= got[src][1] <= 1.0 + 1e-9  # JS in bits is bounded


def test_token_entropy_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_token_entropy"](spark, SF_ORACLE).collect()
    docs = _duck("SELECT doc_id, text FROM documents")
    texts = dict(zip(docs["doc_id"], docs["text"]))
    from collections import Counter

    checked = 0
    for r in rows[:50]:
        words = [w for w in texts[r.doc_id].split(" ") if w]
        cnt = np.array(list(Counter(words).values()), dtype=float)
        p = cnt / cnt.sum()
        h = -(p * np.log(p)).sum()
        assert r.n_tokens == len(words)
        assert r.n_types == len(cnt)
        assert abs(r.entropy - h) < 1e-5
        assert abs(r.ttr - len(cnt) / len(words)) < 1e-6
        checked += 1
    assert checked == 50


def test_seasonal_naive_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.events_analytics import (
        SEASONAL_LAG,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_seasonal_naive"](spark, SF_ORACLE).collect()[0]
    ev = _events()
    daily = (
        ev.assign(day=ev["ts"].dt.floor("D"))
        .groupby("day")["value"].sum().sort_index()
    )
    # fixture has no calendar gaps; the operator gap-fills to zero first
    assert (daily.index[1:] - daily.index[:-1]).days.max() == 1
    y = daily.to_numpy()
    f7, f1 = y[:-SEASONAL_LAG], y[SEASONAL_LAG - 1:-1]
    act = y[SEASONAL_LAG:]
    e7 = np.abs(act - f7)
    e1 = np.abs(act - f1)
    assert row.n_eval == len(act)
    assert abs(row.mae_seasonal - e7.mean()) < 1e-5
    assert abs(row.smape_seasonal
               - (2 * e7 / (np.abs(act) + np.abs(f7))).mean()) < 1e-6
    assert abs(row.mae_naive1 - e1.mean()) < 1e-5
    assert abs(row.skill_vs_naive1 - (1 - e7.mean() / e1.mean())) < 1e-5


def test_heaps_fit_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_heaps_fit"](spark, SF_ORACLE).collect()[0]
    docs = _duck("SELECT source, text FROM documents")
    pts = {}
    for src, text in zip(docs["source"], docs["text"]):
        words = [w for w in text.split(" ") if w]
        n, v = pts.get(src, (0, set()))
        pts[src] = (n + len(words), v | set(words))
    x = np.log([n for n, _ in pts.values()])
    yv = np.log([len(v) for _, v in pts.values()])
    slope, intercept = np.polyfit(x, yv, 1)
    r2 = np.corrcoef(x, yv)[0, 1] ** 2
    assert row.n_sources == len(pts)
    assert abs(row.heaps_beta - slope) < 1e-4
    assert abs(row.heaps_k - np.exp(intercept)) < 1e-3
    assert abs(row.r2 - r2) < 1e-4
    assert 0.0 < row.heaps_beta <= 1.0  # vocabulary growth is sublinear


def test_readability_matches_pure_python(spark):
    import re

    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_readability"](spark, SF_ORACLE).collect()
    docs = _duck("SELECT doc_id, text FROM documents")
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for r in rows[:50]:
        text = texts[r.doc_id]
        words = [w for w in text.split(" ") if w]
        sent = max(len(re.findall(r"[.!?]+", text)), 1)
        syl = len(re.findall(r"[aeiouyAEIOUY]+", text))
        flesch = (206.835 - 1.015 * (len(words) / sent)
                  - 84.6 * (syl / len(words)))
        assert r.n_words == len(words)
        assert r.n_sentences == sent
        assert r.n_syllables == syl
        assert abs(r.flesch - flesch) < 1e-3


def test_kruskal_wallis_matches_direct_formula(spark):
    """Re-derive H from average ranks over the pooled sample (the
    scipy.stats.kruskal formulation) and compare both the raw and
    tie-corrected statistics."""
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_kruskal_wallis"](spark, SF_ORACLE).collect()[0]
    ev = _events()
    pooled = ev["value"].to_numpy()
    ranks = _rankdata(pooled)
    n = len(pooled)
    srr = 0.0
    groups = list(ev.groupby("event_type"))
    for _, g in groups:
        r = ranks[g.index.to_numpy()]
        srr += r.sum() ** 2 / len(r)
    h = 12.0 / (n * (n + 1)) * srr - 3 * (n + 1)
    _, counts = np.unique(pooled, return_counts=True)
    tie = float((counts.astype(np.float64) ** 3 - counts).sum())
    hc = h / (1 - tie / (n**3 - n))
    assert row.n == n and row.n_groups == len(groups)
    assert abs(row.h_stat - h) < 1e-4, (row.h_stat, h)
    assert abs(row.h_corrected - hc) < 1e-4, (row.h_corrected, hc)


def test_levene_matches_direct_formula(spark):
    """Brown-Forsythe re-derived row-at-a-time: median-centered absolute
    deviations, then the classic one-way ANOVA F on them (the
    scipy.stats.levene(center='median') formulation)."""
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_levene_test"](spark, SF_ORACLE).collect()[0]
    ev = _events()
    zs = []
    for _, g in ev.groupby("event_type"):
        v = g["value"].to_numpy()
        zs.append(np.abs(v - np.median(v)))
    n = sum(len(z) for z in zs)
    k = len(zs)
    grand = np.concatenate(zs).mean()
    between = sum(len(z) * (z.mean() - grand) ** 2 for z in zs) / (k - 1)
    within = sum(((z - z.mean()) ** 2).sum() for z in zs) / (n - k)
    f = between / within
    assert row.n == n and row.k == k
    assert abs(row.f_stat - f) < 1e-4, (row.f_stat, f)


def test_effect_sizes_match_direct_formula(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_effect_sizes"](spark, SF_ORACLE).collect()[0]
    ev = _events()
    variant = (ev["user_id"] % 2).to_numpy()
    val = ev["value"].to_numpy()
    conv = (ev["event_type"] == "purchase").to_numpy().astype(float)
    a, b = val[variant == 0], val[variant == 1]
    n0, n1 = len(a), len(b)
    sp = np.sqrt(
        ((n0 - 1) * a.var(ddof=1) + (n1 - 1) * b.var(ddof=1)) / (n0 + n1 - 2)
    )
    d = (b.mean() - a.mean()) / sp
    g = d * (1 - 3.0 / (4 * (n0 + n1) - 9))
    p0, p1 = conv[variant == 0].mean(), conv[variant == 1].mean()
    pp = (p0 * n0 + p1 * n1) / (n0 + n1)
    z = (p1 - p0) / np.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
    assert (row.n0, row.n1) == (n0, n1)
    assert abs(row.cohens_d - d) < 1e-6
    assert abs(row.hedges_g - g) < 1e-6
    assert abs(row.prop_z - z) < 1e-6
    assert abs(row.risk_ratio - p1 / p0) < 1e-6


def test_l_diversity_matches_pure_python(spark):
    """Entropy l-diversity re-derived with collections.Counter."""
    import math
    from collections import Counter

    from aram_matchdata_etl_spark.operators.privacy import L_DIV_WIDTH
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        (r.lang, r.bucket): (r.n, r.distinct_l, r.entropy_l)
        for r in all_queries()["q_l_diversity"](spark, SF_ORACLE).collect()
    }
    docs = _duck("SELECT lang, source, n_chars FROM documents")
    classes: dict = {}
    for lang, source, n_chars in docs.itertuples(index=False):
        classes.setdefault((lang, n_chars // L_DIV_WIDTH), Counter())[
            source
        ] += 1
    assert set(got) == set(classes)
    for key, counter in classes.items():
        n = sum(counter.values())
        ent = -sum(c / n * math.log(c / n) for c in counter.values())
        gn, gl, ge = got[key]
        assert gn == n and gl == len(counter)
        assert abs(ge - ent) < 1e-4, (key, ge, ent)


def test_ngram_novelty_matches_pure_python(spark):
    """Bigram document-frequency novelty re-derived with Counter over the
    raw text — catches a shared distinct/tokenize blind spot the
    twin-SQL oracle cannot."""
    from collections import Counter

    from aram_matchdata_etl_spark.registry import all_queries

    docs = _duck("SELECT doc_id, text FROM documents")
    per_doc = {
        r.doc_id: {
            f"{a} {b}"
            for a, b in zip(r.text.split(" "), r.text.split(" ")[1:])
        }
        for r in docs.itertuples(index=False)
    }
    df = Counter(sh for s in per_doc.values() for sh in s)
    got = {
        r.doc_id: (r.n_shingles, r.n_unique, r.novelty)
        for r in all_queries()["q_ngram_novelty"](spark, SF_ORACLE).collect()
    }
    want_keys = {d for d, s in per_doc.items() if s}
    assert set(got) == want_keys
    for d in want_keys:
        s = per_doc[d]
        uniq = sum(1 for sh in s if df[sh] == 1)
        n_sh, n_un, nov = got[d]
        assert n_sh == len(s) and n_un == uniq, d
        assert abs(nov - uniq / len(s)) < 1e-5, d


def test_mutual_information_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_mutual_information"](spark, SF_ORACLE).collect()[0]
    docs = _duck("SELECT lang, source FROM documents")
    joint = docs.groupby(["lang", "source"]).size()
    n = joint.sum()
    p = joint / n
    px = docs.groupby("lang").size() / n
    py = docs.groupby("source").size() / n
    mi = sum(
        v * np.log(v / (px[l] * py[s])) for (l, s), v in p.items()
    )
    hx = -sum(v * np.log(v) for v in px)
    hy = -sum(v * np.log(v) for v in py)
    assert abs(row.mi - mi) < 1e-5
    assert abs(row.h_lang - hx) < 1e-5
    assert abs(row.h_source - hy) < 1e-5
    assert abs(row.nmi - mi / np.sqrt(hx * hy)) < 1e-5


def test_lorenz_curve_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    rows = {
        r.decile: r
        for r in all_queries()["q_lorenz_curve"](spark, SF_ORACLE).collect()
    }
    ev = _events()
    spend = (
        ev.groupby("user_id")["value"].sum().reset_index()
        .sort_values(["value", "user_id"], kind="mergesort")["value"]
        .to_numpy()
    )
    n = len(spend)
    # NTILE: first (n % 10) buckets get one extra row
    base, extra = divmod(n, 10)
    sizes = [base + (1 if i < extra else 0) for i in range(10)]
    cuts = np.cumsum([0] + sizes)
    total = spend.sum()
    cum = 0.0
    for d in range(1, 11):
        seg = spend[cuts[d - 1] : cuts[d]]
        cum += seg.sum()
        r = rows[d]
        assert r.n_users == len(seg)
        assert abs(r.spend_sum - round(seg.sum(), 4)) < 1e-6
        assert abs(r.cum_share - cum / total) < 1e-5
    assert rows[10].cum_share == 1.0


def test_dau_mau_and_cumulative_users_match_pure_python(spark):
    from aram_matchdata_etl_spark.operators.events_analytics import (
        DAU_MAU_WINDOW,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    ev = _duck("SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events")
    user_days = {(r.user_id, r.day.date()) for r in ev.itertuples(index=False)}
    days = sorted({d for _, d in user_days})
    per_day: dict = {}
    first_seen: dict = {}
    for u, d in sorted(user_days, key=lambda t: t[1]):
        per_day.setdefault(d, set()).add(u)
        first_seen.setdefault(u, d)
    cum = all_queries()["q_cumulative_users"](spark, SF_ORACLE).collect()
    got_cum = {r.day.date(): (r.n_active, r.n_new, r.cum_users) for r in cum}
    running = 0
    for d in days:
        new = sum(1 for u, fd in first_seen.items() if fd == d)
        running += new
        assert got_cum[d] == (len(per_day[d]), new, running), d
    got_dm = {
        r.day.date(): (r.dau, r.mau, r.stickiness)
        for r in all_queries()["q_dau_mau"](spark, SF_ORACLE).collect()
    }
    import datetime

    for d in days:
        win = {
            u
            for u, ud in user_days
            if ud <= d and ud > d - datetime.timedelta(days=DAU_MAU_WINDOW)
        }
        dau, mau, st = got_dm[d]
        assert (dau, mau) == (len(per_day[d]), len(win)), d
        assert abs(st - dau / mau) < 1e-5, d


def test_ohlc_matches_pure_python(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    ev = _duck(
        "SELECT event_type, date_trunc('day', ts) AS day, ts, event_id, value"
        " FROM events"
    )
    got = {
        (r.event_type, r.day.date()): (r.n, r.open, r.high, r.low, r.close)
        for r in all_queries()["q_ohlc"](spark, SF_ORACLE).collect()
    }
    for (et, day), grp in ev.groupby(["event_type", "day"]):
        g = grp.sort_values(["ts", "event_id"], kind="mergesort")
        v = g["value"].to_numpy()
        n, o, h, l, c = got[(et, day.date())]
        assert n == len(v)
        assert abs(o - v[0]) < 1e-6 and abs(c - v[-1]) < 1e-6
        assert abs(h - v.max()) < 1e-6 and abs(l - v.min()) < 1e-6


def test_rolling_median_matches_numpy(spark):
    import datetime

    from aram_matchdata_etl_spark.operators.events_analytics import (
        ROLLING_MEDIAN_DAYS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    daily = _duck(
        "SELECT event_type, date_trunc('day', ts) AS day, AVG(value) AS x"
        " FROM events GROUP BY 1, 2"
    )
    got = {
        (r.event_type, r.day.date()): (r.window_n, r.rolling_median)
        for r in all_queries()["q_rolling_median"](spark, SF_ORACLE).collect()
    }
    for et, grp in daily.groupby("event_type"):
        series = {r.day.date(): r.x for r in grp.itertuples(index=False)}
        for d in series:
            win = [
                x
                for dd, x in series.items()
                if dd <= d
                and dd > d - datetime.timedelta(days=ROLLING_MEDIAN_DAYS)
            ]
            n, med = got[(et, d)]
            assert n == len(win)
            assert abs(med - np.median(win)) < 1e-5, (et, d)


def test_did_matches_pure_python(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_did"](spark, SF_ORACLE).collect()[0]
    ev = _events()
    us = ev["ts"].astype("int64") // 1000  # epoch micros
    cut = us.min() + (us.max() - us.min()) // 2
    treated = (ev["user_id"] % 2).to_numpy()
    post = (us >= cut).to_numpy()
    v = ev["value"].to_numpy()
    means = {}
    se2 = 0.0
    for t in (0, 1):
        for p in (0, 1):
            cell = v[(treated == t) & (post == p)]
            means[(t, p)] = cell.mean()
            se2 += cell.var(ddof=1) / len(cell)
    did = (means[(1, 1)] - means[(1, 0)]) - (means[(0, 1)] - means[(0, 0)])
    assert row.n == len(v)
    assert abs(row.did - did) < 1e-5
    assert abs(row.z_stat - did / np.sqrt(se2)) < 1e-5


def test_embedding_outliers_match_numpy(spark):
    from aram_matchdata_etl_spark.operators.similarity import EMB_OUTLIER_Z
    from aram_matchdata_etl_spark.registry import all_queries

    emb = _duck("SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings")
    got = {
        r.vec_id: (r.label, r.dist2, r.z, r.is_outlier)
        for r in all_queries()["q_embedding_outliers"](
            spark, SF_ORACLE
        ).collect()
    }
    assert set(got) == set(emb["vec_id"])
    for label, grp in emb.groupby("label"):
        mat = np.vstack(grp["vec"].to_numpy())
        cent = mat.mean(axis=0)
        d2 = ((mat - cent) ** 2).sum(axis=1)
        mu, sd = d2.mean(), d2.std(ddof=1)
        for vid, dd in zip(grp["vec_id"], d2):
            gl, gd, gz, go = got[vid]
            assert gl == label
            assert abs(gd - dd) < 1e-5
            assert abs(gz - (dd - mu) / sd) < 1e-4
            assert go == bool((dd - mu) / sd > EMB_OUTLIER_Z)


def test_anova_oneway_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_anova_oneway"](spark, SF_ORACLE).collect()[0]
    ev = _events()
    groups = [g["value"].to_numpy() for _, g in ev.groupby("event_type")]
    allv = np.concatenate(groups)
    gm = allv.mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.k == k and row.n_total == n
    assert abs(row.f_stat - f) < 1e-4, (row.f_stat, f)
    assert abs(row.eta_sq - ssb / (ssb + ssw)) < 1e-6


def test_jarque_bera_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.event_type: r
        for r in all_queries()["q_jarque_bera"](spark, SF_ORACLE).collect()
    }
    ev = _events()
    for et, g in ev.groupby("event_type"):
        x = g["value"].to_numpy()
        n = len(x)
        m = x.mean()
        s = x.std()  # population
        g1 = ((x - m) ** 3).mean() / s**3
        g2 = ((x - m) ** 4).mean() / s**4 - 3
        jb = n / 6.0 * (g1**2 + g2**2 / 4.0)
        r = got[et]
        assert r.n == n
        assert abs(r.skew - g1) < 1e-5
        assert abs(r.excess_kurtosis - g2) < 1e-5
        assert abs(r.jb_stat - jb) < 1e-2 * max(1.0, jb)


def test_wilson_ci_matches_direct_formula(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.event_type: r
        for r in all_queries()["q_wilson_ci"](spark, SF_ORACLE).collect()
    }
    ev = _events()
    z = 1.959964
    for et, g in ev.groupby("event_type"):
        n = len(g)
        p = (g["value"].to_numpy() > 100).mean()
        center = p + z * z / (2 * n)
        half = z * np.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
        denom = 1 + z * z / n
        r = got[et]
        assert r.n == n and abs(r.p_hat - p) < 1e-6
        assert abs(r.ci_lo - (center - half) / denom) < 1e-6
        assert abs(r.ci_hi - (center + half) / denom) < 1e-6
        # interval sanity: contains p_hat, stays in [0, 1]
        assert 0.0 <= r.ci_lo <= p <= r.ci_hi <= 1.0


def test_nelson_aalen_matches_pure_python(spark):
    """Re-derive the cumulative hazard from raw per-user spells (the same
    view->purchase definition) in pure Python, including the at-risk
    bookkeeping — shared-rollup bugs with q_kaplan_meier would surface
    here identically to the KM anchoring bug this file caught."""
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.duration: r
        for r in all_queries()["q_nelson_aalen"](spark, SF_ORACLE).collect()
    }
    ev = _events()
    spells = {}
    for uid, g in ev.groupby("user_id"):
        views = g[g["event_type"] == "view"]["ts"]
        if views.empty:
            continue
        tv = views.min()
        purch = g[(g["event_type"] == "purchase") & (g["ts"] >= tv)]["ts"]
        end = purch.min() if not purch.empty else g["ts"].max()
        dur = int(
            np.floor(
                (end.value - tv.value) / 1000 / 86400000000.0
            )
        )
        spells[uid] = (dur, not purch.empty)
    durations = sorted({d for d, _ in spells.values()})
    at_risk = len(spells)
    H = 0.0
    V = 0.0
    for d in durations:
        events_d = sum(1 for dd, obs in spells.values() if dd == d and obs)
        total_d = sum(1 for dd, _ in spells.values() if dd == d)
        H += events_d / at_risk
        V += events_d / at_risk**2
        r = got[d]
        assert r.n_risk == at_risk, (d, r.n_risk, at_risk)
        assert r.n_events == events_d
        assert abs(r.cum_hazard - H) < 1e-5
        assert abs(r.hazard_var - V) < 1e-6
        at_risk -= total_d
    assert set(got) == set(durations)


def test_seasonal_decompose_matches_numpy(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    rows = (
        all_queries()["q_seasonal_decompose"](spark, SF_ORACLE)
        .orderBy("day")
        .collect()
    )
    ev = _events()
    daily = (
        ev.assign(day=ev["ts"].dt.floor("D"))
        .groupby("day")["value"]
        .mean()
        .sort_index()
    )
    y = daily.to_numpy()
    days = daily.index
    trend = np.full(len(y), np.nan)
    for i in range(3, len(y) - 3):
        trend[i] = y[i - 3 : i + 4].mean()
    dows = np.array([d.dayofweek for d in days])
    detr = y - trend
    s_raw = {
        dow: np.nanmean(detr[dows == dow]) for dow in np.unique(dows)
    }
    c = np.mean(list(s_raw.values()))
    seasonal = {k: v - c for k, v in s_raw.items()}
    assert len(rows) == len(y)
    for i, r in enumerate(rows):
        assert abs(r.y - y[i]) < 1e-5
        if np.isnan(trend[i]):
            assert r.trend is None
        else:
            assert abs(r.trend - trend[i]) < 1e-5
            assert abs(r.resid - (y[i] - trend[i] - seasonal[dows[i]])) < 1e-5
        assert abs(r.seasonal - seasonal[dows[i]]) < 1e-5
    # decomposition identity where trend exists: y = trend + seasonal + resid
    for r in rows:
        if r.trend is not None:
            assert abs(r.y - (r.trend + r.seasonal + r.resid)) < 5e-6


def test_kmeans_lloyd_matches_numpy(spark):
    """Pure-numpy Lloyd with the identical seeding / round count /
    tie-break must produce the identical hard assignment — this checks
    the ALGORITHM (argmin structure, update order), where the DuckDB
    oracle unroll shares the long-form SQL formulation."""
    from aram_matchdata_etl_spark.operators.similarity import (
        KMEANS_K,
        KMEANS_ROUNDS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.vec_id: r.cluster
        for r in all_queries()["q_kmeans_lloyd"](spark, SF_ORACLE).collect()
    }
    emb = _duck("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id")
    X = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    cents = {int(i): X[ids == i][0] for i in range(KMEANS_K)}
    assign = None
    for r in range(KMEANS_ROUNDS):
        cid_list = sorted(cents)
        C = np.stack([cents[c] for c in cid_list])
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.array([cid_list[j] for j in d2.argmin(axis=1)])
        if r < KMEANS_ROUNDS - 1:
            cents = {
                int(c): X[assign == c].mean(axis=0)
                for c in np.unique(assign)
            }
    want = dict(zip((int(i) for i in ids), (int(a) for a in assign)))
    assert got == want


def test_knn_classify_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.similarity import (
        KNN_HOLDOUT,
        KNN_K,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.vec_id: (r.predicted_label, r.true_label, r.correct)
        for r in all_queries()["q_knn_classify"](spark, SF_ORACLE).collect()
    }
    emb = _duck("SELECT vec_id, label, embedding FROM embeddings ORDER BY vec_id")
    X = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    test_m = ids < KNN_HOLDOUT
    ref_m = ~test_m
    sims = X[test_m] @ X[ref_m].T
    ref_ids = ids[ref_m]
    ref_labels = labels[ref_m]
    for qi, qid in enumerate(ids[test_m]):
        # sort by (-sim, vec_id) to mirror the deterministic tie-break
        order = np.lexsort((ref_ids, -sims[qi]))[:KNN_K]
        votes = {}
        for j in order:
            votes[ref_labels[j]] = votes.get(ref_labels[j], 0) + 1
        pred = min(votes, key=lambda c: (-votes[c], c))
        p, t, correct = got[int(qid)]
        assert p == pred, (qid, p, pred)
        assert t == labels[ids == qid][0]
        assert correct == (p == t)


def test_pr_auc_matches_pure_python(spark):
    """Average precision with the group-end tie convention, re-derived
    row-at-a-time in pure Python."""
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.event_type: (r.n_pos, r.pr_auc)
        for r in all_queries()["q_pr_auc"](spark, SF_ORACLE).collect()
    }
    ev = _events()
    vals = ev["value"].to_numpy()
    for et in ev["event_type"].unique():
        pos = (ev["event_type"] == et).to_numpy()
        order = np.argsort(-vals, kind="mergesort")
        sv = vals[order]
        sp = pos[order]
        # walk distinct-score groups in descending order
        ap = 0.0
        cum_n = 0
        cum_pos = 0
        i = 0
        while i < len(sv):
            j = i
            while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                j += 1
            g_pos = int(sp[i : j + 1].sum())
            cum_n += j - i + 1
            cum_pos += g_pos
            ap += g_pos * (cum_pos / cum_n)
            i = j + 1
        ap /= pos.sum()
        n_pos, pr = got[et]
        assert n_pos == pos.sum()
        assert abs(pr - ap) < 1e-6, (et, pr, ap)


def test_closeness_sampled_matches_pure_python_bfs(spark):
    """Multi-source BFS distances re-derived with a dict/deque BFS over
    the same md5-bucket link graph (read back from the operator's own
    edge builder — the GRAPH is shared, the TRAVERSAL is independent)."""
    from collections import deque

    from aram_matchdata_etl_spark.operators.graph import (
        CLOSENESS_SOURCES,
        canonical_und,
        link_graph,
    )
    from aram_matchdata_etl_spark.registry import all_queries
    from aram_matchdata_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    und = canonical_und(link_graph(docs)).collect()
    adj: dict[int, set[int]] = {}
    for r in und:
        adj.setdefault(r.a, set()).add(r.b)
        adj.setdefault(r.b, set()).add(r.a)
    srcs = sorted(adj)[:CLOSENESS_SOURCES]
    acc: dict[int, list[int]] = {}
    for s in srcs:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for node, d in dist.items():
            acc.setdefault(node, []).append(d)
    rows = all_queries()["q_closeness_sampled"](spark, SF_ORACLE).collect()
    assert {r.doc_id for r in rows} == set(acc)
    for r in rows:
        ds = acc[r.doc_id]
        assert r.n_sources_reached == len(ds)
        assert r.total_dist == sum(ds)
        assert abs(r.harmonic - sum(1.0 / d for d in ds if d > 0)) < 1e-5


def test_random_projection_preserves_distances(spark):
    """The JL guarantee itself: squared pairwise distances after the
    16-dim Rademacher projection concentrate around the originals
    (E[d_proj^2] = d_orig^2; k=16 gives wide but bounded spread). Checked
    on every consecutive pair of the emitted vectors."""
    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_random_projection"](spark, SF_ORACLE).collect()
    proj: dict[int, dict[int, float]] = {}
    for r in rows:
        proj.setdefault(r.vec_id, {})[r.j] = r.pval
    emb = _duck(
        "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200"
        " ORDER BY vec_id"
    )
    orig = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples(index=False)
    }
    ids = sorted(orig)
    ratios = []
    for a, b in zip(ids, ids[1:]):
        d_o = float(((orig[a] - orig[b]) ** 2).sum())
        pa = np.array([proj[a][j] for j in range(16)])
        pb = np.array([proj[b][j] for j in range(16)])
        d_p = float(((pa - pb) ** 2).sum())
        if d_o > 0:
            ratios.append(d_p / d_o)
    ratios = np.array(ratios)
    # per-pair spread is chi2_16/16; mean over ~200 pairs is tight
    assert 0.85 < ratios.mean() < 1.15, ratios.mean()
    assert (ratios > 0.15).all() and (ratios < 3.5).all(), (
        ratios.min(),
        ratios.max(),
    )


def test_feature_hashing_matches_pure_python(spark):
    """Re-derive the signed bucket sums with hashlib directly."""
    import hashlib

    from aram_matchdata_etl_spark.operators.training import FEATHASH_DIM
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        (r.doc_id, r.bucket): r.feature_val
        for r in all_queries()["q_feature_hashing"](spark, SF_ORACLE).collect()
    }
    docs = _duck("SELECT doc_id, text FROM documents")
    want: dict[tuple[int, int], int] = {}
    for r in docs.itertuples(index=False):
        for w in r.text.split(" "):
            b = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % FEATHASH_DIM
            s = (
                1
                if int(hashlib.md5(f"sign_{w}".encode()).hexdigest()[:8], 16)
                % 2
                == 0
                else -1
            )
            key = (r.doc_id, b)
            want[key] = want.get(key, 0) + s
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want


def test_fisher_exact_matches_exact_rational_arithmetic(spark):
    """Third implementation with EXACT integer combinatorics
    (math.comb + Fraction — no floats until the final comparison):
    catches any log-space drift or support-bound bug in both engines'
    shared formula."""
    from fractions import Fraction
    from math import comb

    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_fisher_exact"](spark, SF_ORACLE).first()
    a, b, c, d = row.a, row.b, row.c, row.d
    n, r1, c1 = a + b + c + d, a + b, a + c
    denom = comb(n, c1)
    pmf = {
        k: Fraction(comb(r1, k) * comb(n - r1, c1 - k), denom)
        for k in range(max(0, r1 + c1 - n), min(r1, c1) + 1)
    }
    p_obs = pmf[a]
    # R's convention: sum tables at most (1 + 1e-7) * P(obs)
    cutoff = p_obs * (1 + Fraction(1, 10**7))
    p_two = sum(p for p in pmf.values() if p <= cutoff)
    assert abs(row.p_observed - float(p_obs)) < 2e-6
    assert abs(row.p_two_sided - float(p_two)) < 2e-6


def test_mcnemar_matches_exact_rational_arithmetic(spark):
    """Exact-binomial third implementation of q_mcnemar's p via
    math.comb over Fraction(1, 2**m)."""
    from fractions import Fraction
    from math import comb

    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_mcnemar"](spark, SF_ORACLE).first()
    b, c = row.b, row.c
    m = b + c
    tail = sum(
        Fraction(comb(m, i), 2**m) for i in range(0, min(b, c) + 1)
    )
    p = min(Fraction(1), 2 * tail)
    assert abs(row.p_exact - float(p)) < 2e-6
    assert abs(row.chi2 - (b - c) ** 2 / m) < 1e-9
    assert abs(row.chi2_corrected - (abs(b - c) - 1) ** 2 / m) < 1e-9


def test_map_eval_matches_pure_python(spark):
    """Third implementation of AP@K: per-source sort + explicit
    precision-at-hit loop in pure Python."""
    from aram_matchdata_etl_spark.operators.stats import (
        KAPPA_WORD_CUTS,
        MAP_K,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.source: (r.n_relevant, r.avg_precision)
        for r in all_queries()["q_map_eval"](spark, SF_ORACLE).collect()
    }
    docs = _duck(
        "SELECT source, doc_id, n_chars,"
        " len(string_split(text, ' ')) AS nw FROM documents"
    )
    for src, grp in docs.groupby("source"):
        rows = sorted(
            grp.itertuples(), key=lambda r: (-r.n_chars, r.doc_id)
        )
        rels = [1 if r.nw >= KAPPA_WORD_CUTS[1] else 0 for r in rows]
        r_total = sum(rels)
        hits, ap = 0, 0.0
        for pos, rel in enumerate(rels[:MAP_K], start=1):
            if rel:
                hits += 1
                ap += hits / pos
        ap = ap / min(r_total, MAP_K) if r_total else 0.0
        n_rel, got_ap = got[src]
        assert n_rel == r_total
        assert abs(got_ap - ap) < 2e-6, (src, got_ap, ap)


def test_cox_regression_matches_numpy_newton(spark):
    """Third implementation: Breslow partial-likelihood Newton in
    numpy — independent spell/covariate build from the raw events and
    vectorized risk-set cumsums (no SQL windows, no duration rollup) —
    catches a risk-set or tie-handling bug the two-dialect gate can't."""
    from aram_matchdata_etl_spark.operators.stats import COX_ROUNDS
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_cox_regression"](spark, SF_ORACLE).first()

    ev = _duck(
        "SELECT user_id, ts, event_type FROM events ORDER BY user_id, ts"
    )
    spells = {}
    for u, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"]
        if views.empty:
            continue
        tv = views.ts.min()
        pur = g[(g.event_type == "purchase") & (g.ts >= tv)]
        observed = int(not pur.empty)
        end = pur.ts.min() if observed else g.ts.max()
        duration = int(
            (end.value // 1000 - tv.value // 1000) // 86400000000
        )
        x = float((g.event_type == "error").mean())
        spells[u] = (duration, observed, x)
    dur = np.array([v[0] for v in spells.values()], dtype=np.float64)
    obs = np.array([v[1] for v in spells.values()], dtype=np.float64)
    x = np.array([v[2] for v in spells.values()], dtype=np.float64)
    # sort by duration DESC so risk set at t = prefix of the sort
    order = np.argsort(-dur, kind="mergesort")
    dur, obs, x = dur[order], obs[order], x[order]
    b = 0.0
    for r in range(COX_ROUNDS + 1):
        e = np.exp(b * x)
        cs0, cs1, cs2 = (
            np.cumsum(e),
            np.cumsum(x * e),
            np.cumsum(x * x * e),
        )
        # risk-set sums at each distinct event time = cumsum at the
        # LAST index of that duration in the desc sort
        u_tot = i_tot = 0.0
        for t in np.unique(dur[obs == 1]):
            last = np.searchsorted(-dur, -t, side="right") - 1
            s0, s1, s2 = cs0[last], cs1[last], cs2[last]
            at_t = (dur == t) & (obs == 1)
            d_t = at_t.sum()
            u_tot += x[at_t].sum() - d_t * s1 / s0
            i_tot += d_t * (s2 / s0 - (s1 / s0) ** 2)
        if r < COX_ROUNDS:
            b += u_tot / i_tot
    assert row.n_users == len(spells)
    assert row.n_events == int(obs.sum())
    assert abs(row.beta - b) < 1e-4, (row.beta, b)
    assert abs(row.se - 1.0 / np.sqrt(i_tot)) < 1e-4
    assert abs(row.z - b * np.sqrt(i_tot)) < 1e-3
    assert row.final_score_abs < 1e-3  # Newton actually converged


def test_join_size_estimate_matches_hashlib_pandas(spark):
    """Third implementation of q_join_size_estimate: per-key frequency
    products in pandas with hashlib md5 sampling — and a sanity bound
    that correlated sampling at p=1/64 lands within 50% of truth on
    this fixture (it measured ~3%)."""
    import hashlib

    from aram_matchdata_etl_spark.operators.streaming_batch import (
        JOINEST_MOD,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_join_size_estimate"](spark, SF_ORACLE).first()
    li = _duck("SELECT l_partkey, l_returnflag FROM lineitem")
    fa = li.groupby("l_partkey").size()
    fb = li[li.l_returnflag == "R"].groupby("l_partkey").size()
    keys = fa.index.intersection(fb.index)
    true_sz = int((fa[keys] * fb[keys]).sum())

    def sampled(k):
        h = hashlib.md5(str(k).encode()).hexdigest()[:8]
        return int(h, 16) % JOINEST_MOD == 0

    skeys = [k for k in keys if sampled(k)]
    est = JOINEST_MOD * int((fa[skeys] * fb[skeys]).sum())
    assert row.true_join_size == true_sz
    assert row.est_join_size == est
    assert row.n_sampled_keys == len(skeys)
    assert abs(row.rel_error) < 0.5


def test_logrank_matches_pure_python(spark):
    """Third implementation: textbook two-arm log-rank loop over sorted
    event times in pure Python (independent spell build, explicit
    risk-set shrinkage — no SQL windows)."""
    from collections import defaultdict

    from aram_matchdata_etl_spark.operators.stats import LOGRANK_EVENT_CUT
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_logrank_test"](spark, SF_ORACLE).first()
    ev = _duck(
        "SELECT user_id, ts, event_type FROM events ORDER BY user_id, ts"
    )
    spells = []
    counts = ev.groupby("user_id").size()
    for u, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"]
        if views.empty:
            continue
        tv = views.ts.min()
        pur = g[(g.event_type == "purchase") & (g.ts >= tv)]
        observed = int(not pur.empty)
        end = pur.ts.min() if observed else g.ts.max()
        dur = int((end.value - tv.value) // (86400 * 10**9))
        arm = 1 if counts[u] > LOGRANK_EVENT_CUT else 0
        spells.append((dur, observed, arm))
    # risk sets by explicit shrinkage over ascending durations
    durs = sorted({d for d, o, _ in spells if o})
    at_risk = defaultdict(lambda: [0, 0])
    for d, _, a in spells:
        at_risk[d][a] += 1
    O1 = E1 = V = 0.0
    n = [sum(1 for s in spells if s[2] == 0), sum(1 for s in spells if s[2] == 1)]
    removed_before = 0
    for t in sorted({d for d, _, _ in spells}):
        n_t = sum(1 for d, _, _ in spells if d >= t)
        n1_t = sum(1 for d, _, a in spells if d >= t and a == 1)
        d_t = sum(1 for d, o, _ in spells if d == t and o)
        d1_t = sum(1 for d, o, a in spells if d == t and o and a == 1)
        if d_t == 0:
            continue
        O1 += d1_t
        E1 += d_t * n1_t / n_t
        if n_t > 1:
            V += d_t * (n1_t / n_t) * (1 - n1_t / n_t) * (n_t - d_t) / (n_t - 1)
    assert row.observed_1 == O1
    assert abs(row.expected_1 - E1) < 1e-4
    assert abs(row.variance - V) < 1e-4
    assert abs(row.chi2 - (O1 - E1) ** 2 / V) < 1e-3


def test_cmh_matches_pure_python(spark):
    """Third implementation: per-stratum 2x2 cells built row-by-row in
    pure Python with the textbook CMH formulas."""
    from collections import defaultdict

    from aram_matchdata_etl_spark.operators.stats import LOGRANK_EVENT_CUT
    from aram_matchdata_etl_spark.registry import all_queries

    row = all_queries()["q_cmh_test"](spark, SF_ORACLE).first()
    ev = _duck("SELECT user_id, epoch_us(ts) AS us, event_type FROM events")
    counts = ev.groupby("user_id").size()
    cells = defaultdict(lambda: [0.0, 0.0, 0.0, 0.0])
    for r in ev.itertuples():
        k = 1 if counts[r.user_id] > LOGRANK_EVENT_CUT else 0
        wk = (int(r.us) // 86400000000 + 4) % 7 in (0, 6)
        err = r.event_type == "error"
        cells[k][0 if (wk and err) else 1 if wk else 2 if err else 3] += 1
    num = v = orn = ord_ = 0.0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        num += a - (a + b) * (a + c) / n
        v += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        orn += a * d / n
        ord_ += b * c / n
    assert row.n_strata == len(cells)
    assert abs(row.chi2_cmh - (abs(num) - 0.5) ** 2 / v) < 1e-4
    assert abs(row.or_mh - orn / ord_) < 1e-5


def test_mmr_rerank_diversifies(spark):
    """Full numpy differential of q_mmr_rerank's greedy: re-derive the
    pool, the greedy picks, and every mmr_score independently and require
    identical ids + scores, then check the selected set is no LESS
    diverse (mean pairwise cosine) than plain top-k.

    NOTE the old invariant `mmr_score <= lambda*rel` (for ranks > 1) was
    WRONG: mmr_score = lambda*rel - (1-lambda)*max_cos(d, selected), and
    max_cos can be NEGATIVE on near-isotropic embeddings, making the
    score exceed lambda*rel. The exact differential below is strictly
    stronger than any such inequality."""
    from itertools import combinations

    import numpy as np

    from aram_matchdata_etl_spark.operators.similarity import (
        MMR_K,
        MMR_LAMBDA,
        embeddings_d,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    from aram_matchdata_etl_spark.operators.similarity import MMR_POOL

    rows = sorted(
        all_queries()["q_mmr_rerank"](spark, SF_ORACLE).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.rnk for r in rows] == list(range(1, MMR_K + 1))
    assert abs(rows[0].mmr_score - MMR_LAMBDA * rows[0].relevance) < 2e-6
    assert rows[0].relevance == max(r.relevance for r in rows)

    emb = {
        r.vec_id: np.array(r.vec)
        for r in embeddings_d(spark, SF_ORACLE).collect()
    }

    # Independent greedy re-derivation (same tie-breaks: score desc,
    # vec_id asc), compared exactly against the operator's output.
    qid_ = min(emb)
    qv = emb[qid_]

    def cosine(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    rel_all = {v: cosine(qv, emb[v]) for v in emb if v != qid_}
    pool_ids = [
        v
        for v, _ in sorted(rel_all.items(), key=lambda t: (-t[1], t[0]))[
            :MMR_POOL
        ]
    ]
    lam = MMR_LAMBDA
    chosen, expected = [], []
    remaining = set(pool_ids)
    for rank in range(1, MMR_K + 1):
        if chosen:
            scored = [
                (
                    lam * rel_all[v]
                    - (1 - lam) * max(cosine(emb[v], emb[s]) for s in chosen),
                    v,
                )
                for v in remaining
            ]
        else:
            scored = [(lam * rel_all[v], v) for v in remaining]
        score, v = max(scored, key=lambda t: (t[0], -t[1]))
        chosen.append(v)
        remaining.discard(v)
        expected.append((rank, v, rel_all[v], score))

    assert [r.vec_id for r in rows] == [e[1] for e in expected]
    for r, (_, _, e_rel, e_score) in zip(rows, expected):
        assert abs(r.relevance - e_rel) < 2e-6
        assert abs(r.mmr_score - e_score) < 2e-6

    def mean_pairwise(ids):
        cs = [
            float(
                emb[a] @ emb[b]
                / (np.linalg.norm(emb[a]) * np.linalg.norm(emb[b]))
            )
            for a, b in combinations(ids, 2)
        ]
        return sum(cs) / len(cs)

    qid = min(emb)
    rel = {
        v: float(
            emb[qid] @ emb[v]
            / (np.linalg.norm(emb[qid]) * np.linalg.norm(emb[v]))
        )
        for v in emb
        if v != qid
    }
    topk = [v for v, _ in sorted(rel.items(), key=lambda t: (-t[1], t[0]))[:MMR_K]]
    assert mean_pairwise([r.vec_id for r in rows]) <= mean_pairwise(topk) + 1e-9


def test_pq_codes_match_numpy(spark):
    """Pure-numpy product quantization with the identical per-subspace
    seeding / round count / tie-break must produce the identical code
    words and (to fp tolerance) reconstruction errors — this checks the
    grouped one-pass trainer (_pq_lloyd_codebooks, r8) against the
    m-independent-Lloyds DEFINITION it optimizes, exactly as
    test_kmeans_lloyd_matches_numpy pins the flat trainer."""
    from aram_matchdata_etl_spark.operators.similarity import (
        KMEANS_ROUNDS,
        PQ_K,
        PQ_M,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.vec_id: (r.pq_code, r.recon_err)
        for r in all_queries()["q_embedding_pq"](spark, SF_ORACLE).collect()
    }
    emb = _duck("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id")
    X = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    sub = X.shape[1] // PQ_M
    codes = np.zeros((len(ids), PQ_M), dtype=int)
    err = np.zeros((len(ids), PQ_M))
    for sm in range(PQ_M):
        S = X[:, sm * sub : (sm + 1) * sub]
        cents = {int(i): S[ids == i][0] for i in range(PQ_K)}
        assign = None
        for r in range(KMEANS_ROUNDS):
            cid_list = sorted(cents)
            C = np.stack([cents[c] for c in cid_list])
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.array([cid_list[j] for j in d2.argmin(axis=1)])
            derr = d2.min(axis=1)
            if r < KMEANS_ROUNDS - 1:
                cents = {
                    int(c): S[assign == c].mean(axis=0)
                    for c in np.unique(assign)
                }
        codes[:, sm] = assign
        err[:, sm] = derr
    for i, vid in enumerate(ids):
        want_code = "|".join(str(c) for c in codes[i])
        g_code, g_err = got[int(vid)]
        assert g_code == want_code, (vid, g_code, want_code)
        assert abs(g_err - err[i].sum()) < 1e-5, (vid, g_err, err[i].sum())


def test_cusum_changepoint_matches_numpy(spark):
    """Pure-numpy CUSUM (Page 1954) over the daily means — standardize
    by the series mean / sample sd, cumulative-sum in day order, flag
    the |CUSUM| argmax — as the third implementation beside the
    operator and its window-SQL oracle. Also verifies the detector
    property on the fixture: the flagged day is the argmax of the
    numpy CUSUM too."""
    import numpy as np

    from aram_matchdata_etl_spark.registry import all_queries

    rows = sorted(
        all_queries()["q_cusum_changepoint"](spark, SF_ORACLE).collect(),
        key=lambda r: r.day,
    )
    daily = _duck(
        "SELECT date_trunc('day', ts) AS day, AVG(value) AS x, COUNT(*) AS n"
        " FROM events GROUP BY 1 ORDER BY day"
    )
    x = daily["x"].to_numpy(dtype=np.float64)
    mu, sd = x.mean(), x.std(ddof=1)
    cusum = np.cumsum((x - mu) / sd)
    flag = np.abs(cusum) == np.abs(cusum).max()

    assert len(rows) == len(x)
    for r, xi, ci, ni, fi in zip(rows, x, cusum, daily["n"], flag):
        assert abs(r.daily_mean - round(float(xi), 6)) < 1e-9
        assert r.n_events == int(ni)
        assert abs(r.cusum - round(float(ci), 6)) < 2e-6
        assert r.is_changepoint == bool(fi)
    assert sum(1 for r in rows if r.is_changepoint) >= 1


def test_cuped_matches_numpy(spark):
    """Pure-numpy CUPED (Deng et al. 2013): per-user pre/post rollup,
    theta = cov_samp(y, x) / var_samp(x), y_adj = y - theta (x - mean x),
    per-variant moments — beside the operator and its SQL oracle. Also
    asserts the METHOD property the fixture should exhibit: adjusted
    variance <= raw variance in each variant (that is the point of
    CUPED)."""
    import numpy as np
    import pandas as pd

    from aram_matchdata_etl_spark.operators.events_analytics import (
        CUPED_SPLIT,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.variant: r
        for r in all_queries()["q_cuped"](spark, SF_ORACLE).collect()
    }
    ev = _duck("SELECT user_id, ts, value FROM events")
    split = pd.Timestamp(CUPED_SPLIT)
    pre = ev[ev["ts"] < split].groupby("user_id")["value"].sum()
    post = ev[ev["ts"] >= split].groupby("user_id")["value"].sum()
    users = sorted(set(ev["user_id"]))
    x = np.array([pre.get(u, 0.0) for u in users])
    y = np.array([post.get(u, 0.0) for u in users])
    theta = np.cov(y, x, ddof=1)[0, 1] / x.var(ddof=1)
    y_adj = y - theta * (x - x.mean())
    variant = np.array([u % 2 for u in users])
    for v in (0, 1):
        m = variant == v
        r = got[v]
        assert r.n == int(m.sum())
        assert abs(r.mean_raw - round(float(y[m].mean()), 6)) < 1e-9
        assert abs(r.mean_cuped - round(float(y_adj[m].mean()), 6)) < 1e-6
        assert abs(r.var_raw - round(float(y[m].var(ddof=1)), 4)) < 1e-6
        assert abs(r.var_cuped - round(float(y_adj[m].var(ddof=1)), 4)) < 1e-2
    # The method property holds for the POOLED population (theta is the
    # pooled OLS slope, so pooled var(y_adj) = var(y)(1 - rho^2)); a
    # per-variant inequality would be WRONG — a subgroup whose (x, y)
    # covariance differs from the pooled slope can see a slight
    # inflation (observed +0.02% on this fixture's variant 0).
    assert y_adj.var(ddof=1) <= y.var(ddof=1) * (1 + 1e-9)


def test_power_analysis_matches_numpy(spark):
    """Pure-numpy MDE = (z_{a/2} + z_b) * sqrt(v0/n0 + v1/n1) per event
    type at the user_id%2 split — third implementation beside the
    operator and its conditional-aggregate SQL twin."""
    import numpy as np

    from aram_matchdata_etl_spark.operators.stats import Z_ALPHA_2, Z_BETA
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.event_type: r
        for r in all_queries()["q_power_analysis"](spark, SF_ORACLE).collect()
    }
    ev = _duck("SELECT event_type, user_id, value FROM events")
    for et, grp in ev.groupby("event_type"):
        a = grp[grp["user_id"] % 2 == 0]["value"].to_numpy(dtype=np.float64)
        b = grp[grp["user_id"] % 2 == 1]["value"].to_numpy(dtype=np.float64)
        mde = (Z_ALPHA_2 + Z_BETA) * np.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        r = got[et]
        assert (r.n0, r.n1) == (len(a), len(b))
        assert abs(r.mde_abs - round(float(mde), 6)) < 1e-6
        assert abs(r.mde_rel - round(float(mde / a.mean()), 6)) < 1e-6


def test_srm_check_matches_numpy(spark):
    """Pure-python chi-square goodness-of-fit of the variant split
    against 50/50, and the 3.841 (chi2_1, 5%) flag."""
    from aram_matchdata_etl_spark.registry import all_queries

    rows = sorted(
        all_queries()["q_srm_check"](spark, SF_ORACLE).collect(),
        key=lambda r: r.variant,
    )
    ev = _duck("SELECT DISTINCT user_id FROM events")
    n_by_variant = ev["user_id"].mod(2).value_counts().to_dict()
    n = sum(n_by_variant.values())
    chi2 = sum(
        (n_by_variant[v] - n / 2.0) ** 2 / (n / 2.0) for v in (0, 1)
    )
    for r in rows:
        exp = n_by_variant[r.variant]
        assert r.n_users == exp
        assert abs(r.share - round(exp / n, 6)) < 1e-9
        assert abs(
            r.chi2_term - round((exp - n / 2.0) ** 2 / (n / 2.0), 6)
        ) < 1e-6
        assert r.srm_flag == (chi2 > 3.841459)


def test_stats_moments_match_scipy_formulas(spark):
    """Pure-numpy population g1 / excess g2 (and sample sd/var) per
    event type — Spark's skewness/kurtosis are the POPULATION
    single-pass forms; this pins that semantic independently of the
    oracle's two-pass mean-join reformulation."""
    import numpy as np

    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.event_type: r
        for r in all_queries()["q_stats_moments"](spark, SF_ORACLE).collect()
    }
    ev = _duck("SELECT event_type, value FROM events")
    for et, grp in ev.groupby("event_type"):
        x = grp["value"].to_numpy(dtype=np.float64)
        mu = x.mean()
        sp = x.std(ddof=0)
        g1 = ((x - mu) ** 3).mean() / sp**3
        g2 = ((x - mu) ** 4).mean() / (x.var(ddof=0) ** 2) - 3
        r = got[et]
        assert abs(r.sd - round(float(x.std(ddof=1)), 6)) < 1e-6
        assert abs(r.var - round(float(x.var(ddof=1)), 6)) < 1e-4
        assert abs(r.skew - round(float(g1), 6)) < 1e-6
        assert abs(r.kurt - round(float(g2), 6)) < 1e-6


def test_weighted_quantile_matches_numpy(spark):
    """Pure-numpy weighted percentile-disc: smallest value whose
    cumulative weight reaches q * total (weight = value)."""
    import numpy as np

    from aram_matchdata_etl_spark.operators.stats import WQ_QUANTILES
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        (r.event_type, r.q): r.weighted_quantile
        for r in all_queries()["q_weighted_quantile"](
            spark, SF_ORACLE
        ).collect()
    }
    ev = _duck("SELECT event_type, value FROM events WHERE value > 0")
    for et, grp in ev.groupby("event_type"):
        vals = np.sort(grp["value"].to_numpy(dtype=np.float64))
        cw = np.cumsum(vals)  # weight == value
        for q in WQ_QUANTILES:
            want = vals[np.searchsorted(cw, q * cw[-1])]
            assert abs(got[(et, q)] - round(float(want), 6)) < 1e-9, (et, q)


def test_benford_matches_numpy(spark):
    """Pure-python Benford first-digit histogram + chi2 terms on order
    totals, incl. the dense 1..9 grid (absent digits must surface with
    n=0)."""
    import math

    from collections import Counter

    from aram_matchdata_etl_spark.registry import all_queries

    rows = {
        r.digit: r
        for r in all_queries()["q_benford"](spark, SF_ORACLE).collect()
    }
    vals = _duck(
        "SELECT o_totalprice FROM orders WHERE o_totalprice >= 1"
    )["o_totalprice"]
    counts = Counter(int(str(int(math.floor(v)))[0]) for v in vals)
    total = sum(counts.values())
    assert set(rows) == set(range(1, 10))
    for d in range(1, 10):
        n = counts.get(d, 0)
        bp = math.log10(1 + 1 / d)
        r = rows[d]
        assert r.n == n
        assert abs(r.observed_p - round(n / total, 6)) < 1e-9
        assert abs(r.benford_p - round(bp, 6)) < 1e-9
        assert abs(r.chi2_term - round((n / total - bp) ** 2 / bp, 6)) < 1e-6


def test_source_kl_matches_numpy(spark):
    """Pure-python smoothed unigram KL per source vs the corpus blend
    (add-half over the shared vocabulary)."""
    import math

    from collections import Counter, defaultdict

    from aram_matchdata_etl_spark.operators.text import KL_SMOOTH
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.source: r.kl_divergence
        for r in all_queries()["q_source_kl"](spark, SF_ORACLE).collect()
    }
    docs = _duck("SELECT source, text FROM documents")
    c_all: Counter = Counter()
    c_src: dict = defaultdict(Counter)
    for src, text in zip(docs["source"], docs["text"]):
        words = [w for w in text.split(" ") if w]
        c_all.update(words)
        c_src[src].update(words)
    v = len(c_all)
    n_all = sum(c_all.values())
    for src, cnt in c_src.items():
        n_src = sum(cnt.values())
        kl = 0.0
        for w, ca in c_all.items():
            p = (cnt.get(w, 0) + KL_SMOOTH) / (n_src + KL_SMOOTH * v)
            q = (ca + KL_SMOOTH) / (n_all + KL_SMOOTH * v)
            kl += p * math.log(p / q)
        assert abs(got[src] - round(kl, 6)) < 1e-6, src


def test_trending_decay_matches_numpy(spark):
    """Pure-numpy exponentially decayed event mass anchored on max(ts),
    with microsecond-exact ages."""
    import numpy as np

    from aram_matchdata_etl_spark.operators.events_analytics import (
        DECAY_TAU_HOURS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.event_type: r
        for r in all_queries()["q_trending_decay"](spark, SF_ORACLE).collect()
    }
    ev = _duck("SELECT event_type, epoch_us(ts) AS us, value FROM events")
    now = int(ev["us"].max())
    tau_us = DECAY_TAU_HOURS * 3600.0 * 1_000_000
    for et, grp in ev.groupby("event_type"):
        age = now - grp["us"].to_numpy(dtype=np.float64)
        mass = float(
            (grp["value"].to_numpy(dtype=np.float64) * np.exp(-age / tau_us)).sum()
        )
        r = got[et]
        assert r.n_events == len(grp)
        assert abs(r.decayed_mass - round(mass, 6)) < 1e-5


def test_markov_transitions_match_python(spark):
    """Pure-python first-order transition matrix over per-user
    (ts, event_id)-ordered sequences with row normalization."""
    from collections import Counter, defaultdict

    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        (r.prev_type, r.next_type): (r.c, r.p)
        for r in all_queries()["q_markov_transitions"](
            spark, SF_ORACLE
        ).collect()
    }
    ev = _duck(
        "SELECT user_id, event_type, epoch_us(ts) AS us, event_id"
        " FROM events ORDER BY user_id, us, event_id"
    )
    pairs: Counter = Counter()
    prev_by_user: dict = {}
    for r in ev.itertuples():
        p = prev_by_user.get(r.user_id)
        if p is not None:
            pairs[(p, r.event_type)] += 1
        prev_by_user[r.user_id] = r.event_type
    row_tot: dict = defaultdict(int)
    for (p, _), c in pairs.items():
        row_tot[p] += c
    assert set(got) == set(pairs)
    for k, c in pairs.items():
        gc, gp = got[k]
        assert gc == c
        assert abs(gp - round(c / row_tot[k[0]], 6)) < 1e-9


def test_hhi_concentration_matches_python(spark):
    """Pure-python Herfindahl index per language (squared source shares
    x 10000), effective-source inverse, and top share."""
    from collections import Counter

    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.lang: r
        for r in all_queries()["q_hhi_concentration"](
            spark, SF_ORACLE
        ).collect()
    }
    docs = _duck("SELECT lang, source FROM documents")
    for lang, grp in docs.groupby("lang"):
        counts = Counter(grp["source"])
        n = sum(counts.values())
        shares = [c / n for c in counts.values()]
        ssq = sum(s * s for s in shares)
        r = got[lang]
        assert r.n_sources == len(counts)
        assert abs(r.hhi - round(ssq * 10000, 6)) < 1e-5
        assert abs(r.effective_sources - round(1.0 / ssq, 6)) < 1e-6
        assert abs(r.top_share - round(max(shares), 6)) < 1e-9


def test_quantile_normalize_matches_python(spark):
    """Pure-python within-source percentile -> pooled-distribution value
    mapping (half-up integer rank interpolation, doc_id tie-breaks)."""
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.doc_id: (r.pct, r.norm_score)
        for r in all_queries()["q_quantile_normalize"](
            spark, SF_ORACLE
        ).collect()
    }
    docs = _duck("SELECT doc_id, source, n_chars FROM documents")
    pooled = sorted(zip(docs["n_chars"], docs["doc_id"]))
    n = len(pooled)
    for _, grp in docs.groupby("source"):
        ordered = sorted(zip(grp["n_chars"], grp["doc_id"]))
        ns = len(ordered)
        for i, (_, did) in enumerate(ordered):
            p = i / (ns - 1) if ns > 1 else 0.0
            tgt = int(p * (n - 1) + 0.5)  # floor(x + .5) half-up
            gp, gs = got[int(did)]
            assert abs(gp - round(p, 6)) < 1e-9
            assert gs == pooled[tgt][0], did


def test_quantile_normalize_approx_tracks_exact(spark):
    """The sketch-broadcast twin (r10: the exact twin's documented 100 TB
    design, now code) must stay within the theoretical drift of the
    exact mapping: the reference distribution is quantized to B+1 cut
    points with percentile_approx error on top, so each doc's approx
    norm_score may sit at most a few quantile ranks away from its exact
    one — checked in POOLED-RANK space (value space is meaningless when
    the distribution has heavy ties), with the within-source pct
    required bit-identical."""
    from aram_matchdata_etl_spark.operators.stats import QNORM_SKETCH_B
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    exact = {
        r.doc_id: (r.pct, r.norm_score)
        for r in qs["q_quantile_normalize"](spark, SF_ORACLE).collect()
    }
    approx = {
        r.doc_id: (r.pct, r.norm_score)
        for r in qs["q_quantile_normalize_approx"](spark, SF_ORACLE).collect()
    }
    assert set(exact) == set(approx)
    docs = _duck("SELECT doc_id, n_chars FROM documents")
    pooled = sorted(docs["n_chars"])
    n = len(pooled)
    import bisect

    def rank_frac(v):  # mid-rank of value v in the pooled distribution
        lo = bisect.bisect_left(pooled, v)
        hi = bisect.bisect_right(pooled, v)
        return ((lo + hi) / 2) / n

    # quantization (1/B) + sketch error + tie-block width: the fixture's
    # n_chars ties are wide, so compare mid-ranks with a 2% band
    tol = 2.0 / QNORM_SKETCH_B + 0.02
    worst = 0.0
    for did, (pct_e, score_e) in exact.items():
        pct_a, score_a = approx[did]
        assert pct_a == pct_e, did  # within-source percentile: identical
        worst = max(worst, abs(rank_frac(score_a) - rank_frac(score_e)))
    assert worst <= tol, f"pooled-rank drift {worst} > {tol}"


def test_ratio_metric_delta_matches_numpy(spark):
    """Pure-numpy delta-method ratio metric: per-user (revenue, events)
    rollup, r = mean(x)/mean(y), Var = (vx - 2r cxy + r^2 vy)/my^2/n —
    the subtle covariance algebra worth a third implementation."""
    import numpy as np

    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.variant: r
        for r in all_queries()["q_ratio_metric_delta"](
            spark, SF_ORACLE
        ).collect()
    }
    ev = _duck("SELECT user_id, event_type, value FROM events")
    per_user = {}
    for r in ev.itertuples():
        x, y = per_user.get(r.user_id, (0.0, 0))
        per_user[r.user_id] = (
            x + (r.value if r.event_type == "purchase" else 0.0),
            y + 1,
        )
    for v in (0, 1):
        xs = np.array([x for u, (x, _) in per_user.items() if u % 2 == v])
        ys = np.array(
            [y for u, (_, y) in per_user.items() if u % 2 == v],
            dtype=np.float64,
        )
        n = len(xs)
        mx, my = xs.mean(), ys.mean()
        vx, vy = xs.var(ddof=1), ys.var(ddof=1)
        cxy = np.cov(xs, ys, ddof=1)[0, 1]
        ratio = mx / my
        var = (vx - 2 * ratio * cxy + ratio * ratio * vy) / (my * my) / n
        r = got[v]
        assert r.n == n
        assert abs(r.ratio - round(float(ratio), 6)) < 1e-9
        assert abs(r.ratio_var - round(float(var), 6)) < 1e-6


def test_leadlag_corr_matches_numpy(spark):
    """Pure-numpy lead-lag cross-correlation on the calendar-gap-filled
    daily (clicks, purchases) series: corr(purchases_t, clicks_{t-k})
    over pairs where the lagged value exists."""
    import numpy as np
    import pandas as pd

    from aram_matchdata_etl_spark.operators.stats import LEADLAG_MAX
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.lag_days: r
        for r in all_queries()["q_leadlag_corr"](spark, SF_ORACLE).collect()
    }
    ev = _duck(
        "SELECT date_trunc('day', ts) AS day,"
        " SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS clicks,"
        " SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS purchases"
        " FROM events GROUP BY 1 ORDER BY 1"
    )
    full = pd.date_range(ev["day"].min(), ev["day"].max(), freq="D")
    s = ev.set_index("day").reindex(full, fill_value=0)
    clicks = s["clicks"].to_numpy(dtype=np.float64)
    purchases = s["purchases"].to_numpy(dtype=np.float64)
    for k in range(LEADLAG_MAX + 1):
        y = purchases[k:] if k else purchases
        x = clicks[: len(clicks) - k] if k else clicks
        corr = float(np.corrcoef(y, x)[0, 1])
        r = got[k]
        assert r.n_days == len(x)
        assert abs(r.correlation - round(corr, 6)) < 1e-6, k


def test_group_ols_matches_numpy(spark):
    """Pure-numpy per-group OLS (polyfit) on value-over-days — pins the
    regr_slope/regr_intercept sufficient-statistic forms against the
    normal-equation solution."""
    import numpy as np

    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        r.event_type: r
        for r in all_queries()["q_group_ols"](spark, SF_ORACLE).collect()
    }
    ev = _duck(
        "SELECT event_type, epoch_us(ts) / (86400.0 * 1000000) AS x,"
        " value AS y FROM events"
    )
    for et, grp in ev.groupby("event_type"):
        x = grp["x"].to_numpy(dtype=np.float64)
        y = grp["y"].to_numpy(dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        r = got[et]
        assert r.n == len(x)
        assert abs(r.slope - round(float(slope), 6)) < 1e-5
        assert abs(r.intercept - round(float(intercept), 4)) < 1e-2
        assert abs(r.r - round(float(np.corrcoef(y, x)[0, 1]), 6)) < 1e-6


def test_repetition_signals_matches_python(spark):
    """Bit-for-bit: the Gopher repetition fractions are exact-integer
    divisions, so the pure-Python rederivation must match with zero
    tolerance (and the pass flag must be the thresholds applied to the
    recomputed fractions)."""
    from collections import Counter

    from aram_matchdata_etl_spark.operators.text import (
        REP_DUP2_MAX,
        REP_DUP3_MAX,
        REP_TOP2_MAX,
        REP_TOP3_MAX,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_repetition_signals"](spark, SF_ORACLE).collect()
    docs = _duck("SELECT doc_id, text FROM documents")
    texts = dict(zip(docs["doc_id"], docs["text"]))
    assert len(rows) == len(texts)

    def signals(text, n):
        words = text.split(" ")
        grams = [
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        ]
        cnt = Counter(grams)
        top = max((c * len(g) for g, c in cnt.items()), default=0)
        dup = sum(c * len(g) for g, c in cnt.items() if c >= 2)
        return top / len(text), dup / len(text)

    for r in rows:
        top2, dup2 = signals(texts[r.doc_id], 2)
        top3, dup3 = signals(texts[r.doc_id], 3)
        assert r.top2_char_frac == top2, r.doc_id
        assert r.top3_char_frac == top3, r.doc_id
        assert r.dup2_char_frac == dup2, r.doc_id
        assert r.dup3_char_frac == dup3, r.doc_id
        assert r.passes_repetition == (
            top2 <= REP_TOP2_MAX and top3 <= REP_TOP3_MAX
            and dup2 <= REP_DUP2_MAX and dup3 <= REP_DUP3_MAX
        ), r.doc_id


def test_repetition_signals_twins_bit_equal(spark):
    """The three repetition twins — q_repetition_signals (Arrow numpy
    kernel, shipped since r12), q_repetition_signals_hof (sorted-runs
    per-row HOFs, the r10-flip winner), and q_repetition_signals_agg
    (explode -> gram-count -> rollup, the mega-document plan) — share
    one oracle; their outputs must be bit-identical since every value
    is the same exact-integer division."""
    from aram_matchdata_etl_spark.registry import all_oracles, all_queries

    qs = all_queries()
    a = sorted(map(tuple, qs["q_repetition_signals"](spark, SF_ORACLE).collect()))
    for twin in ("q_repetition_signals_hof", "q_repetition_signals_agg"):
        b = sorted(map(tuple, qs[twin](spark, SF_ORACLE).collect()))
        assert a == b, twin
    oracles = all_oracles()
    assert (
        oracles["q_repetition_signals"]
        == oracles["q_repetition_signals_hof"]
        == oracles["q_repetition_signals_agg"]
    )


def test_gopher_zipf_matches_python(spark):
    """Full independent rederivation of q_repetition_gopher_zipf: the
    corpus generator (hashlib md5), the top-n max(count x chars)
    statistic, and the paper-exact dup-n positional UNION are all
    recomputed in pure Python; every fraction must match bit-for-bit
    (exact-integer divisions), and the planted classes must fail on the
    thresholds they were designed to fail."""
    import hashlib
    import math
    from collections import Counter

    from aram_matchdata_etl_spark.operators.text import (
        GOPHER_DUP_MAX,
        GOPHER_TOP_MAX,
        GOPHER_ZIPF_LEN,
        GOPHER_ZIPF_VOCAB,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_repetition_gopher_zipf"](
        spark, SF_ORACLE
    ).collect()
    n_docs = len(_duck("SELECT doc_id FROM documents"))
    assert len(rows) == n_docs

    def gen_words(doc_id):
        k = {0: 75, 1: 25, 2: 6}.get(doc_id % 10, 0)
        words = []
        for pos in range(GOPHER_ZIPF_LEN):
            if doc_id % 10 == 3 and pos < 60:
                words.append(str(pos % 2))
                continue
            p_eff = pos - (GOPHER_ZIPF_LEN - k) if (
                k > 0 and pos >= GOPHER_ZIPF_LEN - k
            ) else pos
            h = hashlib.md5(f"{doc_id}_{p_eff}".encode()).hexdigest()
            u = int(h[:8], 16) / 4294967296.0
            words.append(str(math.floor(u * u * u * u * GOPHER_ZIPF_VOCAB)))
        return words

    def expected(doc_id):
        words = gen_words(doc_id)
        text = " ".join(words)
        n_chars = len(text)
        off = [0]
        for w in words[:-1]:
            off.append(off[-1] + len(w) + 1)
        out = {}
        for m, _t in GOPHER_TOP_MAX.items():
            grams = [
                " ".join(words[i : i + m])
                for i in range(len(words) - m + 1)
            ]
            cnt = Counter(grams)
            out[f"top{m}_frac"] = (
                max((c * len(g) for g, c in cnt.items()), default=0) / n_chars
            )
        for m, _t in GOPHER_DUP_MAX.items():
            grams = [
                " ".join(words[i : i + m])
                for i in range(len(words) - m + 1)
            ]
            cnt = Counter(grams)
            covered = set()
            for i, g in enumerate(grams):
                if cnt[g] >= 2:
                    covered.update(range(off[i], off[i] + len(g)))
            out[f"dup{m}_frac"] = len(covered) / n_chars
        out["passes_gopher_repetition"] = all(
            out[f"top{m}_frac"] <= t for m, t in GOPHER_TOP_MAX.items()
        ) and all(
            out[f"dup{m}_frac"] <= t for m, t in GOPHER_DUP_MAX.items()
        )
        return out

    for r in rows:
        exp = expected(r.doc_id)
        for col, v in exp.items():
            assert getattr(r, col) == v, (r.doc_id, col, getattr(r, col), v)

    # the planted-class contract: a non-trivial split where each class
    # fails on the thresholds it was designed for
    by_cls = {}
    for r in rows:
        by_cls.setdefault(r.doc_id % 10, []).append(r)
    assert all(not r.passes_gopher_repetition for r in by_cls[0])
    assert all(not r.passes_gopher_repetition for r in by_cls[1])
    assert all(r.dup5_frac > 0.15 for r in by_cls[0] + by_cls[1])
    # light repetition: passes, but with live dup5/dup6 signal and a
    # hard-zero tail (7..10-grams cannot fit the 6-word copy)
    assert all(r.passes_gopher_repetition for r in by_cls[2])
    assert all(0 < r.dup5_frac <= 0.15 for r in by_cls[2])
    assert all(r.dup10_frac == 0 for r in by_cls[2])
    # keyword stuffing fails the TOP family specifically
    assert all(r.top2_frac > 0.20 for r in by_cls[3])
    # pure Zipf background passes with a ~0 dup family
    for cls in range(4, 10):
        assert all(r.passes_gopher_repetition for r in by_cls[cls])


def test_gopher_twins_bit_equal(spark):
    """The r12 twin pair — the shipped Arrow numpy kernel
    (q_repetition_gopher_zipf) and the r11 higher-order-function form
    (q_repetition_gopher_zipf_hof) — must stay bit-identical: same
    integer statistics, same IEEE divisions, one shared oracle string
    (asserted too, so the twins can never silently diverge in claim)."""
    from aram_matchdata_etl_spark.registry import all_oracles, all_queries

    qs = all_queries()
    a = sorted(
        map(tuple, qs["q_repetition_gopher_zipf"](spark, SF_ORACLE).collect())
    )
    b = sorted(
        map(
            tuple,
            qs["q_repetition_gopher_zipf_hof"](spark, SF_ORACLE).collect(),
        )
    )
    assert len(a) == 500 and a == b
    oracles = all_oracles()
    assert (
        oracles["q_repetition_gopher_zipf"]
        == oracles["q_repetition_gopher_zipf_hof"]
    )


def test_boilerplate_zipf_removes_exactly_the_stuffed_template(spark):
    """The Zipf boilerplate twin's fully-predicted contract: the
    keyword-stuffing class shares its first 6 ten-token chunks verbatim
    across documents (cross-doc boilerplate), every other chunk is
    doc-keyed-hash unique — so removal hits exactly those 6 chunks on
    exactly the stuffed docs, and the rebuilt text equals the doc's own
    last 60 words."""
    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_boilerplate_zipf"](spark, SF_ORACLE).collect()
    n_docs = len(_duck("SELECT doc_id FROM documents"))
    assert len(rows) == n_docs
    stuffed = [r for r in rows if r.doc_id % 10 == 3]
    clean = [r for r in rows if r.doc_id % 10 != 3]
    assert stuffed and clean
    assert all(r.n_chunks_total == 12 for r in rows)
    assert all(r.n_chunks_kept == 6 for r in stuffed)
    assert all(r.n_chunks_kept == 12 for r in clean)
    # the surviving text is the doc's own (hash-generated) second half
    import hashlib
    import math

    from aram_matchdata_etl_spark.operators.text import (
        GOPHER_ZIPF_LEN,
        GOPHER_ZIPF_VOCAB,
    )

    def words(doc_id):
        out = []
        for pos in range(GOPHER_ZIPF_LEN):
            if pos < 60:
                out.append(str(pos % 2))
                continue
            h = hashlib.md5(f"{doc_id}_{pos}".encode()).hexdigest()
            u = int(h[:8], 16) / 4294967296.0
            out.append(str(math.floor(u * u * u * u * GOPHER_ZIPF_VOCAB)))
        return out

    for r in stuffed[:5]:
        assert r.clean_text == " ".join(words(r.doc_id)[60:]), r.doc_id


def test_zipf_curation_pipeline_class_interplay(spark):
    """The fused curation verdict's per-class contract — including the
    measured gate INTERPLAY: heavy/moderate repetition and stuffing
    drop on the Gopher flag; light repetition passes Gopher but is the
    least predictable doc in its perplexity language, so the tercile
    gate removes most of it; only natural-class docs keep at the ~2/3
    tercile rate."""
    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_zipf_curation_pipeline"](
        spark, SF_ORACLE
    ).collect()
    n_docs = len(_duck("SELECT doc_id FROM documents"))
    assert len(rows) == n_docs
    by_cls = {}
    for r in rows:
        by_cls.setdefault(r.doc_id % 10, []).append(r)
    # repetition classes 0/1 and stuffing 3: Gopher gate drops all
    for cls in (0, 1, 3):
        assert all(not r.passes_gopher_repetition for r in by_cls[cls])
        assert all(not r.keep_final for r in by_cls[cls])
    # stuffing also loses exactly half its chunks to boilerplate
    assert all(r.boiler_frac_kept == 0.5 for r in by_cls[3])
    # light repetition passes Gopher; the perplexity tercile does the
    # dropping (some survive — the gate is a cut, not a wipe)
    assert all(r.passes_gopher_repetition for r in by_cls[2])
    kept2 = sum(r.keep_final for r in by_cls[2]) / len(by_cls[2])
    assert 0 < kept2 < 0.67
    # natural classes: boilerplate never fires, Gopher passes, keep
    # rate is the tercile's ~2/3
    nat = [r for cls in range(4, 10) for r in by_cls[cls]]
    assert all(r.boiler_frac_kept == 1.0 for r in nat)
    kept_nat = sum(r.keep_final for r in nat) / len(nat)
    assert 0.55 < kept_nat < 0.78
