"""Third-implementation differentials for the round-7 mining batch:
A-Priori triples (incl. an explicit monotonicity check of the prune the
Spark plan relies on), precedence pairs, positional phrase search, and
split-conformal intervals."""

from __future__ import annotations

import pytest

import itertools
import math
from collections import Counter, defaultdict

import numpy as np

from .conftest import SF_ORACLE


def _duck(sql):
    from .oracle_utils import duckdb_df

    return duckdb_df(sql, SF_ORACLE)


@pytest.mark.slow
def test_itemset_triples_match_and_prune_is_lossless(spark):
    from aram_matchdata_etl_spark.operators.market import TRIPLE_SUP
    from aram_matchdata_etl_spark.registry import all_queries

    df = _duck(
        """SELECT DISTINCT o_custkey AS bid, l_partkey AS item
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""
    )
    baskets = defaultdict(set)
    for bid, item in zip(df["bid"], df["item"]):
        baskets[int(bid)].add(int(item))
    triples = Counter()
    pairs = Counter()
    for items in baskets.values():
        s = sorted(items)
        for p in itertools.combinations(s, 2):
            pairs[p] += 1
        for t in itertools.combinations(s, 3):
            triples[t] += 1
    want = {t: c for t, c in triples.items() if c >= TRIPLE_SUP}
    got = {
        (r.item_a, r.item_b, r.item_c): r.triple_count
        for r in all_queries()["q_itemset_triples"](spark, SF_ORACLE).collect()
    }
    assert got == want
    # the prune the Spark plan uses: every frequent triple's (a, b)
    # sub-pair must itself be frequent at the SAME threshold
    for (a, b, c), _ in want.items():
        assert pairs[(a, b)] >= TRIPLE_SUP


def test_precedence_pairs_match_pandas(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    ev = _duck("SELECT user_id, event_type, ts FROM events")
    firsts = (
        ev.groupby(["user_id", "event_type"])["ts"].min().reset_index()
    )
    per_user = defaultdict(dict)
    for u, t, ts in zip(firsts["user_id"], firsts["event_type"], firsts["ts"]):
        per_user[int(u)][t] = ts
    n_before = Counter()
    n_both = Counter()
    gaps = defaultdict(list)
    for u, tmap in per_user.items():
        for ta, tb in itertools.permutations(tmap, 2):
            n_both[(ta, tb)] += 1
            if tmap[ta] < tmap[tb]:
                n_before[(ta, tb)] += 1
                gaps[(ta, tb)].append((tmap[tb] - tmap[ta]).total_seconds())
    got = {
        (r.type_a, r.type_b): (r.n_before, r.n_both, r.precede_share, r.avg_gap_s)
        for r in all_queries()["q_precedence_pairs"](spark, SF_ORACLE).collect()
    }
    assert set(got) == set(n_before)
    for k, (nb, nboth, share, gap) in got.items():
        assert nb == n_before[k]
        assert nboth == n_both[k]
        assert abs(share - nb / nboth) < 1e-6
        assert abs(gap - sum(gaps[k]) / len(gaps[k])) < 1e-4


def test_phrase_search_matches_pure_python(spark):
    from aram_matchdata_etl_spark.operators.text import PHRASES
    from aram_matchdata_etl_spark.registry import all_queries

    docs = _duck("SELECT doc_id, text FROM documents")
    want = Counter()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        words = text.split(" ")
        for w1, w2 in PHRASES:
            hits = sum(
                1
                for i in range(len(words) - 1)
                if words[i] == w1 and words[i + 1] == w2
            )
            if hits:
                want[(f"{w1} {w2}", int(doc_id))] = hits
    got = {
        (r.phrase, r.doc_id): r.n_matches
        for r in all_queries()["q_phrase_search"](spark, SF_ORACLE).collect()
    }
    assert got == dict(want)
    assert len(got) > 0


def test_conformal_interval_matches_numpy_and_covers(spark):
    from aram_matchdata_etl_spark.operators.stats import CONF_ALPHA
    from aram_matchdata_etl_spark.registry import all_queries

    ev = _duck("SELECT event_id, event_type, value FROM events")
    got = {
        r.event_type: (r.n_cal, r.q_alpha, r.n_test, r.coverage)
        for r in all_queries()["q_conformal_interval"](spark, SF_ORACLE).collect()
    }
    for etype, grp in ev.groupby("event_type"):
        folds = grp["event_id"].to_numpy() % 4
        y = grp["value"].to_numpy()
        yhat = y[folds < 2].mean()
        r_cal = np.abs(y[folds == 2] - yhat)
        n_cal = len(r_cal)
        k = min(math.ceil((1 - CONF_ALPHA) * (n_cal + 1)), n_cal)
        q = np.sort(r_cal)[k - 1]
        r_test = np.abs(y[folds == 3] - yhat)
        cov = float((r_test <= q).mean())
        gn, gq, gnt, gcov = got[etype]
        assert gn == n_cal
        assert abs(gq - q) < 1e-6
        assert gnt == len(r_test)
        assert abs(gcov - cov) < 1e-6
        # finite-sample conformal guarantee (exchangeable folds):
        # empirical test coverage should sit near 1 - alpha
        assert gcov >= 1 - CONF_ALPHA - 0.05, etype


def test_tukey_hsd_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.stats import TUKEY_Q_CRIT
    from aram_matchdata_etl_spark.registry import all_queries

    ev = _duck("SELECT event_type, value FROM events")
    groups = {t: g["value"].to_numpy() for t, g in ev.groupby("event_type")}
    n_total = sum(len(v) for v in groups.values())
    k = len(groups)
    sse = sum(((v - v.mean()) ** 2).sum() for v in groups.values())
    mse = sse / (n_total - k)
    got = {
        (r.group_a, r.group_b): (r.n_a, r.n_b, r.mean_diff, r.q_stat, r.significant)
        for r in all_queries()["q_tukey_hsd"](spark, SF_ORACLE).collect()
    }
    names = sorted(groups)
    assert set(got) == {
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
    }
    for (a, b), (na, nb, diff, q, sig) in got.items():
        va, vb = groups[a], groups[b]
        assert (na, nb) == (len(va), len(vb))
        wdiff = va.mean() - vb.mean()
        wq = abs(wdiff) / math.sqrt(mse / 2 * (1 / len(va) + 1 / len(vb)))
        assert abs(diff - wdiff) < 1e-6
        assert abs(q - wq) < 1e-5
        assert sig == int(wq > TUKEY_Q_CRIT)


def test_runs_test_matches_pure_python(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    daily = _duck(
        "SELECT CAST(ts AS DATE) AS day, SUM(value) AS y"
        " FROM events GROUP BY 1 ORDER BY day"
    )
    ys = daily["y"].to_numpy()
    med = sorted(ys)[math.ceil(len(ys) / 2) - 1]
    signs = [1 if y > med else 0 for y in ys if y != med]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    z = (runs - mu) / math.sqrt(var)
    row = all_queries()["q_runs_test"](spark, SF_ORACLE).collect()[0]
    assert (row.n_above, row.n_below, row.n_runs) == (n1, n2, runs)
    assert abs(row.z - z) < 1e-6


def test_woe_iv_matches_pure_python(spark):
    from aram_matchdata_etl_spark.operators.stats import WOE_BINS, WOE_SMOOTH
    from aram_matchdata_etl_spark.registry import all_queries

    li = _duck("SELECT l_extendedprice AS p, l_returnflag = 'R' AS bad"
               " FROM lineitem")
    p = li["p"].to_numpy()
    bad = li["bad"].to_numpy().astype(int)
    mn, mx = p.min(), p.max()
    bins = np.minimum(
        np.floor((p - mn) / (mx - mn) * WOE_BINS).astype(int), WOE_BINS - 1
    )
    got = {
        r.bin: (r.n, r.n_bad, r.woe, r.iv_total)
        for r in all_queries()["q_woe_iv"](spark, SF_ORACLE).collect()
    }
    good_tot = (1 - bad).sum()
    bad_tot = bad.sum()
    iv = 0.0
    woes = {}
    for b in sorted(set(bins)):
        m = bins == b
        ng, nb = int((1 - bad)[m].sum()), int(bad[m].sum())
        pg = (ng + WOE_SMOOTH) / good_tot
        pb = (nb + WOE_SMOOTH) / bad_tot
        woes[b] = (int(m.sum()), nb, math.log(pg / pb))
        iv += (pg - pb) * math.log(pg / pb)
    assert set(got) == set(woes)
    for b, (n, nb, woe, iv_total) in got.items():
        wn, wnb, wwoe = woes[b]
        assert (n, nb) == (wn, wnb)
        assert abs(woe - wwoe) < 1e-6
        assert abs(iv_total - iv) < 1e-6


def _pav(y, w):
    """Pool-adjacent-violators for weighted isotonic regression."""
    blocks = [[yi * wi, wi, [i]] for i, (yi, wi) in enumerate(zip(y, w))]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][0] / out[-2][1] > out[-1][0] / out[-1][1]:
            s2, w2, i2 = out.pop()
            out[-1][0] += s2
            out[-1][1] += w2
            out[-1][2].extend(i2)
    fit = [0.0] * len(y)
    for s, ww, idx in out:
        for i in idx:
            fit[i] = s / ww
    return fit


def test_isotonic_calibration_equals_pav(spark):
    """The minimax formula both engines compute must equal the classic
    sequential PAV algorithm (the textbook equivalence theorem) and be
    monotone non-decreasing."""
    from aram_matchdata_etl_spark.registry import all_queries

    rows = sorted(
        all_queries()["q_isotonic_calibration"](spark, SF_ORACLE).collect(),
        key=lambda r: r.bin,
    )
    y = [r.frac_pos for r in rows]
    w = [r.n for r in rows]
    want = _pav(y, w)
    for r, pv in zip(rows, want):
        assert abs(r.iso_prob - pv) < 2e-6, r.bin
    iso = [r.iso_prob for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))


def test_eigen_centrality_matches_numpy_power_iteration(spark):
    from aram_matchdata_etl_spark.operators.graph import EIG_ROUNDS
    from aram_matchdata_etl_spark.registry import all_queries

    edges = _duck(
        """WITH cnt AS (SELECT COUNT(*) AS n FROM documents),
        cand AS (
            SELECT d.doc_id AS src,
                ('0x' || substr(md5(CAST(d.doc_id * 3 + s.i AS VARCHAR)), 1, 8))::BIGINT
                    % cnt.n AS dst
            FROM documents d CROSS JOIN cnt CROSS JOIN range(3) s(i)
        ),
        edges AS (
            SELECT DISTINCT src, dst FROM cand
            WHERE src <> dst AND dst IN (SELECT doc_id FROM documents)
        )
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM edges"""
    )
    docs = _duck("SELECT doc_id FROM documents")
    ids = sorted(docs["doc_id"].astype(int))
    idx = {d: i for i, d in enumerate(ids)}
    n = len(ids)
    import numpy as _np

    A = _np.zeros((n, n))
    for a, b in zip(edges["a"], edges["b"]):
        A[idx[int(a)], idx[int(b)]] = 1.0
        A[idx[int(b)], idx[int(a)]] = 1.0
    v = _np.ones(n)
    for _ in range(EIG_ROUNDS):
        w = A @ v
        v = w / _np.sqrt((w * w).sum())
    got = {
        r.doc_id: r.centrality
        for r in all_queries()["q_eigen_centrality"](spark, SF_ORACLE).collect()
    }
    assert len(got) == n
    for d, i in idx.items():
        assert abs(got[d] - v[i]) < 1e-8, d


@pytest.mark.slow
def test_pca_power_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.similarity import (
        PCA_DIM,
        PCA_ROUNDS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    emb = _duck("SELECT embedding FROM embeddings")
    X = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    mu = X.mean(0)
    Xc = X - mu
    C = Xc.T @ Xc / len(X)
    v = np.full(PCA_DIM, 1.0 / math.sqrt(PCA_DIM))
    lam = None
    for _ in range(PCA_ROUNDS):
        w = C @ v
        lam = math.sqrt((w * w).sum())
        v = w / lam
    rows = sorted(
        all_queries()["q_pca_power"](spark, SF_ORACLE).collect(),
        key=lambda r: r.dim,
    )
    assert len(rows) == PCA_DIM
    for r in rows:
        assert abs(r.loading - v[r.dim]) < 1e-5, r.dim
        assert abs(r.eigenvalue - lam) < 1e-4
    # fixture note: the synthetic embeddings are nearly isotropic
    # (lambda1/lambda2 ~ 1.013), so PCA_ROUNDS rounds cannot isolate THE
    # top eigenvector — the checks above prove the recursion itself.
    # Against numpy's dense eigendecomposition we can still assert the
    # Rayleigh estimate is bracketed by the spectrum and already beats
    # the average eigenvalue (the iterate amplifies top components).
    evals = np.linalg.eigvalsh(C)
    lam_est = rows[0].eigenvalue
    assert evals.mean() < lam_est <= evals[-1] * 1.001


def test_abc_analysis_matches_pandas(spark):
    from aram_matchdata_etl_spark.operators.market import ABC_A, ABC_B
    from aram_matchdata_etl_spark.registry import all_queries

    rev = _duck(
        "SELECT l_partkey AS item, SUM(l_extendedprice) AS revenue"
        " FROM lineitem GROUP BY 1"
    )
    rev = rev.sort_values(["revenue", "item"], ascending=[False, True])
    tot = rev["revenue"].sum()
    cum = rev["revenue"].cumsum() / tot
    cls = np.where(cum <= ABC_A, "A", np.where(cum <= ABC_B, "B", "C"))
    got = {
        r.abc_class: (r.n_items, r.class_revenue, r.revenue_share)
        for r in all_queries()["q_abc_analysis"](spark, SF_ORACLE).collect()
    }
    for c in ("A", "B", "C"):
        m = cls == c
        assert got[c][0] == int(m.sum()), c
        assert abs(got[c][1] - round(rev["revenue"][m].sum(), 4)) < 1e-3, c
        assert abs(got[c][2] - rev["revenue"][m].sum() / tot) < 1e-6, c
    # Pareto shape: A must be a minority of items carrying the bulk
    assert got["A"][0] < got["C"][0] + got["B"][0] + got["A"][0]
    assert got["A"][2] > 0.7


def test_wasserstein_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.stats import WASS_A, WASS_B
    from aram_matchdata_etl_spark.registry import all_queries

    ev = _duck(
        f"SELECT event_type, value FROM events"
        f" WHERE event_type IN ('{WASS_A}', '{WASS_B}')"
    )
    a = np.sort(ev[ev["event_type"] == WASS_A]["value"].to_numpy())
    b = np.sort(ev[ev["event_type"] == WASS_B]["value"].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    w1 = float((np.abs(fa - fb)[:-1] * np.diff(grid)).sum())
    ks = float(np.abs(fa - fb).max())
    row = all_queries()["q_wasserstein_1d"](spark, SF_ORACLE).collect()[0]
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert abs(row.w1_distance - w1) < 1e-6
    assert abs(row.ks_stat - ks) < 1e-6


def test_linkage_em_matches_pure_python(spark):
    from aram_matchdata_etl_spark.operators.linkage import (
        FS_CLAMP,
        FS_INIT,
        FS_ROUNDS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    pat = _duck(
        """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        blocked AS (
            SELECT name, string_split(name, ' ')[-1] AS block FROM names
        )
        SELECT CAST(levenshtein(a.name, b.name) <= 2 AS INTEGER) AS a1,
            CAST(levenshtein(a.name, b.name) <= 4 AS INTEGER) AS a2,
            CAST(LEN(string_split(a.name, ' ')[1])
                = LEN(string_split(b.name, ' ')[1]) AS INTEGER) AS a3,
            CAST(COUNT(*) AS BIGINT) AS c
        FROM blocked a JOIN blocked b USING (block)
        WHERE a.name < b.name GROUP BY 1, 2, 3"""
    )
    pats = [
        ((int(r.a1), int(r.a2), int(r.a3)), int(r.c))
        for r in pat.itertuples()
    ]
    lo, hi = FS_CLAMP
    p, m0, u0 = FS_INIT
    m = [m0] * 3
    u = [u0] * 3

    def lik(key, theta):
        out = 1.0
        for ai, t in zip(key, theta):
            out *= t if ai else 1 - t
        return out

    def clamp(x):
        return max(min(x, hi), lo)

    def post():
        return {
            key: (c, p * lik(key, m) / (p * lik(key, m) + (1 - p) * lik(key, u)))
            for key, c in pats
        }

    for _ in range(FS_ROUNDS):
        gs = post()
        tot = sum(c for c, _ in gs.values())
        sg = sum(c * g for c, g in gs.values())
        p = clamp(sg / tot)
        den_u = sum(c * (1 - g) for c, g in gs.values())
        m = [
            clamp(sum(c * g * k[i] for k, (c, g) in gs.items()) / sg)
            for i in range(3)
        ]
        u = [
            clamp(sum(c * (1 - g) * k[i] for k, (c, g) in gs.items()) / den_u)
            for i in range(3)
        ]
    gs = post()
    got = {
        r.param: r.value
        for r in all_queries()["q_linkage_em"](spark, SF_ORACLE).collect()
    }
    assert abs(got["p_match"] - p) < 1e-6
    for i in range(3):
        assert abs(got[f"m{i + 1}"] - m[i]) < 1e-6, i
        assert abs(got[f"u{i + 1}"] - u[i]) < 1e-6, i
    for key, (c, g) in gs.items():
        tag = "".join(map(str, key))
        assert got[f"n_{tag}"] == float(c)
        assert abs(got[f"g_{tag}"] - g) < 1e-6, key
    # the model must separate: full-agreement pairs score as matches
    # far above full-disagreement pairs
    assert got["g_111"] > got["g_000"] + 0.5


def test_competing_risks_sums_to_one_and_matches_lifelines_formula(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    rows = sorted(
        all_queries()["q_competing_risks"](spark, SF_ORACLE).collect(),
        key=lambda r: r.duration,
    )
    # re-derive with a sequential pure-Python Aalen-Johansen
    s = 1.0
    cif1 = cif2 = 0.0
    for r in rows:
        cif1 += s * r.d1 / r.n_risk
        cif2 += s * r.d2 / r.n_risk
        assert abs(r.cif_purchase - cif1) < 2e-6, r.duration
        assert abs(r.cif_error - cif2) < 2e-6, r.duration
        s *= 1 - (r.d1 + r.d2) / r.n_risk
        # CIFs + residual survival partition the probability space
        # (outputs are rounded to 6 dp, hence the tolerance)
        assert abs(r.cif_purchase + r.cif_error + s - 1.0) < 3e-6
    # monotone non-decreasing CIFs ending near their sub-proportions
    n_total = rows[0].n_risk
    d1_tot = sum(r.d1 for r in rows)
    assert abs(rows[-1].cif_purchase - d1_tot / n_total) < 1e-6


def test_threshold_sweep_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.stats import AUC_POS, SWEEP_BINS
    from aram_matchdata_etl_spark.registry import all_queries

    ev = _duck("SELECT event_type, value FROM events")
    v = ev["value"].to_numpy()
    yy = (ev["event_type"] == AUC_POS).to_numpy().astype(int)
    mn, mx = v.min(), v.max()
    bins = np.minimum(
        np.floor((v - mn) / (mx - mn) * SWEEP_BINS).astype(int), SWEEP_BINS - 1
    )
    got = {
        r.threshold_bin: (r.tp, r.fp, r.precision_at, r.recall_at, r.f1)
        for r in all_queries()["q_threshold_sweep"](spark, SF_ORACLE).collect()
    }
    pos_tot = int(yy.sum())
    for t in sorted(set(bins)):
        m = bins >= t
        tp = int(yy[m].sum())
        fp = int(m.sum()) - tp
        gtp, gfp, gprec, grec, gf1 = got[t]
        assert (gtp, gfp) == (tp, fp), t
        assert abs(gprec - tp / m.sum()) < 1e-6
        assert abs(grec - tp / pos_tot) < 1e-6
        assert abs(gf1 - 2 * tp / (m.sum() + pos_tot)) < 1e-6
    # recall is monotone non-increasing in the threshold
    recalls = [got[t][3] for t in sorted(got)]
    assert recalls == sorted(recalls, reverse=True)


def test_time_weighted_avg_matches_pandas(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    ev = _duck(
        "SELECT user_id, event_id, ts, value FROM events"
        " ORDER BY user_id, ts, event_id"
    )
    got = {
        r.user_id: (r.n_intervals, r.twap, r.plain_avg)
        for r in all_queries()["q_time_weighted_avg"](spark, SF_ORACLE).collect()
    }
    for uid, grp in ev.groupby("user_id"):
        ts = grp["ts"].to_numpy()
        vals = grp["value"].to_numpy()
        holds = (ts[1:] - ts[:-1]).astype("timedelta64[us]").astype(
            np.int64
        ) / 1e6
        twap = float((vals[:-1] * holds).sum() / holds.sum())
        n, gt, gp = got[int(uid)]
        assert n == len(holds)
        assert abs(gt - twap) < 1e-6, uid
        assert abs(gp - vals[:-1].mean()) < 1e-6, uid
