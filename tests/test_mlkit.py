"""Third-implementation differentials for the classic-ML kit: pure
Python / numpy re-derivations of Naive Bayes scoring, stump information
gain, and Newton-IRLS logistic regression on the same fixture, so a
formula wrong the same way in both SQL dialects still fails."""

from __future__ import annotations

import pytest

import math
from collections import Counter, defaultdict

import numpy as np

from .conftest import SF_ORACLE


def _duck(sql):
    from .oracle_utils import duckdb_df

    return duckdb_df(sql, SF_ORACLE)


def test_naive_bayes_matches_pure_python(spark):
    from aram_matchdata_etl_spark.operators.mlkit import NB_TEST_MOD
    from aram_matchdata_etl_spark.registry import all_queries

    docs = _duck("SELECT doc_id, source, text FROM documents")
    train_tf = defaultdict(Counter)  # class -> word counts
    n_docs = Counter()
    vocab = set()
    tests = []
    for doc_id, source, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        words = [w for w in text.split(" ") if w]
        if int(doc_id) % NB_TEST_MOD == 0:
            tests.append((int(doc_id), source, words))
        else:
            train_tf[source].update(words)
            n_docs[source] += 1
            vocab.update(words)
    n_total = sum(n_docs.values())
    v = len(vocab)
    tot = {c: sum(tf.values()) for c, tf in train_tf.items()}
    want = {}
    for doc_id, actual, words in tests:
        best = None
        for c in sorted(n_docs):
            ll = math.log(n_docs[c] / n_total)
            for w in words:
                if w in vocab:
                    ll += math.log((train_tf[c][w] + 1.0) / (tot[c] + v))
            key = (round(ll, 6), c)
            # argmax on the ROUNDED score, ties -> lexicographically
            # smallest class (mirrors ORDER BY score DESC, source)
            if best is None or key[0] > best[0] or (
                key[0] == best[0] and c < best[1]
            ):
                best = key
        want[doc_id] = (actual, best[1], best[0])
    got = {
        r.doc_id: (r.actual, r.predicted, r.score)
        for r in all_queries()["q_naive_bayes"](spark, SF_ORACLE).collect()
    }
    assert set(got) == set(want)
    for k, (actual, pred, score) in got.items():
        wa, wp, ws = want[k]
        assert (actual, pred) == (wa, wp), k
        assert abs(score - ws) < 2e-6, k


def test_best_split_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.mlkit import PRICE_BINS
    from aram_matchdata_etl_spark.registry import all_queries

    li = _duck(
        "SELECT l_quantity, l_discount, l_extendedprice, l_returnflag"
        " FROM lineitem"
    )
    y = (li["l_returnflag"] == "R").to_numpy().astype(np.int64)

    def entropy(pos, n):
        if n == 0 or pos == 0 or pos == n:
            return 0.0
        p = pos / n
        return -p * math.log(p) - (1 - p) * math.log(1 - p)

    mn, mx = li["l_extendedprice"].min(), li["l_extendedprice"].max()
    feats = {
        "quantity": li["l_quantity"].to_numpy().astype(np.int64),
        "discount": np.round(li["l_discount"].to_numpy() * 100).astype(np.int64),
        "price": np.minimum(
            np.floor(
                (li["l_extendedprice"].to_numpy() - mn) / (mx - mn) * PRICE_BINS
            ).astype(np.int64),
            PRICE_BINS - 1,
        ),
    }
    want = {}
    for name, bins in feats.items():
        nt, pt = len(y), int(y.sum())
        h_parent = entropy(pt, nt)
        best = None
        for b in sorted(set(bins))[:-1]:
            mask = bins <= b
            nl, plft = int(mask.sum()), int(y[mask].sum())
            g = round(
                h_parent
                - nl / nt * entropy(plft, nl)
                - (nt - nl) / nt * entropy(pt - plft, nt - nl),
                9,
            )
            if best is None or g > best[0]:
                best = (g, b, nl, nt - nl)
        want[name] = best
    got = {
        r.feature: (r.gain, r.split_bin, r.n_left, r.n_right)
        for r in all_queries()["q_best_split"](spark, SF_ORACLE).collect()
    }
    assert set(got) == set(want)
    for name, (gain, sb, nl, nr) in got.items():
        wg, wb, wnl, wnr = want[name]
        assert (sb, nl, nr) == (wb, wnl, wnr), name
        assert abs(gain - wg) < 2e-6, name


def test_logreg_matches_numpy_irls(spark):
    """Re-derive the ridge-Newton iterate with numpy.linalg.solve (a
    DIFFERENT solver than the Cramer template both engines share) and
    check the trained betas + the null-model sanity bound."""
    from aram_matchdata_etl_spark.operators.mlkit import (
        LR_RIDGE,
        LR_ROUNDS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    feats = _duck(
        """SELECT CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
            LN(o_totalprice) - 10.0 AS x1,
            DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                / 1000.0 AS x2
        FROM orders"""
    )
    y = feats["y"].to_numpy()
    X = np.column_stack(
        [np.ones(len(y)), feats["x1"].to_numpy(), feats["x2"].to_numpy()]
    )
    beta = np.zeros(3)
    for _ in range(LR_ROUNDS):
        p = 1.0 / (1.0 + np.exp(-X @ beta))
        w = p * (1 - p)
        H = (X * w[:, None]).T @ X + LR_RIDGE * np.eye(3)
        g = X.T @ (y - p)
        beta = beta + np.linalg.solve(H, g)
    p = 1.0 / (1.0 + np.exp(-X @ beta))
    want_loss = float(np.mean(-(y * np.log(p) + (1 - y) * np.log(1 - p))))

    got = {
        r.param: r.value
        for r in all_queries()["q_logreg_newton"](spark, SF_ORACLE).collect()
    }
    for i in range(3):
        assert abs(got[f"beta{i}"] - beta[i]) < 1e-6, (i, got, beta)
    assert abs(got["log_loss"] - want_loss) < 1e-6
    # must beat (or tie) the null model's entropy on the train data
    pbar = y.mean()
    null_loss = -(pbar * math.log(pbar) + (1 - pbar) * math.log(1 - pbar))
    assert got["log_loss"] <= null_loss + 1e-9


def test_mlkit_plans(spark):
    """Plan pins: the NB grid joins broadcast; the stump's 3-feature
    fan-out is ONE corpus scan (no repeated parquet scans of lineitem)."""
    from aram_matchdata_etl_spark.registry import all_queries

    nb = all_queries()["q_naive_bayes"](spark, SF_ORACLE)
    plan = nb._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    stump = all_queries()["q_best_split"](spark, SF_ORACLE)
    splan = stump._jdf.queryExecution().executedPlan().toString()
    # lineitem appears in two scans max: the min/max pass + the rollup
    assert splan.count("lineitem.parquet") <= 2
    assert "CartesianProduct" not in splan or "BroadcastNestedLoopJoin" in splan


def _feats_np():
    feats = _duck(
        """SELECT o_orderkey,
            CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
            LN(o_totalprice) - 10.0 AS x1,
            DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                / 1000.0 AS x2
        FROM orders"""
    )
    y = feats["y"].to_numpy()
    X = np.column_stack(
        [np.ones(len(y)), feats["x1"].to_numpy(), feats["x2"].to_numpy()]
    )
    return feats["o_orderkey"].to_numpy(), y, X


def _irls(y, X, rounds, ridge):
    beta = np.zeros(X.shape[1])
    for _ in range(rounds):
        p = 1.0 / (1.0 + np.exp(-X @ beta))
        w = p * (1 - p)
        H = (X * w[:, None]).T @ X + ridge * np.eye(X.shape[1])
        beta = beta + np.linalg.solve(H, X.T @ (y - p))
    return beta


def _loss(y, X, beta):
    p = 1.0 / (1.0 + np.exp(-X @ beta))
    return float(np.mean(-(y * np.log(p) + (1 - y) * np.log(1 - p))))


def test_logreg_cv_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.mlkit import (
        LR_CV_FOLDS,
        LR_RIDGE,
        LR_ROUNDS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    keys, y, X = _feats_np()
    got = {
        r.fold: (r.beta0, r.beta1, r.beta2, r.val_log_loss)
        for r in all_queries()["q_logreg_cv"](spark, SF_ORACLE).collect()
    }
    assert set(got) == set(range(LR_CV_FOLDS))
    for f in range(LR_CV_FOLDS):
        train = keys % LR_CV_FOLDS != f
        beta = _irls(y[train], X[train], LR_ROUNDS, LR_RIDGE)
        vloss = _loss(y[~train], X[~train], beta)
        gb = got[f]
        for i in range(3):
            assert abs(gb[i] - beta[i]) < 1e-6, (f, i)
        assert abs(gb[3] - vloss) < 1e-6, f


@pytest.mark.slow
def test_feature_ablation_matches_numpy(spark):
    """The zeroed-column trick must equal a TRUE lower-dimensional ridge
    fit: compare the drop_x1/drop_x2 rows against 2-column numpy IRLS
    (intercept + surviving feature), not against the 3x3 machinery."""
    from aram_matchdata_etl_spark.operators.mlkit import LR_RIDGE, LR_ROUNDS
    from aram_matchdata_etl_spark.registry import all_queries

    _, y, X = _feats_np()
    got = {
        r.model: (r.beta0, r.beta1, r.beta2, r.log_loss, r.delta_vs_full)
        for r in all_queries()["q_feature_ablation"](spark, SF_ORACLE).collect()
    }
    full = _irls(y, X, LR_ROUNDS, LR_RIDGE)
    full_loss = _loss(y, X, full)
    for i in range(3):
        assert abs(got["full"][i] - full[i]) < 1e-6
    assert abs(got["full"][3] - full_loss) < 1e-6
    assert got["full"][4] == 0.0

    for model, keep in (("drop_x1", 2), ("drop_x2", 1)):
        X2 = X[:, [0, keep]]
        beta2 = _irls(y, X2, LR_ROUNDS, LR_RIDGE)
        loss2 = _loss(y, X2, beta2)
        b = got[model]
        assert abs(b[0] - beta2[0]) < 1e-6, model  # intercept
        surviving = b[keep]
        dropped = b[3 - keep]
        assert abs(surviving - beta2[1]) < 1e-6, model
        assert dropped == 0.0, model  # the zeroed coordinate never moves
        assert abs(b[3] - loss2) < 1e-6, model
        assert abs(b[4] - (loss2 - full_loss)) < 2e-6, model
        assert b[4] >= -1e-9, model  # ablation can't beat the full fit


@pytest.mark.slow
def test_poisson_glm_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.mlkit import LR_RIDGE, LR_ROUNDS
    from aram_matchdata_etl_spark.registry import all_queries

    feats = _duck(
        """SELECT CAST(COUNT(*) AS DOUBLE) AS y,
            CASE WHEN dayofweek(any_value(d)) IN (0, 6) THEN 1.0 ELSE 0.0 END
                AS x1,
            (date_diff('day', DATE '2024-01-01', any_value(d))) / 30.0 AS x2
        FROM (SELECT user_id, CAST(ts AS DATE) AS d FROM events) t
        GROUP BY user_id, d"""
    )
    y = feats["y"].to_numpy()
    X = np.column_stack(
        [np.ones(len(y)), feats["x1"].to_numpy(), feats["x2"].to_numpy()]
    )
    beta = np.zeros(3)
    for _ in range(LR_ROUNDS):
        mu = np.exp(X @ beta)
        H = (X * mu[:, None]).T @ X + LR_RIDGE * np.eye(3)
        beta = beta + np.linalg.solve(H, X.T @ (y - mu))
    mu = np.exp(X @ beta)
    dev = float(
        2
        * np.mean(
            np.where(y > 0, y * np.log(np.where(y > 0, y, 1) / mu), 0)
            - (y - mu)
        )
    )
    got = {
        r.param: r.value
        for r in all_queries()["q_poisson_glm"](spark, SF_ORACLE).collect()
    }
    for i in range(3):
        assert abs(got[f"beta{i}"] - beta[i]) < 1e-6, i
    assert abs(got["mean_deviance"] - dev) < 1e-6
    assert got["mean_deviance"] > 0


@pytest.mark.slow
def test_ridge_ols_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.mlkit import LR_RIDGE
    from aram_matchdata_etl_spark.registry import all_queries

    feats = _duck(
        """SELECT LN(o.o_totalprice) AS y,
            CAST(c.n_items AS DOUBLE) AS x1,
            date_diff('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE))
                / 1000.0 AS x2
        FROM orders o
        JOIN (SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY 1)
            c ON c.l_orderkey = o.o_orderkey"""
    )
    y = feats["y"].to_numpy()
    X = np.column_stack(
        [np.ones(len(y)), feats["x1"].to_numpy(), feats["x2"].to_numpy()]
    )
    beta = np.linalg.solve(X.T @ X + LR_RIDGE * np.eye(3), X.T @ y)
    yhat = X @ beta
    r2 = 1 - ((y - yhat) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    got = {
        r.param: r.value
        for r in all_queries()["q_ridge_ols"](spark, SF_ORACLE).collect()
    }
    for i in range(3):
        assert abs(got[f"beta{i}"] - beta[i]) < 1e-6, i
    assert abs(got["r2"] - r2) < 1e-6
    # the synthetic fixture draws o_totalprice independently of the
    # lineitem rows, so R^2 is near zero — assert only its validity
    assert 0.0 <= got["r2"] < 1.0


@pytest.mark.slow
def test_chi2_feature_selection_matches_pure_python(spark):
    from aram_matchdata_etl_spark.operators.mlkit import CHI2_TOPK
    from aram_matchdata_etl_spark.registry import all_queries

    docs = _duck("SELECT doc_id, source, text FROM documents")
    presence = defaultdict(set)  # (source, word) -> docs
    class_docs = defaultdict(set)
    word_docs = defaultdict(set)
    all_docs = set()
    for doc_id, source, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        all_docs.add(doc_id)
        class_docs[source].add(doc_id)
        for w in set(x for x in text.split(" ") if x):
            presence[(source, w)].add(doc_id)
            word_docs[w].add(doc_id)
    n = len(all_docs)
    want = {}
    for source in class_docs:
        scored = []
        for (s, w), dset in presence.items():
            if s != source:
                continue
            a = len(dset)
            b = len(word_docs[w]) - a
            c = len(class_docs[source]) - a
            d = n - len(class_docs[source]) - b
            denom = (a + b) * (c + d) * (a + c) * (b + d)
            if denom == 0:
                continue
            chi2 = round(n * (a * d - b * c) ** 2 / denom, 6)
            scored.append((-chi2, w, a))
        for rnk, (negchi, w, a) in enumerate(sorted(scored)[:CHI2_TOPK], 1):
            want[(source, rnk)] = (w, a, -negchi)
    got = {
        (r.source, r.rnk): (r.word, r.n_docs_with, r.chi2)
        for r in all_queries()["q_chi2_feature_selection"](
            spark, SF_ORACLE
        ).collect()
    }
    assert got == want


@pytest.mark.slow
def test_shapley_attribution_matches_numpy_and_is_efficient(spark):
    from aram_matchdata_etl_spark.operators.mlkit import LR_RIDGE, LR_ROUNDS
    from aram_matchdata_etl_spark.registry import all_queries

    _, y, X = _feats_np()
    losses = []
    for mask in ((0, 0), (1, 0), (0, 1), (1, 1)):
        Xm = X.copy()
        if not mask[0]:
            Xm[:, 1] = 0.0
        if not mask[1]:
            Xm[:, 2] = 0.0
        beta = _irls(y, Xm, LR_ROUNDS, LR_RIDGE)
        losses.append(_loss(y, Xm, beta))
    l0, l1, l2, l3 = losses
    phi1 = 0.5 * ((l0 - l1) + (l2 - l3))
    phi2 = 0.5 * ((l0 - l2) + (l1 - l3))
    got = {
        r.feature: r.shapley_value
        for r in all_queries()["q_shapley_attribution"](spark, SF_ORACLE).collect()
    }
    assert abs(got["x1"] - phi1) < 1e-6
    assert abs(got["x2"] - phi2) < 1e-6
    # efficiency: attributions sum to the full model's loss reduction
    assert abs((got["x1"] + got["x2"]) - (l0 - l3)) < 2e-6


@pytest.mark.slow
def test_stump_boost_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.mlkit import (
        BOOST_NU,
        BOOST_ROUNDS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    li = _duck(
        "SELECT CAST(l_quantity AS INTEGER) AS qbin,"
        " CAST(ROUND(l_discount * 100, 0) AS INTEGER) AS dbin,"
        " LN(l_extendedprice) AS y FROM lineitem"
    )
    qbin = li["qbin"].to_numpy()
    dbin = li["dbin"].to_numpy()
    r = li["y"].to_numpy() - li["y"].to_numpy().mean()
    want = []
    for k in range(1, BOOST_ROUNDS + 1):
        cands = []
        for fname, bins in (("quantity", qbin), ("discount", dbin)):
            for t in sorted(set(bins))[:-1]:
                m = bins <= t
                nl, nr = int(m.sum()), int((~m).sum())
                ml, mr = r[m].mean(), r[~m].mean()
                gain = round(nl * ml * ml + nr * mr * mr, 6)
                cands.append((-gain, fname, int(t), ml, mr))
        _, fname, t, ml, mr = sorted(cands)[0]
        bins = qbin if fname == "quantity" else dbin
        r = r - BOOST_NU * np.where(bins <= t, ml, mr)
        want.append((k, fname, t, ml, mr, float((r * r).mean())))
    got = sorted(
        all_queries()["q_stump_boost"](spark, SF_ORACLE).collect(),
        key=lambda x: x.round,
    )
    assert len(got) == BOOST_ROUNDS
    prev_mse = None
    for row, (k, fname, t, ml, mr, mse) in zip(got, want):
        assert (row.round, row.feature, row.split_bin) == (k, fname, t)
        assert abs(row.left_mean - ml) < 1e-6
        assert abs(row.right_mean - mr) < 1e-6
        assert abs(row.train_mse - mse) < 1e-6
        if prev_mse is not None:  # boosting must monotonically improve
            assert row.train_mse < prev_mse
        prev_mse = row.train_mse


def test_log_odds_ratio_matches_pure_python(spark):
    from aram_matchdata_etl_spark.operators.text import (
        LOGODDS_A,
        LOGODDS_B,
        LOGODDS_PRIOR,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    docs = _duck(
        f"SELECT source, text FROM documents"
        f" WHERE source IN ('{LOGODDS_A}', '{LOGODDS_B}')"
    )
    ca, cb = Counter(), Counter()
    for source, text in zip(docs["source"], docs["text"]):
        tgt = ca if source == LOGODDS_A else cb
        tgt.update(w for w in text.split(" ") if w)
    vocab = set(ca) | set(cb)
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    a = LOGODDS_PRIOR
    got = {
        r.word: (r.n_a, r.n_b, r.z_score)
        for r in all_queries()["q_log_odds_ratio"](spark, SF_ORACLE).collect()
    }
    assert set(got) == vocab
    for w in vocab:
        ya, yb = ca[w], cb[w]
        delta = math.log((ya + a) / (na + a * v - ya - a)) - math.log(
            (yb + a) / (nb + a * v - yb - a)
        )
        z = delta / math.sqrt(1 / (ya + a) + 1 / (yb + a))
        gn_a, gn_b, gz = got[w]
        assert (gn_a, gn_b) == (ya, yb)
        assert abs(gz - z) < 1e-6, w


def _causal_np():
    u = _duck(
        """SELECT CAST(user_id % 2 AS DOUBLE) AS t,
            CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS DOUBLE) AS y,
            LN(1 + SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)) AS x1,
            COALESCE(AVG(CASE WHEN event_type = 'view' THEN value END), 0.0)
                AS x2,
            SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                AS outcome
        FROM events GROUP BY user_id"""
    )
    t = u["t"].to_numpy()
    y = u["y"].to_numpy()
    X = np.column_stack(
        [np.ones(len(y)), u["x1"].to_numpy(), u["x2"].to_numpy()]
    )
    return t, y, X, u["outcome"].to_numpy()


@pytest.mark.slow
def test_uplift_tlearner_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.mlkit import LR_RIDGE, LR_ROUNDS
    from aram_matchdata_etl_spark.registry import all_queries

    t, y, X, _ = _causal_np()
    betas = {}
    for v in (0, 1):
        m = t == v
        betas[v] = _irls(y[m], X[m], LR_ROUNDS, LR_RIDGE)
    p1 = 1 / (1 + np.exp(-X @ betas[1]))
    p0 = 1 / (1 + np.exp(-X @ betas[0]))
    ate = float((p1 - p0).mean())
    got = {
        r.param: r.value
        for r in all_queries()["q_uplift_tlearner"](spark, SF_ORACLE).collect()
    }
    for v in (0, 1):
        for i in range(3):
            assert abs(got[f"v{v}_beta{i}"] - betas[v][i]) < 1e-6, (v, i)
        m = t == v
        assert abs(got[f"v{v}_log_loss"] - _loss(y[m], X[m], betas[v])) < 1e-6
    assert abs(got["ate_uplift"] - ate) < 1e-6


def test_propensity_ipw_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.mlkit import (
        IPW_CLIP,
        LR_RIDGE,
        LR_ROUNDS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    t, _, X, outcome = _causal_np()
    beta = _irls(t, X, LR_ROUNDS, LR_RIDGE)
    e = np.clip(1 / (1 + np.exp(-X @ beta)), IPW_CLIP, 1 - IPW_CLIP)
    naive = outcome[t == 1].mean() - outcome[t == 0].mean()
    ipw = (t * outcome / e).sum() / (t / e).sum() - (
        (1 - t) * outcome / (1 - e)
    ).sum() / ((1 - t) / (1 - e)).sum()
    row = all_queries()["q_propensity_ipw"](spark, SF_ORACLE).collect()[0]
    assert abs(row.ate_naive - naive) < 1e-6
    assert abs(row.ate_ipw - ipw) < 1e-6
    assert abs(row.mean_propensity - e.mean()) < 1e-6
    assert row.n_users == len(t)
    # randomized parity assignment: propensity must hover near 0.5 and
    # the two estimators must agree to first order
    assert 0.4 < row.mean_propensity < 0.6
    assert abs(row.ate_ipw - row.ate_naive) < abs(naive) * 0.5 + 1.0


def test_elastic_net_matches_numpy_cd(spark):
    from aram_matchdata_etl_spark.operators.mlkit import (
        EN_L1,
        EN_L2,
        EN_SWEEPS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    u = _duck(
        """SELECT SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                AS y,
            LN(1 + SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)) AS x1,
            COALESCE(AVG(CASE WHEN event_type = 'view' THEN value END), 0.0)
                AS x2,
            LN(1 + SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)) AS x3
        FROM events GROUP BY user_id"""
    )
    X = u[["x1", "x2", "x3"]].to_numpy()
    y = u["y"].to_numpy()
    Z = (X - X.mean(0)) / X.std(0)
    zy = (y - y.mean()) / y.std()
    G = Z.T @ Z
    r = Z.T @ zy
    b = np.zeros(3)
    for _ in range(EN_SWEEPS):
        for j in range(3):
            rho = r[j] - (G[j] @ b - G[j, j] * b[j])
            b[j] = (
                np.sign(rho) * max(abs(rho) - EN_L1, 0) / (G[j, j] + EN_L2)
            )
    sse = zy @ zy - 2 * b @ r + b @ G @ b
    r2 = 1 - sse / (zy @ zy)
    got = {
        x.param: x.value
        for x in all_queries()["q_elastic_net"](spark, SF_ORACLE).collect()
    }
    for j in range(3):
        assert abs(got[f"beta{j + 1}"] - b[j]) < 1e-6, j
    assert abs(got["r2"] - r2) < 1e-6
    assert got["n_nonzero"] == float((b != 0).sum())
    # the L1 penalty must actually induce sparsity on this fixture
    assert got["n_nonzero"] < 3


def test_gmm_em_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.mlkit import GMM_ROUNDS
    from aram_matchdata_etl_spark.registry import all_queries

    ev = _duck("SELECT event_id, value AS x FROM events")
    order = np.lexsort((ev["event_id"].to_numpy(), ev["x"].to_numpy()))
    xs = ev["x"].to_numpy()[order]
    n = len(xs)
    mu1, mu2 = xs[math.ceil(0.25 * n) - 1], xs[math.ceil(0.75 * n) - 1]
    s1 = s2 = float(np.sqrt((xs * xs).mean() - xs.mean() ** 2))
    pi1 = 0.5
    x = ev["x"].to_numpy()
    want = [(0, mu1, s1, mu2, s2, pi1)]
    for k in range(1, GMM_ROUNDS + 1):
        lp1 = -0.5 * ((x - mu1) / s1) ** 2 - math.log(s1) + math.log(pi1)
        lp2 = -0.5 * ((x - mu2) / s2) ** 2 - math.log(s2) + math.log(1 - pi1)
        r1 = 1 / (1 + np.exp(lp2 - lp1))
        n1, n2 = r1.sum(), (1 - r1).sum()
        mu1 = float((r1 * x).sum() / n1)
        s1 = math.sqrt((r1 * x * x).sum() / n1 - mu1 * mu1)
        mu2 = float(((1 - r1) * x).sum() / n2)
        s2 = math.sqrt(((1 - r1) * x * x).sum() / n2 - mu2 * mu2)
        pi1 = float(n1 / len(x))
        want.append((k, mu1, s1, mu2, s2, pi1))
    got = sorted(
        all_queries()["q_gmm_em"](spark, SF_ORACLE).collect(),
        key=lambda r: r.round,
    )
    assert len(got) == GMM_ROUNDS + 1
    for row, (k, m1, sd1, m2, sd2, p1) in zip(got, want):
        assert row.round == k
        assert abs(row.mu1 - m1) < 1e-5, k
        assert abs(row.sigma1 - sd1) < 1e-5, k
        assert abs(row.mu2 - m2) < 1e-5, k
        assert abs(row.sigma2 - sd2) < 1e-5, k
        assert abs(row.pi1 - p1) < 1e-5, k
    # EM must keep the two components ordered and the mix nondegenerate
    assert got[-1].mu1 < got[-1].mu2
    assert 0.05 < got[-1].pi1 < 0.95


def test_als_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.mlkit import (
        ALS_LAMBDA,
        ALS_ROUNDS,
        ALS_TOPK,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    rt = _duck(
        """SELECT o_custkey AS u, l_partkey AS i, LN(1 + COUNT(*)) AS r
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2"""
    )
    us = rt["u"].to_numpy()
    its = rt["i"].to_numpy()
    r = rt["r"].to_numpy()
    v = {i: 1.0 for i in set(its)}
    rmses = []
    u = {}
    for _ in range(ALS_ROUNDS):
        num, den = defaultdict(float), defaultdict(float)
        for uu, ii, rr in zip(us, its, r):
            num[uu] += rr * v[ii]
            den[uu] += v[ii] * v[ii]
        u = {k: num[k] / (den[k] + ALS_LAMBDA) for k in num}
        num, den = defaultdict(float), defaultdict(float)
        for uu, ii, rr in zip(us, its, r):
            num[ii] += rr * u[uu]
            den[ii] += u[uu] * u[uu]
        v = {k: num[k] / (den[k] + ALS_LAMBDA) for k in num}
        errs = [
            (rr - u[uu] * v[ii]) ** 2 for uu, ii, rr in zip(us, its, r)
        ]
        rmses.append(math.sqrt(sum(errs) / len(errs)))
    got = {
        r_.param: r_.value
        for r_ in all_queries()["q_als_factorization"](spark, SF_ORACLE).collect()
    }
    for k in range(1, ALS_ROUNDS + 1):
        assert abs(got[f"round_{k}_rmse"] - rmses[k - 1]) < 1e-5, k
    # ALS is a descent method on train RMSE
    assert rmses == sorted(rmses, reverse=True)
    top = sorted(
        ((round(val, 6), -i) for i, val in v.items()), reverse=True
    )[:ALS_TOPK]
    for rank, (val, negi) in enumerate(top, 1):
        assert abs(got[f"item_{-negi}"] - round(val, 6)) < 2e-6, rank


def test_rocchio_matches_pure_python(spark):
    from aram_matchdata_etl_spark.operators.mlkit import NB_TEST_MOD
    from aram_matchdata_etl_spark.registry import all_queries

    docs = _duck("SELECT doc_id, source, text FROM documents")
    train, tests = [], []
    for doc_id, source, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        words = [w for w in text.split(" ") if w]
        (tests if int(doc_id) % NB_TEST_MOD == 0 else train).append(
            (int(doc_id), source, words)
        )
    df = Counter()
    for _, _, words in train:
        df.update(set(words))
    n_train = len(train)
    idf = {w: math.log(n_train / c) for w, c in df.items()}
    cent = defaultdict(lambda: defaultdict(float))
    n_c = Counter()
    for _, source, words in train:
        tf = Counter(w for w in words if w in idf)
        vec = {w: c * idf[w] for w, c in tf.items()}
        nrm = math.sqrt(sum(x * x for x in vec.values()))
        n_c[source] += 1
        for w, x in vec.items():
            cent[source][w] += x / nrm
    for source in cent:
        for w in cent[source]:
            cent[source][w] /= n_c[source]
    cn = {
        s: math.sqrt(sum(x * x for x in ws.values())) for s, ws in cent.items()
    }
    got = {
        r.doc_id: (r.actual, r.predicted, r.score, r.correct)
        for r in all_queries()["q_rocchio_classifier"](spark, SF_ORACLE).collect()
    }
    for doc_id, actual, words in tests:
        tf = Counter(w for w in words if w in idf)
        if not tf:
            continue
        vec = {w: c * idf[w] for w, c in tf.items()}
        nrm = math.sqrt(sum(x * x for x in vec.values()))
        best = None
        for s in sorted(cent):
            dot = sum(
                (x / nrm) * cent[s].get(w, 0.0) for w, x in vec.items()
            )
            score = round(dot / cn[s], 6)
            if best is None or score > best[0] or (
                score == best[0] and s < best[1]
            ):
                best = (score, s)
        ga, gp, gs, gc = got[doc_id]
        assert ga == actual
        assert gp == best[1], doc_id
        assert abs(gs - best[0]) < 2e-6
        assert gc == int(gp == ga)


def test_huber_regression_matches_numpy_and_resists_outliers(spark):
    from aram_matchdata_etl_spark.operators.mlkit import (
        HUBER_CORRUPT,
        HUBER_DELTA,
        HUBER_INJECT,
        HUBER_ROUNDS,
        LR_RIDGE,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    feats = _duck(
        f"""SELECT LN(o_totalprice)
            + CASE WHEN o_orderkey % {HUBER_CORRUPT} = 0 THEN {HUBER_INJECT}
                ELSE 0.0 END AS y,
            CAST(o_orderkey % 7 AS DOUBLE) / 7.0 AS x1,
            DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                / 1000.0 AS x2
        FROM orders"""
    )
    y = feats["y"].to_numpy()
    X = np.column_stack(
        [np.ones(len(y)), feats["x1"].to_numpy(), feats["x2"].to_numpy()]
    )

    def wols(w):
        H = (X * w[:, None]).T @ X + LR_RIDGE * np.eye(3)
        return np.linalg.solve(H, (X * w[:, None]).T @ y)

    ols = wols(np.ones(len(y)))
    beta = ols
    for _ in range(HUBER_ROUNDS):
        r = y - X @ beta
        w = np.minimum(1.0, HUBER_DELTA / np.maximum(np.abs(r), 1e-12))
        beta = wols(w)
    got = {
        r_.param: r_.value
        for r_ in all_queries()["q_huber_regression"](spark, SF_ORACLE).collect()
    }
    for i in range(3):
        assert abs(got[f"ols_beta{i}"] - ols[i]) < 1e-6, i
        assert abs(got[f"huber_beta{i}"] - beta[i]) < 1e-6, i
    assert got["n_downweighted"] == float((w < 1.0).sum())
    # robustness: the injected outliers drag the OLS intercept up by
    # ~HUBER_INJECT/HUBER_CORRUPT while Huber's linear tail caps each
    # outlier's pull at delta — the drift ratio must show it
    mask = _duck(
        f"SELECT o_orderkey % {HUBER_CORRUPT} = 0 AS bad FROM orders"
    )["bad"].to_numpy()
    clean_beta = wols(np.where(mask, 0.0, 1.0))
    ols_drift = abs(ols[0] - clean_beta[0])
    huber_drift = abs(beta[0] - clean_beta[0])
    assert huber_drift < ols_drift / 3


def test_ransac_matches_pure_python(spark):
    import hashlib

    from aram_matchdata_etl_spark.operators.mlkit import (
        RANSAC_CORRUPT,
        RANSAC_EPS_FRAC,
        RANSAC_TRIALS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    daily = _duck(
        f"""SELECT CAST(DATE_DIFF('day', DATE '2024-01-01',
                CAST(ts AS DATE)) AS DOUBLE) AS x,
            SUM(value) * CASE WHEN dayofmonth(CAST(ts AS DATE))
                % {RANSAC_CORRUPT} = 3 THEN 3.0 ELSE 1.0 END AS y
        FROM events GROUP BY CAST(ts AS DATE) ORDER BY 1"""
    )
    xs = daily["x"].to_numpy()
    ys = daily["y"].to_numpy()
    n = len(xs)
    eps = RANSAC_EPS_FRAC * np.abs(ys).mean()

    def h(t, tag):
        return int(hashlib.md5(f"{t}#{tag}".encode()).hexdigest()[:8], 16)

    best = None
    for t in range(RANSAC_TRIALS):
        j1 = h(t, 1) % n
        j2 = (j1 + 1 + h(t, 2) % (n - 1)) % n
        slope = (ys[j2] - ys[j1]) / (xs[j2] - xs[j1])
        b0 = ys[j1] - slope * xs[j1]
        inl = int((np.abs(ys - (b0 + slope * xs)) <= eps).sum())
        key = (-inl, t)
        if best is None or key < best[0]:
            best = (key, slope, b0, inl)
    _, slope, b0, inl = best
    m = np.abs(ys - (b0 + slope * xs)) <= eps
    xi, yi = xs[m], ys[m]
    nn = len(xi)
    rslope = ((xi * yi).sum() - xi.sum() * yi.sum() / nn) / (
        (xi * xi).sum() - xi.sum() ** 2 / nn
    )
    rint = yi.mean() - rslope * xi.mean()
    row = all_queries()["q_ransac_line"](spark, SF_ORACLE).collect()[0]
    assert row.n_inliers == inl
    assert abs(row.slope - slope) < 1e-6
    assert abs(row.intercept - b0) < 1e-6
    assert row.n_used == nn
    assert abs(row.refit_slope - rslope) < 1e-6
    assert abs(row.refit_intercept - rint) < 1e-6
    # the tripled days must be excluded from the consensus set
    spiked = _duck(
        f"""SELECT COUNT(*) AS c FROM (
            SELECT CAST(ts AS DATE) AS d FROM events GROUP BY 1
        ) WHERE dayofmonth(d) % {RANSAC_CORRUPT} = 3"""
    )["c"][0]
    assert row.n_used <= n - spiked


def test_ols_diagnostics_match_numpy_hat_matrix(spark):
    """Re-derive leverage via the FULL hat matrix H = X (X'X+lI)^-1 X'
    in numpy — the O(n^2) object the operator's quadratic form
    deliberately avoids — and Cook's distance from it."""
    from aram_matchdata_etl_spark.operators.mlkit import (
        COOK_TOPK,
        LR_RIDGE,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    feats = _duck(
        """SELECT o.o_orderkey, LN(o.o_totalprice) AS y,
            CAST(c.n_items AS DOUBLE) AS x1,
            date_diff('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE))
                / 1000.0 AS x2
        FROM orders o
        JOIN (SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY 1)
            c ON c.l_orderkey = o.o_orderkey"""
    )
    y = feats["y"].to_numpy()
    X = np.column_stack(
        [np.ones(len(y)), feats["x1"].to_numpy(), feats["x2"].to_numpy()]
    )
    A = np.linalg.inv(X.T @ X + LR_RIDGE * np.eye(3))
    beta = A @ X.T @ y
    resid = y - X @ beta
    lev = np.einsum("ij,jk,ik->i", X, A, X)
    s2 = (resid ** 2).sum() / (len(y) - 3)
    cook = resid ** 2 * lev / (3 * s2 * (1 - lev) ** 2)
    keys = feats["o_orderkey"].to_numpy()
    order = sorted(
        range(len(y)), key=lambda i: (-round(cook[i], 9), keys[i])
    )[:COOK_TOPK]
    got = sorted(
        all_queries()["q_ols_diagnostics"](spark, SF_ORACLE).collect(),
        key=lambda r: r.rnk,
    )
    assert len(got) == COOK_TOPK
    for row, i in zip(got, order):
        assert row.o_orderkey == keys[i], row.rnk
        assert abs(row.resid - resid[i]) < 1e-6
        assert abs(row.leverage - lev[i]) < 1e-6
        assert abs(row.cooks_d - cook[i]) < 1e-6


def test_partial_dependence_matches_numpy(spark):
    from aram_matchdata_etl_spark.operators.mlkit import (
        LR_RIDGE,
        LR_ROUNDS,
        PDP_POINTS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    _, y, X = _feats_np()
    beta = _irls(y, X, LR_ROUNDS, LR_RIDGE)
    got = {
        (r.feature, r.grid_idx): (r.grid_value, r.pdp)
        for r in all_queries()["q_partial_dependence"](spark, SF_ORACLE).collect()
    }
    assert len(got) == 2 * PDP_POINTS
    for fi, fname in ((1, "x1"), (2, "x2")):
        col = X[:, fi]
        for k in range(PDP_POINTS):
            g = col.min() + k * (col.max() - col.min()) / (PDP_POINTS - 1)
            Xg = X.copy()
            Xg[:, fi] = g
            pdp = float((1 / (1 + np.exp(-Xg @ beta))).mean())
            gv, gp = got[(fname, k)]
            assert abs(gv - g) < 1e-6, (fname, k)
            assert abs(gp - pdp) < 1e-6, (fname, k)
    # monotone model => monotone PDP in each feature's direction
    curve = [got[("x2", k)][1] for k in range(PDP_POINTS)]
    assert curve == sorted(curve) or curve == sorted(curve, reverse=True)
