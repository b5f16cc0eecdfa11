"""Classic-ML kit under the exact driver hash gate — the trainer zoo:
beside q_kmeans_lloyd's argmin assignment (similarity.py), this module
trains by Newton/IRLS solve (logistic + Poisson GLM + closed-form ridge
OLS sharing ONE Cramer template), gradient BOOSTING over decision
stumps (a data-dependent argmax per round), proximal COORDINATE DESCENT
(elastic net, entirely on sufficient statistics), EM (Gaussian
mixture), and ALS matrix factorization (distributed-vector state) —
each hash-oracled via unrolled per-round CTE chains, each with a
numpy/pure-Python third implementation. Around the trainers: Naive
Bayes and Rocchio text classification (the fastText/CCNet-style
quality-classifier shapes LLM pipelines use for corpus filtering),
entropy decision-stump split search, k-fold CV, zeroed-column feature
ablation, exact 2-feature Shapley attribution, chi-squared feature
selection, and the causal pair (T-learner uplift, propensity IPW).

All three reduce the corpus to bounded sufficient statistics before any
model math — the property that survives a 100 TB scale-up:
- Naive Bayes trains on the (class x vocab) count grid: ONE token
  groupBy, then the grid (|V| * C rows — broadcast-sized for bounded
  vocabularies, hash-joinable beyond) scores test tokens with no
  per-class corpus passes.
- The stump evaluates EVERY candidate split from one conditional
  rollup pass: per (feature, bin) counts, then a cumulative window over
  the ~90-row rollup — candidate thresholds never touch the corpus.
- Newton-IRLS folds the current betas into the row expression as
  LITERALS (no join) and reduces each round to 9 machine-double sums
  (the 3x3 Hessian + gradient); only those scalars reach the driver,
  which solves by Cramer's rule with a formula mirrored token-for-token
  in the oracle SQL so both engines drift identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Naive Bayes

NB_TEST_MOD = 5  # doc_id % 5 == 0 -> test, else train


_NB_SQL = f"""
WITH toks AS (
    SELECT doc_id, source, w
    FROM (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ) WHERE w <> ''
),
train AS (SELECT * FROM toks WHERE doc_id % {NB_TEST_MOD} <> 0),
train_docs AS (
    SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM train GROUP BY 1
),
nn AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM train_docs),
vocab AS (SELECT DISTINCT w FROM train),
vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
wc AS (
    SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM train GROUP BY 1, 2
),
tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot_c FROM wc GROUP BY 1),
grid AS (
    SELECT t.source, vw.w,
        LN((COALESCE(wc.cnt, 0) + 1.0) / (t.tot_c + vs.v)) AS loglik
    FROM tot t CROSS JOIN vocab vw CROSS JOIN vsize vs
    LEFT JOIN wc ON wc.source = t.source AND wc.w = vw.w
),
test_tf AS (
    SELECT doc_id, MIN(source) AS actual, w, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks WHERE doc_id % {NB_TEST_MOD} = 0 GROUP BY doc_id, w
),
scored AS (
    SELECT tt.doc_id, tt.actual, g.source,
        SUM(tt.tf * g.loglik) AS ll
    FROM test_tf tt JOIN grid g ON g.w = tt.w
    GROUP BY 1, 2, 3
),
full_score AS (
    SELECT s.doc_id, s.actual, s.source,
        ROUND(s.ll + LN(td.n_docs * 1.0 / nn.n_total), 6) AS score
    FROM scored s JOIN train_docs td ON td.source = s.source CROSS JOIN nn
)
SELECT doc_id, actual, source AS predicted, score,
    CAST(source = actual AS INTEGER) AS correct
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, source
    ) AS rn
    FROM full_score
) WHERE rn = 1"""


@query("q_naive_bayes", oracle=_NB_SQL)
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes over document tokens: train on doc_id %
    {NB_TEST_MOD} != 0 with the source as the class, Laplace(+1)
    smoothing over the train vocabulary, predict the held-out fold by
    argmax of log prior + sum tf * log P(w|c). The quality-classifier
    pattern of LLM data pipelines (CCNet / GPT-3's Wikipedia-vs-crawl
    filter) with the linear scorer swapped for its generative twin.

    Determinism: per-(doc, class) log-likelihoods are rounded to 6 dp
    BEFORE the argmax (absorbing float sum-order noise between
    engines), ties break on class name. Test words outside the train
    vocabulary drop out in both dialects (inner join against the
    grid).

    Fixture note: the synthetic sources draw from ONE shared ~31-word
    vocabulary with near-uniform frequencies, so held-out accuracy
    sits at/below the 1/C chance line (the classic tiny-vocab
    leave-one-out anti-correlation) — the gate verifies the exact
    distributed scoring machinery, and the pure-Python differential in
    tests/test_mlkit.py verifies the formula, not fixture accuracy."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
    )
    train = toks.filter(F.col("doc_id") % NB_TEST_MOD != 0)
    train_docs = train.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs")
    )
    nn = train_docs.agg(F.sum("n_docs").cast("bigint").alias("n_total"))
    vocab = train.select("w").distinct()
    vsize = vocab.agg(F.count("*").cast("bigint").alias("v"))
    wc = train.groupBy("source", "w").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    tot = wc.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("tot_c"))
    grid = (
        tot.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(vsize))
        .join(F.broadcast(wc), ["source", "w"], "left")
        .select(
            "source",
            "w",
            F.log(
                (F.coalesce("cnt", F.lit(0)) + 1.0)
                / (F.col("tot_c") + F.col("v"))
            ).alias("loglik"),
        )
    )
    test_tf = (
        toks.filter(F.col("doc_id") % NB_TEST_MOD == 0)
        .groupBy("doc_id", "w")
        .agg(
            F.min("source").alias("actual"),
            F.count("*").cast("bigint").alias("tf"),
        )
    )
    scored = (
        test_tf.join(F.broadcast(grid), "w")
        .groupBy("doc_id", "actual", "source")
        .agg(F.sum(F.col("tf") * F.col("loglik")).alias("ll"))
    )
    full_score = (
        scored.join(F.broadcast(train_docs), "source")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "actual",
            "source",
            F.round(
                F.col("ll") + F.log(F.col("n_docs") / F.col("n_total")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("source"))
    return (
        full_score.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "actual",
            F.col("source").alias("predicted"),
            "score",
            (F.col("source") == F.col("actual")).cast("int").alias("correct"),
        )
    )


# ---------------------------------------------------------------------------
# Decision stump

PRICE_BINS = 20  # equi-width bins for l_extendedprice


_STUMP_SQL = f"""
WITH mm AS (
    SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
    FROM lineitem
),
binned AS (
    SELECT feature, bin, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(y) AS BIGINT) AS pos
    FROM (
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
            f.feature,
            CASE f.feature
                WHEN 'quantity' THEN CAST(l_quantity AS INTEGER)
                WHEN 'discount' THEN CAST(ROUND(l_discount * 100, 0) AS INTEGER)
                ELSE LEAST(CAST(FLOOR((l_extendedprice - mn) / (mx - mn)
                    * {PRICE_BINS}) AS INTEGER), {PRICE_BINS - 1})
            END AS bin
        FROM lineitem CROSS JOIN mm
        CROSS JOIN (
            SELECT unnest(['quantity', 'discount', 'price']) AS feature
        ) f
    ) GROUP BY 1, 2
),
cum AS (
    SELECT feature, bin,
        SUM(n) OVER (PARTITION BY feature ORDER BY bin) AS nl,
        SUM(pos) OVER (PARTITION BY feature ORDER BY bin) AS pl,
        SUM(n) OVER (PARTITION BY feature) AS nt,
        SUM(pos) OVER (PARTITION BY feature) AS pt
    FROM binned
),
gains AS (
    SELECT feature, bin AS split_bin,
        CAST(nl AS BIGINT) AS n_left, CAST(nt - nl AS BIGINT) AS n_right,
        ROUND(
            (CASE WHEN pt = 0 OR pt = nt THEN 0.0 ELSE
                -(pt * 1.0 / nt) * LN(pt * 1.0 / nt)
                - (1 - pt * 1.0 / nt) * LN(1 - pt * 1.0 / nt) END)
            - (nl * 1.0 / nt) * (CASE WHEN pl = 0 OR pl = nl THEN 0.0 ELSE
                -(pl * 1.0 / nl) * LN(pl * 1.0 / nl)
                - (1 - pl * 1.0 / nl) * LN(1 - pl * 1.0 / nl) END)
            - ((nt - nl) * 1.0 / nt)
              * (CASE WHEN pt - pl = 0 OR pt - pl = nt - nl THEN 0.0 ELSE
                -((pt - pl) * 1.0 / (nt - nl)) * LN((pt - pl) * 1.0 / (nt - nl))
                - (1 - (pt - pl) * 1.0 / (nt - nl))
                  * LN(1 - (pt - pl) * 1.0 / (nt - nl)) END),
            9) AS gain
    FROM cum WHERE nl < nt
)
SELECT feature, split_bin, n_left, n_right, ROUND(gain, 6) AS gain
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY feature ORDER BY gain DESC, split_bin
    ) AS rn
    FROM gains
) WHERE rn = 1"""


def _entropy(pos, n):
    """Binary entropy of a (pos, n) count pair as a Column, 0*ln0 = 0."""
    p = pos / n
    return (
        F.when((pos == 0) | (pos == n), F.lit(0.0))
        .otherwise(-p * F.log(p) - (1 - p) * F.log(1 - p))
    )


@query("q_best_split", oracle=_STUMP_SQL)
def q_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy decision stump: the best binary split per feature
    (quantity / discount / equi-width price bin) for predicting
    l_returnflag = 'R', by information gain — the inner loop of every
    tree learner, run as pure aggregation.

    Plan: ONE corpus pass builds the (feature, bin) rollup (the
    3-feature fan-out is an explode over structs, not three scans);
    every candidate threshold is then a cumulative window over the
    ~90-row rollup. Gain is rounded to 9 dp before ranking so the
    argmax order cannot depend on float sum-order noise."""
    li = load_table(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    price_bin = F.least(
        F.floor(
            (F.col("l_extendedprice") - F.col("mn"))
            / (F.col("mx") - F.col("mn"))
            * PRICE_BINS
        ).cast("int"),
        F.lit(PRICE_BINS - 1),
    )
    fanned = (
        li.crossJoin(F.broadcast(mm))
        .select(
            (F.col("l_returnflag") == "R").cast("int").alias("y"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("quantity").alias("feature"),
                        F.col("l_quantity").cast("int").alias("bin"),
                    ),
                    F.struct(
                        F.lit("discount").alias("feature"),
                        F.round(F.col("l_discount") * 100, 0)
                        .cast("int")
                        .alias("bin"),
                    ),
                    F.struct(
                        F.lit("price").alias("feature"),
                        price_bin.alias("bin"),
                    ),
                )
            ).alias("fb"),
        )
        .select("y", "fb.feature", "fb.bin")
    )
    binned = fanned.groupBy("feature", "bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    wcum = Window.partitionBy("feature").orderBy("bin")
    wall = Window.partitionBy("feature")
    cum = binned.select(
        "feature",
        "bin",
        F.sum("n").over(wcum).alias("nl"),
        F.sum("pos").over(wcum).alias("pl"),
        F.sum("n").over(wall).alias("nt"),
        F.sum("pos").over(wall).alias("pt"),
    )
    nl, pl, nt, pt = (F.col(c) for c in ("nl", "pl", "nt", "pt"))
    gain = F.round(
        _entropy(pt, nt)
        - (nl / nt) * _entropy(pl, nl)
        - ((nt - nl) / nt) * _entropy(pt - pl, nt - nl),
        9,
    )
    gains = cum.filter(nl < nt).select(
        "feature",
        F.col("bin").alias("split_bin"),
        nl.cast("bigint").alias("n_left"),
        (nt - nl).cast("bigint").alias("n_right"),
        gain.alias("gain"),
    )
    w = Window.partitionBy("feature").orderBy(
        F.desc("gain"), F.asc("split_bin")
    )
    return (
        gains.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "feature",
            "split_bin",
            "n_left",
            "n_right",
            F.round("gain", 6).alias("gain"),
        )
    )


# ---------------------------------------------------------------------------
# Newton / IRLS logistic regression

LR_ROUNDS = 4
LR_RIDGE = 1.0  # added to every Hessian diagonal (incl. intercept)
LR_X1_CENTER = 10.0  # ln(o_totalprice) centering constant
LR_EPOCH = "1995-01-01"  # day-count origin for the date feature
LR_X2_SCALE = 1000.0

_FEATS_SQL = f"""
    SELECT CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
        LN(o_totalprice) - {LR_X1_CENTER} AS x1,
        DATE_DIFF('day', DATE '{LR_EPOCH}', CAST(o_orderdate AS DATE))
            / {LR_X2_SCALE} AS x2
    FROM orders
"""


def _solve_sql(b: str, s: str) -> tuple[str, str, str]:
    """Cramer's-rule Newton-step expressions (as SQL text) for the ridge
    3x3 system H d = g, H = [[sw+L, swx1, swx2], [swx1, sw11+L, sw12],
    [swx2, sw12, sw22+L]] — token-for-token the same structure the
    Python driver evaluates, so both engines perform identical IEEE
    operations on their (order-differing) sums."""
    L = f"{LR_RIDGE!r}"
    a11, a12, a13 = f"({s}.sw + {L})", f"{s}.swx1", f"{s}.swx2"
    a22, a23, a33 = f"({s}.sw11 + {L})", f"{s}.sw12", f"({s}.sw22 + {L})"
    g0, g1, g2 = f"{s}.g0", f"{s}.g1", f"{s}.g2"
    det = (
        f"({a11} * ({a22} * {a33} - {a23} * {a23})"
        f" - {a12} * ({a12} * {a33} - {a23} * {a13})"
        f" + {a13} * ({a12} * {a23} - {a22} * {a13}))"
    )
    d0 = (
        f"({g0} * ({a22} * {a33} - {a23} * {a23})"
        f" - {a12} * ({g1} * {a33} - {a23} * {g2})"
        f" + {a13} * ({g1} * {a23} - {a22} * {g2}))"
    )
    d1 = (
        f"({a11} * ({g1} * {a33} - {g2} * {a23})"
        f" - {g0} * ({a12} * {a33} - {a23} * {a13})"
        f" + {a13} * ({a12} * {g2} - {g1} * {a13}))"
    )
    d2 = (
        f"({a11} * ({a22} * {g2} - {g1} * {a23})"
        f" - {a12} * ({a12} * {g2} - {g1} * {a13})"
        f" + {g0} * ({a12} * {a23} - {a22} * {a13}))"
    )
    return (
        f"{b}.b0 + {d0} / {det}",
        f"{b}.b1 + {d1} / {det}",
        f"{b}.b2 + {d2} / {det}",
    )


def _solve_py(b, s):
    """Python twin of _solve_sql — identical operation structure."""
    L = LR_RIDGE
    sw, swx1, swx2, sw11, sw12, sw22, g0, g1, g2 = s
    a11, a12, a13 = sw + L, swx1, swx2
    a22, a23, a33 = sw11 + L, sw12, sw22 + L
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    d0 = (
        g0 * (a22 * a33 - a23 * a23)
        - a12 * (g1 * a33 - a23 * g2)
        + a13 * (g1 * a23 - a22 * g2)
    )
    d1 = (
        a11 * (g1 * a33 - g2 * a23)
        - g0 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * g2 - g1 * a13)
    )
    d2 = (
        a11 * (a22 * g2 - g1 * a23)
        - a12 * (a12 * g2 - g1 * a13)
        + g0 * (a12 * a23 - a22 * a13)
    )
    return (b[0] + d0 / det, b[1] + d1 / det, b[2] + d2 / det)


_SUMS_SQL = """SELECT
    SUM(p * (1 - p)) AS sw,
    SUM(p * (1 - p) * x1) AS swx1,
    SUM(p * (1 - p) * x2) AS swx2,
    SUM(p * (1 - p) * x1 * x1) AS sw11,
    SUM(p * (1 - p) * x1 * x2) AS sw12,
    SUM(p * (1 - p) * x2 * x2) AS sw22,
    SUM(y - p) AS g0,
    SUM((y - p) * x1) AS g1,
    SUM((y - p) * x2) AS g2"""


def _newton_chain(pfx: str, feats: str) -> list[str]:
    """The unrolled ridge-Newton CTE chain over the CTE named `feats`,
    all intermediate names prefixed with `pfx` so several chains (folds,
    ablations) can coexist in one oracle. Final betas live in
    `{pfx}b{LR_ROUNDS}`."""
    parts = [f"{pfx}b0 AS (SELECT 0.0 b0, 0.0 b1, 0.0 b2)"]
    for k in range(LR_ROUNDS):
        b, nb = f"{pfx}b{k}", f"{pfx}b{k + 1}"
        p, s = f"{pfx}p{k}", f"{pfx}s{k}"
        parts.append(
            f"""{p} AS (
    SELECT y, x1, x2,
        1 / (1 + EXP(-({b}.b0 + {b}.b1 * x1 + {b}.b2 * x2))) AS p
    FROM {feats} CROSS JOIN {b})"""
        )
        parts.append(f"{s} AS ({_SUMS_SQL} FROM {p})")
        e0, e1, e2 = _solve_sql(b, s)
        parts.append(
            f"{nb} AS (SELECT {e0} AS b0, {e1} AS b1, {e2} AS b2"
            f" FROM {s} CROSS JOIN {b})"
        )
    return parts


def _ll_cte(name: str, feats: str, beta: str) -> str:
    """Mean negative log-likelihood of `beta` evaluated on `feats`."""
    return f"""{name} AS (
    SELECT SUM(CASE WHEN y = 1.0 THEN -LN(p) ELSE -LN(1 - p) END)
        / COUNT(*) AS log_loss
    FROM (
        SELECT y,
            1 / (1 + EXP(-({beta}.b0 + {beta}.b1 * x1 + {beta}.b2 * x2))) AS p
        FROM {feats} CROSS JOIN {beta}) t)"""


def _logreg_oracle() -> str:
    parts = [f"feats AS ({_FEATS_SQL})"]
    parts.extend(_newton_chain("", "feats"))
    bf = f"b{LR_ROUNDS}"
    parts.append(_ll_cte("ll", "feats", bf))
    final = f"""
SELECT param, ROUND(value, 6) AS value FROM (
    SELECT 'beta0' AS param, b0 AS value FROM {bf}
    UNION ALL SELECT 'beta1', b1 FROM {bf}
    UNION ALL SELECT 'beta2', b2 FROM {bf}
    UNION ALL SELECT 'log_loss', log_loss FROM ll
)"""
    return "WITH " + ",\n".join(parts) + final


def logreg_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
        (F.log("o_totalprice") - LR_X1_CENTER).alias("x1"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit(LR_EPOCH))
            / LR_X2_SCALE
        ).alias("x2"),
    )


def logreg_newton(feats: DataFrame, rounds: int = LR_ROUNDS) -> tuple:
    """Run `rounds` ridge-Newton steps from beta = 0; returns the final
    (b0, b1, b2). Per round: ONE aggregation of 9 double sums (the 3x3
    Hessian + gradient sufficient statistics) — the only driver traffic
    — then the literal-folded betas re-enter the row expression, so no
    join, no broadcast, no extra exchange ever happens."""
    beta = (0.0, 0.0, 0.0)
    for _ in range(rounds):
        z = (
            F.lit(beta[0])
            + F.lit(beta[1]) * F.col("x1")
            + F.lit(beta[2]) * F.col("x2")
        )
        p = 1 / (1 + F.exp(-z))
        w = p * (1 - p)
        r = feats.agg(
            F.sum(w),
            F.sum(w * F.col("x1")),
            F.sum(w * F.col("x2")),
            F.sum(w * F.col("x1") * F.col("x1")),
            F.sum(w * F.col("x1") * F.col("x2")),
            F.sum(w * F.col("x2") * F.col("x2")),
            F.sum(F.col("y") - p),
            F.sum((F.col("y") - p) * F.col("x1")),
            F.sum((F.col("y") - p) * F.col("x2")),
        ).first()
        beta = _solve_py(beta, tuple(r))
    return beta


@query("q_logreg_newton", oracle=_logreg_oracle())
def q_logreg_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge-regularized Newton (IRLS) logistic regression predicting
    fulfilled orders (o_orderstatus = 'F') from ln(o_totalprice) and the
    order-date day count — {LR_ROUNDS} fixed rounds from beta = 0,
    lambda = {LR_RIDGE} on every Hessian diagonal. The second iterative
    ML TRAINER under the exact hash gate: the oracle unrolls the same
    rounds as a CTE chain whose Cramer-solve SQL is generated from the
    same template the Python driver evaluates (_solve_sql/_solve_py),
    so the two engines perform structurally identical float math and
    the 6-dp-rounded coefficients hash-match.

    Scale: betas fold into the row expression as literals — each round
    is one whole-stage-codegen map + a 9-double tree-reduce; nothing
    but 9 scalars crosses the driver boundary per round, and the final
    log-loss is one more such pass."""
    feats = logreg_feats(spark, sf_dir).localCheckpoint()
    beta = logreg_newton(feats)
    z = (
        F.lit(beta[0])
        + F.lit(beta[1]) * F.col("x1")
        + F.lit(beta[2]) * F.col("x2")
    )
    p = 1 / (1 + F.exp(-z))
    ll = feats.agg(
        (
            F.sum(F.when(F.col("y") == 1.0, -F.log(p)).otherwise(-F.log(1 - p)))
            / F.count("*")
        ).alias("log_loss")
    )
    spark = feats.sparkSession
    betas = spark.createDataFrame(
        [("beta0", beta[0]), ("beta1", beta[1]), ("beta2", beta[2])],
        "param string, value double",
    )
    out = betas.unionAll(
        ll.select(F.lit("log_loss").alias("param"), F.col("log_loss").alias("value"))
    )
    return out.select("param", F.round("value", 6).alias("value"))


# ---------------------------------------------------------------------------
# Model selection on top of the Newton trainer

LR_CV_FOLDS = 3


def logreg_loss(feats: DataFrame, beta: tuple) -> float:
    """Mean negative log-likelihood of literal betas on `feats` — one
    whole-stage-codegen pass, one scalar back."""
    z = (
        F.lit(beta[0])
        + F.lit(beta[1]) * F.col("x1")
        + F.lit(beta[2]) * F.col("x2")
    )
    p = 1 / (1 + F.exp(-z))
    return feats.agg(
        (
            F.sum(
                F.when(F.col("y") == 1.0, -F.log(p)).otherwise(-F.log(1 - p))
            )
            / F.count("*")
        ).alias("log_loss")
    ).first()[0]


def _logreg_cv_oracle() -> str:
    parts = [
        f"base AS (SELECT f.*, o_orderkey % {LR_CV_FOLDS} AS fold FROM"
        f" ({_FEATS_SQL.replace('SELECT', 'SELECT o_orderkey,', 1)}) f)"
    ]
    selects = []
    for f in range(LR_CV_FOLDS):
        pfx = f"f{f}_"
        parts.append(
            f"{pfx}train AS (SELECT y, x1, x2 FROM base WHERE fold <> {f})"
        )
        parts.append(
            f"{pfx}val AS (SELECT y, x1, x2 FROM base WHERE fold = {f})"
        )
        parts.extend(_newton_chain(pfx, f"{pfx}train"))
        bf = f"{pfx}b{LR_ROUNDS}"
        parts.append(_ll_cte(f"{pfx}ll", f"{pfx}val", bf))
        selects.append(
            f"SELECT {f} AS fold, b0, b1, b2, log_loss"
            f" FROM {bf} CROSS JOIN {pfx}ll"
        )
    final = f"""
SELECT fold, ROUND(b0, 6) AS beta0, ROUND(b1, 6) AS beta1,
    ROUND(b2, 6) AS beta2, ROUND(log_loss, 6) AS val_log_loss
FROM ({" UNION ALL ".join(selects)})"""
    return "WITH " + ",\n".join(parts) + final


@query("q_logreg_cv", oracle=_logreg_cv_oracle())
def q_logreg_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{LR_CV_FOLDS}-fold cross-validation of the ridge-Newton logistic
    trainer: folds keyed on o_orderkey % {LR_CV_FOLDS} (deterministic in
    both engines), each fold's model trained on the other folds with
    the full {LR_ROUNDS}-round Newton recursion and scored by held-out
    mean log-loss — the model-selection loop (is the model stable
    across folds? is val loss ~ train loss?) run entirely as
    sufficient-statistic passes. The oracle unrolls ALL
    {LR_CV_FOLDS} x {LR_ROUNDS} Newton rounds as prefixed CTE chains.

    Scale: per fold per round one codegen map + 9-double reduce over
    the train partitions; the fold filter is a pushed-down predicate,
    never a shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    feats = orders.select(
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
        (F.log("o_totalprice") - LR_X1_CENTER).alias("x1"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit(LR_EPOCH))
            / LR_X2_SCALE
        ).alias("x2"),
        (F.col("o_orderkey") % LR_CV_FOLDS).alias("fold"),
    ).localCheckpoint()
    rows = []
    for f in range(LR_CV_FOLDS):
        train = feats.filter(F.col("fold") != f).select("y", "x1", "x2")
        val = feats.filter(F.col("fold") == f).select("y", "x1", "x2")
        beta = logreg_newton(train)
        rows.append((f, beta[0], beta[1], beta[2], logreg_loss(val, beta)))
    out = spark.createDataFrame(
        rows, "fold int, b0 double, b1 double, b2 double, ll double"
    )
    return out.select(
        "fold",
        F.round("b0", 6).alias("beta0"),
        F.round("b1", 6).alias("beta1"),
        F.round("b2", 6).alias("beta2"),
        F.round("ll", 6).alias("val_log_loss"),
    )


_ABLATIONS = (
    ("full", "x1", "x2"),
    ("drop_x1", "0.0", "x2"),
    ("drop_x2", "x1", "0.0"),
)


def _ablation_oracle() -> str:
    parts = [f"basef AS ({_FEATS_SQL})"]
    selects = []
    for i, (model, e1, e2) in enumerate(_ABLATIONS):
        pfx = f"m{i}_"
        parts.append(
            f"{pfx}feats AS (SELECT y, {e1} AS x1, {e2} AS x2 FROM basef)"
        )
        parts.extend(_newton_chain(pfx, f"{pfx}feats"))
        bf = f"{pfx}b{LR_ROUNDS}"
        parts.append(_ll_cte(f"{pfx}ll", f"{pfx}feats", bf))
        selects.append(
            f"SELECT '{model}' AS model, b0, b1, b2, log_loss"
            f" FROM {bf} CROSS JOIN {pfx}ll"
        )
    final = f"""
SELECT model, ROUND(b0, 6) AS beta0, ROUND(b1, 6) AS beta1,
    ROUND(b2, 6) AS beta2, ROUND(log_loss, 6) AS log_loss,
    ROUND(log_loss - (SELECT log_loss FROM m0_ll), 6) AS delta_vs_full
FROM ({" UNION ALL ".join(selects)})"""
    return "WITH " + ",\n".join(parts) + final


@query("q_feature_ablation", oracle=_ablation_oracle())
def q_feature_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-ablation importance for the Newton logistic model:
    retrain with each feature column REPLACED BY ZERO and report the
    train log-loss increase over the full model — proper retrained
    ablation (not permutation), the importance measure that accounts
    for feature substitution. Zeroing a column inside the SAME 3-var
    ridge machinery is exactly the 2-var ridge fit (the zeroed
    coordinate's Hessian row collapses to the ridge term and its
    gradient to 0, so its Newton step is identically 0) — one solver,
    every ablation, both engines.

    Scale: three sufficient-statistic chains over the same checkpointed
    features frame; nothing but scalars leaves the executors."""
    feats = logreg_feats(spark, sf_dir).localCheckpoint()
    rows = []
    for model, e1, e2 in _ABLATIONS:
        mf = feats.select(
            "y",
            (F.col("x1") if e1 == "x1" else F.lit(0.0)).alias("x1"),
            (F.col("x2") if e2 == "x2" else F.lit(0.0)).alias("x2"),
        )
        beta = logreg_newton(mf)
        rows.append((model, beta[0], beta[1], beta[2], logreg_loss(mf, beta)))
    full_ll = rows[0][4]
    out = spark.createDataFrame(
        [r + (r[4] - full_ll,) for r in rows],
        "model string, b0 double, b1 double, b2 double,"
        " ll double, delta double",
    )
    return out.select(
        "model",
        F.round("b0", 6).alias("beta0"),
        F.round("b1", 6).alias("beta1"),
        F.round("b2", 6).alias("beta2"),
        F.round("ll", 6).alias("log_loss"),
        F.round("delta", 6).alias("delta_vs_full"),
    )


# ---------------------------------------------------------------------------
# GLM family: the same sufficient-statistic Newton machinery, other links

_POIS_FEATS_SQL = """
    SELECT CAST(COUNT(*) AS DOUBLE) AS y,
        CASE WHEN dayofweek(any_value(d)) IN (0, 6) THEN 1.0 ELSE 0.0 END
            AS x1,
        (date_diff('day', DATE '2024-01-01', any_value(d))) / 30.0 AS x2
    FROM (SELECT user_id, CAST(ts AS DATE) AS d FROM events) t
    GROUP BY user_id, d
"""

_POIS_SUMS_SQL = """SELECT
    SUM(p) AS sw,
    SUM(p * x1) AS swx1,
    SUM(p * x2) AS swx2,
    SUM(p * x1 * x1) AS sw11,
    SUM(p * x1 * x2) AS sw12,
    SUM(p * x2 * x2) AS sw22,
    SUM(y - p) AS g0,
    SUM((y - p) * x1) AS g1,
    SUM((y - p) * x2) AS g2"""


def _poisson_chain(pfx: str, feats: str) -> list[str]:
    """Unrolled Poisson-GLM Newton chain: identical Cramer solve, with
    the log link's mu = exp(z) playing both the IRLS weight and the
    fitted mean (column alias `p` so the shared solve template
    applies)."""
    parts = [f"{pfx}b0 AS (SELECT 0.0 b0, 0.0 b1, 0.0 b2)"]
    for k in range(LR_ROUNDS):
        b, nb = f"{pfx}b{k}", f"{pfx}b{k + 1}"
        p, s = f"{pfx}p{k}", f"{pfx}s{k}"
        parts.append(
            f"""{p} AS (
    SELECT y, x1, x2, EXP({b}.b0 + {b}.b1 * x1 + {b}.b2 * x2) AS p
    FROM {feats} CROSS JOIN {b})"""
        )
        parts.append(f"{s} AS ({_POIS_SUMS_SQL} FROM {p})")
        e0, e1, e2 = _solve_sql(b, s)
        parts.append(
            f"{nb} AS (SELECT {e0} AS b0, {e1} AS b1, {e2} AS b2"
            f" FROM {s} CROSS JOIN {b})"
        )
    return parts


def _poisson_oracle() -> str:
    parts = [f"feats AS ({_POIS_FEATS_SQL})"]
    parts.extend(_poisson_chain("", "feats"))
    bf = f"b{LR_ROUNDS}"
    parts.append(
        f"""dev AS (
    SELECT 2 * SUM(CASE WHEN y > 0 THEN y * LN(y / p) ELSE 0 END - (y - p))
        / COUNT(*) AS mean_deviance
    FROM (
        SELECT y, EXP({bf}.b0 + {bf}.b1 * x1 + {bf}.b2 * x2) AS p
        FROM feats CROSS JOIN {bf}) t)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT param, ROUND(value, 6) AS value FROM (
    SELECT 'beta0' AS param, b0 AS value FROM {bf}
    UNION ALL SELECT 'beta1', b1 FROM {bf}
    UNION ALL SELECT 'beta2', b2 FROM {bf}
    UNION ALL SELECT 'mean_deviance', mean_deviance FROM dev
)"""
    )


@query("q_poisson_glm", oracle=_poisson_oracle())
def q_poisson_glm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson GLM (log link) on per-user-day event counts — rate ~
    exp(b0 + b1*is_weekend + b2*month_progress) — the canonical count-
    data regression (traffic/usage modeling), trained with the SAME
    ridge-Cramer Newton machinery as the logistic trainer: for the log
    link, IRLS weight and fitted mean coincide (w = mu), so only the
    one column expression changes. Fixed {LR_ROUNDS} rounds from 0;
    output includes the mean Poisson deviance (the GLM goodness-of-fit
    twin of log-loss).

    Scale: the count grain is one groupBy; each round is one codegen
    map + a 9-double reduce; the deviance one more pass."""
    ev = load_table(spark, sf_dir, "events")
    feats = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .groupBy("user_id", "d")
        .agg(F.count("*").cast("double").alias("y"))
        .select(
            "y",
            F.when(F.dayofweek("d").isin(1, 7), 1.0).otherwise(0.0).alias("x1"),
            (F.datediff(F.col("d"), F.lit("2024-01-01")) / 30.0).alias("x2"),
        )
        .localCheckpoint()
    )
    beta = (0.0, 0.0, 0.0)
    for _ in range(LR_ROUNDS):
        z = (
            F.lit(beta[0])
            + F.lit(beta[1]) * F.col("x1")
            + F.lit(beta[2]) * F.col("x2")
        )
        mu = F.exp(z)
        r = feats.agg(
            F.sum(mu),
            F.sum(mu * F.col("x1")),
            F.sum(mu * F.col("x2")),
            F.sum(mu * F.col("x1") * F.col("x1")),
            F.sum(mu * F.col("x1") * F.col("x2")),
            F.sum(mu * F.col("x2") * F.col("x2")),
            F.sum(F.col("y") - mu),
            F.sum((F.col("y") - mu) * F.col("x1")),
            F.sum((F.col("y") - mu) * F.col("x2")),
        ).first()
        beta = _solve_py(beta, tuple(r))
    z = (
        F.lit(beta[0])
        + F.lit(beta[1]) * F.col("x1")
        + F.lit(beta[2]) * F.col("x2")
    )
    mu = F.exp(z)
    dev = feats.agg(
        (
            2
            * F.sum(
                F.when(
                    F.col("y") > 0, F.col("y") * F.log(F.col("y") / mu)
                ).otherwise(0.0)
                - (F.col("y") - mu)
            )
            / F.count("*")
        ).alias("mean_deviance")
    )
    out = spark.createDataFrame(
        [("beta0", beta[0]), ("beta1", beta[1]), ("beta2", beta[2])],
        "param string, value double",
    ).unionAll(
        dev.select(
            F.lit("mean_deviance").alias("param"),
            F.col("mean_deviance").alias("value"),
        )
    )
    return out.select("param", F.round("value", 6).alias("value"))


_OLS_FEATS_SQL = """
    SELECT LN(o.o_totalprice) AS y,
        CAST(c.n_items AS DOUBLE) AS x1,
        date_diff('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE))
            / 1000.0 AS x2
    FROM orders o
    JOIN (
        SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY 1
    ) c ON c.l_orderkey = o.o_orderkey
"""

_OLS_SUMS_SQL = """SELECT
    SUM(1.0) AS sw,
    SUM(x1) AS swx1,
    SUM(x2) AS swx2,
    SUM(x1 * x1) AS sw11,
    SUM(x1 * x2) AS sw12,
    SUM(x2 * x2) AS sw22,
    SUM(y) AS g0,
    SUM(y * x1) AS g1,
    SUM(y * x2) AS g2"""


def _ols_oracle() -> str:
    zero = "zb AS (SELECT 0.0 b0, 0.0 b1, 0.0 b2)"
    e0, e1, e2 = _solve_sql("zb", "s")
    return f"""WITH feats AS ({_OLS_FEATS_SQL}),
{zero},
s AS ({_OLS_SUMS_SQL} FROM feats),
beta AS (SELECT {e0} AS b0, {e1} AS b1, {e2} AS b2 FROM s CROSS JOIN zb),
fit AS (
    SELECT y, beta.b0 + beta.b1 * x1 + beta.b2 * x2 AS yhat
    FROM feats CROSS JOIN beta
),
centered AS (
    SELECT y, yhat, AVG(y) OVER () AS ym FROM fit
),
r2 AS (
    SELECT 1 - SUM((y - yhat) * (y - yhat))
        / SUM((y - ym) * (y - ym)) AS r2
    FROM centered
)
SELECT param, ROUND(value, 6) AS value FROM (
    SELECT 'beta0' AS param, b0 AS value FROM beta
    UNION ALL SELECT 'beta1', b1 FROM beta
    UNION ALL SELECT 'beta2', b2 FROM beta
    UNION ALL SELECT 'r2', r2 FROM r2
)"""


@query("q_ridge_ols", oracle=_ols_oracle())
def q_ridge_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge linear regression: ln(order total) ~ item count
    + order-date drift, solved from ONE pass of sufficient statistics
    (X'X, X'y as 9 double sums) with the shared Cramer template — ridge
    OLS is exactly one Newton step from zero with unit IRLS weights, so
    the logistic/Poisson/OLS family shares a single solver in both
    engines. Output: coefficients + in-sample R^2.

    Scale: the item-count feature is the only join (an orderkey-
    co-partitioned count rollup); the solve is driver arithmetic on 9
    scalars; R^2 is one more codegen pass."""
    orders = load_table(spark, sf_dir, "orders")
    counts = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_items"))
    )
    feats = (
        orders.join(counts, orders.o_orderkey == counts.l_orderkey)
        .select(
            F.log("o_totalprice").alias("y"),
            F.col("n_items").cast("double").alias("x1"),
            (
                F.datediff(F.col("o_orderdate").cast("date"), F.lit(LR_EPOCH))
                / LR_X2_SCALE
            ).alias("x2"),
        )
        .localCheckpoint()
    )
    r = feats.agg(
        F.sum(F.lit(1.0)),
        F.sum("x1"),
        F.sum("x2"),
        F.sum(F.col("x1") * F.col("x1")),
        F.sum(F.col("x1") * F.col("x2")),
        F.sum(F.col("x2") * F.col("x2")),
        F.sum("y"),
        F.sum(F.col("y") * F.col("x1")),
        F.sum(F.col("y") * F.col("x2")),
    ).first()
    beta = _solve_py((0.0, 0.0, 0.0), tuple(r))
    yhat = (
        F.lit(beta[0])
        + F.lit(beta[1]) * F.col("x1")
        + F.lit(beta[2]) * F.col("x2")
    )
    ybar = Window.partitionBy()
    r2 = feats.select(
        "y", yhat.alias("yhat"), F.avg("y").over(ybar).alias("ym")
    ).agg(
        (
            1
            - F.sum((F.col("y") - F.col("yhat")) ** 2)
            / F.sum((F.col("y") - F.col("ym")) ** 2)
        ).alias("r2")
    )
    out = spark.createDataFrame(
        [("beta0", beta[0]), ("beta1", beta[1]), ("beta2", beta[2])],
        "param string, value double",
    ).unionAll(
        r2.select(F.lit("r2").alias("param"), F.col("r2").alias("value"))
    )
    return out.select("param", F.round("value", 6).alias("value"))


# ---------------------------------------------------------------------------
# Feature selection / attribution

CHI2_TOPK = 3


@query(
    "q_chi2_feature_selection",
    oracle=f"""
WITH dw AS (
    SELECT DISTINCT doc_id, source, w FROM (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ) WHERE w <> ''
),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dw),
cls AS (
    SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_c
    FROM dw GROUP BY 1
),
dfw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM dw GROUP BY 1),
a AS (
    SELECT source, w, CAST(COUNT(*) AS BIGINT) AS a FROM dw GROUP BY 1, 2
),
cells AS (
    SELECT a.source, a.w, a.a,
        dfw.df - a.a AS b,
        cls.n_c - a.a AS c,
        n.n_docs - cls.n_c - (dfw.df - a.a) AS d,
        n.n_docs AS nn
    FROM a JOIN dfw USING (w) JOIN cls USING (source) CROSS JOIN n
),
scored AS (
    SELECT source, w, a, ROUND(
        nn * 1.0 * (a * d - b * c) * (a * d - b * c)
        / ((a + b) * (c + d) * (a + c) * (b + d)), 6) AS chi2
    FROM cells
    WHERE (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0
)
SELECT source, w AS word, a AS n_docs_with, chi2,
    CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY chi2 DESC, w
    ) AS rnk FROM scored
) WHERE rnk <= {CHI2_TOPK}""",
)
def q_chi2_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared feature selection for text classification: per class,
    the top-{CHI2_TOPK} tokens by the 2x2 presence/class chi-squared
    statistic — the standard vocabulary-pruning step before training a
    classifier like q_naive_bayes (and, run on its own, the "which
    words characterize this source" diagnostic). All four contingency
    cells derive from three integer rollups (per-(word, class) doc
    counts, per-word document frequency, per-class doc counts), so the
    statistic is exact integer arithmetic divided once — identical
    doubles in both engines; ranking uses the 6-dp-rounded value with
    a word tie-break.

    Scale: one distinct over (doc, word) presence pairs, three
    rollups, and a window over |V| x C scored rows — the corpus never
    joins itself."""
    docs = load_table(spark, sf_dir, "documents")
    dw = (
        docs.select(
            "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    n = dw.agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    cls = dw.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_c")
    )
    dfw = dw.groupBy("w").agg(F.count("*").cast("bigint").alias("df"))
    a = dw.groupBy("source", "w").agg(F.count("*").cast("bigint").alias("a"))
    cells = (
        a.join(F.broadcast(dfw), "w")
        .join(F.broadcast(cls), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "w",
            "a",
            (F.col("df") - F.col("a")).alias("b"),
            (F.col("n_c") - F.col("a")).alias("c"),
            (F.col("n_docs") - F.col("n_c") - (F.col("df") - F.col("a"))).alias(
                "d"
            ),
            F.col("n_docs").alias("nn"),
        )
    )
    ad_bc = F.col("a") * F.col("d") - F.col("b") * F.col("c")
    denom = (
        (F.col("a") + F.col("b"))
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
    )
    scored = cells.filter(
        ((F.col("a") + F.col("b")) > 0)
        & ((F.col("c") + F.col("d")) > 0)
        & ((F.col("a") + F.col("c")) > 0)
        & ((F.col("b") + F.col("d")) > 0)
    ).select(
        "source",
        "w",
        "a",
        F.round(F.col("nn") * ad_bc * ad_bc / denom, 6).alias("chi2"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("chi2"), F.asc("w"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= CHI2_TOPK)
        .select(
            "source",
            F.col("w").alias("word"),
            F.col("a").alias("n_docs_with"),
            "chi2",
            "rnk",
        )
    )


_SHAPLEY_MODELS = (
    ("null", "0.0", "0.0"),
    ("only_x1", "x1", "0.0"),
    ("only_x2", "0.0", "x2"),
    ("full", "x1", "x2"),
)


def _shapley_oracle() -> str:
    parts = [f"basef AS ({_FEATS_SQL})"]
    for i, (_, e1, e2) in enumerate(_SHAPLEY_MODELS):
        pfx = f"v{i}_"
        parts.append(
            f"{pfx}feats AS (SELECT y, {e1} AS x1, {e2} AS x2 FROM basef)"
        )
        parts.extend(_newton_chain(pfx, f"{pfx}feats"))
        parts.append(
            _ll_cte(f"{pfx}ll", f"{pfx}feats", f"{pfx}b{LR_ROUNDS}")
        )
    final = """
SELECT feature, ROUND(value, 6) AS shapley_value FROM (
    SELECT 'x1' AS feature,
        0.5 * ((l0.log_loss - l1.log_loss) + (l2.log_loss - l3.log_loss))
            AS value
    FROM v0_ll l0, v1_ll l1, v2_ll l2, v3_ll l3
    UNION ALL
    SELECT 'x2',
        0.5 * ((l0.log_loss - l2.log_loss) + (l1.log_loss - l3.log_loss))
    FROM v0_ll l0, v1_ll l1, v2_ll l2, v3_ll l3
)"""
    return "WITH " + ",\n".join(parts) + final


@query("q_shapley_attribution", oracle=_shapley_oracle())
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley attribution of the logistic model's log-loss
    reduction over its two features: retrain on all 4 feature subsets
    (the zeroed-column trick — one ridge solver for every subset) and
    average each feature's marginal contribution over both join orders
    — phi_i = 1/2 [(v(i) - v(0)) + (v(full) - v(other))] with v = loss
    reduction. Efficiency (phi_1 + phi_2 = full-model reduction) holds
    by construction and is asserted in tests. The model-attribution
    primitive (SHAP's exact small-d case), done with sufficient-
    statistic passes only.

    Scale: 4 Newton chains x {LR_ROUNDS} rounds, each one codegen map +
    9-double reduce over the checkpointed features frame."""
    feats = logreg_feats(spark, sf_dir).localCheckpoint()
    losses = []
    for _, e1, e2 in _SHAPLEY_MODELS:
        mf = feats.select(
            "y",
            (F.col("x1") if e1 == "x1" else F.lit(0.0)).alias("x1"),
            (F.col("x2") if e2 == "x2" else F.lit(0.0)).alias("x2"),
        )
        losses.append(logreg_loss(mf, logreg_newton(mf)))
    l0, l1, l2, l3 = losses
    phi1 = 0.5 * ((l0 - l1) + (l2 - l3))
    phi2 = 0.5 * ((l0 - l2) + (l1 - l3))
    out = spark.createDataFrame(
        [("x1", phi1), ("x2", phi2)], "feature string, v double"
    )
    return out.select("feature", F.round("v", 6).alias("shapley_value"))


# ---------------------------------------------------------------------------
# Gradient-boosted stumps: the third iterative trainer under the gate

BOOST_ROUNDS = 4
BOOST_NU = 0.5  # learning rate

_BOOST_BASE_SQL = """
    SELECT CAST(l_quantity AS INTEGER) AS qbin,
        CAST(ROUND(l_discount * 100, 0) AS INTEGER) AS dbin,
        LN(l_extendedprice) AS y
    FROM lineitem
"""


def _boost_round_sql(k: int) -> list[str]:
    """CTEs for boosting round k: residual rollup -> cumulative split
    scan -> 6-dp-rounded gain argmax -> literal-free residual update
    (the chosen split rides along as a 1-row CROSS JOIN)."""
    prev = f"resid{k - 1}"
    return [
        f"""fan{k} AS (
    SELECT 'quantity' AS feature, qbin AS bin, r FROM {prev}
    UNION ALL SELECT 'discount', dbin, r FROM {prev})""",
        f"""roll{k} AS (
    SELECT feature, bin, CAST(COUNT(*) AS BIGINT) AS n, SUM(r) AS sr
    FROM fan{k} GROUP BY 1, 2)""",
        f"""cum{k} AS (
    SELECT feature, bin,
        SUM(n) OVER (PARTITION BY feature ORDER BY bin) AS cn,
        SUM(sr) OVER (PARTITION BY feature ORDER BY bin) AS csr,
        SUM(n) OVER (PARTITION BY feature) AS tn,
        SUM(sr) OVER (PARTITION BY feature) AS tsr
    FROM roll{k})""",
        f"""gains{k} AS (
    SELECT feature, bin,
        csr / cn AS ml, (tsr - csr) / (tn - cn) AS mr,
        ROUND(cn * (csr / cn) * (csr / cn)
            + (tn - cn) * ((tsr - csr) / (tn - cn))
              * ((tsr - csr) / (tn - cn)), 6) AS gain
    FROM cum{k} WHERE cn < tn)""",
        f"""best{k} AS (
    SELECT feature, bin, ml, mr FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY gain DESC, feature, bin) AS rn
        FROM gains{k}
    ) WHERE rn = 1)""",
        f"""resid{k} AS (
    SELECT qbin, dbin,
        r - {BOOST_NU!r} * CASE
            WHEN b.feature = 'quantity' AND qbin <= b.bin THEN b.ml
            WHEN b.feature = 'quantity' THEN b.mr
            WHEN dbin <= b.bin THEN b.ml
            ELSE b.mr END AS r
    FROM {prev} CROSS JOIN best{k} b)""",
        f"mse{k} AS (SELECT AVG(r * r) AS mse FROM resid{k})",
    ]


def _boost_oracle() -> str:
    parts = [
        f"basef AS ({_BOOST_BASE_SQL})",
        "m0 AS (SELECT AVG(y) AS f0 FROM basef)",
        "resid0 AS (SELECT qbin, dbin, y - f0 AS r FROM basef CROSS JOIN m0)",
    ]
    selects = []
    for k in range(1, BOOST_ROUNDS + 1):
        parts.extend(_boost_round_sql(k))
        selects.append(
            f"SELECT {k} AS round, b.feature, b.bin AS split_bin,"
            f" ROUND(b.ml, 6) AS left_mean, ROUND(b.mr, 6) AS right_mean,"
            f" ROUND(m.mse, 6) AS train_mse"
            f" FROM best{k} b CROSS JOIN mse{k} m"
        )
    return "WITH " + ",\n".join(parts) + "\n" + " UNION ALL ".join(selects)


@query("q_stump_boost", oracle=_boost_oracle())
def q_stump_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares gradient boosting with depth-1 trees (stumps):
    {BOOST_ROUNDS} rounds of fit-stump-to-residuals on ln(line price)
    over the quantity/discount bins, learning rate {BOOST_NU} — the
    THIRD iterative ML trainer under the exact driver hash gate
    (after k-means and Newton logistic), and the one whose per-round
    model is a DATA-DEPENDENT argmax (the chosen split), not just a
    parameter vector. Gains are rounded to 6 dp before the argmax and
    ties break on (feature, bin), so the split choice — the branch
    point of the whole recursion — cannot flip on float sum-order
    noise between engines; the log-scale target keeps gain noise ~1e-11
    against a 6-dp grid.

    Scale: each round is ONE residual rollup pass (2-feature struct
    fan-out), a window over the ~60-row rollup, a 1-row collect of the
    winning split (5 scalars — the only driver traffic), and a
    literal-folded residual update; residuals are carried by a lazy
    localCheckpoint so round k never replays rounds 1..k-1."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("int").alias("qbin"),
        F.round(F.col("l_discount") * 100, 0).cast("int").alias("dbin"),
        F.log("l_extendedprice").alias("y"),
    )
    f0 = base.agg(F.avg("y")).first()[0]
    resid = base.select(
        "qbin", "dbin", (F.col("y") - F.lit(f0)).alias("r")
    ).localCheckpoint(eager=False)
    rows = []
    for k in range(1, BOOST_ROUNDS + 1):
        fan = resid.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("quantity").alias("feature"),
                        F.col("qbin").alias("bin"),
                    ),
                    F.struct(
                        F.lit("discount").alias("feature"),
                        F.col("dbin").alias("bin"),
                    ),
                )
            ).alias("fb"),
            "r",
        ).select("fb.feature", "fb.bin", "r")
        roll = fan.groupBy("feature", "bin").agg(
            F.count("*").cast("bigint").alias("n"), F.sum("r").alias("sr")
        )
        wcum = Window.partitionBy("feature").orderBy("bin")
        wall = Window.partitionBy("feature")
        cum = roll.select(
            "feature",
            "bin",
            F.sum("n").over(wcum).alias("cn"),
            F.sum("sr").over(wcum).alias("csr"),
            F.sum("n").over(wall).alias("tn"),
            F.sum("sr").over(wall).alias("tsr"),
        ).filter(F.col("cn") < F.col("tn"))
        ml = F.col("csr") / F.col("cn")
        mr = (F.col("tsr") - F.col("csr")) / (F.col("tn") - F.col("cn"))
        gains = cum.select(
            "feature",
            "bin",
            ml.alias("ml"),
            mr.alias("mr"),
            F.round(
                F.col("cn") * ml * ml + (F.col("tn") - F.col("cn")) * mr * mr,
                6,
            ).alias("gain"),
        )
        wbest = Window.orderBy(F.desc("gain"), F.asc("feature"), F.asc("bin"))
        best = (
            gains.withColumn("rn", F.row_number().over(wbest))
            .filter(F.col("rn") == 1)
            .select("feature", "bin", "ml", "mr")
            .first()
        )
        bin_col = F.col("qbin") if best.feature == "quantity" else F.col("dbin")
        step = F.when(bin_col <= best.bin, best.ml).otherwise(best.mr)
        new_resid = resid.select(
            "qbin", "dbin", (F.col("r") - BOOST_NU * step).alias("r")
        ).localCheckpoint(eager=False)
        mse = new_resid.agg(F.avg(F.col("r") * F.col("r"))).first()[0]
        rows.append((k, best.feature, best.bin, best.ml, best.mr, mse))
        resid = new_resid
    out = spark.createDataFrame(
        rows,
        "round int, feature string, split_bin int,"
        " left_mean double, right_mean double, train_mse double",
    )
    return out.select(
        "round",
        "feature",
        "split_bin",
        F.round("left_mean", 6).alias("left_mean"),
        F.round("right_mean", 6).alias("right_mean"),
        F.round("train_mse", 6).alias("train_mse"),
    )


# ---------------------------------------------------------------------------
# Causal family: uplift + inverse-propensity weighting on the A/B split

_CAUSAL_FEATS_SQL = """
    SELECT CAST(user_id % 2 AS DOUBLE) AS t,
        CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS DOUBLE) AS y,
        LN(1 + SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)) AS x1,
        COALESCE(AVG(CASE WHEN event_type = 'view' THEN value END), 0.0)
            AS x2,
        SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
            AS outcome
    FROM events GROUP BY user_id
"""


def _causal_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("double")
            .alias("y"),
            F.log(
                1
                + F.sum(
                    F.when(F.col("event_type") == "view", 1).otherwise(0)
                )
            ).alias("x1"),
            F.coalesce(
                F.avg(F.when(F.col("event_type") == "view", F.col("value"))),
                F.lit(0.0),
            ).alias("x2"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ).alias("outcome"),
        )
        .withColumn("t", (F.col("user_id") % 2).cast("double"))
        .drop("user_id")
        .localCheckpoint()
    )


def _uplift_oracle() -> str:
    parts = [f"feats AS ({_CAUSAL_FEATS_SQL})"]
    for v in (0, 1):
        parts.append(
            f"v{v}_feats AS (SELECT y, x1, x2 FROM feats WHERE t = {v}.0)"
        )
        parts.extend(_newton_chain(f"v{v}_", f"v{v}_feats"))
        parts.append(
            _ll_cte(f"v{v}_ll", f"v{v}_feats", f"v{v}_b{LR_ROUNDS}")
        )
    b0, b1 = f"v0_b{LR_ROUNDS}", f"v1_b{LR_ROUNDS}"
    parts.append(
        f"""uplift AS (
    SELECT AVG(
        1 / (1 + EXP(-(t1.b0 + t1.b1 * x1 + t1.b2 * x2)))
        - 1 / (1 + EXP(-(t0.b0 + t0.b1 * x1 + t0.b2 * x2)))) AS ate
    FROM feats CROSS JOIN {b0} t0 CROSS JOIN {b1} t1)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT param, ROUND(value, 6) AS value FROM (
    SELECT 'v0_beta0' AS param, b0 AS value FROM {b0}
    UNION ALL SELECT 'v0_beta1', b1 FROM {b0}
    UNION ALL SELECT 'v0_beta2', b2 FROM {b0}
    UNION ALL SELECT 'v0_log_loss', log_loss FROM v0_ll
    UNION ALL SELECT 'v1_beta0', b0 FROM {b1}
    UNION ALL SELECT 'v1_beta1', b1 FROM {b1}
    UNION ALL SELECT 'v1_beta2', b2 FROM {b1}
    UNION ALL SELECT 'v1_log_loss', log_loss FROM v1_ll
    UNION ALL SELECT 'ate_uplift', ate FROM uplift
)"""
    )


@query("q_uplift_tlearner", oracle=_uplift_oracle())
def q_uplift_tlearner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-learner uplift model on the user_id-parity A/B split: one
    Newton logistic conversion model per variant (features = view
    activity, view value), uplift = mean over ALL users of
    p_treated(x) - p_control(x) — the heterogeneous-treatment-effect
    workhorse that upgrades q_ab_test's single ATE into a model-based
    estimate. Both variant models and the uplift averaging pass are
    hash-oracled via the shared unrolled Newton CTE chains.

    Scale: the user grain is one groupBy; each variant chain is
    {LR_ROUNDS} sufficient-statistic passes over its (pushed-down)
    partition; the uplift readout is one more codegen pass."""
    feats = _causal_feats(spark, sf_dir)
    betas = {}
    rows = []
    for v in (0, 1):
        part = feats.filter(F.col("t") == float(v)).select("y", "x1", "x2")
        b = logreg_newton(part)
        betas[v] = b
        rows.extend(
            [
                (f"v{v}_beta0", b[0]),
                (f"v{v}_beta1", b[1]),
                (f"v{v}_beta2", b[2]),
                (f"v{v}_log_loss", logreg_loss(part, b)),
            ]
        )

    def _p(b):
        z = (
            F.lit(b[0])
            + F.lit(b[1]) * F.col("x1")
            + F.lit(b[2]) * F.col("x2")
        )
        return 1 / (1 + F.exp(-z))

    ate = feats.agg(F.avg(_p(betas[1]) - _p(betas[0]))).first()[0]
    rows.append(("ate_uplift", ate))
    out = feats.sparkSession.createDataFrame(
        rows, "param string, value double"
    )
    return out.select("param", F.round("value", 6).alias("value"))


IPW_CLIP = 0.05  # propensity clipping bound


def _ipw_oracle() -> str:
    parts = [
        f"feats AS ({_CAUSAL_FEATS_SQL})",
        "pfeats AS (SELECT t AS y, x1, x2 FROM feats)",
    ]
    parts.extend(_newton_chain("pr_", "pfeats"))
    bf = f"pr_b{LR_ROUNDS}"
    parts.append(
        f"""wts AS (
    SELECT t, outcome,
        LEAST(GREATEST(
            1 / (1 + EXP(-(b.b0 + b.b1 * x1 + b.b2 * x2))),
            {IPW_CLIP}), {1 - IPW_CLIP}) AS e
    FROM feats CROSS JOIN {bf} b)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT ROUND(AVG(CASE WHEN t = 1.0 THEN outcome END)
        - AVG(CASE WHEN t = 0.0 THEN outcome END), 6) AS ate_naive,
    ROUND(SUM(t * outcome / e) / SUM(t / e)
        - SUM((1 - t) * outcome / (1 - e)) / SUM((1 - t) / (1 - e)), 6)
        AS ate_ipw,
    ROUND(AVG(e), 6) AS mean_propensity,
    CAST(COUNT(*) AS BIGINT) AS n_users
FROM wts"""
    )


@query("q_propensity_ipw", oracle=_ipw_oracle())
def q_propensity_ipw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted ATE of the variant on per-user
    purchase value: fit the propensity e(x) = P(T=1 | activity
    features) with the shared Newton chain, clip to
    [{IPW_CLIP}, {1 - IPW_CLIP}], and compare the naive difference of
    means against the Hajek (self-normalized) IPW estimator — the
    observational-causal-inference workhorse for when assignment is NOT
    randomized. On this fixture assignment IS the user-parity split, so
    propensities sit near 0.5 and the two estimates agree — the
    machinery (model -> clip -> normalized reweighting) is what is
    under test, plus its differential in tests/test_mlkit.py.

    Scale: one user-grain groupBy, {LR_ROUNDS} sufficient-statistic
    passes for the propensity model, one weighted readout pass."""
    feats = _causal_feats(spark, sf_dir)
    beta = logreg_newton(feats.select(F.col("t").alias("y"), "x1", "x2"))
    z = (
        F.lit(beta[0])
        + F.lit(beta[1]) * F.col("x1")
        + F.lit(beta[2]) * F.col("x2")
    )
    e = F.least(
        F.greatest(1 / (1 + F.exp(-z)), F.lit(IPW_CLIP)),
        F.lit(1 - IPW_CLIP),
    )
    wts = feats.select("t", "outcome", e.alias("e"))
    t, o, ecol = F.col("t"), F.col("outcome"), F.col("e")
    return wts.agg(
        F.round(
            F.avg(F.when(t == 1.0, o)) - F.avg(F.when(t == 0.0, o)), 6
        ).alias("ate_naive"),
        F.round(
            F.sum(t * o / ecol) / F.sum(t / ecol)
            - F.sum((1 - t) * o / (1 - ecol)) / F.sum((1 - t) / (1 - ecol)),
            6,
        ).alias("ate_ipw"),
        F.round(F.avg(ecol), 6).alias("mean_propensity"),
        F.count("*").cast("bigint").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Elastic net: coordinate descent entirely on sufficient statistics

EN_L1 = 8.0
EN_L2 = 1.0
EN_SWEEPS = 5

_EN_SUMS_SQL = """
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        SUM(x1) AS s1, SUM(x2) AS s2, SUM(x3) AS s3,
        SUM(x1 * x1) AS s11, SUM(x2 * x2) AS s22, SUM(x3 * x3) AS s33,
        SUM(x1 * x2) AS s12, SUM(x1 * x3) AS s13, SUM(x2 * x3) AS s23,
        SUM(y) AS sy, SUM(y * y) AS syy,
        SUM(y * x1) AS sy1, SUM(y * x2) AS sy2, SUM(y * x3) AS sy3
"""


def _g(j: int, k: int) -> str:
    lo, hi = sorted((j, k))
    return f"g{lo}{hi}"


def _en_oracle() -> str:
    feats = f"""
    SELECT SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS y,
        LN(1 + SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)) AS x1,
        COALESCE(AVG(CASE WHEN event_type = 'view' THEN value END), 0.0)
            AS x2,
        LN(1 + SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)) AS x3
    FROM events GROUP BY user_id
"""
    std_cols = ["n"]
    for j in range(1, 4):
        std_cols.append(f"s{j} / n AS m{j}")
        std_cols.append(f"SQRT(s{j}{j} / n - (s{j} / n) * (s{j} / n)) AS sd{j}")
    std_cols.append("sy / n AS my")
    std_cols.append("SQRT(syy / n - (sy / n) * (sy / n)) AS sdy")
    std = f"std0 AS (SELECT {', '.join(std_cols)}, s11, s22, s33, s12, s13,"
    std += " s23, sy1, sy2, sy3, syy FROM sums)"
    gcols = []
    for j in range(1, 4):
        for k in range(j, 4):
            gcols.append(
                f"(s{min(j, k)}{max(j, k)} - n * m{j} * m{k})"
                f" / (sd{j} * sd{k}) AS {_g(j, k)}"
            )
        gcols.append(f"(sy{j} - n * m{j} * my) / (sd{j} * sdy) AS r{j}")
    gcols.append("(syy - n * my * my) / (sdy * sdy) AS szz")
    parts = [
        f"feats AS ({feats})",
        f"sums AS ({_EN_SUMS_SQL} FROM feats)",
        std,
        f"std AS (SELECT {', '.join(gcols)} FROM std0)",
        "cd0_3 AS (SELECT 0.0 b1, 0.0 b2, 0.0 b3)",
    ]
    prev = "cd0_3"
    for s in range(1, EN_SWEEPS + 1):
        for j in range(1, 4):
            name = f"cd{s}_{j}"
            others = " + ".join(
                f"std.{_g(j, k)} * {prev}.b{k}" for k in range(1, 4) if k != j
            )
            rho = f"(std.r{j} - ({others}))"
            newb = (
                f"SIGN({rho}) * GREATEST(ABS({rho}) - {EN_L1!r}, 0)"
                f" / (std.{_g(j, j)} + {EN_L2!r})"
            )
            bs = ", ".join(
                (f"{newb} AS b{k}" if k == j else f"{prev}.b{k} AS b{k}")
                for k in range(1, 4)
            )
            parts.append(f"{name} AS (SELECT {bs} FROM {prev} CROSS JOIN std)")
            prev = name
    sse = (
        "std.szz"
        + "".join(f" - 2 * f.b{j} * std.r{j}" for j in range(1, 4))
        + "".join(
            f" + f.b{j} * f.b{k} * std.{_g(j, k)}"
            + ("" if j == k else f" + f.b{k} * f.b{j} * std.{_g(j, k)}")
            for j in range(1, 4)
            for k in range(j, 4)
        )
    )
    parts.append(
        f"""fit AS (
    SELECT f.b1, f.b2, f.b3,
        1 - ({sse}) / std.szz AS r2,
        CAST((CASE WHEN f.b1 <> 0 THEN 1 ELSE 0 END)
           + (CASE WHEN f.b2 <> 0 THEN 1 ELSE 0 END)
           + (CASE WHEN f.b3 <> 0 THEN 1 ELSE 0 END) AS DOUBLE) AS nnz
    FROM {prev} f CROSS JOIN std)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT param, ROUND(value, 6) + 0.0 AS value FROM (
    SELECT 'beta1' AS param, b1 AS value FROM fit
    UNION ALL SELECT 'beta2', b2 FROM fit
    UNION ALL SELECT 'beta3', b3 FROM fit
    UNION ALL SELECT 'r2', r2 FROM fit
    UNION ALL SELECT 'n_nonzero', nnz FROM fit
)"""
    )


@query("q_elastic_net", oracle=_en_oracle())
def q_elastic_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elastic-net linear regression (L1 = {EN_L1}, L2 = {EN_L2}) of
    standardized per-user purchase value on three standardized activity
    features, by cyclic coordinate descent with the soft-threshold
    update — the sparse-regression workhorse, and the demonstration
    that CD needs NO per-sweep data pass: the whole optimization runs
    on the 15 sufficient statistics (Gram matrix + moments) from ONE
    corpus pass, with standardization applied ANALYTICALLY to the
    moments rather than to rows. On this fixture the features are
    nearly independent of the outcome, so the L1 penalty zeroes the two
    weakest and keeps only the strongest (the correct lasso behavior,
    asserted in tests). The fourth distinct trainer family under the
    exact hash gate (argmin assignment / Newton solve / boosting argmax
    / proximal coordinate descent).

    Scale: one user-grain groupBy, one 15-double reduce; everything
    after is engine-mirrored scalar arithmetic ({EN_SWEEPS} sweeps x 3
    soft-threshold updates)."""
    import math

    ev = load_table(spark, sf_dir, "events")
    feats = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("y"),
        F.log(
            1 + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        ).alias("x1"),
        F.coalesce(
            F.avg(F.when(F.col("event_type") == "view", F.col("value"))),
            F.lit(0.0),
        ).alias("x2"),
        F.log(
            1 + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        ).alias("x3"),
    )
    x1, x2, x3, y = (F.col(c) for c in ("x1", "x2", "x3", "y"))
    r = feats.agg(
        F.count("*").cast("double"),
        F.sum(x1), F.sum(x2), F.sum(x3),
        F.sum(x1 * x1), F.sum(x2 * x2), F.sum(x3 * x3),
        F.sum(x1 * x2), F.sum(x1 * x3), F.sum(x2 * x3),
        F.sum(y), F.sum(y * y),
        F.sum(y * x1), F.sum(y * x2), F.sum(y * x3),
    ).first()
    (n, s1, s2, s3, s11, s22, s33, s12, s13, s23,
     sy, syy, sy1, sy2, sy3) = r
    m = {1: s1 / n, 2: s2 / n, 3: s3 / n}
    sraw = {(1, 1): s11, (2, 2): s22, (3, 3): s33,
            (1, 2): s12, (1, 3): s13, (2, 3): s23}
    sd = {j: math.sqrt(sraw[(j, j)] / n - m[j] * m[j]) for j in (1, 2, 3)}
    my = sy / n
    sdy = math.sqrt(syy / n - my * my)
    syj = {1: sy1, 2: sy2, 3: sy3}
    G = {}
    R = {}
    for j in (1, 2, 3):
        for k in (j, 2, 3):
            if k < j:
                continue
            G[(j, k)] = (sraw[(j, k)] - n * m[j] * m[k]) / (sd[j] * sd[k])
        R[j] = (syj[j] - n * m[j] * my) / (sd[j] * sdy)
    szz = (syy - n * my * my) / (sdy * sdy)

    def g(j, k):
        return G[(min(j, k), max(j, k))]

    b = {1: 0.0, 2: 0.0, 3: 0.0}
    for _ in range(EN_SWEEPS):
        for j in (1, 2, 3):
            rho = R[j] - sum(g(j, k) * b[k] for k in (1, 2, 3) if k != j)
            b[j] = (
                math.copysign(1.0, rho)
                * max(abs(rho) - EN_L1, 0.0)
                / (g(j, j) + EN_L2)
            )
    sse = szz - sum(2 * b[j] * R[j] for j in (1, 2, 3)) + sum(
        b[j] * b[k] * g(j, k) for j in (1, 2, 3) for k in (1, 2, 3)
    )
    rows = [
        ("beta1", b[1]),
        ("beta2", b[2]),
        ("beta3", b[3]),
        ("r2", 1 - sse / szz),
        ("n_nonzero", float(sum(1 for j in (1, 2, 3) if b[j] != 0.0))),
    ]
    out = spark.createDataFrame(rows, "param string, value double")
    return out.select("param", (F.round("value", 6) + 0.0).alias("value"))


# ---------------------------------------------------------------------------
# Gaussian mixture via EM: the fifth trainer family under the gate

GMM_ROUNDS = 3


def _gmm_init_sql() -> str:
    """Deterministic init: component means at the exact 25th/75th
    order statistics (ties broken by event_id), shared sigma = the
    population sd, equal priors."""
    return """
init AS (
    SELECT
        MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN x END) AS mu1,
        MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN x END) AS mu2,
        SQRT(AVG(x * x) - AVG(x) * AVG(x)) AS s,
        0.5 AS pi1
    FROM (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x, event_id) AS rn,
            COUNT(*) OVER () AS n
        FROM pts
    )
),
g0 AS (SELECT mu1, s AS s1, mu2, s AS s2, pi1 FROM init)"""


def _gmm_round_sql(k: int) -> str:
    prev = f"g{k - 1}"
    return f"""e{k} AS (
    SELECT x,
        1 / (1 + EXP(
            (-0.5 * ((x - p.mu2) / p.s2) * ((x - p.mu2) / p.s2)
                - LN(p.s2) + LN(1 - p.pi1))
            - (-0.5 * ((x - p.mu1) / p.s1) * ((x - p.mu1) / p.s1)
                - LN(p.s1) + LN(p.pi1)))) AS r1
    FROM pts CROSS JOIN {prev} p),
m{k} AS (
    SELECT SUM(r1) AS n1, SUM(r1 * x) AS sx1, SUM(r1 * x * x) AS sxx1,
        SUM(1 - r1) AS n2, SUM((1 - r1) * x) AS sx2,
        SUM((1 - r1) * x * x) AS sxx2,
        CAST(COUNT(*) AS DOUBLE) AS n
    FROM e{k}),
g{k} AS (
    SELECT sx1 / n1 AS mu1,
        SQRT(sxx1 / n1 - (sx1 / n1) * (sx1 / n1)) AS s1,
        sx2 / n2 AS mu2,
        SQRT(sxx2 / n2 - (sx2 / n2) * (sx2 / n2)) AS s2,
        n1 / n AS pi1
    FROM m{k})"""


def _gmm_oracle() -> str:
    parts = [
        "pts AS (SELECT value AS x, event_id FROM events)",
        _gmm_init_sql().strip().lstrip(),
    ]
    selects = [
        "SELECT 0 AS round, mu1, s1, mu2, s2, pi1 FROM g0"
    ]
    for k in range(1, GMM_ROUNDS + 1):
        parts.append(_gmm_round_sql(k))
        selects.append(
            f"SELECT {k} AS round, mu1, s1, mu2, s2, pi1 FROM g{k}"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT round, ROUND(mu1, 6) AS mu1, ROUND(s1, 6) AS sigma1,
    ROUND(mu2, 6) AS mu2, ROUND(s2, 6) AS sigma2,
    ROUND(pi1, 6) AS pi1
FROM ({" UNION ALL ".join(selects)})"""
    )


@query("q_gmm_em", oracle=_gmm_oracle())
def q_gmm_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component 1-D Gaussian mixture fit by {GMM_ROUNDS} EM rounds
    on the event value distribution — the FIFTH distinct trainer family
    under the exact hash gate (argmin / Newton / boosting / coordinate
    descent / expectation-maximization). Deterministic init (means at
    the exact 25th/75th order statistics, shared population sd, equal
    priors); each E-step is a closed-form logistic responsibility
    folded into the row expression with the previous round's parameters
    as LITERALS, each M-step one 7-double reduce.

    Scale: the init order statistics are one rank window; each EM round
    is one whole-stage-codegen pass + scalar driver math — the classic
    mixture fit with zero joins and zero driver-side data."""
    import math

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(F.col("value").alias("x"), "event_id").localCheckpoint()
    wrank = Window.orderBy("x", "event_id")
    ranked = pts.select(
        "x",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    init = ranked.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.25 * F.col("n")).cast("bigint"),
                F.col("x"),
            )
        ).alias("mu1"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.75 * F.col("n")).cast("bigint"),
                F.col("x"),
            )
        ).alias("mu2"),
        F.sqrt(
            F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")
        ).alias("s"),
    ).first()
    mu1, mu2, s1 = init.mu1, init.mu2, init.s
    s2, pi1 = s1, 0.5
    rows = [(0, mu1, s1, mu2, s2, pi1)]
    for k in range(1, GMM_ROUNDS + 1):
        x = F.col("x")
        lp1 = (
            -0.5 * ((x - mu1) / s1) * ((x - mu1) / s1)
            - math.log(s1)
            + math.log(pi1)
        )
        lp2 = (
            -0.5 * ((x - mu2) / s2) * ((x - mu2) / s2)
            - math.log(s2)
            + math.log(1 - pi1)
        )
        r1 = 1 / (1 + F.exp(lp2 - lp1))
        m = pts.agg(
            F.sum(r1),
            F.sum(r1 * x),
            F.sum(r1 * x * x),
            F.sum(1 - r1),
            F.sum((1 - r1) * x),
            F.sum((1 - r1) * x * x),
            F.count("*").cast("double"),
        ).first()
        n1, sx1, sxx1, n2, sx2, sxx2, n = m
        mu1 = sx1 / n1
        s1 = math.sqrt(sxx1 / n1 - mu1 * mu1)
        mu2 = sx2 / n2
        s2 = math.sqrt(sxx2 / n2 - mu2 * mu2)
        pi1 = n1 / n
        rows.append((k, mu1, s1, mu2, s2, pi1))
    out = spark.createDataFrame(
        rows,
        "round int, mu1 double, s1 double, mu2 double, s2 double, pi1 double",
    )
    return out.select(
        "round",
        F.round("mu1", 6).alias("mu1"),
        F.round("s1", 6).alias("sigma1"),
        F.round("mu2", 6).alias("mu2"),
        F.round("s2", 6).alias("sigma2"),
        F.round("pi1", 6).alias("pi1"),
    )


# ---------------------------------------------------------------------------
# ALS matrix factorization: the sixth trainer family under the gate

ALS_ROUNDS = 3
ALS_LAMBDA = 0.1
ALS_TOPK = 10

_ALS_RATINGS_SQL = """
    SELECT o_custkey AS u, l_partkey AS i,
        LN(1 + COUNT(*)) AS r
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
"""


def _als_oracle() -> str:
    parts = [
        f"ratings AS ({_ALS_RATINGS_SQL})",
        "v0 AS (SELECT DISTINCT i, 1.0 AS v FROM ratings)",
    ]
    selects = []
    for k in range(1, ALS_ROUNDS + 1):
        pv = f"v{k - 1}"
        parts.append(
            f"""u{k} AS (
    SELECT u, SUM(r * v) / (SUM(v * v) + {ALS_LAMBDA!r}) AS uf
    FROM ratings JOIN {pv} USING (i) GROUP BY u)"""
        )
        parts.append(
            f"""v{k} AS (
    SELECT i, SUM(r * uf) / (SUM(uf * uf) + {ALS_LAMBDA!r}) AS v
    FROM ratings JOIN u{k} USING (u) GROUP BY i)"""
        )
        parts.append(
            f"""rmse{k} AS (
    SELECT SQRT(AVG((r - uf * v) * (r - uf * v))) AS rmse
    FROM ratings JOIN u{k} USING (u) JOIN v{k} USING (i))"""
        )
        selects.append(
            f"SELECT 'round_{k}_rmse' AS param,"
            f" ROUND(rmse, 6) AS value FROM rmse{k}"
        )
    vf = f"v{ALS_ROUNDS}"
    selects.append(
        f"""SELECT 'item_' || CAST(i AS VARCHAR) AS param,
    ROUND(v, 6) AS value
FROM (
    SELECT i, v, ROW_NUMBER() OVER (ORDER BY ROUND(v, 6) DESC, i) AS rn
    FROM {vf}
) WHERE rn <= {ALS_TOPK}"""
    )
    return "WITH " + ",\n".join(parts) + "\n" + " UNION ALL ".join(selects)


@query("q_als_factorization", oracle=_als_oracle())
def q_als_factorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 alternating-least-squares matrix factorization of the
    customer x part implicit-rating matrix (ln(1 + purchase count)) —
    the SIXTH trainer family under the exact hash gate, and the first
    whose per-round state is a DISTRIBUTED VECTOR (per-user and
    per-item factors), not driver scalars: each half-round is the
    closed-form ridge solve u_i = sum(r v) / (sum(v^2) + lambda)
    as ONE co-partitioned join + groupBy, exactly how large-scale ALS
    recommenders iterate (Koren et al.; Spark MLlib's own ALS shape).
    Output: per-round train RMSE and the top-{ALS_TOPK} item factors
    (ranked on the 6-dp-rounded factor so float sum-order noise cannot
    reorder the tail).

    Scale: factors are (id, double) rows; each half-round shuffles only
    the rating keys; nothing ever reaches the driver but the RMSE
    scalars."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    ratings = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .agg(F.log(1 + F.count("*")).alias("r"))
        .localCheckpoint()
    )
    v = ratings.select("i").distinct().select("i", F.lit(1.0).alias("v"))
    rows = []
    for k in range(1, ALS_ROUNDS + 1):
        u = (
            ratings.join(v, "i")
            .groupBy("u")
            .agg(
                (
                    F.sum(F.col("r") * F.col("v"))
                    / (F.sum(F.col("v") * F.col("v")) + ALS_LAMBDA)
                ).alias("uf")
            )
        )
        v = (
            ratings.join(u, "u")
            .groupBy("i")
            .agg(
                (
                    F.sum(F.col("r") * F.col("uf"))
                    / (F.sum(F.col("uf") * F.col("uf")) + ALS_LAMBDA)
                ).alias("v")
            )
            .localCheckpoint(eager=False)
        )
        rmse = (
            ratings.join(u, "u")
            .join(v, "i")
            .agg(
                F.sqrt(
                    F.avg(
                        (F.col("r") - F.col("uf") * F.col("v"))
                        * (F.col("r") - F.col("uf") * F.col("v"))
                    )
                ).alias("rmse")
            )
            .first()[0]
        )
        rows.append((f"round_{k}_rmse", float(rmse)))
    spark2 = ratings.sparkSession
    metrics = spark2.createDataFrame(rows, "param string, value double").select(
        "param", F.round("value", 6).alias("value")
    )
    wtop = Window.orderBy(F.desc(F.round("v", 6)), F.asc("i"))
    top = (
        v.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= ALS_TOPK)
        .select(
            F.concat(F.lit("item_"), F.col("i").cast("string")).alias("param"),
            F.round("v", 6).alias("value"),
        )
    )
    return metrics.unionAll(top)


# ---------------------------------------------------------------------------
# Rocchio tf-idf centroid classifier

_ROCCHIO_SQL = f"""
WITH toks AS (
    SELECT doc_id, source, w FROM (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ) WHERE w <> ''
),
train AS (SELECT * FROM toks WHERE doc_id % {NB_TEST_MOD} <> 0),
ndocs AS (
    SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM train
),
idf AS (
    SELECT w, LN(n / COUNT(DISTINCT doc_id)) AS idf
    FROM train CROSS JOIN ndocs GROUP BY w, n
),
cls AS (
    SELECT source, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_c
    FROM train GROUP BY 1
),
train_tfidf AS (
    SELECT t.doc_id, MIN(t.source) AS source, t.w,
        COUNT(*) * MIN(idf.idf) AS tfidf
    FROM train t JOIN idf USING (w) GROUP BY t.doc_id, t.w
),
train_norm AS (
    SELECT doc_id, SQRT(SUM(tfidf * tfidf)) AS nrm
    FROM train_tfidf GROUP BY 1
),
centroid AS (
    SELECT tt.source, tt.w, SUM(tt.tfidf / tn.nrm) / MIN(c.n_c) AS cw
    FROM train_tfidf tt
    JOIN train_norm tn USING (doc_id)
    JOIN cls c USING (source)
    GROUP BY tt.source, tt.w
),
cnorm AS (
    SELECT source, SQRT(SUM(cw * cw)) AS cn FROM centroid GROUP BY 1
),
test_tfidf AS (
    SELECT t.doc_id, MIN(t.source) AS actual, t.w,
        COUNT(*) * MIN(idf.idf) AS tfidf
    FROM toks t JOIN idf USING (w)
    WHERE t.doc_id % {NB_TEST_MOD} = 0
    GROUP BY t.doc_id, t.w
),
test_norm AS (
    SELECT doc_id, SQRT(SUM(tfidf * tfidf)) AS nrm
    FROM test_tfidf GROUP BY 1
),
scored AS (
    SELECT te.doc_id, te.actual, ce.source,
        ROUND(SUM((te.tfidf / tn.nrm) * ce.cw) / MIN(cn.cn), 6) AS score
    FROM test_tfidf te
    JOIN test_norm tn USING (doc_id)
    JOIN centroid ce USING (w)
    JOIN cnorm cn ON cn.source = ce.source
    GROUP BY te.doc_id, te.actual, ce.source
)
SELECT doc_id, actual, source AS predicted, score,
    CAST(source = actual AS INTEGER) AS correct
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, source) AS rn
    FROM scored
) WHERE rn = 1"""


@query("q_rocchio_classifier", oracle=_ROCCHIO_SQL)
def q_rocchio_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio nearest-centroid text classification: L2-normalized
    tf-idf document vectors, per-class mean vector (over ALL class
    docs, absent words contributing 0), held-out docs assigned to the
    highest-cosine centroid — the vector-space twin of q_naive_bayes'
    generative scorer (same fold split, same rounded-argmax
    determinism discipline), and the classifier q_tfidf's weighting
    feeds in a retrieval-style pipeline.

    Scale: idf and centroids are |V| / |V| x C rollups (broadcast-
    sized for bounded vocabularies); scoring joins test term vectors
    against the centroid grid on the token key — the corpus never
    self-joins."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
    )
    train = toks.filter(F.col("doc_id") % NB_TEST_MOD != 0)
    ndocs = train.agg(
        F.countDistinct("doc_id").cast("double").alias("n")
    )
    idf = (
        train.crossJoin(F.broadcast(ndocs))
        .groupBy("w", "n")
        .agg(F.countDistinct("doc_id").alias("df"))
        .select("w", F.log(F.col("n") / F.col("df")).alias("idf"))
    )
    cls = train.groupBy("source").agg(
        F.countDistinct("doc_id").cast("double").alias("n_c")
    )
    train_tfidf = (
        train.join(F.broadcast(idf), "w")
        .groupBy("doc_id", "w")
        .agg(
            F.min("source").alias("source"),
            (F.count("*") * F.min("idf")).alias("tfidf"),
        )
    )
    train_norm = train_tfidf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("nrm")
    )
    centroid = (
        train_tfidf.join(train_norm, "doc_id")
        .join(F.broadcast(cls), "source")
        .groupBy("source", "w")
        .agg(
            (F.sum(F.col("tfidf") / F.col("nrm")) / F.min("n_c")).alias("cw")
        )
    )
    cnorm = centroid.groupBy("source").agg(
        F.sqrt(F.sum(F.col("cw") * F.col("cw"))).alias("cn")
    )
    test_tfidf = (
        toks.filter(F.col("doc_id") % NB_TEST_MOD == 0)
        .join(F.broadcast(idf), "w")
        .groupBy("doc_id", "w")
        .agg(
            F.min("source").alias("actual"),
            (F.count("*") * F.min("idf")).alias("tfidf"),
        )
    )
    test_norm = test_tfidf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("nrm")
    )
    scored = (
        test_tfidf.join(test_norm, "doc_id")
        .join(F.broadcast(centroid), "w")
        .join(F.broadcast(cnorm), "source")
        .groupBy("doc_id", "actual", "source")
        .agg(
            F.round(
                F.sum((F.col("tfidf") / F.col("nrm")) * F.col("cw"))
                / F.min("cn"),
                6,
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("source"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "actual",
            F.col("source").alias("predicted"),
            "score",
            (F.col("source") == F.col("actual")).cast("int").alias("correct"),
        )
    )


# ---------------------------------------------------------------------------
# Robust regression: Huber IRLS + RANSAC

HUBER_DELTA = 3.0  # above the ~0.97 clean residual sd; outliers sit at +30
HUBER_INJECT = 30.0  # injected shift on corrupted rows
HUBER_ROUNDS = 4
HUBER_CORRUPT = 89  # orderkey % -> +5.0 outlier injection

_HUBER_FEATS_SQL = f"""
    SELECT LN(o_totalprice)
        + CASE WHEN o_orderkey % {HUBER_CORRUPT} = 0 THEN {HUBER_INJECT}
            ELSE 0.0 END AS y,
        DATE_DIFF('day', DATE '1995-01-01',
            CAST(o_orderdate AS DATE)) / 1000.0 AS x2,
        CAST(o_orderkey % 7 AS DOUBLE) / 7.0 AS x1
    FROM orders
"""

_HUBER_SUMS_SQL = """SELECT
    SUM(hw) AS sw,
    SUM(hw * x1) AS swx1,
    SUM(hw * x2) AS swx2,
    SUM(hw * x1 * x1) AS sw11,
    SUM(hw * x1 * x2) AS sw12,
    SUM(hw * x2 * x2) AS sw22,
    SUM(hw * y) AS g0,
    SUM(hw * y * x1) AS g1,
    SUM(hw * y * x2) AS g2"""


def _huber_oracle() -> str:
    """Unrolled Huber IRLS: round 0 is plain ridge OLS (unit weights);
    each later round solves the weighted normal equations with w =
    min(1, delta/|r|) computed from the previous betas. NOTE the solve
    here is the direct weighted-OLS solve (beta = H^-1 X'Wy), not a
    Newton STEP, so the zero-beta CTE feeds every round."""
    zero = "zb AS (SELECT 0.0 b0, 0.0 b1, 0.0 b2)"
    parts = [f"feats AS ({_HUBER_FEATS_SQL})", zero]
    prev = None
    for k in range(HUBER_ROUNDS + 1):
        wdef = (
            "1.0"
            if k == 0
            else (
                f"LEAST(1.0, {HUBER_DELTA!r} / GREATEST(ABS(y - ({prev}.b0"
                f" + {prev}.b1 * x1 + {prev}.b2 * x2)), 1e-12))"
            )
        )
        src = "feats" if k == 0 else f"feats CROSS JOIN {prev}"
        parts.append(
            f"hw{k} AS (SELECT y, x1, x2, {wdef} AS hw FROM {src})"
        )
        parts.append(f"hs{k} AS ({_HUBER_SUMS_SQL} FROM hw{k})")
        e0, e1, e2 = _solve_sql("zb", f"hs{k}")
        parts.append(
            f"hb{k} AS (SELECT {e0} AS b0, {e1} AS b1, {e2} AS b2"
            f" FROM hs{k} CROSS JOIN zb)"
        )
        prev = f"hb{k}"
    parts.append(
        f"""hdown AS (
    SELECT CAST(SUM(CASE WHEN hw < 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
        AS n_down
    FROM hw{HUBER_ROUNDS})"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT param, ROUND(value, 6) AS value FROM (
    SELECT 'ols_beta0' AS param, b0 AS value FROM hb0
    UNION ALL SELECT 'ols_beta1', b1 FROM hb0
    UNION ALL SELECT 'ols_beta2', b2 FROM hb0
    UNION ALL SELECT 'huber_beta0', b0 FROM {prev}
    UNION ALL SELECT 'huber_beta1', b1 FROM {prev}
    UNION ALL SELECT 'huber_beta2', b2 FROM {prev}
    UNION ALL SELECT 'n_downweighted', n_down FROM hdown
)"""
    )


@query("q_huber_regression", oracle=_huber_oracle())
def q_huber_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber robust regression by IRLS on DELIBERATELY CORRUPTED data
    (every {HUBER_CORRUPT}-th order's log-total shifted +{HUBER_INJECT} — the
    q_dq_violations injection pattern): round 0 is plain ridge OLS,
    then {HUBER_ROUNDS} reweighted solves with w = min(1, delta/|r|),
    so the output exposes BOTH fits — the OLS intercept dragged up by
    the outliers and the Huber intercept shrugging them off (asserted
    in tests) — plus how many rows the final weights downweight
    (~1/{HUBER_CORRUPT} of the corpus). Same 9-sum Cramer machinery as
    the whole GLM family; the weight column is the only change.

    Scale: per round one codegen pass + 9-double reduce; weights are
    row expressions with the previous betas folded in as literals."""
    orders = load_table(spark, sf_dir, "orders")
    feats = orders.select(
        (
            F.log("o_totalprice")
            + F.when(
                F.col("o_orderkey") % HUBER_CORRUPT == 0, HUBER_INJECT
            ).otherwise(0.0)
        ).alias("y"),
        ((F.col("o_orderkey") % 7).cast("double") / 7.0).alias("x1"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit(LR_EPOCH))
            / LR_X2_SCALE
        ).alias("x2"),
    ).localCheckpoint()

    def _wols(beta_prev):
        if beta_prev is None:
            hw = F.lit(1.0)
        else:
            r = F.col("y") - (
                F.lit(beta_prev[0])
                + F.lit(beta_prev[1]) * F.col("x1")
                + F.lit(beta_prev[2]) * F.col("x2")
            )
            hw = F.least(
                F.lit(1.0),
                HUBER_DELTA / F.greatest(F.abs(r), F.lit(1e-12)),
            )
        s = feats.agg(
            F.sum(hw),
            F.sum(hw * F.col("x1")),
            F.sum(hw * F.col("x2")),
            F.sum(hw * F.col("x1") * F.col("x1")),
            F.sum(hw * F.col("x1") * F.col("x2")),
            F.sum(hw * F.col("x2") * F.col("x2")),
            F.sum(hw * F.col("y")),
            F.sum(hw * F.col("y") * F.col("x1")),
            F.sum(hw * F.col("y") * F.col("x2")),
        ).first()
        return _solve_py((0.0, 0.0, 0.0), tuple(s)), hw

    ols, _ = _wols(None)
    beta = ols
    hw = None
    for _ in range(HUBER_ROUNDS):
        beta, hw = _wols(beta)
    n_down = feats.select(hw.alias("hw")).filter(F.col("hw") < 1.0).count()
    rows = [
        ("ols_beta0", ols[0]),
        ("ols_beta1", ols[1]),
        ("ols_beta2", ols[2]),
        ("huber_beta0", beta[0]),
        ("huber_beta1", beta[1]),
        ("huber_beta2", beta[2]),
        ("n_downweighted", float(n_down)),
    ]
    out = spark.createDataFrame(rows, "param string, value double")
    return out.select("param", F.round("value", 6).alias("value"))


RANSAC_TRIALS = 16
RANSAC_EPS_FRAC = 0.12  # inlier threshold as a fraction of mean |y|
RANSAC_CORRUPT = 7  # day-of-month % 7 == 3 -> y * 3 spike injection


def _ransac_oracle() -> str:
    return f"""
WITH daily AS (
    SELECT ROW_NUMBER() OVER (ORDER BY dd) AS rn,
        CAST(DATE_DIFF('day', DATE '2024-01-01', dd) AS DOUBLE) AS x,
        y * CASE WHEN dayofmonth(dd) % {RANSAC_CORRUPT} = 3
            THEN 3.0 ELSE 1.0 END AS y
    FROM (
        SELECT CAST(ts AS DATE) AS dd, SUM(value) AS y
        FROM events GROUP BY 1
    )
),
nn AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
        {RANSAC_EPS_FRAC} * AVG(ABS(y)) AS eps
    FROM daily
),
trials AS (
    SELECT CAST(t.t AS INTEGER) AS trial,
        1 + ('0x' || substr(md5(CAST(t.t AS VARCHAR) || '#1'), 1, 8))::BIGINT
            % nn.n AS j1,
        1 + (('0x' || substr(md5(CAST(t.t AS VARCHAR) || '#1'), 1, 8))::BIGINT
            % nn.n
            + 1
            + ('0x' || substr(md5(CAST(t.t AS VARCHAR) || '#2'), 1, 8))::BIGINT
              % (nn.n - 1)) % nn.n AS j2
    FROM range({RANSAC_TRIALS}) t(t) CROSS JOIN nn
),
lines AS (
    SELECT tr.trial,
        (b.y - a.y) / (b.x - a.x) AS slope,
        a.y - (b.y - a.y) / (b.x - a.x) * a.x AS intercept
    FROM trials tr
    JOIN daily a ON a.rn = tr.j1
    JOIN daily b ON b.rn = tr.j2
),
scored AS (
    SELECT l.trial, l.slope, l.intercept,
        CAST(SUM(CASE WHEN ABS(d.y - (l.intercept + l.slope * d.x))
            <= nn.eps THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
    FROM lines l CROSS JOIN daily d CROSS JOIN nn
    GROUP BY 1, 2, 3
),
best AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY n_inliers DESC, trial) AS rk
        FROM scored
    ) WHERE rk = 1
),
refit AS (
    SELECT
        (SUM(d.x * d.y) - SUM(d.x) * SUM(d.y) / COUNT(*))
            / (SUM(d.x * d.x) - SUM(d.x) * SUM(d.x) / COUNT(*)) AS rslope,
        SUM(d.y) / COUNT(*)
            - (SUM(d.x * d.y) - SUM(d.x) * SUM(d.y) / COUNT(*))
              / (SUM(d.x * d.x) - SUM(d.x) * SUM(d.x) / COUNT(*))
              * SUM(d.x) / COUNT(*) AS rintercept,
        CAST(COUNT(*) AS BIGINT) AS n_used
    FROM daily d CROSS JOIN best b CROSS JOIN nn
    WHERE ABS(d.y - (b.intercept + b.slope * d.x)) <= nn.eps
)
SELECT b.trial AS best_trial, b.n_inliers,
    ROUND(b.slope, 6) AS slope, ROUND(b.intercept, 6) AS intercept,
    r.n_used,
    ROUND(r.rslope, 6) AS refit_slope,
    ROUND(r.rintercept, 6) AS refit_intercept
FROM best b CROSS JOIN refit r"""


@query("q_ransac_line", oracle=_ransac_oracle())
def q_ransac_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC line fit of the daily revenue series with deterministic
    spike injection (every {RANSAC_CORRUPT}-aligned day tripled):
    {RANSAC_TRIALS} md5-seeded trials each fit an exact line through 2
    sampled days, count inliers within {RANSAC_EPS_FRAC} x mean |y|,
    and the consensus winner is refit by OLS on its inliers — the
    robust-estimation counterpoint to q_huber_regression (hard
    rejection vs soft downweighting) with reproducible "randomness"
    (the repo's md5 sampling discipline, so both engines draw identical
    trials). The spiked days land outside every consensus set.

    Scale: the corpus reduces to the daily rollup; trials x days is a
    {RANSAC_TRIALS} x |days| broadcast grid, and the refit is one
    closed-form 1-D OLS over the inlier rollup rows."""
    ev = load_table(spark, sf_dir, "events")
    daily0 = ev.groupBy(F.to_date("ts").alias("dd")).agg(
        F.sum("value").alias("y0")
    )
    wday = Window.orderBy("dd")
    daily = daily0.select(
        F.row_number().over(wday).alias("rn"),
        F.datediff("dd", F.lit("2024-01-01")).cast("double").alias("x"),
        (
            F.col("y0")
            * F.when(
                F.dayofmonth("dd") % RANSAC_CORRUPT == 3, 3.0
            ).otherwise(1.0)
        ).alias("y"),
    ).localCheckpoint()
    nn = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        (RANSAC_EPS_FRAC * F.avg(F.abs(F.col("y")))).alias("eps"),
    )
    trials = spark.range(RANSAC_TRIALS).select(
        F.col("id").cast("int").alias("trial")
    )
    h1 = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("trial").cast("string"), F.lit("#1"))), 1, 8),
            16,
            10,
        ).cast("bigint")
    )
    h2 = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("trial").cast("string"), F.lit("#2"))), 1, 8),
            16,
            10,
        ).cast("bigint")
    )
    tr = trials.crossJoin(F.broadcast(nn)).select(
        "trial",
        (1 + h1 % F.col("n")).alias("j1"),
        (1 + (h1 % F.col("n") + 1 + h2 % (F.col("n") - 1)) % F.col("n")).alias(
            "j2"
        ),
    )
    a = daily.select(
        F.col("rn").alias("j1"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("rn").alias("j2"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    slope = (F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))
    lines = (
        tr.join(F.broadcast(a), "j1")
        .join(F.broadcast(b), "j2")
        .select(
            "trial",
            slope.alias("slope"),
            (F.col("ya") - slope * F.col("xa")).alias("intercept"),
        )
    )
    resid_ok = (
        F.abs(F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x")))
        <= F.col("eps")
    )
    scored = (
        lines.crossJoin(daily)
        .crossJoin(F.broadcast(nn))
        .groupBy("trial", "slope", "intercept")
        .agg(
            F.sum(F.when(resid_ok, 1).otherwise(0))
            .cast("bigint")
            .alias("n_inliers")
        )
    )
    wbest = Window.orderBy(F.desc("n_inliers"), F.asc("trial"))
    best = (
        scored.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    inl = (
        daily.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(nn))
        .filter(resid_ok)
    )
    x, y = F.col("x"), F.col("y")
    refit = inl.agg(
        (
            (F.sum(x * y) - F.sum(x) * F.sum(y) / F.count("*"))
            / (F.sum(x * x) - F.sum(x) * F.sum(x) / F.count("*"))
        ).alias("rslope"),
        F.sum(y).alias("_sy"),
        F.sum(x).alias("_sx"),
        F.count("*").cast("bigint").alias("n_used"),
        (F.sum(x * y) - F.sum(x) * F.sum(y) / F.count("*")).alias("_num"),
        (F.sum(x * x) - F.sum(x) * F.sum(x) / F.count("*")).alias("_den"),
    ).select(
        "rslope",
        (
            F.col("_sy") / F.col("n_used")
            - F.col("_num") / F.col("_den") * F.col("_sx") / F.col("n_used")
        ).alias("rintercept"),
        "n_used",
    )
    return (
        best.crossJoin(F.broadcast(refit))
        .select(
            F.col("trial").alias("best_trial"),
            "n_inliers",
            F.round("slope", 6).alias("slope"),
            F.round("intercept", 6).alias("intercept"),
            "n_used",
            F.round("rslope", 6).alias("refit_slope"),
            F.round("rintercept", 6).alias("refit_intercept"),
        )
    )


# ---------------------------------------------------------------------------
# Regression diagnostics: leverage + Cook's distance

COOK_TOPK = 10


def _inv_terms(s: str) -> dict:
    """Adjugate/det entries of the ridge Hessian of sums CTE `s` — the
    structural mirror of _solve_py's _inv_terms_py."""
    L = f"{LR_RIDGE!r}"
    a11, a12, a13 = f"({s}.sw + {L})", f"{s}.swx1", f"{s}.swx2"
    a22, a23, a33 = f"({s}.sw11 + {L})", f"{s}.sw12", f"({s}.sw22 + {L})"
    det = (
        f"({a11} * ({a22} * {a33} - {a23} * {a23})"
        f" - {a12} * ({a12} * {a33} - {a23} * {a13})"
        f" + {a13} * ({a12} * {a23} - {a22} * {a13}))"
    )
    return {
        "i11": f"(({a22} * {a33} - {a23} * {a23}) / {det})",
        "i12": f"((-({a12} * {a33} - {a23} * {a13})) / {det})",
        "i13": f"(({a12} * {a23} - {a22} * {a13}) / {det})",
        "i22": f"(({a11} * {a33} - {a13} * {a13}) / {det})",
        "i23": f"((-({a11} * {a23} - {a12} * {a13})) / {det})",
        "i33": f"(({a11} * {a22} - {a12} * {a12}) / {det})",
    }


def _inv_terms_py(s):
    L = LR_RIDGE
    sw, swx1, swx2, sw11, sw12, sw22 = s
    a11, a12, a13 = sw + L, swx1, swx2
    a22, a23, a33 = sw11 + L, sw12, sw22 + L
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    return {
        "i11": (a22 * a33 - a23 * a23) / det,
        "i12": (-(a12 * a33 - a23 * a13)) / det,
        "i13": (a12 * a23 - a22 * a13) / det,
        "i22": (a11 * a33 - a13 * a13) / det,
        "i23": (-(a11 * a23 - a12 * a13)) / det,
        "i33": (a11 * a22 - a12 * a12) / det,
    }


def _diag_oracle() -> str:
    zero = "zb AS (SELECT 0.0 b0, 0.0 b1, 0.0 b2)"
    e0, e1, e2 = _solve_sql("zb", "s")
    inv = _inv_terms("s")
    hexpr = (
        f"({inv['i11']} + 2 * {inv['i12']} * x1 + 2 * {inv['i13']} * x2"
        f" + {inv['i22']} * x1 * x1 + 2 * {inv['i23']} * x1 * x2"
        f" + {inv['i33']} * x2 * x2)"
    )
    feats = _OLS_FEATS_SQL.replace(
        "SELECT LN(o.o_totalprice) AS y,",
        "SELECT o.o_orderkey, LN(o.o_totalprice) AS y,",
    )
    return f"""WITH feats AS ({feats}),
{zero},
s AS ({_OLS_SUMS_SQL.replace("SELECT", "SELECT ", 1)} FROM feats),
beta AS (SELECT {e0} AS b0, {e1} AS b1, {e2} AS b2 FROM s CROSS JOIN zb),
scored AS (
    SELECT f.o_orderkey,
        f.y - (beta.b0 + beta.b1 * f.x1 + beta.b2 * f.x2) AS resid,
        {hexpr} AS lev
    FROM feats f CROSS JOIN beta CROSS JOIN s
),
sig AS (
    SELECT SUM(resid * resid) / (COUNT(*) - 3) AS s2,
        CAST(COUNT(*) AS BIGINT) AS n
    FROM scored
)
SELECT o_orderkey, ROUND(resid, 6) AS resid, ROUND(lev, 6) AS leverage,
    ROUND(cookd, 6) AS cooks_d, CAST(rn AS BIGINT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY ROUND(cookd, 9) DESC, o_orderkey) AS rn
    FROM (
        SELECT o_orderkey, resid, lev,
            resid * resid * lev
                / (3 * sig.s2 * (1 - lev) * (1 - lev)) AS cookd
        FROM scored CROSS JOIN sig
    )
) WHERE rn <= {COOK_TOPK}"""


@query("q_ols_diagnostics", oracle=_diag_oracle())
def q_ols_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression influence diagnostics for the ridge OLS fit: per-row
    leverage h_i = x_i' (X'X + lambda I)^-1 x_i evaluated as a SIX-
    COEFFICIENT quadratic form (the 3x3 inverse folds into literals —
    no per-row matrix math, no n x n hat matrix, ever), Cook's distance
    r_i^2 h_i / (p s^2 (1 - h_i)^2), and the top-{COOK_TOPK} most
    influential orders — the "which rows move my model" audit that
    should precede any refit, ranked on the 9-dp-rounded statistic with
    an id tie-break.

    Scale: one sufficient-statistic pass, driver inversion of a 3x3,
    one codegen scoring pass, one top-k rank. The hat matrix diagonal
    at 100 TB is exactly this: a quadratic form, not a matrix."""
    orders = load_table(spark, sf_dir, "orders")
    counts = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_items"))
    )
    feats = (
        orders.join(counts, orders.o_orderkey == counts.l_orderkey)
        .select(
            "o_orderkey",
            F.log("o_totalprice").alias("y"),
            F.col("n_items").cast("double").alias("x1"),
            (
                F.datediff(F.col("o_orderdate").cast("date"), F.lit(LR_EPOCH))
                / LR_X2_SCALE
            ).alias("x2"),
        )
        .localCheckpoint()
    )
    srow = feats.agg(
        F.sum(F.lit(1.0)),
        F.sum("x1"),
        F.sum("x2"),
        F.sum(F.col("x1") * F.col("x1")),
        F.sum(F.col("x1") * F.col("x2")),
        F.sum(F.col("x2") * F.col("x2")),
        F.sum("y"),
        F.sum(F.col("y") * F.col("x1")),
        F.sum(F.col("y") * F.col("x2")),
    ).first()
    beta = _solve_py((0.0, 0.0, 0.0), tuple(srow))
    inv = _inv_terms_py(tuple(srow)[:6])
    x1, x2 = F.col("x1"), F.col("x2")
    lev = (
        F.lit(inv["i11"])
        + 2 * F.lit(inv["i12"]) * x1
        + 2 * F.lit(inv["i13"]) * x2
        + F.lit(inv["i22"]) * x1 * x1
        + 2 * F.lit(inv["i23"]) * x1 * x2
        + F.lit(inv["i33"]) * x2 * x2
    )
    resid = F.col("y") - (
        F.lit(beta[0]) + F.lit(beta[1]) * x1 + F.lit(beta[2]) * x2
    )
    scored = feats.select(
        "o_orderkey", resid.alias("resid"), lev.alias("lev")
    ).localCheckpoint(eager=False)
    sig = scored.agg(
        (F.sum(F.col("resid") * F.col("resid")) / (F.count("*") - 3)).alias(
            "s2"
        )
    )
    cookd = (
        F.col("resid")
        * F.col("resid")
        * F.col("lev")
        / (3 * F.col("s2") * (1 - F.col("lev")) * (1 - F.col("lev")))
    )
    w = Window.orderBy(F.desc(F.round(cookd, 9)), F.asc("o_orderkey"))
    return (
        scored.crossJoin(F.broadcast(sig))
        .withColumn("cookd", cookd)
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= COOK_TOPK)
        .select(
            "o_orderkey",
            F.round("resid", 6).alias("resid"),
            F.round("lev", 6).alias("leverage"),
            F.round("cookd", 6).alias("cooks_d"),
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# Partial dependence of the logistic model

PDP_POINTS = 9


def _pdp_oracle() -> str:
    parts = [f"feats AS ({_FEATS_SQL})"]
    parts.extend(_newton_chain("pd_", "feats"))
    bf = f"pd_b{LR_ROUNDS}"
    parts.append(
        """mm AS (
    SELECT MIN(x1) AS mn1, MAX(x1) AS mx1,
        MIN(x2) AS mn2, MAX(x2) AS mx2
    FROM feats)"""
    )
    parts.append(
        f"""grid AS (
    SELECT 'x1' AS feature, CAST(g.k AS INTEGER) AS grid_idx,
        mm.mn1 + g.k * (mm.mx1 - mm.mn1) / {PDP_POINTS - 1} AS gval
    FROM range({PDP_POINTS}) g(k) CROSS JOIN mm
    UNION ALL
    SELECT 'x2', CAST(g.k AS INTEGER),
        mm.mn2 + g.k * (mm.mx2 - mm.mn2) / {PDP_POINTS - 1}
    FROM range({PDP_POINTS}) g(k) CROSS JOIN mm)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT g.feature, g.grid_idx, ROUND(g.gval, 6) AS grid_value,
    ROUND(AVG(CASE WHEN g.feature = 'x1'
        THEN 1 / (1 + EXP(-(b.b0 + b.b1 * g.gval + b.b2 * f.x2)))
        ELSE 1 / (1 + EXP(-(b.b0 + b.b1 * f.x1 + b.b2 * g.gval)))
    END), 6) AS pdp
FROM grid g CROSS JOIN feats f CROSS JOIN {bf} b
GROUP BY 1, 2, 3"""
    )


@query("q_partial_dependence", oracle=_pdp_oracle())
def q_partial_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-dependence curves of the Newton logistic model: for each
    feature, a {PDP_POINTS}-point grid from its min to max, PDP(g) =
    the average predicted probability when THAT feature is clamped to g
    for every row (the other feature keeps its observed values) — the
    model-explainability readout that completes the trio with
    q_feature_ablation (importance) and q_shapley_attribution
    (additive credit).

    Scale: the grid x corpus product is a {2 * PDP_POINTS}-row
    broadcast against one codegen pass; the averaging is map-side
    partial aggregation per grid point."""
    feats = logreg_feats(spark, sf_dir).localCheckpoint()
    beta = logreg_newton(feats)
    mm = feats.agg(
        F.min("x1").alias("mn1"),
        F.max("x1").alias("mx1"),
        F.min("x2").alias("mn2"),
        F.max("x2").alias("mx2"),
    )
    spark2 = feats.sparkSession
    ks = spark2.range(PDP_POINTS).select(F.col("id").cast("int").alias("k"))
    grid = (
        ks.crossJoin(F.broadcast(mm))
        .select(
            F.lit("x1").alias("feature"),
            F.col("k").alias("grid_idx"),
            (
                F.col("mn1")
                + F.col("k") * (F.col("mx1") - F.col("mn1")) / (PDP_POINTS - 1)
            ).alias("gval"),
        )
        .unionAll(
            ks.crossJoin(F.broadcast(mm)).select(
                F.lit("x2").alias("feature"),
                F.col("k").alias("grid_idx"),
                (
                    F.col("mn2")
                    + F.col("k")
                    * (F.col("mx2") - F.col("mn2"))
                    / (PDP_POINTS - 1)
                ).alias("gval"),
            )
        )
    )
    z = F.when(
        F.col("feature") == "x1",
        F.lit(beta[0])
        + F.lit(beta[1]) * F.col("gval")
        + F.lit(beta[2]) * F.col("x2"),
    ).otherwise(
        F.lit(beta[0])
        + F.lit(beta[1]) * F.col("x1")
        + F.lit(beta[2]) * F.col("gval")
    )
    return (
        F.broadcast(grid)
        .crossJoin(feats)
        .groupBy(
            "feature", "grid_idx", F.round("gval", 6).alias("grid_value")
        )
        .agg(F.round(F.avg(1 / (1 + F.exp(-z))), 6).alias("pdp"))
    )


FAIR_SCORE_CUT = 0.2  # fixed decision threshold on the score
FAIR_EVENT_CUT = 60  # integer activity split (the q_logrank_test arm)
FAIR_CONV_VALUE = 150.0


@query(
    "q_fairness_audit",
    oracle=f"""
WITH per_user AS MATERIALIZED (
    SELECT user_id,
        SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0
            / COUNT(*) AS score,
        MAX(CASE WHEN event_type = 'purchase' AND value >= {FAIR_CONV_VALUE}
            THEN 1 ELSE 0 END) AS y,
        CASE WHEN COUNT(*) > {FAIR_EVENT_CUT} THEN 'high_activity'
             ELSE 'low_activity' END AS grp
    FROM events GROUP BY user_id
), scored AS MATERIALIZED (
    SELECT grp, y,
        CASE WHEN score >= {FAIR_SCORE_CUT} THEN 1 ELSE 0 END AS yhat
    FROM per_user
), per_group AS MATERIALIZED (
    SELECT grp,
        CAST(COUNT(*) AS BIGINT) AS n,
        ROUND(AVG(yhat), 6) AS positive_rate,
        ROUND(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END) * 1.0
            / NULLIF(SUM(y), 0), 6) AS tpr,
        ROUND(SUM(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END) * 1.0
            / NULLIF(SUM(1 - y), 0), 6) AS fpr
    FROM scored GROUP BY grp
)
SELECT grp, n, positive_rate, tpr, fpr,
    ROUND(positive_rate / NULLIF(MAX(positive_rate) OVER (), 0), 6)
        AS disparate_impact,
    ROUND(tpr - MAX(tpr) OVER (), 6) AS tpr_gap,
    ROUND(fpr - MAX(fpr) OVER (), 6) AS fpr_gap
FROM per_group""",
)
def q_fairness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of a thresholded scorer (error-ratio score
    >= {FAIR_SCORE_CUT} predicting high-value conversion, groups = the
    integer activity split): per group the selection rate, TPR and FPR,
    plus the three standard readouts — disparate impact (selection
    rate / best group's rate; the 80% rule reads this column),
    equal-opportunity gap (TPR - best TPR) and equalized-odds FPR gap.
    The audit every production scorer needs BEFORE it gates real
    users; model-agnostic — swap the score column for any model
    output.

    Scale: one user-grain conditional-agg pass to (group, y, yhat),
    one tiny group rollup, and windows over |groups| rows."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            * 1.0
            / F.count("*")
        ).alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= FAIR_CONV_VALUE),
                1,
            ).otherwise(0)
        ).alias("y"),
        F.when(F.count("*") > FAIR_EVENT_CUT, "high_activity")
        .otherwise("low_activity")
        .alias("grp"),
    )
    scored = per_user.select(
        "grp",
        "y",
        F.when(F.col("score") >= FAIR_SCORE_CUT, 1).otherwise(0).alias(
            "yhat"
        ),
    )
    per_group = scored.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("yhat"), 6).alias("positive_rate"),
        F.round(
            F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 1), 1).otherwise(0))
            * 1.0
            / F.nullif(F.sum("y"), F.lit(0)),
            6,
        ).alias("tpr"),
        F.round(
            F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 1), 1).otherwise(0))
            * 1.0
            / F.nullif(F.sum(1 - F.col("y")), F.lit(0)),
            6,
        ).alias("fpr"),
    )
    wall = Window.partitionBy()
    return per_group.select(
        "grp",
        "n",
        "positive_rate",
        "tpr",
        "fpr",
        F.round(
            F.col("positive_rate")
            / F.nullif(F.max("positive_rate").over(wall), F.lit(0.0)),
            6,
        ).alias("disparate_impact"),
        F.round(F.col("tpr") - F.max("tpr").over(wall), 6).alias("tpr_gap"),
        F.round(F.col("fpr") - F.max("fpr").over(wall), 6).alias("fpr_gap"),
    )
