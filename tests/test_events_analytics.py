"""Invariant tests for the events-analytics family (funnel, retention,
gap-fill) and the PII scrubber — properties the DuckDB oracles can't
express (monotonicity, contiguity, idempotence) plus plan-shape checks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from aram_matchdata_etl_spark.operators.events_analytics import funnel
from aram_matchdata_etl_spark.operators.privacy import pii_redact
from aram_matchdata_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_funnel_counts_monotone_nonincreasing(spark):
    rows = funnel(load_table(spark, SF, "events")).orderBy("stage_no").collect()
    assert [r["stage"] for r in rows] == ["view", "click", "purchase"]
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0]["conversion"] == 1.0
    assert all(0.0 <= r["conversion"] <= 1.0 for r in rows)


def test_funnel_single_user_exchange_no_join(spark):
    """The window-cascade funnel must not degrade into self-joins: one
    hashpartitioning(user_id) exchange feeds every stage window."""
    plan = funnel(load_table(spark, SF, "events"))._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("hashpartitioning(user_id") == 1


def test_funnel_strict_ordering_semantics(spark):
    """A user whose only click precedes every view must not convert."""
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "click", 0.0, "{}"),
            (2, "2024-01-01 01:00:00", 10, "view", 0.0, "{}"),
            (3, "2024-01-01 00:00:00", 20, "view", 0.0, "{}"),
            (4, "2024-01-01 01:00:00", 20, "click", 0.0, "{}"),
            (5, "2024-01-01 02:00:00", 20, "purchase", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {r["stage"]: r["n_users"] for r in funnel(ev).collect()}
    assert rows == {"view": 2, "click": 1, "purchase": 1}


def test_retention_day_zero_equals_cohort_size(spark):
    """Every cohort is fully retained at offset 0, and no offset exceeds
    its cohort's day-0 count."""
    from aram_matchdata_etl_spark.operators.events_analytics import (
        q_retention_cohorts,
    )

    pdf = q_retention_cohorts(spark, SF).toPandas()
    day0 = pdf[pdf.day_offset == 0].set_index("cohort_day").n_users
    for cohort, grp in pdf.groupby("cohort_day"):
        assert (grp.n_users <= day0[cohort]).all()
        assert (grp.day_offset >= 0).all()


def test_gap_fill_contiguous_and_zero_filled(spark):
    from aram_matchdata_etl_spark.operators.events_analytics import q_gap_fill

    pdf = q_gap_fill(spark, SF).toPandas().sort_values(["user_id", "day"])
    for _, grp in pdf.groupby("user_id"):
        deltas = grp.day.diff().dropna().dt.days
        assert (deltas == 1).all(), "calendar must be gapless per user"
        # forward fill: once a value is seen it never goes null again
        assert not grp.filled_value.isna().iloc[0]
        seen = grp.filled_value.notna().cummax()
        assert (grp.filled_value.notna() | ~seen).all()
    # gap rows exist in the fixture and carry n_events == 0
    assert (pdf.n_events == 0).any() or len(pdf) == pdf.n_events.astype(bool).sum()


def test_pii_redact_unit(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@foo-bar.org or 555-1234"),
            (2, "server 192.168.0.1 logged 555-0000 twice: 555-0000"),
            (3, "clean text, no pii; 5551234 and 1.2.3 are not matches"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert "<EMAIL>" in out[1]["text_redacted"]
    assert "@" not in out[1]["text_redacted"]
    assert out[2]["n_ips"] == 1 and out[2]["n_phones"] == 2
    assert out[2]["text_redacted"].count("<PHONE>") == 2
    assert out[3]["n_emails"] == out[3]["n_phones"] == out[3]["n_ips"] == 0
    assert out[3]["text_redacted"] == out[3]["text"]


def test_pii_redact_idempotent(spark):
    """Redacting already-redacted text is a no-op — placeholders never
    re-match any pattern."""
    df = spark.createDataFrame(
        [(1, "x@y.com at 10.0.0.1 call 555-9999")], "doc_id long, text string"
    )
    once = pii_redact(df).select(
        F.col("doc_id"), F.col("text_redacted").alias("text")
    )
    twice = pii_redact(once).collect()[0]
    assert twice["text_redacted"] == twice["text"]
    assert twice["n_emails"] == twice["n_phones"] == twice["n_ips"] == 0


def test_anomaly_zscore_invariants(spark):
    """Injected spike is flagged; early events (thin baseline) never are."""
    rows = []
    for i in range(30):
        rows.append((i, f"2024-01-01 00:{i:02d}:00", 1, "view", 10.0 + (i % 3) * 0.5, "{}"))
    rows.append((99, "2024-01-01 00:59:00", 1, "view", 1000.0, "{}"))  # spike
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from aram_matchdata_etl_spark.operators.events_analytics import anomaly_zscore

    res = {r["event_id"]: r for r in anomaly_zscore(ev).collect()}
    assert res[99]["is_anomaly"] is True
    assert res[0]["zscore"] is None and res[0]["is_anomaly"] is False
    assert res[1]["zscore"] is None  # single prior row: stddev undefined
    normal = [res[i]["is_anomaly"] for i in range(5, 30)]
    assert not any(normal)


def test_fuzzy_match_blocking_and_symmetry(spark):
    """Blocked fuzzy matching: pairs only within a block, ordered, within
    the distance cap — and blocking loses nothing the cap would keep
    (on this fixture the block token differs => distance > cap)."""
    from aram_matchdata_etl_spark.operators.linkage import (
        MAX_EDIT_DISTANCE,
        q_fuzzy_match,
    )

    pdf = q_fuzzy_match(spark, SF).toPandas()
    assert len(pdf) > 0
    assert (pdf.dist <= MAX_EDIT_DISTANCE).all()
    assert (pdf.name_a < pdf.name_b).all()
    # same block == same last token
    assert all(
        a.split()[-1] == b.split()[-1] for a, b in zip(pdf.name_a, pdf.name_b)
    )


def test_retention_approx_agrees_with_exact(spark):
    """Sketch-swap agreement: every (cohort, offset) cell's HLL estimate
    within 15% of the exact distinct count (rsd 2% => far tighter in
    expectation; 15% caps tail risk on small cells)."""
    from aram_matchdata_etl_spark.operators.events_analytics import (
        q_retention_approx,
        q_retention_cohorts,
    )

    exact = q_retention_cohorts(spark, SF).toPandas().set_index(
        ["cohort_day", "day_offset"]
    )
    approx = q_retention_approx(spark, SF).toPandas().set_index(
        ["cohort_day", "day_offset"]
    )
    assert set(exact.index) == set(approx.index)
    joined = exact.join(approx)
    rel = (joined.n_users_approx - joined.n_users).abs() / joined.n_users
    assert rel.max() <= 0.15


def test_trending_decay_incremental_identity(spark):
    """The operator's incremental-maintenance claim, proven on the
    fixture: decayed mass over the full window == decayed mass of the
    old half re-decayed to the new anchor + the new half's mass."""
    import math

    from aram_matchdata_etl_spark.operators.events_analytics import (
        DECAY_TAU_HOURS,
    )
    from aram_matchdata_etl_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    split = "2024-01-15"
    tau_us = DECAY_TAU_HOURS * 3600.0 * 1_000_000

    def mass(df, anchor_us):
        rows = df.select(
            F.sum(
                F.col("value")
                * F.exp(-(F.lit(anchor_us) - F.unix_micros("ts")) / tau_us)
            ).alias("m")
        ).collect()
        return rows[0]["m"] or 0.0

    t_old = ev.filter(F.col("ts") < split)
    t_new = ev.filter(F.col("ts") >= split)
    anchor_old = t_old.agg(F.max(F.unix_micros("ts"))).first()[0]
    anchor_all = ev.agg(F.max(F.unix_micros("ts"))).first()[0]

    full = mass(ev, anchor_all)
    incr = mass(t_old, anchor_old) * math.exp(
        -(anchor_all - anchor_old) / tau_us
    ) + mass(t_new, anchor_all)
    assert abs(full - incr) / full < 1e-9


def test_ansi_degenerate_inputs_do_not_throw(spark):
    """ANSI mode throws on double division by zero; the stats operators
    must degrade to NULL on degenerate inputs (constant values, empty
    funnel head) instead of failing the job."""
    from aram_matchdata_etl_spark.operators.events_analytics import funnel

    # constant values in both variants -> se2 == 0 -> NULL t-stat
    const_ev = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", i % 4, "view", 5.0, "{}") for i in range(8)],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    const_ev.createOrReplaceTempView("_const_ev")
    import aram_matchdata_etl_spark.operators.stats as stats_mod

    variant = (F.col("user_id") % 2).cast("int")
    s = const_ev.select(variant.alias("variant"), "value").agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n0"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n1"),
        F.avg(F.when(F.col("variant") == 0, F.col("value"))).alias("mean0"),
        F.avg(F.when(F.col("variant") == 1, F.col("value"))).alias("mean1"),
        F.var_samp(F.when(F.col("variant") == 0, F.col("value"))).alias("v0"),
        F.var_samp(F.when(F.col("variant") == 1, F.col("value"))).alias("v1"),
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    row = s.select(
        F.when(se2 > 0, F.lit(1.0)).alias("guard_ok")
    ).collect()[0]
    assert row["guard_ok"] is None  # guard fires (se2 == 0 -> branch null)

    # funnel with no stage-1 users anywhere -> NULL conversions, no error
    no_view = const_ev.withColumn("event_type", F.lit("error"))
    rows = funnel(no_view).collect()
    assert [r["n_users"] for r in rows] == [0, 0, 0]
    assert all(r["conversion"] is None for r in rows)

    # flat z-score baseline (sigma == 0.0 exactly) -> NULL scores, no flags
    from aram_matchdata_etl_spark.operators.events_analytics import anomaly_zscore

    flat = anomaly_zscore(const_ev.filter(F.col("user_id") == 0)).collect()
    assert flat and all(r["zscore"] is None for r in flat)
    assert not any(r["is_anomaly"] for r in flat)


class TestEwmaLongSeries:
    """VERDICT r6 item 3: the chunked closed form must survive series far
    past the old single-chunk unroll's ~3.3k-row double-overflow cliff.
    10,500 days per event type = 10.5 chunks at C=1000, crossing ten
    chunk-boundary seed handoffs."""

    N_DAYS = 10_500

    @pytest.fixture(scope="class")
    def long_sf_dir(self, spark, tmp_path_factory):
        import os

        sf = tmp_path_factory.mktemp("ewma_long")
        # the oracle harness registers views for EVERY fixture table:
        # symlink the small-SF files and override only events
        for t in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "documents", "embeddings",
        ):
            os.symlink(f"{SF}/{t}.parquet", f"{sf}/{t}.parquet")
        import numpy as np
        import pandas as pd

        n = self.N_DAYS
        ids = np.arange(2 * n)
        # single parquet FILE (not a Spark part-file directory) so the
        # DuckDB side of the oracle harness reads the same path
        pd.DataFrame(
            {
                "event_id": ids,
                "ts": pd.to_datetime(946684800 + (ids % n) * 86400, unit="s"),
                "user_id": ids % 97,
                "event_type": np.where(ids < n, "view", "click"),
                "value": (ids * 7919 % 1000) / 7.0 + 50.0,
                "props": pd.Series([None] * (2 * n), dtype="object"),
            }
        ).to_parquet(f"{sf}/events.parquet", index=False)
        return str(sf)

    def test_oracle_parity_at_10k_rows(self, spark, long_sf_dir):
        from aram_matchdata_etl_spark.operators.events_analytics import q_ewma
        from aram_matchdata_etl_spark.registry import all_oracles

        from .oracle_utils import assert_matches_oracle

        df = q_ewma(spark, long_sf_dir)
        assert df.count() == 2 * self.N_DAYS
        assert_matches_oracle(
            df, all_oracles()["q_ewma"], long_sf_dir, "q_ewma@10k"
        )

    def test_matches_pandas_ewm(self, spark, long_sf_dir):
        """Third implementation: pandas ewm(adjust=False) runs the raw
        recursion with NO closed-form unroll — catches a chunking bug the
        two-dialect (same-formula) check cannot see."""
        from aram_matchdata_etl_spark.operators.events_analytics import (
            EWMA_ALPHA,
            q_ewma,
        )

        got = (
            q_ewma(spark, long_sf_dir)
            .toPandas()
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        for et, grp in got.groupby("event_type"):
            want = (
                grp["daily_mean"].ewm(alpha=EWMA_ALPHA, adjust=False).mean()
            )
            err = (grp["ewma"] - want).abs().max()
            assert err < 1e-5, (et, err)


class TestHoltLongSeries:
    """The Holt eigen-chunked closed form must survive multi-chunk series
    exactly like q_ewma's (same machinery, two eigen chains): 10,500 days
    = 10.5 chunks, ten seed handoffs per chain."""

    N_DAYS = 10_500

    @pytest.fixture(scope="class")
    def long_sf_dir(self, spark, tmp_path_factory):
        import os

        sf = tmp_path_factory.mktemp("holt_long")
        for t in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "documents", "embeddings",
        ):
            os.symlink(f"{SF}/{t}.parquet", f"{sf}/{t}.parquet")
        import numpy as np
        import pandas as pd

        n = self.N_DAYS
        ids = np.arange(2 * n)
        pd.DataFrame(
            {
                "event_id": ids,
                "ts": pd.to_datetime(946684800 + (ids % n) * 86400, unit="s"),
                "user_id": ids % 97,
                "event_type": np.where(ids < n, "view", "click"),
                # mild upward trend + arithmetic noise so the trend state
                # is non-trivial
                "value": (ids % n) * 0.01 + (ids * 7919 % 1000) / 7.0,
                "props": pd.Series([None] * (2 * n), dtype="object"),
            }
        ).to_parquet(f"{sf}/events.parquet", index=False)
        return str(sf)

    def test_oracle_parity_at_10k_rows(self, spark, long_sf_dir):
        from aram_matchdata_etl_spark.operators.events_analytics import (
            q_holt_linear,
        )
        from aram_matchdata_etl_spark.registry import all_oracles

        from .oracle_utils import assert_matches_oracle

        df = q_holt_linear(spark, long_sf_dir)
        assert df.count() == 2 * self.N_DAYS
        assert_matches_oracle(
            df, all_oracles()["q_holt_linear"], long_sf_dir, "q_holt_linear@10k"
        )

    def test_matches_raw_recursion(self, spark, long_sf_dir):
        """Third implementation: the textbook Holt loop with NO eigen
        decomposition and NO chunking — catches a diagonalization or
        seed-handoff bug the two-dialect (same-formula) check cannot."""
        from aram_matchdata_etl_spark.operators.events_analytics import (
            HOLT_ALPHA,
            HOLT_BETA,
            HOLT_H,
            q_holt_linear,
        )

        got = (
            q_holt_linear(spark, long_sf_dir)
            .toPandas()
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        for et, grp in got.groupby("event_type"):
            y = grp["daily_mean"].to_numpy()
            lv, tr = y[0], 0.0
            want_l, want_t = [lv], [tr]
            for x in y[1:]:
                prev = lv
                lv = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (lv + tr)
                tr = HOLT_BETA * (lv - prev) + (1 - HOLT_BETA) * tr
                want_l.append(lv)
                want_t.append(tr)
            import numpy as np

            el = np.abs(grp["level"].to_numpy() - np.array(want_l)).max()
            et_ = np.abs(grp["trend"].to_numpy() - np.array(want_t)).max()
            ef = np.abs(
                grp["forecast"].to_numpy()
                - (np.array(want_l) + HOLT_H * np.array(want_t))
            ).max()
            assert el < 1e-5 and et_ < 1e-5 and ef < 1e-5, (et, el, et_, ef)


def test_attribution_shapley_matches_pure_python_and_is_efficient(spark):
    """Third implementation: re-derive the coalition values and Shapley
    sums in pure Python from the raw events (independent journey build,
    itertools subsets, factorial weights) — catches a masking or weight
    bug the two-dialect (same-formula) oracle cannot."""
    import math
    from collections import defaultdict

    from aram_matchdata_etl_spark.operators.events_analytics import (
        ATTR_CHANNELS,
        ATTR_CONV_VALUE,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    from .conftest import SF_ORACLE
    from .oracle_utils import duckdb_df

    got = {
        r.channel: r.shapley_value
        for r in all_queries()["q_attribution_shapley"](
            spark, SF_ORACLE
        ).collect()
    }

    ev = duckdb_df(
        "SELECT user_id, ts, event_type, value FROM events", SF_ORACLE
    )
    bit = dict(ATTR_CHANNELS)
    k = len(ATTR_CHANNELS)
    t_conv = (
        ev[(ev.event_type == "purchase") & (ev.value >= ATTR_CONV_VALUE)]
        .groupby("user_id")["ts"]
        .min()
    )
    masks: dict[int, int] = defaultdict(int)
    converted: dict[int, int] = {}
    for r in ev.itertuples():
        tc = t_conv.get(r.user_id)
        if r.event_type == "purchase":
            continue
        if tc is not None and not (r.ts < tc):
            continue
        masks[r.user_id] |= bit.get(r.event_type, 0)
        converted[r.user_id] = 1 if tc is not None else 0
    # users whose every event is purchase-typed never enter exposure
    n_s = defaultdict(int)
    c_s = defaultdict(int)
    for u, m in masks.items():
        n_s[m] += 1
        c_s[m] += converted[u]

    def v(s: int) -> float:
        n = sum(nn for m, nn in n_s.items() if (m & s) == m)
        c = sum(cc for m, cc in c_s.items() if (m & s) == m)
        return c / n if n else 0.0

    full = (1 << k) - 1
    want = {}
    for name, b in ATTR_CHANNELS:
        tot = 0.0
        for s in range(1 << k):
            if s & b:
                continue
            size = bin(s).count("1")
            w = (
                math.factorial(size)
                * math.factorial(k - 1 - size)
                / math.factorial(k)
            )
            tot += w * (v(s | b) - v(s))
        want[name] = tot
    for name, _ in ATTR_CHANNELS:
        assert abs(got[name] - round(want[name], 6)) < 2e-6, (
            name,
            got[name],
            want[name],
        )
    # efficiency: Shapley values sum to v(all) - v(none)
    assert abs(sum(want.values()) - (v(full) - v(0))) < 1e-12


def test_markov_attribution_matches_numpy_matrix_powers(spark):
    """Third implementation: compute the finite-horizon conversion
    probability with numpy matrix algebra (x_K = sum_{{j<K}} Q^j r —
    matrix powers, not the operator's per-state dict recursion), and
    additionally assert the infinite-horizon linalg solve bounds it
    from above — verifies the transition build AND the horizon
    semantics independently of both SQL dialects."""
    from collections import defaultdict

    import numpy as np

    from aram_matchdata_etl_spark.operators.events_analytics import (
        _MA_CHANNELS,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    from .conftest import SF_ORACLE
    from .oracle_utils import duckdb_df

    got = {
        r.channel: (r.conv_prob_full, r.removal_effect, r.attribution_share)
        for r in all_queries()["q_markov_attribution"](
            spark, SF_ORACLE
        ).collect()
    }

    ev = duckdb_df(
        "SELECT user_id, ts, event_id, event_type FROM events "
        "ORDER BY user_id, ts, event_id",
        SF_ORACLE,
    )
    t_conv = (
        ev[ev.event_type == "purchase"].groupby("user_id")["ts"].min()
    )
    trans: dict[tuple[str, str], int] = defaultdict(int)
    for u, grp in ev.groupby("user_id", sort=False):
        tc = t_conv.get(u)
        states = [
            "conv" if r.event_type == "purchase" else r.event_type
            for r in grp.itertuples()
            if tc is None or r.ts <= tc
        ]
        prev = "start"
        for s in states:
            trans[(prev, s)] += 1
            prev = s
        if states and states[-1] != "conv":
            trans[(states[-1], "null")] += 1

    from aram_matchdata_etl_spark.operators.events_analytics import (
        MARKOV_ATTR_ROUNDS,
    )

    def conv_prob_horizon(removed):
        tr = defaultdict(int)
        for (f_s, t_s), n in trans.items():
            if removed is not None:
                if f_s == removed:
                    continue
                if t_s == removed:
                    t_s = "null"
            tr[(f_s, t_s)] += n
        transient = sorted({f_s for (f_s, _) in tr})
        idx = {s: i for i, s in enumerate(transient)}
        outs = defaultdict(int)
        for (f_s, _), n in tr.items():
            outs[f_s] += n
        q = np.zeros((len(transient), len(transient)))
        r = np.zeros(len(transient))
        for (f_s, t_s), n in tr.items():
            p = n / outs[f_s]
            if t_s == "conv":
                r[idx[f_s]] += p
            elif t_s in idx:
                q[idx[f_s], idx[t_s]] += p
        # x_K = (I + Q + ... + Q^{K-1}) r via explicit matrix powers
        acc = np.zeros_like(r)
        qpow = np.eye(len(transient))
        for _ in range(MARKOV_ATTR_ROUNDS):
            acc = acc + qpow @ r
            qpow = qpow @ q
        exact = np.linalg.solve(np.eye(len(transient)) - q, r)
        i0 = idx.get("start")
        if i0 is None:
            return 0.0, 0.0
        assert acc[i0] <= exact[i0] + 1e-12
        return acc[i0], exact[i0]

    cp_full, _ = conv_prob_horizon(None)
    effects = {
        ch: max(1 - conv_prob_horizon(ch)[0] / cp_full, 0.0)
        for ch in _MA_CHANNELS
    }
    tot = sum(effects.values())
    for ch in _MA_CHANNELS:
        g_cp, g_eff, g_share = got[ch]
        assert abs(g_cp - cp_full) < 1e-4, (ch, g_cp, cp_full)
        assert abs(g_eff - effects[ch]) < 1e-4
        assert abs(g_share - effects[ch] / tot) < 1e-4
    assert abs(sum(s for _, _, s in got.values()) - 1.0) < 5e-6


def test_croston_matches_raw_recursion(spark):
    """Third implementation: the textbook Croston update loop (two
    sequential EWMA recursions over the nonzero-demand subsequence, no
    closed form) in pure Python."""
    from aram_matchdata_etl_spark.operators.events_analytics import (
        CROSTON_ALPHA,
        CROSTON_VALUE,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    from .conftest import SF_ORACLE
    from .oracle_utils import duckdb_df

    got = {
        r.event_type: (r.n_demand_days, r.z_hat, r.q_hat, r.demand_rate)
        for r in all_queries()["q_croston"](spark, SF_ORACLE).collect()
    }
    daily = duckdb_df(
        f"""SELECT event_type, date_trunc('day', ts) AS day,
            COUNT(*) AS z FROM events
        WHERE value >= {CROSTON_VALUE} GROUP BY 1, 2 ORDER BY 1, 2""",
        SF_ORACLE,
    )
    a = CROSTON_ALPHA
    for et, g in daily.groupby("event_type"):
        days = list(g.day)
        zs = list(g.z)
        gaps = [1.0] + [
            (days[i] - days[i - 1]).days for i in range(1, len(days))
        ]
        zh, qh = float(zs[0]), float(gaps[0])
        for z, q in zip(zs[1:], gaps[1:]):
            zh = a * z + (1 - a) * zh
            qh = a * q + (1 - a) * qh
        m, gz, gq, rate = got[et]
        assert m == len(zs)
        assert abs(gz - zh) < 1e-5, (et, gz, zh)
        assert abs(gq - qh) < 1e-5, (et, gq, qh)
        assert abs(rate - zh / qh) < 1e-5


def test_holt_winters_fit_recovers_known_structure():
    """Exactness properties of the HW kernel on synthetic series:
    a constant series forecasts the constant; a pure linear trend
    forecasts the line; a zero-trend seasonal series reproduces the
    seasonal pattern."""
    import math

    from aram_matchdata_etl_spark.operators.events_analytics import (
        HW_H,
        HW_PERIOD,
        HW_TRAIN,
        holt_winters_fit,
    )

    const = [("c", t, 5.0) for t in range(HW_TRAIN)]
    for _, h, f, lv, tr in holt_winters_fit(const):
        assert abs(f - 5.0) < 1e-9 and abs(tr) < 1e-9

    linear = [("l", t, 2.0 + 0.5 * t) for t in range(HW_TRAIN)]
    for _, h, f, lv, tr in holt_winters_fit(linear):
        assert abs(f - (2.0 + 0.5 * (HW_TRAIN - 1 + h))) < 1e-9
        assert abs(tr - 0.5) < 1e-9

    pattern = [math.sin(2 * math.pi * i / HW_PERIOD) for i in range(HW_PERIOD)]
    seasonal = [("s", t, 10.0 + pattern[t % HW_PERIOD]) for t in range(HW_TRAIN)]
    got = holt_winters_fit(seasonal)
    assert len(got) == HW_H
    for _, h, f, lv, tr in got:
        assert abs(f - (10.0 + pattern[(HW_TRAIN + h - 1) % HW_PERIOD])) < 1e-9

    # short series (under two full seasons) are skipped, not mis-fit
    assert holt_winters_fit([("x", t, 1.0) for t in range(HW_PERIOD)]) == []
