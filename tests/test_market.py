"""Third-implementation differentials + plan pins for the market-basket
family: the DuckDB oracles prove cross-engine consistency; these re-derive
supports, rule statistics, and the capped-basket CF neighbors in pure
Python (hashlib md5 for the cap order) so a formula wrong the same way in
both SQL dialects still fails."""

from __future__ import annotations

import hashlib
import itertools
from collections import Counter, defaultdict

from .conftest import SF_ORACLE


def _baskets():
    from .oracle_utils import duckdb_df

    df = duckdb_df(
        """
        SELECT DISTINCT o_custkey AS bid, l_partkey AS item
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        """,
        SF_ORACLE,
    )
    baskets = defaultdict(set)
    for bid, item in zip(df["bid"], df["item"]):
        baskets[int(bid)].add(int(item))
    return baskets


def _pair_counts(baskets):
    pairs = Counter()
    for items in baskets.values():
        for a, b in itertools.combinations(sorted(items), 2):
            pairs[(a, b)] += 1
    return pairs


def test_itemset_pairs_match_pure_python(spark):
    from aram_matchdata_etl_spark.operators.market import MIN_SUP
    from aram_matchdata_etl_spark.registry import all_queries

    baskets = _baskets()
    pairs = _pair_counts(baskets)
    want = {k: c for k, c in pairs.items() if c >= MIN_SUP}
    got = {
        (r.item_a, r.item_b): (r.pair_count, r.support)
        for r in all_queries()["q_itemset_pairs"](spark, SF_ORACLE).collect()
    }
    assert set(got) == set(want)
    n = len(baskets)
    for k, (cnt, sup) in got.items():
        assert cnt == want[k]
        assert abs(sup - cnt / n) < 1e-6


def test_assoc_rules_match_pure_python(spark):
    from aram_matchdata_etl_spark.operators.market import MIN_CONF, MIN_SUP
    from aram_matchdata_etl_spark.registry import all_queries

    baskets = _baskets()
    pairs = _pair_counts(baskets)
    item_n = Counter()
    for items in baskets.values():
        item_n.update(items)
    n = len(baskets)
    want = {}
    for (a, b), c in pairs.items():
        if c < MIN_SUP:
            continue
        for ante, cons in ((a, b), (b, a)):
            conf = c / item_n[ante]
            if conf >= MIN_CONF:
                want[(ante, cons)] = (c, conf, c * n / (item_n[ante] * item_n[cons]))
    got = {
        (r.antecedent, r.consequent): (r.pair_count, r.confidence, r.lift)
        for r in all_queries()["q_assoc_rules"](spark, SF_ORACLE).collect()
    }
    assert set(got) == set(want)
    for k, (cnt, conf, lift) in got.items():
        wc, wconf, wlift = want[k]
        assert cnt == wc
        assert abs(conf - wconf) < 1e-6
        assert abs(lift - wlift) < 1e-6
        assert lift > 1.0  # supported+confident pairs on this fixture associate


def test_item_cf_matches_pure_python(spark):
    from aram_matchdata_etl_spark.operators.market import (
        CF_CAP,
        CF_MIN_CO,
        CF_TOPK,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    baskets = _baskets()
    capped = {
        bid: set(
            sorted(
                items,
                key=lambda it: hashlib.md5(
                    f"{bid}#{it}".encode()
                ).hexdigest(),
            )[:CF_CAP]
        )
        for bid, items in baskets.items()
    }
    co = _pair_counts(capped)
    item_n = Counter()
    for items in capped.values():
        item_n.update(items)
    nbrs = defaultdict(list)
    for (a, b), c in co.items():
        if c < CF_MIN_CO:
            continue
        cos = c / (item_n[a] * item_n[b]) ** 0.5
        nbrs[a].append((-cos, b, c))
        nbrs[b].append((-cos, a, c))
    want = {}
    for item, cands in nbrs.items():
        for rank, (negcos, nbr, c) in enumerate(sorted(cands)[:CF_TOPK], 1):
            want[(item, rank)] = (nbr, c, -negcos)
    got = {
        (r.item, r.nbr_rank): (r.neighbor, r.co_count, r.cosine)
        for r in all_queries()["q_item_cf"](spark, SF_ORACLE).collect()
    }
    assert set(got) == set(want)
    for k, (nbr, c, cos) in got.items():
        wn, wc, wcos = want[k]
        assert (nbr, c) == (wn, wc)
        assert abs(cos - wcos) < 1e-6


def test_market_plans(spark):
    """Plan pins: the item-count dimensions broadcast (never sort-merge),
    and the within-basket self-join is the only sort-merge exchange
    pattern allowed — no cartesian product anywhere in the family."""
    from aram_matchdata_etl_spark.registry import all_queries

    for name in ("q_assoc_rules", "q_item_cf"):
        df = all_queries()[name](spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan, name
