"""Physical-plan regressions for the adapted TPC-H suite: the properties
that make these queries survive a 100x scale-up (pushdown into the scan,
column pruning, broadcast dims, semi-join shapes, no nested-loop
fallbacks) asserted against `.explain` output."""

from __future__ import annotations

from .conftest import SF_ORACLE


def _plan(spark, name: str) -> str:
    from aram_matchdata_etl_spark.registry import all_queries

    df = all_queries()[name](spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark):
    """Q1: the shipdate cutoff reaches the parquet scan, and the scan
    reads only the 7 referenced lineitem columns (no keys)."""
    plan = _plan(spark, "q_tpch_q1")
    pushed = plan.split("PushedFilters:")[1][:200]
    assert "l_shipdate" in pushed
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_quantity" in read_schema and "l_tax" in read_schema
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema


def test_q1_single_exchange(spark):
    """Q1 is one partial+final hash aggregate: exactly one shuffle."""
    plan = _plan(spark, "q_tpch_q1")
    assert plan.count("Exchange") == 1, plan


def test_q6_no_join_no_shuffle_rows(spark):
    """Q6 is scan+filter+scalar-agg: no join operators at all, and every
    predicate (shipdate range, discount range, quantity) is pushed."""
    plan = _plan(spark, "q_tpch_q6")
    assert "Join" not in plan
    pushed = plan.split("PushedFilters:")[1][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)


def test_q3_take_ordered(spark):
    """Q3's top-10 must plan TakeOrderedAndProject (per-partition heaps),
    never a global sort of the aggregate output."""
    plan = _plan(spark, "q_tpch_q3")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # customer dim broadcast


def test_q4_exists_is_semi_join(spark):
    """Q4's EXISTS decorrelates to a left-semi join: lineitem probes,
    never multiplies rows."""
    plan = _plan(spark, "q_tpch_q4")
    assert "LeftSemi" in plan


def test_q9_selective_dim_broadcasts(spark):
    """Q9: the LIKE-filtered part table and the other dims broadcast; the
    LIKE pushes into the part scan as a StringContains filter."""
    plan = _plan(spark, "q_tpch_q9")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "StringContains(p_name,red)" in plan.replace(" ", "").replace(",red", ",red")


def test_q18_having_semi_join(spark):
    """Q18: the HAVING subquery feeds a semi join (broadcast at this
    scale); the big lineitem table is never joined to itself row-wise."""
    plan = _plan(spark, "q_tpch_q18")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q21_no_nested_loop(spark):
    """Q21's EXISTS/NOT-EXISTS pair is decorrelated into one per-order
    aggregate joined back — the plan must contain no nested-loop or
    cartesian fallback (the classic correlated-subquery trap)."""
    plan = _plan(spark, "q_tpch_q21")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scalar_subquery_broadcasts(spark):
    """Q11/Q15/Q22: the global-total scalar subqueries become 1-row
    broadcast joins, not collect()-and-re-plan round trips."""
    for name in ("q_tpch_q11", "q_tpch_q15", "q_tpch_q22"):
        plan = _plan(spark, name)
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
