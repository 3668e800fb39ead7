"""TPC-H completion batch (queries/tpch.py): plan-shape gates.

Correctness is held by the DuckDB oracle twins (tools/check_parity.py,
green at sf0.001 + sf0.01); these tests pin the SCALE-relevant plan
properties — the join strategies and pushdowns each shape exists to
exercise — so a regression is visible without re-running parity.
"""

from __future__ import annotations

from shmr_spark.queries import load_all


def _plan(spark, sf_dir, name: str) -> str:
    df = load_all()[name].fn(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def _tree(plan: str) -> str:
    return plan.split("\n\n")[0]


def _rows(spark, sf_dir, name: str):
    return load_all()[name].fn(spark, sf_dir).collect()


def test_q4_plans_semi_join_with_pushed_dates(spark, sf_dir):
    """EXISTS must become a semi join (orders never multiply), and the
    quarter predicate must reach the orders scan."""
    plan = _plan(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "o_orderdate" in pushed


def test_q7_broadcasts_fixed_dims_only(spark, sf_dir):
    """nation (25 rows at ANY SF) joins must be broadcast; the
    lineitem-orders fact join must not be a nested loop."""
    plan = _plan(spark, sf_dir, "q7_nation_volume")
    assert _tree(plan).count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q13_left_join_keeps_zero_order_customers(spark, sf_dir):
    """The priority predicate must live in the join, not drop
    customers: total customers across the distribution == table size."""
    rows = _rows(spark, sf_dir, "q13_customer_distribution")
    from shmr_spark.catalog import load_table

    n_cust = load_table(spark, sf_dir, "customer").count()
    # an inner join (or a WHERE'd predicate) would drop customers and
    # break this partition-of-the-table invariant
    assert sum(r.custdist for r in rows) == n_cust


def test_q15_max_filter_is_broadcast_not_window(spark, sf_dir):
    """The scalar max must come back as a broadcast join, never a
    window over an unpartitioned frame (single-task sort at scale)."""
    plan = _plan(spark, sf_dir, "q15_top_supplier")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_q16_not_in_is_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q16_supplier_part_variety")
    assert "LeftAnti" in plan


def test_q17_single_shuffle_serves_window(spark, sf_dir):
    """The correlated-average rewrite must shuffle lineitem by partkey
    once for the window — no second aggregation join of a separate
    per-part averages table."""
    plan = _plan(spark, sf_dir, "q17_small_quantity_revenue")
    assert "Window" in plan
    # one partkey exchange for the window + the final 1-row agg only
    assert _tree(plan).count("Exchange") <= 3


def test_q19_part_filter_pushed_before_join(spark, sf_dir):
    """The brand/size union-of-branches must reach the part scan —
    without it the OR is only evaluable post-join and part scans all
    rows."""
    plan = _plan(spark, sf_dir, "q19_disjunctive_revenue")
    pushed_sections = plan.split("PushedFilters:")
    assert any(
        "p_brand" in s.splitlines()[0] or "Or(" in s.splitlines()[0]
        for s in pushed_sections[1:]
    )
    assert "BroadcastHashJoin" in plan


def test_q21_top20_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q21_single_fault_suppliers")
    assert "TakeOrderedAndProject" in plan


def test_q21_sole_fault_semantics(spark, sf_dir):
    """Aggregate rewrite ≡ the EXISTS/NOT-EXISTS reading: every
    credited order has >1 suppliers and exactly one returned-supplier."""
    from pyspark.sql import functions as F

    from shmr_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    per_order = joined.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret"),
    )
    credited = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_ret") == 1)
    ).count()
    total = sum(
        r.numwait for r in _rows(spark, sf_dir, "q21_single_fault_suppliers")
    )
    # top-20 cut means total <= credited; equal when <=20 suppliers
    assert total <= credited


def test_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q22_dormant_customers")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q2_min_joinback_is_broadcast(spark, sf_dir):
    """The correlated per-part MIN must come back as a broadcast hash
    join (the per-part minimum relation is tiny after the part
    filter), never a cartesian/nested-loop pairing, and the partsupp
    proxy must aggregate before any dimension join multiplies rows."""
    plan = _plan(spark, sf_dir, "q2_min_cost_supplier")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q2_all_rows_achieve_their_parts_min(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q2_min_cost_supplier")
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, []).append(r.min_cost)
    for costs in by_part.values():
        assert len(set(costs)) == 1  # every returned supplier ties the min


def test_q11_scalar_rides_one_broadcast(spark, sf_dir):
    """The HAVING-vs-global-total threshold must be a 1-row broadcast
    (BroadcastNestedLoopJoin over a single-row frame is the expected
    physical form of the scalar cross join), not a Window over an
    unpartitioned frame and not a re-shuffle of the scope."""
    plan = _plan(spark, sf_dir, "q11_important_parts")
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q12_year_window_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q12_late_priority_mix")
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed
    rows = _rows(spark, sf_dir, "q12_late_priority_mix")
    assert {r.l_returnflag for r in rows} <= {"A", "N", "R"}


def test_q20_dominance_is_exact_integer_compare(spark, sf_dir):
    """2·qs > tqs must survive into the plan as an integer comparison
    (no doubles near the threshold) and the per-part totals join must
    broadcast."""
    plan = _plan(spark, sf_dir, "q20_dominant_promo_suppliers")
    assert "BroadcastHashJoin" in plan
    # dominance can credit at most one supplier per part
    rows = _rows(spark, sf_dir, "q20_dominant_promo_suppliers")
    assert all(r.n_parts_dominated >= 1 for r in rows)
