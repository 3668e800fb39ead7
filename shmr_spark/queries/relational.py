"""Core relational queries — one per reference operator (SURVEY.md §2).

Each exercises the native Dataset tier; oracle twins are DuckDB SQL
over the same parquet views. Timestamp columns surface as DATE
(orders/lineitem are timestamp_ntz, timezone-free) or epoch-second
BIGINT (events) so value hashes match across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.dataset import Dataset
from shmr_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from shmr_spark.queries import query

# --------------------------------------------------------------------------
# reduce_by_key — flagship (TPC-H Q1 shape): scan → filter → project →
# partial agg → exchange → final agg. The reference needs 3 CLI passes +
# xargs for this (SURVEY.md §3); here it is one logical plan.
# --------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("reduce_by_key_q1", oracle=_Q1_ORACLE, headline=True)
def reduce_by_key_q1(spark, sf_dir):
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .reduce_by_key(
            ["l_returnflag", "l_linestatus"],
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        # 6 groups max (flag × status domain) at any SF: bounded sort
        .sort_small("l_returnflag", "l_linestatus")
        .df
    )


# --------------------------------------------------------------------------
# map — narrow projection; plan check: scan reads only 4 columns.
# --------------------------------------------------------------------------


@query(
    "map_project",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS revenue
FROM lineitem
""",
)
def map_project(spark, sf_dir):
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    return li.map(
        l_orderkey=F.col("l_orderkey"),
        l_linenumber=F.col("l_linenumber"),
        revenue=(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double"),
    ).df


# --------------------------------------------------------------------------
# flat_map — explode whitespace tokens (reference: fn returns iterable).
# --------------------------------------------------------------------------


@query(
    "flat_map_tokens",
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
""",
)
def flat_map_tokens(spark, sf_dir):
    docs = Dataset(load_table(spark, sf_dir, "documents"))
    return docs.with_columns(__toks=F.split(F.col("text"), " ")).flat_map(
        "__toks", alias="token", keep=["doc_id"]
    ).df


# --------------------------------------------------------------------------
# filter — predicate pushed to the parquet scan.
# --------------------------------------------------------------------------


@query(
    "filter_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
FROM orders
WHERE o_totalprice > 150000 AND o_orderstatus = 'O'
""",
)
def filter_orders(spark, sf_dir):
    orders = Dataset(load_table(spark, sf_dir, "orders"))
    return (
        orders.filter((F.col("o_totalprice") > 150000) & (F.col("o_orderstatus") == "O"))
        .map(
            o_orderkey=F.col("o_orderkey"),
            o_custkey=F.col("o_custkey"),
            o_orderstatus=F.col("o_orderstatus"),
            o_totalprice=F.col("o_totalprice"),
            o_orderdate=F.to_date("o_orderdate"),
            o_orderpriority=F.col("o_orderpriority"),
        )
        .df
    )


# --------------------------------------------------------------------------
# distinct — global keyed dedup (upgrade of reference per-file distinct).
# --------------------------------------------------------------------------


@query("distinct_keys", oracle="SELECT DISTINCT l_partkey FROM lineitem")
def distinct_keys(spark, sf_dir):
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    return li.select("l_partkey").distinct().df


@query(
    "distinct_first",
    oracle="""
SELECT l_partkey, l_orderkey, l_linenumber, l_quantity
FROM (
  SELECT l_partkey, l_orderkey, l_linenumber, l_quantity,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY l_orderkey, l_linenumber) AS rn
  FROM lineitem
) WHERE rn = 1
""",
)
def distinct_first(spark, sf_dir):
    """Deterministic first-occurrence-wins distinct (reference #3 made
    order-explicit, SURVEY.md §7.3)."""
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    return (
        li.select("l_partkey", "l_orderkey", "l_linenumber", "l_quantity")
        .distinct_first(["l_partkey"], ["l_orderkey", "l_linenumber"])
        .df
    )


# --------------------------------------------------------------------------
# count / head
# --------------------------------------------------------------------------


@query("count_lineitem", oracle="SELECT COUNT(*) AS n FROM lineitem")
def count_lineitem(spark, sf_dir):
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    return li.reduce(F.count("*").alias("n")).df


@query(
    "head_sorted",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_orderkey LIMIT 10
""",
)
def head_sorted(spark, sf_dir):
    """head = positional limit; made deterministic with a sort (Spark's
    bare limit, like the reference's glob order, is an artifact of file
    layout)."""
    orders = Dataset(load_table(spark, sf_dir, "orders"))
    return orders.select("o_orderkey", "o_custkey", "o_totalprice").sort("o_orderkey").head(10).df


# --------------------------------------------------------------------------
# reduce — global fold → one record (reference #8/#16).
# --------------------------------------------------------------------------


@query(
    "reduce_global",
    oracle=f"""
SELECT {sql_dsum('l_quantity')} AS sum_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       {sql_davg('l_quantity')} AS avg_qty,
       COUNT(*) AS n
FROM lineitem
""",
)
def reduce_global(spark, sf_dir):
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    return li.reduce(
        dsum("l_quantity").alias("sum_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        davg("l_quantity").alias("avg_qty"),
        F.count("*").alias("n"),
    ).df


# --------------------------------------------------------------------------
# join — intended semantics of reference #11 + the free extensions.
# customer is a small dim → broadcast (no shuffle of the fact side).
# --------------------------------------------------------------------------


@query(
    "join_inner",
    oracle="""
SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_totalprice, c.c_acctbal
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def join_inner(spark, sf_dir):
    orders = Dataset(load_table(spark, sf_dir, "orders"))
    cust = Dataset(load_table(spark, sf_dir, "customer"))
    joined = orders.join(
        cust, on=orders.df.o_custkey == cust.df.c_custkey, merge_other=True
    )
    return joined.select("o_orderkey", "c_custkey", "c_name", "o_totalprice", "c_acctbal").df


@query(
    "join_left",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
""",
)
def join_left(spark, sf_dir):
    orders = Dataset(load_table(spark, sf_dir, "orders"))
    cust = Dataset(load_table(spark, sf_dir, "customer"))
    return (
        cust.join(
            orders,
            on=cust.df.c_custkey == orders.df.o_custkey,
            how="left",
            merge_other=True,
        )
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .df
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_semi(spark, sf_dir):
    orders = Dataset(load_table(spark, sf_dir, "orders"))
    cust = Dataset(load_table(spark, sf_dir, "customer"))
    return (
        cust.join(
            orders,
            on=cust.df.c_custkey == orders.df.o_custkey,
            how="left_semi",
            merge_other=True,
        )
        .select("c_custkey", "c_name", "c_acctbal")
        .df
    )


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_anti(spark, sf_dir):
    orders = Dataset(load_table(spark, sf_dir, "orders"))
    cust = Dataset(load_table(spark, sf_dir, "customer"))
    return (
        cust.join(
            orders,
            on=cust.df.c_custkey == orders.df.o_custkey,
            how="left_anti",
            merge_other=True,
        )
        .select("c_custkey", "c_name", "c_acctbal")
        .df
    )


@query(
    "join_grouped",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       g.n_orders,
       g.sum_total
FROM customer c
JOIN (SELECT o_custkey, COUNT(*) AS n_orders,
             {sql_dsum('o_totalprice')} AS sum_total
      FROM orders GROUP BY o_custkey) g
  ON c.c_custkey = g.o_custkey
""",
)
def join_grouped(spark, sf_dir):
    """Reference #11's output shape (one row per key, right matches
    grouped — /root/reference/shmr/partition.py:300-323) exercised via
    Dataset.join_grouped, then flattened to an oracle-comparable
    aggregate view: array size + exact-decimal array sum."""
    orders = Dataset(load_table(spark, sf_dir, "orders"))
    cust = Dataset(load_table(spark, sf_dir, "customer"))
    # merge_other: the grouped side is one row per customer WITH
    # orders — SF-proportional cardinality, the case the opt-in hint
    # exists for (a size-estimate broadcast of it grows linearly)
    grouped = cust.join_grouped(
        orders, "c_custkey", "o_custkey", "cust", "ords", merge_other=True
    )
    # same scaled-long exact sum as functions.numeric.dsum, folded over
    # the grouped-rights array
    scaled = lambda o: F.floor(o["o_totalprice"] * F.lit(1000000.0) + F.lit(0.5)).cast("long")  # noqa: E731
    return grouped.df.select(
        F.col("cust.c_custkey").alias("c_custkey"),
        F.col("cust.c_name").alias("c_name"),
        F.size("ords").cast("long").alias("n_orders"),
        (
            F.aggregate(F.col("ords"), F.lit(0).cast("long"), lambda acc, o: acc + scaled(o))
            .cast("double")
            / F.lit(1000000.0)
        ).alias("sum_total"),
    )


@query(
    "join_three_way",
    oracle=f"""
SELECT c.c_mktsegment,
       COUNT(*) AS n_items,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
    headline=True,
)
def join_three_way(spark, sf_dir):
    """Fact ⋈ fact ⋈ dim with aggregation — the bench-critical join
    path: lineitem⋈orders shuffles on orderkey, customer broadcasts.

    Optimization (r12, guide §2.3 "aggregate before you shuffle"):
    every output depends on lineitem only through per-order revenue
    partials, so lineitem is reduced to one row per l_orderkey BEFORE
    the fact-fact exchange — the group-by keys the same column the
    sort-merge join needs, so the pre-aggregation ADDS no exchange, it
    just collapses ~4 line items into one (orderkey, partial, count)
    row ahead of the shuffle (~4× fewer exchanged bytes on the
    dominant leg). dsum_partial/dsum_merge keep the exact scaled-int64
    discipline end-to-end, so revenue is bit-identical to the single
    level dsum (int64 addition is associative across any split)."""
    from shmr_spark.functions.numeric import dsum_merge, dsum_partial

    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    orders = Dataset(load_table(spark, sf_dir, "orders"))
    cust = Dataset(load_table(spark, sf_dir, "customer"))
    li_per_order = li.reduce_by_key(
        ["l_orderkey"],
        dsum_partial(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "__rev_part"
        ),
        F.count("*").alias("__n_items"),
    )
    j = li_per_order.join(
        orders, on=F.col("l_orderkey") == orders.df.o_orderkey, merge_other=True
    ).join(cust, on=F.col("o_custkey") == cust.df.c_custkey)
    return (
        j.reduce_by_key(
            ["c_mktsegment"],
            F.sum("__n_items").alias("n_items"),
            dsum_merge("__rev_part").alias("revenue"),
        )
        # 5 market segments at any SF: bounded sort
        .sort_small("c_mktsegment")
        .df
    )


# --------------------------------------------------------------------------
# split_by_key — residue invariant surfaced as a per-bucket summary
# (the reference's test checks (key - i) % N == 0 per bucket,
# /root/reference/tests/test_partition.py:58-73).
# --------------------------------------------------------------------------


@query(
    "split_by_key_buckets",
    oracle="""
SELECT CAST(c_custkey % 8 AS INT) AS bucket, COUNT(*) AS n,
       MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
FROM customer GROUP BY 1 ORDER BY 1
""",
)
def split_by_key_buckets(spark, sf_dir):
    cust = Dataset(load_table(spark, sf_dir, "customer"))
    bucketed = cust.with_bucket("c_custkey", 8).split_by_key("bucket", 8)
    return (
        bucketed.reduce_by_key(
            ["bucket"],
            F.count("*").alias("n"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        # 8 buckets at any SF: bounded sort (no range exchange)
        .sort_small("bucket")
        .df
    )


# --------------------------------------------------------------------------
# concat — UNION ALL identity: complementary filters reassemble the table.
# --------------------------------------------------------------------------


@query(
    "concat_union",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
FROM orders
""",
)
def concat_union(spark, sf_dir):
    orders = Dataset(load_table(spark, sf_dir, "orders")).map(
        o_orderkey=F.col("o_orderkey"),
        o_custkey=F.col("o_custkey"),
        o_orderstatus=F.col("o_orderstatus"),
        o_totalprice=F.col("o_totalprice"),
        o_orderdate=F.to_date("o_orderdate"),
        o_orderpriority=F.col("o_orderpriority"),
    )
    lo = orders.filter(F.col("o_totalprice") < 100000)
    hi = orders.filter(F.col("o_totalprice") >= 100000)
    return lo.concat(hi).df


# --------------------------------------------------------------------------
# coalesce — re-chunk; correctness contract is row conservation.
# --------------------------------------------------------------------------


@query("coalesce_count", oracle="SELECT COUNT(*) AS n FROM lineitem")
def coalesce_count(spark, sf_dir):
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    return li.coalesce(5, shuffle=True).reduce(F.count("*").alias("n")).df


# --------------------------------------------------------------------------
# Set operations — extensions the reference lacks (SURVEY.md §2.4),
# free on Spark: INTERSECT / EXCEPT with SQL bag semantics.
# --------------------------------------------------------------------------


@query(
    "set_intersect",
    oracle="""
SELECT p_partkey AS partkey FROM part
INTERSECT
SELECT l_partkey AS partkey FROM lineitem
""",
)
def set_intersect(spark, sf_dir):
    part = Dataset(load_table(spark, sf_dir, "part"))
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    return part.map(partkey=F.col("p_partkey")).df.intersect(
        li.map(partkey=F.col("l_partkey")).df
    )


@query(
    "set_except",
    oracle="""
SELECT p_partkey AS partkey FROM part
EXCEPT
SELECT l_partkey AS partkey FROM lineitem
""",
)
def set_except(spark, sf_dir):
    part = Dataset(load_table(spark, sf_dir, "part"))
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    return part.map(partkey=F.col("p_partkey")).df.exceptAll(
        li.map(partkey=F.col("l_partkey")).df.distinct()
    )


# --------------------------------------------------------------------------
# Distinct aggregation.
# --------------------------------------------------------------------------


@query(
    "count_distinct",
    oracle="""
SELECT COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
""",
)
def count_distinct(spark, sf_dir):
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    return li.reduce(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    ).df


# --------------------------------------------------------------------------
# SQL API surface: the same engine driven through spark.sql over
# registered views — a TPC-H Q5-shaped 5-table join (region ⋈ nation ⋈
# customer ⋈ orders ⋈ lineitem). Catalyst plans it identically to the
# DataFrame form; the dims chain into broadcasts over the lineitem scan.
# --------------------------------------------------------------------------


@query(
    "sql_q5_region_revenue",
    oracle=f"""
SELECT n.n_name,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
""",
    headline=True,
)
def sql_q5_region_revenue(spark, sf_dir):
    from shmr_spark.functions.numeric import sql_dsum_merge, sql_dsum_partial

    from shmr_spark.dataset import bounded_sort

    # register only the tables this query touches (a full
    # register_views pays 10 parquet footer reads per invocation)
    for t in ("region", "nation", "customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    # r12 (guide §2.3): lineitem contributes only per-order revenue
    # partials, so it is reduced to one row per l_orderkey BEFORE the
    # fact-fact exchange. The GROUP BY keys the same column the MERGE
    # join needs, so the pre-aggregation adds no exchange — it
    # collapses ~4 line items into one (orderkey, partial, count) row
    # ahead of the dominant shuffle leg. sql_dsum_partial/_merge keep
    # the scaled-int64 sum exact end-to-end → revenue bit-identical.
    agg = spark.sql(f"""
        SELECT /*+ BROADCAST(r, n), MERGE(o, l) */ n.n_name,
               {sql_dsum_merge('l.__rev')} AS revenue,
               SUM(l.__cnt) AS n_items
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN (SELECT l_orderkey,
                     {sql_dsum_partial('l_extendedprice * (1 - l_discount)')} AS __rev,
                     COUNT(*) AS __cnt
              FROM lineitem GROUP BY l_orderkey) l
          ON l.l_orderkey = o.o_orderkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """)
    # ≤ 5 nations per region at any SF: bounded sort (oracle keeps
    # ORDER BY in-SQL; row order is hash-compared order-insensitively)
    return bounded_sort(agg, F.desc("revenue"), "n_name")


# --------------------------------------------------------------------------
# TPC-H-shaped headline queries beyond Q1/Q5: Q6 (pure scan + filter +
# agg — measures pushdown and codegen throughput, zero shuffle beyond
# the final 1-row agg) and Q3 (3-table join + agg + top-k).
# --------------------------------------------------------------------------


@query(
    "q6_promo_revenue",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue, COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    headline=True,
)
def q6_promo_revenue(spark, sf_dir):
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .reduce(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n"),
        )
        .df
    )


@query(
    "q3_top_orders",
    oracle=f"""
SELECT l_orderkey, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '2000-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    headline=True,
)
def q3_top_orders(spark, sf_dir):
    """Shipping-backlog top-10: the dimension filters cut customer to
    ~1/5 and orders by date before the joins (pushdown), customer side
    broadcasts, and the final top-k is TakeOrderedAndProject — no
    global sort materialization."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-03-15 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-03-15 00:00:00")
    )
    return (
        li.join(
            orders, li.l_orderkey == orders.o_orderkey
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q14 shape: conditional-aggregation ratio (promo revenue share) — the
# CASE-in-numerator pattern, one join + one agg.
# --------------------------------------------------------------------------


@query(
    "q14_promo_share",
    oracle=f"""
SELECT
  {sql_dsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
    AS promo_revenue,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue,
  COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
""",
)
def q14_promo_share(spark, sf_dir):
    from shmr_spark.functions.numeric import dsum

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dsum(promo).alias("promo_revenue"),
            dsum(rev).alias("total_revenue"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Q10 shape: top-20 customers by returned-item revenue — join + agg +
# TakeOrdered, the "find the problem accounts" query.
# --------------------------------------------------------------------------


@query(
    "q10_returned_top_customers",
    oracle=f"""
SELECT c_custkey, c_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_top_customers(spark, sf_dir):
    from shmr_spark.functions.numeric import dsum

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q18 shape: large-quantity orders — aggregate subquery in the filter
# (semi-join on a HAVING set), then the enriched top-k.
# --------------------------------------------------------------------------


@query(
    "q18_large_orders",
    oracle=f"""
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
       {sql_dsum('l_quantity')} AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING {sql_dsum('l_quantity')} > 150
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q18_large_orders(spark, sf_dir):
    from shmr_spark.functions.numeric import dsum

    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("__tq"))
        .filter(F.col("__tq") > 150)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "apply_side_effect",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS qty_cents
FROM lineitem
""",
)
def apply_side_effect(spark, sf_dir):
    """partition.apply (/root/reference/shmr/partition.py:102-112)
    under the hash gate: the side-effect op has no output partition,
    so the gate OBSERVES the side effect instead — every task writes
    its partition's (row count, exact quantity cents) to a scratch
    file, and the query returns the re-aggregated totals, which must
    equal the direct-scan oracle. Proves the foreachPartition
    execution visited every record exactly once, distributed.

    The scratch dir is driver-local (works on local[*] where
    executors share the FS); on a real cluster the same fn targets
    shared storage or an external sink — the operator contract is
    identical. Cents stay exact: quantities are integral doubles, so
    q*100 is integer-exact on both engines."""
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    from shmr_spark.dataset import Dataset

    d = tempfile.mkdtemp(prefix="shmr_apply_gate_")
    li = Dataset(load_table(spark, sf_dir, "lineitem").select("l_quantity"))

    def per_partition(rows):
        n = 0
        cents = 0
        for r in rows:
            n += 1
            cents += int(r.l_quantity * 100)
        if n:
            path = os.path.join(d, f"part_{uuid.uuid4().hex}.csv")
            with open(path, "w") as f:
                f.write(f"{n},{cents}\n")

    li.apply_partitions(per_partition)
    try:
        parts = []
        for p in glob.glob(os.path.join(d, "part_*.csv")):
            with open(p) as f:
                n, cents = f.read().strip().split(",")
                parts.append((int(n), int(cents)))
        total = (sum(p[0] for p in parts), sum(p[1] for p in parts))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame([total], "n_rows long, qty_cents long")


# --------------------------------------------------------------------------
# Compat-tier canary: the opaque-Python-fn surface (compat/records.py
# — the reference's --fn calling conventions, map (rec)->rec and
# reduce_by_key (rec, accum?)->accum with the 1-arg seeding rule,
# /root/reference/shmr/partition.py:114-132,206-237) routed through
# the DRIVER hash gate. pytest covers this tier differentially; this
# query gives it a driver-green row too: a dict-record map projects
# orders, then a keyed fold (per-partition dict fold + reduceByKey
# partial merge — the RDD tier, no Catalyst) re-derives a group-by
# that the SQL oracle states directly. Sums stay on an integer column
# so arbitrary fold order is exact.
# --------------------------------------------------------------------------


@query(
    "compat_records_fold",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_custkey) AS BIGINT) AS custkey_sum
FROM orders
GROUP BY o_orderstatus
""",
)
def compat_records_fold(spark, sf_dir):
    from shmr_spark.compat.records import map_records, reduce_by_key_records

    orders = Dataset(
        load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_custkey")
    )

    def project(rec):
        return {
            "status": rec["o_orderstatus"],
            "n": 1,
            "custkey_sum": rec["o_custkey"],
        }

    def fold(rec, accum=None):
        # Reference seeding rule: first record per key arrives with no
        # accumulator (accum defaults None) and seeds it; partial-merge
        # calls receive an accumulator-shaped record — same branch.
        if accum is None:
            return dict(rec)
        accum["n"] += rec["n"]
        accum["custkey_sum"] += rec["custkey_sum"]
        return accum

    mapped = map_records(orders, project, schema="status string, n long, custkey_sum long")
    folded = reduce_by_key_records(
        mapped,
        key_fn=lambda rec: rec["status"],
        fn=fold,
        schema="status string, n long, custkey_sum long",
    )
    return folded.df
