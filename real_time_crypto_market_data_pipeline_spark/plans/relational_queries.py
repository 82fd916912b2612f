"""Relational capability queries (joins / global agg / top-k per group).

The reference has no joins, sorts, or SQL surface (SURVEY section 2.6)
- these are the capabilities Spark adds for free, exercised on the
TPC-H-ish tables so the bench has classic OLAP shapes:

- q_tpch_q1: the canonical scan+group+8-agg (whole-stage codegen,
  map-side partial aggregation; shuffle carries only 4ish groups).
- q_join_enrich: fact-to-dims star join - both dims broadcast, so the
  orders scan never shuffles; the only exchange is the final group-by.
- q_topk_per_group: window row_number top-k - the per-group heap
  pattern; at 100 TB this is the shape to prefer over global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import banded_interval_count
from ..tables import load, load_events
from .registry import query


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           SUM(l_extendedprice) AS sum_base_price,
           SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           AVG(l_quantity) AS avg_qty,
           AVG(l_extendedprice) AS avg_price,
           AVG(l_discount) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary report over lineitem."""
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price).alias("sum_disc_price"),
        F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        F.avg("l_quantity").alias("avg_qty"),
        F.avg("l_extendedprice").alias("avg_price"),
        F.avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).cast("long").alias("count_order"),
    )


@query(
    "q_join_enrich",
    oracle="""
    SELECT n_name, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(o_totalprice) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, c_mktsegment
    """,
    bench=True,
)
def q_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: orders fact enriched by customer, then broadcast nation.

    `nation` (25 rows, bounded) is explicitly broadcast; `customer` is
    O(fact) and gets NO hint - orders-x-customer is a key-partitioned
    join whose strategy AQE picks from runtime stats (SMJ at scale,
    broadcast only if the filtered build side is genuinely small).
    Forcing a customer broadcast would OOM the executors at 100x.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority class (window top-k, total tiebreak)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT SUM(l_extendedprice * l_discount) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective multi-predicate scan + global agg.

    All four predicates push to the parquet scan; the aggregate is a
    single partial/final pair with no grouping key - the cheapest
    possible plan, and the query where pushdown matters most.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


@query(
    "q_order_revenue_topk",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           SUM(l_extendedprice * (1 - l_discount)) AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    bench=True,
)
def q_order_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective fact-fact join + grouped agg + top-k.

    lineitem joins orders on the orderkey; at bench scale Catalyst
    broadcasts the filtered orders side, and the top-10 lowers to
    TakeOrderedAndProject. At 100 TB both sides co-partition on
    orderkey (bucketed layout) and the join is shuffle-free.
    """
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q_supplier_region",
    oracle="""
    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           SUM(s_acctbal) AS total_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_supplier_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-chain join: supplier -> nation -> region rollup (all broadcast)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("s_acctbal").alias("total_acctbal"),
        )
    )


@query(
    "q_part_brand_stats",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           AVG(p_retailprice) AS avg_price,
           CAST(MAX(p_size) AS INTEGER) AS max_size
    FROM part GROUP BY p_brand
    """,
)
def q_part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part catalog rollup by brand (completes per-table coverage)."""
    return (
        load(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.avg("p_retailprice").alias("avg_price"),
            F.max("p_size").cast("int").alias("max_size"),
        )
    )


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    bench=True,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table local-supplier-volume join.

    Only the genuinely bounded sides carry broadcast hints (supplier, nation,
    region). lineitem-orders and orders-customer are fact-to-fact edges: both
    shuffle on their equi-keys and AQE picks the physical strategy from
    runtime sizes - at sf0.1 it may still choose broadcast, at 100 TB it
    degrades gracefully to SMJ instead of OOMing on a forced hint. The region
    filter prunes through the nation->supplier chain before touching the fact.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS returned_count,
           CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional counts per category.

    orders is O(fact): no broadcast hint - the l_orderkey equi-join
    shuffles both sides and AQE chooses the strategy at runtime.
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("returned_count"),
            F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0))
            .cast("long")
            .alias("kept_count"),
        )
    )


@query(
    "q_tpch_q14",
    oracle="""
    SELECT 100.0 * SUM(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0 END)
               / SUM(l_extendedprice * (1 - l_discount)) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion-revenue share (join + ratio of sums)."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) t GROUP BY n_orders
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution.

    Left outer join keeps order-less customers (n_orders = 0); the
    second aggregate is tiny (one row per distinct count). The outer
    join's filter lives in the join condition, not a WHERE - a WHERE
    would silently turn the join inner and drop the zero bucket.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


@query(
    "q_tpch_q15",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top-revenue supplier via agg + scalar-max match.

    The revenue CTE is computed once and reused for both the scalar max
    and the equality match (Spark reuses the exchange); the single-row
    max side and the supplier dim both broadcast.
    """
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), rev.total_rev == max_rev.max_rev)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q_tpch_q17",
    oracle="""
    SELECT SUM(l_extendedprice) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity revenue vs per-part average.

    The correlated scalar subquery de-correlates into a per-part AVG
    aggregate joined back to the fact. The brand filter is applied
    BEFORE the aggregate (partkey determines brand, so restricting the
    avg input to the brand's rows is semantics-preserving) - at 100 TB
    that turns an all-parts aggregate into a ~1/25th one.
    """
    part_f = (
        load(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_b = li.join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey)
    half_avg = li_b.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li_b.join(F.broadcast(half_avg), li_b.l_partkey == half_avg.ap_partkey)
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg((F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q_tpch_q18",
    oracle="""
    SELECT c_name, o_orderkey, o_totalprice, sum_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 300) big ON o_orderkey = l_orderkey
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (having-gated agg join).

    The groupBy+HAVING collapses the fact to a tiny filtered key set
    (<1% of orders) before any join - the cheapest legal order. The
    filtered aggregate then drives the orders lookup; AQE picks
    broadcast vs shuffle join from the post-filter size at runtime.
    """
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


@query(
    "q_tpch_q19",
    oracle="""
    SELECT SUM(l_extendedprice * (1 - l_discount)) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/qty bands.

    Catalyst extracts the common sub-predicates of the OR for pushdown: the
    part scan receives an IN(brand) + size range filter and the lineitem scan
    a quantity range, so neither side reads rows no branch could accept; the
    residual OR evaluates post-join in whole-stage codegen.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.where(band).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


@query(
    "q_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, SUM(volume) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipped between two nations by year.

    The nation dim joins twice under different roles (supplier-side and
    customer-side); supplier and both nation roles broadcast. The
    lineitem-orders and orders-customer edges are fact-to-fact: no
    hint, AQE/SMJ on the shuffled equi-keys so the plan survives 100x.
    """
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").alias("revenue"))
    )


@query(
    "q_tpch_q8",
    oracle="""
    SELECT o_year,
           SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / SUM(volume) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share (eight-table star).

    The widest join in the suite: part + supplier + two nation roles +
    region broadcast around the lineitem-orders spine; the spine itself
    (lineitem-orders, orders-customer) shuffles on its equi-keys with
    no hint so AQE sizes the strategy at runtime. The region and p_type
    filters prune their broadcast sides before the fact is touched.
    """
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                        0.0
                    )
                )
                / F.sum("volume")
            ).alias("mkt_share")
        )
    )


@query(
    "q_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           SUM(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer.

    Both fact-side filters (quarter window, returnflag) push to the
    scans; the group-by key includes the customer attributes so no
    second join is needed after aggregation. The TPC LIMIT 20 is
    deliberately dropped: a float-ordered top-k boundary is not
    cross-engine deterministic, and the full grouped result is small.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@query(
    "q_tpch_q22",
    oracle="""
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
           SUM(c_acctbal) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no urgent orders.

    Scalar-avg broadcast filter + left-anti join, then a per-nation
    rollup. (The literal Q22 anti-joins on "no orders at all", which is
    empty in this dataset - gating on urgent orders keeps the identical
    plan shape with a non-degenerate result.)
    """
    cust = load(spark, sf_dir, "customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    urgent = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum("c_acctbal").alias("totacctbal"),
        )
    )


@query(
    "q_tpch_q2",
    oracle="""
    SELECT s_name, n_name, p_partkey, supplycost, s_acctbal
    FROM (
      SELECT s_name, n_name, p_partkey, s_acctbal, supplycost,
             MIN(supplycost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM (
        SELECT p_partkey, s_name, n_name, s_acctbal,
               MIN(l_extendedprice / l_quantity) AS supplycost
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_type = 'SMALL' AND r_name = 'EUROPE' AND l_quantity > 0
        GROUP BY p_partkey, s_name, n_name, s_acctbal
      ) costs
    ) ranked
    WHERE supplycost = min_cost
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-cost supplier per part within a region.

    No partsupp table exists in this dataset, so supply cost is derived
    as each supplier's best observed unit price (MIN, order-independent
    and therefore exactly reproducible cross-engine, unlike AVG) from
    lineitem. The correlated "cost = regional min for the part" subquery
    decorrelates into a window MIN over the part key.

    Scale discipline: the fact is reduced to (partkey, suppkey, cost)
    BEFORE any wide columns appear - supplier name/nation strings join
    in by broadcast only after the min-filter has cut the rows to ~one
    per part. An explicit repartition on l_partkey alone satisfies the
    clustering requirement of BOTH the (partkey, suppkey) group-by and
    the partkey window, so the narrow rows shuffle exactly once
    (asserted in tests/test_plans.py).
    """
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supp_eur = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(
            F.broadcast(supp_eur.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn("min_cost", F.min("supplycost").over(w)).where(
        F.col("supplycost") == F.col("min_cost")
    )
    return best.join(
        F.broadcast(supp_eur), best.l_suppkey == supp_eur.s_suppkey
    ).select(
        "s_name",
        "n_name",
        F.col("l_partkey").alias("p_partkey"),
        "supplycost",
        "s_acctbal",
    )


@query(
    "q_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           SUM(l_extendedprice * (1 - l_discount)) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue of orders placed but not yet shipped.

    The customer market-segment column doesn't exist here, so the selective
    dim filter is region membership instead. nation/region broadcast into the
    customer scan; the filtered customer key set and the lineitem-orders edge
    are O(fact), so both stay hint-free (shuffled semi/equi joins, AQE-sized).
    The date predicates push to both parquet scans. The TPC ORDER BY + LIMIT
    10 is dropped (float-ordered top-k is not cross-engine deterministic);
    top-k over this result is q_order_revenue_topk's job.
    """
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-06-01 00:00:00").cast("timestamp_ntz")
    )
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-06-01 00:00:00").cast("timestamp_ntz")
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_asia = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_asia, orders.o_custkey == F.col("c_custkey"), "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_returnflag = 'R'
          AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking via correlated EXISTS.

    The commit/receipt-date lateness predicate doesn't exist in this
    dataset; the correlated condition is instead "a returned line
    shipped after the order date" - same shape: an equi-key semi join
    with an extra non-equi condition referencing both sides. Spark
    executes it as a semi hash join on l_orderkey with the inequality
    as a residual filter - the fact table is never widened.
    """
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


@query(
    "q_tpch_q9",
    oracle="""
    SELECT nation, o_year, SUM(amount) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
    bench=True,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and year.

    Supply cost (partsupp) is proxied by a retail-price fraction. The
    LIKE '%gear%' filter can't prune at the parquet scan (no leading
    prefix) but runs inside codegen on the broadcast part build side,
    shrinking it before the fact join. part/supplier/nation broadcast;
    lineitem-orders is the fact-fact spine and stays hint-free - one
    l_orderkey shuffle, strategy AQE-sized, safe at any scale.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").alias("sum_profit"))
    )


@query(
    "q_tpch_q11",
    oracle="""
    SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS part_value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING SUM(l_extendedprice * l_quantity) > (
      SELECT 0.002 * SUM(l_extendedprice * l_quantity)
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    )
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding an outsized share of one nation's
    traded value (partsupp availability proxied by lineitem value).

    The uncorrelated scalar subquery - a global SUM over the identical
    join - is computed once from the SAME grouped dataframe (sum of the
    group sums), so Spark scans lineitem once, reuses the exchange, and
    broadcasts the one-row total back for the HAVING filter.
    """
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    supp_nat = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    grouped = (
        li.join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value"))
    )
    total = grouped.agg((0.002 * F.sum("part_value")).alias("threshold"))
    return (
        grouped.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier diversity per part attribute bucket.

    The NOT IN complainer-supplier subquery (comment-LIKE in TPC, negative
    balance here) becomes a broadcast anti join - the right way to run NOT IN
    at scale when the exclusion list is small and provably non-null.
    COUNT(DISTINCT) expands to a two-phase aggregate: partial distinct on
    (brand,type,size,suppkey), then the count - both map-side combined.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25)
    )
    bad = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("long").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q20",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT l_suppkey FROM (
          SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty,
                 AVG(SUM(l_quantity)) OVER (PARTITION BY l_partkey) AS avg_qty
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
          GROUP BY l_suppkey, l_partkey
        ) shares
        WHERE qty > 1.5 * avg_qty
      )
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers dominating shipments of a part family.

    TPC's availqty > half-of-shipped predicate needs partsupp; the
    preserved shape is the nested aggregate-then-threshold subquery
    feeding a semi join. The threshold is "ships over 1.5x the average
    supplier's quantity of that part" - scale-stable, unlike a fixed
    share-of-total which degenerates as supplier count grows. The
    per-(supplier,part) sums and the per-part averages share one
    shuffle: the window AVG over l_partkey runs on the already-grouped
    rows, avoiding a second scan of lineitem.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    shares = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .withColumn("avg_qty", F.avg("qty").over(Window.partitionBy("l_partkey")))
        .where(F.col("qty") > 1.5 * F.col("avg_qty"))
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(shares, supp.s_suppkey == shares.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    """,
    bench=True,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole blamable supplier per problem order.

    Lateness (receipt > commit date) is proxied by returnflag='R'. Both
    correlated subqueries are per-ORDER set predicates, resolved from
    two distinct-supplier counts over ONE l_orderkey window (r20):
    EXISTS another supplier <=> |distinct suppkeys| >= 2 (this row's is
    always in the set); NOT EXISTS another R-supplier <=> |distinct
    R-suppkeys| == 1 (this row is 'R'). Three lineitem scans + two
    self-joins collapse to ONE scan + ONE exchange; per-order
    collect_sets are bounded by suppliers-per-order, and the hint-free
    orders semi-join co-partitions on the window's exchange at scale.
    Row-identical to the join form (evidence: OPTIMIZATION_r20.md).
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey")
    flagged = li.select(
        "l_orderkey", "l_suppkey", "l_returnflag",
        F.size(F.collect_set("l_suppkey").over(w)).alias("_n_supp"),
        F.size(F.collect_set(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).over(w)).alias("_n_supp_r"))
    l1 = flagged.where(
        (F.col("l_returnflag") == "R") & (F.col("_n_supp") >= 2)
        & (F.col("_n_supp_r") == 1))
    return (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey, "left_semi")
        .join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@query(
    "q_window_variety",
    oracle="""
    WITH r AS (
      SELECT event_type, value,
             NTILE(4) OVER w AS quartile,
             PERCENT_RANK() OVER w AS pr,
             CUME_DIST() OVER w AS cd
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    )
    SELECT event_type, CAST(quartile AS INTEGER) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS min_value, MAX(value) AS max_value,
           MAX(pr) AS max_pr, MAX(cd) AS max_cd
    FROM r GROUP BY event_type, quartile
    """,
)
def q_window_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window family: ntile / percent_rank / cume_dist.

    The window ORDER BY carries event_id as tiebreak so the total order - and
    therefore every rank-derived value - is identical cross-engine. One
    exchange+sort per event_type serves all three window functions; the
    quartile rollup reuses the same clustering. Rollup aggregates are
    MIN/MAX/COUNT (order-independent) - a SUM of ~5k doubles per group drifts
    past 6-significant-digit canonicalization between engines at sf0.1.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select(
            "event_type",
            "value",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.max("pr").alias("max_pr"),
            F.max("cd").alias("max_cd"),
        )
    )


@query(
    "q_first_last_value",
    oracle="""
    WITH r AS (
      SELECT event_type,
             FIRST_VALUE(value) OVER w AS first_v,
             LAST_VALUE(value) OVER w AS last_v,
             NTH_VALUE(value, 3) OVER w AS third_v
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
    )
    SELECT DISTINCT event_type, first_v, last_v, third_v FROM r
    """,
)
def q_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window family: first_value / last_value / nth_value.

    The frame is pinned to the full partition (the default last_value frame
    ends at CURRENT ROW - a classic cross-engine trap) and the order carries
    event_id as tiebreak, so all three positional picks are deterministic.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_type",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.nth_value("value", 3).over(w).alias("third_v"),
    ).distinct()


@query(
    "q_interval_count",
    oracle="""
    SELECT c.event_id, CAST(COUNT(v.vts) AS BIGINT) AS views_60s
    FROM (SELECT event_id, user_id, epoch_ms(ts) AS cts
          FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT user_id, epoch_ms(ts) AS vts
               FROM events WHERE event_type = 'view') v
      ON v.user_id = c.user_id
     AND v.vts >= c.cts - 60000 AND v.vts < c.cts
    GROUP BY c.event_id
    """,
    bench=True,
)
def q_interval_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded interval join: views per user in the minute before each
    click (operators/asof.banded_interval_count).

    The 60s lookback becomes part of the JOIN KEY - each click probes
    its own and the previous time band - so a hot user's pairs are
    bounded by adjacent-band co-residency instead of |clicks|x|views|,
    and the shuffle spreads hot keys across time bands.
    """
    ev = load_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ms"
    )
    views = ev.where(F.col("event_type") == "view").select("user_id", "ms")
    return banded_interval_count(
        clicks,
        views,
        key_cols=["user_id"],
        left_ts="ms",
        right_ts="ms",
        range_ms=60_000,
        left_id="event_id",
        out_col="views_60s",
    )


@query(
    "q_ohlc_bars",
    oracle="""
    WITH d AS (
      SELECT event_type, value, epoch_ms(ts) AS ms, event_id,
             epoch_ms(ts) // 3600000 AS bucket
      FROM events
    ),
    r AS (
      SELECT event_type, bucket, value,
             FIRST_VALUE(value) OVER w AS open_v,
             LAST_VALUE(value) OVER w AS close_v
      FROM d
      WINDOW w AS (PARTITION BY event_type, bucket ORDER BY ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket,
           MIN(open_v) AS open, MAX(value) AS high, MIN(value) AS low,
           MIN(close_v) AS close, CAST(COUNT(*) AS BIGINT) AS n_ticks,
           -- integer-cents mean: per-bar groups are small, so a double
           -- AVG of 2-decimal prices lands on canonicalization ties
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(value) AS DOUBLE) / 100.0 AS mean_px
    FROM r GROUP BY event_type, bucket
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bar resampling: hourly OHLC candles per series.

    The canonical market-data downsample (the reference never aggregates over
    event time at all - SURVEY 2.6). Open/close are positional picks over a
    (ts, event_id) total order - the full-partition window frame from
    q_first_last_value - and the bar rollup reuses the window's (type, bucket)
    clustering, so the whole candle build is one exchange+sort. In streaming
    form the same bars fall out of groupBy(window(event_time, '1 hour')) with
    min_by/max_by; batch keeps the window form for exact cross-engine
    open/close semantics.
    """
    ev = load_events(spark, sf_dir).select("event_type", "value", "event_id", "ms")
    ev = ev.withColumn("bucket", F.expr("ms DIV 3600000"))
    w = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    r = ev.select(
        "event_type",
        "bucket",
        "value",
        F.first("value").over(w).alias("open_v"),
        F.last("value").over(w).alias("close_v"),
    )
    return r.groupBy("event_type", "bucket").agg(
        F.min("open_v").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min("close_v").alias("close"),
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / F.count("value").cast("double")
            / 100.0
        ).alias("mean_px"),
    )


@query(
    "q_ohlc_rollup",
    oracle="""
    WITH d AS (
      SELECT event_type, value, epoch_ms(ts) AS ms, event_id,
             epoch_ms(ts) // 86400000 AS bucket
      FROM events
    ),
    r AS (
      SELECT event_type, bucket, value,
             FIRST_VALUE(value) OVER w AS open_v,
             LAST_VALUE(value) OVER w AS close_v
      FROM d
      WINDOW w AS (PARTITION BY event_type, bucket ORDER BY ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket,
           MIN(open_v) AS open, MAX(value) AS high, MIN(value) AS low,
           MIN(close_v) AS close, CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM r GROUP BY event_type, bucket
    """,
    bench="extra",
)
def q_ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain candles from mergeable partials: hour -> day.

    q_ohlc_bars computes candles with a full-partition window; this query
    computes HOURLY candle partials instead (open/close stored as
    argmin/argmax tick structs - metrics.ohlc_partials) and merges 24 of them
    per day (metrics.merge_ohlc). The oracle computes the day candles directly
    from raw ticks, so a match proves order statistics roll up losslessly -
    the continuous-aggregate contract (q_rollup_merge) extended from sums to
    positional open/close. At 100 TB the stored hourly candles serve every
    coarser chart without touching tick data again.
    """
    from ..operators import metrics as M

    partials = M.ohlc_partials(
        load_events(spark, sf_dir),
        ["event_type"],
        value_col="value",
        ts_ms_col="ms",
        tiebreak_col="event_id",
        grain_ms=3_600_000,
    )
    return M.merge_ohlc(partials, ["event_type"], coarse_factor=24)


@query(
    "q_salted_stats",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT user_id, event_type,
           CAST(COUNT(cents) AS BIGINT) AS s_count,
           COALESCE(SUM(cents) / COUNT(cents), 0.0) AS s_mean,
           COALESCE(CAST(MIN(cents) AS DOUBLE), 0.0) AS s_min,
           COALESCE(CAST(MAX(cents) AS DOUBLE), 0.0) AS s_max
    FROM c GROUP BY user_id, event_type
    """,
)
def q_salted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe grouped stats: two-stage salted shuffle, same answer.

    Stage 1 aggregates on (keys, salt) so a hot key spreads over 16 reducers;
    stage 2 merges 16 partial rows per key - salting changes the execution,
    not the result. The stats run over integer cents (round(value*100)):
    integer partial sums are EXACT under any grouping/order, so the two-stage
    merge is bit-identical to the oracle's single pass. (Double sums are not:
    a mean of 16 two-decimal values lands exactly on 6-significant-digit
    rounding boundaries often enough that summation-order ulps flip the
    canonicalized value - measured 10/750 groups at sf0.01.) The double path's
    stddev/mean equality to the plain single-shuffle agg is pinned at rel_tol
    1e-6 in tests/test_scale_patterns.py.
    """
    from ..operators.skew import salted_grouped_stats

    ev = load(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    return salted_grouped_stats(
        ev, ["user_id", "event_type"], "cents", "s_"
    ).drop("s_std")


@query(
    "q_merge_upsert",
    oracle="""
    WITH src AS (
      -- integer-cents sum: exact under any merge order (hash-determinism)
      SELECT o_custkey AS c_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS spend_1997
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey
    )
    SELECT c.c_custkey,
           c.c_acctbal + COALESCE(s.spend_1997, 0.0) AS new_acctbal,
           s.c_custkey IS NOT NULL AS was_updated
    FROM customer c LEFT JOIN src s USING (c_custkey)
    UNION ALL
    SELECT s.c_custkey, s.spend_1997 AS new_acctbal, TRUE AS was_updated
    FROM src s LEFT JOIN customer c USING (c_custkey)
    WHERE c.c_custkey IS NULL
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation: upsert a change batch into a dimension.

    The CDC shape without a table format: matched rows update (acctbal += the
    year's spend), unmatched source rows insert, unmatched target rows pass
    through - expressed as update-via-join UNION insert-via-anti-join. On a
    lakehouse table (Delta/Iceberg) this is literally MERGE INTO and rewrites
    only touched files. Both the change batch and the target key set are
    O(customer) - fact scale - so neither side carries a broadcast hint: the
    left join and the anti join shuffle on c_custkey (one co-partitioned
    exchange each; AQE may still pick broadcast when the year's change batch
    is genuinely small at runtime).
    """
    cust = load(spark, sf_dir, "customer")
    src = (
        load(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        # integer-cents partial sums: the change batch's spend is exact
        # under any merge order, so the merged row set hashes stably
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("spend_1997")
        )
    )
    updated_or_kept = cust.join(src, "c_custkey", "left").select(
        "c_custkey",
        (F.col("c_acctbal") + F.coalesce(F.col("spend_1997"), F.lit(0.0))).alias(
            "new_acctbal"
        ),
        F.col("spend_1997").isNotNull().alias("was_updated"),
    )
    inserted = (
        src.join(cust.select("c_custkey"), "c_custkey", "left_anti")
        .select(
            "c_custkey",
            F.col("spend_1997").alias("new_acctbal"),
            F.lit(True).alias("was_updated"),
        )
    )
    return updated_or_kept.unionByName(inserted)


@query(
    "q_scd2_history",
    oracle="""
    SELECT o_custkey AS c_custkey,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_n,
           -- DuckDB SUM(BIGINT) widens to HUGEINT (renders float64 via
           -- pandas); cast back so the value hash sees int64 like Spark
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_spend_cents,
           LEAD(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history build from a change stream.

    Each order is a new version of its customer's lifetime-spend attribute:
    valid_from = the change timestamp, valid_to = the next change (NULL =
    current row), a monotone version number, and the running attribute value.
    This is the other half of the CDC story next to q_merge_upsert: MERGE
    keeps only the latest row, SCD2 keeps every row with an effective-dated
    range, so point-in-time joins (AS OF semantics) become a simple BETWEEN
    valid_from AND valid_to. One shuffle on the natural key serves all four
    window functions (same partitioning, same ordering); the running sum is
    integer cents so partial sums are exact under any merge order.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(w).alias("valid_to"),
            F.row_number().over(w).cast("long").alias("version_n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("cum_spend_cents"),
            F.lead("o_orderdate").over(w).isNull().alias("is_current"),
        )
    )


@query(
    "q_profile_columns",
    oracle="""
    SELECT 'event_id' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(MIN(event_id) AS DOUBLE) AS min_num,
           CAST(MAX(event_id) AS DOUBLE) AS max_num
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE)
    FROM events
    UNION ALL
    SELECT 'value', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(value) AS BIGINT),
           CAST(COUNT(DISTINCT value) AS BIGINT),
           MIN(value), MAX(value)
    FROM events
    UNION ALL
    SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
           CAST(COUNT(DISTINCT event_type) AS BIGINT),
           NULL, NULL
    FROM events
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling (data-quality audit table).

    Per column: row count, null count, exact distinct count, numeric
    min/max - the profile a 100 TB ingest job publishes next to every
    dataset version (the Deequ/TFDV pattern). All columns profile in
    ONE aggregate over ONE scan: multiple COUNT(DISTINCT) compile to
    a single Expand-based plan, not one scan per column (the oracle's
    UNION ALL of per-column scans is exactly the shape to avoid).
    At petabyte scale swap the exact distincts for approx_count_distinct
    - the HLL sketches in operators/sketches.py are the mergeable form.
    """
    ev = load(spark, sf_dir, "events")
    n = F.count(F.lit(1)).cast("long")
    wide = ev.agg(
        n.alias("n_rows"),
        (n - F.count("event_id")).alias("null_event_id"),
        F.countDistinct("event_id").cast("long").alias("nd_event_id"),
        F.min("event_id").cast("double").alias("min_event_id"),
        F.max("event_id").cast("double").alias("max_event_id"),
        (n - F.count("user_id")).alias("null_user_id"),
        F.countDistinct("user_id").cast("long").alias("nd_user_id"),
        F.min("user_id").cast("double").alias("min_user_id"),
        F.max("user_id").cast("double").alias("max_user_id"),
        (n - F.count("value")).alias("null_value"),
        F.countDistinct("value").cast("long").alias("nd_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (n - F.count("event_type")).alias("null_event_type"),
        F.countDistinct("event_type").cast("long").alias("nd_event_type"),
    )
    def prof(c, numeric=True):  # one audit struct per profiled column
        null_d = F.lit(None).cast("double")
        return F.struct(
            F.lit(c).alias("column_name"), F.col("n_rows"),
            F.col(f"null_{c}").alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
            (F.col(f"min_{c}") if numeric else null_d).alias("min_num"),
            (F.col(f"max_{c}") if numeric else null_d).alias("max_num"))

    return wide.select(
        F.explode(F.array(prof("event_id"), prof("user_id"), prof("value"),
                          prof("event_type", numeric=False))).alias("p")
    ).select("p.*")


@query(
    "q_pit_read",
    oracle="""
    SELECT o_custkey AS c_custkey,
           CAST(COUNT(*) AS BIGINT) AS version_n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS spend_cents_asof
    FROM orders
    WHERE o_orderdate <= TIMESTAMP '1996-06-30 00:00:00'
    GROUP BY o_custkey
    """,
)
def q_pit_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) read of the SCD2 history.

    "Each customer's spend and version as of 1996-06-30": select, per
    key, the latest history row whose valid_from is at or before the
    probe instant - the read side of the CDC trilogy (q_merge_upsert
    writes latest-state, q_scd2_history keeps versions, this consumes
    them). Spark side genuinely walks the versioned history (window
    build, then max_by over versions <= T); the oracle exploits that
    an SCD2 point-in-time read is definitionally equal to aggregating
    the change stream up to T, which is the cross-check that the
    history build loses nothing. The window and the max_by agg share
    the o_custkey partitioning - one exchange end to end.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    hist = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").alias("valid_from"),
        F.row_number().over(w).cast("long").alias("version_n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_spend_cents"),
    )
    as_of = F.lit("1996-06-30 00:00:00").cast("timestamp_ntz")
    return (
        hist.where(F.col("valid_from") <= as_of)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("version_n").alias("version_n"),
            F.max_by("cum_spend_cents", "version_n").alias("spend_cents_asof"),
        )
    )
