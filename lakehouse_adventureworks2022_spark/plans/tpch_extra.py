"""Extra TPC-H-shaped query coverage (Q6/Q7/Q10/Q14/Q19/Q22 adapted to
the fixture schema — no partsupp/shipmode/phone columns exist, so the
shapes keep their join/predicate structure with available columns).

These live OUTSIDE the driver's 50-slot oracle window (full — see
``plans/catalog.py`` guard) and are differentially verified against
DuckDB in ``tests/test_tpch_extra.py`` with the same row/schema/hash
comparison the driver applies. Shapes exercised beyond the main catalog:
scan-only conditional aggregate (Q6), nation-pair join with a
disjunctive pair predicate (Q7), returned-items top-k over four joins
(Q10), ratio of conditional sums (Q14), OR-of-ANDs multi-predicate join
(Q19 — Catalyst must still plan an equi-join on the common key with the
disjunction as a post-filter, never a nested loop), and an
above-average-balance anti-join (Q22 shape).

All monetary aggregates follow the engine rounding policy
(ROUND(sum, 4) on double sums over bounded groups; see catalog
conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.sources.readers import read_table

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: revenue change from discount-band lineitems in one year —
    pure scan + filter + one global aggregate (every predicate reaches
    the parquet scan)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping volume between two nations by ship year, either
    direction — the disjunctive nation-pair predicate rides on top of
    equi-joins (supplier and customer nations broadcast)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_20") & (F.col("cust_nation") == "NATION_11")
    ) | (
        (F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_20")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.round(F.sum(_rev()), 4).alias("volume"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: customers ranked by revenue lost to returns in one quarter —
    top 20 with deterministic tiebreak."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1997-01-01")
                & (F.col("o_orderdate") < "1997-04-01")
            ),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("c_acctbal").alias("account_balance"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(F.round(F.sum(_rev()), 4).alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("customer_key"))
        .limit(20)
    )


def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: share of one ship-month's revenue from a part-type class —
    ratio of conditional sums over a broadcast part join."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    promo = F.when(
        F.col("p_type").startswith("PROMO"), _rev()
    ).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-03-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(_rev()), 6).alias(
                "promo_revenue_pct"
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue from three disjoint (brand, size, quantity) branches —
    an OR-of-ANDs predicate that must still plan as ONE equi-join on
    partkey with the disjunction as a filter (no nested loop; asserted
    in the test)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 20))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 30))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return joined.filter(branch).agg(
        F.round(F.sum(_rev()), 4).alias("revenue"),
        F.count(F.lit(1)).alias("line_count"),
    )


def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (no phone column): customers with above-average positive
    balances and no URGENT orders — scalar avg subquery + anti-join
    against a filtered order set, grouped by market segment."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .groupBy(F.col("c_mktsegment").alias("market_segment"))
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


EXTRA_QUERIES = {
    "tpch_q6_forecast_revenue": q6_forecast_revenue,
    "tpch_q7_nation_volume": q7_nation_volume,
    "tpch_q10_returned_items": q10_returned_items,
    "tpch_q14_promo_ratio": q14_promo_revenue_ratio,
    "tpch_q19_disjunctive": q19_disjunctive_revenue,
    "tpch_q22_idle_balances": q22_idle_balances,
}

EXTRA_ORACLES = {
    "tpch_q6_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
               COUNT(*) AS line_count
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "tpch_q7_nation_volume": """
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS ship_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
           OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')
        GROUP BY 1, 2, 3
    """,
    "tpch_q10_returned_items": """
        SELECT c.c_custkey AS customer_key,
               c.c_name AS customer_name,
               c.c_acctbal AS account_balance,
               n.n_name AS nation_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS lost_revenue
        FROM lineitem l
        JOIN orders o  ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n  ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-04-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY lost_revenue DESC, customer_key ASC
        LIMIT 20
    """,
    "tpch_q14_promo_ratio": """
        SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                     THEN l.l_extendedprice * (1 - l.l_discount)
                     ELSE 0.0 END)
               / SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
                 AS promo_revenue_pct,
               COUNT(*) AS line_count
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
          AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
    "tpch_q19_disjunctive": """
        SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS revenue,
               COUNT(*) AS line_count
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q22_idle_balances": """
        SELECT c.c_mktsegment AS market_segment,
               COUNT(*) AS customer_count,
               ROUND(SUM(c.c_acctbal), 2) AS total_balance
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                             WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY 1
    """,
}


def user_value_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame window aggregates (the frame spec the main catalog
    doesn't exercise): per-user 4-event moving average and peak over
    ``ROWS BETWEEN 3 PRECEDING AND CURRENT ROW``, deterministically
    ordered by (ts, event_id).

    Scale shape: one hash shuffle on user_id + per-partition sort; the
    bounded frame keeps O(frame) state per row (an unbounded frame would
    too via running aggregation, but bounded frames generalize to
    percentile-over-window where running forms don't exist).
    """
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(F.avg("value").over(w), 6).alias("moving_avg_4"),
        F.max("value").over(w).alias("moving_max_4"),
        F.count(F.lit(1)).over(w).cast("int").alias("frame_size"),
    )


EXTRA_QUERIES["user_value_moving_stats"] = user_value_moving_stats
EXTRA_ORACLES["user_value_moving_stats"] = """
    SELECT user_id, event_id, ts, value,
           ROUND(AVG(value) OVER w, 6) AS moving_avg_4,
           MAX(value) OVER w AS moving_max_4,
           CAST(COUNT(*) OVER w AS INT) AS frame_size
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue — the
    revenue-view + scalar-subquery-max shape. The per-supplier aggregate
    is computed ONCE and reused for both the max and the equi-filter
    (same subtree ⇒ Spark reuses the exchange); ties all surface, as in
    the spec."""
    li = read_table(spark, sf_dir, "lineitem")
    sup = read_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_rev()), 4).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), revenue["total_revenue"] == max_rev["m"])
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            "total_revenue",
        )
        .orderBy("s_suppkey")
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: large-volume orders — per-order quantity aggregate with a
    HAVING threshold, then customer/order enrichment of the (tiny)
    qualifying set. The having-filtered key set drives semi-join
    pruning: the second lineitem pass never materializes, because the
    already-aggregated quantities are reused."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__raw_qty__"))
        # HAVING on the RAW sum (matching the SQL twin exactly — a
        # rounded filter would diverge for sums in (150, 150.00005]);
        # rounding is presentation-only, in the projection
        .filter(F.col("__raw_qty__") > 150)
        .select(
            "l_orderkey", F.round("__raw_qty__", 4).alias("total_qty")
        )
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )
EXTRA_QUERIES["tpch_q15_top_supplier"] = q15_top_supplier
EXTRA_ORACLES["tpch_q15_top_supplier"] = """
    WITH revenue AS (
        SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
"""

EXTRA_QUERIES["tpch_q18_large_orders"] = q18_large_orders
EXTRA_ORACLES["tpch_q18_large_orders"] = """
    WITH big AS (
        SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
"""
