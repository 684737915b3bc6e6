"""Adapted TPC-H coverage: the remaining classic query *shapes* mapped
onto the driver's slimmed-down star schema (TESTDATA.md — no partsupp,
no commit/receipt dates, phones, containers, or comments), keeping each
query's defining operator pattern:

- q4  : EXISTS correlated semi-join + grouped count
- q7  : dual-nation self-join of the nation dim, revenue by year
- q10 : returned-item revenue, 4-way join + top-k with tie-break
- q12 : conditional two-way counts over a join (CASE aggregation)
- q13 : LEFT OUTER join + two-level aggregation (distribution histogram)
- q15 : CTE revenue view + scalar-subquery max (top supplier)
- q17 : correlated scalar subquery (per-part avg threshold)
- q18 : IN over grouped-HAVING subquery (large-volume orders)
- q19 : disjunction of conjunctive range predicates over a join
- q21 : EXISTS + NOT EXISTS double correlation (sole-fault supplier)
- q22 : scalar-subquery threshold + anti-join (q22 shape)

SURVEY.md §2.0 records the reference has no relational engine of its
own (everything is delegated to MongoDB find/aggregate); these queries
are the "widen the query surface with Spark built-ins" path called out
there. Floating aggregates are rounded identically on both sides, and
every top-k orders by a unique tie-break column so results are
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# -- q4: priority checking (EXISTS semi-join) -------------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
"""


@register("tpch_q4", _Q4_ORACLE, doc="TPC-H Q4 shape: correlated EXISTS -> left-semi join")
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01 00:00:00")
        & (F.col("o_orderdate") < "1996-10-01 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# -- q7: volume shipping between two nations (nation dim self-join) ---------

_Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


@register("tpch_q7", _Q7_ORACLE, doc="TPC-H Q7 shape: nation-dim self-join, revenue by year")
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    # supplier+nation and customer+nation are small: broadcast both sides
    s_dim = F.broadcast(supp.join(n1, supp.s_nationkey == F.col("n1_key")))
    c_dim = F.broadcast(cust.join(n2, cust.c_nationkey == F.col("n2_key")))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(s_dim, li.l_suppkey == s_dim.s_suppkey)
        .join(c_dim, orders.o_custkey == c_dim.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# -- q10: returned item reporting -------------------------------------------

_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("tpch_q10", _Q10_ORACLE, doc="TPC-H Q10: returned-item revenue, 4-way join + top-k")
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01 00:00:00")
        & (F.col("o_orderdate") < "1997-01-01 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# -- q12: conditional counts over a join (shipmode -> linestatus adapted) ----

_Q12_ORACLE = """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
"""


@register("tpch_q12", _Q12_ORACLE, doc="TPC-H Q12 shape: CASE-conditional counts over a join")
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00")
    )
    orders = _t(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# -- q13: customer order-count distribution (left outer + double agg) -------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
GROUP BY c_count
"""


@register("tpch_q13", _Q13_ORACLE, doc="TPC-H Q13: LEFT OUTER join + two-level aggregation")
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# -- q15: top supplier (revenue CTE + scalar-subquery max) ------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("tpch_q15", _Q15_ORACLE, doc="TPC-H Q15: CTE + scalar-subquery max (top supplier)")
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1996-04-01 00:00:00")
    )
    # round BEFORE the max-equality comparison so both engines compare
    # identical values (unrounded double sums differ in final ulps)
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# -- q17: correlated scalar subquery (per-part avg-quantity threshold) ------

_Q17_ORACLE = """
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (SELECT round(0.2 * avg(l2.l_quantity), 4)
                      FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""


@register(
    "tpch_q17",
    _Q17_ORACLE,
    doc="TPC-H Q17 shape: correlated scalar subquery -> per-key avg join",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    # decorrelate: per-part avg over ALL lineitems of parts in the brand;
    # threshold rounded on both sides (quantities are integral, so a
    # 1e-4-rounded threshold can't flip a row between engines)
    li_of_brand = li.join(
        F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    )
    thresholds = li_of_brand.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.round(0.2 * F.avg("l_quantity"), 4).alias("qty_threshold")
    )
    return (
        li_of_brand.join(
            F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey")
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# -- q18: large-volume customers (IN over grouped HAVING) -------------------

_Q18_ORACLE = """
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING sum(l_quantity) > 180)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey
"""


@register("tpch_q18", _Q18_ORACLE, doc="TPC-H Q18: IN over grouped-HAVING -> semi-join")
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # quantities are integral so the >180 boundary is exact in both engines
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 180)
        .select("l_orderkey")
    )
    all_orders = _t(spark, sf_dir, "orders")
    orders = all_orders.join(
        big_orders, all_orders.o_orderkey == big_orders.l_orderkey, "left_semi"
    )
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(F.round(F.sum(li.l_quantity), 2).alias("total_qty"))
    )


# -- q19: disjunctive conjunctive-range predicates --------------------------

_Q19_ORACLE = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("tpch_q19", _Q19_ORACLE, doc="TPC-H Q19 shape: OR-of-AND range predicates over join")
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    pred = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# -- q21: EXISTS + NOT EXISTS double correlation ----------------------------

_Q21_ORACLE = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""


@register(
    "tpch_q21",
    _Q21_ORACLE,
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS -> chained semi/anti joins",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    ).alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("y_orderkey"),
            F.col("l_suppkey").alias("y_suppkey"),
        )
        .alias("l3")
    )
    waiting = (
        l1.join(orders_f, F.col("l1.l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("x_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("x_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("y_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("y_suppkey")),
            "left_anti",
        )
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# -- q22: scalar-subquery threshold + anti-join -----------------------------

_Q22_ORACLE = """
SELECT cntrycode, count(*) AS numcust, round(sum(acctbal), 2) AS totacctbal
FROM (SELECT CAST(c.c_custkey % 7 AS BIGINT) AS cntrycode, c.c_acctbal AS acctbal
      FROM customer c
      WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'))
GROUP BY cntrycode
"""


@register(
    "tpch_q22",
    _Q22_ORACLE,
    doc="TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01 00:00:00")
        .select("o_custkey")
    )
    rich_no_orders = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return (
        rich_no_orders.select(
            (F.col("c_custkey") % 7).cast("long").alias("cntrycode"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("acctbal"), 2).alias("totacctbal"),
        )
    )


# -- q2 shape: min-value supplier per part (correlated min subquery) --------

_Q2_ORACLE = """
SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size = 10
  AND s.s_acctbal = (SELECT min(s2.s_acctbal)
                     FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
                     WHERE l2.l_partkey = p.p_partkey)
"""


@register(
    "tpch_q2",
    _Q2_ORACLE,
    doc="TPC-H Q2 shape: correlated min subquery -> per-key min join "
    "(supplier relation derived from lineitem; no partsupp in schema)",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    supp = _t(spark, sf_dir, "supplier")
    # candidate (part, supplier) pairs for the filtered parts
    pairs = (
        li.join(F.broadcast(part.select("p_partkey", "p_name")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
        .distinct()
    )
    # decorrelated min per part; equality on raw (unarithmetic) doubles
    # read from the same parquet is exact in both engines
    mins = pairs.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        pairs.join(
            F.broadcast(mins),
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )


# -- q9 shape: profit by nation and year ------------------------------------

_Q9_ORACLE = """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)
                 - p.p_retailprice * l.l_quantity * 0.1), 2) AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY 1, 2
"""


@register(
    "tpch_q9",
    _Q9_ORACLE,
    doc="TPC-H Q9 shape: profit per nation-year, 5-way join + LIKE filter "
    "(p_retailprice*0.1 stands in for ps_supplycost; no partsupp)",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    s_dim = F.broadcast(supp.join(nation, supp.s_nationkey == nation.n_nationkey))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(s_dim, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


# -- q11 shape: HAVING over a global scalar-subquery threshold --------------

_Q11_ORACLE = """
SELECT l_suppkey, round(sum(l_extendedprice), 2) AS value
FROM lineitem
GROUP BY l_suppkey
HAVING sum(l_extendedprice) > (SELECT sum(l_extendedprice) * 0.0005
                               FROM lineitem)
"""


@register(
    "tpch_q11",
    _Q11_ORACLE,
    doc="TPC-H Q11 shape: grouped HAVING vs global scalar-subquery fraction",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum("l_extendedprice").alias("raw_value")
    )
    threshold = li.agg((F.sum("l_extendedprice") * 0.0005).alias("thr"))
    return (
        per_supp.join(F.broadcast(threshold))
        .filter(F.col("raw_value") > F.col("thr"))
        .select("l_suppkey", F.round(F.col("raw_value"), 2).alias("value"))
    )


# -- q16 shape: distinct-count per part attributes --------------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (1, 5, 9)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register(
    "tpch_q16",
    _Q16_ORACLE,
    doc="TPC-H Q16 shape: COUNT(DISTINCT) per part attributes over a join",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 5, 9))
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# -- q20 shape: nested IN chain -> stacked semi-joins -----------------------

_Q20_ORACLE = """
SELECT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l.l_suppkey
  HAVING sum(l.l_quantity) > 60)
"""


@register(
    "tpch_q20",
    _Q20_ORACLE,
    doc="TPC-H Q20 shape: nested IN subqueries -> stacked semi-joins",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    part_small = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    # inner IN: lineitems of the selected parts (semi-join, broadcast dim)
    li_small = li.join(
        F.broadcast(part_small), li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    # quantities are integral -> the >60 HAVING boundary is exact
    heavy_supps = (
        li_small.groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 60)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return supp.join(
        F.broadcast(heavy_supps), supp.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", "s_acctbal")


# -- q8: national market share (8-way join, conditional-agg ratio by year) ---

_Q8_ORACLE = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
FROM lineitem l
JOIN part p     ON p.p_partkey  = l.l_partkey
JOIN supplier s ON s.s_suppkey  = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey  = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey  = n1.n_regionkey
JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
WHERE r.r_name = 'AMERICA'
  AND p.p_type = 'ECONOMY'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


@register(
    "tpch_q8",
    _Q8_ORACLE,
    doc="TPC-H Q8 shape: national market share - 8-way star join, "
    "conditional-aggregation ratio by order year",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of NATION_3 suppliers in AMERICA-region customer
    revenue for ECONOMY parts, by order year.

    Scale plan: the fact table (lineitem) never shuffles for the dims -
    part is filtered then broadcast, supplier+nation and
    customer+nation+region are broadcast dimension bundles, so the only
    exchange is the final tiny groupBy(o_year).
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    # customer-side dim bundle: customers in the AMERICA region
    c_dim = (
        _t(spark, sf_dir, "customer")
        .join(
            nation.select("n_nationkey", "n_regionkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(region.select("r_regionkey"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    # supplier-side dim bundle: supplier -> its nation name
    s_dim = (
        _t(spark, sf_dir, "supplier")
        .join(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(c_dim), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(s_dim), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(nation_rev) / F.sum(rev), 4).alias("mkt_share"))
    )
