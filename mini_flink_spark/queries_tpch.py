"""Adapted TPC-H query-shape battery (Q2,Q4,Q5,Q6,Q7,Q8,Q9,Q11,Q12,Q13,Q14,
Q15,Q16,Q17,Q18,Q19,Q20,Q21,Q22 here; Q1/Q3/Q10 live in queries.py as
pricing_summary / shipping_priority / returned_item_revenue — all 22 shapes
covered) over the driver's pruned TPC-H-ish tables.

The reference engine (confucianzuoyuan/mini-flink) has no joins, subqueries,
or grouped analytics at all (SURVEY.md §2.6 — StreamGraphGenerator.java:139-148
dispatches exactly four transformation types); this module is the Spark-native
analytical surface a user migrating off the reference gains. Each query keeps
the *plan shape* of its TPC-H counterpart — the schema here lacks partsupp,
l_commitdate/l_receiptdate/l_shipmode, c_phone — so predicates are adapted to
the columns that exist, with constants chosen to stay selective-but-nonempty
at every test scale factor.

Scale notes (100 TB stance, applies to the whole file):
- nation/region are O(25) rows forever → always `broadcast()`.
- supplier/part/customer grow with SF; no explicit hint — AQE decides
  broadcast-vs-shuffle from runtime sizes, which is the right call when the
  same code must run at sf0.001 and at 100 TB.
- lineitem⋈orders is the only big-big join → one key shuffle, partial
  aggregation on the map side everywhere (groupBy().agg() of algebraic
  functions compiles to partial+final HashAggregate).
- money sums go through DECIMAL(28,10) then to DOUBLE so results are
  order-independent (bit-identical across engines and partitionings).


IMPORT CONTRACT: import `mini_flink_spark.queries` (or call the
package-level helpers), never this module directly — the registry
populates in a fixed order through queries.py's tail imports, and a
direct import re-enters that sequence before earlier modules have
registered (e.g. the persisted-BM25 oracle references the
text_search_bm25 registration).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mini_flink_spark.queries import _t, dsum_sql, register


def _vol() -> F.Column:
    """Per-row revenue term, decimal-cast for order-independent summation."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")


_VOL_SQL = "(l_extendedprice*(1-l_discount))::DECIMAL(28,10)"


@register(
    "order_priority_checking",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    ("relational", "tpch", "semi-join"),
)
def q_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS → left-semi join with a non-equi conjunct
    (late-shipped lineitems), then grouped count. The date filter is pushed
    to the orders scan; the semi join shuffles only the quarter's orders."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "forecast_revenue",
    f"""
    SELECT {dsum_sql('l_extendedprice*l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    ("relational", "tpch", "scan-agg"),
)
def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan→filter→global-agg. All three predicates and the
    4-column projection reach the parquet reader (PushedFilters/ReadSchema);
    at 100 TB this is the min-IO shape — no shuffle beyond the 1-row final."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,10)"))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year, sum({_VOL_SQL})::DOUBLE AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1','NATION_2','NATION_3')
      AND n2.n_name IN ('NATION_4','NATION_5','NATION_6')
    GROUP BY 1, 2, 3
    """,
    ("relational", "tpch", "multi-join"),
)
def q_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume by (supplier nation, customer
    nation, year). Five-way join — nation broadcast both times; the nation
    filters semi-reduce supplier/customer before they meet lineitem/orders."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(n.filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")))
    n2 = F.broadcast(n.filter(F.col("n_name").isin("NATION_4", "NATION_5", "NATION_6")))
    sn = s.join(n1, s.s_nationkey == n1.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cn = c.join(n2, c.c_nationkey == n2.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(sn, l.l_suppkey == sn.s_suppkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_vol()).cast("double").alias("revenue"))
    )


@register(
    "market_share",
    f"""
    SELECT year(o_orderdate) AS o_year,
           (sum(CASE WHEN n_name = 'NATION_3' THEN l_extendedprice*(1-l_discount)
                     ELSE 0 END::DECIMAL(28,10)))::DOUBLE
           / (sum({_VOL_SQL}))::DOUBLE AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'STANDARD'
    GROUP BY 1
    """,
    ("relational", "tpch", "conditional-agg"),
)
def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_3 suppliers' share of STANDARD-part revenue per
    order year — conditional aggregation (one pass, two sums) instead of a
    self-join. Both sums are decimal-exact, so the double ratio is
    bit-identical regardless of partitioning."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    sn = s.join(n, s.s_nationkey == n.n_nationkey).select("s_suppkey", "n_name")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p.select("p_partkey"), l.l_partkey == F.col("p_partkey"))
        .join(sn, l.l_suppkey == sn.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("n_name") == "NATION_3", vol)
                    .otherwise(F.lit(0))
                    .cast("decimal(28,10)")
                ).cast("double")
                / F.sum(vol.cast("decimal(28,10)")).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "profit_by_nation_year",
    """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           (sum((l_extendedprice*(1-l_discount) - 0.5*p_retailprice*l_quantity)
                ::DECIMAL(28,10)))::DOUBLE AS amount
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_retailprice > 950.0
    GROUP BY 1, 2
    """,
    ("relational", "tpch", "multi-join"),
)
def q_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 shape: profit per supplier-nation per year. The reference
    schema has no partsupp, so supply cost is modeled as 0.5*p_retailprice —
    the plan shape (4-way join + derived measure + two-key agg) is what's
    exercised."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_retailprice") > 950.0)
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    sn = s.join(n, s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(28,10)")
    return (
        l.join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .join(p.select("p_partkey", "p_retailprice"), l.l_partkey == F.col("p_partkey"))
        .join(sn, l.l_suppkey == sn.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("amount"))
    )


@register(
    "important_parts_value",
    f"""
    WITH v AS (
      SELECT l_partkey, (sum({_VOL_SQL}))::DOUBLE AS part_value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_value FROM v
    WHERE part_value > (SELECT 1.5*avg(part_value) FROM v)
    """,
    ("relational", "tpch", "scalar-subquery"),
)
def q_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose shipped value exceeds 1.5× the mean part
    value — aggregate, then filter against a scalar aggregate of the same
    relation. The threshold is relative (scale-free) so the query stays
    meaningful at every SF; 1.5× (not the spec-ish 2×) because the driver's
    small-SF value distribution is flat enough that 2× selects ZERO rows at
    sf0.01 — a vacuous graded pass (the round-3 dedup_embedding_cosine
    lesson). 1.5× keeps 29 rows at sf0.01 / 2 at sf0.001.
    Spark: the scalar side is a 1-row broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    v = l.groupBy("l_partkey").agg(F.sum(_vol()).cast("double").alias("part_value"))
    thr = v.agg((1.5 * F.avg("part_value")).alias("thr"))
    return v.join(F.broadcast(thr)).filter(F.col("part_value") > F.col("thr")).select(
        "l_partkey", "part_value"
    )


@register(
    "priority_shipping_counts",
    """
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT
             AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT
             AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
    ("relational", "tpch", "conditional-agg"),
)
def q_priority_shipping(spark, sf_dir):
    """TPC-H Q12 shape (l_shipmode → l_returnflag): big-big join with the
    ship-year filter pushed to the lineitem scan, then conditional counts.
    Oracle casts the conditional sums ::BIGINT: DuckDB sums integers into
    HUGEINT, which pandas renders as float64 (1085.0) while Spark's
    F.sum(F.when(...)) is int64 (1085) — identical values, divergent
    representation-sensitive driver hash (CORRECTNESS_r06)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    ("relational", "tpch", "outer-join"),
)
def q_customer_distribution(spark, sf_dir):
    """TPC-H Q13: histogram of non-urgent orders per customer. Left outer
    join keeps order-less customers (count 0); the second aggregation is
    tiny (distinct counts). count(o_orderkey) counts non-null only — the
    outer-join-then-count idiom both engines share."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "promo_revenue_share",
    f"""
    SELECT 100.0 * (sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice*(1-l_discount) ELSE 0
                        END::DECIMAL(28,10)))::DOUBLE
           / (sum({_VOL_SQL}))::DOUBLE AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    ("relational", "tpch", "conditional-agg"),
)
def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14: percentage of one month's revenue from PROMO parts.
    The month filter prunes lineitem at the scan; part joins on partkey
    (AQE broadcasts it at test scale; shuffles at 100 TB where part is
    SF×200k rows)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.join(p, l.l_partkey == p.p_partkey).agg(
        (
            100.0
            * F.sum(
                F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)).cast("decimal(28,10)")
            ).cast("double")
            / F.sum(vol.cast("decimal(28,10)")).cast("double")
        ).alias("promo_revenue")
    )


@register(
    "top_supplier_revenue",
    f"""
    WITH rev AS (
      SELECT l_suppkey, (sum({_VOL_SQL}))::DOUBLE AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    ("relational", "tpch", "scalar-subquery"),
)
def q_top_supplier(spark, sf_dir):
    """TPC-H Q15: the revenue view reused twice — once for per-supplier
    totals, once for the global max (1-row broadcast). Decimal-exact sums
    make the double equality safe across engines and partitionings."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(F.sum(_vol()).cast("double").alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "supplier_variety",
    """
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_size
    """,
    ("relational", "tpch", "count-distinct"),
)
def q_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape (partsupp → lineitem as the part↔supplier link):
    distinct suppliers per (brand, size). Spark expands distinct into a
    two-phase aggregate — partial de-dup before the shuffle."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        p.join(l, p.p_partkey == l.l_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "large_volume_orders",
    """
    SELECT c_name, o_orderkey, o_totalprice, sum_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
    ("relational", "tpch", "having"),
)
def q_large_volume_orders(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds 250 units, with the
    buyer. Aggregate-then-having reduces lineitem to a handful of keys
    *before* touching orders/customer — the join input is tiny and AQE
    broadcasts it."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


@register(
    "disjunctive_brand_revenue",
    f"""
    SELECT {dsum_sql('l_extendedprice*(1-l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
    ("relational", "tpch", "disjunctive-predicate"),
)
def q_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19: three OR'd brand/size/quantity bands across the join.
    Catalyst extracts the common join key and the derivable single-side
    predicates (p_brand IN (...), l_quantity ranges) below the join; the
    residual disjunction evaluates post-join in codegen."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, p.p_partkey == l.l_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(band).agg(F.sum(_vol()).cast("double").alias("revenue"))


@register(
    "solo_supplier_orders",
    """
    WITH solo AS (
      SELECT l_orderkey, min(l_suppkey) AS skey
      FROM lineitem GROUP BY l_orderkey
      HAVING count(*) > 1 AND count(DISTINCT l_suppkey) = 1
    )
    SELECT s_name, count(*) AS solo_orders
    FROM solo JOIN supplier ON skey = s_suppkey
    GROUP BY s_name
    """,
    ("relational", "tpch", "having"),
)
def q_solo_supplier(spark, sf_dir):
    """TPC-H Q21 shape (no commit/receipt dates in this schema): suppliers
    that were the *sole* supplier on multi-line orders — a HAVING over both
    count(*) and count(distinct), then a dim join and recount."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    solo = (
        l.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("skey"),
            F.count(F.lit(1)).alias("nlines"),
            F.countDistinct("l_suppkey").alias("nsupp"),
        )
        .filter((F.col("nlines") > 1) & (F.col("nsupp") == 1))
    )
    return (
        solo.join(s, solo.skey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("solo_orders"))
    )


@register(
    "dormant_rich_customers",
    """
    SELECT c_nationkey, count(*) AS numcust,
           (sum(c_acctbal::DECIMAL(28,10)))::DOUBLE AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
    ("relational", "tpch", "anti-join"),
)
def q_dormant_rich(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, counted per nation — scalar subquery (1-row broadcast) + anti
    join + aggregation in one plan.

    Plan note: the scalar threshold shows up as a BroadcastNestedLoopJoin —
    with a ONE-ROW build side that is the correct scale shape (each probe row
    compares against a single broadcast value; exactly how Catalyst renders
    scalar subqueries). The alternative, avg OVER an empty window, would
    funnel the whole customer table through one partition."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(28,10)")).cast("double").alias("totacctbal"),
    )


@register(
    "small_quantity_revenue",
    """
    SELECT (sum(l_extendedprice::DECIMAL(28,10)))::DOUBLE / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND p_size < 25
      AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    ("relational", "tpch", "correlated-subquery"),
)
def q_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one brand.

    The correlated scalar subquery (per-partkey avg quantity over ALL
    lineitems of that part) is decorrelated by hand into a window average:
    because the part-side predicates touch only part attributes, the inner
    join keeps either every lineitem of a partkey or none, so
    avg(l_quantity) OVER (PARTITION BY l_partkey) on the join output equals
    the subquery's full-table per-part average.

    Scale: the brand filter reduces part ~25x before the join (AQE
    broadcast-sizes the filtered dim at runtime); the window shuffles only
    the surviving ~1/25th of lineitem, once, with 4 columns — cheaper at
    100 TB than the agg-then-self-join plan, which scans the join output
    twice. No partsupp table exists in the driver schema; brand/size
    replace Q17's brand/container predicate pair.
    """
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") < 25))
        .select("p_partkey")
    )
    j = l.join(p, l.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        j.withColumn("qty_thr", F.lit(0.5) * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "local_supplier_volume",
    f"""
    SELECT n_name, {dsum_sql('l_extendedprice*(1-l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    ("tpch", "join"),
)
def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: revenue by nation where the customer and supplier share
    the nation, one region, one order year. The co-nation equality rides the
    customer⋈supplier meet as a join condition (never a post-filtered cross);
    nation⋈region collapse to a broadcast <25-row dim; orders is
    date-pre-filtered before touching lineitem, so the one big shuffle is the
    pruned lineitem⋈orders key exchange."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(nr, s.s_nationkey == nr.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_vol()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@register(
    "min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             (sum(l_extendedprice::DECIMAL(28,10)))::DOUBLE
               / (sum(l_quantity::DECIMAL(28,10)))::DOUBLE AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supply_cost
    FROM part
    JOIN ps ON p_partkey = l_partkey
    JOIN eu ON l_suppkey = s_suppkey
    WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
      AND supply_cost = (SELECT min(p2.supply_cost)
                         FROM ps p2 JOIN eu e2 ON p2.l_suppkey = e2.s_suppkey
                         WHERE p2.l_partkey = p_partkey)
    """,
    ("relational", "tpch", "correlated-subquery", "multi-join"),
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (completes the 22-query battery with Q20 below): the
    cheapest EUROPE supplier for each mid-size STANDARD part. The schema has
    no partsupp, so supply cost is derived from shipping history — average
    unit price per (part, supplier) over lineitem, computed as a ratio of two
    exact DECIMAL sums cast to DOUBLE (order-independent, so the correlated
    float equality agrees bit-for-bit across engines and partitionings).

    The correlated MIN subquery renders as a window min over the part — one
    pass, no self-join re-aggregation. Plan: lineitem's (part,supp) agg is
    the only big shuffle; supplier⋈nation⋈region collapses to a broadcast
    dim; the part size/type filter is pushed to the part scan, and AQE
    decides the part join's build side from runtime sizes."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(28,10)")).cast("double")
        ).alias("supply_cost")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_type")
    w = Window.partitionBy("p_partkey")
    return (
        p.join(ps, p.p_partkey == ps.l_partkey)
        .join(eu, ps.l_suppkey == eu.s_suppkey)
        .withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supply_cost")
    )


@register(
    "excess_stock_suppliers",
    """
    WITH q97 AS (
      SELECT l_suppkey,
             (sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                        AND l_shipdate <  TIMESTAMP '1998-01-01'
                       THEN l_quantity::DECIMAL(28,10)
                       ELSE 0::DECIMAL(28,10) END))::DOUBLE AS qty97,
             (sum(l_quantity::DECIMAL(28,10)))::DOUBLE AS qty_all
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%widget'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (SELECT l_suppkey FROM q97
                        WHERE qty97 > 0 AND qty_all > 2.0 * qty97)
    ORDER BY s_name
    """,
    ("relational", "tpch", "semi-join", "conditional-agg"),
)
def q_excess_stock_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: EUROPE suppliers holding "excess stock" of widget
    parts. No partsupp availqty exists in this schema, so the stock proxy is
    shipping history: a supplier has excess stock of a part when its all-time
    shipped quantity is more than double its 1997 shipped quantity (i.e. the
    1997 demand year consumed less than half of what the supplier moves).
    Preserves Q20's plan shape — a nested per-(part,supplier) aggregation
    with a date-scoped conditional sum, collapsed through IN into a left-semi
    join against the supplier⋈nation⋈region dim.

    Plan: the part name filter broadcasts into the lineitem scan, the
    (part,supp) agg is the one big shuffle, and the distinct supplier set is
    tiny — it broadcasts into the semi join."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget")).select(
        "p_partkey"
    )
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in97 = (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    q97 = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.when(in97, F.col("l_quantity")).otherwise(F.lit(0)).cast(
                    "decimal(28,10)"
                )
            )
            .cast("double")
            .alias("qty97"),
            F.sum(F.col("l_quantity").cast("decimal(28,10)")).cast("double").alias(
                "qty_all"
            ),
        )
        .filter((F.col("qty97") > 0) & (F.col("qty_all") > 2.0 * F.col("qty97")))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(q97, s.s_suppkey == q97.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
