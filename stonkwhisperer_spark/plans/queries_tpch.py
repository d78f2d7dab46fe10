"""Classic relational benchmark shapes (TPC-H Q3/Q6/Q18 analogues) over
the driver's star schema — the grouped-agg / join / having surface the
reference never had (SURVEY §2.5 "no grouped aggregation") but any
analytics engine must serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

_D122 = "decimal(12,2)"


# --------------------------------------------------------------------------
# Q6 shape: forecasting revenue change — tight filter + single agg.
# The canonical pushdown showcase: every predicate reaches the scan.
# --------------------------------------------------------------------------
@register(
    "forecast_revenue",
    oracle=f"""
    SELECT cast(sum(cast(l_extendedprice AS {_D122})
                    * cast(l_discount AS {_D122})) AS double) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
      AND l_shipdate <  timestamp '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: all four predicates push to the parquet scan
    (verify: PushedFilters lists shipdate/discount/quantity), single
    global agg — map-side partials reduce the exchange to one row per
    task."""
    li = load_table(spark, sf_dir, "lineitem")
    f = (
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.filter(f).agg(
        F.sum(F.col("l_extendedprice").cast(_D122) * F.col("l_discount").cast(_D122))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Q3 shape: shipping-priority top-k — join + group + order-limit.
# --------------------------------------------------------------------------
@register(
    "shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           cast(sum(cast(l.l_extendedprice AS {_D122})
                    * cast(1 - l.l_discount AS {_D122})) AS double) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < timestamp '1997-03-15 00:00:00'
      AND l.l_shipdate  > timestamp '1997-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers broadcast into
    orders, one fact⋈fact shuffle on orderkey, grouped revenue,
    TakeOrderedAndProject top-10 (no global sort). Deterministic
    tie-break on l_orderkey."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice").cast(_D122) * (F.lit(1) - F.col("l_discount")).cast(_D122)
    return (
        li.join(
            orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# ROLLUP: hierarchical subtotals region → nation → grand total (beyond
# the reference's agg surface; grouping() flags disambiguate null keys).
# --------------------------------------------------------------------------
@register(
    "revenue_rollup",
    oracle=f"""
    SELECT coalesce(r.r_name, 'ALL')                            AS region,
           coalesce(n.n_name, 'ALL')                            AS nation,
           cast(grouping(r.r_name) AS int)                      AS region_total,
           cast(grouping(n.n_name) AS int)                      AS nation_total,
           cast(sum(cast(o.o_totalprice AS {_D122})) AS double) AS revenue,
           count(*)                                             AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (region → nation → grand total) with
    grouping() indicator columns and decimal-exact totals.
    Scale: rollup expands each input row to its grouping levels before
    ONE hash aggregation — partial aggs still apply, no extra shuffle
    vs a plain groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("region_total"),
            F.grouping("n_name").cast("int").alias("nation_total"),
            F.sum(F.col("o_totalprice").cast(_D122)).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "region_total",
            "nation_total",
            "revenue",
            "n_orders",
        )
    )


# --------------------------------------------------------------------------
# Window-function breadth: rank / dense_rank / lag deltas per group
# (the ranking surface the reference lacks — SURVEY §2.6 "no rank/lag").
# --------------------------------------------------------------------------
@register(
    "customer_order_ranks",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           rank()       OVER w                       AS price_rank,
           dense_rank() OVER w                       AS price_dense_rank,
           o_totalprice - lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                                                     AS delta_vs_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_customer_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order ranking (rank + dense_rank by price) and
    order-over-order price delta (lag by date). Scale: one shuffle on
    o_custkey shared by both windows; each sorts within its partition
    only. Deterministic tie-breaks on o_orderkey."""
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w_price = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    w_date = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w_price).alias("price_rank"),
        F.dense_rank().over(w_price).alias("price_dense_rank"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w_date)).alias("delta_vs_prev"),
    )


# --------------------------------------------------------------------------
# Q18 shape: large-volume customers — agg + having + semi-join back.
# --------------------------------------------------------------------------
@register(
    "large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(cast(l_quantity AS {_D122})) > 300
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           cast(sum(cast(l.l_quantity AS {_D122})) AS double) AS total_qty
    FROM orders o
    JOIN big      ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: decimal-exact HAVING aggregate selects big
    orders, joined back through orders/customer. The textbook Q18 then
    RE-JOINS lineitem and re-sums quantity — but that sum is exactly
    the HAVING aggregate already in hand (orders are unique per key,
    so each output group is one order), so this plan carries `_q`
    through instead: one lineitem scan, no second fact⋈fact shuffle.
    Scale: the HAVING agg is map-side partial; its output (few keys)
    broadcasts into the orders join; everything after is map-only."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_D122)).alias("_q"))
        .filter(F.col("_q") > 300)
        .select(F.col("l_orderkey").alias("_big_orderkey"), "_q")
    )
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["_big_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_q").cast("double").alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# Q4 shape: order-priority counts gated on an EXISTS subquery — the
# correlated-exists pattern planned as a left-semi join.
# --------------------------------------------------------------------------
@register(
    "priority_order_counts",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= timestamp '1996-01-01 00:00:00'
      AND o.o_orderdate <  timestamp '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
)
def q_priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS expressed as a LEFT-SEMI join
    on the order key (no row duplication from multi-lineitem orders,
    no distinct needed), then a low-cardinality count. The semi join
    shuffles on orderkey; both filters push to their scans. (Q4's
    l_commitdate < l_receiptdate predicate is respec'd onto the
    returned-lineitem flag — the testdata lineitem carries no
    commit/receipt dates.)"""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    late = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q14 shape: promo revenue share — conditional aggregation over a
# fact⋈dim join with a single double division at the end.
# --------------------------------------------------------------------------
@register(
    "promo_revenue_share",
    oracle=f"""
    SELECT cast(100.0 AS double)
             * cast(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                             THEN cast(l.l_extendedprice AS {_D122})
                                  * cast(1 - l.l_discount AS {_D122})
                             ELSE cast(0 AS {_D122}) END) AS double)
             / cast(sum(cast(l.l_extendedprice AS {_D122})
                        * cast(1 - l.l_discount AS {_D122})) AS double)
           AS promo_share_pct,
           count(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= timestamp '1996-09-01 00:00:00'
      AND l.l_shipdate <  timestamp '1996-10-01 00:00:00'
    """,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — part dim broadcast into
    the date-filtered lineitem scan, both sums decimal-exact, ONE
    double division at the end (the ratio-of-sums discipline; dividing
    per-row would drift under partial aggregation)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast(_D122) * (F.lit(1) - F.col("l_discount")).cast(_D122)
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast(_D122))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            (
                F.lit(100.0).cast("double")
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_share_pct"),
            F.count("*").alias("n_rows"),
        )
    )

# --------------------------------------------------------------------------
# Q13 shape: order-count distribution — LEFT OUTER join + two-level agg.
# --------------------------------------------------------------------------
@register(
    "cust_order_dist",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k orders. LEFT OUTER
    join (the non-F status predicate lives in the join condition, NOT a
    post-filter — a post-filter would silently turn the join inner and
    lose zero-order customers), count per customer, then re-aggregate
    into the distribution. Scale: first agg shuffles on custkey (high
    card, uniform); second is a tiny low-card rollup."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    per_cust = (
        cust.join(
            orders,
            (cust["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderstatus"] != "F"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q22 shape: rich customers with no orders — scalar-subquery threshold
# + anti join, grouped by nation.
# --------------------------------------------------------------------------
@register(
    "idle_rich_customers",
    oracle=f"""
    SELECT n.n_name AS nation,
           count(*) AS n_cust,
           cast(sum(cast(c.c_acctbal AS {_D122})) AS double) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
        SELECT cast(avg(cast(c_acctbal AS {_D122})) AS double)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY n.n_name
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone-prefix respec'd to nation): customers
    with above-average balance and no orders. The scalar AVG subquery
    becomes a 1-row broadcast cross join (NOT a .collect() round trip —
    the threshold stays in the plan, one job); NOT EXISTS is a
    LEFT-ANTI join on custkey; nation dim broadcasts. The avg is
    decimal-exact then cast, so partial-agg order can't drift it."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    threshold = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg(F.col("c_acctbal").cast(_D122)).cast("double").alias("_avg_bal"))
    )
    return (
        cust.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast(_D122)).cast("double").alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q2 shape: correlated max — the best customer(s) per nation.
# --------------------------------------------------------------------------
@register(
    "top_customer_per_nation",
    oracle="""
    SELECT n.n_name AS nation, c.c_name, c.c_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal = (
      SELECT max(c2.c_acctbal) FROM customer c2
      WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
)
def q_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-max subquery, planned as a
    grouped max + equi-join back (ties kept, same as the correlated
    form). Scale: per-group max is a map-side-combined agg on a
    25-key column → tiny frame → broadcast back into the fact; no
    window sort over the full table needed. Exact equality on the
    untouched double is safe — both sides compare the same stored
    value, no arithmetic."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    best = (
        cust.groupBy(F.col("c_nationkey").alias("_nk"))
        .agg(F.max("c_acctbal").alias("_max_bal"))
    )
    return (
        cust.join(
            F.broadcast(best),
            (F.col("c_nationkey") == F.col("_nk"))
            & (F.col("c_acctbal") == F.col("_max_bal")),
        )
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(F.col("n_name").alias("nation"), "c_name", "c_acctbal")
    )


# --------------------------------------------------------------------------
# Q20 shape: nested semi-join chain — suppliers who shipped STEEL parts.
# --------------------------------------------------------------------------
@register(
    "steel_part_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey
        AND EXISTS (
          SELECT 1 FROM part p
          WHERE p.p_partkey = l.l_partkey AND p.p_type LIKE '%STEEL%'
        )
        AND l.l_shipdate >= timestamp '1996-01-01 00:00:00'
    )
    """,
)
def q_steel_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp respec'd to shipped lineitems): the
    nested-EXISTS chain planned inside-out as two semi joins — part
    filter broadcasts into the date-filtered lineitem scan (semi), and
    the surviving suppkeys semi-join supplier. No row duplication at
    any level, so no distinct; both filters push to their scans."""
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    )
    steel = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").like("%STEEL%")
    )
    steel_li = li.join(
        F.broadcast(steel), li["l_partkey"] == steel["p_partkey"], "left_semi"
    )
    return supp.join(
        steel_li, supp["s_suppkey"] == steel_li["l_suppkey"], "left_semi"
    )


# --------------------------------------------------------------------------
# Q11 shape: value share with HAVING against a global-scalar fraction.
# --------------------------------------------------------------------------
@register(
    "part_value_share",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey,
             sum(cast(l_extendedprice AS {_D122}) * cast(l_quantity AS {_D122}))
               AS value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, cast(value AS double) AS part_value
    FROM rev
    WHERE value > (SELECT sum(value) * 0.001 FROM rev)
    """,
)
def q_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value, keep parts above a fraction of
    the GLOBAL total — the grouped-agg-vs-its-own-rollup pattern. The
    per-part frame feeds both the rows and the threshold (a 1-row
    broadcast cross join, NOT a .collect() round trip), so it's cached:
    without the cache Spark plans TWO full lineitem scans (exchange
    reuse doesn't fire across the branches — verified on the physical
    plan), and at 100 TB re-scanning the fact to derive a |parts|-sized
    frame twice is the bug. The per-part sums stay decimal-exact; the
    HAVING threshold (sum * 0.001) promotes to double on BOTH engines
    (Spark and DuckDB make the same promotion), so the compare is
    double arithmetic but engine-consistent; doubles are cast only in
    the output projection."""
    li = load_table(spark, sf_dir, "lineitem")
    # localCheckpoint, not cache(): a lazy builder can never unpersist,
    # and CacheManager entries pin executor storage memory for the whole
    # session — checkpoint blocks are instead freed by the ContextCleaner
    # once the frame is unreferenced, so registry sweeps don't accumulate.
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_D122) * F.col("l_quantity").cast(_D122)
            ).alias("value")
        )
        .localCheckpoint(eager=True)
    )
    total = rev.agg((F.sum("value") * F.lit(0.001)).alias("_threshold"))
    return (
        rev.join(F.broadcast(total))
        .filter(F.col("value") > F.col("_threshold"))
        .select("l_partkey", F.col("value").cast("double").alias("part_value"))
    )


# --------------------------------------------------------------------------
# CUBE: all grouping combinations of (region, order status) — the
# grouping-sets surface beyond ROLLUP's hierarchy.
# --------------------------------------------------------------------------
@register(
    "revenue_cube",
    oracle=f"""
    SELECT coalesce(r.r_name, 'ALL')          AS region,
           coalesce(o.o_orderstatus, 'ALL')   AS status,
           cast(grouping(r.r_name) AS int)    AS region_total,
           cast(grouping(o.o_orderstatus) AS int) AS status_total,
           cast(sum(cast(o.o_totalprice AS {_D122})) AS double) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE(r.r_name, o.o_orderstatus)
    """,
)
def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, order status): all four grouping combinations
    in ONE hash aggregation (each input row expands to its grouping
    levels map-side; partials still apply — same cost model as rollup,
    ×4 expansion instead of ×3). grouping() flags disambiguate the
    natural nulls from subtotal nulls."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        joined.cube("r_name", "o_orderstatus")
        .agg(
            F.grouping("r_name").cast("int").alias("region_total"),
            F.grouping("o_orderstatus").cast("int").alias("status_total"),
            F.sum(F.col("o_totalprice").cast(_D122)).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "region_total",
            "status_total",
            "revenue",
            "n_orders",
        )
    )


# --------------------------------------------------------------------------
# Q18 shape: large-quantity orders — grouped HAVING feeding a join chain.
# --------------------------------------------------------------------------
@register(
    "big_order_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, sum(cast(l_quantity AS {_D122})) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(cast(l_quantity AS {_D122})) > 250
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           cast(o.o_totalprice AS double) AS total_price,
           cast(b.sum_qty AS double)      AS sum_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose summed line quantity clears a
    threshold, joined back to orders and customers. The HAVING agg runs
    FIRST (one shuffle on orderkey, map-side partials, decimal-exact),
    so the join chain sees only the ~0.2% surviving orderkeys — at
    100 TB the selective side drives the join, and AQE converts the
    orders/customer probes to broadcasts when the survivor set is
    small. Quantity sums are decimal so the HAVING cut is exact on both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_D122)).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("total_price"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# Q21 shape: the EXISTS / NOT-EXISTS pair, decomposed to one aggregation.
# --------------------------------------------------------------------------
@register(
    "sole_return_suppliers",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS n_ret_supp
      FROM lineitem GROUP BY l_orderkey
    ),
    sole AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN per_order p ON l.l_orderkey = p.l_orderkey
      WHERE l.l_returnflag = 'R' AND p.n_supp > 1 AND p.n_ret_supp = 1
    )
    SELECT s.s_name, count(*) AS n_sole_return_orders
    FROM sole JOIN supplier s ON sole.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
)
def q_sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who alone kept an order waiting,
    respec'd to the returns flag this schema carries): for each
    multi-supplier order with EXACTLY ONE supplier having returned
    lines, count such orders per supplier. The correlated
    EXISTS/NOT-EXISTS pair is decomposed into ONE per-order aggregation
    (count distinct suppliers / returning suppliers) joined back to the
    returning lines — two shuffles on orderkey total, instead of the
    two correlated re-scans a literal EXISTS translation would plan; at
    100 TB the dual-distinct aggregate is the only formulation that
    avoids re-reading the fact twice. Supplier dim joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    sole = (
        li.filter(F.col("l_returnflag") == "R")
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        sole.join(
            F.broadcast(supp.select("s_suppkey", "s_name")),
            sole["l_suppkey"] == supp["s_suppkey"],
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("n_sole_return_orders"))
    )


# --------------------------------------------------------------------------
# Q17 shape: correlated scalar subquery (per-part average) → join-vs-agg.
# --------------------------------------------------------------------------
@register(
    "small_order_part_revenue",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey, count(*) AS n,
             sum(cast(l_quantity AS {_D122})) AS sum_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT cast(sum(cast(l.l_extendedprice AS {_D122})) AS double) / 7.0
             AS avg_yearly
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE cast(l.l_quantity AS {_D122}) * 5 * pa.n < pa.sum_qty
    """,
)
def q_small_order_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below 20%
    of their part's average — the correlated scalar subquery rewritten
    as one per-part aggregate joined back to the fact (Catalyst plans
    the literal subquery the same way; writing the join makes the
    single-shuffle-on-partkey shape explicit). The 20%-of-average
    predicate is cross-multiplied (5·qty·n < Σqty) so the comparison is
    decimal-exact on both engines — avg() would introduce an
    engine-ordered double division inside a row filter, which can flip
    boundary rows. One row out; the final double division is a single
    IEEE op, identical everywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast(_D122)).alias("sum_qty"),
    )
    return (
        li.join(pa, "l_partkey")
        .filter(F.col("l_quantity").cast(_D122) * 5 * F.col("n") < F.col("sum_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_D122)).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


# --------------------------------------------------------------------------
# The SQL entry point itself: one dialect-portable SQL string is BOTH the
# Spark query (spark.sql over registered views) and the DuckDB oracle —
# proving the engine's SQL surface end to end, not just the DataFrame API.
# --------------------------------------------------------------------------
_TOP_BRANDS_SQL = """
    WITH rev AS (
      SELECT r.r_name AS region, p.p_brand AS brand,
             sum(cast(l.l_extendedprice AS decimal(12,2))
                 * cast(1 - l.l_discount AS decimal(12,2))) AS rev
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, p.p_brand
    ),
    ranked AS (
      SELECT region, brand, rev,
             rank() OVER (PARTITION BY region
                          ORDER BY rev DESC, brand) AS brand_rank
      FROM rev
    )
    SELECT region, brand,
           cast(rev AS double)        AS revenue,
           cast(brand_rank AS int)    AS brand_rank
    FROM ranked
    WHERE brand_rank <= 3
"""


@register("sql_top_brands_by_region", oracle=_TOP_BRANDS_SQL)
def q_sql_top_brands_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 part brands by discounted revenue per region, executed via
    ``spark.sql`` over registered temp views — the SAME SQL text DuckDB
    runs as the oracle (dialect-portable ANSI: decimal-exact agg, rank
    with explicit tie-break, casts in the projection). This gates the
    SQL API surface itself: parser → analyzer (view resolution) →
    Catalyst, not just the DataFrame builders.

    Scale: Catalyst plans the identical physical shape as the
    DataFrame twin — dims broadcast under the fact join chain, one
    agg shuffle on (region, brand), rank over the small grouped
    output."""
    from stonkwhisperer_spark.flows import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TOP_BRANDS_SQL)


# --------------------------------------------------------------------------
# Q7 shape: bidirectional trade volume between two nations by year.
# --------------------------------------------------------------------------
@register(
    "nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           cast(sum(cast(l.l_extendedprice AS {_D122})
                    * cast(1 - l.l_discount AS {_D122})) AS double) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY n1.n_name, n2.n_name, ship_year
    """,
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between two specific nations in
    either direction, by year — the disjunctive cross-dimension pair
    filter. Both nation dims broadcast; the pair predicate applies
    AFTER the joins (it references both sides), but each single-side
    membership (nation ∈ {A, B}) is pushed into its dim broadcast so
    the fact rows joining irrelevant nations drop at the probe.

    Scale: the only shuffles are lineitem⋈orders on orderkey and the
    final low-card agg; supplier/customer/nation all broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pair = nation.filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    n1 = pair.select(F.col("n_nationkey").alias("k1"), F.col("n_name").alias("supp_nation"))
    n2 = pair.select(F.col("n_nationkey").alias("k2"), F.col("n_name").alias("cust_nation"))
    rev = F.col("l_extendedprice").cast(_D122) * (F.lit(1) - F.col("l_discount")).cast(_D122)
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("k1"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("k2"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q15 shape: top supplier(s) by windowed revenue — max over a grouped agg.
# --------------------------------------------------------------------------
@register(
    "top_supplier_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             sum(cast(l_extendedprice AS {_D122})
                 * cast(1 - l_discount AS {_D122})) AS total
      FROM lineitem
      WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
        AND l_shipdate <  timestamp '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, cast(r.total AS double) AS total_revenue
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total = (SELECT max(total) FROM rev)
    """,
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — a grouped aggregate compared against its own global max.
    The max joins back as a 1-row broadcast (no collect round trip);
    the comparison is DECIMAL equality on the exact sums, so ties are
    exact and engine-identical (a double max-compare could drop a tied
    supplier on one engine only). The rev frame is localCheckpointed:
    both branches (rows + max) read it without a second lineitem scan.

    Scale: one suppkey shuffle; the date filter pushes to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_D122)
                * (F.lit(1) - F.col("l_discount")).cast(_D122)
            ).alias("total")
        )
        .localCheckpoint(eager=True)
    )
    mx = rev.agg(F.max("total").alias("_mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total") == F.col("_mx"))
        .join(F.broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"])
        .select(
            "s_suppkey", "s_name", F.col("total").cast("double").alias("total_revenue")
        )
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive multi-clause predicate across a join.
# --------------------------------------------------------------------------
@register(
    "disjunctive_promo_revenue",
    oracle=f"""
    SELECT cast(sum(cast(l.l_extendedprice AS {_D122})
                    * cast(1 - l.l_discount AS {_D122})) AS double) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 5 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 45)
    """,
)
def q_disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR'd brand/size/quantity clause bundles
    across the lineitem⋈part join. Catalyst extracts the
    common-to-all-clauses parts: the part-side disjunction of
    (brand, size) ranges prunes the broadcast build side, and the
    quantity bounds (1..45 overall) push to the fact scan, so the OR
    does not defeat pushdown — the full predicate then re-applies on
    the joined row.

    Scale: part broadcasts; single fact scan, no shuffle before the
    1-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 45)
        )
    )
    return joined.filter(clause).agg(
        F.sum(
            F.col("l_extendedprice").cast(_D122)
            * (F.lit(1) - F.col("l_discount")).cast(_D122)
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )
