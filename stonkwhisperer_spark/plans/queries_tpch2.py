"""Round-5 relational benchmark shapes: the TPC-H analogues still
missing after queries_tpch.py (Q8 market share, Q9 product profit,
Q10 returned-item reporting, Q12 shipping buckets, Q16 supplier
counts). Like the rest of the TPC-H surface these extend past the
reference's query inventory (SURVEY §2.5 — the reference has no
grouped aggregation at all); they exist so a user of ANY analytics
engine can run the classic star-schema shapes here.

Hash-parity discipline (same as queries_tpch.py): money math is summed
over DECIMAL(12,2) so partial-agg order cannot drift the hash; doubles
appear only in the final projection; ratios divide two exact decimal
sums after casting both to double, which both engines evaluate
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

_D122 = "decimal(12,2)"

# Revenue expression shared by Q8/Q9/Q10 shapes (decimal-exact).
_REV_SQL = f"cast(l_extendedprice AS {_D122}) * cast(1 - l_discount AS {_D122})"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice").cast(_D122) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_D122)


# --------------------------------------------------------------------------
# Q10 shape: returned-item reporting — which customers returned the most
# revenue in a quarter. 3 joins + grouped agg + top-k.
# --------------------------------------------------------------------------
@register(
    "returned_item_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           cast(sum({_REV_SQL}) AS double) AS lost_revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= timestamp '1996-10-01 00:00:00'
      AND o.o_orderdate <  timestamp '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: quarter-filtered orders join return-flagged
    lineitems on orderkey (the one fact⋈fact shuffle), then the
    customer and nation dims broadcast in; grouped revenue, top-20 via
    TakeOrderedAndProject (no global sort). The returnflag and date
    predicates push to the scans, so the shuffle carries only the
    returned quarter — at 100 TB that is the difference between
    shuffling ~2% of lineitem and all of it."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_col()).cast("double").alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q12 shape: shipping-delay buckets × order-priority class. The driver
# schema has no l_shipmode/l_receiptdate, so the Q12 GROUP BY column is
# respecced as the order→ship delay bucket (30-day bins) — same shape:
# fact⋈fact join + CASE-conditional counts per low-cardinality group.
# --------------------------------------------------------------------------
@register(
    "shipping_delay_priority",
    oracle="""
    SELECT cast(floor(date_diff('day', o.o_orderdate, l.l_shipdate) / 30.0)
                AS int)                                            AS delay_bucket,
           count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
                                                                   AS high_line_count,
           count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                                                                   AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate
    GROUP BY delay_bucket
    """,
)
def q_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: orders⋈lineitem on orderkey, conditional counts
    split by priority class, grouped by the 30-day ship-delay bucket.
    Both datediff semantics truncate to day boundaries (Spark datediff
    == DuckDB date_diff('day')), and the bucket floor-divides in double
    then casts int — identical on both engines. The join-key shuffle is
    the only exchange; the grouped agg on a handful of buckets runs as
    a map-side partial first."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .withColumn(
            "delay_bucket",
            F.floor(F.datediff("l_shipdate", "o_orderdate") / 30.0).cast("int"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q8 shape: national market share — one supplier-nation's fraction of
# regional import volume per year. The classic conditional-share agg.
# --------------------------------------------------------------------------
_SHARE_NATION = "NATION_3"


@register(
    "nation_market_share",
    oracle=f"""
    WITH base AS (
      SELECT year(o.o_orderdate) AS o_year,
             {_REV_SQL}          AS volume,
             ns.n_name           AS supp_nation
      FROM lineitem l
      JOIN orders o    ON o.o_orderkey  = l.l_orderkey
      JOIN customer c  ON c.c_custkey   = o.o_custkey
      JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
      JOIN region r    ON r.r_regionkey  = nc.n_regionkey
      JOIN supplier s  ON s.s_suppkey   = l.l_suppkey
      JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
      JOIN part p      ON p.p_partkey   = l.l_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    )
    SELECT o_year,
           cast(sum(CASE WHEN supp_nation = '{_SHARE_NATION}'
                         THEN volume ELSE cast(0 AS decimal(12,2)) END) AS double)
             / cast(sum(volume) AS double)                AS mkt_share,
           cast(sum(volume) AS double)                    AS total_volume
    FROM base GROUP BY o_year
    """,
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: seven-table star join — ASIA-region customers'
    STANDARD-part import volume per year, with NATION_3's supplier
    share of it. All five dims broadcast (region/nation twice via
    aliased copies, customer, supplier, part); the only shuffles are
    lineitem⋈orders on orderkey and the final per-year agg. Share =
    conditional decimal sum / total decimal sum, both exact, divided
    as doubles — no floating-point accumulation anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    nation_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    nation_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    zero = F.lit(0).cast(_D122)
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("volume", _rev_col())
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == _SHARE_NATION, F.col("volume")).otherwise(zero)).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share"),
            F.sum("volume").cast("double").alias("total_volume"),
        )
    )


# --------------------------------------------------------------------------
# Q9 shape: product-type profit by supplier nation × year.
# --------------------------------------------------------------------------
@register(
    "product_profit_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           cast(sum({_REV_SQL}) AS double) AS profit
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey   = l.l_orderkey
    JOIN supplier s ON s.s_suppkey    = l.l_suppkey
    JOIN nation n   ON n.n_nationkey  = s.s_nationkey
    JOIN part p     ON p.p_partkey    = l.l_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    """,
)
def q_product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on widget-named parts grouped by supplier
    nation and order year. (The driver schema has no partsupp, so
    profit omits Q9's supplycost term — the join/agg shape is what is
    exercised.) The p_name LIKE filter prunes part BEFORE the
    broadcast, so the fact join fans in only matching partkeys;
    supplier and nation broadcast likewise. One orderkey shuffle, one
    (nation, year) agg exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_rev_col()).cast("double").alias("profit"))
    )


# --------------------------------------------------------------------------
# Q16 shape: distinct-supplier counts per part attribute combo, with
# NOT-style exclusion predicates. (No partsupp table — the observed
# part↔supplier pairs in lineitem stand in, same shape.)
# --------------------------------------------------------------------------
@register(
    "part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, type, size) combo, excluding a brand and a type. The
    exclusion predicates prune part before its broadcast; the
    count(DISTINCT suppkey) plans as Spark's two-phase distinct
    aggregate (partial distinct on (group, suppkey), then count) — no
    driver-side set materialization, scales with group count not row
    count."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Round-6 OLAP subtotal shapes: ROLLUP and CUBE (multi-level aggregation
# in ONE pass — Spark expands grouping sets inside a single shuffle, the
# classic warehouse subtotal/report query).
# --------------------------------------------------------------------------
@register(
    "lineitem_status_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           count(*) AS n_items,
           cast(sum(cast(l_extendedprice AS decimal(12,2))) AS double)
               / count(*) AS avg_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_lineitem_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE cross-tabulation: every combination of (returnflag,
    linestatus) marginals — both single-dimension slices, the joint
    cells, and the grand total — in one ``df.cube(...)`` pass. The
    average divides an exact decimal sum by the row count, cast to
    double at the END, so both engines evaluate the same two exact
    numbers (a native avg-of-double would drift with partial-agg
    order). Map-only input (no join), one shuffle on the composite
    grouping-set key; low-cardinality dimensions make the expanded
    key space tiny regardless of table size."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("lvl"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
            (
                F.sum(F.col("l_extendedprice").cast(_D122)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
        )
        .select(
            "l_returnflag", "l_linestatus", "lvl", "sum_qty", "n_items", "avg_price"
        )
    )
