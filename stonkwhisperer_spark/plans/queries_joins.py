"""Join-family registered queries (SURVEY.md §2.4 J2–J6).

Each query exercises one reference join pattern over the driver's
testdata tables and carries an exactly-equivalent DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.operators.joins import (
    broadcast_enrich,
    fk_backfill,
    lookup_or_create,
    new_rows_anti,
)
from stonkwhisperer_spark.plans.glue import bounded_collect
from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

_D122 = "decimal(12,2)"


# --------------------------------------------------------------------------
# J2: broadcast dimension lookup. The reference resolves ticker→company_id
# by shipping a dict to every worker (loading.py:93-115,
# services/company_service.py:23-33) and silently skips rows whose ticker
# is unknown (loading.py:330-333). Here: events stand in for bars, nation
# (25 rows) for the companies dim; user_id % 30 leaves ids 25-29 unmatched
# so the inner join exercises the skip-unknown path.
# --------------------------------------------------------------------------
@register(
    "bars_enrich",
    oracle="""
    SELECT e.event_id, e.ts, e.value, n.n_name AS company
    FROM events e
    JOIN nation n ON e.user_id % 30 = n.n_nationkey
    """,
)
def q_bars_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim enrich (J2): fact rows pick up the dimension name;
    unknown keys are dropped (inner), mirroring loading.py:330-333.
    Scale: BroadcastHashJoin — the dim ships once per executor, the fact
    side never shuffles."""
    events = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    facts = events.withColumn("dim_key", (F.col("user_id") % 30).cast("int"))
    enriched = broadcast_enrich(
        facts, nation, facts["dim_key"] == nation["n_nationkey"], "inner"
    )
    return enriched.select(
        "event_id", "ts", "value", F.col("n_name").alias("company")
    )


# --------------------------------------------------------------------------
# J3/J4: left-anti dedup vs target — "which incoming keys are new?"
# (reference loading.py:150-161 on url, :213-224 on reddit_id). The
# incoming batch synthesizes duplicate urls from documents; the existing
# target is the subset with doc_id % 3 = 0.
# --------------------------------------------------------------------------
@register(
    "new_urls_anti",
    oracle="""
    WITH incoming AS (
      SELECT DISTINCT 'https://news.example.com/' || (doc_id % 400) AS url
      FROM documents
    ),
    existing AS (
      SELECT 'https://news.example.com/' || (doc_id % 400) AS url
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT i.url
    FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.url = i.url)
    """,
)
def q_new_urls_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti merge predicate (J3/J4): batch-dedup incoming urls, then
    keep only those absent from the target — the insert set of the
    reference's idempotent article sink (loading.py:150-161).
    Scale: both sides shuffle on the high-cardinality url key; the anti
    join's build side carries keys only (column-pruned)."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://news.example.com/"), (F.col("doc_id") % 400)).alias("url")
    incoming = docs.select(url).dropDuplicates(["url"])
    existing = docs.filter(F.col("doc_id") % 3 == 0).select(url)
    return new_rows_anti(incoming, existing, ["url"])


# --------------------------------------------------------------------------
# url_canonical_dedup — the canonicalization the reference's raw-url
# merge key (loading.py:150-161) is missing: scheme/host case, default
# ports, tracking params, param order, trailing slashes and fragments
# all split dedup groups when the key is the raw string. Four raw
# variants per logical article collapse to ONE canonical key; the
# n_raw_distinct column records how many groups the raw key would have
# produced (4 — i.e. the reference's sink would store every variant).
# --------------------------------------------------------------------------
from stonkwhisperer_spark.functions.urls import canonical_url, canonical_url_sql

_RAW_URL_SQL = """
      CASE doc_id % 4
        WHEN 0 THEN 'https://news.example.com/articles/' || (doc_id // 4)
                    || '?id=' || (doc_id // 4) || '&utm_source=rss'
        WHEN 1 THEN 'HTTPS://News.Example.COM:443/articles/' || (doc_id // 4)
                    || '?id=' || (doc_id // 4) || '#top'
        WHEN 2 THEN 'HtTpS://NEWS.EXAMPLE.COM/articles/' || (doc_id // 4)
                    || '/?gclid=x&id=' || (doc_id // 4)
        ELSE 'https://news.example.com/articles/' || (doc_id // 4)
             || '?fbclid=a&id=' || (doc_id // 4)
      END
"""


@register(
    "url_canonical_dedup",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, {_RAW_URL_SQL} AS url
      FROM documents WHERE doc_id < 400
    ),
    canon AS (
      SELECT doc_id, url, {canonical_url_sql("url")} AS curl FROM raw
    )
    SELECT curl AS canonical_url,
           min(doc_id) AS keep_id,
           count(*) AS n_variants,
           count(DISTINCT url) AS n_raw_distinct
    FROM canon GROUP BY curl
    """,
)
def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup: four raw variants of every logical article
    URL (host/scheme case, default port, tracking params in different
    positions, trailing slash, fragment) are canonicalized with
    :func:`canonical_url` and grouped — each group collapses to one
    keeper (min doc_id) with n_variants=4, while n_raw_distinct=4 shows
    the raw-string key the reference dedups on would have kept every
    variant as a separate document. The DuckDB twin replays the same
    string surgery byte-for-byte (shared Java-regex ∩ RE2 subset; the
    param sort is byte-wise in both engines).

    Scale: canonicalization is map-only (regex + array ops per row);
    the dedup shuffles once on the canonical key — same profile as the
    raw-key anti-join it replaces, so adopting it costs nothing."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    l = F.expr("doc_id DIV 4").cast("string")
    raw = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("https://news.example.com/articles/"), l,
                F.lit("?id="), l, F.lit("&utm_source=rss"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("HTTPS://News.Example.COM:443/articles/"), l,
                F.lit("?id="), l, F.lit("#top"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("HtTpS://NEWS.EXAMPLE.COM/articles/"), l,
                F.lit("/?gclid=x&id="), l,
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://news.example.com/articles/"), l,
                F.lit("?fbclid=a&id="), l,
            )
        )
    )
    canon = docs.select(
        "doc_id", raw.alias("url"), canonical_url(raw).alias("curl")
    )
    return canon.groupBy(F.col("curl").alias("canonical_url")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_variants"),
        F.countDistinct("url").alias("n_raw_distinct"),
    )


# --------------------------------------------------------------------------
# J5: lookup-or-create + FK backfill. Reference: link posts probe a
# url→Article cache, create articles on miss, then set post.article_id
# (loading.py:226-292). Posts = documents (text posts get null url);
# existing articles = urls seen before with a stable id; created articles
# get a deterministic sha256 surrogate id (SURVEY §7.4 — no uuid()).
# --------------------------------------------------------------------------
@register(
    "posts_link_articles",
    oracle="""
    WITH posts AS (
      SELECT doc_id AS post_id,
             CASE WHEN doc_id % 3 = 0 THEN NULL
                  ELSE 'https://ext.example.com/' || (doc_id % 120) END AS url
      FROM documents
    ),
    existing AS (
      SELECT DISTINCT 'https://ext.example.com/' || (doc_id % 120) AS url,
             sha256('old:' || 'https://ext.example.com/' || (doc_id % 120)) AS id
      FROM documents WHERE doc_id % 5 = 0 AND doc_id % 3 <> 0
    ),
    wanted AS (SELECT DISTINCT url FROM posts WHERE url IS NOT NULL),
    created AS (
      SELECT w.url, sha256('new:' || w.url) AS id
      FROM wanted w
      WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.url = w.url)
    ),
    articles AS (SELECT * FROM existing UNION ALL SELECT * FROM created)
    SELECT p.post_id, p.url, a.id AS article_id
    FROM posts p LEFT JOIN articles a ON p.url = a.url
    """,
)
def q_posts_link_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup-or-create articles by url, then FK-backfill posts (J5):
    dropDuplicates = the reference's intra-batch cache, anti-join = the
    DB probe, union = the create, left join = article_id assignment.
    Scale: the articles dim stays proportional to distinct batch urls —
    broadcastable; posts never shuffle for the final backfill."""
    docs = load_table(spark, sf_dir, "documents")
    url_expr = F.concat(F.lit("https://ext.example.com/"), (F.col("doc_id") % 120))
    posts = docs.select(
        F.col("doc_id").alias("post_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(url_expr).alias("url"),
    )
    existing = (
        docs.filter((F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 3 != 0))
        .select(url_expr.alias("url"))
        .dropDuplicates(["url"])
        .select("url", F.sha2(F.concat(F.lit("old:"), F.col("url")), 256).alias("id"))
    )
    articles = lookup_or_create(
        posts,
        existing,
        "url",
        {"id": F.sha2(F.concat(F.lit("new:"), F.col("url")), 256)},
    )
    return fk_backfill(posts, articles, on="url", fk_col="article_id").select(
        "post_id", "url", "article_id"
    )


# --------------------------------------------------------------------------
# J6: analytic FK joins — the reference declares posts→articles and
# bars→companies FKs for downstream analytics (models/reddit_post.py:26-28,
# models/stock_bar.py:28-33); the TPC-H-shaped equivalent is the
# lineitem→orders→customer→nation→region chain (Q5 shape).
# --------------------------------------------------------------------------
@register(
    "region_revenue",
    oracle=f"""
    SELECT r.r_name AS region,
           cast(sum(cast(l.l_extendedprice AS {_D122})
                    * cast(1 - l.l_discount AS {_D122})) AS double) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= timestamp '1996-01-01 00:00:00'
      AND o.o_orderdate <  timestamp '1998-01-01 00:00:00'
    GROUP BY r.r_name
    """,
)
def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region over the FK chain (J6, TPC-H Q5 shape) with
    decimal-exact money math.
    Scale: lineitem⋈orders is the one fact⋈fact shuffle (equi-key
    l_orderkey, AQE handles skew); customer⋈nation⋈region collapse into
    a broadcast chain so the orders side never reshuffles for dims."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    dims = F.broadcast(
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), F.col("n_regionkey") == region["r_regionkey"])
        .select("c_custkey", "r_name")
    )
    revenue = (F.col("l_extendedprice").cast(_D122) * (F.lit(1) - F.col("l_discount")).cast(_D122))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(dims, F.col("o_custkey") == dims["c_custkey"])
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# Bucketed co-located join — the SURVEY §7 M6 scale technique as a
# verified surface: both fact tables written bucketBy(orderkey) into the
# warehouse, then sort-merge-joined with ZERO exchanges (asserted on the
# physical plan in-query). At 100 TB this is the pattern that amortizes
# the fact⋈fact shuffle across every downstream join on the same key:
# pay the partitioned write once at ingest, join shuffle-free forever.
# --------------------------------------------------------------------------
_BUCKETS = 16  # cluster-sized in production (e.g. 4096 at 100 TB)


@register(
    "bucketed_order_lineitem_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           cast(sum(cast(l.l_extendedprice AS {_D122})) AS double) AS gross
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_bucketed_order_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈fact: orders and lineitem are written as
    bucketed+sorted catalog tables on the join key, and the sort-merge
    join then reads bucket i against bucket i directly — the physical
    plan is REQUIRED (asserted below) to contain zero Exchange nodes
    between the scans and the join; a Spark upgrade or conf drift that
    silently reintroduced the shuffle fails loudly here rather than
    costing a 100-TB re-shuffle in production. The MERGE hint pins SMJ
    (a broadcast would also be shuffle-free but wouldn't prove bucket
    co-location). The post-join priority aggregation shuffles ~5 keys —
    negligible by construction."""
    import shutil
    import uuid
    from urllib.parse import urlparse

    # Per-run table names: two sessions sharing a warehouse dir must not
    # race on a fixed name (one could delete files the other's scan is
    # reading, or hit LOCATION_ALREADY_EXISTS) — same scratch-dir
    # discipline as the txlog queries, dropped in the finally block.
    run = uuid.uuid4().hex[:12]
    t_orders, t_li = f"bucketed_orders_{run}", f"bucketed_lineitem_{run}"
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    try:
        (
            orders.write.mode("overwrite")
            .bucketBy(_BUCKETS, "o_orderkey").sortBy("o_orderkey")
            .saveAsTable(t_orders)
        )
        (
            li.write.mode("overwrite")
            .bucketBy(_BUCKETS, "l_orderkey").sortBy("l_orderkey")
            .saveAsTable(t_li)
        )
        bo, bl = spark.table(t_orders), spark.table(t_li)
        joined = bo.hint("MERGE").join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan or "SortMergeJoin" not in plan:
            raise AssertionError(
                "bucketed join lost co-location (Exchange in plan or SMJ not chosen):\n"
                + plan
            )
        # Materialize before dropping the tables the plan reads from.
        rows = bounded_collect(
            joined.groupBy("o_orderpriority").agg(
                F.count("*").alias("n_items"),
                F.sum(F.col("l_extendedprice").cast(_D122))
                .cast("double")
                .alias("gross"),
            ),
            100,
            "per-priority rollup",
        )
    finally:
        for t in (t_orders, t_li):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    return spark.createDataFrame(
        rows, "o_orderpriority string, n_items bigint, gross double"
    )
