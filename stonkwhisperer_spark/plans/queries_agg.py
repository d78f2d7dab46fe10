"""Additional aggregation/set-operation breadth: pivot, decimal-exact
VWAP (the finance rollup a stock engine owes its users), and set
difference (the except-shaped complement of the anti-join family)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.functions.hashing import portable_hash64_sql
from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

DEC = "decimal(18,6)"

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# --------------------------------------------------------------------------
# Pivot: per-user event-type counts as columns (wide-format rollup).
# --------------------------------------------------------------------------
@register(
    "user_event_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}" for t in _EVENT_TYPES)}
    FROM events
    GROUP BY user_id
    """,
)
def q_user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user counts pivoted to one column per event type. The value
    list is EXPLICIT — with it, Spark skips the extra distinct-values
    job and plans a single hash aggregation (map-side partials), same
    as a plain groupBy."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
        .na.fill(dict.fromkeys(_EVENT_TYPES, 0))
    )


# --------------------------------------------------------------------------
# VWAP: volume-weighted average price per minute bucket, decimal-exact.
# --------------------------------------------------------------------------
@register(
    "vwap_1min",
    oracle=f"""
    WITH ticks AS (
      SELECT date_trunc('minute', ts) AS bucket_ts, event_type,
             value AS price, (event_id % 1000) + 1 AS volume
      FROM events
    )
    SELECT bucket_ts, event_type,
           cast(sum(cast(price AS {DEC}) * cast(volume AS {DEC})) AS double)
             / cast(sum(cast(volume AS {DEC})) AS double)        AS vwap,
           cast(sum(cast(volume AS {DEC})) AS double)            AS total_volume
    FROM ticks
    GROUP BY bucket_ts, event_type
    """,
)
def q_vwap_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per (minute, type): both the
    price*volume numerator and the volume denominator accumulate as
    DECIMAL (associativity-proof), with ONE double division at the end
    — same single-shuffle shape as ohlcv_1min."""
    events = load_table(spark, sf_dir, "events")
    price = F.col("value").cast(DEC)
    volume = ((F.col("event_id") % 1000) + 1).cast(DEC)
    return (
        events.groupBy(
            F.date_trunc("minute", F.col("ts")).cast("timestamp_ntz").alias("bucket_ts"),
            "event_type",
        )
        .agg(
            (
                F.sum(price * volume).cast("double")
                / F.sum(volume).cast("double")
            ).alias("vwap"),
            F.sum(volume).cast("double").alias("total_volume"),
        )
    )


# --------------------------------------------------------------------------
# Set difference: users who clicked but never purchased (exceptAll's
# distinct cousin; completes the U-family beyond union U1).
# --------------------------------------------------------------------------
@register(
    "clickers_minus_buyers",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_clickers_minus_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): click users minus purchase
    users — DataFrame ``subtract``, planned as aggregate + anti-join on
    the high-cardinality user key (exceptAll exists for the multiset
    variant)."""
    events = load_table(spark, sf_dir, "events")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.subtract(buyers)


# --------------------------------------------------------------------------
# Set intersection: users who both clicked AND purchased (completes the
# set-op family: union U1, except, intersect).
# --------------------------------------------------------------------------
@register(
    "clickers_and_buyers",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_clickers_and_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set intersection): users present in both the
    click and purchase populations — DataFrame ``intersect``, planned as
    aggregate + left-semi join on the high-cardinality user key."""
    events = load_table(spark, sf_dir, "events")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers)


# --------------------------------------------------------------------------
# FULL OUTER join: reconcile two derived populations side by side —
# the join type the repo's surface didn't yet exercise.
# --------------------------------------------------------------------------
@register(
    "click_buy_reconcile",
    oracle="""
    WITH c AS (SELECT user_id, count(*) AS n_clicks FROM events
               WHERE event_type = 'click' GROUP BY user_id),
         b AS (SELECT user_id, count(*) AS n_buys FROM events
               WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT coalesce(c.user_id, b.user_id) AS user_id,
           coalesce(c.n_clicks, 0)        AS n_clicks,
           coalesce(b.n_buys, 0)          AS n_buys
    FROM c FULL OUTER JOIN b ON c.user_id = b.user_id
    """,
)
def q_click_buy_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of the click and purchase populations
    (click-only, buy-only, and both — one frame). Scale: both inputs
    pre-aggregate to one row per user BEFORE the join, so the full
    outer shuffle carries |users| rows per side, not raw events, and
    both sides hash-partition on the same key — one exchange each, no
    skew beyond the user distribution itself."""
    events = load_table(spark, sf_dir, "events")
    c = (
        events.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("_cu"))
        .agg(F.count("*").alias("n_clicks"))
    )
    b = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("_bu"))
        .agg(F.count("*").alias("n_buys"))
    )
    return (
        c.join(b, F.col("_cu") == F.col("_bu"), "full_outer")
        .select(
            F.coalesce("_cu", "_bu").alias("user_id"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_buys", F.lit(0)).alias("n_buys"),
        )
    )


# --------------------------------------------------------------------------
# Z-score outliers from EXACT moments: mean/std per group derived from
# decimal-exact sum and sum-of-squares, so the doubles — and therefore
# the flags — are identical cross-engine (stddev_samp over raw doubles
# would drift with partial-aggregation order).
# --------------------------------------------------------------------------
_DECSQ = "decimal(28,6)"  # value has <=3dp, so v*v is EXACT at 6dp; scale-6
# decimal->double casts are the cross-engine-stable ones (the (38,12)
# cast drifts a ulp between Spark and DuckDB)


@register(
    "value_outliers",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             count(*)                                             AS n,
             cast(sum(cast(value AS {DEC})) AS double)            AS s1,
             cast(sum(cast(cast(value AS {DEC}) * cast(value AS {DEC}) AS {_DECSQ})) AS double) AS s2
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_id, e.event_type, e.value,
             (e.value - s.s1 / s.n)
               / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS zscore
      FROM events e JOIN stats s ON e.event_type = s.event_type
    )
    SELECT event_id, event_type, value, zscore FROM z
    WHERE abs(zscore) > 1.8
    """,
)
def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers with the exact-moments discipline:
    sum and sum-of-squares aggregate as DECIMAL (associativity-proof),
    convert to double ONCE, then mean/std/z derive through identical
    double arithmetic on both engines — so even the boundary rows flag
    identically. Scale: one partial-merged agg to a per-type stats
    frame (broadcast back), one map-only scoring pass; no window, no
    second shuffle of the fact."""
    events = load_table(spark, sf_dir, "events")
    v = F.col("value").cast(DEC)
    stats = events.groupBy(F.col("event_type").alias("_t")).agg(
        F.count("*").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum((v * v).cast(_DECSQ)).cast("double").alias("s2"),
    )
    z = (
        F.col("value") - F.col("s1") / F.col("n")
    ) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    )
    return (
        events.join(F.broadcast(stats), events["event_type"] == F.col("_t"))
        .select("event_id", "event_type", "value", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > 1.8)
    )


# --------------------------------------------------------------------------
# Salted two-phase aggregation under the correctness gate: identical
# results to a plain GROUP BY, proven against the oracle — the skew
# machinery is graded, not just unit-tested.
# --------------------------------------------------------------------------
@register(
    "event_type_stats_salted",
    oracle=f"""
    SELECT event_type,
           cast(count(*) AS bigint)                   AS n,
           cast(sum(cast(value AS {DEC})) AS double)  AS total,
           max(value)                                 AS max_value,
           min(value)                                 AS min_value
    FROM events GROUP BY event_type
    """,
)
def q_event_type_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type stats through salted_agg (operators/skew.py): phase 1
    groups on (event_type, salt) spreading each hot low-cardinality key
    over 16 reducers, phase 2 merges partials per key. The oracle is
    the PLAIN group-by — result equivalence of the skew rewrite is
    exactly what's being graded. count merges as sum; the decimal sum
    merges exactly, so the salt split can't drift the total."""
    from stonkwhisperer_spark.operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events")
    out = salted_agg(
        events,
        ["event_type"],
        {
            "n": ("sum", F.count("*").cast("bigint")),
            "total": ("sum", F.sum(F.col("value").cast(DEC))),
            "max_value": ("max", F.max("value")),
            "min_value": ("min", F.min("value")),
        },
    )
    return out.select(
        "event_type", "n", F.col("total").cast("double").alias("total"),
        "max_value", "min_value",
    )


# --------------------------------------------------------------------------
# Multiset set difference (EXCEPT ALL): occurrence-counted complement —
# one click survives per unmatched purchase, completing the set-op
# family's multiset half.
# --------------------------------------------------------------------------
@register(
    "click_surplus_multiset",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_click_surplus_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference): each user keeps
    max(clicks - purchases, 0) rows — DataFrame ``exceptAll``, planned
    as a counted anti-semantics generate (no distinct collapse).
    Scale: one shuffle on user_id; output multiplicity derives from the
    two pre-counted sides, not row-by-row matching."""
    events = load_table(spark, sf_dir, "events")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.exceptAll(buyers)


# --------------------------------------------------------------------------
# Covariance / correlation from exact moments: Pearson r per group out
# of five decimal-exact sums — corr()/covar_samp() built-ins aggregate
# doubles order-dependently and would drift cross-engine.
# --------------------------------------------------------------------------
_D282 = "decimal(28,2)"  # lineitem money/qty have <=2dp: products exact at 2+2=4 <= 6dp


@register(
    "price_qty_correlation",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             cast(sum(cast(l_quantity AS {_D282})) AS double)      AS sx,
             cast(sum(cast(l_extendedprice AS {_D282})) AS double) AS sy,
             cast(sum(cast(cast(l_quantity AS {_D282})
                           * cast(l_extendedprice AS {_D282}) AS decimal(38,4))) AS double) AS sxy,
             cast(sum(cast(cast(l_quantity AS {_D282})
                           * cast(l_quantity AS {_D282}) AS decimal(38,4))) AS double)      AS sxx,
             cast(sum(cast(cast(l_extendedprice AS {_D282})
                           * cast(l_extendedprice AS {_D282}) AS decimal(38,4))) AS double) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((sxy - sx * sy / n) / (n - 1), 6) AS covar_qty_price,
           round((sxy - sx * sy / n)
             / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 12) AS corr_qty_price
    FROM m
    """,
)
def q_price_qty_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance + Pearson correlation of quantity vs price per
    return flag, derived from five decimal-exact sums (n, Σx, Σy, Σxy,
    Σx², Σy²) cast to double ONCE — the same exact-moments discipline
    as value_outliers, extended to bivariate stats. The built-in corr()
    sums doubles in partial-agg order and cannot hash-match an oracle.
    The final covar/corr composition is double arithmetic on both
    engines and can drift by 1 ULP (observed at sf0.001), so both sides
    round the outputs: corr to 12dp (=12 sig digits, |r|<=1) and covar
    to 6dp (~10 sig digits at its 1e3-1e5 magnitude) — far above ULP,
    far below any real drift.
    Scale: one partial-merged agg, three-row output; sums stay at
    scale ≤4 (inputs have ≤2dp) so the decimal→double casts are the
    cross-engine-stable ones."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(_D282)
    y = F.col("l_extendedprice").cast(_D282)
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(38,4)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(38,4)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,4)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "l_returnflag",
        "n",
        F.round((sxy - sx * sy / n) / (n - 1), 6).alias("covar_qty_price"),
        F.round(
            (sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
            12,
        ).alias("corr_qty_price"),
    )


# --------------------------------------------------------------------------
# Salted JOIN under the gate: the non-broadcast skew-join rewrite
# (operators/skew.py::salted_join), graded for result equivalence
# against the plain join — the companion to event_type_stats_salted.
# --------------------------------------------------------------------------
@register(
    "event_type_enrich_salted",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type,
             upper(event_type) || '_CATEGORY' AS category
      FROM events
    )
    SELECT e.event_id, e.event_type, d.category
    FROM events e JOIN dim d ON e.event_type = d.event_type
    """,
)
def q_event_type_enrich_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich the event fact through salted_join: the 5-value
    event_type key is pathologically hot (~20% of the fact per key), so
    the skewed side salts each row into one of 16 sub-keys and the dim
    side explodes 16× — every shuffle partition then holds at most
    1/16th of a hot key. The oracle is the PLAIN join: result
    equivalence of the rewrite is what's graded.

    Scale: this is the rewrite for skewed joins where the dim exceeds
    the broadcast threshold (at test scale the dim is tiny — the plan
    shape, not the trigger condition, is under test; production gates
    it on dim size). The salt must come from the ROW, not the key, so
    replicated dim rows match exactly one salt bucket each."""
    from stonkwhisperer_spark.operators.skew import salted_join

    events = load_table(spark, sf_dir, "events")
    dim = (
        events.select("event_type")
        .distinct()
        .withColumn("category", F.concat(F.upper("event_type"), F.lit("_CATEGORY")))
    )
    return salted_join(
        events.select("event_id", "event_type"), dim, "event_type"
    ).select("event_id", "event_type", "category")


# --------------------------------------------------------------------------
# Sketch-driven skew mitigation: the Count-Min sketch DECIDES which
# keys get the salted-join treatment — composition of the sketch layer
# (operators/sketches.py) with the skew rewrite (operators/skew.py).
# Oracle = the plain join: the physical strategy must not change the
# relation.
# --------------------------------------------------------------------------
@register(
    "event_type_enrich_sketch_salted",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type,
             upper(event_type) || '_CATEGORY' AS category
      FROM events
    )
    SELECT e.event_id, e.event_type, d.category
    FROM events e JOIN dim d ON e.event_type = d.event_type
    """,
)
def q_event_type_enrich_sketch_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production refinement of event_type_enrich_salted: instead
    of taxing EVERY key with the 16× dim explosion, a Count-Min sketch
    over the fact's join key detects the hot keys (estimate ≥ 2× the
    mean per-key count, a 1-row broadcast threshold — CMS error is
    one-sided, so a false positive only salts a cold key, never misses
    a hot one at this margin), and ``sketch_salted_join`` salts ONLY
    those: hot fact rows spread over 16 salts, the cold long tail
    joins unsalted with zero replication. The oracle is the PLAIN
    join — the sketch and the salting are pure physical strategy, so
    result equivalence is what's graded.

    Scale: at 100 TB the d·w sketch is built once per ingest shard and
    merged (operators/sketches.py), so hot-key detection costs a
    broadcast probe of persisted state, not a second exact aggregation
    of the fact table; replicating 20 hot dim rows 16× replaces
    replicating the full 10⁶-row dim 16×."""
    from stonkwhisperer_spark.operators.sketches import (
        cms_point_estimates,
        cms_table,
    )
    from stonkwhisperer_spark.operators.skew import sketch_salted_join

    events = load_table(spark, sf_dir, "events")
    fact = events.select("event_id", "event_type")
    dim = (
        events.select("event_type")
        .distinct()
        .withColumn("category", F.concat(F.upper("event_type"), F.lit("_CATEGORY")))
    )
    cms = cms_table(fact.select(F.col("event_type").alias("tok")), "tok")
    est = cms_point_estimates(
        dim.select(F.col("event_type").alias("tok")), "tok", cms
    )
    stats = fact.agg(
        F.count(F.lit(1)).alias("_total"),
        F.countDistinct("event_type").alias("_nkeys"),
    )
    # The hot set feeds BOTH join sides; eagerly materializing the
    # (bounded, ≤ |key domain|) relation runs the sketch probe and the
    # 1-row threshold broadcast ONCE instead of once per consumer —
    # the stand-in for the persisted hot-key list a production
    # pipeline refreshes per ingest batch.
    hot = (
        est.crossJoin(F.broadcast(stats))
        .filter(F.col("est_cnt") * F.col("_nkeys") >= 2 * F.col("_total"))
        .select(F.col("tok").alias("event_type"))
        .localCheckpoint(eager=True)
    )
    return sketch_salted_join(fact, dim, "event_type", hot).select(
        "event_id", "event_type", "category"
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) approximate distinct count — the sketch family
# under the EXACT oracle gate: because both engines compute the same
# portable 60-bit hash, the k smallest hash values — and therefore the
# ESTIMATE itself — are bit-identical (our HLL at
# plans/queries_text.py achieves the same via integer-exact registers;
# Spark's builtin approx_count_distinct cannot).
# --------------------------------------------------------------------------
_KMV_K = 256


@register(
    "kmv_distinct_estimate",
    oracle=f"""
    WITH hs AS (
      SELECT DISTINCT {portable_hash64_sql(
          "concat_ws('|', user_id, event_type, cast(ts AS date))"
      )} AS h
      FROM events
    ),
    km AS (SELECT h FROM hs ORDER BY h LIMIT {_KMV_K})
    SELECT count(*)                       AS n_sampled,
           max(h)                         AS kth_min_hash,
           CASE WHEN count(*) < {_KMV_K} THEN cast(count(*) AS double)
                ELSE ({_KMV_K} - 1) * 1152921504606846976.0 / max(h)
           END                            AS estimated_distinct
    FROM km
    """,
)
def q_kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (user, event_type, day) triples via the KMV
    sketch: hash every key with the portable 60-bit hash, keep the k
    smallest distinct values, estimate = (k-1)·2^60 / h_k (exact count
    when fewer than k keys exist). The whole sketch — and the estimate
    — is deterministic and engine-identical, so the oracle gate grades
    the approximation itself, not just its plumbing; HLL-family
    sketches (approx_count_distinct) can't do that cross-engine.

    Scale: the k-smallest pick plans as TakeOrderedAndProject — each
    partition keeps its own top-k, one k-row merge, no global sort —
    after a map-side-partial distinct on the hash. KMV sketches are
    also mergeable (union = k smallest of the union), the property
    that lets per-partition sketches combine on 1000 executors."""
    events = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("user_id"),
                    F.col("event_type"),
                    F.to_date("ts"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    km = events.select(h.alias("h")).distinct().orderBy("h").limit(_KMV_K)
    k = F.count("*")
    return km.agg(
        k.alias("n_sampled"),
        F.max("h").alias("kth_min_hash"),
        F.when(k < _KMV_K, k.cast("double"))
        .otherwise(F.lit(float(_KMV_K - 1)) * F.lit(1152921504606846976.0) / F.max("h"))
        .alias("estimated_distinct"),
    )


# --------------------------------------------------------------------------
# histogram_quantiles — mergeable fixed-bin quantile sketch: the
# deterministic, partial-aggregable alternative to a global sort (or to
# approx_percentile, whose sketch merge order is not cross-engine
# reproducible).
# --------------------------------------------------------------------------
@register(
    "histogram_quantiles",
    oracle="""
    WITH h AS (
      SELECT CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS bin,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT bin,
             CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS total
      FROM h
    )
    SELECT CAST(q AS DOUBLE) AS q,
           bin,
           CAST((bin + 1) * 1000.0 AS DOUBLE) AS est_upper
    FROM (
      -- thresholds in DOUBLE on purpose: DuckDB's bare 0.9*total is
      -- exact DECIMAL, Spark's is IEEE double — on a bin boundary the
      -- two would disagree; double-on-both-sides is bit-identical
      SELECT CAST(0.5 AS DOUBLE) AS q,
             MIN(CASE WHEN cum >= CAST(0.5 AS DOUBLE) * total THEN bin END)
               AS bin FROM c
      UNION ALL
      SELECT CAST(0.9 AS DOUBLE),
             MIN(CASE WHEN cum >= CAST(0.9 AS DOUBLE) * total THEN bin END)
        FROM c
      UNION ALL
      SELECT CAST(0.99 AS DOUBLE),
             MIN(CASE WHEN cum >= CAST(0.99 AS DOUBLE) * total THEN bin END)
        FROM c
    )
    """,
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5 extension: P50/P90/P99 of order value via a FIXED-BIN
    histogram sketch — ``floor(price/width)`` buckets, cumulative
    counts, smallest bin whose cumulative mass reaches q. Unlike
    ``approx_percentile`` (whose KLL-ish sketch result depends on merge
    order and differs across engines) the fixed-bin estimate is fully
    deterministic, so the DuckDB twin reproduces it bit-for-bit; error
    is bounded by the bin width, the classic monitoring-quantile
    trade-off.

    Scale: the ONLY data-size-dependent work is the groupBy(bin) —
    partial-aggregable map-side, so each task emits at most #bins
    rows and the shuffle is O(bins), not O(rows); the window + pick
    run on the ~500-row histogram. A 100 TB quantile for the price of
    a hash aggregation, and the per-task partials are mergeable across
    days/partitions (the sketch property that lets dashboards
    incrementally fold new data in). No joins, no sort of the data."""
    from pyspark.sql.window import Window

    width = 1000.0
    hist = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / F.lit(width))
            .cast("bigint")
            .alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = hist.select(
        "bin",
        F.sum("cnt")
        .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt")
        .over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("total"),
    )
    picks = cum.agg(
        *[
            F.min(F.when(F.col("cum") >= F.lit(q) * F.col("total"), F.col("bin")))
            .alias(f"b{i}")
            for i, q in enumerate((0.5, 0.9, 0.99))
        ]
    )
    return picks.select(
        F.expr("stack(3, 0.5D, b0, 0.9D, b1, 0.99D, b2)").alias("q", "bin")
    ).select(
        "q",
        "bin",
        ((F.col("bin") + 1) * F.lit(width)).cast("double").alias("est_upper"),
    )


# --------------------------------------------------------------------------
# quantile_sketch_prices — the fourth sketch family: rank/quantile
# questions from a mergeable bounded summary (operators/sketches.py,
# quantile section). Deterministic end to end, so the ESTIMATES are
# hash-gated; true_rank sits alongside as the in-result accuracy check
# (rank error <= N/2k by construction, pinned tighter in pytest).
# --------------------------------------------------------------------------
_QSK_B = 64  # leaf buckets
_QSK_K = 64  # samples per bucket -> rank error <= N/128


@register(
    "quantile_sketch_prices",
    oracle=f"""
    WITH v AS (
      SELECT l_orderkey % {_QSK_B} AS bucket,
             CAST(l_extendedprice * 100 AS BIGINT) AS val
      FROM lineitem
    ),
    per AS (
      SELECT bucket, list_sort(list(val)) AS arr, count(*) AS n_b
      FROM v GROUP BY bucket
    ),
    picked AS (
      SELECT bucket, i.range AS i, n_b,
             arr[CAST(((2 * i.range + 1) * n_b) // {2 * _QSK_K} AS BIGINT) + 1] AS val
      FROM per, range({_QSK_K}) i
    ),
    tot AS (SELECT count(*) AS n FROM v),
    cum AS (
      SELECT val, sum(n_b) OVER (ORDER BY val, bucket, i) AS c
      FROM picked
    ),
    est AS (
      SELECT p.pct, min(val) AS est_value
      FROM cum, tot, (SELECT unnest([50, 90, 99]) AS pct) p
      WHERE c * 100 >= p.pct * {_QSK_K} * tot.n
      GROUP BY p.pct
    )
    SELECT est.pct, est.est_value,
           (SELECT count(*) FROM v WHERE v.val <= est.est_value) AS true_rank,
           (SELECT n FROM tot) AS n_total
    FROM est
    """,
)
def q_quantile_sketch_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of lineitem extended price (cents) from the
    mergeable quantile summary: one bucket-keyed shuffle builds B*k
    weighted rank samples, the bounded summary is rank-scanned with
    all-integer arithmetic, and the corpus is touched once more only
    for the in-result accuracy columns (true_rank of each estimate,
    via a 3-row broadcast). The summary is deterministic, so the
    DuckDB twin replays sampling AND estimation bit-for-bit — the
    approximation itself is under the value hash, like KMV/HLL/CMS.

    Scale: quantiles without a global sort — the corpus pass is one
    hash shuffle on {_QSK_B} buckets with a bounded per-bucket sort;
    every later quantile question (per day, merged across days) reads
    the persisted B*k summary. The rank-scan window is unpartitioned
    but over the BOUNDED sketch (B*k = 4096 rows), never the corpus."""
    from stonkwhisperer_spark.operators.sketches import (
        quantile_estimates,
        quantile_summary,
    )

    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        (F.col("l_orderkey") % _QSK_B).alias("bucket"),
        (F.col("l_extendedprice") * 100).cast("bigint").alias("val"),
    )
    summ = quantile_summary(v, "val", F.col("bucket"), k=_QSK_K).localCheckpoint(
        eager=True
    )
    est = quantile_estimates(summ, [50, 90, 99])
    truth = (
        v.crossJoin(F.broadcast(est))
        .filter(F.col("val") <= F.col("est_value"))
        .groupBy("pct", "est_value")
        .agg(F.count("*").alias("true_rank"))
    )
    n_total = v.groupBy().agg(F.count("*").alias("n_total"))
    return truth.crossJoin(F.broadcast(n_total)).select(
        "pct", "est_value", "true_rank", "n_total"
    )


# --------------------------------------------------------------------------
# bloom_prune_lineitem — the fifth sketch family: MEMBERSHIP. A bloom
# filter over the selective build-side key set prunes the fact table
# map-only before any join; the oracle replays the same bits, so the
# false-positive set itself is hash-gated (no false negatives — the
# (is_member, NOT bloom_pass) cell must be absent; pinned by pytest).
# --------------------------------------------------------------------------
_BLOOM_D = 4
_BLOOM_M = 1 << 17  # 131072 bits = 4096 packed words (~32 KB broadcast)


@register(
    "bloom_prune_lineitem",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT cast(o_orderkey AS varchar) AS k
      FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    seeds AS (SELECT unnest(range({_BLOOM_D})) AS seed),
    kb AS (
      SELECT {portable_hash64_sql("seed::varchar || '|' || k")} % {_BLOOM_M} AS bit
      FROM keys CROSS JOIN seeds
    ),
    bloom AS (
      SELECT bit // {32} AS word,
             bit_or(1::BIGINT << cast(bit % 32 AS int)) AS bits
      FROM kb GROUP BY 1
    ),
    probe AS (SELECT DISTINCT l_orderkey FROM lineitem),
    pb AS (
      SELECT l_orderkey,
             {portable_hash64_sql("seed::varchar || '|' || cast(l_orderkey AS varchar)")}
               % {_BLOOM_M} AS bit
      FROM probe CROSS JOIN seeds
    ),
    flags AS (
      SELECT l_orderkey,
             bool_and(
               (coalesce(bits, 0) & (1::BIGINT << cast(bit % 32 AS int))) <> 0
             ) AS bloom_pass
      FROM pb LEFT JOIN bloom ON bloom.word = pb.bit // 32
      GROUP BY l_orderkey
    )
    SELECT coalesce(k IS NOT NULL, false)  AS is_member,
           bloom_pass,
           count(*)                        AS n_keys
    FROM flags LEFT JOIN keys ON keys.k = cast(flags.l_orderkey AS varchar)
    GROUP BY 1, 2
    """,
)
def q_bloom_prune_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join prune: pack the URGENT-priority order
    keys into a {_BLOOM_M}-bit bloom (d={_BLOOM_D} seeded hash rows),
    probe every distinct lineitem order key against it map-only, and
    tabulate the confusion cells (is_member x bloom_pass) — the
    (true, false) cell can never appear (no false negatives), and the
    (false, true) cell IS the measured false-positive count, gated
    bit-for-bit by the oracle replaying the same bits.

    Scale: the production shape for "filter 100 TB of fact rows by a
    key set too big to ship raw" — the build side packs into m/8
    bytes (here 16 KB; size m to ~12 bits per build key) that
    broadcast everywhere; the probe is d broadcast lookups per row,
    zero shuffles added to the fact scan, and only the surviving
    sliver reaches the exact join. The exact-membership join here is
    the self-check, not the production path. Mergeable across shards
    by bitwise OR (`bloom_merge`), so 1000 executors build it in one
    partial-agg pass."""
    from stonkwhisperer_spark.operators.sketches import bloom_build, bloom_probe

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").cast("string").alias("k"))
        .distinct()
    )
    bloom = bloom_build(keys, "k", d=_BLOOM_D, m_bits=_BLOOM_M)
    probe = li.select("l_orderkey").distinct()
    flagged = bloom_probe(probe, "l_orderkey", bloom, d=_BLOOM_D, m_bits=_BLOOM_M)
    member = keys.select(
        F.col("k").cast("bigint").alias("l_orderkey"), F.lit(True).alias("_m")
    )
    return (
        flagged.join(F.broadcast(member), "l_orderkey", "left")
        .select(
            F.coalesce("_m", F.lit(False)).alias("is_member"),
            F.col("might_contain").alias("bloom_pass"),
        )
        .groupBy("is_member", "bloom_pass")
        .agg(F.count("*").alias("n_keys"))
    )
