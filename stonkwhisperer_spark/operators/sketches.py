"""Mergeable sketches for corpus-scale cardinality and frequency.

Four classic streaming sketches, built as pure DataFrame plans with the
portable 60-bit hash so a DuckDB oracle can replay them bit-for-bit:

  * KMV (K-Minimum-Values) distinct-count sketch — per group, keep the
    K smallest distinct hash values of the item; the K-th minimum
    estimates the cardinality as (K-1) * HASH_SPACE / kth_min
    (Bar-Yossef et al. 2002, "Counting distinct elements in a data
    stream"). The sketch state is K integers per group — mergeable by
    set-union + re-take-K-min, and the merge is EXACT: the global K
    minima are contained in the union of per-shard K minima, so
    merging per-shard sketches reproduces the direct global sketch
    bit-for-bit (pinned by pytest).
  * Count-Min sketch (Cormode & Muthukrishnan 2005) — d independent
    hash rows of width w; each occurrence increments one bucket per
    row; a point estimate is the MIN over the d buckets, an
    overestimate by construction (est >= true always, pinned by
    pytest). The whole sketch is d*w integers — broadcastable, and
    mergeable across shards/days by element-wise addition.
  * HyperLogLog (Flajolet et al. 2007) — m=2^p rank registers per
    group, merged by element-wise MAX; fixed-size state and a
    one-max-combine merge make it the industry default for
    distributed distinct counts. See the HLL section comment below
    for the integer-exactness contract with the oracle.
  * Quantile summary (deterministic weighted systematic sampling — the
    deterministic case of Agarwal et al. 2012, "Mergeable summaries")
    — k weighted rank samples per hash bucket, merged by plain union;
    rank error <= N/2k. See the quantile section comment below.

Why sketches at 100 TB: the exact answers (count distinct, top-k
frequency) need a vocabulary-sized shuffle per question asked; the
sketch is computed ONCE per shard in the ingest pass, persisted as a
few KB, and merged/queried without re-reading the corpus. Here both
the sketch and the exact answer run side by side so the result is
self-evaluating (estimate next to truth).

All plans are native column expressions (md5-based portable hash stays
in whole-stage codegen); shuffles are keyed on hash-uniform columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from stonkwhisperer_spark.functions.hashing import portable_hash64

# portable_hash64 yields 15 hex digits = 60 bits.
HASH_SPACE = 1 << 60


def kmv_sketch(
    rows: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group KMV distinct-count sketch state: the K smallest
    distinct ``portable_hash64(value)`` per group, ranked.

    Returns (group, _h, _rk) with _rk in [1, k] — the persistable
    sketch (K integers per group). Feed to :func:`kmv_estimate` for
    the cardinality estimate, or union several sketches and re-rank
    to merge them.

    Scale: the distinct + rank shuffles on (group, hash) — the same
    key profile as an exact count-distinct — but this runs ONCE at
    ingest; every later cardinality question reads K rows per group
    instead of the corpus. The rank window sorts within each group's
    hash partition (sort-based, spillable)."""
    h = portable_hash64(F.col(value_col))
    hashes = rows.select(F.col(group_col), h.alias("_h")).distinct()
    rk = F.row_number().over(W.partitionBy(group_col).orderBy("_h"))
    return (
        hashes.withColumn("_rk", rk).filter(F.col("_rk") <= k)
    )


def kmv_estimate(sketch: DataFrame, group_col: str, k: int = 32) -> DataFrame:
    """Cardinality estimate from a KMV sketch (output of
    :func:`kmv_sketch`): (group, n_mins, kth_min, est_distinct).

    When a group produced fewer than K distinct hashes the count is
    EXACT (the sketch saw every value); otherwise the estimator is
    (K-1) * HASH_SPACE // kth_min, computed in DECIMAL(38,0) so the
    oracle's HUGEINT twin matches bit-for-bit."""
    est = F.expr(
        f"CAST((CAST({k - 1} AS DECIMAL(38,0)) * "
        f"CAST({HASH_SPACE} AS DECIMAL(38,0))) DIV kth_min AS BIGINT)"
    )
    return (
        sketch.groupBy(group_col)
        .agg(F.count("*").alias("n_mins"), F.max("_h").alias("kth_min"))
        .select(
            group_col,
            "n_mins",
            "kth_min",
            F.when(F.col("n_mins") < k, F.col("n_mins").cast("bigint"))
            .otherwise(est)
            .alias("est_distinct"),
        )
    )


def kmv_merge(sketch: DataFrame, group_col: str, into: str, k: int = 32) -> DataFrame:
    """Merge all per-group KMV sketches into ONE sketch labelled
    ``into``: union the k-min sets, re-rank, keep the K smallest.
    Input is |groups| * K rows — driver-free, exact (the global K
    minima are a subset of the union of per-group K minima)."""
    rk = F.row_number().over(W.partitionBy(group_col).orderBy("_h"))
    return (
        sketch.select(F.lit(into).alias(group_col), "_h")
        .distinct()
        .withColumn("_rk", rk)
        .filter(F.col("_rk") <= k)
    )


def _seeded_bucket(tok: Column, seed: int, width: int) -> Column:
    """Bucket of ``tok`` in CMS hash row ``seed``: portable 60-bit
    hash of '<seed>|<tok>' mod width (matches portable_hash64_sql
    with the same seed on the oracle side)."""
    return portable_hash64(tok, seed=seed) % width


def cms_table(
    tokens: DataFrame,
    token_col: str,
    d: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the Count-Min sketch table from a token-occurrence stream:
    (seed, bucket, cnt) with d*width rows total.

    Each occurrence lands in one bucket per hash row; the explode is
    map-side (d rows out per occurrence) and the count partial-
    aggregates before the single (seed, bucket) shuffle — at most
    d*width rows cross the wire per mapper regardless of corpus size.
    Merge sketches across shards/days by summing cnt per (seed,
    bucket)."""
    seeds = F.array(*[F.lit(i) for i in range(d)])
    occ = tokens.select(
        F.explode(seeds).alias("seed"), F.col(token_col).alias("_tok")
    ).select(
        "seed",
        # Same single hash definition as the probe side (_seeded_bucket):
        # portable_hash64 of '<seed>|<tok>' — the seed is a column here,
        # so the prefix is concatenated explicitly. Build and probe MUST
        # share one definition or bucket agreement silently breaks.
        (
            portable_hash64(
                F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("_tok"))
            )
            % width
        ).alias("bucket"),
    )
    return occ.groupBy("seed", "bucket").agg(F.count("*").alias("cnt"))


def cms_point_estimates(
    items: DataFrame,
    token_col: str,
    cms: DataFrame,
    d: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate the frequency of each row's token against a CMS
    table: adds ``est_cnt`` = min over the d hash rows.

    The d*width sketch is broadcast and joined once per hash row on
    the map-side-computed bucket column — d broadcast joins, zero
    shuffles added to ``items``'s plan. This is the sketch payoff: at
    query time the corpus is never re-read. The sketch is eagerly
    materialized here (it is d*width rows — the whole point is that it
    is small) so the d broadcast legs read the checkpoint, not d
    re-executions of the build lineage; in production it would be a
    persisted table and this is its stand-in."""
    cms = cms.localCheckpoint(eager=True)
    out = items
    for i in range(d):
        leg = cms.filter(F.col("seed") == i).select(
            F.col("bucket").alias(f"_b{i}"), F.col("cnt").alias(f"_c{i}")
        )
        # LEFT join: a CMS point query is defined for every key — a
        # token absent from the sketched stream has an empty bucket in
        # some row and must estimate 0, not vanish from the output.
        out = (
            out.withColumn(f"_b{i}", _seeded_bucket(F.col(token_col), i, width))
            .join(F.broadcast(leg), f"_b{i}", "left")
            .withColumn(f"_c{i}", F.coalesce(F.col(f"_c{i}"), F.lit(0).cast("bigint")))
        )
    est = F.least(*[F.col(f"_c{i}") for i in range(d)])
    return out.withColumn("est_cnt", est).drop(
        *[c for i in range(d) for c in (f"_b{i}", f"_c{i}")]
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007, "HyperLogLog: the analysis of a
# near-optimal cardinality estimation algorithm") — the third mergeable
# sketch: fixed m=2^p registers per group (vs KMV's K minima), merged by
# element-wise MAX, which makes it the industry default for distributed
# distinct counts (one tiny max-combine per shard, no re-ranking).
#
# Exactness contract with the DuckDB oracle twin:
#   * bucket  = hash % m (low p bits); w = hash DIV m (the 52-bit rest)
#   * rank    = leading zeros of w in the 52-bit field + 1
#             = RANK_MAX - bit_length(w), where bit_length is the
#               length of the minimal binary string — Spark
#               length(conv(w,10,2)) == DuckDB length(bin(w)), both
#               leading-zero-free
#   * S       = sum over all m registers of 2^(RANK_MAX - M_j), with
#               never-hit registers contributing 2^RANK_MAX; computed
#               with BIGINT shifts (max 256 * 2^53 = 2^61 — no overflow)
#   * est_raw = alpha_m * m^2 * 2^RANK_MAX / S evaluated as ONE
#               integer division in DECIMAL(38,0) / HUGEINT, with
#               alpha_256 = 0.7213/(1 + 1.079/256) expressed as the
#               exact rational 7213*256*1000 / (10000*257079)
#   * small-range correction (V zero registers > 0, est <= 5m/2):
#               linear counting floor(m*ln(m/V) + 0.5) — engine-stable
#               because for the 255 possible V values the product is
#               never within 4.9e-3 of a .5 boundary (a 1-ulp libm
#               disagreement cannot flip the floor; verified
#               exhaustively in tests/test_operators.py)
# ---------------------------------------------------------------------------
HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_RANK_MAX = 60 - HLL_P + 1  # 53: w has 52 bits; w=0 -> rank 53
# alpha_m * m^2 * 2^RANK_MAX as an exact integer ratio (see above).
HLL_EST_NUM = 7213 * HLL_M * 1000 * HLL_M * HLL_M * (1 << HLL_RANK_MAX)
HLL_EST_DEN = 10000 * (HLL_M * 1000 + 1079)


def hll_sketch(rows: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group HLL register table: (group, _bkt, _reg) with at most
    m=256 rows per group — the persistable sketch.

    Scale: one groupBy keyed on (group, bucket) — hash-uniform by
    construction — with max() partial-aggregating map-side, so at most
    m rows per group cross the wire per mapper regardless of corpus
    size. Merge shard/day sketches with :func:`hll_merge` (element-wise
    max); the merge is EXACT: max is associative/commutative, so merged
    per-shard sketches reproduce the direct global sketch bit-for-bit
    (pinned by pytest)."""
    h = portable_hash64(F.col(value_col))
    w = F.expr(f"_h DIV {HLL_M}")
    rank = F.when(w == 0, F.lit(HLL_RANK_MAX)).otherwise(
        F.lit(HLL_RANK_MAX) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        rows.select(F.col(group_col), h.alias("_h"))
        .select(group_col, (F.col("_h") % HLL_M).alias("_bkt"), rank.alias("_rank"))
        .groupBy(group_col, "_bkt")
        .agg(F.max("_rank").alias("_reg"))
    )


def hll_merge(sketch: DataFrame, group_col: str, into: str) -> DataFrame:
    """Merge all per-group HLL sketches into ONE labelled ``into``:
    element-wise max per bucket. |groups| * m rows in, m rows out —
    driver-free and exact."""
    return (
        sketch.select(F.lit(into).alias(group_col), "_bkt", "_reg")
        .groupBy(group_col, "_bkt")
        .agg(F.max("_reg").alias("_reg"))
    )


def hll_estimate(sketch: DataFrame, group_col: str) -> DataFrame:
    """Cardinality estimate from an HLL register table:
    (group, v_zero, s_scaled, est_distinct).

    ``s_scaled`` is the integer-scaled harmonic-mean denominator
    S = sum_j 2^(RANK_MAX - M_j) (BIGINT-exact); ``est_distinct``
    applies the raw estimator or linear counting per the standard
    small-range rule — both branches bit-stable across engines (see
    module comment)."""
    agg = sketch.groupBy(group_col).agg(
        F.count("*").alias("_hits"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RANK_MAX} - _reg)")
        ).alias("_s_hit"),
    )
    v = F.lit(HLL_M) - F.col("_hits")
    s = (F.col("_s_hit") + v * F.lit(1 << HLL_RANK_MAX)).alias("s_scaled")
    est_raw = F.expr(
        f"CAST(CAST({HLL_EST_NUM} AS DECIMAL(38,0)) DIV "
        f"(CAST({HLL_EST_DEN} AS DECIMAL(38,0)) * s_scaled) AS BIGINT)"
    )
    lin = F.floor(
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_zero")) + F.lit(0.5)
    ).cast("bigint")
    return (
        agg.select(group_col, v.cast("bigint").alias("v_zero"), s)
        .withColumn("_raw", est_raw)
        .select(
            group_col,
            "v_zero",
            "s_scaled",
            F.when(
                (F.col("v_zero") > 0) & (F.col("_raw") <= (5 * HLL_M) // 2), lin
            )
            .otherwise(F.col("_raw"))
            .alias("est_distinct"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970, "Space/time trade-offs in hash coding with
# allowable errors") — the fifth sketch: a MEMBERSHIP summary, where KMV/
# HLL answer "how many distinct" and CMS answers "how often". d seeded
# hash rows set one bit each per key in an m-bit array, packed into
# m/32 BIGINT words; a key "might be present" iff all d of its bits are
# set. No false negatives ever (every inserted key's bits are set);
# false-positive rate ~(1 - e^(-d*n/m))^d.
#
# Why at 100 TB: semi-join pruning. A build-side key set too large to
# ship as raw keys (100M 8-byte keys = 800 MB) packs into m/8 bytes of
# bloom bits (2^27 bits = 16 MB) that broadcast to every executor; the
# probe side filters MAP-ONLY, no shuffle touches the fact table, and
# the surviving (tiny) fraction proceeds to the exact join. This is the
# hand-rolled form of Spark's own runtime bloom-filter join pruning —
# rolled by hand here so the sketch is persistable, mergeable across
# shards (bitwise OR per word), and bit-for-bit oracle-replayable via
# the portable hash.
# ---------------------------------------------------------------------------
BLOOM_WORD = 32  # bits packed per BIGINT word (word = bit DIV 32)


def bloom_build(
    rows: DataFrame,
    value_col: str,
    d: int = 4,
    m_bits: int = 1 << 17,
) -> DataFrame:
    """Packed bloom filter over ``value_col``: (word, bits) with at
    most m/32 rows — the persistable sketch. bit_i(x) =
    portable_hash64('<i>|' || x) % m (same seeded-hash family as CMS).

    Scale: the d-way explode is map-side and bit_or partial-aggregates
    before the single (word) shuffle — at most m/32 rows cross the
    wire per mapper regardless of build-side size. Merge shard/day
    blooms with :func:`bloom_merge` (bitwise OR per word) — exact:
    OR is associative/commutative, so merged per-shard filters equal
    the direct global filter bit-for-bit."""
    seeds = F.array(*[F.lit(i) for i in range(d)])
    bit = (
        portable_hash64(
            F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("_v"))
        )
        % m_bits
    )
    occ = rows.select(
        F.explode(seeds).alias("seed"),
        F.col(value_col).cast("string").alias("_v"),
    ).select(bit.alias("_bit"))
    return (
        occ.select(
            F.expr(f"_bit DIV {BLOOM_WORD}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(_bit % {BLOOM_WORD} AS INT))"
            ).alias("_mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_merge(sketches: DataFrame) -> DataFrame:
    """Merge unioned (word, bits) bloom sketches: bitwise OR per word.
    |shards| * m/32 rows in, m/32 out — driver-free and exact."""
    return sketches.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    items: DataFrame,
    value_col: str,
    bloom: DataFrame,
    d: int = 4,
    m_bits: int = 1 << 17,
) -> DataFrame:
    """Membership-test each row's ``value_col`` against a bloom filter:
    adds ``might_contain`` (true iff all d bits are set). Guaranteed
    true for every inserted key (no false negatives — pinned by
    pytest); spuriously true at the designed FP rate.

    The m/32-word sketch is broadcast and joined once per hash row on
    the map-side-computed word column — d broadcast joins, zero
    shuffles added to ``items``'s plan (the CMS probe pattern). LEFT
    joins: a word no build key touched is absent from the sparse
    sketch and must read as all-zero bits, not drop the probe row.
    Eagerly materialized for the same reason as the CMS table: it is
    the persisted-artifact stand-in, not a plan to re-execute d
    times."""
    bloom = bloom.localCheckpoint(eager=True)
    out = items
    hits = []
    for i in range(d):
        bit = portable_hash64(F.col(value_col).cast("string"), seed=i) % m_bits
        leg = bloom.select(
            F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_bits{i}")
        )
        out = (
            out.withColumn(f"_bit{i}", bit)
            .withColumn(f"_w{i}", F.expr(f"_bit{i} DIV {BLOOM_WORD}"))
            .join(F.broadcast(leg), f"_w{i}", "left")
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(_bit{i} % {BLOOM_WORD} AS INT))"
        )
        hits.append(
            F.coalesce(F.col(f"_bits{i}"), F.lit(0).cast("bigint"))
            .bitwiseAND(mask)
            != 0
        )
    cond = hits[0]
    for h in hits[1:]:
        cond = cond & h
    return out.withColumn("might_contain", cond).drop(
        *[c for i in range(d) for c in (f"_bit{i}", f"_w{i}", f"_bits{i}")]
    )


# ---------------------------------------------------------------------------
# Mergeable quantile summary — the fourth sketch: cardinality (KMV,
# HLL) and frequency (CMS) are covered above; this covers rank/quantile
# questions ("p99 order value per day, merged across days") without a
# global sort. Classic two-level weighted systematic sampling (the
# deterministic special case of the mergeable quantile summaries of
# Agarwal et al. 2012, "Mergeable summaries"):
#
#   * leaf: values are hashed into B buckets; each bucket keeps the k
#     systematic ranks of its SORTED values — element at 0-based index
#     floor((2i+1)*n_b / 2k) for i in 0..k-1 — each carrying weight n_b
#     (one uniform 1/k scale, dropped so all arithmetic stays integer).
#     Within-bucket rank error <= n_b/2k by construction.
#   * merge/query: the B*k weighted rows (BOUNDED — this is the whole
#     point) are rank-scanned: the p-quantile estimate is the smallest
#     value whose cumulative weight reaches p*k*N, an integer
#     comparison (100*cum >= p*k*N for integer percents). Total rank
#     error <= sum_b n_b/2k = N/2k plus discretization — e.g. k=64
#     gives <1% rank error regardless of N or distribution.
#
# Merging shards/days = unioning their leaf summaries (weights carry);
# buckets never need re-reading. Deterministic end to end (sorting,
# index arithmetic, integer rank scan), so the DuckDB oracle replays
# the SAME summary bit-for-bit — the estimate itself is hash-gated.
# ---------------------------------------------------------------------------
def quantile_summary(
    rows: DataFrame,
    value_col: str,
    bucket: Column,
    k: int = 64,
) -> DataFrame:
    """Leaf quantile summaries: (bucket, i, val, n_b) with exactly k
    rows per non-empty bucket; ``val`` is the bucket's systematic
    rank-i sample, weighted n_b. Scale: ONE shuffle keyed on the
    (hash-uniform) bucket; the per-bucket sort is bounded by the
    bucket size — size B to taste (B ~ corpus/executor-memory). The
    output is B*k rows — persist it and every later quantile question
    (per shard, per union of shards) never re-reads the corpus."""
    per = (
        rows.select(bucket.alias("bucket"), F.col(value_col).alias("_v"))
        .groupBy("bucket")
        .agg(F.array_sort(F.collect_list("_v")).alias("_arr"), F.count("*").alias("n_b"))
    )
    idx = F.sequence(F.lit(0), F.lit(k - 1))
    picked = F.transform(
        idx,
        lambda i: F.element_at(
            F.col("_arr"),
            (
                F.floor(((i * 2 + 1) * F.col("n_b")) / F.lit(2 * k)) + 1
            ).cast("int"),
        ),
    )
    return per.select(
        "bucket", "n_b", F.posexplode(picked).alias("i", "val")
    ).select("bucket", "i", "val", "n_b")


def quantile_estimates(summary: DataFrame, pcts: list[int]) -> DataFrame:
    """Quantile estimates from a (merged) summary: (pct, est_value).
    The rank scan orders the BOUNDED summary (B*k rows — the
    unpartitioned window is over the sketch, never the corpus) and
    picks, per integer percent, the smallest value whose cumulative
    weight reaches pct*k*N/100 — all-integer arithmetic, so the
    estimate is deterministic and oracle-replayable."""
    w = W.orderBy("val", "bucket", "i").rowsBetween(W.unboundedPreceding, 0)
    cum = summary.withColumn("_cum", F.sum("n_b").over(w))
    total = summary.groupBy().agg(F.sum(F.col("n_b")).alias("_ktotal"))
    pct_rows = F.explode(F.array(*[F.lit(p) for p in pcts])).alias("pct")
    return (
        cum.crossJoin(F.broadcast(total.select(pct_rows, "_ktotal")))
        .filter(F.col("_cum") * 100 >= F.col("pct") * F.col("_ktotal"))
        .groupBy("pct")
        .agg(F.min("val").alias("est_value"))
    )
