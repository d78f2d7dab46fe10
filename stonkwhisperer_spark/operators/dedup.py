"""Deduplication operators for LLM training-data pipelines.

Four tiers, in increasing tolerance for fuzz:
  * exact (hash-groupBy / keep-first window) — see plans/queries.py
    dedup_keep_first / dedup_low_card;
  * n-gram Jaccard (exact set similarity over word shingles) —
    ``jaccard_pairs``: pairs are generated only through co-occurring
    shingles (an inverted-index join), never all-pairs;
  * MinHash + LSH banding — ``minhash_signatures`` / ``band_keys``:
    constant-size signatures, candidate pairs only within equal band
    buckets; the 100 TB path;
  * SimHash — ``simhash16``: one 16-bit signature per doc, equal-bucket
    grouping for near-exact text.

All of it is native column expressions + joins/aggregations — no UDFs,
all shuffles are on hash-uniform keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stonkwhisperer_spark.functions.hashing import portable_hash64


def explode_shingles(df: DataFrame, id_col: str, shingle_col: Column) -> DataFrame:
    """(id, shingle) posting list — distinct shingles per doc."""
    return df.select(F.col(id_col), F.explode(shingle_col).alias("shingle"))


def jaccard_pairs(
    postings: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity for every doc pair sharing ≥1 shingle.

    postings: (id, shingle) with distinct shingles per doc.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.

    Scale: grouped inverted index — the postings shuffle ONCE on
    shingle into per-shingle sorted doc lists, and that grouped subtree
    is shared by the pair generator AND the doc-size branch through
    Catalyst Exchange reuse: one corpus pass, one shuffle, no
    checkpoint pinning blocks in executor memory (this replaced both
    the two-sided a⋈b self-join — which shuffled the postings twice —
    and the caller-side localCheckpoint sharing). Candidate pairs are
    generated MAP-SIDE from each list (i<j over the sorted ids, so
    doc_a < doc_b by construction); cost is still Σ_shingle df², so
    ubiquitous shingles are the hot spot — ``max_doc_freq`` drops
    shingles above that document frequency (stop-shingles carry no
    dedup signal but quadratic cost; the same rows one df-filter used
    to remove via an extra count+semi-join pass, now a free size()
    predicate on the grouped list). At 100 TB prefer the MinHash/LSH
    path below.
    """
    grouped = postings.groupBy("shingle").agg(
        F.array_sort(F.collect_list(F.col(id_col))).alias("_ds")
    )
    if max_doc_freq is not None:
        grouped = grouped.filter(F.size("_ds") <= max_doc_freq)
    sizes = (
        grouped.select(F.explode("_ds").alias(id_col))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shingles"))
    )
    inter = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(_ds, (x, i) -> "
                    "transform(slice(_ds, i + 2, size(_ds) - i - 1), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("_p")
        )
        .select(F.col("_p.a").alias("doc_a"), F.col("_p.b").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("na"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_prefix(
    postings: DataFrame,
    id_col: str = "doc_id",
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_doc_freq: int | None = None,
    guard_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (the PPJoin family,
    Xiao et al., WWW'08): identical output to :func:`jaccard_pairs`
    at threshold = num/den, but candidate pairs are generated only
    through each document's PREFIX — its ``n - ceil(t·n) + 1`` rarest
    shingles under a total global order (document frequency, then
    shingle text). The prefix-filter theorem guarantees two documents
    with Jaccard ≥ t share at least one prefix shingle, so the pruning
    is LOSSLESS; candidates are then verified with a full intersection
    count.

    The threshold arrives as an integer fraction so the prefix length
    is computed in EXACT integer arithmetic — ``ceil(0.8 * 5)`` in
    doubles is 5 (0.8 is not representable), which would make the
    prefix empty and silently drop true pairs.

    Scale: this is the exact-join answer to the inverted-index hot-key
    problem — the self-join cost drops from Σ df(shingle)² over ALL
    shingles to Σ df_prefix(shingle)² over prefix occurrences only
    (rare shingles by construction, so hot keys are structurally
    excluded rather than capped); verification touches only candidate
    pairs. The posting-list plan (typically a regex-heavy corpus pass)
    is evaluated ONCE: every branch — document frequency, prefix rank,
    document sizes, and BOTH verification sides — consumes the same
    grouped inverted index (``groupBy(shingle) → sorted doc list``),
    whose one full-volume Exchange Catalyst serves to all five readers
    as a ReusedExchange; df and per-doc size are derived from the
    grouped lists (``size(_ds)`` / a count over the rank window)
    instead of separate postings aggregations. The round-9 shape
    consumed raw ``postings`` from each branch, and per-branch column
    pruning made the subtrees non-identical — no exchange reuse, six
    regex corpus passes in one query (BENCH_r09 1.36×; the committed
    plan evidence shows the repeated scans). No UDFs.

    Skew bound: the grouped index buffers one sorted id list per
    shingle, so the largest per-task aggregation state is the hottest
    shingle's document frequency — the prefix filter excludes hot
    shingles from CANDIDATE GENERATION but their lists still
    materialize for df/size/verify. For corpora with pathological
    stop-shingles, ``max_doc_freq`` drops shingles above that df
    before anything else runs — the same (LOSSY: capped shingles also
    leave the verify intersection, so jaccard is computed over the
    surviving shingle space) escape hatch as :func:`jaccard_pairs` —
    or use the MinHash path, whose state is constant-size signatures.
    ``guard_doc_freq`` is the LOSSLESS middle ground: results are
    byte-identical to the unguarded run, but any shingle whose df
    exceeds the bound raises a diagnostic error in-plan (naming the
    shingle and its df) instead of letting one task's aggregation
    state grow silently toward an opaque executor OOM — the fail-loud
    contract for corpora whose stop-shingle profile is unknown."""
    from pyspark.sql.window import Window

    grouped = postings.groupBy("shingle").agg(
        F.array_sort(F.collect_list(F.col(id_col))).alias("_ds")
    )
    if max_doc_freq is not None:
        grouped = grouped.filter(F.size("_ds") <= max_doc_freq)
    if guard_doc_freq is not None:
        # Applied once in the SHARED grouped subtree (all downstream
        # branches consume `exploded` below, so exchange reuse holds).
        grouped = grouped.select(
            "shingle",
            F.when(F.size("_ds") <= F.lit(guard_doc_freq), F.col("_ds"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "jaccard_pairs_prefix: shingle doc-frequency "
                            f"guard ({guard_doc_freq}) exceeded by '"
                        ),
                        F.col("shingle"),
                        F.lit("' (df="),
                        F.size("_ds").cast("string"),
                        F.lit(
                            "); cap it with max_doc_freq or switch to the "
                            "MinHash path"
                        ),
                    )
                )
            )
            .alias("_ds"),
        )
    # The one shared subtree: exploded grouped index with df attached.
    # Every downstream branch reads exactly this (same columns, same
    # lineage), so the expensive Exchange under `grouped` is reused.
    exploded = grouped.select(
        "shingle", F.size("_ds").alias("_df"), F.explode("_ds").alias(id_col)
    )
    wp = Window.partitionBy(id_col)
    ranked = exploded.select(
        F.col(id_col),
        "shingle",
        F.row_number().over(wp.orderBy("_df", "shingle")).alias("_rk"),
        F.count("*").over(wp).alias("n"),
    )
    prefix = (
        ranked
        # prefix_len = n - ceil(t*n) + 1, exact:
        # ceil(num*n/den) = (num*n + den - 1) DIV den
        .filter(
            F.col("_rk")
            <= F.col("n")
            - F.expr(
                f"(({threshold_num} * n + {threshold_den - 1}) "
                f"DIV {threshold_den})"
            )
            + 1
        )
        .select(id_col, "shingle")
    )
    a = prefix.select(F.col(id_col).alias("doc_a"), "shingle")
    b = prefix.select(F.col(id_col).alias("doc_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    pa = exploded.select(F.col(id_col).alias("doc_a"), "shingle")
    pb = exploded.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        cand.join(pa, "doc_a")
        .join(pb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sizes = exploded.groupBy(id_col).agg(F.count("*").alias("n"))
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(
            F.col("inter") * threshold_den
            >= threshold_num * (F.col("na") + F.col("nb") - F.col("inter"))
        )
    )


def minhash_signature(shingle_arr: Column, n_hashes: int = 16) -> Column:
    """MinHash signature (array of n_hashes bigints) of a shingle array:
    sig[i] = min over shingles of hash_i(shingle). Empty shingle set →
    null signature (caller filters).

    NOTE: higher-order array functions execute INTERPRETED (outside
    whole-stage codegen) — fine for modest rows, but for bulk corpora
    prefer ``minhash_signatures_exploded`` below, whose per-seed hashes
    are plain codegen'd columns over the exploded posting list."""
    mins = [
        F.array_min(F.transform(shingle_arr, lambda s: portable_hash64(s, seed=i)))  # noqa: B023
        for i in range(n_hashes)
    ]
    return F.when(F.size(shingle_arr) > 0, F.array(*mins))


def minhash_signatures_exploded(
    postings: DataFrame, id_col: str = "doc_id", n_hashes: int = 16
) -> DataFrame:
    """MinHash signatures from a (id, shingle) posting list: n_hashes
    md5 columns per posting row (whole-stage codegen) → map-side
    partial min aggregation → one signature array per doc. The bulk
    path: per-row work is codegen'd, the shuffle carries one
    n_hashes-wide row per doc per mapper."""
    aggs = [
        F.min(portable_hash64("shingle", seed=i)).alias(f"_h{i}") for i in range(n_hashes)
    ]
    return (
        postings.groupBy(id_col)
        .agg(*aggs)
        .select(id_col, F.array(*[F.col(f"_h{i}") for i in range(n_hashes)]).alias("sig"))
    )


def band_keys(sig: Column, n_bands: int, rows_per_band: int) -> Column:
    """LSH band keys: array of n_bands md5 digests, each over one
    signature band (rows_per_band values, comma-joined). Equal band key
    ⇒ candidate pair."""
    bands = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.element_at(sig, b * rows_per_band + r + 1).cast("string")
                    for r in range(rows_per_band)
                ],
            )
        )
        for b in range(n_bands)
    ]
    return F.array(*bands)


def candidates_from_banded(banded: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) from an exploded
    (id, band_idx, band_key) band table — the shared tail of the
    from-scratch path (:func:`lsh_candidates`) and the maintained-index
    path (minhash_index_upsert reads the same shape off its txlog
    table), so the two stay provably identical under the
    incremental == rebuild hash gate."""
    a = banded.select(F.col(id_col).alias("doc_a"), "band_idx", "band_key")
    b = banded.select(F.col(id_col).alias("doc_b"), "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def lsh_candidates(
    docs: DataFrame, id_col: str, sig_col: Column, n_bands: int, rows_per_band: int
) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing at least one LSH
    band bucket. Scale: shuffle on (band_idx, band_key) — bucket sizes
    are the quadratic cost; tune n_bands/rows_per_band so buckets stay
    small, and AQE skew-join splits the stragglers."""
    banded = docs.select(
        F.col(id_col),
        F.posexplode(band_keys(sig_col, n_bands, rows_per_band)).alias("band_idx", "band_key"),
    )
    return candidates_from_banded(banded, id_col)


def incremental_lsh_dedup(
    postings: DataFrame,
    id_col: str = "doc_id",
    incoming_col: str = "is_incoming",
    n_hashes: int = 16,
    n_bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Dedup an INCOMING batch against an EXISTING corpus — the daily
    ingest shape of a production training-data pipeline (new crawl
    arrives; everything near-duplicating the already-curated corpus is
    dropped before it ever reaches training). Self-dedup
    (``jaccard_pairs`` / ``lsh_candidates``) answers "which of my docs
    duplicate each other"; this answers "which NEW docs duplicate what
    I already have" — an asymmetric cross-corpus question, so incoming
    docs are never compared to each other.

    postings: (id, shingle, is_incoming) with distinct shingles per doc
    (``shingle_postings``); ``incoming_col`` is a boolean splitting the
    rows into corpus (false) and incoming batch (true).

    Returns ONE row per incoming doc that produced shingles:
    (id, is_dup int 0/1, dup_of = min corpus id whose exact Jaccard
    with it clears ``threshold``, null when clean). LSH proposes,
    exact Jaccard disposes: a band collision alone never kills a doc.

    Scale: one grouped pass computes signature AND shingle count per
    doc; the candidate join shuffles only on (band_idx, band_key) with
    the corpus side reduced to 4 band rows per doc; the exact-Jaccard
    verify re-reads postings ONLY for docs that appear in a candidate
    pair (join-pruned). On a real pipeline the corpus half of the
    per-doc frame is computed once and SERVED from storage (it is a
    plain table — e.g. a txlog sink), so the per-batch cost is
    signatures over the new docs + one band-key join against the
    stored index; the incoming side of the join is the small daily
    batch, broadcastable when it fits.
    """
    inc = F.col(incoming_col)
    aggs = [
        F.min(portable_hash64("shingle", seed=i)).alias(f"_h{i}") for i in range(n_hashes)
    ]
    per_doc = (
        postings.groupBy(id_col, incoming_col)
        .agg(*aggs, F.count("*").alias("n_shingles"))
        .select(
            id_col,
            incoming_col,
            F.array(*[F.col(f"_h{i}") for i in range(n_hashes)]).alias("sig"),
            "n_shingles",
        )
    )
    banded = per_doc.select(
        id_col,
        incoming_col,
        F.posexplode(band_keys(F.col("sig"), n_bands, rows_per_band)).alias(
            "band_idx", "band_key"
        ),
    )
    cand = (
        banded.filter(inc)
        .select(F.col(id_col).alias("inc_id"), "band_idx", "band_key")
        .join(
            banded.filter(~inc).select(
                F.col(id_col).alias("corp_id"), "band_idx", "band_key"
            ),
            ["band_idx", "band_key"],
        )
        .select("inc_id", "corp_id")
        .distinct()
    )
    inter = (
        cand.join(
            postings.filter(inc).select(F.col(id_col).alias("inc_id"), "shingle"),
            "inc_id",
        )
        .join(
            postings.filter(~inc).select(F.col(id_col).alias("corp_id"), "shingle"),
            ["corp_id", "shingle"],
        )
        .groupBy("inc_id", "corp_id")
        .agg(F.count("*").alias("inter"))
    )
    sz = per_doc.select(id_col, "n_shingles")
    dups = (
        inter.join(sz.select(F.col(id_col).alias("inc_id"), F.col("n_shingles").alias("_ni")), "inc_id")
        .join(sz.select(F.col(id_col).alias("corp_id"), F.col("n_shingles").alias("_nc")), "corp_id")
        .filter(
            F.col("inter").cast("double")
            / (F.col("_ni") + F.col("_nc") - F.col("inter")).cast("double")
            >= threshold
        )
        .groupBy("inc_id")
        .agg(F.min("corp_id").alias("dup_of"))
        .withColumnRenamed("inc_id", id_col)
    )
    return (
        per_doc.filter(inc)
        .select(id_col)
        .join(dups, id_col, "left")
        .select(
            id_col,
            F.when(F.col("dup_of").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("is_dup"),
            "dup_of",
        )
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    algorithm: str = "auto",
    dedup_edges: bool = True,
) -> DataFrame:
    """Cluster near-duplicate PAIRS into groups: connected components —
    the step that turns pairwise dedup output into canonical-document
    groups (cluster_id = min node id in the component; keep that doc,
    drop the rest). Returns (node, cluster_id).

    Two engines behind one API:

    * ``"label"`` — min-label propagation: every node adopts the
      smallest label among itself and its neighbors per iteration (one
      equi-join + one min-aggregation). O(diameter · |E|) total — the
      cheap path for dense, small-diameter near-dup clusters, which is
      what MinHash/LSH candidate graphs overwhelmingly are. Raises
      loudly if the diameter exceeds ``max_iter`` (silently-split
      components would poison the kill list).
    * ``"star"`` — alternating large-star/small-star contraction
      (Kiveris et al. 2014, "Connected Components in MapReduce and
      Beyond"): each round hooks every node to the minimum of a
      neighborhood, collapsing chains exponentially — O(log² n) rounds
      REGARDLESS of diameter. The scale path for pathological shapes
      (crawl-chain duplicate components are real inputs).
    * ``"auto"`` (default) — min-label first; if the iteration budget
      is hit (diameter > max_iter), fall back to the star algorithm
      instead of failing. Dense clusters never pay the two-phase cost;
      chains still converge.

    The first TWO rounds are unrolled into one declarative plan whose
    convergence check rides the same job: min-label is monotone
    nonincreasing per node, so sum(round2) == sum(round1) iff round 1
    already reached the fixpoint — true for almost every near-dup
    graph (dense clusters, diameter <= 2). In that common case the
    whole computation is TWO Spark jobs — one materializing the edge
    closure, one running both rounds + both sums + the label
    materialization. Only a deeper graph falls back to the driver
    loop (one job per further round — the lazy per-round
    ``localCheckpoint`` materializes inside the convergence
    aggregation, the standard Spark shape for iterative graph
    algorithms minus the usual extra materialization job).

    ``dedup_edges=False`` skips the undirected-closure ``distinct()``
    (one shuffle): pass it when the caller guarantees unique canonical
    pairs (src < dst, no repeats) — e.g. the grouped Jaccard/MinHash
    pair outputs, which aggregate per pair by construction.

    Scale: both engines shuffle O(|E|) rows per round on node keys;
    star's round count is O(log² n) worst-case vs label's O(diameter)."""
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(f"unknown connected-components algorithm: {algorithm}")
    if max_iter < 2:
        # The first two label rounds are structurally unrolled into one
        # plan; a budget below that floor cannot be honored.
        raise ValueError(f"max_iter must be >= 2 (got {max_iter})")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if algorithm == "star":
        labels, _ = _cc_star(e)
        return labels

    # Undirected closure built map-side (one explode, no union — a
    # union would double the checkpointed partition count and every
    # downstream stage's task count).
    und = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a"), F.col("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )
        ).alias("_e")
    ).select("_e.a", "_e.b")
    if dedup_edges:
        und = und.distinct()
    # The closure feeds both propagation rounds — one eager checkpoint
    # materializes the (possibly expensive) edge lineage exactly once.
    # (Measured: leaving it lazy and relying on exchange reuse across
    # the round branches re-ran a jaccard edge plan per branch — 2×
    # the wall at sf0.1.)
    und = und.localCheckpoint(eager=True)
    # Rounds 1+2 UNROLLED into one declarative plan, fixpoint-checked
    # in the SAME job: min-label propagation is monotone nonincreasing
    # per node, so sum(L2) == sum(L1) iff L2 == L1 iff L1 is already
    # the fixpoint — which near-dup graphs (dense, diameter <= 2)
    # overwhelmingly reach by round 1. Round 1 needs no seed relation
    # or join at all: the closure lists every in-neighbor of every
    # node, so L1(v) = least(v, min{a : (a,v)}) is ONE groupBy. Round
    # 2 translates neighbor labels through L1 (the one unavoidable
    # join), and both round-sums ride the same single-row aggregate —
    # the whole fixpoint (both rounds, both sums, the per-node label
    # materialization via lazy checkpoint) is ONE Spark job on top of
    # the single closure job.
    l1 = (
        und.groupBy(F.col("b").alias("node"))
        .agg(F.min("a").alias("_nbr"))
        .select("node", F.least("node", "_nbr").alias("label"))
    )
    nbr2 = (
        und.join(l1, und["a"] == l1["node"])
        .groupBy(F.col("b").alias("_n2"))
        .agg(F.min("label").alias("_nbr2"))
    )
    pn = (
        l1.join(nbr2, l1["node"] == nbr2["_n2"])
        .select("node", "label", F.least("label", "_nbr2").alias("label2"))
        .localCheckpoint(eager=False)
    )
    row = pn.agg(F.sum("label").alias("_s1"), F.sum("label2").alias("_s2")).collect()[0]
    converged = row["_s1"] == row["_s2"]
    prev = row["_s2"]
    labels = pn.select("node", F.col("label2").alias("label"))

    def one_round(und_df: DataFrame, labels_df: DataFrame) -> DataFrame:
        p = und_df.join(labels_df, und_df["a"] == labels_df["node"]).select(
            F.col("b").alias("node"), "label"
        )
        return (
            labels_df.union(p).groupBy("node").agg(F.min("label").alias("label"))
        )
    if not converged:
        # Deep graph: continue from the materialized L2 with the
        # driver loop; the unrolled rounds count against the budget.
        for _ in range(max(0, max_iter - 2)):
            labels = one_round(und, labels).localCheckpoint(eager=False)
            total = labels.agg(F.sum("label")).collect()[0][0]
            if total == prev:
                converged = True
                break
            prev = total
    if converged:
        return labels.select("node", F.col("label").alias("cluster_id"))
    if algorithm == "label":
        # Explicit label mode: a component whose diameter exceeds
        # max_iter would get WRONG cluster ids with no other signal —
        # fail loudly rather than return silently-split components.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "iterations; component diameter exceeds the iteration budget "
            "(use algorithm='star' or 'auto')"
        )
    # auto: the diameter beat the budget — switch to the O(log²) engine.
    labels, _ = _cc_star(e)
    return labels


def _cc_star(e: DataFrame, max_rounds: int = 30) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star connected components (Kiveris
    et al. 2014). Returns ((node, cluster_id), rounds).

    Per round over the current edge set:
      * large-star: for every node u with m = min(N(u) ∪ {u}), rewire
        each STRICTLY LARGER neighbor v to (v, m) — long chains halve;
      * small-star: orient edges (larger → smaller); for every node u
        with m = min of its (all-smaller) neighbors, rewire each
        neighbor and u itself to m — local stars flatten.
    The fixpoint is a disjoint union of stars rooted at each
    component's minimum node; convergence is detected by an exact
    64-bit set signature (count + sum of per-edge xxhash64 — an
    order-free digest of the canonical edge set, collision odds
    ~2⁻⁶⁴). Non-convergence within ``max_rounds`` (≫ log² of any
    realistic n) raises rather than returning split components.

    Scale: each phase is one groupBy + one join on node keys, O(|E|)
    shuffled rows; rounds are O(log² n) regardless of diameter — a
    1000-node path converges in ~5 rounds where label propagation
    needs 999 (tests/test_operators.py pins this)."""
    # Canonical orientation (larger → smaller), no self loops.
    cur = (
        e.select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig: tuple | None = None
    rounds = 0
    converged = False
    for rounds in range(1, max_rounds + 1):
        und = cur.union(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
        # m(u) = min(N(u) ∪ {u}); large-star keeps only v > u emissions,
        # so emitted (v, m) always has v > m — already canonical.
        mins = und.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("_m"))
        large = (
            und.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # Small-star on the canonical orientation: every neighbor is
        # smaller, so m = min(N(u)); rewire neighbors and u to m.
        mins2 = large.groupBy("a").agg(F.min("b").alias("_m"))
        cur = (
            large.join(mins2, "a")
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .union(mins2.select("a", F.col("_m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        row = cur.agg(
            F.count("*").alias("n"),
            # decimal(38,0): an exact sum of 64-bit hashes can't
            # overflow (ANSI mode would throw on a bigint sum).
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"star connected_components did not converge within {max_rounds} rounds"
        )
    parents = cur.groupBy("a").agg(F.min("b").alias("cluster_id")).select(
        F.col("a").alias("node"), "cluster_id"
    )
    labels = nodes.join(parents, "node", "left").select(
        "node", F.coalesce("cluster_id", F.col("node")).alias("cluster_id")
    )
    return labels, rounds


def simhash16(toks: Column) -> Column:
    """16-bit SimHash over distinct tokens: bit j is the sign of
    Σ_tokens (±1 by bit j of the token hash). Near-identical docs share
    the signature; group-by-signature gives near-exact dedup buckets.

    Array-fold form (interpreted HOFs) — for bulk corpora use
    ``simhash16_exploded``, the codegen'd aggregate formulation."""
    dtoks = F.array_distinct(toks)
    hashes = F.transform(dtoks, lambda t: portable_hash64(t))
    bit_sums = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc  # noqa: B023
            + F.when(h.bitwiseAND(F.lit(1 << j)) != 0, F.lit(1)).otherwise(F.lit(-1)),  # noqa: B023
        )
        for j in range(16)
    ]
    out = F.lit(0)
    for j, s in enumerate(bit_sums):
        out = out + F.when(s >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out.cast("int")


def simhash16_exploded(token_rows: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """SimHash from exploded (id, tok) rows (distinct per doc): ONE
    codegen'd hash per row, 16 conditional sums map-side, bit-combine
    after the aggregation. The bulk path — everything stays in
    whole-stage codegen; the shuffle carries 16 ints per doc."""
    h = portable_hash64("tok")
    sums = [
        F.sum(
            F.when(h.bitwiseAND(F.lit(1 << j)) != 0, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"_s{j}")
        for j in range(16)
    ]
    agg = token_rows.groupBy(id_col).agg(*sums)
    out = F.lit(0)
    for j in range(16):
        out = out + F.when(F.col(f"_s{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return agg.select(id_col, out.cast("int").alias("simhash"))


def word_spans(text: Column, chunk_words: int = 16) -> Column:
    """Fixed-width word spans of a document: split on single spaces,
    regroup into ``chunk_words``-word chunks (the last one ragged).
    Pure JVM array expressions — ``split``/``sequence``/``transform``/
    ``slice``/``array_join`` — so span construction is map-only
    whole-stage codegen, no shuffle and no Python.

    This is the unit of EXACT duplicated-span removal (the
    boilerplate-paragraph scrub of C4/RefinedWeb-style curation,
    applied at word-chunk granularity for delimiter-free corpora);
    swap in ``F.split(text, delim)`` directly when real paragraph
    boundaries exist."""
    words = F.split(text, " ")
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "
        ),
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Corpus-wide exact duplicated-span removal, keep-first: a span
    occurrence survives only if it is the FIRST occurrence of that
    span text in the whole corpus (ordered by (id, position) — fully
    deterministic); every later repeat, in other documents or later in
    the same document, is dropped. Returns one row per input document:
    (id, n_spans, n_kept, clean_text) with the surviving spans
    re-joined in original order (empty string when nothing survives —
    the downstream length filter kills those).

    Scale shape: first-occurrence is a ``min(struct(id, pos))``
    AGGREGATION per span — partial-aggregable map-side (unlike a
    window over the span key), so a hot boilerplate span contributes
    one partial row per task, not one shuffled row per occurrence.
    The join back to occurrences does carry every occurrence of the
    hot span through one reducer; AQE skew-join splits it. Two
    hash-uniform shuffles total (span text, then id) — never
    all-pairs, never Python."""
    spans = df.select(
        F.col(id_col), F.posexplode(F.col(spans_col)).alias("pos", "span")
    )
    firsts = spans.groupBy("span").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first_occ")
    )
    tagged = spans.join(firsts, "span").withColumn(
        "keep",
        (F.col(f"first_occ.{id_col}") == F.col(id_col))
        & (F.col("first_occ.pos") == F.col("pos")),
    )
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct(F.col("pos"), F.col("span")))
                    )
                ),
                lambda s: s.span,
            ),
            " ",
        ).alias("clean_text"),
    )
