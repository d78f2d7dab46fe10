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

    Scale: the self-join is an inverted-index join — cost is
    Σ_shingle df(shingle)², so ubiquitous shingles are the hot spot.
    ``max_doc_freq`` drops shingles appearing in more than that many
    docs (stop-shingles carry no dedup signal but quadratic cost); at
    100 TB prefer the MinHash/LSH path below.
    """
    if max_doc_freq is not None:
        keep = (
            postings.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("shingle")
        )
        postings = postings.join(keep, "shingle", "left_semi")
    sizes = postings.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a = postings.select(F.col(id_col).alias("doc_a"), "shingle")
    b = postings.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
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
    a = banded.select(F.col(id_col).alias("doc_a"), "band_idx", "band_key")
    b = banded.select(F.col(id_col).alias("doc_b"), "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 25
) -> DataFrame:
    """Cluster near-duplicate PAIRS into groups: connected components by
    iterative min-label propagation — the step that turns pairwise dedup
    output into canonical-document groups (cluster_id = min node id in
    the component; keep that doc, drop the rest).

    Per iteration: every node adopts the smallest label among itself
    and its neighbors (one equi-join + one min-aggregation); labels
    decrease monotonically, so the total converges within the graph
    diameter — for near-dup graphs that is small (dup clusters are
    dense). The per-iteration driver action is a single scalar
    convergence check, and ``localCheckpoint`` truncates lineage so the
    plan does not grow with iterations — the standard Spark shape for
    iterative graph algorithms (GraphFrames' CC does the same).

    Scale: each iteration shuffles |E| rows on the node key; total cost
    O(diameter · |E|) — the large-star/small-star optimization halves
    the constant if diameters grow, noted not implemented."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint(eager=True)
    labels = e.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    labels = labels.localCheckpoint(eager=True)
    prev: int | None = None
    converged = False
    for _ in range(max_iter):
        prop = e.join(labels, e["a"] == labels["node"]).select(
            F.col("b").alias("node"), "label"
        )
        labels = (
            labels.union(prop).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        total = labels.agg(F.sum("label")).collect()[0][0]
        if total == prev:
            converged = True
            break
        prev = total
    if not converged:
        # A component whose diameter exceeds max_iter would get WRONG
        # cluster ids with no other signal — fail loudly rather than
        # return silently-split components. (If real graphs ever hit
        # this, raise max_iter or switch to the large-star/small-star
        # variant, which converges in O(log²) rounds.)
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "iterations; component diameter exceeds the iteration budget"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


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
