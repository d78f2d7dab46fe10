"""LLM training-data pipeline queries: near-dup detection (exact
Jaccard, MinHash+LSH, SimHash), document fingerprinting, and
similarity search over embeddings (brute-force kNN + LSH buckets).

Every query has an exact DuckDB oracle built on the portable md5-based
hash (functions/hashing.py) so even the hash-driven ops verify
cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
    shingle_postings,
    shingles_sql,
    tokens_of,
)
from stonkwhisperer_spark.functions.text import clean_text_for_nlp, clean_text_for_nlp_sql
from stonkwhisperer_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidates,
    minhash_signatures_exploded,
    simhash16_exploded,
)
from stonkwhisperer_spark.operators.similarity import (
    hyperplane_bucket,
    knn_bruteforce,
    plane_component,
)
from stonkwhisperer_spark.plans.glue import bounded_collect
from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table, no_pushdown, spread

# Shared CTE: documents → cleaned text → tokens → distinct 3-gram
# shingle posting list, identical on both engines.
_CLEAN = clean_text_for_nlp_sql("text")
_TOKS = f"regexp_split_to_array({_CLEAN}, ' ')"
_POSTINGS_SQL = f"""
    SELECT doc_id, unnest({shingles_sql(_TOKS, 3)}) AS shingle
    FROM documents
"""


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Window-lead formulation: everything stays in codegen (the array
    # HOF route evaluates interpreted and is ~16x slower), and the
    # window shuffle on doc_id balances work regardless of file layout.
    docs = load_table(spark, sf_dir, "documents")
    return shingle_postings(docs, "doc_id", clean_text_for_nlp("text"), 3)


# --------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup pairs (inverted-index join, no all-pairs).
# --------------------------------------------------------------------------
_JACCARD_CTES = f"""
    postings AS ({_POSTINGS_SQL}),
    sz AS (SELECT doc_id, count(*) AS n FROM postings GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM postings a JOIN postings b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    scored_pairs AS (
      SELECT doc_a, doc_b,
             cast(inter AS double) / cast(sa.n + sb.n - inter AS double) AS jaccard
      FROM inter
      JOIN sz sa ON doc_a = sa.doc_id
      JOIN sz sb ON doc_b = sb.doc_id
    )
"""


@register(
    "near_dup_jaccard",
    oracle=f"""
    WITH {_JACCARD_CTES}
    SELECT doc_a, doc_b, jaccard FROM scored_pairs WHERE jaccard >= 0.8
    """,
)
def q_near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-duplicate pairs (threshold 0.8).
    Scale: pairs come only from co-occurring shingles (inverted-index
    self-join); quadratic only in per-shingle doc frequency — cap hot
    shingles via jaccard_pairs(max_doc_freq=...) or use the MinHash
    path at 100 TB."""
    return jaccard_pairs(_postings(spark, sf_dir), threshold=0.8)


# --------------------------------------------------------------------------
# Dedup clustering: near-dup pairs → connected components → canonical
# doc per cluster. Spark side is iterative min-label propagation; the
# oracle is a recursive CTE computing reachability min per node.
# --------------------------------------------------------------------------
@register(
    "dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_CTES},
    pairs AS (SELECT doc_a, doc_b FROM scored_pairs WHERE jaccard >= 0.8),
    cc_edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    cc_nodes AS (SELECT a AS n FROM cc_edges UNION SELECT b FROM cc_edges),
    reach(s, d) AS (
      SELECT n, n FROM cc_nodes
      UNION
      SELECT r.s, e.b FROM reach r JOIN cc_edges e ON r.d = e.a
    )
    SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s
    """,
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup clustering: exact-Jaccard near-dup pairs →
    connected components (iterative min-label propagation,
    operators/dedup.py) → (doc_id, cluster_id) with cluster_id = the
    canonical (min) member. The keep/drop decision of a production
    dedup pipeline reads straight off this frame. Iterative driver
    loop with per-iteration scalar convergence check + localCheckpoint
    lineage truncation — the idiomatic Spark shape for graph
    iteration. Oracle: recursive-CTE reachability (DuckDB)."""
    from stonkwhisperer_spark.operators.dedup import connected_components

    pairs = jaccard_pairs(_postings(spark, sf_dir), threshold=0.8)
    # dedup_edges=False: jaccard_pairs aggregates per canonical
    # (doc_a < doc_b) pair, so the undirected closure is already
    # duplicate-free — skip CC's safety distinct (one shuffle).
    return connected_components(
        pairs, "doc_a", "doc_b", dedup_edges=False
    ).select(F.col("node").alias("doc_id"), "cluster_id")


# --------------------------------------------------------------------------
# MinHash (16 hashes) + LSH banding (4 bands × 4 rows) candidate pairs.
# --------------------------------------------------------------------------
def _minhash_sql(postings_sql: str = _POSTINGS_SQL) -> str:
    """The WITH-body through ``bands`` (doc_id, band_idx, band_key) —
    shared by the from-scratch banding oracles and the forget-cascade
    oracle (``postings_sql`` swaps in the post-erasure posting list)."""
    return f"""
    WITH postings AS ({postings_sql}),
    hashes AS (
      SELECT doc_id, seed.s AS seed,
             {portable_hash64_sql("(seed.s || '|' || shingle)")} AS h
      FROM postings, (SELECT unnest(range(16)) AS s) seed
    ),
    sig AS (SELECT doc_id, seed, min(h) AS mh FROM hashes GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, seed // 4 AS band_idx,
             md5(string_agg(cast(mh AS varchar), ',' ORDER BY seed)) AS band_key
      FROM sig GROUP BY doc_id, seed // 4
    )
"""


_MINHASH_SQL = _minhash_sql()
# Python-side banding geometry; the SQL mirror hardcodes the same
# 16 = _N_BANDS * _ROWS_PER_BAND seeds and the seed // 4 band split.
_N_BANDS, _ROWS_PER_BAND = 4, 4
_MINHASH_CAND_TAIL = """
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b USING (band_idx, band_key)
    WHERE a.doc_id < b.doc_id
    """


@register(
    "minhash_band_candidates",
    oracle=_MINHASH_SQL
    + _MINHASH_CAND_TAIL,
)
def q_minhash_band_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs: 16-hash signatures, 4
    bands of 4 — a pair is a candidate iff some band matches exactly.
    Scale: the 100 TB dedup path — signatures via the exploded codegen
    formulation (16 hash columns + map-side partial min; no interpreted
    array lambdas), one shuffle on (band_idx, band_key), bucket-local
    pair generation; verify candidates with exact Jaccard afterwards."""
    sigs = minhash_signatures_exploded(_postings(spark, sf_dir), "doc_id", 16)
    return lsh_candidates(
        sigs, "doc_id", F.col("sig"), n_bands=_N_BANDS, rows_per_band=_ROWS_PER_BAND
    )


# --------------------------------------------------------------------------
# minhash_index_upsert — the third retrieval/dedup-index MAINTENANCE
# twin (VERDICT r11 task 2, completing the trilogy with
# bm25_index_upsert and ivf_assign_incremental): the LSH band table is
# persisted state, MERGE-maintained per ingest batch, hash-gated
# against a from-scratch re-banding of the corpus.
# --------------------------------------------------------------------------
@register(
    "minhash_index_upsert",
    oracle=_MINHASH_SQL
    + _MINHASH_CAND_TAIL,
)
def q_minhash_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH band-index maintenance: the base corpus
    (doc_id % 4 != 0) commits its (doc_id, band_idx, band_key) rows to
    a txlog table, together with STALE band keys for half the incoming
    batch (doc_id % 8 == 0 — an older shingling's output for
    since-revised docs); the incoming batch (doc_id % 4 == 0) then
    MERGEs its true band rows keyed on (doc_id, band_idx) — stale rows
    take the update arm, unseen docs (doc_id % 8 == 4) the insert arm,
    both asserted non-empty. Every doc owns exactly n_bands rows under
    that key, so a revision can never strand a stale band row (the
    subset-key argument bm25_index_upsert needs is vacuous here).
    Candidate pairs generated from the MAINTAINED table must hash-equal
    minhash_band_candidates' from-scratch banding of the full corpus —
    incremental == rebuild, the incremental_dedup discipline applied to
    the dedup index itself.

    Scale: this is the 100 TB incremental-dedup contract — the band
    index persists; an ingest batch computes signatures for ITS docs
    only (O(batch) map-side codegen hashes + one partial-min agg),
    MERGEs n_bands rows per doc (file-level copy-on-write keyed
    rewrite), and probes the maintained index for cross-corpus
    candidates in one bucketed equi-join; the corpus is never
    re-shingled. The full self-join candidate regeneration here exists
    to hash the maintained state against the from-scratch oracle — a
    production batch joins batch-bands × index-bands instead
    (incremental_lsh_dedup's asymmetric shape). The banded table is
    localCheckpointed because three consumers (base, drafts, batch)
    would otherwise re-run the corpus shingle pass."""
    import shutil

    from stonkwhisperer_spark.operators.dedup import band_keys, candidates_from_banded
    from stonkwhisperer_spark.session import scratch_dir
    from stonkwhisperer_spark.sinks.writers import (
        merge_append,
        merge_upsert,
        read_committed,
    )

    sigs = minhash_signatures_exploded(_postings(spark, sf_dir), "doc_id", 16)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            band_keys(F.col("sig"), _N_BANDS, _ROWS_PER_BAND)
        ).alias("band_idx", "band_key"),
    ).localCheckpoint(eager=True)
    base = banded.filter(F.col("doc_id") % 4 != 0)
    batch = banded.filter(F.col("doc_id") % 4 == 0)
    drafts = batch.filter(F.col("doc_id") % 8 == 0).withColumn(
        "band_key",
        F.md5(
            F.concat_ws(
                "|",
                F.lit("stale-shingling"),
                F.col("doc_id").cast("string"),
                F.col("band_idx").cast("string"),
            )
        ),
    )
    scratch = scratch_dir("stonkw_minhash_idx_")
    try:
        target = f"{scratch}/bands"
        merge_append(
            spark, target, base.unionByName(drafts), ["doc_id", "band_idx"]
        )
        inserted, updated = merge_upsert(
            spark, target, batch, ["doc_id", "band_idx"]
        )
        if inserted == 0 or updated == 0:
            raise AssertionError(
                f"MERGE arms not both exercised: inserted={inserted}, "
                f"updated={updated}"
            )
        index = read_committed(spark, target).select(
            "doc_id", "band_idx", "band_key"
        )
        cand = candidates_from_banded(index, "doc_id")
        # Bounded glue collect: near-dup candidate pairs (the same
        # relation minhash_band_candidates gates on), not the
        # corpus-sized band table.
        rows = bounded_collect(cand, 1_000_000, "near-dup candidate pairs")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")


# --------------------------------------------------------------------------
# minhash_index_stream_upsert — the STREAMING arm of dedup-index
# maintenance (VERDICT r12 task 3, twin of bm25_index_stream_upsert):
# the LSH band table maintained from a continuous document stream via
# foreachBatch exactly-once MERGE, candidates hash-gated against the
# from-scratch re-banding.
# --------------------------------------------------------------------------
@register(
    "minhash_index_stream_upsert",
    oracle=_MINHASH_SQL + _MINHASH_CAND_TAIL,
)
def q_minhash_index_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MinHash-LSH band-index maintenance: base-corpus band
    rows (doc_id % 4 != 0) plus stale band keys for half the incoming
    docs (doc_id % 8 == 0) commit as in minhash_index_upsert; the
    incoming docs' true band rows (doc_id % 4 == 0) then arrive as a
    rate-limited landing-zone STREAM (file source, one file per
    trigger over a 4-file drop, ``Trigger.AvailableNow``) and MERGE
    into the band table per micro-batch via ``merge_upsert_txn`` keyed
    on (doc_id, band_idx) — the foreachBatch + txnVersion streaming
    upsert, exactly-once per (app, epoch). The drain must split across
    ≥2 micro-batches with both MERGE arms non-empty cumulatively, and
    a full replay over a fresh checkpoint must be a structural no-op
    (zero rows applied, committed version unmoved). Candidate pairs
    from the drained table must hash-equal the from-scratch banding of
    the full corpus — streamed-ingest == rebuild, completing the
    maintenance lifecycle for the dedup index: batch upsert (r12),
    forget (r12), STREAM (this query).

    Scale: the 100 TB continuous-dedup shape — each micro-batch
    shingles only ITS docs upstream (here the landing drop stands in
    for that), MERGEs n_bands rows per doc into the persisted index,
    and new-vs-corpus candidates come from the same bucketed equi-join
    the batch path uses; state is the table, not the stream."""
    import shutil

    from stonkwhisperer_spark.operators.dedup import band_keys, candidates_from_banded
    from stonkwhisperer_spark.session import scratch_dir
    from stonkwhisperer_spark.sinks.writers import merge_append, read_committed
    from stonkwhisperer_spark.streaming.jobs import run_txn_merge_ingest

    sigs = minhash_signatures_exploded(_postings(spark, sf_dir), "doc_id", 16)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            band_keys(F.col("sig"), _N_BANDS, _ROWS_PER_BAND)
        ).alias("band_idx", "band_key"),
    ).localCheckpoint(eager=True)
    base = banded.filter(F.col("doc_id") % 4 != 0)
    batch = banded.filter(F.col("doc_id") % 4 == 0)
    drafts = batch.filter(F.col("doc_id") % 8 == 0).withColumn(
        "band_key",
        F.md5(
            F.concat_ws(
                "|",
                F.lit("stale-shingling"),
                F.col("doc_id").cast("string"),
                F.col("band_idx").cast("string"),
            )
        ),
    )
    scratch = scratch_dir("stonkw_minhash_stream_idx_")
    try:
        target = f"{scratch}/bands"
        # Separate commits for base and drafts (see
        # bm25_index_stream_upsert): the drafts' band rows live in
        # their own files, so each micro-batch MERGE rewrites only
        # those — never the base corpus files.
        merge_append(spark, target, base, ["doc_id", "band_idx"])
        merge_append(spark, target, drafts, ["doc_id", "band_idx"])
        landing = f"{scratch}/landing"
        batch.repartition(4).write.parquet(landing)
        run_txn_merge_ingest(
            spark,
            landing,
            batch.schema,
            target,
            ["doc_id", "band_idx"],
            "minhash_stream_ingest",
            scratch,
        )
        index = read_committed(spark, target).select(
            "doc_id", "band_idx", "band_key"
        )
        rows = bounded_collect(
            candidates_from_banded(index, "doc_id"),
            1_000_000,
            "near-dup candidate pairs",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")


# --------------------------------------------------------------------------
# minhash_index_forget — the DELETE arm of dedup-index maintenance:
# right-to-be-forgotten erasure cascaded into the persisted LSH band
# table via copy-on-write delete (the complement of bm25_index_forget's
# deletion-vector path — both physical strategies are gated), candidate
# pairs hash-gated against a from-scratch re-banding of the kept corpus.
# --------------------------------------------------------------------------
@register(
    "minhash_index_forget",
    oracle=_minhash_sql(_POSTINGS_SQL + " WHERE doc_id % 10 <> 3")
    + _MINHASH_CAND_TAIL,
)
def q_minhash_index_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forget-cascade on the maintained LSH band index: the full
    corpus's (doc_id, band_idx, band_key) rows commit to a txlog
    table, erasure requests (doc_id % 10 == 3) are deleted
    COPY-ON-WRITE — only files containing a forgotten doc's band rows
    are rewritten, asserted n_bands rows per erased doc — and
    candidate pairs from the maintained table must hash-equal a
    from-scratch re-banding of the kept corpus (no forgotten doc may
    survive as a candidate, and no kept pair may be lost: both follow
    from per-doc band rows being independent, which the hash pins).
    bm25_index_forget exercises the merge-on-read deletion-vector
    strategy on the same contract; here the rewrite path is chosen —
    per-statement, exactly Delta's DV-vs-rewrite trade.

    Scale: erasing K docs rewrites only the files owning their
    n_bands rows (zone-map pruned on doc_id); the corpus is never
    re-shingled, and the erased docs stop matching future ingest
    batches the moment the commit lands — the dedup-index half of the
    GDPR contract."""
    import shutil

    from stonkwhisperer_spark.operators.dedup import band_keys, candidates_from_banded
    from stonkwhisperer_spark.session import scratch_dir
    from stonkwhisperer_spark.sinks.writers import (
        delete_where,
        merge_append,
        read_committed,
    )

    sigs = minhash_signatures_exploded(_postings(spark, sf_dir), "doc_id", 16)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            band_keys(F.col("sig"), _N_BANDS, _ROWS_PER_BAND)
        ).alias("band_idx", "band_key"),
    )
    scratch = scratch_dir("stonkw_minhash_forget_")
    try:
        target = f"{scratch}/bands"
        merge_append(spark, target, banded, ["doc_id", "band_idx"])
        forget = F.col("doc_id") % 10 == 3
        n_forget = (
            read_committed(spark, target)
            .filter(forget)
            .select("doc_id")
            .distinct()
            .count()
        )
        n_del = delete_where(spark, target, forget)
        if n_forget == 0 or n_del != n_forget * _N_BANDS:
            raise AssertionError(
                f"erasure must drop exactly n_bands rows per erased doc: "
                f"{n_forget} docs, {n_del} rows deleted"
            )
        index = read_committed(spark, target).select(
            "doc_id", "band_idx", "band_key"
        )
        rows = bounded_collect(
            candidates_from_banded(index, "doc_id"),
            1_000_000,
            "near-dup candidate pairs",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")


# --------------------------------------------------------------------------
# Incremental dedup: incoming batch vs existing corpus (MinHash LSH
# proposes, exact Jaccard disposes).
# --------------------------------------------------------------------------
@register(
    "incremental_dedup",
    oracle=f"""
    WITH postings AS ({_POSTINGS_SQL}),
    hashes AS (
      SELECT doc_id, (doc_id % 4 = 0) AS inc, seed.s AS seed,
             {portable_hash64_sql("(seed.s || '|' || shingle)")} AS h
      FROM postings, (SELECT unnest(range(16)) AS s) seed
    ),
    sig AS (SELECT doc_id, inc, seed, min(h) AS mh FROM hashes GROUP BY 1, 2, 3),
    sz AS (SELECT doc_id, count(*) AS n FROM postings GROUP BY 1),
    bands AS (
      SELECT doc_id, inc, seed // 4 AS band_idx,
             md5(string_agg(cast(mh AS varchar), ',' ORDER BY seed)) AS band_key
      FROM sig GROUP BY doc_id, inc, seed // 4
    ),
    cand AS (
      SELECT DISTINCT i.doc_id AS inc_id, c.doc_id AS corp_id
      FROM bands i JOIN bands c USING (band_idx, band_key)
      WHERE i.inc AND NOT c.inc
    ),
    overlap AS (
      SELECT cand.inc_id, cand.corp_id, count(*) AS both_n
      FROM cand
      JOIN postings pi ON pi.doc_id = cand.inc_id
      JOIN postings pc ON pc.doc_id = cand.corp_id AND pc.shingle = pi.shingle
      GROUP BY 1, 2
    ),
    dups AS (
      SELECT o.inc_id, min(o.corp_id) AS dup_of
      FROM overlap o
      JOIN sz si ON si.doc_id = o.inc_id
      JOIN sz sc ON sc.doc_id = o.corp_id
      WHERE cast(o.both_n AS double) / cast(si.n + sc.n - o.both_n AS double) >= 0.8
      GROUP BY 1
    )
    SELECT p.doc_id,
           CASE WHEN d.dup_of IS NULL THEN 0 ELSE 1 END AS is_dup,
           d.dup_of
    FROM (SELECT DISTINCT doc_id FROM postings WHERE doc_id % 4 = 0) p
    LEFT JOIN dups d ON d.inc_id = p.doc_id
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup — the production daily-ingest shape:
    docs with doc_id % 4 == 0 play the incoming batch, the rest the
    already-curated corpus; each incoming doc is flagged (is_dup,
    dup_of = canonical corpus doc) iff a MinHash band collision is
    CONFIRMED by exact 3-gram Jaccard >= 0.8 against that corpus doc.
    Incoming docs are never compared to each other (asymmetric
    cross-corpus join), and the Jaccard verify touches only
    candidate-pair postings. See operators/dedup.py
    incremental_lsh_dedup for the 100 TB posture (stored corpus
    signature index; per-batch cost proportional to the batch)."""
    from stonkwhisperer_spark.operators.dedup import incremental_lsh_dedup

    postings = _postings(spark, sf_dir).withColumn(
        "is_incoming", F.col("doc_id") % 4 == 0
    )
    return incremental_lsh_dedup(postings, "doc_id", "is_incoming", threshold=0.8)


# --------------------------------------------------------------------------
# Document fingerprinting: min-hash scalar + 4 smallest shingle hashes
# (a winnowing-style content sketch).
# --------------------------------------------------------------------------
@register(
    "doc_fingerprints",
    oracle=f"""
    WITH postings AS ({_POSTINGS_SQL}),
    hashed AS (SELECT doc_id, {portable_hash64_sql("shingle")} AS h FROM postings)
    SELECT doc_id,
           min(h)                                            AS fingerprint,
           array_to_string(list_slice(list_sort(list(h)), 1, 4), ',')
                                                             AS minhash_4,
           cast(count(*) AS bigint)                          AS n_shingles
    FROM hashed GROUP BY doc_id
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint per doc: global min shingle hash + the 4
    smallest hashes (k-min sketch, serialized as a csv scalar so the
    final projection carries no array columns) + shingle count.
    Map-only then one hash aggregation; sketches are constant-size."""
    postings = _postings(spark, sf_dir)
    from stonkwhisperer_spark.functions.hashing import portable_hash64

    hashed = postings.select("doc_id", portable_hash64("shingle").alias("h"))
    return hashed.groupBy("doc_id").agg(
        F.min("h").alias("fingerprint"),
        F.concat_ws(
            ",", F.slice(F.array_sort(F.collect_list("h")), 1, 4).cast("array<string>")
        ).alias("minhash_4"),
        F.count("*").cast("bigint").alias("n_shingles"),
    )


# --------------------------------------------------------------------------
# SimHash signatures (16-bit) per document.
# --------------------------------------------------------------------------
def _simhash_sql() -> str:
    toks = f"unnest(list_distinct({_TOKS}))"
    h = portable_hash64_sql("tok")
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}" for j in range(16)
    )
    bits = " + ".join(f"(CASE WHEN s{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(16))
    return f"""
    WITH toks AS (SELECT doc_id, {toks} AS tok FROM documents),
    hashed AS (SELECT doc_id, {h} AS h FROM toks),
    sums AS (SELECT doc_id, {sums} FROM hashed GROUP BY doc_id)
    SELECT doc_id, cast({bits} AS int) AS simhash FROM sums
    """


@register("simhash_signatures", oracle=_simhash_sql())
def q_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document over distinct cleaned tokens —
    equal-signature grouping gives near-exact dedup buckets. Exploded
    codegen formulation: one hash column per token row, 16 conditional
    sums map-side, bit-combine after the aggregation."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = tokens_of(clean_text_for_nlp("text"))
    token_rows = docs.select(
        "doc_id", F.explode(F.array_distinct(toks)).alias("tok")
    )
    return simhash16_exploded(token_rows, "doc_id")


# --------------------------------------------------------------------------
# Brute-force cosine top-k over embeddings (correctness baseline).
# --------------------------------------------------------------------------
_DOT = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> cast({a}[i] AS double) * cast({b}[i] AS double)), (x, y) -> x + y)"
)

# Modulus for the exact integer checksums in bounded state digests
# (ivf_assign_incremental): pre-mod sums ride in DECIMAL(38,0) (Spark)
# / HUGEINT (DuckDB), so the mod is exact and the final column fits
# BIGINT on both sides.
_DIGEST_MOD = 1_000_000_007


@register(
    "knn_embeddings",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS qv,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS nq
      FROM embeddings WHERE vec_id < 8
    ),
    c AS (
      SELECT vec_id AS c_id, embedding AS cv,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS nc
      FROM embeddings
    ),
    scored AS (
      SELECT q_id, c_id,
             {_DOT.format(a='qv', b='cv')} / (nq * nc) AS cosine
      FROM c, q WHERE q_id <> c_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
      FROM scored
    )
    SELECT q_id, c_id, cosine FROM ranked WHERE rn <= 5
    """,
)
def q_knn_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 8 query vectors — the ANN
    correctness baseline. Queries broadcast; one narrow scoring pass
    over candidates; per-query top-k window. Ties break on c_id.
    Scoring uses the dim-unrolled codegen dot (same left fold order as
    the oracle's list_reduce — bit-identical, JVM throughput; local
    wall time includes one-time janino compilation of the 64-term
    expressions, amortized at scale)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    cands = spread(emb, "vec_id").select(F.col("vec_id").alias("c_id"), "embedding")
    return knn_bruteforce(queries, cands, k=5, codegen_dim=_DIM)


# --------------------------------------------------------------------------
# Scalar-quantized (int8) approximate top-k — the memory-compression ANN
# scale path: 4x smaller candidate vectors, asymmetric-distance scoring.
# --------------------------------------------------------------------------
@register(
    "sq8_topk_embeddings",
    oracle="""
    WITH dims AS (
      SELECT i,
             min(cast(embedding[i] AS double)) AS lo,
             max(cast(embedding[i] AS double)) AS hi
      FROM embeddings, range(1, 65) t(i)
      GROUP BY i
    ),
    codebook AS (
      SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his FROM dims
    ),
    cands AS (
      SELECT vec_id AS c_id,
             list_transform(range(1, 65), i ->
               CASE WHEN his[i] > los[i] THEN
                 los[i] + (LEAST(255, GREATEST(0,
                   FLOOR((cast(embedding[i] AS double) - los[i])
                         / (his[i] - los[i]) * 256)))
                   + 0.5) * ((his[i] - los[i]) / 256)
               ELSE los[i] END) AS dq
      FROM embeddings, codebook
    ),
    q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q_id, c_id,
             list_reduce(list_transform(range(1, 65),
               i -> cast(qv[i] AS double) * dq[i]), (x, y) -> x + y) AS score
      FROM cands, q WHERE q_id <> c_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY q_id ORDER BY score DESC, c_id) AS rn
      FROM scored
    )
    SELECT q_id, c_id, score FROM ranked WHERE rn <= 5
    """,
)
def q_sq8_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized ANN (FAISS SQ8 shape): derive a
    per-dimension [min,max] codebook in one aggregation pass, quantize
    candidates to 8-bit codes (4× smaller than float32 — the memory
    lever that keeps a 100 TB embedding corpus scannable), and rank by
    asymmetric distance: full-precision queries against bucket-midpoint
    reconstructions. Top-5 per query, ties on c_id. Every step —
    codebook, clamp, midpoint dequant, left-fold dot — uses one fixed
    evaluation order, so the DuckDB twin reproduces the scores to the
    bit: quantization is deterministic compression, not noise.
    Complements knn_embeddings (exact baseline), the LSH/IVF paths
    (search pruning), and embedding_near_dup (the candidate-verify
    pipeline); ivfsq8_topk_embeddings is the composed FAISS IVF_SQ8."""
    from stonkwhisperer_spark.operators.similarity import sq8_codebook, sq8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    los, his = sq8_codebook(emb, dim=_DIM)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    cands = spread(emb, "vec_id").select(F.col("vec_id").alias("c_id"), "embedding")
    return sq8_topk(queries, cands, los, his, k=5, dim=_DIM)


# --------------------------------------------------------------------------
# Product-quantization (PQ) approximate top-k — FAISS's billion-vector
# default: M subspace codebooks, one code per subspace, ADC scoring.
# --------------------------------------------------------------------------
_PQ_DIST = (
    "list_sum(list_transform(range(1, 9), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
)


def _pq_oracle() -> str:
    d_sc = _PQ_DIST.format(a="s.sv", b="c.cv")
    d_qc = _PQ_DIST.format(a="q.sv", b="c.cv")
    return f"""
    WITH q0 AS (
      SELECT vec_id, list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
      FROM embeddings
    ),
    sub AS (
      SELECT vec_id, m, qv[m*8+1 : m*8+8] AS sv
      FROM q0, range(0, 8) t(m)
    ),
    c0 AS (SELECT m, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < 16),
    a1 AS (
      SELECT s.vec_id, s.m, min({d_sc} * 16 + c.cid) % 16 AS cluster
      FROM sub s JOIN c0 c USING (m) GROUP BY s.vec_id, s.m
    ),
    dims AS (
      SELECT a.m, a.cluster, t.i,
             CAST(sum(s.sv[t.i]) // count(*) AS BIGINT) AS cval
      FROM a1 a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m,
           unnest(range(1, 9)) AS t(i)
      GROUP BY a.m, a.cluster, t.i
    ),
    c1 AS (
      SELECT m, cluster AS cid, list(cval ORDER BY i) AS cv
      FROM dims GROUP BY m, cluster
    ),
    codes AS (
      SELECT s.vec_id AS c_id, s.m, min({d_sc} * 16 + c.cid) % 16 AS code
      FROM sub s JOIN c1 c USING (m) GROUP BY s.vec_id, s.m
    ),
    dt AS (
      SELECT q.vec_id AS q_id, q.m, c.cid AS code, {d_qc} AS d
      FROM sub q JOIN c1 c USING (m) WHERE q.vec_id < 8
    ),
    adist AS (
      SELECT dt.q_id, codes.c_id, CAST(sum(dt.d) AS BIGINT) AS adist
      FROM codes JOIN dt ON dt.m = codes.m AND dt.code = codes.code
      WHERE dt.q_id <> codes.c_id
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY q_id ORDER BY adist, c_id) AS rn
      FROM adist
    )
    SELECT q_id, c_id, adist FROM ranked WHERE rn <= 5
    """


@register("pq_topk_embeddings", oracle=_pq_oracle())
def q_pq_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011, FAISS's
    billion-vector default): split each 64-dim embedding into 8
    subvectors, k-means each subspace into 16 centroids (seeds = the
    first 16 ids, one integer-mean Lloyd refinement — the
    semantic_clusters convention keyed by subspace), encode every
    vector as 8 codes (32× smaller than float32), and answer the first
    8 queries by ASYMMETRIC DISTANCE: the query's exact distance to
    every centroid (an 8×16-row table per query) summed over each
    candidate's codes. Top-5 per query ascending, ties on c_id,
    self-matches excluded. Everything is 2^20 fixed-point integer
    arithmetic, so codebooks, codes, and distances hash identically
    cross-engine — the DuckDB twin replays the full train→encode→ADC
    chain.

    Scale: codebook training touches M·K·dsub values in the update
    shuffle; encoding is a broadcast(M·K centroids)+map pass; the ADC
    join streams the CODES (M small ints/vector — why PQ is the
    memory-bound scale path) against a broadcast |Q|·M·K distance
    table, and the per-(q,c) sum is one partial-aggregated shuffle on
    uniform keys. Compose with ivf_topk_embeddings' coarse cells for
    FAISS IVF-PQ. Completes the ANN family: exact (knn_embeddings),
    pruning (LSH/IVF), scalar compression (SQ8), vector compression
    (this)."""
    from stonkwhisperer_spark.operators.similarity import pq_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    return pq_topk(emb, F.col("vec_id") < 8, k=5, dim=_DIM)


# --------------------------------------------------------------------------
# Random-hyperplane LSH buckets over embeddings (the ANN scale path).
# --------------------------------------------------------------------------
_N_PLANES, _DIM = 8, 64


def _lsh_sql() -> str:
    plane_sums = []
    for p in range(_N_PLANES):
        terms = " + ".join(
            f"cast(embedding[{d + 1}] AS double) * {plane_component(p, d)!r}"
            for d in range(_DIM)
        )
        plane_sums.append(f"(CASE WHEN 0.0 + {terms} >= 0 THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(plane_sums)
    return f"SELECT vec_id, cast({bucket} AS int) AS bucket FROM embeddings"


@register("embedding_lsh_buckets", oracle=_lsh_sql())
def q_embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket per embedding (8 planes → 256
    buckets): sign bits of dot products with deterministic md5-seeded
    hyperplanes. Map-only; at 100 TB, ANN search joins query buckets
    to candidate buckets instead of cross-joining vectors. (Local wall
    time is dominated by one-time codegen compilation of the 512-term
    expression — amortized at scale.)"""
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    return emb.select(
        "vec_id", hyperplane_bucket("embedding", _N_PLANES, _DIM).alias("bucket")
    )


# --------------------------------------------------------------------------
# Bucketed embedding near-dup: the full ANN scale path end-to-end —
# LSH-bucket equi-join generates candidates, exact cosine verifies.
# The oracle replicates the SAME bucket restriction, so results match
# exactly (this is bucket-restricted semantics, documented recall < 1).
# --------------------------------------------------------------------------
@register(
    "embedding_near_dup",
    oracle=f"""
    WITH buckets AS ({_lsh_sql()}),
    vecs AS (
      SELECT b.vec_id, b.bucket, e.embedding,
             sqrt({_DOT.format(a='e.embedding', b='e.embedding')}) AS nrm
      FROM buckets b JOIN embeddings e USING (vec_id)
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             {_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) AS cosine
      FROM vecs a JOIN vecs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.35
    """,
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs at cosine ≥ 0.35
    (the testdata embeddings are near-orthogonal — the threshold keeps
    the top percentile of bucketed pairs), candidates
    restricted to shared LSH buckets — the 100 TB ANN dedup join: the
    quadratic work shrinks from |V|² to Σ_bucket |bucket|², and the
    bucket join shuffles on a uniform hash-like key. Recall < 1 by
    construction (bucket-restricted); raise n_planes bands or probe
    neighboring buckets for higher recall. Scoring uses the
    dim-unrolled codegen dot/norm (same left fold order as the
    oracle's list_reduce — bit-identical, JVM throughput)."""
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    from stonkwhisperer_spark.operators.similarity import norm_unrolled

    vecs = emb.select(
        "vec_id",
        "embedding",
        hyperplane_bucket("embedding", _N_PLANES, _DIM).alias("bucket"),
        norm_unrolled("embedding", _DIM).alias("nrm"),
    )
    a = vecs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("bucket"),
        F.col("embedding").alias("_ea"),
        F.col("nrm").alias("_na"),
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("bucket"),
        F.col("embedding").alias("_eb"),
        F.col("nrm").alias("_nb"),
    )
    from stonkwhisperer_spark.operators.similarity import dot_unrolled

    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (
                dot_unrolled("_ea", "_eb", _DIM) / (F.col("_na") * F.col("_nb"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) approximate top-k — the other classic ANN scale
# path next to LSH: coarse-quantize vectors onto centroid cells, search
# only the cells each query probes.
# --------------------------------------------------------------------------
@register(
    "ivf_topk_embeddings",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS cn
      FROM embeddings WHERE vec_id % 64 = 0
    ),
    v AS (
      SELECT vec_id, embedding,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS vn
      FROM embeddings
    ),
    ascore AS (
      SELECT v.vec_id, c.cent_id,
             {_DOT.format(a='v.embedding', b='c.cv')} / (v.vn * c.cn) AS cos
      FROM v, cents c
    ),
    assign AS (
      SELECT vec_id, cent_id AS cell FROM (
        SELECT vec_id, cent_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        FROM ascore) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS q_id, embedding AS qv, vn AS qn FROM v WHERE vec_id < 8),
    qs AS (
      SELECT q.q_id, c.cent_id,
             {_DOT.format(a='q.qv', b='c.cv')} / (q.qn * c.cn) AS cos
      FROM q, cents c
    ),
    probe AS (
      SELECT q_id, cent_id AS cell FROM (
        SELECT q_id, cent_id, row_number() OVER (
                 PARTITION BY q_id ORDER BY cos DESC, cent_id) AS rn
        FROM qs) WHERE rn <= 2
    ),
    cand AS (
      SELECT p.q_id, a.vec_id
      FROM probe p JOIN assign a USING (cell)
      WHERE a.vec_id <> p.q_id
    ),
    scored AS (
      SELECT cand.q_id, cand.vec_id,
             {_DOT.format(a='qq.qv', b='vv.embedding')} / (qq.qn * vv.vn) AS cosine
      FROM cand
      JOIN q qq ON cand.q_id = qq.q_id
      JOIN v vv ON cand.vec_id = vv.vec_id
    )
    SELECT q_id, vec_id, cosine FROM (
      SELECT *, row_number() OVER (
               PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
      FROM scored) WHERE rn <= 5
    """,
)
def q_ivf_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 for 8 query vectors: centroids are
    deterministically seeded (every 64th vec_id — so the centroid count
    grows with the corpus and mean cell size stays ~64; production
    would refine them with MLlib KMeans, which changes the seeds but
    not the plan), vectors coarse-assigned to their nearest cell in one
    partial-aggregated shuffle, each query probes its 2 nearest cells,
    and only those cells' members are exactly re-ranked. Recall vs the
    brute-force baseline is measured in tests/test_operators.py.
    Scoring is the dim-unrolled codegen dot (oracle-bit-identical)."""
    from stonkwhisperer_spark.operators.similarity import ivf_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    cents = emb.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return ivf_topk(queries, emb, cents, k=5, probes=2, dim=_DIM)


# --------------------------------------------------------------------------
# ivf_assign_incremental — ANN-index MAINTENANCE (VERDICT r10 task 5):
# the IVF assignment table is persisted state; new/revised embeddings
# are assigned against the FROZEN coarse quantizer and MERGEd in,
# never triggering a full re-assignment. The oracle replays the full
# from-scratch assignment of the final corpus, so the hash pins
# incremental == rebuild under a frozen quantizer.
# --------------------------------------------------------------------------
def _ivf_assign_oracle(seed_residue: int, keep_where: str = "") -> str:
    """From-scratch coarse assignment under the frozen quantizer seeded
    at ``vec_id % 64 == seed_residue``, reduced to the per-cell digest —
    shared by ivf_assign_incremental (residue 1, quantizer A),
    ivf_assign_stream_upsert (residue 1, streamed ingest of the same
    contract), ivf_recluster_replace (residue 33, quantizer B) and
    ivf_assign_forget (residue 1 with ``keep_where`` filtering the
    corpus to the kept vectors — centroids stay FULL-corpus seeds: the
    quantizer is a frozen parameter, erasure deletes assignment ROWS)."""
    return f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS cn
      FROM embeddings WHERE vec_id % 64 = {seed_residue}
    ),
    v AS (
      SELECT vec_id, embedding,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS vn
      FROM embeddings {keep_where}
    ),
    ascore AS (
      SELECT v.vec_id, c.cent_id,
             {_DOT.format(a='v.embedding', b='c.cv')} / (v.vn * c.cn) AS cos
      FROM v, cents c
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cent_id AS cell, row_number() OVER (
                 PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        FROM ascore) WHERE rn = 1
    )
    SELECT cell,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(vec_id) % {_DIGEST_MOD} AS BIGINT) AS sum_vec_mod,
           CAST(sum((vec_id % {_DIGEST_MOD}) * (vec_id % {_DIGEST_MOD})
                    % {_DIGEST_MOD}) % {_DIGEST_MOD} AS BIGINT) AS sumsq_mod,
           CAST(sum({portable_hash64_sql("CAST(vec_id AS VARCHAR)")}
                    % {_DIGEST_MOD}) % {_DIGEST_MOD} AS BIGINT) AS hsum_mod,
           min(vec_id) AS min_vec,
           max(vec_id) AS max_vec
    FROM assign GROUP BY cell
    """


_ASSIGN_DIGEST_SCHEMA = (
    "cell bigint, n_vecs bigint, sum_vec_mod bigint, sumsq_mod bigint, "
    "hsum_mod bigint, min_vec bigint, max_vec bigint"
)


def _assign_digest(assign: DataFrame) -> DataFrame:
    """Per-cell digest of a (vec_id, cell) assignment relation: one
    partial-aggregable shuffle producing K rows whose hash pins the
    whole table (any misassigned vector moves two cells' counts and
    checksums). Checksums are exact mod 1e9+7; pre-mod sums ride in
    DECIMAL so no intermediate overflows before the mod. Beside the
    algebraic (sum, sum-of-squares) pair — which has constructible
    collisions: two multisets with equal count/sum/sumsq swapped
    between cells away from either cell's min/max — the digest carries
    an order-insensitive modular sum of a KEYED hash (portable md5
    hash of vec_id), so defeating it requires colliding an md5-derived
    sum, not solving a small integer system (ADVICE r12)."""
    m = _DIGEST_MOD
    hmod = (
        portable_hash64(F.col("vec_id").cast("string")) % m
    ).cast("decimal(28,0)")
    return assign.groupBy("cell").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.expr(
            f"CAST(sum(CAST(vec_id AS DECIMAL(28,0))) % {m} AS BIGINT)"
        ).alias("sum_vec_mod"),
        F.expr(
            f"CAST(sum(CAST((vec_id % {m}) * (vec_id % {m}) % {m} "
            f"AS DECIMAL(28,0))) % {m} AS BIGINT)"
        ).alias("sumsq_mod"),
        (F.sum(hmod) % m).cast("bigint").alias("hsum_mod"),
        F.min("vec_id").alias("min_vec"),
        F.max("vec_id").alias("max_vec"),
    )


@register("ivf_assign_incremental", oracle=_ivf_assign_oracle(1))
def q_ivf_assign_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF coarse-assignment maintenance: the base corpus
    (vec_id % 4 != 0) commits its (vec_id, cell) assignments — under a
    quantizer FROZEN at base-resident seeds (vec_id % 64 == 1, so no
    centroid sits in the incoming batch) — plus STALE placeholder
    assignments (cell = 1, an older quantizer's output) for half the
    batch (vec_id % 8 == 0, since-revised embeddings); the incoming
    batch (vec_id % 4 == 0) is then assigned against the same frozen
    centroids and MERGEd keyed on vec_id — stale rows take the update
    arm, unseen vectors (vec_id % 8 == 4) the insert arm, both
    asserted non-empty. The gate relation is a per-cell DIGEST of the
    maintained table — (n_vecs, modular id sum, modular id-square sum,
    modular keyed-hash sum, min, max) per cell — which must hash-equal
    the same digest over the
    oracle's from-scratch assignment of the whole corpus: any vector in
    the wrong cell moves two cells' counts and checksums, so the digest
    pins incremental == rebuild without materializing the O(corpus)
    assignment table on the driver (VERDICT r11 what's-wrong #1 — the
    previous shape collected every (vec_id, cell) row before scratch
    cleanup, a LocalTableScan of the corpus in the registered plan).

    Scale: this is the FAISS deployment contract — the coarse
    quantizer trains once (here: deterministic seeds; production:
    MLlib KMeans on a sample) and then ingest cost is O(batch) — each
    vector scores k broadcast centroids map-side, one partial-agg
    argmax, one keyed MERGE into the assignment table — while search
    (ivf_topk_embeddings) reads the maintained table. Re-clustering is
    a deliberate offline event (the replace path), never an ingest
    side effect. The digest itself is one partial-aggregable shuffle
    producing K rows (K = centroid count); checksums are exact mod
    1e9+7 with the pre-mod sums carried in DECIMAL(38,0) / HUGEINT so
    no intermediate overflows before the mod."""
    import shutil

    from stonkwhisperer_spark.operators.similarity import ivf_assign
    from stonkwhisperer_spark.session import scratch_dir
    from stonkwhisperer_spark.sinks.writers import (
        merge_append,
        merge_upsert,
        read_committed,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    cents = emb.filter(F.col("vec_id") % 64 == 1).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    base_assign = ivf_assign(
        emb.filter(F.col("vec_id") % 4 != 0), cents, dim=_DIM
    ).select("vec_id", "cell")
    stale = (
        emb.filter(F.col("vec_id") % 8 == 0)
        .select("vec_id", F.lit(1).cast("bigint").alias("cell"))
    )
    batch_assign = ivf_assign(
        emb.filter(F.col("vec_id") % 4 == 0), cents, dim=_DIM
    ).select("vec_id", "cell")
    scratch = scratch_dir("stonkw_ivf_assign_")
    try:
        target = f"{scratch}/assign"
        merge_append(spark, target, base_assign.unionByName(stale), ["vec_id"])
        inserted, updated = merge_upsert(spark, target, batch_assign, ["vec_id"])
        if inserted == 0 or updated == 0:
            raise AssertionError(
                f"MERGE arms not both exercised: inserted={inserted}, "
                f"updated={updated}"
            )
        digest = _assign_digest(
            read_committed(spark, target).select("vec_id", "cell")
        )
        # Bounded glue collect: K rows (one per coarse cell), never the
        # corpus-sized assignment table.
        rows = bounded_collect(digest, 100_000, "per-cell assignment digest")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, _ASSIGN_DIGEST_SCHEMA)


# --------------------------------------------------------------------------
# ivf_recluster_replace — the REPLACE path the maintenance docstrings
# promise: re-clustering is a deliberate offline event that atomically
# swaps the whole assignment table for the new quantizer's output,
# never an ingest side effect. Completes the lifecycle the trilogy
# opened: insert/update (merge), delete (forget cascade), replace
# (re-cluster).
# --------------------------------------------------------------------------
@register("ivf_recluster_replace", oracle=_ivf_assign_oracle(33))
def q_ivf_recluster_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline re-clustering of the IVF assignment table: the corpus is
    first assigned and committed under quantizer A (seeds vec_id % 64
    == 1 — the same quantizer ivf_assign_incremental maintains), then a
    re-trained quantizer B (seeds vec_id % 64 == 33) re-assigns the
    WHOLE corpus and the table contents are swapped in ONE atomic
    ``overwrite_where`` commit — no reader can observe a half-replaced
    index (the gap a delete-then-append pair exposes). Asserted
    in-query: the swap is total (deleted == corpus == inserted), and
    the pre-replace version still time-travels to quantizer A's digest
    (re-clustering preserves history; search jobs pinned to the old
    version keep working until vacuum). The gate digest must hash-equal
    a from-scratch assignment under quantizer B.

    Scale: the replace is O(corpus) by design — the documented
    deliberate offline event (FAISS retrain + re-add), paid rarely and
    scheduled, vs the O(batch) ingest path ivf_assign_incremental
    gates. The atomic-swap commit costs one file-set exchange in the
    log; assignment itself is the same broadcast-centroid map-side
    argmax + one partial-agg shuffle as every other wave."""
    import shutil

    from stonkwhisperer_spark.operators.similarity import ivf_assign
    from stonkwhisperer_spark.session import scratch_dir
    from stonkwhisperer_spark.sinks.writers import (
        _committed_version,
        merge_append,
        overwrite_where,
        read_committed,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")

    def assign_under(residue: int) -> DataFrame:
        cents = emb.filter(F.col("vec_id") % 64 == residue).select(
            F.col("vec_id").alias("cent_id"), "embedding"
        )
        return ivf_assign(emb, cents, dim=_DIM).select("vec_id", "cell")

    def digest_rows(assign: DataFrame) -> list:
        return sorted(
            map(
                tuple,
                bounded_collect(
                    _assign_digest(assign), 100_000, "per-cell assignment digest"
                ),
            )
        )

    scratch = scratch_dir("stonkw_ivf_recluster_")
    try:
        target = f"{scratch}/assign"
        n = merge_append(spark, target, assign_under(1), ["vec_id"])
        v_a = _committed_version(target)
        digest_a = digest_rows(
            read_committed(spark, target).select("vec_id", "cell")
        )
        # localCheckpoint: overwrite_where executes its batch plan twice
        # (data staging + typed-CDC staging); pin quantizer B's corpus
        # wave so it runs once.
        batch_b = assign_under(33).localCheckpoint(eager=True)
        inserted, deleted = overwrite_where(spark, target, batch_b, F.lit(True))
        if inserted != n or deleted != n:
            raise AssertionError(
                f"replace must swap the whole table: n={n}, "
                f"inserted={inserted}, deleted={deleted}"
            )
        # History contract: the pre-replace version must still read as
        # quantizer A's exact digest, not merely the right row count.
        if digest_rows(
            read_committed(spark, target, version=v_a).select("vec_id", "cell")
        ) != digest_a:
            raise AssertionError("pre-replace version no longer reads as quantizer A")
        rows = bounded_collect(
            _assign_digest(read_committed(spark, target).select("vec_id", "cell")),
            100_000,
            "per-cell assignment digest",
        )
        if sorted(map(tuple, rows)) == digest_a:
            raise AssertionError("re-cluster produced quantizer A's digest — swap was a no-op")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, _ASSIGN_DIGEST_SCHEMA)


# --------------------------------------------------------------------------
# ivf_assign_stream_upsert — the STREAMING arm of ANN-index maintenance
# (VERDICT r13 task 2, promoting the pytest-pinned contract of
# tests/test_streaming.py::test_ivf_assignment_streams_through_txn_merge
# to a driver-gated query): the IVF assignment table maintained from a
# continuous embedding stream via foreachBatch exactly-once MERGE,
# digest-gated against the from-scratch assignment — the third
# maintained index gets the same streaming gate the BM25 tf and LSH
# band tables got in round 13.
# --------------------------------------------------------------------------
@register("ivf_assign_stream_upsert", oracle=_ivf_assign_oracle(1))
def q_ivf_assign_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING IVF coarse-assignment maintenance: the base corpus's
    (vec_id, cell) assignments (vec_id % 4 != 0) — under the quantizer
    FROZEN at base-resident seeds (vec_id % 64 == 1) — and STALE
    placeholder assignments (cell = 1) for half the incoming batch
    (vec_id % 8 == 0, since-revised embeddings) commit as in
    ivf_assign_incremental, but as SEPARATE commits so the stale rows
    live in their own files and each micro-batch MERGE rewrites only
    those, never the base-corpus files (the split-commit key-clustering
    layout of bm25_index_stream_upsert). The incoming batch's true
    assignments (vec_id % 4 == 0, scored against the same frozen
    centroids) then arrive as a rate-limited landing-zone STREAM (file
    source, one file per trigger over a 4-file drop,
    ``Trigger.AvailableNow``) and MERGE into the assignment table per
    micro-batch via ``merge_upsert_txn`` keyed on vec_id — the
    foreachBatch + txnVersion streaming upsert, exactly-once per
    (app, epoch). The shared engine (streaming/jobs.py
    run_txn_merge_ingest) asserts the drain split across >=2
    micro-batches with both MERGE arms non-empty cumulatively, and
    replays the whole stream over a fresh checkpoint proving it a
    structural no-op (zero rows applied, committed version unmoved).
    The per-cell DIGEST of the drained table must hash-equal the
    oracle's from-scratch assignment of the whole corpus —
    streamed-ingest == rebuild, completing the streaming-maintenance
    trilogy across all three persisted index tables.

    Scale: the FAISS continuous-ingest shape — per poll interval this
    is the batch path's O(batch) cost (each vector scores k broadcast
    centroids map-side, one partial-agg argmax upstream of the
    landing zone, one keyed MERGE per micro-batch); checkpoint + txn
    ledger give exactly-once table contents; the assignment table is
    the only state — no state store, no watermark. Reference contract
    generalized: loading.py:317-360's incremental keyed insert under
    continuous arrival."""
    import shutil

    from stonkwhisperer_spark.operators.similarity import ivf_assign
    from stonkwhisperer_spark.session import scratch_dir
    from stonkwhisperer_spark.sinks.writers import merge_append, read_committed
    from stonkwhisperer_spark.streaming.jobs import run_txn_merge_ingest

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    cents = emb.filter(F.col("vec_id") % 64 == 1).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    base_assign = ivf_assign(
        emb.filter(F.col("vec_id") % 4 != 0), cents, dim=_DIM
    ).select("vec_id", "cell")
    stale = (
        emb.filter(F.col("vec_id") % 8 == 0)
        .select("vec_id", F.lit(1).cast("bigint").alias("cell"))
    )
    batch_assign = ivf_assign(
        emb.filter(F.col("vec_id") % 4 == 0), cents, dim=_DIM
    ).select("vec_id", "cell")
    scratch = scratch_dir("stonkw_ivf_stream_")
    try:
        target = f"{scratch}/assign"
        merge_append(spark, target, base_assign, ["vec_id"])
        merge_append(spark, target, stale, ["vec_id"])
        landing = f"{scratch}/landing"
        batch_assign.repartition(4).write.parquet(landing)
        run_txn_merge_ingest(
            spark,
            landing,
            batch_assign.schema,
            target,
            ["vec_id"],
            "ivf_assign_stream_ingest",
            scratch,
        )
        digest = _assign_digest(
            read_committed(spark, target).select("vec_id", "cell")
        )
        # Bounded glue collect: K rows (one per coarse cell), never the
        # corpus-sized assignment table.
        rows = bounded_collect(digest, 100_000, "per-cell assignment digest")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, _ASSIGN_DIGEST_SCHEMA)


# --------------------------------------------------------------------------
# ivf_assign_forget — the DELETE arm of ANN-index maintenance (VERDICT
# r13 task 3): right-to-be-forgotten erasure cascaded into the persisted
# IVF assignment table, completing the forget trilogy across all three
# maintained index tables (BM25 tf: deletion vectors, r12; LSH bands:
# copy-on-write, r12; assignment table: deletion vectors, here).
# --------------------------------------------------------------------------
@register(
    "ivf_assign_forget",
    oracle=_ivf_assign_oracle(1, "WHERE vec_id % 10 <> 3"),
)
def q_ivf_assign_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forget-cascade on the maintained IVF assignment table: the full
    corpus's (vec_id, cell) rows — under the frozen quantizer (seeds
    vec_id % 64 == 1; centroids are trained PARAMETERS, so erasure
    deletes assignment rows, never retrains) — commit to a txlog
    table; erasure requests (vec_id % 10 == 3) are deleted
    MERGE-ON-READ via deletion vectors (``delete_where_dv`` — O(matched
    rows) kill-list writes, no file rewrite: the point-delete strategy
    for a table that search reads continuously), asserted to delete
    exactly one row per forgotten vector. The post-delete read through
    the DV mask is asserted to serve ZERO forgotten rows — since IVF
    search candidates come only from assignment rows in probed cells
    (ivf_topk_embeddings' join shape), no forgotten vector can ever
    reappear in a top-k result through the maintained table. The gate
    relation is the per-cell digest of the maintained table, which
    must hash-equal the oracle's from-scratch assignment of the KEPT
    corpus — erasure == rebuild-without-the-forgotten, the same
    discipline bm25_index_forget and minhash_index_forget pin on the
    other two indexes.

    Scale: erasing K vectors costs O(K) deletion-vector rows; the
    corpus is never re-assigned, the quantizer never retrains, and the
    forgotten vectors stop being candidates the moment the commit
    lands — the ANN half of the GDPR contract. The digest is one
    partial-aggregable shuffle producing K_cells rows."""
    import shutil

    from stonkwhisperer_spark.operators.similarity import ivf_assign
    from stonkwhisperer_spark.session import scratch_dir
    from stonkwhisperer_spark.sinks.writers import (
        delete_where_dv,
        merge_append,
        read_committed,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    cents = emb.filter(F.col("vec_id") % 64 == 1).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    assign = ivf_assign(emb, cents, dim=_DIM).select("vec_id", "cell")
    scratch = scratch_dir("stonkw_ivf_forget_")
    try:
        target = f"{scratch}/assign"
        merge_append(spark, target, assign, ["vec_id"])
        forget = F.col("vec_id") % 10 == 3
        n_forget = read_committed(spark, target).filter(forget).count()
        n_del = delete_where_dv(spark, target, forget)
        if n_forget == 0 or n_del != n_forget:
            raise AssertionError(
                f"erasure must drop exactly one assignment row per "
                f"forgotten vector: {n_forget} vectors, {n_del} rows deleted"
            )
        maintained = read_committed(spark, target).select("vec_id", "cell")
        # Read-side contract: the DV mask must already hide every
        # forgotten row from the scan search candidates come from.
        if maintained.filter(forget).count() != 0:
            raise AssertionError("forgotten rows still readable through the DV mask")
        rows = bounded_collect(
            _assign_digest(maintained), 100_000, "per-cell assignment digest"
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, _ASSIGN_DIGEST_SCHEMA)


# --------------------------------------------------------------------------
# IVF×PQ — the composed FAISS IVF-PQ configuration (VERDICT r7 task 3):
# coarse cells prune candidates, PQ codes score the survivors.
# --------------------------------------------------------------------------
def _ivfpq_ctes() -> str:
    """The shared coarse-prune × PQ-ADC CTE chain, ending at ``ranked``
    (per-query ADC rank over the pruned candidates). Consumers append
    either the plain top-k select (ivfpq_topk_embeddings) or the
    exact-rescore tail (ivfpq_refine_embeddings)."""
    d_sc = _PQ_DIST.format(a="s.sv", b="c.cv")
    d_qc = _PQ_DIST.format(a="q.sv", b="c.cv")
    return f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS cn
      FROM embeddings WHERE vec_id % 64 = 0
    ),
    v AS (
      SELECT vec_id, embedding,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS vn
      FROM embeddings
    ),
    ascore AS (
      SELECT v.vec_id, c.cent_id,
             {_DOT.format(a='v.embedding', b='c.cv')} / (v.vn * c.cn) AS cos
      FROM v, cents c
    ),
    assign AS (
      SELECT vec_id, cent_id AS cell FROM (
        SELECT vec_id, cent_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        FROM ascore) WHERE rn = 1
    ),
    probe AS (
      SELECT q_id, cent_id AS cell FROM (
        SELECT vec_id AS q_id, cent_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        FROM ascore WHERE vec_id < 8) WHERE rn <= 2
    ),
    candidates AS (
      SELECT p.q_id, a.vec_id AS c_id
      FROM assign a JOIN probe p USING (cell)
      WHERE a.vec_id <> p.q_id
    ),
    q0 AS (
      SELECT vec_id, list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
      FROM embeddings
    ),
    sub AS (
      SELECT vec_id, m, qv[m*8+1 : m*8+8] AS sv
      FROM q0, range(0, 8) t(m)
    ),
    c0 AS (SELECT m, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < 16),
    a1 AS (
      SELECT s.vec_id, s.m, min({d_sc} * 16 + c.cid) % 16 AS cluster
      FROM sub s JOIN c0 c USING (m) GROUP BY s.vec_id, s.m
    ),
    dims AS (
      SELECT a.m, a.cluster, t.i,
             CAST(sum(s.sv[t.i]) // count(*) AS BIGINT) AS cval
      FROM a1 a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m,
           unnest(range(1, 9)) AS t(i)
      GROUP BY a.m, a.cluster, t.i
    ),
    c1 AS (
      SELECT m, cluster AS cid, list(cval ORDER BY i) AS cv
      FROM dims GROUP BY m, cluster
    ),
    codes AS (
      SELECT s.vec_id AS c_id, s.m, min({d_sc} * 16 + c.cid) % 16 AS code
      FROM sub s JOIN c1 c USING (m) GROUP BY s.vec_id, s.m
    ),
    dt AS (
      SELECT q.vec_id AS q_id, q.m, c.cid AS code, {d_qc} AS d
      FROM sub q JOIN c1 c USING (m) WHERE q.vec_id < 8
    ),
    adist AS (
      SELECT cd.q_id, cd.c_id, CAST(sum(dt.d) AS BIGINT) AS adist
      FROM candidates cd
      JOIN codes ON codes.c_id = cd.c_id
      JOIN dt ON dt.q_id = cd.q_id AND dt.m = codes.m AND dt.code = codes.code
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY q_id ORDER BY adist, c_id) AS rn
      FROM adist
    )"""


def _ivfpq_oracle() -> str:
    return _ivfpq_ctes() + "\n    SELECT q_id, c_id, adist FROM ranked WHERE rn <= 5"


def _ivfpq_refine_oracle(k: int = 5, rf: int = 4) -> str:
    return _ivfpq_ctes() + f""",
    short AS (SELECT q_id, c_id FROM ranked WHERE rn <= {k * rf}),
    refine AS (
      SELECT s.q_id, s.c_id,
             CAST(sum((a.qv[t.i] - b.qv[t.i]) * (a.qv[t.i] - b.qv[t.i]))
                  AS BIGINT) AS rdist
      FROM short s
      JOIN q0 a ON a.vec_id = s.q_id
      JOIN q0 b ON b.vec_id = s.c_id,
      unnest(range(1, 65)) AS t(i)
      GROUP BY 1, 2
    ),
    rranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY q_id ORDER BY rdist, c_id) AS rn2
      FROM refine
    )
    SELECT q_id, c_id, rdist FROM rranked WHERE rn2 <= {k}
    """


@register("ivfpq_topk_embeddings", oracle=_ivfpq_oracle())
def q_ivfpq_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×PQ composed (FAISS IVF-PQ, the billion-vector default the
    pq_topk docstring promised): the SAME deterministic coarse
    quantizer as ivf_topk_embeddings (centroids = every 64th vec_id,
    cells average ~64 vectors, queries probe their 2 nearest cells)
    prunes the candidate set, and the SAME 8×16 product-quantization
    chain as pq_topk_embeddings (2^20 fixed-point train → encode →
    asymmetric distance) scores ONLY the survivors. Top-5 per query
    ascending adist, ties on c_id, self-matches excluded. PQ encodes
    raw vectors, not cell residuals (FAISS by_residual=false), keeping
    one corpus-wide codebook set and bit-exact cross-engine replay —
    the DuckDB twin runs the full coarse-prune × PQ-ADC composition.

    Scale: this is the configuration that fixes pq_topk_embeddings'
    acknowledged linear-scan gap — the ADC aggregation touches
    probes·avg_cell candidates per query instead of every vector,
    while memory stays M bytes/vector (32×). Broadcasts: coarse
    centroids (|V|/64 rows), probe list (|Q|·probes), PQ codebooks
    (M·K), distance tables (|Q|·M·K); the only non-broadcast joins
    shuffle the codes/candidate sides on uniform ids. Recall vs the
    brute-force baseline is pinned in tests/test_operators.py."""
    from stonkwhisperer_spark.operators.similarity import ivfpq_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    cents = emb.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    return ivfpq_topk(emb, cents, F.col("vec_id") < 8, k=5, probes=2, dim=_DIM)


# --------------------------------------------------------------------------
# IVF×SQ8 — the second FAISS composition: coarse cells prune, int8
# asymmetric distance scores the survivors. Closes the composition the
# sq8_topk_embeddings docstring promises, exactly as ivfpq_topk closed
# pq_topk's.
# --------------------------------------------------------------------------
_IVFSQ8_ORACLE = f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS cn
      FROM embeddings WHERE vec_id % 64 = 0
    ),
    v AS (
      SELECT vec_id, embedding,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS vn
      FROM embeddings
    ),
    ascore AS (
      SELECT v.vec_id, c.cent_id,
             {_DOT.format(a='v.embedding', b='c.cv')} / (v.vn * c.cn) AS cos
      FROM v, cents c
    ),
    assign AS (
      SELECT vec_id, cent_id AS cell FROM (
        SELECT vec_id, cent_id, row_number() OVER (
                 PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        FROM ascore) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS q_id, embedding AS qv, vn AS qn FROM v WHERE vec_id < 8),
    qs AS (
      SELECT q.q_id, c.cent_id,
             {_DOT.format(a='q.qv', b='c.cv')} / (q.qn * c.cn) AS cos
      FROM q, cents c
    ),
    probe AS (
      SELECT q_id, cent_id AS cell FROM (
        SELECT q_id, cent_id, row_number() OVER (
                 PARTITION BY q_id ORDER BY cos DESC, cent_id) AS rn
        FROM qs) WHERE rn <= 2
    ),
    cand AS (
      SELECT p.q_id, a.vec_id AS c_id
      FROM probe p JOIN assign a USING (cell)
      WHERE a.vec_id <> p.q_id
    ),
    dims AS (
      SELECT i,
             min(cast(embedding[i] AS double)) AS lo,
             max(cast(embedding[i] AS double)) AS hi
      FROM embeddings, range(1, 65) t(i)
      GROUP BY i
    ),
    codebook AS (
      SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his FROM dims
    ),
    dq AS (
      SELECT vec_id AS c_id,
             list_transform(range(1, 65), i ->
               CASE WHEN his[i] > los[i] THEN
                 los[i] + (LEAST(255, GREATEST(0,
                   FLOOR((cast(embedding[i] AS double) - los[i])
                         / (his[i] - los[i]) * 256)))
                   + 0.5) * ((his[i] - los[i]) / 256)
               ELSE los[i] END) AS dqv
      FROM embeddings, codebook
    ),
    scored AS (
      SELECT cand.q_id, cand.c_id,
             list_reduce(list_transform(range(1, 65),
               i -> cast(qq.qv[i] AS double) * dq.dqv[i]), (x, y) -> x + y)
               AS score
      FROM cand
      JOIN q qq ON cand.q_id = qq.q_id
      JOIN dq ON cand.c_id = dq.c_id
    )
    SELECT q_id, c_id, score FROM (
      SELECT *, row_number() OVER (
               PARTITION BY q_id ORDER BY score DESC, c_id) AS rn
      FROM scored) WHERE rn <= 5
    """


@register("ivfsq8_topk_embeddings", oracle=_IVFSQ8_ORACLE)
def q_ivfsq8_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×SQ8 composed (FAISS IVF_SQ8 — the composition the
    sq8_topk_embeddings docstring promises, closed the same way
    ivfpq_topk_embeddings closed pq_topk's): the SAME deterministic
    coarse quantizer as ivf_topk_embeddings (centroids = every 64th
    vec_id, queries probe their 2 nearest cells) prunes the candidate
    set, and the SAME per-dimension [min,max] scalar quantization as
    sq8_topk_embeddings scores ONLY the survivors by asymmetric
    distance (full-precision query · bucket-midpoint reconstruction,
    fixed fold order — bit-reproducible). Top-5 per query descending
    score, ties on c_id.

    Scale: uncomposed SQ8 scans every candidate's codes (4× cheaper
    bytes, same row count); the composition touches probes·avg_cell
    candidates per query at 1 byte/dim — pruning lever and memory
    lever at once, the mid-accuracy/mid-memory point between IVF-flat
    (4 bytes/dim) and IVF-PQ (M bytes/vector) on FAISS's ladder.
    Recall vs brute force pinned in tests/test_operators.py."""
    from stonkwhisperer_spark.operators.similarity import (
        ivfsq8_topk,
        sq8_codebook,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    los, his = sq8_codebook(emb, dim=_DIM)
    cents = emb.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    return ivfsq8_topk(
        emb, cents, F.col("vec_id") < 8, los, his, k=5, probes=2, dim=_DIM
    )


@register("ivfpq_refine_embeddings", oracle=_ivfpq_refine_oracle())
def q_ivfpq_refine_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact re-ranking — FAISS's ``IVFPQ,Refine`` accuracy
    lever on top of ivfpq_topk_embeddings: the composed coarse-prune ×
    ADC chain produces a 4·k shortlist per query, then ONLY those 20
    candidates are re-scored by exact 64-dim squared distance over the
    fixed-point raw vectors and the top-5 re-ranked. Ascending rdist,
    ties on c_id. The DuckDB twin replays the full shortlist + rescore
    chain bit-for-bit (the rescore is integer arithmetic over the same
    floor(x·2^20) quantization the PQ chain trains on).

    Scale: the rescore adds one corpus map pass (the quantized-vector
    projection) with the |Q|·4k shortlist BROADCAST into it — no
    shuffle — and |Q| quantized query rows broadcast into the result;
    at 10⁹ vectors the refine reads 4k raw vectors per query, not 10⁹.
    This closes the one gap ADC ranking leaves: candidates the
    shortlist catches are returned in their EXACT rank, so errors are
    limited to shortlist misses (recall@k = shortlist recall@4k),
    pinned against brute force in tests/test_operators.py."""
    from stonkwhisperer_spark.operators.similarity import ivfpq_refine_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    cents = emb.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    return ivfpq_refine_topk(
        emb, cents, F.col("vec_id") < 8, k=5, refine_factor=4, probes=2, dim=_DIM
    )


# --------------------------------------------------------------------------
# Fuzzy dedup: SimHash-bucketed candidate pairs verified by edit
# distance — the classic two-stage "cheap blocking + exact verify"
# shape with levenshtein as the verifier.
# --------------------------------------------------------------------------
@register(
    "fuzzy_near_dups",
    oracle=f"""
    WITH s AS ({_simhash_sql()})
    SELECT doc_a, doc_b, edit_distance FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             cast(levenshtein(substring(da.text, 1, 80),
                              substring(db.text, 1, 80)) AS int) AS edit_distance
      FROM s a JOIN s b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
      JOIN documents da ON da.doc_id = a.doc_id
      JOIN documents db ON db.doc_id = b.doc_id
    ) WHERE edit_distance <= 30
    """,
)
def q_fuzzy_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-duplicates: equal 16-bit SimHash blocks the candidate
    space (one equi shuffle on the signature, quadratic work bounded
    per bucket), then an 80-char-prefix levenshtein verifies — edit
    distance runs on |candidates|, never |docs|². The blocking+verify
    split is exactly how edit-distance dedup survives 100 TB: at
    production bucket sizes, widen the signature (more bits) before the
    O(len²) verifier, never after. Prefix capping bounds the per-pair
    levenshtein cost to a constant."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = tokens_of(clean_text_for_nlp("text"))
    token_rows = docs.select("doc_id", F.explode(F.array_distinct(toks)).alias("tok"))
    sigs = simhash16_exploded(token_rows, "doc_id")
    prefix = docs.select("doc_id", F.substring("text", 1, 80).alias("_prefix"))
    a = sigs.join(prefix, "doc_id").select(
        F.col("doc_id").alias("doc_a"), F.col("simhash"), F.col("_prefix").alias("_pa")
    )
    b = sigs.join(prefix, "doc_id").select(
        F.col("doc_id").alias("doc_b"), F.col("simhash"), F.col("_prefix").alias("_pb")
    )
    return (
        a.join(b, "simhash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("_pa", "_pb").cast("int").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 30)
    )


# --------------------------------------------------------------------------
# The postings relation itself under the gate: the generate/explode
# (UDTF-shaped) surface every dedup path builds on.
# --------------------------------------------------------------------------
@register(
    "doc_shingles",
    oracle=f"SELECT doc_id, shingle FROM ({_POSTINGS_SQL})",
)
def q_doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, 3-token-shingle) posting list — the generate stage
    (Spark's explode / lateral-view surface) that feeds every dedup
    operator, graded directly. Window-lead codegen formulation, one
    shuffle on doc_id (see _postings); oracle is the unnest twin."""
    return _postings(spark, sf_dir).select("doc_id", "shingle")


# --------------------------------------------------------------------------
# Canonical-document selection: the curation step AFTER clustering — one
# survivor per near-dup cluster (longest text wins, doc_id tie-break),
# everything else becomes the kill list. This is the frame a production
# dedup pipeline actually joins back against the corpus.
# --------------------------------------------------------------------------
@register(
    "dedup_canonical",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_CTES},
    pairs AS (SELECT doc_a, doc_b FROM scored_pairs WHERE jaccard >= 0.8),
    cc_edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    cc_nodes AS (SELECT a AS n FROM cc_edges UNION SELECT b FROM cc_edges),
    reach(s, d) AS (
      SELECT n, n FROM cc_nodes
      UNION
      SELECT r.s, e.b FROM reach r JOIN cc_edges e ON r.d = e.a
    ),
    clusters AS (SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s),
    ranked AS (
      SELECT c.doc_id, c.cluster_id,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY length(d.text) DESC, c.doc_id) AS rk
      FROM clusters c JOIN documents d USING (doc_id)
    )
    SELECT doc_id, cluster_id, rk = 1 AS keep FROM ranked
    """,
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop verdict per clustered document: connected components
    over the near-dup pair graph, then ONE canonical survivor per
    cluster — longest text, doc_id tie-break (the "keep longest"
    heuristic most corpus dedups use; swap the ORDER BY for a quality
    score to change policy). ``keep=false`` rows are the kill list an
    anti-join applies to the corpus.

    Scale: the clustered frame is tiny relative to the corpus (only
    docs that had a near-dup pair), so the ranking window shuffles a
    frame orders of magnitude smaller than the input; the length
    lookup is a broadcast-size join back to documents at this frame
    size and an equi-join at corpus scale."""
    from stonkwhisperer_spark.operators.dedup import connected_components
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("_len")
    )
    pairs = jaccard_pairs(_postings(spark, sf_dir), threshold=0.8)
    clusters = connected_components(
        pairs, "doc_a", "doc_b", dedup_edges=False  # grouped pairs: unique
    ).select(F.col("node").alias("doc_id"), "cluster_id")
    rk = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(F.col("_len").desc(), F.col("doc_id"))
    )
    return (
        clusters.join(docs, "doc_id")
        .withColumn("keep", rk == 1)
        .select("doc_id", "cluster_id", "keep")
    )


# --------------------------------------------------------------------------
# curation_e2e — the WHOLE training-data curation pipeline as ONE
# declarative plan: quality gate → near-dup kill list → sequence
# packing, each stage individually oracle-verified elsewhere
# (quality_filter, dedup_canonical, pack_documents), composed here so
# the driver hash-checks the system COMPOSING, not just the parts.
# --------------------------------------------------------------------------
_CUR_CTX = 2048
_CUR_SHARDS = 8


def _curation_oracle() -> str:
    from stonkwhisperer_spark.functions.text import (
        language_id_sql,
        quality_signals_sql,
    )

    return _CURATION_ORACLE_TEMPLATE.format(
        lang_pred=language_id_sql("text"),
        n_tokens=quality_signals_sql("text")["n_tokens"],
        shard_hash=portable_hash64_sql("'shard|' || cast(doc_id AS varchar)"),
        order_hash=portable_hash64_sql("'order|' || cast(doc_id AS varchar)"),
    )


_CURATION_ORACLE_TEMPLATE = f"""
    WITH RECURSIVE {_JACCARD_CTES},
    pairs AS (SELECT doc_a, doc_b FROM scored_pairs WHERE jaccard >= 0.8),
    cc_edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    cc_nodes AS (SELECT a AS n FROM cc_edges UNION SELECT b FROM cc_edges),
    reach(s, d) AS (
      SELECT n, n FROM cc_nodes
      UNION
      SELECT r.s, e.b FROM reach r JOIN cc_edges e ON r.d = e.a
    ),
    clusters AS (SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s),
    kill AS (
      SELECT doc_id FROM (
        SELECT c.doc_id,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY length(d.text) DESC, c.doc_id) AS rk
        FROM clusters c JOIN documents d USING (doc_id)
      ) WHERE rk > 1
    ),
    survivors AS (
      SELECT doc_id,
             {{lang_pred}}                            AS lang_pred,
             {{n_tokens}}                             AS n_tokens
      FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM kill)
        AND {{lang_pred}} = 'en'
        AND {{n_tokens}} BETWEEN 20 AND 100000
    ),
    sized AS (
      SELECT doc_id, lang_pred, n_tokens,
             {{shard_hash}} % {_CUR_SHARDS}           AS shard,
             {{order_hash}}                           AS shuffle_key
      FROM survivors
    ),
    cum AS (
      SELECT doc_id, lang_pred, shard, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY shuffle_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS BIGINT) AS tokens_before
      FROM sized
    )
    SELECT doc_id, lang_pred, shard, n_tokens, tokens_before,
           CAST(shard * 1000000 + tokens_before // {_CUR_CTX} AS BIGINT)
             AS pack_id
    FROM cum
    """


@register("curation_e2e", oracle=_curation_oracle())
def q_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE lazy plan: (1) quality gate —
    English-predicted, length-bounded (the quality_filter stage);
    (2) near-dup kill list — exact-Jaccard pairs → connected
    components → keep-longest canonical per cluster, everything else
    anti-joined away (the dedup_canonical stage); (3) sequence packing
    of the survivors into 2048-token shard-local context windows (the
    pack_documents stage). The DuckDB twin recomposes all three stages
    in one SQL text, so the hash gates stage INTERACTIONS — a dedup
    that dropped the wrong cluster member or a pack that ran before the
    kill-list would shift every downstream pack_id.

    Scale: quality gate is the map-only regexp_count pass; dedup
    shuffles the shingle inverted index and the (tiny) clustered
    subset; packing adds ONE shuffle on shard with an O(n) running
    frame. The whole pipeline is Catalyst-visible end to end — filters
    push to the corpus scan, the kill-list anti-join prunes to its key
    column, nothing materializes between stages."""
    from pyspark.sql.window import Window as W

    from stonkwhisperer_spark.functions.text import language_id, quality_signals
    from stonkwhisperer_spark.operators.dedup import connected_components

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")

    # Stage 2 first (it reads the full corpus): canonical-survivor kill
    # list over the near-dup graph. r7 shared the shingle chain across
    # jaccard_pairs' subplans via an explicit localCheckpoint; r8's
    # grouped jaccard_pairs shares it STRUCTURALLY — both its consumers
    # read the same groupBy(shingle) subtree, which Catalyst executes
    # once and reuses as a ReusedExchange. One corpus pass, one
    # shuffle, no checkpoint job and no pinned blocks.
    # lengths skips the spread() exchange: length() is cheap enough to
    # evaluate in the scan task — only the regex-heavy survivors side
    # needs the repartition.
    lengths = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("_len")
    )
    postings = _postings(spark, sf_dir)
    clusters = connected_components(
        jaccard_pairs(postings, threshold=0.8),
        "doc_a",
        "doc_b",
        dedup_edges=False,  # grouped pairs are unique by construction
    ).select(F.col("node").alias("doc_id"), "cluster_id")
    rk = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(F.col("_len").desc(), F.col("doc_id"))
    )
    kill = (
        clusters.join(lengths, "doc_id")
        .withColumn("_rk", rk)
        .filter(F.col("_rk") > 1)
        .select("doc_id")
    )

    # Stage 1 + 3: quality gate, then pack the survivors.
    qs = quality_signals("text")
    survivors = (
        docs.select(
            "doc_id",
            language_id("text").alias("lang_pred"),
            qs["n_tokens"].alias("n_tokens"),
        )
        .join(kill, "doc_id", "left_anti")
        # no_pushdown: pin the regex-heavy gate above spread()'s
        # exchange (pushed into the single-row-group scan it runs
        # one-tasked, without subexpression elimination — measured
        # 2.7 s vs 1.0 s at sf0.1).
        .filter(
            no_pushdown(
                (F.col("lang_pred") == "en")
                & F.col("n_tokens").between(20, 100000)
            )
        )
    )
    sized = survivors.select(
        "doc_id",
        "lang_pred",
        "n_tokens",
        (
            portable_hash64(F.concat(F.lit("shard|"), F.col("doc_id").cast("string")))
            % _CUR_SHARDS
        ).alias("shard"),
        portable_hash64(
            F.concat(F.lit("order|"), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("shuffle_key", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = sized.withColumn(
        "tokens_before",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint"),
    )
    return cum.select(
        "doc_id",
        "lang_pred",
        "shard",
        "n_tokens",
        "tokens_before",
        (
            F.col("shard") * 1000000
            + F.floor(F.col("tokens_before") / _CUR_CTX)
        ).cast("bigint").alias("pack_id"),
    )


# --------------------------------------------------------------------------
# span_dedup — corpus-wide EXACT duplicated-span removal (the
# boilerplate-paragraph scrub of C4/RefinedWeb curation), keep-first.
# --------------------------------------------------------------------------
@register(
    "span_dedup",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE text IS NOT NULL AND text <> ''
    ),
    s AS (
      SELECT doc_id, CAST(i AS INT) AS pos,
             array_to_string(
               words[CAST(i*16+1 AS BIGINT):CAST((i+1)*16 AS BIGINT)], ' '
             ) AS span
      FROM w, UNNEST(range(CAST(ceil(len(words)/16.0) AS BIGINT))) AS t(i)
    ),
    firsts AS (
      SELECT span, min(struct_pack(doc_id := doc_id, pos := pos)) AS fo
      FROM s GROUP BY span
    ),
    tagged AS (
      SELECT s.doc_id, s.pos, s.span,
             (f.fo.doc_id = s.doc_id AND f.fo.pos = s.pos) AS keep
      FROM s JOIN firsts f USING (span)
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(
             string_agg(CASE WHEN keep THEN span END, ' ' ORDER BY pos), ''
           ) AS clean_text
    FROM tagged GROUP BY doc_id
    """,
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span removal across the WHOLE corpus
    (RefinedWeb/C4's boilerplate scrub, at 16-word-chunk granularity
    for this delimiter-free corpus): a span occurrence survives only
    if it is the globally FIRST occurrence of that exact text, ordered
    by (doc_id, position); repeats — cross-document boilerplate or
    within-document loops — are dropped and the document re-joined
    from its survivors in original order. Finer-grained than document
    dedup (`dedup_keep_first` kills whole docs; this strips the
    repeated 5% and keeps the rest) and stricter than MinHash (exact
    match, not similarity). The DuckDB twin recomputes chunking,
    first-occurrence and reassembly; the hash covers the exact
    reassembled text of all 500 docs.

    Scale: span construction is map-only codegen (word_spans); the
    first-occurrence pick is a partial-aggregable min(struct) per span
    — NOT a window — so hot boilerplate spans cost one partial per
    task; two hash-uniform shuffles total (span, then doc_id). See
    operators/dedup.py:span_dedup."""
    from stonkwhisperer_spark.operators.dedup import span_dedup, word_spans

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", word_spans(F.col("text"), 16).alias("spans"))
    )
    return span_dedup(docs, id_col="doc_id", spans_col="spans")


# --------------------------------------------------------------------------
# Integer-exact k-means over embeddings + SemDeDup within-cluster pruning.
# Embedding components are quantized to 2^20 fixed-point BIGINTs at the
# scan, so every distance / dot product / centroid mean is an exact
# integer both engines compute identically — the same hash-portability
# convention as bigram_familiarity (float sums are summation-order-
# dependent; integer sums are not). On a cluster without a cross-engine
# oracle the float arithmetic (or MLlib KMeans) drops in unchanged.
# --------------------------------------------------------------------------
_KM_K = 8           # clusters; seeds = vec_id 0..7
_KM_DIM = 64        # embedding dimensionality (fixed in the corpus)
_KM_Q = 1_048_576   # 2^20 fixed-point scale: float32 * 2^20 is exact

_KM_QVEC_SQL = (
    "list_transform(embedding, "
    f"x -> CAST(floor(CAST(x AS DOUBLE) * {_KM_Q}) AS BIGINT))"
)


def _km_dist_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {_KM_DIM + 1}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


_KM_CTES = f"""
    q AS (SELECT vec_id, {_KM_QVEC_SQL} AS qv FROM embeddings),
    c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {_KM_K}),
    a1 AS (
      SELECT q.vec_id,
             min({_km_dist_sql('q.qv', 'c0.cv')} * {_KM_K} + c0.cid)
               % {_KM_K} AS cluster
      FROM q CROSS JOIN c0 GROUP BY q.vec_id
    ),
    dims AS (
      SELECT a1.cluster, t.i,
             CAST(sum(q.qv[t.i]) // count(*) AS BIGINT) AS cval
      FROM a1 JOIN q USING (vec_id), unnest(range(1, {_KM_DIM + 1})) AS t(i)
      GROUP BY a1.cluster, t.i
    ),
    c1 AS (
      SELECT cluster AS cid, list(cval ORDER BY i) AS cv
      FROM dims GROUP BY cluster
    ),
    a2 AS (
      SELECT q.vec_id,
             min({_km_dist_sql('q.qv', 'c1.cv')} * {_KM_K} + c1.cid) AS key
      FROM q CROSS JOIN c1 GROUP BY q.vec_id
    )
"""


def _km_quantize() -> F.Column:
    return F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(float(_KM_Q))),
    )


def _km_dist(a: str, b: str) -> F.Column:
    # Codegen'd unrolled integer kernel — the interpreted zip_with/
    # aggregate route is ~4x slower per evaluation at dim 64.
    from stonkwhisperer_spark.operators.similarity import sqdist_unrolled_int

    return sqdist_unrolled_int(a, b, _KM_DIM)


def _int_mean_vectors(df: DataFrame, key_col: str, out_key: str = "cid") -> DataFrame:
    """Element-wise integer mean (sum DIV count per dimension) of the
    quantized vectors in ``qv``, grouped by ``key_col`` → (out_key,
    cv). THE integer-centroid recipe — the k-means update step
    (_km_frames) and the RRF per-source centroid builder share this
    one implementation so a change to the rounding/quantization
    contract can never apply to one and silently miss the other."""
    dims = (
        df.select(key_col, F.posexplode("qv").alias("i", "val"))
        .groupBy(key_col, "i")
        .agg(F.expr("sum(val) DIV count(1)").alias("cval"))
    )
    return dims.groupBy(key_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "cval"))),
            lambda s: s.getField("cval"),
        ).alias("cv")
    ).select(F.col(key_col).alias(out_key), "cv")


def _km_assign(q: DataFrame, centroids: DataFrame, k: int) -> DataFrame:
    """(vec_id, key) with key = min over centroids of dist*K + cid —
    the integer argmin encoding (cid < K), deterministic under ties.
    The centroid side is K rows → broadcast; the pass over the corpus
    is map-only (partial min per task), one hash shuffle on vec_id."""
    return (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            (_km_dist("qv", "cv") * k + F.col("cid")).alias("key"),
        )
        .groupBy("vec_id")
        .agg(F.min("key").alias("key"))
    )


# Data-derived K default: K ≈ n / target cluster size, so per-cluster
# SemDeDup pair work stays O(target²) as the corpus grows — the scale
# path. The oracle-gated queries pin k=_KM_K (=8) explicitly so their
# hashes are corpus-size-independent.
_KM_TARGET_CLUSTER_SIZE = 64


def _km_default_k(emb: DataFrame) -> int:
    """K ≈ n/target (1-scalar count job, bounded)."""
    n = emb.count()
    return max(1, -(-n // _KM_TARGET_CLUSTER_SIZE))


def _km_frames(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> tuple[DataFrame, DataFrame, int]:
    """(quantized embeddings, final-iteration assignment keys, K): one
    Lloyd's refinement from the fixed seeds — assign → integer-mean
    update → reassign. ``k=None`` derives K from the corpus size
    (n / target cluster size) — see _KM_TARGET_CLUSTER_SIZE."""
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    if k is None:
        k = _km_default_k(emb)
    q = emb.select("vec_id", _km_quantize().alias("qv"))
    c0 = q.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    a1 = _km_assign(q, c0, k).select(
        "vec_id", (F.col("key") % k).alias("cluster")
    )
    c1 = _int_mean_vectors(a1.join(q, "vec_id"), "cluster", out_key="cid")
    return q, _km_assign(q, c1, k), k


def semantic_clusters_frame(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> DataFrame:
    """Public K-parameterized k-means assignment: (vec_id, cluster_id,
    dist_q). ``k=None`` derives K ≈ n/target cluster size — the 100 TB
    path, where K must scale with the corpus so per-cluster work stays
    bounded."""
    _, a2, k = _km_frames(spark, sf_dir, k)
    return a2.select(
        "vec_id",
        (F.col("key") % k).cast("bigint").alias("cluster_id"),
        F.expr(f"key DIV {k}").cast("bigint").alias("dist_q"),
    )


@register(
    "semantic_clusters",
    oracle=f"""
    WITH {_KM_CTES}
    SELECT vec_id,
           CAST(key % {_KM_K} AS BIGINT) AS cluster_id,
           CAST(key // {_KM_K} AS BIGINT) AS dist_q
    FROM a2
    """,
)
def q_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means clustering of the embedding corpus (K=8, seeds = the
    first K vec_ids, one Lloyd's refinement) in integer-exact
    arithmetic: assignment is an argmin of squared L2 distance over
    broadcast centroids encoded as ``dist*K + cid`` (deterministic
    tie-break on cid), the centroid update is a per-dimension integer
    mean. The DuckDB twin replays both iterations; the hash covers
    every document's final cluster and distance.

    Scale: this is exactly MLlib KMeans' execution shape — centroids
    broadcast (K×D values), each iteration one map-only pass with a
    partial-aggregated argmin plus a K×D-sized update shuffle; the
    corpus is streamed, never collected. MLlib itself isn't used here
    only because its init is RNG-seeded per-partition (not
    cross-engine reproducible); swap it in when no oracle gates the
    result. Downstream: semantic_dedup prunes within these clusters
    (SemDeDup), and the same assignment is the IVF coarse quantizer
    (operators/similarity.py). K is pinned to {_KM_K} here so the
    oracle hash is corpus-size-independent; semantic_clusters_frame
    takes any K (default data-derived n/target — the scale path)."""
    return semantic_clusters_frame(spark, sf_dir, k=_KM_K)


_SD_Q = 1024      # coarser 2^10 scale: keeps cos² comparison in int64
_SD_COS100 = 90   # keep threshold: cosine >= 0.90

_SD_QVEC_SQL = (
    "list_transform(embedding, "
    f"x -> CAST(floor(CAST(x AS DOUBLE) * {_SD_Q}) AS BIGINT))"
)


def _sd_dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {_KM_DIM + 1}), "
        f"i -> {a}[i] * {b}[i]))"
    )


# ||qv||² ceiling enforced on every vector before the cosine test:
# 10000·dot² stays inside int64 iff na·nb <= (2^63-1)/10000, i.e.
# per-vector norm² <= ~2^24.9 (dot² <= na·nb by Cauchy-Schwarz). 2^24
# leaves a 16x margin over the ~2^20 a unit-norm corpus produces.
_SD_NORM_CAP = 1 << 24


def _sd_norm_guard(nrm):
    """In-plan precondition: semantic_dedup's integer cosine test is
    int64-safe ONLY for (approximately) unit-norm embeddings — on
    unbounded inputs Spark would wrap silently (non-ANSI) while DuckDB
    raises, breaking cross-engine parity. Raise loudly instead. Folded
    into the consumed ``nrm`` column so the optimizer cannot prune it."""
    return F.when(nrm <= F.lit(_SD_NORM_CAP), nrm).otherwise(
        F.raise_error(
            F.lit(
                "semantic_dedup requires ~unit-norm embeddings: "
                f"||qv||^2 > 2^24 (scale {_SD_Q}) would overflow the "
                "int64 cosine test — normalize the embedding column"
            )
        )
    )


@register(
    "semantic_dedup",
    oracle=f"""
    WITH {_KM_CTES},
    assign AS (SELECT vec_id, key % {_KM_K} AS cluster FROM a2),
    s AS (SELECT vec_id, {_SD_QVEC_SQL} AS sv FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS keep_id, b.vec_id AS kill_id
      FROM assign a JOIN assign b ON a.cluster = b.cluster
                                 AND a.vec_id < b.vec_id
      JOIN s sa ON sa.vec_id = a.vec_id
      JOIN s sb ON sb.vec_id = b.vec_id
      WHERE {_sd_dot_sql('sa.sv', 'sb.sv')} > 0
        AND 10000 * {_sd_dot_sql('sa.sv', 'sb.sv')}
                  * {_sd_dot_sql('sa.sv', 'sb.sv')}
            >= {_SD_COS100 * _SD_COS100}
               * {_sd_dot_sql('sa.sv', 'sa.sv')}
               * {_sd_dot_sql('sb.sv', 'sb.sv')}
    )
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster_id,
           vec_id NOT IN (SELECT kill_id FROM pairs) AS keep
    FROM assign
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space near-duplicate
    pruning WITHIN k-means clusters — a document dies when an
    earlier-id member of its own cluster has cosine similarity >= 0.9.
    The cosine test is integer-exact: with 2^10 fixed-point vectors,
    ``cos >= 0.9  <=>  dot > 0 and 10000*dot² >= 8100*|a|²*|b|²`` —
    every term a bigint product two engines compute identically. The
    int64 headroom is NORM-based, not component-based: for ~unit-norm
    embeddings |a|² ≈ 2^20, so 10000·dot² <= 10000·|a|²·|b|² ≈ 2^53.3
    (Cauchy-Schwarz); the worst per-component bound (dot up to 64·2^20
    = 2^26) would NOT fit — 10000·2^52 ≈ 2^65. The precondition is
    therefore enforced in-plan (_sd_norm_guard raises on ||qv||² >
    2^24, which is exactly the bound that keeps every product below
    2^63), matching DuckDB's always-checked arithmetic instead of
    Spark's silent non-ANSI wraparound.

    Scale: the whole point of SemDeDup's clustering step — candidate
    pairs are generated per CLUSTER, never corpus×corpus; with K
    proportional to corpus size the per-cluster pair work stays
    bounded, and the pair join shuffles on the cluster key. The
    embedding-cosine variant of the dedup family (exact: dedup_keep_
    first; lexical: near_dup_jaccard/minhash; semantic: this). K is
    pinned to {_KM_K} here for a corpus-size-independent oracle hash;
    semantic_dedup_frame takes any K (default data-derived n/target)."""
    return semantic_dedup_frame(spark, sf_dir, k=_KM_K)


def semantic_dedup_frame(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> DataFrame:
    """K-parameterized SemDeDup: (vec_id, cluster_id, keep). See
    q_semantic_dedup for semantics; ``k=None`` derives K from the
    corpus size (n / target cluster size) so per-cluster pair work
    stays O(target²) as the corpus grows — the 100 TB path."""
    from stonkwhisperer_spark.operators.similarity import dot_unrolled_int

    _, a2, k = _km_frames(spark, sf_dir, k)
    # The assignment feeds BOTH pair sides and the final projection —
    # left lazy, the whole two-iteration k-means sub-DAG would execute
    # three times. Materialize it once: n×2 bigints (localCheckpoint;
    # at cluster scale this is the persisted assignment table every
    # IVF/SemDeDup pipeline writes anyway).
    assign = (
        a2.select("vec_id", (F.col("key") % k).alias("cluster"))
        .localCheckpoint(eager=True)
    )
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    # Norms are per-VECTOR, not per-pair: compute each once here (one
    # codegen'd pass over n rows) instead of twice per candidate pair.
    s = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(float(_SD_Q))),
        ).alias("sv"),
    ).withColumn(
        "nrm", _sd_norm_guard(dot_unrolled_int("sv", "sv", _KM_DIM))
    )
    sa = assign.join(s, "vec_id")
    a = sa.select(
        F.col("cluster"),
        F.col("vec_id").alias("keep_id"),
        F.col("sv").alias("sva"),
        F.col("nrm").alias("na"),
    )
    b = sa.select(
        F.col("cluster"),
        F.col("vec_id").alias("kill_id"),
        F.col("sv").alias("svb"),
        F.col("nrm").alias("nb"),
    )
    kills = (
        a.join(b, "cluster")
        .filter(F.col("keep_id") < F.col("kill_id"))
        .withColumn("_dot", dot_unrolled_int("sva", "svb", _KM_DIM))
        .filter(
            (F.col("_dot") > 0)
            & (
                10000 * F.col("_dot") * F.col("_dot")
                >= _SD_COS100 * _SD_COS100 * F.col("na") * F.col("nb")
            )
        )
        .select("kill_id")
        .distinct()
    )
    return (
        assign.join(kills, assign.vec_id == kills.kill_id, "left")
        .select(
            "vec_id",
            F.col("cluster").cast("bigint").alias("cluster_id"),
            F.col("kill_id").isNull().alias("keep"),
        )
    )


# --------------------------------------------------------------------------
# Prefix-filtered exact Jaccard join (PPJoin-style): identical answers to
# near_dup_jaccard — same oracle — through a lossless candidate pruning
# that removes the inverted-index hot-key problem structurally.
# --------------------------------------------------------------------------
@register(
    "near_dup_jaccard_prefix",
    oracle=f"""
    WITH {_JACCARD_CTES}
    SELECT doc_a, doc_b, jaccard FROM scored_pairs WHERE jaccard >= 0.8
    """,
)
def q_near_dup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs (threshold 0.8) via PREFIX FILTERING
    (PPJoin family, Xiao et al. WWW'08) — the SAME relation as
    near_dup_jaccard under the SAME oracle, proving the pruning is
    lossless: candidates are generated only through each doc's
    ``n - ceil(0.8n) + 1`` globally-rarest shingles, then verified with
    a full intersection count. The threshold is threaded as the exact
    fraction 4/5 (prefix lengths and the final test run in integer
    arithmetic — ``ceil(0.8*5)`` in doubles is 5, which would empty
    the prefix and silently drop true pairs).

    Scale: the self-join cost falls from Σ df² over all shingles to
    Σ df² over PREFIX occurrences — boilerplate shingles (the hot
    keys a doc-frequency cap must truncate in the plain index) are
    structurally excluded because a frequent shingle is in almost no
    one's rarest-20%; verification is O(candidates), and every shuffle
    key is hash-uniform. The exact-dedup scale path when MinHash's
    approximation is not acceptable. The grouped index still buffers
    one sorted id list per shingle for df/size/verify, so the run
    carries a LOSSLESS fail-loud guard (ADVICE r10): a shingle whose
    df exceeds 1M raises a diagnostic naming it instead of growing one
    task's aggregation state toward an opaque OOM — results are
    byte-identical whenever the guard passes (pinned in pytest)."""
    from stonkwhisperer_spark.operators.dedup import jaccard_pairs_prefix

    return jaccard_pairs_prefix(
        _postings(spark, sf_dir),
        threshold_num=4,
        threshold_den=5,
        guard_doc_freq=1_000_000,
    )


# --------------------------------------------------------------------------
# rrf_hybrid_retrieval — hybrid search: BM25 (lexical) fused with
# quantized-cosine (semantic) by Reciprocal Rank Fusion (Cormack et
# al., SIGIR'09), entirely in integer arithmetic so the fused ranking
# is hash-gateable end to end. Queries are the per-source BM25 query
# terms on the lexical side and the per-source embedding CENTROID on
# the semantic side — the same 20 queries through two systems.
# --------------------------------------------------------------------------
_RRF_LIST = 50       # per-system list depth feeding the fusion
_RRF_TOPK = 10
_RRF_K = 60          # standard RRF constant
_RRF_R_SCALE = 10**9  # rrf contribution = floor(1e9 / (60 + rank))
_SIM_SCALE = 10**9   # cosine^2 fixed point


def _rrf_oracle() -> str:
    from stonkwhisperer_spark.plans.queries_text import _bm25_ctes

    d = _KM_DIM
    return f"""
    WITH {_bm25_ctes()},
    bm_top AS (
      SELECT query_id, doc_id, r FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score_s DESC, doc_id) AS r
        FROM scored
      ) WHERE r <= {_RRF_LIST}
    ),
    qvec AS (SELECT vec_id, {_KM_QVEC_SQL} AS qv FROM embeddings),
    docvec AS (
      SELECT dd.doc_id, dd.source, q.qv,
             CAST(list_sum(list_transform(range(1, {d + 1}),
                  i -> q.qv[i] * q.qv[i])) AS BIGINT) AS na
      FROM documents dd JOIN qvec q ON q.vec_id = dd.doc_id
    ),
    cdims AS (
      SELECT source, t.i, CAST(sum(qv[t.i]) // count(*) AS BIGINT) AS cval
      FROM docvec, unnest(range(1, {d + 1})) AS t(i)
      GROUP BY source, t.i
    ),
    cent AS (
      SELECT source, list(cval ORDER BY i) AS cv FROM cdims GROUP BY source
    ),
    centn AS (
      SELECT source, cv,
             CAST(list_sum(list_transform(range(1, {d + 1}),
                  i -> cv[i] * cv[i])) AS BIGINT) AS nb
      FROM cent
    ),
    sim AS (
      SELECT c.source AS query_id, dv.doc_id,
             CAST(list_sum(list_transform(range(1, {d + 1}),
                  i -> dv.qv[i] * c.cv[i])) AS BIGINT) AS dot,
             dv.na, c.nb
      FROM docvec dv CROSS JOIN centn c
    ),
    skey AS (
      SELECT query_id, doc_id,
             (CASE WHEN dot >= 0 THEN 1 ELSE -1 END)
               * CAST((CAST(dot AS HUGEINT) * dot * {_SIM_SCALE})
                      // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS sk
      FROM sim WHERE na > 0 AND nb > 0
    ),
    cos_top AS (
      SELECT query_id, doc_id, r FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sk DESC, doc_id) AS r
        FROM skey
      ) WHERE r <= {_RRF_LIST}
    ),
    fused AS (
      SELECT query_id, doc_id,
             CAST(sum({_RRF_R_SCALE} // ({_RRF_K} + r)) AS BIGINT) AS rrf_s,
             CAST(count(*) AS BIGINT) AS n_systems
      FROM (SELECT * FROM bm_top UNION ALL SELECT * FROM cos_top)
      GROUP BY 1, 2
    )
    SELECT query_id, CAST(rnk AS INT) AS rank, doc_id, rrf_s, n_systems
    FROM (
      SELECT query_id, doc_id, rrf_s, n_systems,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_s DESC, doc_id) AS rnk
      FROM fused
    ) WHERE rnk <= {_RRF_TOPK}
    """


@register("rrf_hybrid_retrieval", oracle=_rrf_oracle())
def q_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the same 20 per-source queries scored by TWO
    systems — BM25 over the token inverted index (lexical;
    queries_text.bm25_scored) and fixed-point cosine against the
    source's quantized embedding centroid (semantic; 2^20 quantization
    as the k-means family, cos ordered by the exact integer key
    sign(dot)·(dot²·10⁹) DIV (‖a‖²·‖b‖²)) — then fused with Reciprocal
    Rank Fusion: contribution floor(10⁹ / (60 + rank)) per top-50
    list, summed exactly. Docs without embeddings simply miss the
    semantic list (real RRF handles asymmetric coverage); n_systems
    records 1- vs 2-list support. Every step is integer arithmetic on
    both engines, so the hash gates the entire two-system pipeline,
    both rankings included.

    Scale: the BM25 side is the persisted-index plan (see
    bm25_topk_docs); the semantic side is one posexplode + (source, i)
    partial-agg for centroids, then a ≤#sources-row broadcast into a
    map-side codegen'd 64-term dot over the corpus — no shuffle added
    beyond the per-query rank windows (bounded by #queries
    partitions). Fusion is a union + one (query, doc)-keyed agg."""
    from pyspark.sql.window import Window as W

    from stonkwhisperer_spark.operators.similarity import dot_unrolled_int
    from stonkwhisperer_spark.plans.queries_text import bm25_scored

    wq = W.partitionBy("query_id")
    bm_top = (
        bm25_scored(spark, sf_dir)
        .withColumn(
            "r", F.row_number().over(wq.orderBy(F.desc("score_s"), "doc_id"))
        )
        .filter(F.col("r") <= _RRF_LIST)
        .select("query_id", "doc_id", "r")
    )
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    qv = emb.select("vec_id", _km_quantize().alias("qv"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    docvec = (
        docs.join(qv, docs["doc_id"] == qv["vec_id"])
        .select(
            "doc_id", "source", "qv",
            dot_unrolled_int("qv", "qv", _KM_DIM).alias("na"),
        )
    )
    cent = _int_mean_vectors(docvec, "source", out_key="qsrc")
    centn = cent.select(
        "qsrc", "cv", dot_unrolled_int("cv", "cv", _KM_DIM).alias("nb")
    )
    sim = docvec.crossJoin(F.broadcast(centn)).select(
        F.col("qsrc").alias("query_id"),
        "doc_id",
        dot_unrolled_int("qv", "cv", _KM_DIM).alias("dot"),
        "na",
        "nb",
    )
    skey = sim.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        "query_id",
        "doc_id",
        (
            F.when(F.col("dot") >= 0, F.lit(1)).otherwise(F.lit(-1)).cast("bigint")
            * F.expr(
                f"CAST((CAST(dot AS DECIMAL(38,0)) * dot * {_SIM_SCALE}) DIV "
                f"(CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
            )
        ).alias("sk"),
    )
    cos_top = (
        skey.withColumn("r", F.row_number().over(wq.orderBy(F.desc("sk"), "doc_id")))
        .filter(F.col("r") <= _RRF_LIST)
        .select("query_id", "doc_id", "r")
    )
    fused = (
        bm_top.unionByName(cos_top)
        .withColumn(
            "c", F.expr(f"CAST({_RRF_R_SCALE} DIV ({_RRF_K} + r) AS BIGINT)")
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("rrf_s"),
            F.count("*").cast("bigint").alias("n_systems"),
        )
    )
    ranked = fused.withColumn(
        "rank", F.row_number().over(wq.orderBy(F.desc("rrf_s"), "doc_id")).cast("int")
    )
    return ranked.filter(F.col("rank") <= _RRF_TOPK).select(
        "query_id", "rank", "doc_id", "rrf_s", "n_systems"
    )


# --------------------------------------------------------------------------
# leakage_safe_split — train/val/test assignment that cannot leak
# near-duplicates across splits: the split key is the near-dup CLUSTER,
# not the document, so paraphrase families land in one split together.
# --------------------------------------------------------------------------
def _leakage_split_oracle() -> str:
    split_hash = portable_hash64_sql("'split|' || cast(group_key AS varchar)")
    return f"""
    WITH RECURSIVE {_JACCARD_CTES},
    pairs AS (SELECT doc_a, doc_b FROM scored_pairs WHERE jaccard >= 0.8),
    cc_edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    cc_nodes AS (SELECT a AS n FROM cc_edges UNION SELECT b FROM cc_edges),
    reach(s, d) AS (
      SELECT n, n FROM cc_nodes
      UNION
      SELECT r.s, e.b FROM reach r JOIN cc_edges e ON r.d = e.a
    ),
    clusters AS (SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s),
    grp AS (
      SELECT dd.doc_id, coalesce(c.cluster_id, dd.doc_id) AS group_key
      FROM documents dd LEFT JOIN clusters c USING (doc_id)
    ),
    hashed AS (
      SELECT doc_id, group_key, {split_hash} % 10 AS hb FROM grp
    )
    SELECT doc_id, group_key,
           CASE WHEN hb < 8 THEN 'train'
                WHEN hb = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM hashed
    """


@register("leakage_safe_split", oracle=_leakage_split_oracle())
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 dataset split: near-dup pairs → connected
    components → every document keyed by its CLUSTER (singletons by
    themselves) → split = keyed hash of the GROUP, so a paraphrase
    family can never straddle train and test (the eval-contamination
    failure mode of naive per-doc splits — doc_split_assign is that
    baseline). Deterministic and re-ingestion-stable: the assignment
    is a pure function of the group key, not of load order or corpus
    growth elsewhere. The DuckDB twin replays clustering AND
    assignment, so the hash gates the no-straddle property itself
    (same group ⇒ same hash ⇒ same split, on both engines).

    Scale: the dedup graph machinery is the shared jaccard/CC chain
    (one corpus pass, clustered-subset shuffles); grouping is a
    left join against the (tiny) cluster frame; assignment is
    map-only keyed hashing."""
    from stonkwhisperer_spark.operators.dedup import connected_components

    clusters = connected_components(
        jaccard_pairs(_postings(spark, sf_dir), threshold=0.8),
        "doc_a",
        "doc_b",
        dedup_edges=False,
    ).select(F.col("node").alias("doc_id"), "cluster_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    grp = docs.join(clusters, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("group_key")
    )
    hb = (
        portable_hash64(
            F.concat(F.lit("split|"), F.col("group_key").cast("string"))
        )
        % 10
    )
    return grp.select(
        "doc_id",
        "group_key",
        F.when(hb < 8, F.lit("train"))
        .when(hb == 8, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
