"""Text-analysis, profiling, and multimodal-column registered queries.

Covers the LLM-training-data extensions (language-ID, quality scoring)
plus SURVEY §2.5 A3/A6–A8, §2.7 U1, and the multimodal binary-column
plumbing pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.functions.hashing import portable_hash64_sql
from stonkwhisperer_spark.functions.text import (
    bpe_token_count,
    bpe_token_count_sql,
    language_id,
    language_id_sql,
    quality_signals,
    quality_signals_sql,
    token_count,
    token_count_sql,
)
from stonkwhisperer_spark.operators.profile import profile
from stonkwhisperer_spark.plans.glue import bounded_collect
from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table, no_pushdown, spread

# --------------------------------------------------------------------------
# Language-ID + quality scoring over documents (training-data pipeline
# text-analysis stage; extends reference C1's cleaning with scoring).
# --------------------------------------------------------------------------

_QS = quality_signals_sql("text")


@register(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           lang,
           {language_id_sql("text")}     AS lang_pred,
           {_QS["n_chars"]}              AS n_chars,
           {_QS["n_tokens"]}             AS n_tokens,
           {_QS["punct_ratio"]}          AS punct_ratio,
           {_QS["stopword_ratio"]}       AS stopword_ratio,
           {_QS["mean_token_len"]}       AS mean_token_len
    FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + quality signals per document. Map-only
    pass — no shuffle, no UDF; ratios are raw integer-count divisions
    so they hash identically cross-engine. The marker-hit filters are
    interpreted higher-order fns, so the input is spread() across cores
    first (no-op on already-split inputs)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    qs = quality_signals("text")
    return docs.select(
        "doc_id",
        "lang",
        language_id("text").alias("lang_pred"),
        *[c.alias(n) for n, c in qs.items()],
    )


# --------------------------------------------------------------------------
# Token counting: whitespace vs BPE-ish pre-tokenizer — the LLM budget
# estimator pair, plus a corpus-level rollup.
# --------------------------------------------------------------------------
@register(
    "token_stats",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id,
             {token_count_sql("text")}      AS ws_tokens,
             {bpe_token_count_sql("text")}  AS bpe_tokens,
             cast(len(coalesce(text, '')) AS bigint) AS n_chars
      FROM documents
    )
    SELECT doc_id, ws_tokens, bpe_tokens,
           cast(n_chars AS double) / cast(greatest(bpe_tokens, 1) AS double)
             AS chars_per_bpe_token
    FROM per_doc
    """,
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token budgets: whitespace count vs BPE-ish
    pre-tokenizer count (digit-splitting, punctuation-separating ASCII
    regex) + chars-per-token. The sizing pass every training-data
    pipeline runs before sampling; map-only codegen, no shuffle."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    n_chars = F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
    bpe = bpe_token_count("text")
    return docs.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (
            n_chars.cast("double") / F.greatest(bpe, F.lit(1)).cast("double")
        ).alias("chars_per_bpe_token"),
    )


# --------------------------------------------------------------------------
# A6–A8 profiler over documents.
# --------------------------------------------------------------------------

_DOC_COLS = [("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
             ("source", "string"), ("n_chars", "bigint")]

_PROFILE_PARTS = " UNION ALL ".join(
    f"""SELECT '{c}' AS col_name, '{t}' AS dtype,
        (count(CASE WHEN {c} IS NULL THEN 1 END) * 100.0) / count(*) AS null_pct,
        cast(count(DISTINCT {c}) AS bigint) AS n_distinct
        FROM documents"""
    for c, t in _DOC_COLS
)


@register(
    "profile_documents",
    oracle=f"""
    {_PROFILE_PARTS}
    UNION ALL
    SELECT '__row__' AS col_name, 'row' AS dtype,
           cast(NULL AS double) AS null_pct,
           cast(count(*) AS bigint) AS n_distinct
    FROM (SELECT DISTINCT * FROM documents)
    """,
)
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (null %, exact distinct counts, dtypes) + the
    distinct-full-row count (dup-row profile A7) — reference
    data_analysis (transformation.py:240-260) as one aggregate pass.
    Scale: single agg; exact count(distinct) implies an Expand — switch
    profile(approx=True) for HLL at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return profile(docs)


# --------------------------------------------------------------------------
# A3 distinct-value collection + U1 union of batches.
# --------------------------------------------------------------------------


@register(
    "distinct_event_types",
    oracle="""
    SELECT DISTINCT event_type FROM (
      SELECT event_type FROM events WHERE event_id % 2 = 0
      UNION ALL
      SELECT event_type FROM events WHERE event_id % 2 = 1
    )
    """,
)
def q_distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct values over a union of two batch halves — the
    reference's ticker-list collection (A3, transformation.py:229) over
    its Celery batch-flatten union (U1, extraction.py:90).
    Scale: partial distinct runs map-side before the single shuffle."""
    ev = load_table(spark, sf_dir, "events")
    half_a = ev.filter(F.col("event_id") % 2 == 0).select("event_type")
    half_b = ev.filter(F.col("event_id") % 2 == 1).select("event_type")
    return half_a.unionByName(half_b).distinct()


# --------------------------------------------------------------------------
# Constraint-check report (SURVEY §4: NOT NULL / VARCHAR(n) / unique
# enforcement moves from Postgres DDL to an engine-side check pass).
# --------------------------------------------------------------------------


@register(
    "doc_constraints",
    oracle="""
    SELECT 'not_null:text' AS constraint,
           cast(count(CASE WHEN text IS NULL THEN 1 END) AS bigint) AS n_violations
    FROM documents
    UNION ALL
    SELECT 'max_length:source<=4',
           cast(count(CASE WHEN len(source) > 4 THEN 1 END) AS bigint)
    FROM documents
    UNION ALL
    SELECT 'unique:(doc_id)',
           cast(coalesce(sum(cnt - 1), 0) AS bigint)
    FROM (SELECT count(*) AS cnt FROM documents GROUP BY doc_id)
    """,
)
def q_doc_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint report over documents (NOT NULL text,
    VARCHAR(4)-style length on source — deliberately tight so real
    violations appear — unique doc_id). One aggregate pass for
    row-level checks + one groupBy per uniqueness key."""
    from stonkwhisperer_spark.operators.quality import check_constraints

    docs = load_table(spark, sf_dir, "documents")
    return check_constraints(
        docs, not_null=["text"], max_length={"source": 4}, unique=[["doc_id"]]
    )


# --------------------------------------------------------------------------
# Multimodal-column plumbing: opaque binary payload + typed metadata.
# The decode/feature-extract stage lives in operators/multimodal.py
# (Pandas-UDF plumbing with a stubbed decoder); this query is the
# metadata/manifest pattern — schema, hashing, and header sniffing all
# engine-side over a binary column.
# --------------------------------------------------------------------------


@register(
    "media_manifest",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END                    AS media_type,
           cast(octet_length(encode(text)) AS bigint)   AS n_bytes,
           sha256(text)                                 AS content_sha256,
           lower(hex(encode(substr(text, 1, 4))))       AS header_hex
    FROM documents
    """,
)
def q_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest over an opaque binary media column: typed metadata,
    content hash, header-magic hex — the multimodal column pattern with
    text bytes standing in for image/audio payloads. Map-only."""
    docs = load_table(spark, sf_dir, "documents")
    media = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        F.octet_length(media).cast("bigint").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias("header_hex"),
    )


# --------------------------------------------------------------------------
# Deterministic dataset splitting: hash-based train/val/test assignment
# — reproducible across runs, engines, and cluster sizes (unlike
# randomSplit, which depends on partitioning).
# --------------------------------------------------------------------------
@register(
    "doc_split_assign",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {portable_hash64_sql("'split|' || cast(doc_id AS varchar)")} % 100 < 80
                  THEN 'train'
                WHEN {portable_hash64_sql("'split|' || cast(doc_id AS varchar)")} % 100 < 90
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by content-independent key
    hash: the split survives re-ingestion, repartitioning, and engine
    changes — the reproducibility property randomSplit lacks. Map-only;
    at 100 TB the split column doubles as a partition filter for
    training readers."""
    from stonkwhisperer_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    bucket = portable_hash64(
        F.concat(F.lit("split|"), F.col("doc_id").cast("string"))
    ) % 100
    return docs.select(
        "doc_id",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


# --------------------------------------------------------------------------
# Quality filter cascade: the C4-style keep/drop verdict assembled from
# the scoring signals — the decision stage after text_quality.
# --------------------------------------------------------------------------
@register(
    "quality_filter",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             {language_id_sql("text")}     AS lang_pred,
             {_QS["n_tokens"]}             AS n_tokens,
             {_QS["stopword_ratio"]}       AS stopword_ratio,
             {_QS["mean_token_len"]}       AS mean_token_len
      FROM documents
    )
    SELECT doc_id, lang_pred, n_tokens
    FROM scored
    WHERE lang_pred = 'en'
      AND n_tokens BETWEEN 20 AND 100000
      AND stopword_ratio >= 0.01
      AND mean_token_len BETWEEN 2.0 AND 12.0
    """,
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep side of a C4-style quality cascade: English-predicted,
    length-bounded, stopword-bearing, sane mean word length. One
    map-only pass — every signal is a codegen'd expression, so the
    cascade costs one corpus scan regardless of how many predicates
    stack."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    qs = quality_signals("text")
    scored = docs.select(
        "doc_id",
        language_id("text").alias("lang_pred"),
        qs["n_tokens"].alias("n_tokens"),
        qs["stopword_ratio"].alias("stopword_ratio"),
        qs["mean_token_len"].alias("mean_token_len"),
    )
    # no_pushdown: keep the cascade's regex evaluation in the 32-way
    # stage above spread()'s exchange (pushed into the single-row-group
    # scan it runs one-tasked and without subexpression elimination).
    return scored.filter(
        no_pushdown(
            (F.col("lang_pred") == "en")
            & F.col("n_tokens").between(20, 100000)
            & (F.col("stopword_ratio") >= 0.01)
            & F.col("mean_token_len").between(2.0, 12.0)
        )
    ).select("doc_id", "lang_pred", "n_tokens")


# --------------------------------------------------------------------------
# Dataset mixture sampling: language-weighted deterministic downsample —
# the "data mixture" stage of a training pipeline (e.g. upweight English,
# downsample the long tail) as a pure hash predicate.
# --------------------------------------------------------------------------
_MIX_RATES = {"en": 10000, "de": 5000, "fr": 5000, "es": 2500, "zh": 2500}


@register(
    "mixture_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {portable_hash64_sql("'mix|' || cast(doc_id AS varchar)")} % 10000
          < CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_RATES.items())}
            ELSE 0 END
    """,
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified mixture sampling: per-language keep
    rates (en 100%, de/fr 50%, es/zh 25%) applied as a keyed-hash
    threshold — unlike sampleBy, the SAME docs survive across engines,
    re-ingestions, and repartitioning, so downstream dedup/splits stay
    stable. Map-only, filter pushes after the scan, no shuffle; rates
    are a broadcast-free literal CASE."""
    from stonkwhisperer_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    bucket = portable_hash64(
        F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))
    ) % 10000
    rate = F.lit(0)
    for lang_code, r in reversed(_MIX_RATES.items()):
        rate = F.when(F.col("lang") == lang_code, F.lit(r)).otherwise(rate)
    return docs.filter(bucket < rate).select("doc_id", "lang", "source")


# --------------------------------------------------------------------------
# Sequence packing: assign documents to fixed-budget context windows
# (approximate greedy packing — cumulative token count per shard).
# --------------------------------------------------------------------------
_PACK_CTX = 2048
_PACK_SHARDS = 8


@register(
    "pack_documents",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             {portable_hash64_sql("'shard|' || cast(doc_id AS varchar)")}
               % {_PACK_SHARDS}                       AS shard,
             {portable_hash64_sql("'order|' || cast(doc_id AS varchar)")}
                                                      AS shuffle_key,
             {bpe_token_count_sql("text")}            AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY shuffle_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS BIGINT) AS tokens_before
      FROM sized
    )
    SELECT doc_id, shard, n_tokens, tokens_before,
           CAST(shard * 1000000 + tokens_before // {_PACK_CTX} AS BIGINT)
             AS pack_id
    FROM cum
    """,
)
def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: documents are hash-sharded, hash-
    shuffled within each shard (deterministic 'random' order), and
    packed into 2048-token context windows by running token count —
    pack_id = shard·1e6 + ⌊tokens_before/ctx⌋, the standard approximate
    packing (a doc straddling a boundary starts in the earlier pack).
    Scale: ONE shuffle on shard; each shard's window is an O(n) running
    frame; shard count is the parallelism knob (8 here, thousands in
    production) and no state crosses shards — the exact property that
    lets 100 TB pack in one pass. Deterministic end-to-end: the same
    doc always lands in the same pack."""
    from stonkwhisperer_spark.functions.hashing import portable_hash64
    from pyspark.sql.window import Window as W

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    sized = docs.select(
        "doc_id",
        (
            portable_hash64(F.concat(F.lit("shard|"), F.col("doc_id").cast("string")))
            % _PACK_SHARDS
        ).alias("shard"),
        portable_hash64(
            F.concat(F.lit("order|"), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
        bpe_token_count("text").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("shuffle_key", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = sized.withColumn(
        "tokens_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        "tokens_before",
        (
            F.col("shard") * 1000000
            + F.floor(F.col("tokens_before") / _PACK_CTX)
        ).alias("pack_id"),
    )


# --------------------------------------------------------------------------
# Binary structure decode: parse image dimensions out of a PNG header
# engine-side (substring/hex/conv on the binary column — no Python).
# --------------------------------------------------------------------------
@register(
    "media_headers",
    # The oracle re-derives the EXPECTED dimensions arithmetically; the
    # Spark side must recover them by actually parsing the bytes it
    # built — a wrong offset, endianness, or slice shows up as a hash
    # mismatch.
    oracle="""
    SELECT doc_id,
           cast(doc_id % 1024 + 16 AS bigint)       AS width,
           cast((doc_id * 7) % 1024 + 16 AS bigint) AS height,
           cast(8 AS bigint)                        AS bit_depth,
           cast(33 AS bigint)                       AS n_bytes,
           'png'                                    AS container
    FROM documents
    """,
)
def q_media_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata extraction from an opaque binary media column:
    each doc gets a deterministic PNG-structured payload (real
    signature + IHDR chunk), and width/height/bit-depth are parsed BACK
    from the big-endian byte layout with substring + hex + conv — all
    JVM codegen, the engine-side half of multimodal handling that needs
    no image library (the pixel-decode half is the Arrow-batched
    mapInPandas stage in operators/multimodal.py). Map-only, no
    shuffle; at 100 TB this is the manifest pass that routes payloads
    to the right decoder."""
    docs = load_table(spark, sf_dir, "documents")
    be32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    payload = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),          # PNG signature
        F.unhex(F.lit("0000000D")),                  # IHDR length = 13
        F.unhex(F.lit("49484452")),                  # "IHDR"
        be32(F.col("doc_id") % 1024 + 16),           # width
        be32((F.col("doc_id") * 7) % 1024 + 16),     # height
        F.unhex(F.lit("0806")),                      # bit depth 8, RGBA
        F.unhex(F.lit("00000000000000")),            # filler to n=33
    )
    parsed = docs.select("doc_id", payload.alias("_png"))
    u32 = lambda pos: F.conv(F.hex(F.substring("_png", pos, 4)), 16, 10).cast("bigint")  # noqa: E731
    is_png = F.hex(F.substring("_png", 1, 8)) == "89504E470D0A1A0A"
    return parsed.select(
        "doc_id",
        u32(17).alias("width"),
        u32(21).alias("height"),
        F.conv(F.hex(F.substring("_png", 25, 1)), 16, 10).cast("bigint").alias("bit_depth"),
        F.octet_length("_png").cast("bigint").alias("n_bytes"),
        F.when(is_png, F.lit("png")).otherwise(F.lit("unknown")).alias("container"),
    )


# --------------------------------------------------------------------------
# Per-source document caps: deterministic "at most N per domain"
# downsample — the anti-domination stage of corpus curation.
# --------------------------------------------------------------------------
_SOURCE_CAP = 20


@register(
    "source_capped_sample",
    oracle=f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {portable_hash64_sql("'cap|' || cast(doc_id AS varchar)")},
                        doc_id) AS rn
      FROM documents
    ) WHERE rn <= {_SOURCE_CAP}
    """,
)
def q_source_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most 20 docs per source, chosen by keyed hash order — the
    per-domain cap that stops one crawl domain from dominating a
    training mix, deterministic across runs/engines/partitionings
    (a LIMIT-per-group would be order-dependent). One shuffle on
    source; the hash order makes the kept subset a uniform sample of
    each source, not its head. Skew note: a pathologically hot source
    bounds one partition's sort — at production scale pre-aggregate
    counts and only window the sources over the cap."""
    from stonkwhisperer_spark.functions.hashing import portable_hash64
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        portable_hash64(F.concat(F.lit("cap|"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") <= _SOURCE_CAP)
        .select("doc_id", "source")
    )


# --------------------------------------------------------------------------
# media_pixel_stats — the REAL codec in the loop: Spark workers encode a
# deterministic PNG per document (pure-stdlib encoder), decode it back
# with the full decoder (chunk CRCs, scanline unfiltering), and emit
# per-channel means; DuckDB re-derives the same statistics in closed
# form from the pixel formula. Any codec bug anywhere breaks the hash.
# --------------------------------------------------------------------------
_PNG_W, _PNG_H = 16, 8
_PNG_DOCS = 200


@register(
    "media_pixel_stats",
    oracle=f"""
    WITH px AS (
      SELECT d.doc_id, x.range AS x, y.range AS y
      FROM (SELECT doc_id FROM documents WHERE doc_id < {_PNG_DOCS}) d,
           range({_PNG_W}) x, range({_PNG_H}) y
    )
    SELECT doc_id,
           {_PNG_W} AS width, {_PNG_H} AS height,
           cast(sum((7 * doc_id + 3 * x + 5 * y) % 256) AS double)
             / {_PNG_W * _PNG_H}.0 AS mean_r,
           cast(sum((doc_id + x * y) % 256) AS double)
             / {_PNG_W * _PNG_H}.0 AS mean_g,
           cast(sum((2 * doc_id + x + 2 * y) % 256) AS double)
             / {_PNG_W * _PNG_H}.0 AS mean_b
    FROM px GROUP BY doc_id
    """,
)
def q_media_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal decode path with a REAL codec: per document, a
    16×8 RGB image with formula pixels (R=(7·id+3x+5y)%256,
    G=(id+xy)%256, B=(2·id+x+2y)%256) is ENCODED to an actual PNG
    (zlib IDAT, chunk CRCs) in one Arrow-batched stage, then DECODED by
    the standards-path decoder (signature, CRC validation, scanline
    unfiltering) in the next, and reduced to exact per-channel means.
    The oracle never sees the bytes — it recomputes the statistics from
    the pixel formula, so the encode→decode round trip itself is under
    the correctness gate.

    Scale: two narrow Arrow-batched map stages, no shuffle; the decode
    stage is the template for real PIL/av decoders (same schema, same
    batch shape), with size_bucket repartitioning upstream when payload
    sizes skew."""
    import pandas as pd

    from stonkwhisperer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        png_pixel_stats,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _PNG_DOCS
    ).select("doc_id")

    def encode(batches):
        for pdf in batches:
            ids, types, payloads = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                rgb = bytes(
                    v
                    for y in range(_PNG_H)
                    for x in range(_PNG_W)
                    for v in (
                        (7 * did + 3 * x + 5 * y) % 256,
                        (did + x * y) % 256,
                        (2 * did + x + 2 * y) % 256,
                    )
                )
                ids.append(did)
                types.append("image/png")
                payloads.append(encode_png(_PNG_W, _PNG_H, rgb))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": types, "payload": payloads}
            )

    media = docs.mapInPandas(encode, MEDIA_SCHEMA)
    return png_pixel_stats(media).select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        "mean_r",
        "mean_g",
        "mean_b",
    )


# --------------------------------------------------------------------------
# media_resize_stats — the full multimodal normalize chain with REAL
# stages end to end: encode PNG → decode (CRCs, unfiltering) →
# nearest-neighbor resize → per-channel means. The oracle re-derives
# the resized statistics in closed form from the pixel formula and the
# floor grid map, so codec AND resampler are both under the hash.
# --------------------------------------------------------------------------
_RSZ_W, _RSZ_H = 8, 4  # 16×8 source → 2× decimation each axis


@register(
    "media_resize_stats",
    oracle=f"""
    WITH px AS (
      SELECT d.doc_id, x.range AS x, y.range AS y
      FROM (SELECT doc_id FROM documents WHERE doc_id < {_PNG_DOCS}) d,
           range({_RSZ_W}) x, range({_RSZ_H}) y
    ),
    src AS (
      SELECT doc_id,
             (x * {_PNG_W}) // {_RSZ_W} AS sx,
             (y * {_PNG_H}) // {_RSZ_H} AS sy
      FROM px
    )
    SELECT doc_id,
           {_RSZ_W} AS width, {_RSZ_H} AS height,
           cast(sum((7 * doc_id + 3 * sx + 5 * sy) % 256) AS double)
             / {_RSZ_W * _RSZ_H}.0 AS mean_r,
           cast(sum((doc_id + sx * sy) % 256) AS double)
             / {_RSZ_W * _RSZ_H}.0 AS mean_g,
           cast(sum((2 * doc_id + sx + 2 * sy) % 256) AS double)
             / {_RSZ_W * _RSZ_H}.0 AS mean_b
    FROM src GROUP BY doc_id
    """,
)
def q_media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal normalize pipeline with no stub in the path: the
    same formula PNGs as media_pixel_stats are ENCODED (zlib IDAT,
    chunk CRCs), DECODED by the standards-path decoder, RESIZED 16×8 →
    8×4 by the nearest-neighbor floor grid map (output pixel (x, y)
    samples source (x·W//w', y·H//h')), and reduced to exact
    per-channel means — three Arrow-batched map stages, no shuffle.
    The oracle recomputes the resized means from the pixel formula
    composed with the grid map, so a bug in the encoder, the decoder,
    OR the resampler breaks the hash.

    Scale: resize output is a constant 3·w'·h' bytes/row — the stage
    that makes downstream partition sizing independent of source image
    dimensions; a PIL/av decoder slots into the same mapInPandas
    contract for formats the stdlib can't decode."""
    import pandas as pd

    from stonkwhisperer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        resize_png_nearest,
        rgb_mean_stats,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _PNG_DOCS
    ).select("doc_id")

    def encode(batches):
        for pdf in batches:
            ids, types, payloads = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                rgb = bytes(
                    v
                    for y in range(_PNG_H)
                    for x in range(_PNG_W)
                    for v in (
                        (7 * did + 3 * x + 5 * y) % 256,
                        (did + x * y) % 256,
                        (2 * did + x + 2 * y) % 256,
                    )
                )
                ids.append(did)
                types.append("image/png")
                payloads.append(encode_png(_PNG_W, _PNG_H, rgb))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": types, "payload": payloads}
            )

    media = docs.mapInPandas(encode, MEDIA_SCHEMA)
    resized = resize_png_nearest(media, out_w=_RSZ_W, out_h=_RSZ_H)
    return rgb_mean_stats(resized).select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        "mean_r",
        "mean_g",
        "mean_b",
    )


# --------------------------------------------------------------------------
# video_frame_stats — the frame-sample stage REAL end to end: a
# concatenated-PNG "video" container split by honest chunk walking,
# every 2nd frame decoded through the full codec, per-frame channel
# means under the closed-form oracle. mp4/mkv would swap libav into
# the same two mapInPandas contracts; the Spark-side plumbing is what
# this pins.
# --------------------------------------------------------------------------
_VID_DOCS = 150
_VID_FRAMES = 4
_VID_EVERY = 2


@register(
    "video_frame_stats",
    oracle=f"""
    WITH px AS (
      SELECT d.doc_id, f.range AS f, x.range AS x, y.range AS y
      FROM (SELECT doc_id FROM documents WHERE doc_id < {_VID_DOCS}) d,
           range(0, {_VID_FRAMES}, {_VID_EVERY}) f,
           range({_PNG_W}) x, range({_PNG_H}) y
    )
    SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
           cast(sum((7 * doc_id + 3 * x + 5 * y + 11 * f) % 256) AS double)
             / {_PNG_W * _PNG_H}.0 AS mean_r,
           cast(sum((doc_id + x * y + 13 * f) % 256) AS double)
             / {_PNG_W * _PNG_H}.0 AS mean_g,
           cast(sum((2 * doc_id + x + 2 * y + 7 * f) % 256) AS double)
             / {_PNG_W * _PNG_H}.0 AS mean_b
    FROM px GROUP BY doc_id, f
    """,
)
def q_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling with no stub in the path: each doc becomes a
    4-frame concatenated-PNG container (every frame a REAL encode —
    zlib IDAT, chunk CRCs), `sample_png_frames` splits it by walking
    chunk structure through each IEND (variable compressed frame sizes
    — no fixed-size slicing) and keeps frames 0 and 2, and each kept
    frame runs the full decoder into exact per-channel means. The
    oracle recomputes the sampled frames' means from the pixel formula,
    so the encoder, the container splitter, the sampling phase, AND the
    decoder all sit under the hash.

    Scale: sample-then-decode orders the stages so only frames/every_n
    frames pay decode cost; output rows are (media, frame)-keyed for
    per-frame downstream parallelism — the skew fix for long videos.
    A libav demuxer drops into the same mapInPandas contract for real
    containers."""
    import pandas as pd

    from stonkwhisperer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        encode_png,
        sample_png_frames,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _VID_DOCS)
        .select("doc_id")
    )

    def encode(batches):
        for pdf in batches:
            ids, types, payloads = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                container = b"".join(
                    encode_png(
                        _PNG_W,
                        _PNG_H,
                        bytes(
                            v
                            for y in range(_PNG_H)
                            for x in range(_PNG_W)
                            for v in (
                                (7 * did + 3 * x + 5 * y + 11 * f) % 256,
                                (did + x * y + 13 * f) % 256,
                                (2 * did + x + 2 * y + 7 * f) % 256,
                            )
                        ),
                    )
                    for f in range(_VID_FRAMES)
                )
                ids.append(did)
                types.append("video/x-png-seq")
                payloads.append(container)
            yield pd.DataFrame(
                {"media_id": ids, "media_type": types, "payload": payloads}
            )

    media = docs.mapInPandas(encode, MEDIA_SCHEMA)
    frames = sample_png_frames(media, every_n=_VID_EVERY)

    stats_schema = (
        "doc_id long, frame_idx int, mean_r double, mean_g double, mean_b double"
    )

    def featurize(batches):
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "mean_r", "mean_g", "mean_b")}
            for mid, fidx, frame in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["frame"]
            ):
                w, h, rgb = decode_png(bytes(frame))
                n = w * h
                rows["doc_id"].append(mid)
                rows["frame_idx"].append(fidx)
                for ch, key in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[key].append(sum(rgb[ch::3]) / n)
            yield pd.DataFrame(rows)

    return frames.repartition("media_id", "frame_idx").mapInPandas(
        featurize, stats_schema
    )


# --------------------------------------------------------------------------
# audio_pcm_stats — the audio leg REAL end to end: 16-bit PCM WAV
# containers (RIFF chunks, odd-size LIST chunk forcing pad-byte
# handling) built per doc, chunk-walked back open, integer-exact
# loudness stats under the closed-form oracle. PCM needs no codec
# library, so unlike image/video there is no stub anywhere near this
# path; mp3/opus would swap a decoder into the same contract.
# --------------------------------------------------------------------------
_AUD_DOCS = 150
_AUD_RATE = 8000
_AUD_BASE = 480  # samples per clip = _AUD_BASE + doc_id % 32 (varies)
_AUD_FRAME = 160  # framewise-feature window (3 full frames per clip)


@register(
    "audio_pcm_stats",
    oracle=f"""
    WITH s AS (
      SELECT d.doc_id, i.range AS idx,
             ((d.doc_id * 31 + i.range * 17) % 65536) - 32768 AS smp
      FROM (SELECT doc_id FROM documents WHERE doc_id < {_AUD_DOCS}) d,
           range({_AUD_BASE + 32}) i
      WHERE i.range < {_AUD_BASE} + d.doc_id % 32
    ),
    fr AS (
      SELECT doc_id, idx // {_AUD_FRAME} AS f, smp,
             lag(smp) OVER (
               PARTITION BY doc_id, idx // {_AUD_FRAME} ORDER BY idx
             ) AS prev
      FROM s WHERE idx < {(_AUD_BASE // _AUD_FRAME) * _AUD_FRAME}
    ),
    fe AS (
      SELECT doc_id, f,
             CAST(sum(smp * smp) AS BIGINT) AS energy,
             CAST(sum(CASE WHEN prev IS NOT NULL
                                AND (prev < 0) <> (smp < 0)
                           THEN 1 ELSE 0 END) AS BIGINT) AS zc
      FROM fr GROUP BY doc_id, f
    ),
    fa AS (
      SELECT doc_id, count(*) AS n_frames,
             max(energy)             AS peak_frame_energy,
             CAST(sum(zc) AS BIGINT) AS n_zero_cross
      FROM fe GROUP BY doc_id
    ),
    st AS (
      SELECT doc_id,
             {_AUD_RATE} AS sample_rate,
             1 AS channels,
             count(*) AS n_samples,
             max(abs(smp)) AS peak,
             CAST(sum(abs(smp)) AS BIGINT) AS sum_abs,
             CAST(sum(smp * smp) AS BIGINT) AS sum_sq
      FROM s GROUP BY doc_id
    )
    SELECT st.doc_id, sample_rate, channels, n_samples, peak, sum_abs,
           sum_sq, n_frames, peak_frame_energy, n_zero_cross
    FROM st JOIN fa ON st.doc_id = fa.doc_id
    """,
)
def q_audio_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction with no stub in the path: each doc
    becomes a REAL 16-bit PCM WAV (RIFF/fmt/LIST/data chunks, odd-size
    LIST payload exercising the RIFF pad byte, variable clip lengths),
    ``decode_wav`` walks the container back open skipping unknown
    chunks, and ``wav_clip_features`` emits integer-exact loudness
    signals (peak, sum|s|, sum s²) PLUS framewise DSP features
    ({_AUD_FRAME}-sample windows: frame count, peak frame energy,
    zero-crossing total — the voice-activity/silence-trim signals)
    from the same single decode pass; the oracle recomputes all of it
    from the sample formula — encoder, chunk walker, AND both feature
    stages sit under the value hash.

    Scale: encode and features are two Arrow-batched mapInPandas
    stages over the doc_id scan, zero exchanges; features are
    O(duration) per clip, so ``size_bucket`` first when clip lengths
    skew."""
    import pandas as pd

    from stonkwhisperer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_wav,
        wav_clip_features,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _AUD_DOCS)
        .select("doc_id")
    )

    def encode(batches):
        for pdf in batches:
            ids, types, payloads = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = _AUD_BASE + did % 32
                samples = [((did * 31 + i * 17) % 65536) - 32768 for i in range(n)]
                ids.append(did)
                types.append("audio/wav")
                payloads.append(encode_wav(_AUD_RATE, 1, samples))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": types, "payload": payloads}
            )

    media = docs.mapInPandas(encode, MEDIA_SCHEMA)
    return wav_clip_features(media, frame=_AUD_FRAME).select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "channels",
        "n_samples",
        "peak",
        "sum_abs",
        "sum_sq",
        "n_frames",
        "peak_frame_energy",
        "n_zero_cross",
    )


# --------------------------------------------------------------------------
# Within-document repetition (C4/Gopher-style quality rule): repeated
# trigram + repeated word fractions. Boilerplate, keyboard-mash, and
# template spam score high; the downstream filter thresholds on these.
# --------------------------------------------------------------------------
@register(
    "doc_repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    t AS (
      SELECT doc_id, words, len(words) AS n_words,
             CASE WHEN len(words) >= 3 THEN
               [words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                FOR i IN generate_series(1, len(words) - 2)]
             ELSE [] END AS tg
      FROM w
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT)                AS n_words,
           CAST(len(tg) AS BIGINT)                AS n_trigrams,
           CAST(len(list_distinct(tg)) AS BIGINT) AS n_distinct_trigrams,
           CASE WHEN len(tg) > 0
                THEN 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)
                ELSE 0.0 END                      AS dup_trigram_frac,
           CASE WHEN n_words > 0
                THEN 1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / n_words
                ELSE 0.0 END                      AS dup_word_frac
    FROM t
    """,
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (the C4/Gopher repetition rules):
    fraction of duplicate trigrams and duplicate words. All JVM array
    expressions — split → sequence/transform trigram build →
    array_distinct — one map-only pass, no shuffle, no Python; the
    interpreted higher-order lambdas are amortized by spread() like the
    other text scorers. Both engines compute the ratios as
    double(distinct)/count so the value hash cannot drift.

    Scale: embarrassingly parallel scan; at 100 TB this composes into
    quality_filter's cascade as one more codegen'd projection."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    w = docs.withColumn("words", F.split("text", " "))
    t = w.withColumn(
        "tg",
        F.expr(
            "CASE WHEN size(words) >= 3 THEN"
            " transform(sequence(1, size(words) - 2),"
            "  i -> concat_ws(' ', element_at(words, i),"
            "   element_at(words, i + 1), element_at(words, i + 2)))"
            " ELSE array() END"
        ),
    )
    n_tg, n_w = F.size("tg"), F.size("words")
    d_tg, d_w = F.size(F.array_distinct("tg")), F.size(F.array_distinct("words"))
    return t.select(
        "doc_id",
        n_w.cast("bigint").alias("n_words"),
        n_tg.cast("bigint").alias("n_trigrams"),
        d_tg.cast("bigint").alias("n_distinct_trigrams"),
        F.when(n_tg > 0, F.lit(1.0) - d_tg.cast("double") / n_tg)
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
        F.when(n_w > 0, F.lit(1.0) - d_w.cast("double") / n_w)
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
    )


# --------------------------------------------------------------------------
# Temperature sampling: DATA-DEPENDENT mixture rates — downsample
# common languages toward balance (T=0.5), rates derived from corpus
# counts rather than the fixed literals of mixture_sample.
# --------------------------------------------------------------------------
@register(
    "temperature_mixture",
    oracle=f"""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS mn FROM c),
    t AS (
      SELECT lang,
             CAST(floor(10000 * sqrt(CAST(mn AS DOUBLE) / n)) AS BIGINT)
               AS keep_threshold
      FROM c, m
    )
    SELECT d.doc_id, d.lang, t.keep_threshold
    FROM documents d JOIN t USING (lang)
    WHERE {portable_hash64_sql("'tmix|' || cast(doc_id AS varchar)")} % 10000
          < t.keep_threshold
    """,
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 mixture sampling with rates DERIVED FROM THE
    DATA: per-language keep rate sqrt(n_min/n_lang), so the rarest
    language keeps 100% and common ones downsample toward balance —
    the UNIMAX/temperature-resampling shape of multilingual training
    mixes. Selection stays a keyed-hash threshold (same discipline as
    mixture_sample): deterministic across engines, re-ingestions, and
    repartitioning. Cross-engine double discipline: n_min/n is one IEEE
    division, sqrt is correctly rounded, floor(×10000) pins the
    threshold to an integer — both engines compute the identical
    BIGINT, so the hash compare cannot drift.

    Scale: phase 1 is a 5-key partial-aggregated count (map-side
    combine, tiny exchange); phase 2 broadcasts the 5-row rate table
    back and filters map-only — the corpus is touched twice, shuffled
    never."""
    from stonkwhisperer_spark.functions.hashing import portable_hash64

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    n_min = counts.agg(F.min("n").alias("mn"))
    rates = counts.join(F.broadcast(n_min)).select(
        "lang",
        F.floor(
            F.lit(10000)
            * F.sqrt(F.col("mn").cast("double") / F.col("n"))
        ).cast("bigint").alias("keep_threshold"),
    )
    bucket = portable_hash64(
        F.concat(F.lit("tmix|"), F.col("doc_id").cast("string"))
    ) % 10000
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("keep_threshold"))
        .select("doc_id", "lang", "keep_threshold")
    )


from stonkwhisperer_spark.functions.text import clean_text_for_nlp_sql as _ct_sql

_CLEAN_TEXT = _ct_sql("text")


# --------------------------------------------------------------------------
# Round-6 corpus-LM familiarity scoring — the perplexity-filter stage of a
# training-data pipeline (CCNet/Gopher filter by LM score) expressed with
# INTEGER-EXACT corpus statistics, so the oracle matches to the hash
# (log-prob sums are summation-order-dependent across engines; counts and
# one final double division are not).
# --------------------------------------------------------------------------
@register(
    "bigram_familiarity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(d.arr) AS tok,
             generate_subscripts(d.arr, 1) AS i
      FROM (SELECT doc_id, {{toks}} AS arr FROM documents) d
    ),
    bg AS (
      SELECT a.doc_id, a.tok AS w1, b.tok AS w2
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      WHERE a.tok <> '' AND b.tok <> ''
    ),
    counts AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2)
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(cnt) AS BIGINT) AS sum_freq,
           CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           cast(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS double)
               / count(*) AS shared_ratio
    FROM bg JOIN counts USING (w1, w2)
    GROUP BY doc_id
    """.replace("{toks}", "regexp_split_to_array(" + _CLEAN_TEXT + ", ' ')"),
)
def q_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM familiarity per document — the perplexity-filter shape
    (CCNet trains a small LM on reference text and filters by per-doc
    score): build corpus-wide bigram counts from the cleaned token
    stream, then score each document by how much of it is made of
    bigrams the REST of the corpus also uses. ``shared_ratio`` (the
    fraction of a doc's bigrams with corpus count >= 2) separates
    template/boilerplate-heavy docs (high) from noise/unique text
    (low) the same way a perplexity threshold does, while keeping every
    aggregate an integer sum — a DOUBLE log-prob sum is
    summation-order-dependent, so two engines can't hash-match it; the
    counts can, and the one ratio divides two exact integers. (The
    fixed-point recipe of lm_perplexity_scores later made the true
    log-prob sum hash-gateable too; this query remains the count-only
    baseline.)

    Scale: two bounded shuffles — posexplode + lead() keyed on doc_id
    (the sequence stays inside its partition group) and the bigram
    count/join keyed on (w1, w2), high-cardinality and uniform. The
    count table is vocabulary-sized, not corpus-sized; no
    collect, no UDF, whole-stage codegen end to end."""
    from pyspark.sql.window import Window

    from stonkwhisperer_spark.functions.hashing import tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    tok_rows = docs.select(
        "doc_id",
        F.posexplode(tokens_of(clean_text_for_nlp("text"))).alias("i", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    bg = (
        tok_rows.withColumn("w2", F.lead("tok").over(w))
        .filter(
            F.col("w2").isNotNull() & (F.col("tok") != "") & (F.col("w2") != "")
        )
        .select("doc_id", F.col("tok").alias("w1"), "w2")
    )
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        bg.join(counts, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("cnt").alias("sum_freq"),
            F.sum((F.col("cnt") >= 2).cast("bigint")).alias("n_shared"),
            (
                F.sum((F.col("cnt") >= 2).cast("bigint")).cast("double")
                / F.count(F.lit(1))
            ).alias("shared_ratio"),
        )
    )


# --------------------------------------------------------------------------
# Round-6 sliding-window chunking — the context-window segmentation stage
# (RAG indexing / long-doc pretraining): fixed-size token windows with
# overlap, one row per chunk.
# --------------------------------------------------------------------------
_CHUNK_W, _CHUNK_STRIDE = 64, 48  # 16-token overlap


@register(
    "doc_chunks",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array({{clean}}, ' ') AS arr
      FROM documents WHERE {{clean}} <> ''
    ),
    starts AS (
      SELECT doc_id, arr, unnest(range(1, len(arr) + 1, {_CHUNK_STRIDE})) AS s
      FROM d
    )
    SELECT doc_id,
           CAST((s - 1) / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(LEAST({_CHUNK_W}, len(arr) - s + 1) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(arr, s, s + {_CHUNK_W} - 1), ' ') AS chunk_text
    FROM starts
    """.replace("{clean}", _CLEAN_TEXT),
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (HF ``return_overflowing_tokens`` shape):
    split each cleaned document into 64-token windows every 48 tokens
    (16-token overlap so no boundary context is lost — the RAG-indexing
    and long-document-pretraining segmentation stage). One row per
    chunk with its index, token count, and re-joined text; trailing
    windows are partial by design (every token belongs to >= 1 chunk).

    Scale: map-only — sequence + slice + explode are codegen'd array
    expressions, no shuffle at all; output size is corpus x (1 +
    overlap/stride), the same blow-up any chunker pays. Pair with
    pack_documents to fill training sequences from the chunks."""
    from stonkwhisperer_spark.functions.hashing import tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp

    w, stride = _CHUNK_W, _CHUNK_STRIDE
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    clean = clean_text_for_nlp("text")
    d = docs.select("doc_id", tokens_of(clean).alias("arr")).filter(clean != "")
    starts = d.select(
        "doc_id",
        "arr",
        F.explode(
            F.sequence(F.lit(1), F.size("arr"), F.lit(stride))
        ).alias("s"),
    )
    return starts.select(
        "doc_id",
        ((F.col("s") - 1) / stride).cast("int").alias("chunk_idx"),
        F.least(F.lit(w), F.size("arr") - F.col("s") + 1)
        .cast("bigint")
        .alias("n_chunk_tokens"),
        F.array_join(F.slice("arr", F.col("s"), F.lit(w)), " ").alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# Round-6 tf-idf keyword extraction — per-document salient terms via a
# rational tf-idf (no transcendental log, so both engines agree to the bit).
# --------------------------------------------------------------------------
@register(
    "doc_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array({{clean}}, ' ')) AS term
      FROM documents WHERE {{clean}} <> ''
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf AS BIGINT) AS tf,
             CAST(df.df AS BIGINT) AS df,
             cast(tf.tf AS double) * (n.n_docs + 1) / (df.df + 1) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, tf, df, score FROM ranked WHERE rn <= 5
    """.replace("{clean}", _CLEAN_TEXT),
)
def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction by tf-idf — the topic/salience
    stage of a curation pipeline (cluster labeling, dedup explanation,
    search indexing). The idf uses the RATIONAL form tf·(N+1)/(df+1)
    instead of tf·ln(N/df): same ranking intent, but every score is a
    single double division of exact integers, so the DuckDB twin
    reproduces it bit-for-bit (ln differs in the last ulp across
    engines and would poison the hash). Top-5 terms per doc, ties on
    term.

    Scale: two bounded shuffles — (doc, term) for tf and term for df —
    both high-cardinality and uniform; the df table is
    vocabulary-sized and the corpus size N is one driver-side count
    folded in as a literal. The final ranking windows over each doc's
    OWN terms (bounded partitions)."""
    from stonkwhisperer_spark.functions.hashing import tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    clean = clean_text_for_nlp("text")
    toks = docs.filter(clean != "").select(
        "doc_id", F.explode(tokens_of(clean)).alias("term")
    )
    n_docs = toks.select("doc_id").distinct().count()
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    from pyspark.sql.window import Window

    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (
            F.col("tf").cast("double") * F.lit(float(n_docs + 1)) / (F.col("df") + 1)
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", "tf", "df", "score")
    )


# --------------------------------------------------------------------------
# Round-6 deterministic corpus shuffle — reproducible global training
# order without a global sort.
# --------------------------------------------------------------------------
@register(
    "corpus_shuffle",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             {portable_hash64_sql("cast(doc_id AS varchar)", seed=42)} % 32 AS shard,
             {portable_hash64_sql("cast(doc_id AS varchar)", seed=43)} AS ord
      FROM documents
    )
    SELECT doc_id,
           CAST(shard AS INT) AS shard,
           CAST(row_number() OVER (
                PARTITION BY shard ORDER BY ord, doc_id) AS BIGINT) AS pos
    FROM keyed
    """,
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle — the reproducible-training-order
    stage (Megatron/GPT data-order shuffling): every document gets a
    stable (shard, position) from two seeded keyed hashes, so ANY
    engine, any partitioning, any re-run derives the identical global
    order shard-by-shard — no RNG state, no global sort. Readers
    consume shard files in order; re-ingestion of the same corpus
    reproduces the curriculum exactly.

    Scale: ONE bounded shuffle on the 32 shard keys; each shard sorts
    its own rows (row_number window) — the global-sort-free way to
    order 100 TB (a true ORDER BY rand() would be a full-corpus range
    exchange and unreproducible besides)."""
    from stonkwhisperer_spark.functions.hashing import portable_hash64
    from pyspark.sql.window import Window

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    sid = F.col("doc_id").cast("string")
    keyed = docs.select(
        "doc_id",
        (portable_hash64(sid, seed=42) % 32).cast("int").alias("shard"),
        portable_hash64(sid, seed=43).alias("ord"),
    )
    w = Window.partitionBy("shard").orderBy("ord", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


# --------------------------------------------------------------------------
# BPE merge learning, BATCHED (r6 single-merge loop -> r8 batched passes):
# the tokenizer-training step of an LLM data pipeline. Each corpus PASS
# counts adjacent unit pairs once, then learns up to _BPE_BATCH merges
# from that single count — the top-ranked pairs that are mutually
# CONFLICT-FREE (no shared unit, and no unit equal to another accepted
# pair's merged token). Conflict-freedom makes the batch's merges
# occurrence-invariant under each other, so applying the whole batch in
# one fold pass is EXACTLY sequential per-pair application in any order
# — the property that lets merge count scale without per-merge corpus
# passes (a production trainer's 30k merges become ~30k/B passes, and
# with delta bookkeeping far fewer; the per-pass dataflow is this
# shape). Everything stays in-plan: the learned batch flows into the
# apply step as a 1-row broadcast merge MAP, never a collect round trip.
# --------------------------------------------------------------------------
_BPE_PASSES = 2   # corpus passes (pair counts); VERDICT r7 task 6: <= 3
_BPE_BATCH = 4    # merges learned per pass -> 8 total merges
_BPE_TOPC = 64    # ranked candidate pool scanned by the greedy selector


def bpe_apply_merge_expr(seq: str, pair: str) -> str:
    """SQL expression applying ONE learned BPE merge to a space-joined
    unit sequence, as a left-to-right fold over the UNIT ARRAY — never a
    raw substring replace (which can match across unit boundaries: after
    merge 1 creates unit ``th``, a later pair ``h e`` would substring-match
    the tail of ``th`` plus the separator, merging across units; see
    tests/test_plans.py::test_bpe_merge_respects_unit_boundaries).

    The fold keeps the accumulator as the space-joined merged prefix:
    at each incoming unit ``u``, if the LAST accumulated unit equals the
    pair's left element and ``u`` equals its right, the last unit is
    replaced by the merged token (greedy non-overlapping left-to-right,
    standard BPE application); otherwise ``u`` is appended. A merged
    token can never re-match as the left element within the same pass
    (``x||y`` != ``x``), so the single fold is exact.

    Kept as the single-pair special case (and the boundary test's
    subject); the batched queries use :func:`bpe_apply_merges_expr`.
    """
    last = "element_at(split(acc, ' '), -1)"
    return f"""
      aggregate(
        slice(split({seq}, ' '), 2, size(split({seq}, ' ')) - 1),
        element_at(split({seq}, ' '), 1),
        (acc, u) -> CASE
          WHEN {last} = element_at(split({pair}, ' '), 1)
               AND u = element_at(split({pair}, ' '), 2)
          THEN CASE
            WHEN length(acc) = length({last})
            THEN replace({pair}, ' ', '')
            ELSE concat(substring(acc, 1, length(acc) - length({last})),
                        replace({pair}, ' ', ''))
          END
          ELSE concat(acc, ' ', u) END)
    """


def bpe_apply_merges_expr(seq: str, mm: str) -> str:
    """The BATCH generalization of :func:`bpe_apply_merge_expr`: one
    left-to-right unit-array fold applying EVERY merge in the 1-row
    broadcast map ``mm`` ('x y' -> 'xy'). Exactness for a conflict-free
    batch (see _bpe_select_batch): the 2·B units and B merged tokens
    are pairwise distinct, so at most one map entry can match at any
    fold position, no merge can consume another's units, and a merged
    token can never re-match (it is in no entry's key) — the combined
    fold therefore equals sequential per-pair application in any
    order. ``try_element_at`` keeps the missing-key probe ANSI-safe."""
    last = "element_at(split(acc, ' '), -1)"
    hit = f"try_element_at({mm}, concat({last}, ' ', u))"
    return f"""
      aggregate(
        slice(split({seq}, ' '), 2, size(split({seq}, ' ')) - 1),
        element_at(split({seq}, ' '), 1),
        (acc, u) -> CASE
          WHEN {hit} IS NOT NULL
          THEN CASE
            WHEN length(acc) = length({last})
            THEN {hit}
            ELSE concat(substring(acc, 1, length(acc) - length({last})),
                        {hit})
          END
          ELSE concat(acc, ' ', u) END)
    """


def _bpe_apply_merges_duck(seq: str, mm: str) -> str:
    """DuckDB twin of bpe_apply_merges_expr: same fold via list_reduce
    (acc starts as the first unit — identical to Spark's slice+initial
    aggregate); the merge map arrives as a cross-joined 1-row CTE
    column (DuckDB 1.0 forbids subqueries inside lambdas; captured
    columns are fine). map_extract returns a LIST — empty on miss."""
    last = "list_extract(string_split(acc, ' '), -1)"
    hit = f"map_extract({mm}, {last} || ' ' || u)"
    return f"""
      list_reduce(
        string_split({seq}, ' '),
        (acc, u) -> CASE
          WHEN len({hit}) > 0
          THEN CASE
            WHEN length(acc) = length({last})
            THEN {hit}[1]
            ELSE substr(acc, 1, length(acc) - length({last})) || {hit}[1]
          END
          ELSE acc || ' ' || u END)
    """


def _bpe_sel_ctes(s: int) -> str:
    """Oracle CTEs for pass ``s``'s batch selection: c{s} ranks the
    pair counts (count desc, pair asc; top _BPE_TOPC), the RECURSIVE
    r{s} replays the greedy conflict-free scan one candidate per level
    (the SQL form of Spark's in-plan aggregate fold), b{s} is the final
    accumulator state, mm{s} the merge map."""
    conflict = "list_append(string_split(c.pair, ' '), replace(c.pair, ' ', ''))"
    accept = f"len(r.pairs) < {_BPE_BATCH} AND NOT list_has_any(r.used, {conflict})"
    return f"""
        c{s} AS MATERIALIZED (
          -- MATERIALIZED: the recursion below references c{s} once per
          -- level; inlined, DuckDB would re-run the corpus-wide pair
          -- count at every level.
          SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rn
          FROM p{s} QUALIFY rn <= {_BPE_TOPC}
        ),
        r{s}(rn, pairs, cnts, used) AS (
          SELECT 0, CAST([] AS VARCHAR[]), CAST([] AS BIGINT[]),
                 CAST([] AS VARCHAR[])
          UNION ALL
          SELECT c.rn,
                 CASE WHEN {accept}
                      THEN list_append(r.pairs, c.pair) ELSE r.pairs END,
                 CASE WHEN {accept}
                      THEN list_append(r.cnts, c.cnt) ELSE r.cnts END,
                 CASE WHEN {accept}
                      THEN list_concat(r.used, {conflict}) ELSE r.used END
          FROM r{s} r JOIN c{s} c ON c.rn = r.rn + 1
        ),
        b{s} AS (SELECT pairs, cnts FROM r{s} ORDER BY rn DESC LIMIT 1),
        mm{s} AS (
          SELECT map(pairs, list_transform(pairs, p -> replace(p, ' ', ''))) AS mm
          FROM b{s}
        )"""


def _bpe_pair_count_cte(s: int, src: str) -> str:
    return f"""
        p{s} AS (
          SELECT u AS pair, count(*) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(a)),
                          j -> a[j] || ' ' || a[j + 1])) AS u
            FROM (SELECT string_split(seq, ' ') AS a FROM {src})
          ) GROUP BY u
        )"""


def _bpe_merge_rows_select(s: int) -> str:
    """Output rows for pass ``s``: global step = (s-1)·B + in-pass
    rank. The offset is STATIC (a pass that under-fills its budget
    leaves a numbering gap — identically on both engines)."""
    off = (s - 1) * _BPE_BATCH
    return f"""
        SELECT CAST({off} + i AS INT) AS step,
               pairs[CAST(i AS INT)] AS pair,
               CAST(cnts[CAST(i AS INT)] AS BIGINT) AS cnt
        FROM b{s}, UNNEST(range(1, len(pairs) + 1)) AS t(i)"""


def _bpe_oracle() -> str:
    w0 = f"""
      SELECT array_to_string(
               list_transform(range(1, len(w) + 1), i -> w[i]), ' ') AS seq
      FROM (
        SELECT unnest(regexp_split_to_array({_CLEAN_TEXT}, ' ')) AS w
        FROM documents
      ) WHERE w <> ''
    """
    ctes = [f"w0 AS ({w0})"]
    selects = []
    for s in range(1, _BPE_PASSES + 1):
        ctes.append(_bpe_pair_count_cte(s, f"w{s - 1}"))
        ctes.append(_bpe_sel_ctes(s))
        if s < _BPE_PASSES:
            apply = _bpe_apply_merges_duck("seq", "mm")
            ctes.append(f"""
        w{s} AS (
          SELECT {apply} AS seq
          FROM w{s - 1}, mm{s}
        )""")
        selects.append(_bpe_merge_rows_select(s))
    return "WITH RECURSIVE " + ",".join(ctes) + " " + " UNION ALL ".join(selects)


@register("bpe_merges", oracle=_bpe_oracle())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, BATCHED (VERDICT r7 task 6): 8 merges
    learned in 2 corpus passes. Each pass splits every cleaned word
    occurrence into units, counts adjacent unit pairs corpus-wide ONCE,
    and greedily accepts the top-ranked (count desc, pair asc)
    conflict-free pairs up to the batch budget — a candidate is skipped
    when any of its units or its merged token collides with an earlier
    acceptance, which is exactly the condition under which the batch
    can be applied in one combined fold with sequential-equivalent
    semantics (see bpe_apply_merges_expr). Pass 2 counts the corpus as
    re-segmented by pass 1's batch, so the hash gates the whole
    batched learn→apply loop; the DuckDB twin replays the same two
    passes, with the greedy scan as a recursive CTE.

    Scale: each pass is (a) one map-only pair extraction feeding one
    partial-aggregated count keyed on the pair (vocabulary²-bounded,
    hash-uniform), (b) an in-plan batch selection — top-64 candidates
    collected into ONE bounded array, greedy scan as an aggregate fold
    (no driver round trip), and (c) one map-only unit-array fold with
    the whole batch attached as a 1-ROW-map BROADCAST. Corpus passes
    scale as merges/B instead of merges — the gap the r7 verdict named
    (production trainers add pair-delta bookkeeping on top; the
    per-pass dataflow is identical)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    wdf = _bpe_char_seqs(docs).select("seq")

    out = None
    for s in range(_BPE_PASSES):
        sel = _bpe_select_batch(_bpe_pair_counts(wdf)).localCheckpoint(
            eager=True
        )
        rows = sel.select(F.posexplode("sel").alias("i", "m")).select(
            (F.lit(s * _BPE_BATCH + 1) + F.col("i")).cast("int").alias("step"),
            F.col("m.pair").alias("pair"),
            F.col("m.cnt").alias("cnt"),
        )
        out = rows if out is None else out.unionByName(rows)
        if s < _BPE_PASSES - 1:
            wdf = _bpe_apply_batch(wdf, sel)
    return out


def _bpe_char_seqs(docs: DataFrame) -> DataFrame:
    """(doc_id, seq): one row per non-empty cleaned word occurrence, seq
    the space-joined character units — the BPE base segmentation."""
    from stonkwhisperer_spark.functions.hashing import tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp

    return (
        docs.select(
            "doc_id",
            F.explode(tokens_of(clean_text_for_nlp("text"))).alias("w"),
        )
        .filter(F.col("w") != "")
        .select(
            "doc_id",
            F.expr(
                "array_join(transform(sequence(1, length(w)), "
                "i -> substring(w, i, 1)), ' ')"
            ).alias("seq"),
        )
    )


def _bpe_pair_counts(wdf: DataFrame) -> DataFrame:
    """Corpus-wide adjacent-unit pair counts: map-only literal-index
    transform + one partial-aggregated count keyed on the pair."""
    pairs = F.expr(
        "CASE WHEN size(a) >= 2 THEN transform(sequence(1, size(a) - 1), "
        "j -> concat(element_at(a, j), ' ', element_at(a, j + 1))) "
        "ELSE array() END"
    )
    return (
        wdf.select(F.split("seq", " ").alias("a"))
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bpe_select_batch(counts: DataFrame) -> DataFrame:
    """1-row ``sel`` = array<struct<pair,cnt>>: the pass's merge batch.
    Top-_BPE_TOPC candidates by (count desc, pair asc) collect into ONE
    bounded sorted array; a greedy aggregate fold accepts up to
    _BPE_BATCH candidates whose units AND merged token are disjoint
    from everything already accepted (the conflict-free condition that
    makes the batch order-free — bpe_apply_merges_expr). All in-plan:
    the selection never leaves the executors, the result is a 1-row
    frame broadcast into the apply fold."""
    cands = counts.orderBy(F.desc("cnt"), F.asc("pair")).limit(_BPE_TOPC)
    arr = cands.agg(
        F.array_sort(
            F.collect_list(F.struct((-F.col("cnt")).alias("nc"), "pair", "cnt"))
        ).alias("c")
    )
    conflict = "array_append(split(x.pair, ' '), replace(x.pair, ' ', ''))"
    return arr.select(
        F.expr(
            f"""
            aggregate(
              c,
              struct(
                cast(array() as array<struct<pair:string,cnt:bigint>>) AS sel,
                cast(array() as array<string>) AS used),
              (acc, x) -> CASE
                WHEN size(acc.sel) < {_BPE_BATCH}
                     AND NOT arrays_overlap(acc.used, {conflict})
                THEN struct(
                  array_append(acc.sel,
                               struct(x.pair AS pair, x.cnt AS cnt)) AS sel,
                  concat(acc.used, {conflict}) AS used)
                ELSE acc END).sel AS sel
            """
        ).alias("sel")
    )


def _bpe_apply_batch(wdf: DataFrame, sel_df: DataFrame) -> DataFrame:
    """Apply a learned batch to every sequence: build the 'x y' -> 'xy'
    merge map from the 1-row selection, broadcast it, run the combined
    boundary-exact fold; any extra columns (doc_id) ride along."""
    keep = [c for c in wdf.columns if c != "seq"]
    mm = sel_df.select(
        F.expr(
            "map_from_entries(transform(sel, "
            "s -> struct(s.pair AS key, replace(s.pair, ' ', '') AS value)))"
        ).alias("mm")
    )
    return wdf.crossJoin(F.broadcast(mm)).select(
        *keep, F.expr(bpe_apply_merges_expr("seq", "mm")).alias("seq")
    )


def _bpe_encode_oracle() -> str:
    """DuckDB twin for bpe_encode: replay the 2-pass batched learn loop
    (same CTEs as _bpe_oracle, doc-keyed), apply EVERY pass's batch to
    the doc-keyed word sequences, and tokenize."""
    w0 = f"""
      SELECT doc_id, array_to_string(
               list_transform(range(1, len(w) + 1), i -> w[i]), ' ') AS seq
      FROM (
        SELECT doc_id, unnest(regexp_split_to_array({_CLEAN_TEXT}, ' ')) AS w
        FROM documents
      ) WHERE w <> ''
    """
    ctes = [f"d0 AS ({w0})"]
    for s in range(1, _BPE_PASSES + 1):
        ctes.append(_bpe_pair_count_cte(s, f"d{s - 1}"))
        ctes.append(_bpe_sel_ctes(s))
        apply = _bpe_apply_merges_duck("seq", "mm")
        ctes.append(f"""
        d{s} AS (
          SELECT doc_id, {apply} AS seq FROM d{s - 1}, mm{s}
        )""")
    body = f"""
        toks AS (
          SELECT doc_id, unnest(string_split(seq, ' ')) AS token
          FROM d{_BPE_PASSES}
        ),
        vocab AS (
          SELECT token, count(*) AS vcnt FROM toks GROUP BY token
        ),
        ids AS (
          SELECT token, CAST(row_number() OVER (
                   ORDER BY vcnt DESC, token) AS BIGINT) AS token_id
          FROM vocab
        ),
        dcnt AS (
          SELECT doc_id, token, CAST(count(*) AS BIGINT) AS cnt
          FROM toks GROUP BY doc_id, token
        ),
        ranked AS (
          SELECT doc_id, token, cnt, row_number() OVER (
                   PARTITION BY doc_id ORDER BY cnt DESC, token) AS rk
          FROM dcnt
        )
        SELECT r.doc_id, r.token, i.token_id, r.cnt
        FROM ranked r JOIN ids i USING (token)
        WHERE r.rk <= 5
    """
    return "WITH RECURSIVE " + ",".join(ctes) + "," + body


@register("bpe_encode", oracle=_bpe_encode_oracle())
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — the half a training-data pipeline actually runs:
    learn 8 merges in 2 batched corpus passes (same loop as
    bpe_merges), then tokenize every document with the learned merge
    maps and emit each doc's top-5 tokens with corpus-global token ids
    (id = rank by corpus frequency, token tie-break) and per-doc
    counts. The hash therefore gates batched-learn → apply-all →
    vocabulary-id assignment → per-doc ranking end to end.

    Scale: merge application is ONE map-only unit-array fold per PASS
    with the batch attached as a 1-ROW-map BROADCAST
    (bpe_apply_merges_expr — boundary-exact, order-free for the
    conflict-free batch). Per-doc counting and top-5 ranking
    shuffle/partition on doc_id (uniform). The vocabulary-id window is
    single-partition BY DESIGN over the VOCAB, not the corpus: |vocab|
    <= |alphabet| + #merges (bounded, here dozens), and the id table
    re-joins the doc tokens as a BROADCAST. At a production merge count
    (30k) the vocab is still megabytes — the same broadcast shape."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    wdf = _bpe_char_seqs(docs)

    for _ in range(_BPE_PASSES):
        sel = _bpe_select_batch(
            _bpe_pair_counts(wdf.select("seq"))
        ).localCheckpoint(eager=True)
        wdf = _bpe_apply_batch(wdf, sel)

    # The tokenized corpus feeds BOTH the vocabulary count and the
    # per-doc count — left lazy, the 2-pass fold sub-DAG (and its
    # 1-row batch broadcasts) would execute twice. Materialize once
    # (same pattern as semantic_dedup's assignment table; at cluster
    # scale this is the persisted tokenized corpus every training
    # pipeline writes anyway).
    toks = wdf.select(
        "doc_id", F.explode(F.split("seq", " ")).alias("token")
    ).localCheckpoint(eager=True)
    from pyspark.sql.window import Window

    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("vcnt"))
    ids = vocab.select(
        "token",
        F.row_number()
        .over(Window.orderBy(F.desc("vcnt"), F.asc("token")))
        .cast("bigint")
        .alias("token_id"),
    )
    dcnt = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("token"))
    return (
        dcnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .join(F.broadcast(ids), "token")
        .select("doc_id", "token", "token_id", "cnt")
    )


# --------------------------------------------------------------------------
# Round-8 mergeable sketches: KMV distinct-count and Count-Min frequency
# — the "compute once per shard at ingest, merge and query without
# re-reading the corpus" statistics layer a 100 TB pipeline runs next
# to dedup (vocabulary growth tracking, hot-token monitoring). Both are
# replayed bit-for-bit by the DuckDB twin through the portable hash,
# and both carry the exact answer alongside so the result is
# self-evaluating (estimate next to truth).
# --------------------------------------------------------------------------
_KMV_K = 32
_SKETCH_TOKS_SQL = f"""
      SELECT source, tok FROM (
        SELECT source,
               unnest(regexp_split_to_array({_CLEAN_TEXT}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
"""
_KMV_EST_SQL = (
    f"CASE WHEN count(*) < {_KMV_K} THEN count(*) "
    f"ELSE CAST((CAST({_KMV_K - 1} AS HUGEINT) * "
    f"CAST({1 << 60} AS HUGEINT)) // max(_h) AS BIGINT) END"
)


@register(
    "kmv_vocab_cardinality",
    oracle=f"""
    WITH toks AS ({_SKETCH_TOKS_SQL}),
    h AS (SELECT DISTINCT source, {portable_hash64_sql('tok')} AS _h FROM toks),
    rk AS (
      SELECT source, _h,
             row_number() OVER (PARTITION BY source ORDER BY _h) AS rk
      FROM h
    ),
    sk AS (SELECT source, _h FROM rk WHERE rk <= {_KMV_K}),
    mrk AS (
      SELECT '<all>' AS source, _h, row_number() OVER (ORDER BY _h) AS rk
      FROM (SELECT DISTINCT _h FROM sk)
    ),
    allsk AS (
      SELECT source, _h FROM sk
      UNION ALL SELECT source, _h FROM mrk WHERE rk <= {_KMV_K}
    ),
    est AS (
      SELECT source, count(*) AS n_mins, max(_h) AS kth_min,
             {_KMV_EST_SQL} AS est_distinct
      FROM allsk GROUP BY source
    ),
    tru AS (
      SELECT source, count(DISTINCT tok) AS true_distinct
      FROM toks GROUP BY source
      UNION ALL SELECT '<all>', count(DISTINCT tok) FROM toks
    )
    SELECT est.source, n_mins, kth_min, est_distinct, true_distinct
    FROM est JOIN tru USING (source)
    """,
)
def q_kmv_vocab_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary cardinality by KMV sketch (K=32), with the
    exact distinct count alongside, plus one '<all>' row built by
    MERGING the per-source sketches — never by re-reading the corpus.
    The merge is exact (global K minima ⊆ union of per-source K
    minima), so the '<all>' estimate is identical to a from-scratch
    global sketch; `tests/test_operators.py` pins that identity.

    Scale: the sketch pass shuffles (source, hash) once — the same
    key profile as the exact count-distinct it replaces — but its
    OUTPUT is K integers per source: persist it and every later
    cardinality question (per source, per union of sources, per
    day-range of daily sketches) is a driver-free merge over K·groups
    rows. The exact column here is the self-check, not the production
    path."""
    from stonkwhisperer_spark.functions.hashing import tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp
    from stonkwhisperer_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "source", F.explode(tokens_of(clean_text_for_nlp("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    # The corpus is read exactly TWICE: once for the sketch pass (the
    # production path — its K-rows-per-source output is eagerly
    # materialized, so merge + estimate never re-run the pass) and once
    # for the exact self-check, whose per-source and grand-total counts
    # share a single ROLLUP scan (the null grouping row IS '<all>').
    sk = kmv_sketch(toks, "source", "tok", k=_KMV_K).localCheckpoint(eager=True)
    merged = kmv_merge(sk, "source", "<all>", k=_KMV_K)
    est = kmv_estimate(sk.unionByName(merged.select("source", "_h", "_rk")), "source", k=_KMV_K)
    truth = (
        toks.rollup("source")
        .agg(F.countDistinct("tok").alias("true_distinct"))
        .select(
            F.coalesce("source", F.lit("<all>")).alias("source"), "true_distinct"
        )
    )
    return est.join(truth, "source").select(
        "source", "n_mins", "kth_min", "est_distinct", "true_distinct"
    )


from stonkwhisperer_spark.operators.sketches import (  # noqa: E402
    HLL_EST_DEN,
    HLL_EST_NUM,
)


@register(
    "hll_vocab_cardinality",
    oracle=f"""
    WITH toks AS ({_SKETCH_TOKS_SQL}),
    h AS (
      SELECT source, {portable_hash64_sql('tok')} AS _h FROM toks
    ),
    reg AS (
      SELECT source, _h % 256 AS _bkt,
             max(CASE WHEN _h // 256 = 0 THEN 53
                      ELSE 53 - length(bin(_h // 256)) END) AS _reg
      FROM h GROUP BY source, _h % 256
    ),
    allreg AS (
      SELECT source, _bkt, _reg FROM reg
      UNION ALL
      SELECT '<all>', _bkt, max(_reg) FROM reg GROUP BY _bkt
    ),
    est AS (
      SELECT source,
             CAST(256 - count(*) AS BIGINT) AS v_zero,
             CAST(sum(1::BIGINT << (53 - _reg))
                  + (256 - count(*)) * (1::BIGINT << 53) AS BIGINT) AS s_scaled
      FROM allreg GROUP BY source
    ),
    fin AS (
      SELECT source, v_zero, s_scaled,
             CAST(CAST({HLL_EST_NUM} AS HUGEINT)
                  // (CAST({HLL_EST_DEN} AS HUGEINT) * s_scaled) AS BIGINT) AS _raw
      FROM est
    ),
    tru AS (
      SELECT source, count(DISTINCT tok) AS true_distinct
      FROM toks GROUP BY source
      UNION ALL SELECT '<all>', count(DISTINCT tok) FROM toks
    )
    SELECT fin.source, v_zero, s_scaled,
           CASE WHEN v_zero > 0 AND _raw <= 640
                THEN CAST(floor(256 * ln(256.0 / v_zero) + 0.5) AS BIGINT)
                ELSE _raw END AS est_distinct,
           true_distinct
    FROM fin JOIN tru USING (source)
    """,
)
def q_hll_vocab_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary cardinality by HyperLogLog (m=256
    registers), with the exact distinct count alongside, plus one
    '<all>' row built by MERGING the per-source register tables
    (element-wise max) — never by re-reading the corpus. The merge is
    exact (max is associative), so the '<all>' estimate is identical
    to a from-scratch global sketch; pinned by pytest.

    Complements kmv_vocab_cardinality: the HLL state is a FIXED m
    integers per group (vs K minima that must be re-ranked on merge),
    so shard/day rollups are a single max-combine — the shape a 100 TB
    ingest pipeline persists per partition and folds at query time.
    All arithmetic (bucket, rank, harmonic sum, estimator) is integer-
    exact across Spark and DuckDB; the linear-counting branch is
    floor-stable (see operators/sketches.py module comment)."""
    from stonkwhisperer_spark.functions.hashing import tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp
    from stonkwhisperer_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "source", F.explode(tokens_of(clean_text_for_nlp("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    # Corpus read exactly twice: the sketch pass (production path; its
    # <=m-rows-per-source output is eagerly materialized so merge +
    # estimate never re-run it) and the exact self-check's single
    # ROLLUP scan (the null grouping row IS '<all>').
    sk = hll_sketch(toks, "source", "tok").localCheckpoint(eager=True)
    merged = hll_merge(sk, "source", "<all>")
    est = hll_estimate(sk.unionByName(merged), "source")
    truth = (
        toks.rollup("source")
        .agg(F.countDistinct("tok").alias("true_distinct"))
        .select(
            F.coalesce("source", F.lit("<all>")).alias("source"), "true_distinct"
        )
    )
    return est.join(truth, "source").select(
        "source", "v_zero", "s_scaled", "est_distinct", "true_distinct"
    )


_CMS_D = 4
_CMS_W = 1024


def _cms_bucket_sql(seed_expr: str, tok_expr: str) -> str:
    return (
        f"cast(('0x' || substr(md5(cast({seed_expr} AS varchar) || '|' || "
        f"{tok_expr}), 1, 15)) AS bigint) % {_CMS_W}"
    )


@register(
    "cms_token_topk",
    oracle=f"""
    WITH toks AS ({_SKETCH_TOKS_SQL}),
    seeds AS (SELECT unnest(range({_CMS_D})) AS seed),
    cms AS (
      SELECT seed, {_cms_bucket_sql('seed', 'tok')} AS bucket,
             count(*) AS cnt
      FROM toks CROSS JOIN seeds GROUP BY 1, 2
    ),
    tc AS (SELECT tok, count(*) AS true_cnt FROM toks GROUP BY tok),
    est AS (
      SELECT tc.tok, tc.true_cnt, min(cms.cnt) AS est_cnt
      FROM tc CROSS JOIN seeds
      JOIN cms ON cms.seed = seeds.seed
              AND cms.bucket = {_cms_bucket_sql('seeds.seed', 'tc.tok')}
      GROUP BY 1, 2
    )
    SELECT tok, est_cnt, true_cnt FROM est
    ORDER BY est_cnt DESC, tok LIMIT 20
    """,
)
def q_cms_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus tokens by Count-Min-sketch estimate (d=4 rows ×
    w=1024 buckets), true count alongside — est_cnt >= true_cnt always
    (one-sided CMS error; equality whenever no heavier token collides
    in all 4 rows). The hot-token monitor of a training-data pipeline:
    the 4·1024-integer sketch is built once per ingest shard
    (map-side partial counts, one bounded shuffle capped at d·w rows
    per mapper), merged across shards by addition, and point-queried
    via d broadcast joins that add ZERO shuffles to the probe side —
    the corpus is never re-read at query time. The exact-count column
    is the self-check, not the production path; the final top-20 is a
    TakeOrdered, not a global sort."""
    from stonkwhisperer_spark.functions.hashing import tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp
    from stonkwhisperer_spark.operators.sketches import (
        cms_point_estimates,
        cms_table,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        F.explode(tokens_of(clean_text_for_nlp("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    cms = cms_table(toks, "tok", d=_CMS_D, width=_CMS_W)
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_point_estimates(tc, "tok", cms, d=_CMS_D, width=_CMS_W)
    return (
        est.orderBy(F.desc("est_cnt"), "tok")
        .limit(20)
        .select("tok", "est_cnt", "true_cnt")
    )


# --------------------------------------------------------------------------
# kmv_shard_overlap — set OPERATIONS on KMV sketches (the theta-sketch
# pattern, Dasgupta et al. 2016): union/intersection/difference
# cardinalities between two corpus shards from their k-min sketches
# alone. inter_in_k = |U_k ∩ A_k ∩ B_k| is a Binomial(|U_k|, J) draw of
# the Jaccard similarity, so est_intersect = inter_in_k * est_union /
# |U_k| — all-integer arithmetic here, so the oracle replays the
# estimate itself bit-for-bit.
# --------------------------------------------------------------------------
_KSO_K = 64


def _kso_est_sql(src: str) -> str:
    return (
        f"CASE WHEN (SELECT count(*) FROM {src}) < {_KSO_K} "
        f"THEN (SELECT count(*) FROM {src}) "
        f"ELSE CAST((CAST({_KSO_K - 1} AS HUGEINT) * CAST({1 << 60} AS HUGEINT)) "
        f"// (SELECT max(_h) FROM {src}) AS BIGINT) END"
    )


@register(
    "kmv_shard_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT shard, tok FROM (
        SELECT CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS shard,
               unnest(regexp_split_to_array({_CLEAN_TEXT}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    h AS (SELECT DISTINCT shard, {portable_hash64_sql('tok')} AS _h FROM toks),
    rk AS (
      SELECT shard, _h,
             row_number() OVER (PARTITION BY shard ORDER BY _h) AS rk
      FROM h
    ),
    ska AS (SELECT _h FROM rk WHERE shard = 'a' AND rk <= {_KSO_K}),
    skb AS (SELECT _h FROM rk WHERE shard = 'b' AND rk <= {_KSO_K}),
    u AS (
      SELECT _h, row_number() OVER (ORDER BY _h) AS rk
      FROM (SELECT _h FROM ska UNION SELECT _h FROM skb)
    ),
    usk AS (SELECT _h FROM u WHERE rk <= {_KSO_K}),
    c AS (
      SELECT count(*) AS inter_in_k FROM usk
      WHERE _h IN (SELECT _h FROM ska) AND _h IN (SELECT _h FROM skb)
    ),
    est AS (
      SELECT (SELECT count(*) FROM ska) AS n_a,
             (SELECT count(*) FROM skb) AS n_b,
             (SELECT count(*) FROM usk) AS n_u,
             {_kso_est_sql('ska')} AS est_a,
             {_kso_est_sql('skb')} AS est_b,
             {_kso_est_sql('usk')} AS est_union,
             (SELECT inter_in_k FROM c) AS inter_in_k
    ),
    flags AS (
      SELECT tok,
             max(CASE WHEN shard = 'a' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN shard = 'b' THEN 1 ELSE 0 END) AS in_b
      FROM toks GROUP BY tok
    ),
    tru AS (
      SELECT CAST(sum(in_a) AS BIGINT)        AS true_a,
             CAST(sum(in_b) AS BIGINT)        AS true_b,
             CAST(sum(in_a * in_b) AS BIGINT) AS true_intersect,
             count(*)                         AS true_union
      FROM flags
    )
    SELECT n_a, n_b, n_u, est_a, est_b, est_union, inter_in_k,
           CAST(CAST(inter_in_k AS HUGEINT) * est_union // n_u AS BIGINT)
             AS est_intersect,
           greatest(
             est_a
               - CAST(CAST(inter_in_k AS HUGEINT) * est_union // n_u AS BIGINT),
             0
           ) AS est_diff_a,
           true_a, true_b, true_intersect, true_union
    FROM est CROSS JOIN tru
    """,
)
def q_kmv_shard_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary set operations between two corpus shards (even/odd
    doc_id) computed from their KMV sketches alone: union, intersection
    and A-only cardinality estimates next to the exact answers — the
    "how much does shard B add to shard A's vocabulary" question a
    dedup/curation planner asks before committing to a merge pass.

    Scale: each shard's sketch is K=64 integers built in one
    (shard, hash)-keyed pass (and in production persisted at ingest);
    EVERY set-operation estimate here reads only the ≤3K sketch rows —
    the corpus is never re-read, and sketches of 1000 shards compose
    the same way (union = re-rank, intersect = count shared minima in
    the union's k-min set). The exact side is the self-check, sharing
    one token-scan pass."""
    from stonkwhisperer_spark.functions.hashing import tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp
    from stonkwhisperer_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        F.when(F.col("doc_id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")).alias("shard"),
        F.explode(tokens_of(clean_text_for_nlp("text"))).alias("tok"),
    ).filter(F.col("tok") != "")
    sk = kmv_sketch(toks, "shard", "tok", k=_KSO_K).localCheckpoint(eager=True)
    u = kmv_merge(sk, "shard", "u", k=_KSO_K).localCheckpoint(eager=True)
    est = kmv_estimate(sk.unionByName(u), "shard", k=_KSO_K)
    one = lambda s, pre: (  # noqa: E731 — 1-row slice of the estimate table
        est.filter(F.col("shard") == s).select(
            F.col("n_mins").alias(f"n_{pre}"),
            F.col("est_distinct").alias(f"est_{pre}"),
        )
    )
    c = (
        u.join(sk.filter(F.col("shard") == "a").select("_h"), "_h")
        .join(sk.filter(F.col("shard") == "b").select("_h"), "_h")
        .agg(F.count("*").alias("inter_in_k"))
    )
    flags = toks.groupBy("tok").agg(
        F.max(F.when(F.col("shard") == "a", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("shard") == "b", 1).otherwise(0)).alias("in_b"),
    )
    tru = flags.agg(
        F.sum("in_a").cast("bigint").alias("true_a"),
        F.sum("in_b").cast("bigint").alias("true_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("true_intersect"),
        F.count("*").alias("true_union"),
    )
    est_inter = F.expr(
        "CAST(CAST(inter_in_k AS DECIMAL(38,0)) * est_union DIV n_u AS BIGINT)"
    )
    return (
        one("a", "a")
        .crossJoin(F.broadcast(one("b", "b")))
        .crossJoin(F.broadcast(one("u", "union").withColumnRenamed("n_union", "n_u")))
        .crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(tru))
        .select(
            "n_a", "n_b", "n_u", "est_a", "est_b", "est_union", "inter_in_k",
            est_inter.alias("est_intersect"),
            F.greatest(F.col("est_a") - est_inter, F.lit(0)).alias("est_diff_a"),
            "true_a", "true_b", "true_intersect", "true_union",
        )
    )


# --------------------------------------------------------------------------
# bm25_topk_docs — BM25 top-k retrieval over the corpus: the standard
# lexical-retrieval primitive of a training-data pipeline (eval-set
# decontamination lookups, quality-by-retrieval, nearest-document
# audits). Okapi BM25 (k1=1.2, b=0.75; Robertson & Zaragoza 2009) with
# the Lucene idf form, made hash-gateable by integer-exact fixed-point
# scoring: the ONLY floating step is one ln over an exactly-computed
# double ratio, immediately fixed-pointed; every downstream product,
# division and sum is exact integer arithmetic (DECIMAL(38,0) / HUGEINT).
# --------------------------------------------------------------------------
_BM25_SCALE = 65536  # idf fixed point = 2^16
_BM25_RANKS = (10, 14)  # query terms: per-source count-ranks 10..14
_BM25_TOPK = 10


def _bm25_ctes(docs_rel: str = "documents") -> str:
    """The WITH-body through ``scored`` (query_id, doc_id, score_s,
    n_terms) — shared by the bm25_topk_docs oracle, the RRF hybrid
    fusion oracle (queries_llm), and the forget-cascade oracle
    (``docs_rel`` swaps in the post-erasure corpus)."""
    lo, hi = _BM25_RANKS
    return f"""toks AS (
      SELECT doc_id, source, tok FROM (
        SELECT doc_id, source,
               unnest(regexp_split_to_array({_CLEAN_TEXT}, ' ')) AS tok
        FROM {docs_rel}
      ) WHERE tok <> ''
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS s
      FROM dl
    ),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    qterms AS (
      SELECT source AS query_id, tok FROM (
        SELECT source, tok,
               row_number() OVER (PARTITION BY source
                                  ORDER BY count(*) DESC, tok) AS rk
        FROM toks GROUP BY source, tok
      ) WHERE rk BETWEEN {lo} AND {hi}
    ),
    idf AS (
      SELECT tok,
             CAST(floor({_BM25_SCALE} * ln(
               CAST(2 * n_docs + 2 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE)
             ) + 0.5) AS BIGINT) AS idf_s
      FROM dfreq, stats
    ),
    contrib AS (
      SELECT q.query_id, t.doc_id,
             CAST((CAST(i.idf_s AS HUGEINT) * 44 * st.s * t.tf)
                  // (20 * CAST(st.s AS HUGEINT) * t.tf + 6 * st.s
                      + 18 * CAST(d.dl AS HUGEINT) * st.n_docs)
                  AS BIGINT) AS w
      FROM qterms q
      JOIN tf t USING (tok)
      JOIN dl d USING (doc_id)
      JOIN idf i ON i.tok = q.tok
      CROSS JOIN stats st
    ),
    scored AS (
      SELECT query_id, doc_id,
             CAST(sum(w) AS BIGINT) AS score_s,
             CAST(count(*) AS BIGINT) AS n_terms
      FROM contrib GROUP BY 1, 2
    )"""


def _bm25_oracle() -> str:
    return f"""
    WITH {_bm25_ctes()}
    SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_s, n_terms
    FROM (
      SELECT query_id, doc_id, score_s, n_terms,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_s DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {_BM25_TOPK}
    """


@register("bm25_topk_docs", oracle=_bm25_oracle())
def q_bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{k} document retrieval, one query per source (its
    count-ranks-{lo}..{hi} tokens — past the stopword head, still
    corpus-attested), scored with Okapi BM25 (k1=1.2, b=0.75, Lucene
    idf ln((N+1)/(df+0.5) ... as ln((2N+2)/(2df+1)) over exact
    integers). Integer-exact scoring discipline: idf is fixed-pointed
    at 2^16 right after the single ln; the tf normalization
    idf·(k1+1)·tf / (tf + k1(1-b) + k1·b·dl·N/S) is cross-multiplied
    by 20·S into CAST(idf_s·44·S·tf AS DECIMAL(38,0)) DIV
    (20·S·tf + 6·S + 18·dl·N) — floor division of exact integers — so
    per-doc scores are integer SUMS whose hash cannot drift with
    partial-agg order, and rank ties break on doc_id.
    tests/test_operators.py::test_bm25_idf_fixed_point_cross_engine
    sweeps the full df domain cross-engine to pin the lone ln against
    DuckDB's.

    Scale: tf/dl/df are one-pass partial aggregations over the token
    stream; query terms join the tf table through a broadcast (#queries
    × 5 rows after the idf attach); corpus stats ride a 1-row
    broadcast; the only full-volume shuffles are the (doc, tok) and
    doc-keyed aggregations every retrieval index build pays once. At
    100 TB the tf/df tables ARE the inverted index — persist them and
    per-query cost is a broadcast join against df-pruned postings."""
    from pyspark.sql.window import Window as W

    scored = bm25_scored(spark, sf_dir)
    ranked = scored.withColumn(
        "rank",
        F.row_number()
        .over(W.partitionBy("query_id").orderBy(F.desc("score_s"), "doc_id"))
        .cast("int"),
    )
    return ranked.filter(F.col("rank") <= _BM25_TOPK).select(
        "query_id", "rank", "doc_id", "score_s", "n_terms"
    )


def bm25_tf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 inverted index RELATION: one clean+tokenize corpus
    pass aggregated to (doc_id, source, tok, tf). This is the table a
    100 TB deployment persists (and maintains with bm25_index_upsert
    below); every other BM25 statistic — doc length, document
    frequency, corpus totals, per-source query terms — derives from it
    with tf-sized aggregations, so the token stream shuffles ONCE."""
    from stonkwhisperer_spark.functions.hashing import tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(tokens_of(clean_text_for_nlp("text"))).alias("tok"),
    ).filter(F.col("tok") != "")
    # source is functionally dependent on doc_id, so carrying it in
    # the grouping key costs nothing and keeps the index self-joined
    # for the per-source query-term derivation.
    return toks.groupBy("doc_id", "source", "tok").agg(F.count("*").alias("tf"))


def bm25_score_index(tf: DataFrame) -> DataFrame:
    """Okapi BM25 scoring from an inverted-index relation
    (doc_id, source, tok, tf) — the chain bm25_scored ran through
    round 10, factored so an INCREMENTALLY MAINTAINED index (the txlog
    MERGE path, bm25_index_upsert) scores through the byte-identical
    code as a from-scratch build. All derived statistics are integer
    aggregations of ``tf``; every shuffle input after the index itself
    is tf-sized or smaller."""
    from pyspark.sql.window import Window as W

    lo, hi = _BM25_RANKS
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("s"),
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    qterms = (
        tf.groupBy("source", "tok")
        .agg(F.sum("tf").alias("c"))
        .withColumn(
            "rk", F.row_number().over(W.partitionBy("source").orderBy(F.desc("c"), "tok"))
        )
        .filter(F.col("rk").between(lo, hi))
        .select(F.col("source").alias("query_id"), "tok")
    )
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.floor(
            _BM25_SCALE
            * F.log(
                (2 * F.col("n_docs") + 2).cast("double")
                / (2 * F.col("df") + 1).cast("double")
            )
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("idf_s"),
    )
    # Tiny side first: query terms pick up their idf, then broadcast
    # into the tf table (the only full-volume join input).
    q_idf = qterms.join(idf, "tok").select("query_id", "tok", "idf_s")
    contrib = (
        tf.join(F.broadcast(q_idf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                "CAST((CAST(idf_s AS DECIMAL(38,0)) * 44 * s * tf) DIV "
                "(CAST(20 AS DECIMAL(38,0)) * s * tf + CAST(6 AS DECIMAL(38,0)) * s "
                "+ CAST(18 AS DECIMAL(38,0)) * dl * n_docs) AS BIGINT)"
            ).alias("w"),
        )
    )
    return contrib.groupBy("query_id", "doc_id").agg(
        F.sum("w").cast("bigint").alias("score_s"),
        F.count("*").cast("bigint").alias("n_terms"),
    )


_BM25_TOPK_SCHEMA = (
    "query_id string, rank int, doc_id bigint, score_s bigint, n_terms bigint"
)


def bm25_topk_rows(index: DataFrame) -> list:
    """Shared scoring tail of the BM25 index-lifecycle queries
    (upsert / forget / stream-upsert / forget-vacuum): score the
    maintained (doc_id, source, tok, tf) relation through
    :func:`bm25_score_index`, rank per query (ties on doc_id), cut to
    ``_BM25_TOPK`` and bounded-collect — ONE definition so the ranking
    tie-break, cap, and output schema (``_BM25_TOPK_SCHEMA``) cannot
    drift between the four queries sharing the ``_bm25_oracle``
    contract."""
    from pyspark.sql.window import Window as W

    ranked = bm25_score_index(index).withColumn(
        "rank",
        F.row_number()
        .over(W.partitionBy("query_id").orderBy(F.desc("score_s"), "doc_id"))
        .cast("int"),
    )
    return bounded_collect(
        ranked.filter(F.col("rank") <= _BM25_TOPK).select(
            "query_id", "rank", "doc_id", "score_s", "n_terms"
        ),
        1_000,
        "top-k scored postings",
    )


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 ``scored`` relation (query_id, doc_id, score_s,
    n_terms) from a from-scratch index build — shared by
    bm25_topk_docs and the RRF hybrid fusion (queries_llm).

    The tf index is eagerly localCheckpointed before scoring: Catalyst
    legally collapses the ``dl`` agg-of-agg (sum of tf per doc ==
    row count per doc) into a direct count over the tokenize, which
    prunes ``source`` out of that branch's scan — a non-identical
    subtree that re-tokenizes the corpus instead of reusing the tf
    exchange (docs/audit_scans.py catches exactly this). Checkpointing
    pins ONE tokenize pass for all five statistics, which is also the
    honest local stand-in for the deployment shape: at 100 TB the tf
    table is persisted state (bm25_index_upsert), never recomputed
    per query."""
    return bm25_score_index(
        bm25_tf_index(spark, sf_dir).localCheckpoint(eager=True)
    )


# --------------------------------------------------------------------------
# bm25_index_upsert — retrieval-index MAINTENANCE (VERDICT r10 task 5):
# the tf table IS the inverted index, so at 100 TB it is persisted and
# maintained with keyed MERGEs, never rebuilt. This query drives that
# loop end to end — stale draft postings for revised docs are UPDATED,
# new docs' postings INSERTED, through the txlog MERGE path — then
# scores BM25 from the maintained table. The oracle replays the
# from-scratch FULL-corpus build, so the value hash gates the claim
# that incremental maintenance and a batch rebuild are
# indistinguishable to retrieval.
# --------------------------------------------------------------------------
@register("bm25_index_upsert", oracle=_bm25_oracle())
def q_bm25_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental BM25 inverted-index maintenance: the base corpus
    (doc_id % 4 != 0) commits its (doc_id, source, tok, tf) postings to
    a txlog table, together with STALE single-occurrence draft postings
    for half the incoming batch (doc_id % 8 == 0 — a prior partial
    ingest of since-revised docs); the incoming batch (doc_id % 4 == 0)
    then MERGEs its true postings keyed on (doc_id, tok) — drafts take
    the update arm, unseen docs (doc_id % 8 == 4) the insert arm, and
    both arms are asserted non-empty so the exercise can't silently
    degrade. Scoring runs the SAME bm25_score_index chain as the
    from-scratch build over the maintained table; the oracle is the
    from-scratch full-corpus rebuild, so the hash pins incremental ==
    rebuild (the incremental_dedup discipline applied to retrieval).

    Scale: per-ingest cost is O(batch postings) — a keyed MERGE
    rewrites only files containing revised doc keys (file-level
    copy-on-write + zone-map pruning) — while every derived statistic
    (dl, df, corpus totals, query terms) is a tf-sized aggregation;
    the corpus token stream is never re-scanned. Draft keys for a doc
    are a subset of its true keys (same tokenizer), so revision never
    strands a stale posting; a tokenizer change would instead use the
    delete+insert replace path (txlog_replace_where)."""
    import shutil

    from stonkwhisperer_spark.session import scratch_dir
    from stonkwhisperer_spark.sinks.writers import (
        merge_append,
        merge_upsert,
        read_committed,
    )

    tf_all = bm25_tf_index(spark, sf_dir).localCheckpoint(eager=True)
    base_tf = tf_all.filter(F.col("doc_id") % 4 != 0)
    batch_tf = tf_all.filter(F.col("doc_id") % 4 == 0)
    drafts = batch_tf.filter(F.col("doc_id") % 8 == 0).withColumn(
        "tf", F.lit(1).cast("bigint")
    )
    scratch = scratch_dir("stonkw_bm25_idx_")
    try:
        target = f"{scratch}/tf"
        merge_append(
            spark, target, base_tf.unionByName(drafts), ["doc_id", "tok"]
        )
        inserted, updated = merge_upsert(spark, target, batch_tf, ["doc_id", "tok"])
        if inserted == 0 or updated == 0:
            raise AssertionError(
                f"MERGE arms not both exercised: inserted={inserted}, "
                f"updated={updated}"
            )
        rows = bm25_topk_rows(
            read_committed(spark, target).select("doc_id", "source", "tok", "tf")
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, _BM25_TOPK_SCHEMA)


# --------------------------------------------------------------------------
# bm25_index_stream_upsert — the STREAMING arm of retrieval-index
# maintenance (VERDICT r12 task 3): at 100 TB the inverted index is
# maintained from a continuous document stream, not nightly batches.
# Same gate as bm25_index_upsert — the drained index must hash-equal a
# from-scratch rebuild — with the ingest leg replaced by a real
# Structured Streaming drain: file-source micro-batches through a
# foreachBatch exactly-once MERGE (merge_upsert_txn keyed on the
# checkpoint epoch), then the whole stream replayed over a fresh
# checkpoint to prove the txn ledger makes it a structural no-op.
# --------------------------------------------------------------------------
@register("bm25_index_stream_upsert", oracle=_bm25_oracle())
def q_bm25_index_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING BM25 inverted-index maintenance: the base corpus
    (doc_id % 4 != 0) plus stale single-occurrence drafts for half the
    incoming docs (doc_id % 8 == 0) commit to a txlog table exactly as
    in bm25_index_upsert; the incoming batch's true postings
    (doc_id % 4 == 0) then arrive as a rate-limited landing-zone STREAM
    (file source, ``maxFilesPerTrigger=1`` over a 4-file drop, drained
    under ``Trigger.AvailableNow``) and MERGE into the index per
    micro-batch via ``merge_upsert_txn`` — the Delta ``foreachBatch +
    txnVersion`` streaming-upsert pattern, (app, epoch) keyed so a
    micro-batch replayed after checkpoint recovery cannot double-apply.
    The drain is asserted to have split the ingest across ≥2
    micro-batches (so the streaming path is genuinely exercised, not a
    single batch in disguise) with both MERGE arms non-empty
    cumulatively; then the WHOLE stream re-runs over a fresh checkpoint
    and must be a structural no-op — zero rows inserted or updated and
    the committed version unmoved — because the deterministic file
    order realigns the epoch numbering with the ledger's markers
    (key-level idempotence alone could not guarantee this: a replayed
    old batch would rewrite rows a later batch already updated).
    Scoring runs the same bm25_score_index chain over the maintained
    table; the oracle is the from-scratch full-corpus rebuild, so the
    hash pins streamed-ingest == rebuild (reference contract being
    generalized: loading.py:150-161's incremental-vs-all-history merge
    under continuous arrival, SURVEY §2.9).

    Scale: per-micro-batch cost is O(batch postings) — the same keyed
    copy-on-write MERGE as the batch path, now priced per poll
    interval; checkpoint + ledger give exactly-once table contents
    end-to-end. The derived statistics need no streaming state because
    they are tf-sized aggregations AT READ TIME of the maintained
    relation — maintaining them would be premature; the index is the
    state."""
    import shutil

    from stonkwhisperer_spark.session import scratch_dir
    from stonkwhisperer_spark.sinks.writers import merge_append, read_committed
    from stonkwhisperer_spark.streaming.jobs import run_txn_merge_ingest

    tf_all = bm25_tf_index(spark, sf_dir).localCheckpoint(eager=True)
    base_tf = tf_all.filter(F.col("doc_id") % 4 != 0)
    batch_tf = tf_all.filter(F.col("doc_id") % 4 == 0)
    drafts = batch_tf.filter(F.col("doc_id") % 8 == 0).withColumn(
        "tf", F.lit(1).cast("bigint")
    )
    scratch = scratch_dir("stonkw_bm25_stream_idx_")
    try:
        target = f"{scratch}/tf"
        # Base corpus and stale drafts land as SEPARATE commits (the
        # realistic history: the drafts were an earlier partial ingest)
        # — so the drafts' postings live in their own files and each
        # micro-batch's matched-file discovery rewrites only those,
        # never the base corpus files (none of whose doc_ids can match
        # a batch key). Fusing them into one commit would spread draft
        # rows across every file and turn each micro-batch MERGE into a
        # full-table rewrite — the exact amplification key-clustered
        # layouts (Z-order on the merge key) exist to avoid.
        merge_append(spark, target, base_tf, ["doc_id", "tok"])
        merge_append(spark, target, drafts, ["doc_id", "tok"])
        # The ingest stream's landing drop: 4 round-robin files, each a
        # disjoint slice of the batch postings (every (doc_id, tok) key
        # appears in exactly one file, so any file-to-micro-batch
        # assignment yields the same final MERGE state).
        landing = f"{scratch}/landing"
        batch_tf.repartition(4).write.parquet(landing)
        run_txn_merge_ingest(
            spark,
            landing,
            batch_tf.schema,
            target,
            ["doc_id", "tok"],
            "bm25_stream_ingest",
            scratch,
        )
        rows = bm25_topk_rows(
            read_committed(spark, target).select("doc_id", "source", "tok", "tf")
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, _BM25_TOPK_SCHEMA)


# --------------------------------------------------------------------------
# bm25_index_forget — the DELETE arm of retrieval-index maintenance
# (rounds 11-12 covered insert + update): right-to-be-forgotten erasure
# cascaded into the persisted inverted index, first as a merge-on-read
# deletion-vector mask (rows vanish at commit, no data file touched),
# then physically purged by compaction — with scoring hash-gated
# against a from-scratch build over the post-erasure corpus at BOTH
# stages.
# --------------------------------------------------------------------------
@register(
    "bm25_index_forget",
    oracle=f"""
    WITH kept AS (SELECT * FROM documents WHERE doc_id % 10 <> 3),
    {_bm25_ctes("kept")}
    SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_s, n_terms
    FROM (
      SELECT query_id, doc_id, score_s, n_terms,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_s DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {_BM25_TOPK}
    """,
)
def q_bm25_index_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forget-cascade on the maintained BM25 index: the full corpus tf
    index commits to a txlog table, then erasure requests (doc_id % 10
    == 3) are deleted with a merge-on-read DELETION VECTOR — O(matched
    rows), no data file rewritten — and scoring through the identical
    bm25_score_index chain must already hash-equal a from-scratch
    build over the post-erasure corpus (every derived statistic — dl,
    df, corpus totals, per-source query terms — must forget the docs
    too, which falls out of deriving them all from the tf relation).
    A compaction then physically purges the masked rows (rewrites read
    the DV-filtered view and drop the file's DV entries — the GDPR
    erasure contract: mask at commit, purge at the next rewrite), and
    the re-scored top-k is asserted identical to the masked-read
    scores.

    Scale: erasing K docs from a 100 TB index costs O(K·tokens) DV
    writes at request time plus the file-local purge amortized into
    routine compaction; the corpus is never re-tokenized and unrelated
    index files are never touched. The oracle replays the full
    from-scratch rebuild on the kept corpus, so the hash pins
    post-delete-maintained == rebuilt-without-the-docs."""
    import shutil

    from stonkwhisperer_spark.session import scratch_dir
    from stonkwhisperer_spark.sinks.writers import (
        compact,
        delete_where_dv,
        merge_append,
        read_committed,
    )

    scratch = scratch_dir("stonkw_bm25_forget_")
    try:
        target = f"{scratch}/tf"
        merge_append(spark, target, bm25_tf_index(spark, sf_dir), ["doc_id", "tok"])
        n_del = delete_where_dv(spark, target, F.col("doc_id") % 10 == 3)
        if n_del == 0:
            raise AssertionError("forget set empty — nothing erased")

        sel = ("doc_id", "source", "tok", "tf")
        rows = bm25_topk_rows(read_committed(spark, target).select(*sel))
        # Physical purge: compaction reads the DV-filtered view and
        # drops the masked files' DV entries with the files.
        # min_files=1: a purge-motivated compaction must rewrite even a
        # single-file table (the default 2 targets small-file merging
        # and would skip it, silently leaving the DVs in place).
        if compact(spark, target, min_files=1) == 0:
            raise AssertionError("purge compaction rewrote nothing")
        purged = bm25_topk_rows(read_committed(spark, target).select(*sel))
        if sorted(map(tuple, rows)) != sorted(map(tuple, purged)):
            raise AssertionError("physical purge changed the scored result")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, _BM25_TOPK_SCHEMA)


# --------------------------------------------------------------------------
# bm25_forget_vacuum — RETENTION completes the erasure story (VERDICT
# r12 task 4): bm25_index_forget proves mask-then-purge; this query
# composes the forget cascade with zero-retention VACUUM and gates the
# part auditors actually check — after vacuum, the pre-erasure
# snapshot is UNREADABLE and its data files are physically gone, while
# the current read still hash-equals the kept-corpus rebuild.
# --------------------------------------------------------------------------
@register(
    "bm25_forget_vacuum",
    oracle=f"""
    WITH kept AS (SELECT * FROM documents WHERE doc_id % 10 <> 3),
    {_bm25_ctes("kept")}
    SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_s, n_terms
    FROM (
      SELECT query_id, doc_id, score_s, n_terms,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_s DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {_BM25_TOPK}
    """,
)
def q_bm25_forget_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten END STATE on the maintained BM25 index:
    the full-corpus tf index commits, erasure requests (doc_id % 10 ==
    3) are DV-masked, a ``min_files=1`` compaction physically purges
    the masked rows, and then zero-retention VACUUM reclaims every
    file the compaction replaced. Three invariants close the GDPR
    cascade beyond bm25_index_forget's mask+purge:

    1. every pre-erasure data file — each one potentially holding the
       forgotten docs' postings — is in vacuum's reclaimed set and no
       longer exists on disk (physical erasure, not just masking);
    2. time travel to the pre-erasure version now FAILS with the
       retention-horizon error (the old snapshot is not merely
       expensive to read — it is contractually unreadable: the
       ratcheted ``vacuum.cutoff`` makes readers refuse it up front
       rather than surface a FileNotFound mid-scan);
    3. the current read, scored through the identical bm25_score_index
       chain, still hash-equals the from-scratch rebuild on the kept
       corpus (the oracle) — erasure cost nothing in fidelity.

    Scale: the erasure pipeline is O(matched) DV writes + a file-local
    purge amortized into routine compaction + O(#commits + #reclaimed)
    driver-side vacuum — no step scans the corpus; on a 100 TB table
    the retention window (Delta's ``VACUUM RETAIN n HOURS``) trades
    time-travel depth against how long forgotten bytes persist, and
    the compliance deadline picks n."""
    import os
    import shutil

    from stonkwhisperer_spark.session import scratch_dir
    from stonkwhisperer_spark.sinks.writers import (
        _committed_version,
        committed_files,
        compact,
        delete_where_dv,
        merge_append,
        read_committed,
        vacuum,
    )

    scratch = scratch_dir("stonkw_bm25_vacuum_")
    try:
        target = f"{scratch}/tf"
        merge_append(spark, target, bm25_tf_index(spark, sf_dir), ["doc_id", "tok"])
        v_pre = _committed_version(target)
        files_pre = set(committed_files(target))
        n_del = delete_where_dv(spark, target, F.col("doc_id") % 10 == 3)
        if n_del == 0:
            raise AssertionError("forget set empty — nothing erased")
        if compact(spark, target, min_files=1) == 0:
            raise AssertionError("purge compaction rewrote nothing")
        carried = files_pre & set(committed_files(target))
        if carried:
            raise AssertionError(
                f"purge compaction carried {len(carried)} pre-erasure "
                "file(s) into the current snapshot — they may hold "
                "forgotten rows and would survive vacuum"
            )
        removed = set(
            vacuum(target, retain_versions=0, unsafe_zero_retention=True)
        )
        if not files_pre <= removed:
            raise AssertionError(
                f"vacuum left pre-erasure files behind: "
                f"{sorted(files_pre - removed)[:5]}"
            )
        still = [
            f for f in files_pre if os.path.exists(os.path.join(target, f))
        ]
        if still:
            raise AssertionError(f"reclaimed files still on disk: {still[:5]}")
        try:
            read_committed(spark, target, version=v_pre)
        except ValueError as e:
            if "retention horizon" not in str(e):
                raise
        else:
            raise AssertionError(
                "time travel to the pre-erasure version still succeeds "
                "after zero-retention vacuum"
            )
        rows = bm25_topk_rows(
            read_committed(spark, target).select("doc_id", "source", "tok", "tf")
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, _BM25_TOPK_SCHEMA)


# --------------------------------------------------------------------------
# lm_perplexity_scores — the REAL CCNet-style perplexity quality filter:
# an add-V-smoothed bigram LM trained on the corpus scores every
# document's average negative log-likelihood, in fixed point so the
# log-prob SUM is exact and hash-gateable (bigram_familiarity is the
# count-only proxy that predates this recipe).
# --------------------------------------------------------------------------
_LM_SCALE = 65536  # nll fixed point = 2^16 (same recipe as bm25 idf)


def _lm_perplexity_oracle() -> str:
    toks_arr = f"regexp_split_to_array({_CLEAN_TEXT}, ' ')"
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(d.arr) AS tok,
             generate_subscripts(d.arr, 1) AS i
      FROM (SELECT doc_id, {toks_arr} AS arr FROM documents) d
    ),
    bg AS (
      SELECT a.doc_id, a.tok AS w1, b.tok AS w2
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      WHERE a.tok <> '' AND b.tok <> ''
    ),
    stats AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      FROM toks WHERE tok <> ''
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
    nll_tab AS (
      SELECT w1, w2,
             CAST(floor({_LM_SCALE} * ln(
               CAST(c1.c1 + st.v AS DOUBLE) / CAST(c12.c12 + 1 AS DOUBLE)
             ) + 0.5) AS BIGINT) AS nll
      FROM c12 JOIN c1 USING (w1) CROSS JOIN stats st
    ),
    costed AS (
      SELECT bg.doc_id, nll FROM bg JOIN nll_tab USING (w1, w2)
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(nll) AS BIGINT) AS nll_scaled
      FROM costed GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, nll_scaled,
           CAST(nll_scaled // n_bigrams AS BIGINT) AS avg_nll_scaled,
           (nll_scaled // n_bigrams)
             < CAST(floor({_LM_SCALE} * ln(CAST(st.v AS DOUBLE)) + 0.5)
                    AS BIGINT) AS keep
    FROM per_doc CROSS JOIN stats st
    """


@register("lm_perplexity_scores", oracle=_lm_perplexity_oracle())
def q_lm_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity quality filtering (the CCNet recipe: score text by a
    reference LM, keep the low-perplexity head): an add-V-smoothed
    bigram LM is trained on the corpus itself (c(w1,w2) / c(w1) count
    tables — the 'training' of a count LM IS two aggregations), then
    every document is scored by its total and average negative
    log-likelihood. Fixed-point discipline (the bm25 recipe): each
    bigram's nll = floor(2^16 · ln((c1+V)/(c12+1)) + 0.5) — one ln per
    DISTINCT realized (c1, c12) pair over an exactly-computed double
    ratio — and the per-doc score is an exact INTEGER sum, immune to
    partial-agg order, so the entire LM scoring pipeline hash-matches
    the DuckDB twin (bigram_familiarity's docstring predates this
    recipe; a double log-prob sum indeed cannot hash-match, a
    fixed-point one can). ``keep`` applies the principled threshold
    avg-nll < ln(V): keep documents the corpus LM finds more
    predictable than uniform-over-vocabulary noise.

    Scale: the count tables are vocabulary²-bounded aggregations of
    the bigram stream (two hash-uniform shuffles); scoring joins the
    doc bigram stream against them (vocab-sized build sides) with the
    1-row V stats broadcast; per-doc reduction is one exact integer
    partial-agg. No collect, no UDF, codegen end to end."""
    from pyspark.sql.window import Window

    from stonkwhisperer_spark.functions.hashing import tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    tok_rows = docs.select(
        "doc_id",
        F.posexplode(tokens_of(clean_text_for_nlp("text"))).alias("i", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    bg = (
        tok_rows.withColumn("w2", F.lead("tok").over(w))
        .filter(
            F.col("w2").isNotNull() & (F.col("tok") != "") & (F.col("w2") != "")
        )
        .select("doc_id", F.col("tok").alias("w1"), "w2")
    )
    stats = (
        tok_rows.filter(F.col("tok") != "")
        .agg(F.countDistinct("tok").cast("bigint").alias("v"))
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    # The transcendental runs on the vocab²-bounded COUNT table (one ln
    # per distinct (w1, w2)); the corpus-sized bigram stream then joins
    # the precomputed integer — never the double expression.
    nll_tab = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(stats))
        .select(
            "w1",
            "w2",
            F.floor(
                _LM_SCALE
                * F.log(
                    (F.col("c1") + F.col("v")).cast("double")
                    / (F.col("c12") + 1).cast("double")
                )
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("nll"),
        )
    )
    costed = bg.join(nll_tab, ["w1", "w2"]).select("doc_id", "nll")
    per_doc = costed.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("nll").cast("bigint").alias("nll_scaled"),
    )
    thr = F.floor(
        _LM_SCALE * F.log(F.col("v").cast("double")) + F.lit(0.5)
    ).cast("bigint")
    return per_doc.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "n_bigrams",
        "nll_scaled",
        F.expr("CAST(nll_scaled DIV n_bigrams AS BIGINT)").alias("avg_nll_scaled"),
        (F.expr("nll_scaled DIV n_bigrams") < thr).alias("keep"),
    )
