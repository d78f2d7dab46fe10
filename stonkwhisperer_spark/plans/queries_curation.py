"""Training-data curation queries beyond dedup: benchmark-contamination
detection (train↔eval n-gram overlap) and PII scrubbing — two operators
every large-scale LLM data pipeline runs between raw ingest and
tokenization. Both are oracle-gated: the hash/shingle plumbing reuses
the portable md5 stack from queries_llm, and the regex semantics are
written in the common Java-regex/RE2 subset so Spark and DuckDB agree
byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.functions.hashing import portable_hash64_sql
from stonkwhisperer_spark.functions.text import bpe_token_count_sql
from stonkwhisperer_spark.plans.queries_llm import _POSTINGS_SQL, _postings
from stonkwhisperer_spark.plans.queries_text import _CLEAN_TEXT
from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table, spread

# --------------------------------------------------------------------------
# Benchmark contamination: which training documents share enough 3-token
# shingles with a held-out eval set to contaminate it.
# --------------------------------------------------------------------------
_MAX_SHINGLE_DF = 100  # drop stopword-like shingles: caps the hot keys
_MIN_SHARED = 5


@register(
    "benchmark_contamination",
    oracle=f"""
    WITH p AS ({_POSTINGS_SQL}),
    freq AS (
      SELECT shingle, count(DISTINCT doc_id) AS df FROM p GROUP BY shingle
    ),
    keep AS (SELECT shingle FROM freq WHERE df <= {_MAX_SHINGLE_DF}),
    tr AS (
      SELECT DISTINCT doc_id, shingle FROM p JOIN keep USING (shingle)
      WHERE doc_id % 10 != 0
    ),
    ev AS (
      SELECT DISTINCT doc_id, shingle FROM p JOIN keep USING (shingle)
      WHERE doc_id % 10 = 0
    )
    SELECT tr.doc_id AS train_doc, ev.doc_id AS eval_doc,
           count(*) AS n_shared
    FROM tr JOIN ev USING (shingle)
    GROUP BY tr.doc_id, ev.doc_id
    HAVING count(*) >= {_MIN_SHARED}
    """,
)
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination scan: (train, eval) document pairs that
    share >= 5 distinct 3-token shingles, where eval = every 10th
    doc_id (the deterministic stand-in for a benchmark set). Inverted-
    index join on the shingle — never train×eval all-pairs — with a
    document-frequency cap that drops stopword-like shingles BEFORE the
    join, bounding the hottest key to 100 postings.

    Scale: two shuffles (doc-freq agg, pair agg). The eval side of a
    real contamination scan is tiny (benchmarks are ~1e4 docs), so at
    100 TB the eval postings broadcast and the train side streams
    map-side; the df cap is what keeps the shingle join from a hot-key
    blowup either way."""
    p = _postings(spark, sf_dir).distinct()
    keep = (
        p.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= _MAX_SHINGLE_DF)
        .select("shingle")
    )
    kept = p.join(keep, "shingle")
    train = kept.filter(F.col("doc_id") % 10 != 0).withColumnRenamed(
        "doc_id", "train_doc"
    )
    ev = kept.filter(F.col("doc_id") % 10 == 0).withColumnRenamed("doc_id", "eval_doc")
    return (
        train.join(ev, "shingle")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
    )


# --------------------------------------------------------------------------
# PII scrub: regex redaction of emails / phone numbers, with counts.
# --------------------------------------------------------------------------
# Patterns stay in the Java-regex ∩ RE2 common subset (no backrefs, no
# lookaround) so Spark (java.util.regex) and DuckDB (RE2) match the
# exact same spans.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@register(
    "pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 != 0
                     THEN ' contact user' || doc_id || '@mail.example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 4 != 0
                     THEN ' call +1-555-'
                          || lpad(cast(doc_id % 10000 AS varchar), 4, '0')
                     ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g') AS text_scrubbed,
           len(regexp_extract_all(t, '{_EMAIL_RE}'))
             + len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_redactions
    FROM aug
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: replace email addresses and phone numbers
    with typed placeholders and count the redactions per document. The
    synthetic corpus carries no PII, so deterministic PII is woven in
    first (doc_id-derived email on 2/3 of docs, phone on 3/4 — both
    engines derive the same strings), making the scrub genuinely
    exercised: redaction counts range 0–2 and the scrubbed text is
    checked byte-for-byte.

    Scale: map-only whole-stage-codegen pass (regexp_replace /
    regexp_count are JVM expressions, no Python) — the shape survives
    any corpus size; regex cost is linear per byte scanned."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 != 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@mail.example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 != 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(aug, F.lit(_EMAIL_RE), F.lit("[EMAIL]")),
            F.lit(_PHONE_RE),
            F.lit("[PHONE]"),
        ).alias("text_scrubbed"),
        (
            F.regexp_count(aug, F.lit(_EMAIL_RE))
            + F.regexp_count(aug, F.lit(_PHONE_RE))
        )
        .cast("bigint")
        .alias("n_redactions"),
    )


# --------------------------------------------------------------------------
# DSIR-shaped importance resampling: select raw documents that look like a
# target distribution using hashed n-gram bucket statistics (Xie et al.
# 2023, "Data Selection for Language Models via Importance Resampling").
# --------------------------------------------------------------------------
_DSIR_BUCKETS = 4096
_DSIR_SEED = 4242
_DSIR_SCALE = 1_000_000


def _dsir_oracle() -> str:
    from stonkwhisperer_spark.functions.hashing import portable_hash64_sql
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp_sql

    clean = clean_text_for_nlp_sql("text")
    bucket = f"{portable_hash64_sql('tok', seed=_DSIR_SEED)} % {_DSIR_BUCKETS}"
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(regexp_split_to_array({clean}, ' ')) AS tok
      FROM documents
    ),
    tt AS (
      SELECT doc_id, lang, {bucket} AS bucket FROM toks WHERE tok <> ''
    ),
    tgt AS (
      SELECT bucket, count(*) AS c_t FROM tt WHERE lang = 'en' GROUP BY bucket
    ),
    rawd AS (SELECT bucket, count(*) AS c_r FROM tt GROUP BY bucket),
    aff AS (
      SELECT r.bucket,
             ((COALESCE(t.c_t, 0) + 1) * {_DSIR_SCALE})
               // (COALESCE(t.c_t, 0) + r.c_r + 2) AS a_q
      FROM rawd r LEFT JOIN tgt t USING (bucket)
    )
    SELECT tt.doc_id,
           tt.lang,
           count(*) AS n_toks,
           CAST(sum(a_q) AS BIGINT) AS score_q,
           (2 * sum(a_q) >= CAST({_DSIR_SCALE} AS BIGINT) * count(*)) AS keep
    FROM tt JOIN aff USING (bucket)
    GROUP BY tt.doc_id, tt.lang
    """


@register("dsir_sample", oracle=_dsir_oracle())
def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shaped data selection: score every raw document by how much
    its hashed-unigram bucket profile matches a target distribution
    (here: the corpus's English documents standing in for the "looks
    like Wikipedia" target), then keep the docs whose mean bucket
    affinity clears 0.5. Per DSIR, features are token hashes into
    ``_DSIR_BUCKETS`` buckets; unlike the paper's float log-likelihood
    ratio, the per-bucket statistic is the INTEGER-EXACT smoothed
    target share ``(c_t+1)*1e6 DIV (c_t+c_r+2)`` — monotone in the
    likelihood ratio, and its per-doc sum is order-free so two engines
    hash-match (a float log-sum cannot; see bigram_familiarity for the
    same convention). On a cluster with no cross-engine oracle the
    float log-ratio drops in unchanged.

    Scale: two corpus passes. Pass 1 builds the bucket table — a
    map-side-combinable count keyed on 4096 buckets, shuffling only
    #buckets×#tasks partials. Pass 2 re-streams tokens and joins the
    BROADCAST affinity table (4096 rows), then aggregates per doc_id —
    hash-uniform, no hot keys, no UDF, codegen end to end. This is the
    shape DSIR runs at: the Pile-sized raw pool is never materialized,
    only streamed twice."""
    from stonkwhisperer_spark.functions.hashing import portable_hash64, tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(tokens_of(clean_text_for_nlp("text"))).alias("tok"),
    ).filter(F.col("tok") != "")
    bucketed = toks.select(
        "doc_id",
        "lang",
        (portable_hash64("tok", seed=_DSIR_SEED) % _DSIR_BUCKETS).alias("bucket"),
    )
    # Target and raw bucket counts in ONE conditional aggregation —
    # separate tgt/raw frames each re-ran the tokenize (per-branch
    # pruning splits the scans: docs/audit_scans.py), tripling the
    # documented two corpus passes. The conditional sum is exactly the
    # left-join-coalesce: every raw bucket is present, c_t = 0 where
    # no English tokens hashed into it.
    aff = (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("c_r"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c_t"),
        )
        .select(
            "bucket",
            F.expr(
                f"((c_t + 1) * {_DSIR_SCALE}) DIV (c_t + c_r + 2)"
            ).alias("a_q"),
        )
    )
    return (
        bucketed.join(F.broadcast(aff), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("a_q").alias("score_q"),
            (
                2 * F.sum("a_q")
                >= F.lit(_DSIR_SCALE).cast("bigint") * F.count(F.lit(1))
            ).alias("keep"),
        )
    )


# --------------------------------------------------------------------------
# Weighted priority sampling (Duffield–Lund–Thorup): token-proportional
# corpus subsampling with a fully INTEGER priority, so both engines
# rank bit-identically. A-ES (u^(1/w)) needs pow/ln — not correctly
# rounded, so the k-th boundary can differ across engines; priority
# sampling's w/u ranking survives an integer reformulation:
# (w << 31) DIV h with h = hash%2^31+1 is the same order as w/u for
# u = h/2^31, computed exactly in int64 on both sides.
# --------------------------------------------------------------------------
_PSAMP_K = 500
_PSAMP_M = 2147483648  # 2^31


@register(
    "priority_sample",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             greatest({bpe_token_count_sql("text")}, 1) AS n_tokens,
             ({portable_hash64_sql("'psamp|' || cast(doc_id AS varchar)")}
              % {_PSAMP_M}) + 1 AS h
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST((n_tokens * {_PSAMP_M}) // h AS BIGINT) AS priority
    FROM sized
    ORDER BY priority DESC, doc_id
    LIMIT {_PSAMP_K}
    """,
)
def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-proportional weighted sample of the corpus, k=500, by
    Duffield–Lund–Thorup priority sampling: each doc draws a
    deterministic uniform u = (hash(doc_id) mod 2³¹ + 1)/2³¹ and the k
    largest priorities w/u win — longer documents proportionally more
    likely, the standard weighted-subsample for token-budgeted training
    mixes. The priority is computed as (w·2³¹) DIV h, pure int64, so
    the ranking (and therefore WHICH docs survive the k boundary) is
    bit-identical in Spark and DuckDB — pow/ln-based A-ES cannot make
    that guarantee. Ties break on doc_id.

    Scale: weight + priority are map-only codegen over the scan;
    `orderBy(...).limit(k)` plans as TakeOrderedAndProject — per-
    partition partial top-k, a k-row merge on the driver, NO global
    sort — so 100 TB costs one scan and a k-row reduce. Deterministic:
    the same docs survive across engines, repartitioning, and
    re-ingestion (the property downstream dedup/splits need)."""
    from stonkwhisperer_spark.functions.hashing import portable_hash64
    from stonkwhisperer_spark.functions.text import bpe_token_count

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.greatest(bpe_token_count("text"), F.lit(1))
        .cast("bigint")
        .alias("n_tokens"),
        (
            portable_hash64(
                F.concat(F.lit("psamp|"), F.col("doc_id").cast("string"))
            )
            % _PSAMP_M
            + 1
        ).alias("h"),
    )
    return (
        sized.select(
            "doc_id",
            "n_tokens",
            F.expr(f"CAST((n_tokens * {_PSAMP_M}) DIV h AS BIGINT)").alias(
                "priority"
            ),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(_PSAMP_K)
    )


# --------------------------------------------------------------------------
# corpus_drift — distribution-shift monitoring between corpus snapshots:
# the check a training pipeline runs BEFORE retraining on a grown corpus
# ("did this ingest wave change what the model will see?"). Exact
# total-variation distance over the token distribution, integer-exact so
# the value hash is engine- and partition-order-independent.
# --------------------------------------------------------------------------
_DRIFT_TOP = 3  # most-shifted tokens reported per source
_DRIFT_SCALE = 1_000_000_000  # TVD fixed-point scale (1e9)


@register(
    "corpus_drift",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, tok FROM (
        SELECT doc_id, source,
               unnest(regexp_split_to_array({_CLEAN_TEXT}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    counts AS (
      SELECT source, tok,
             CAST(count(*) AS BIGINT) AS c2,
             CAST(count(*) FILTER (WHERE doc_id % 4 != 0) AS BIGINT) AS c1
      FROM toks GROUP BY 1, 2
    ),
    totals AS (
      SELECT source,
             CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(count(*) FILTER (WHERE c1 > 0) AS BIGINT) AS vocab_v1,
             CAST(count(*) AS BIGINT) AS vocab_v2
      FROM counts GROUP BY 1
    ),
    dev AS (
      SELECT c.source, c.tok,
             abs(CAST(c.c1 AS HUGEINT) * t.n2
                 - CAST(c.c2 AS HUGEINT) * t.n1) AS dev
      FROM counts c JOIN totals t USING (source)
    ),
    drift AS (
      SELECT source, sum(dev) AS tvd_num FROM dev GROUP BY 1
    ),
    top_shift AS (
      SELECT source, string_agg(tok, ',' ORDER BY dev DESC, tok) AS toks
      FROM (
        SELECT source, tok, dev,
               row_number() OVER (PARTITION BY source
                                  ORDER BY dev DESC, tok) AS rk
        FROM dev
      ) WHERE rk <= {_DRIFT_TOP}
      GROUP BY source
    )
    SELECT t.source,
           t.n1 AS n_tokens_v1,
           t.n2 AS n_tokens_v2,
           t.vocab_v1, t.vocab_v2,
           CASE WHEN t.n1 = 0 OR t.n2 = 0 THEN CAST({_DRIFT_SCALE} AS BIGINT)
                ELSE CAST((CAST({_DRIFT_SCALE} AS HUGEINT) * d.tvd_num)
                     // (2 * CAST(t.n1 AS HUGEINT) * t.n2)
                     AS BIGINT) END AS tvd_e9,
           s.toks AS top_shift_toks
    FROM totals t
    JOIN drift d USING (source)
    JOIN top_shift s USING (source)
    """,
)
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot corpus drift: v1 = the curated corpus
    before an ingest wave (doc_id % 4 != 0 — the same base/batch split
    convention as incremental_dedup / bm25_index_upsert /
    ivf_assign_incremental), v2 = the corpus after it. Per source:
    token totals, vocabulary sizes, the EXACT total-variation distance
    between the two token distributions (fixed-pointed at 1e9:
    TVD = Σ|c1/N1 − c2/N2|/2 cross-multiplied to
    Σ|c1·N2 − c2·N1| DIV (2·N1·N2) — pure DECIMAL(38,0) integer
    arithmetic, no floats, so partial-agg order cannot drift the
    hash), and the {_DRIFT_TOP} most-shifted tokens (ties on token).
    A pipeline gates retraining or flags a poisoned/skewed ingest
    batch when tvd_e9 jumps. A source with NO v1 mass (every doc of
    that source arrived in the batch) reports tvd_e9 = 1e9 — total
    shift by convention, since p1 is undefined there; a source with no
    v2 mass takes the same 1e9 arm (p2 undefined — can't arise under
    v1 ⊆ v2 here, but the guard keeps a zero denominator from reading
    as a spurious 'overflow' via the ifnull below; ADVICE r12).

    Scale: ONE tokenize pass — the (source, tok) count table is
    localCheckpointed (vocab-sized) so its four consumers never re-run
    the corpus scan — and the only full-volume shuffle is that count;
    everything after is vocabulary-sized (per-source totals broadcast
    back; the top-k window partitions by source over vocab-sized
    input, never the corpus stream). Decimal
    headroom: N ≈ 1e14 tokens (100 TB) gives 1e9·2·N² ≈ 1e38 — at the
    DECIMAL(38,0) edge; shard the TVD sum per (source, tok-hash bucket)
    and divide per-bucket before summing if corpora outgrow it. With
    ANSI mode off a decimal overflow yields NULL, not an error, so the
    tvd_e9 expression wraps the DIV in ifnull(..., raise_error(...)) —
    outgrowing the headroom fails loud instead of hashing a NULL row
    (ADVICE r11)."""
    from pyspark.sql.window import Window as W

    from stonkwhisperer_spark.functions.hashing import tokens_of
    from stonkwhisperer_spark.functions.text import clean_text_for_nlp

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(tokens_of(clean_text_for_nlp("text"))).alias("tok"),
    ).filter(F.col("tok") != "")
    # localCheckpoint: four consumers (totals, dev, drift, top_shift)
    # with different column/aggregate shapes would each re-run the
    # full-volume tokenize+count (per-branch pruning kills exchange
    # reuse — the near_dup_jaccard_prefix r10 lesson); the checkpoint
    # pins the ONE corpus pass and is only vocab-sized.
    counts = (
        toks.groupBy("source", "tok")
        .agg(
            F.count("*").cast("decimal(38,0)").alias("c2"),
            F.sum(F.when(F.col("doc_id") % 4 != 0, 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("c1"),
        )
        .localCheckpoint(eager=True)
    )
    totals = counts.groupBy("source").agg(
        F.sum("c1").cast("decimal(38,0)").alias("n1"),
        F.sum("c2").cast("decimal(38,0)").alias("n2"),
        F.sum(F.when(F.col("c1") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("vocab_v1"),
        F.count("*").cast("bigint").alias("vocab_v2"),
    )
    dev = counts.join(F.broadcast(totals), "source").select(
        "source",
        "tok",
        F.expr("abs(c1 * n2 - c2 * n1)").alias("dev"),
    )
    drift = dev.groupBy("source").agg(
        F.sum("dev").cast("decimal(38,0)").alias("tvd_num")
    )
    top_shift = (
        dev.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.desc("dev"), "tok")
            ),
        )
        .filter(F.col("rk") <= _DRIFT_TOP)
        .groupBy("source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "tok"))),
                    lambda s: s["tok"],
                ),
                ",",
            ).alias("top_shift_toks")
        )
    )
    return (
        totals.join(drift, "source")
        .join(top_shift, "source")
        .select(
            "source",
            F.col("n1").cast("bigint").alias("n_tokens_v1"),
            F.col("n2").cast("bigint").alias("n_tokens_v2"),
            "vocab_v1",
            "vocab_v2",
            F.expr(
                f"CASE WHEN n1 = 0 OR n2 = 0 THEN CAST({_DRIFT_SCALE} AS BIGINT) "
                f"ELSE ifnull(CAST((CAST({_DRIFT_SCALE} AS DECIMAL(38,0)) * tvd_num) "
                "DIV (CAST(2 AS DECIMAL(38,0)) * n1 * n2) AS BIGINT), "
                "raise_error('corpus_drift: tvd_e9 overflowed DECIMAL(38,0) — "
                "shard the TVD sum per (source, tok-hash bucket) and divide "
                "per-bucket before summing, per the docstring')) END"
            ).alias("tvd_e9"),
            "top_shift_toks",
        )
    )
