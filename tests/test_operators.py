"""Operator-level unit tests: F1 flair predicate, F12 empty-input
short-circuit, K6 table DDL, dedup formulation equivalence, language-ID
CJK reachability (ADVICE r1), gap-fill semantics, ANN bucket recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from stonkwhisperer_spark.functions.hashing import shingle_postings, shingles, tokens_of
from stonkwhisperer_spark.functions.text import clean_text_for_nlp, language_id
from stonkwhisperer_spark.operators.dedup import (
    jaccard_pairs,
    minhash_signature,
    minhash_signatures_exploded,
    simhash16,
    simhash16_exploded,
)
from stonkwhisperer_spark.operators.gapfill import gap_fill
from stonkwhisperer_spark.schemas import RAW_POSTS_SCHEMA, STOCK_BARS_SCHEMA
from stonkwhisperer_spark.sinks.writers import conform, merge_append


def _posts_raw(spark):
    rows = [
        ("t3_1", "r/stocks", "u1", "T", None, 1, 0, True, None, "DD", 0.9,
         "https://r/1", 1700000000, None, None, None, None, None, None),
        ("t3_2", "r/stocks", "u2", "T", None, 1, 0, True, None, "Meme", 0.9,
         "https://r/2", 1700000060, None, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, RAW_POSTS_SCHEMA).withColumn(
        "_arrival_id", F.monotonically_increasing_id()
    )


def test_flair_predicate_f1(spark):
    from stonkwhisperer_spark.pipelines import clean_posts

    raw = _posts_raw(spark)
    assert clean_posts(raw).count() == 2
    only_dd = clean_posts(raw, flairs=["DD", "News"])
    assert [r.reddit_id for r in only_dd.collect()] == ["t3_1"]


def test_empty_input_short_circuit_f12(spark, tmp_path):
    from stonkwhisperer_spark.pipelines import clean_news, clean_posts
    from stonkwhisperer_spark.schemas import RAW_NEWS_SCHEMA

    empty_news = spark.createDataFrame([], RAW_NEWS_SCHEMA).withColumn(
        "_arrival_id", F.monotonically_increasing_id()
    )
    assert clean_news(empty_news).count() == 0
    assert clean_posts(_posts_raw(spark).limit(0)).count() == 0
    # empty batch through the merge sink writes nothing, returns 0
    path = str(tmp_path / "t")
    assert merge_append(spark, path, empty_news.select("url", "title"), ["url"]) == 0


def test_conform_schema_contract_k6(spark, tmp_path):
    import pytest

    rows = spark.createDataFrame(
        [("i1", "c1", "2024-01-02 09:30:00", "1.5", "2", "1", "1.2", 10, 2, "1.3", "extra")],
        "id string, company_id string, timestamp string, open_price string,"
        "high_price string, low_price string, close_price string, volume long,"
        "trade_count long, vwap string, junk string",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    out = conform(rows, STOCK_BARS_SCHEMA)
    assert [f.name for f in out.schema.fields] == [f.name for f in STOCK_BARS_SCHEMA.fields]
    assert "junk" not in out.columns
    assert str(out.schema["open_price"].dataType) == "DecimalType(12,4)"
    with pytest.raises(ValueError, match="missing columns"):
        conform(rows.drop("vwap"), STOCK_BARS_SCHEMA)


def test_minhash_formulations_agree(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string",
    )
    postings = shingle_postings(docs, "doc_id", clean_text_for_nlp("text"))
    exploded = {
        r.doc_id: list(r.sig)
        for r in minhash_signatures_exploded(postings, "doc_id", 8).collect()
    }
    arr = {
        r.doc_id: list(r.sig)
        for r in docs.select(
            "doc_id",
            minhash_signature(shingles(tokens_of(clean_text_for_nlp("text")), 3), 8).alias("sig"),
        ).collect()
    }
    assert exploded == arr


def test_simhash_formulations_agree(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    toks = tokens_of(clean_text_for_nlp("text"))
    arr = {r.doc_id: r.s for r in docs.select("doc_id", simhash16(toks).alias("s")).collect()}
    token_rows = docs.select("doc_id", F.explode(F.array_distinct(toks)).alias("tok"))
    expl = {r.doc_id: r.simhash for r in simhash16_exploded(token_rows).collect()}
    assert arr == expl


def test_language_id_zh_reachable(spark):
    # ADVICE r1: zh markers must survive normalization (the NLP cleaner
    # strips CJK; language_id's own normalizer keeps it).
    df = spark.createDataFrame(
        [(1, "的是不了在人有我的是"), (2, "the cat and the dog is in the house"),
         (3, "le chat est sur la table et le chien"), (4, "zzz qqq xxx")],
        "id long, text string",
    )
    got = {r.id: r.lang for r in df.select("id", language_id("text").alias("lang")).collect()}
    assert got == {1: "zh", 2: "en", 3: "fr", 4: "und"}


def test_jaccard_max_doc_freq_prunes_hot_shingles(spark):
    docs = spark.createDataFrame(
        [(i, "common shingle text here unique" + (" x" * i)) for i in range(6)],
        "doc_id long, text string",
    )
    postings = shingle_postings(docs, "doc_id", clean_text_for_nlp("text"))
    full = jaccard_pairs(postings, threshold=0.1).count()
    pruned = jaccard_pairs(postings, threshold=0.1, max_doc_freq=2).count()
    assert pruned <= full


def test_gapfill_leading_and_interior(spark):
    df = spark.createDataFrame(
        [("A", 1, None), ("A", 2, 10.0), ("A", 3, None), ("A", 4, 12.0), ("B", 1, None)],
        "k string, t long, v double",
    )
    out = {(r.k, r.t): r.v for r in gap_fill(df, ["k"], ["t"], ["v"]).collect()}
    assert out[("A", 1)] == 10.0  # leading null -> bfill
    assert out[("A", 3)] == 10.0  # interior null -> ffill
    assert out[("B", 1)] is None  # all-null key stays null


def test_hyperplane_bucket_recall(spark):
    """LSH sanity: a vector and its tiny perturbation land in the same
    bucket far more often than random pairs (the property that makes
    bucket-restricted ANN search work)."""
    import random

    from stonkwhisperer_spark.operators.similarity import hyperplane_bucket

    rng = random.Random(7)
    rows = []
    for i in range(40):
        v = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((i * 2, v))
        rows.append((i * 2 + 1, [x + rng.uniform(-0.01, 0.01) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = {
        r.vec_id: r.bucket
        for r in df.select(
            "vec_id", hyperplane_bucket(F.col("embedding"), 6, 16).alias("bucket")
        ).collect()
    }
    same = sum(1 for i in range(40) if b[i * 2] == b[i * 2 + 1])
    assert same >= 30  # near-duplicates overwhelmingly co-bucket
    assert len(set(b.values())) > 5  # and buckets actually spread


def test_interval_join_grid_matches_range_join(spark):
    """Grid decomposition must reproduce the exact range-join result
    with a pure equi-join plan: no nested loop on either side."""
    import datetime as dt

    from stonkwhisperer_spark.operators.interval import interval_join_grid

    t0 = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(i, "k" + str(i % 3), t0 + dt.timedelta(seconds=i * 37)) for i in range(400)],
        "pid long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (
                j,
                "k" + str(j % 3),
                t0 + dt.timedelta(seconds=j * 173),
                t0 + dt.timedelta(seconds=j * 173 + 300),
            )
            for j in range(50)
        ],
        "iid long, k string, s timestamp, e timestamp",
    )
    expected = {
        (r.pid, r.iid)
        for r in points.join(
            intervals,
            (points.k == intervals.k) & (points.ts >= intervals.s) & (points.ts < intervals.e),
        )
        .select("pid", "iid")
        .collect()
    }
    grid = interval_join_grid(points, intervals, "ts", "s", "e", keys=["k"], cell_seconds=300)
    got = {(r.pid, r.iid) for r in grid.select("pid", "iid").collect()}
    assert got == expected and len(expected) > 0

    plan = grid._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan  # equi-join on (k, _cell), never BNLJ

    # boundary semantics: start inclusive, end exclusive
    p = spark.createDataFrame([(1, t0), (2, t0 + dt.timedelta(seconds=300))], "pid long, ts timestamp")
    iv = spark.createDataFrame([(9, t0, t0 + dt.timedelta(seconds=300))], "iid long, s timestamp, e timestamp")
    hits = {r.pid for r in interval_join_grid(p, iv, "ts", "s", "e").collect()}
    assert hits == {1}


def test_lsh_multi_probe_recall(spark):
    """Measured recall of the bucketed ANN candidate path vs brute-force
    ground truth (cosine >= 0.35 over sf0.01 embeddings), and the
    multi-probe lift. The testdata embeddings are near-orthogonal
    random vectors, so absolute recall tracks the (1 - theta/pi)^8
    hyperplane-collision law (~3% at 0 probes) — the assertions pin the
    floors and the monotone probe lift, and that candidates stay
    bucket-bounded (a small fraction of all pairs)."""
    from stonkwhisperer_spark.operators.similarity import (
        dot_unrolled,
        lsh_candidate_pairs,
        norm_unrolled,
    )
    from stonkwhisperer_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    n = emb.count()
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        norm_unrolled("embedding", 64).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        norm_unrolled("embedding", 64).alias("nb"),
    )
    truth = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot_unrolled("ea", "eb", 64) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .filter(F.col("cos") >= 0.35)
        .collect()
    }
    assert truth

    plain = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(emb, multi_probe=0).collect()}
    probed = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(emb, multi_probe=8).collect()}
    recall_plain = len(truth & plain) / len(truth)
    recall_probed = len(truth & probed) / len(truth)

    assert recall_plain >= 0.02
    assert recall_probed >= 0.10
    assert recall_probed > recall_plain  # probing must add recall
    assert plain <= probed  # probe set strictly widens candidates
    all_pairs = n * (n - 1) / 2
    assert len(probed) < 0.05 * all_pairs  # still bucket-bounded, never all-pairs


def test_connected_components_clusters(spark):
    """Min-label propagation: chains collapse to the min id, isolated
    pairs stay separate, and a long path (diameter > 2) still converges
    within max_iter."""
    from stonkwhisperer_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        # component {1,2,3,4} as a path; {10,11}; {20,21,22} as a star
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "doc_a long, doc_b long",
    )
    got = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    # a 12-node path exercises multi-iteration convergence
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "doc_a long, doc_b long"
    )
    got = {r.node: r.cluster_id for r in connected_components(path).collect()}
    assert set(got.values()) == {100} and len(got) == 13


def test_ivf_topk_recall(spark):
    """IVF top-k vs brute-force ground truth on sf0.01 embeddings:
    recall must rise monotonically with nprobe and hit 1.0 when every
    cell is probed (then IVF degenerates to exact search). Also pins
    the plan shape: the candidate join must be a broadcast equi-join
    on cell, never a nested loop."""
    from stonkwhisperer_spark.operators.similarity import ivf_topk, knn_bruteforce
    from stonkwhisperer_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    cents = emb.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    n_cells = cents.count()
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    truth = {
        (r.q_id, r.c_id)
        for r in knn_bruteforce(queries, emb.select(F.col("vec_id").alias("c_id"), "embedding"), k=5, codegen_dim=64).collect()
    }
    assert len(truth) == 8 * 5

    recalls = []
    for probes in (1, 2, n_cells):
        got = {
            (r.q_id, r.vec_id)
            for r in ivf_topk(queries, emb, cents, k=5, probes=probes, dim=64).collect()
        }
        recalls.append(len(truth & got) / len(truth))
    assert recalls[0] <= recalls[1] <= recalls[2]
    assert recalls[2] == 1.0  # all cells probed == exact search
    assert recalls[1] >= 0.2  # 2-probe floor on this data

    plan = (
        ivf_topk(queries, emb, cents, k=5, probes=2, dim=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # candidate retrieval must be a hash equi-join on cell (probe list
    # broadcast); the only nested-loop joins allowed are the two
    # k-row centroid cross joins that feed the quantizer.
    assert "BroadcastHashJoin [cell" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_pack_and_mixture_invariants(spark):
    """Packing/mixture invariants at sf0.001: every doc lands in
    exactly one pack; packs only contain docs of their own shard; a
    doc's pack start (tokens_before) is consistent with the running
    sum; mixture sampling keeps languages at roughly their configured
    rates and is idempotent (same docs on re-run)."""
    from stonkwhisperer_spark.plans.registry import query_map

    sf = "/root/testdata/sf0.001"
    qm = query_map()
    packs = qm["pack_documents"](spark, sf).collect()
    assert len({r.doc_id for r in packs}) == len(packs)  # one row per doc
    by_shard = {}
    for r in packs:
        assert r.pack_id // 1_000_000 == r.shard  # pack belongs to its shard
        assert r.tokens_before >= 0
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.tokens_before)
        run = 0
        for r in rows:
            assert r.tokens_before == run  # window cumsum is gapless
            run += r.n_tokens

    m1 = {r.doc_id for r in qm["mixture_sample"](spark, sf).collect()}
    m2 = {r.doc_id for r in qm["mixture_sample"](spark, sf).collect()}
    assert m1 == m2 and len(m1) > 0  # deterministic + nonempty


def test_fuzzy_blocking_recall_floor(spark):
    """SimHash blocking (the fuzzy_near_dups candidate stage) can miss
    true edit-distance pairs — pin its measured recall against the
    exact O(n²) answer on a seeded corpus of near-duplicate families so
    the blocking parameters can't silently degrade. Exact duplicates
    must always collide (recall 1.0 on distance-0 pairs: identical
    token sets ⇒ identical signature)."""
    import random

    from stonkwhisperer_spark.operators.dedup import simhash16_exploded

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(200)]
    rows, did = [], 0
    for _fam in range(25):
        base = [rng.choice(vocab) for _ in range(15)]
        rows.append((did, " ".join(base)))
        did += 1
        rows.append((did, " ".join(base)))  # exact duplicate
        did += 1
        var = list(base)
        var[rng.randrange(15)] = rng.choice(vocab)  # 1-token edit
        rows.append((did, " ".join(var)))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pre = F.substring("text", 1, 80)
    a = docs.select(F.col("doc_id").alias("doc_a"), pre.alias("pa"))
    b = docs.select(F.col("doc_id").alias("doc_b"), pre.alias("pb"))
    # Threshold 10 separates the seeded families (same-family prefix
    # distance <= 4, cross-family >= 22 on this corpus) so truth is the
    # planted near-dups, not structural lookalikes.
    exact_pairs = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("d", F.levenshtein("pa", "pb"))
        .filter(F.col("d") <= 10)
    )
    truth = {(r.doc_a, r.doc_b) for r in exact_pairs.collect()}
    # Full-text identical pairs (prefix-80 d=0 is weaker: a pair
    # differing only beyond char 80 has different token sets and MAY
    # legitimately miss the block).
    fa = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    fb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    truth_exact_dup = {
        (r.doc_a, r.doc_b)
        for r in fa.join(fb, F.col("ta") == F.col("tb"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .collect()
    }
    assert truth and truth_exact_dup

    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    sigs = simhash16_exploded(toks, "doc_id")
    sa = sigs.select(F.col("doc_id").alias("doc_a"), "simhash")
    sb = sigs.select(F.col("doc_id").alias("doc_b"), "simhash")
    blocked = {
        (r.doc_a, r.doc_b)
        for r in sa.join(sb, "simhash").filter(F.col("doc_a") < F.col("doc_b")).collect()
    }

    found = truth & blocked
    assert truth_exact_dup <= blocked  # exact dups can never be missed
    recall = len(found) / len(truth)
    # Measured 0.49 on this seeded corpus (exact dups always collide;
    # 1-token edits flip low-margin signature bits ~half the time —
    # the documented trade of equality blocking on a 16-bit SimHash;
    # production widens the signature or switches to banded MinHash
    # before loosening the verifier). The floor pins today's behavior
    # so parameter changes can't silently degrade it.
    assert recall >= 0.45, f"fuzzy blocking recall degraded: {recall:.2f}"


def test_kmv_estimate_accuracy(spark):
    """The KMV distinct estimate must land within the sketch's expected
    error envelope (~1/sqrt(k) ≈ 6% at k=256; assert 15% for slack)
    against the exact distinct count at sf0.01."""
    from stonkwhisperer_spark.plans.registry import query_map
    from stonkwhisperer_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    exact = (
        load_table(spark, sf, "events")
        .select(
            F.concat_ws(
                "|", F.col("user_id"), F.col("event_type"), F.to_date("ts")
            ).alias("key")
        )
        .distinct()
        .count()
    )
    row = query_map()["kmv_distinct_estimate"](spark, sf).collect()[0]
    assert exact > 256  # the estimator path (not the exact fallback) is in play
    rel_err = abs(row.estimated_distinct - exact) / exact
    assert rel_err <= 0.15, f"KMV error {rel_err:.3f} vs exact {exact}"


def test_connected_components_star_path_graph(spark):
    """The large-star/small-star engine: a 1000-node PATH (diameter 999
    — min-label's worst case, which would hard-fail its 25-iteration
    budget) collapses to one component in O(log² n) rounds (< 12), with
    every node labeled by the component minimum."""
    from stonkwhisperer_spark.operators.dedup import _cc_star

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1000, 1999)], "a long, b long"
    )
    labels, rounds = _cc_star(path)
    assert rounds < 12, f"star CC took {rounds} rounds on a 1000-node path"
    got = {r.node: r.cluster_id for r in labels.collect()}
    assert len(got) == 1000 and set(got.values()) == {1000}


def test_connected_components_star_matches_label(spark):
    """Both engines agree on a mixed graph (dense cluster + pair +
    star + chain), and algorithm='auto' transparently falls back to the
    star engine when the diameter exceeds the label budget instead of
    raising."""
    import pytest as _pytest

    from stonkwhisperer_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (21, 20), (21, 22), (30, 31), (31, 32)],
        "doc_a long, doc_b long",
    )
    label = {r.node: r.cluster_id
             for r in connected_components(edges, algorithm="label").collect()}
    star = {r.node: r.cluster_id
            for r in connected_components(edges, algorithm="star").collect()}
    assert label == star == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                             20: 20, 21: 20, 22: 20, 30: 30, 31: 30, 32: 30}

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 140)], "doc_a long, doc_b long"
    )
    # explicit label mode with a too-small budget fails LOUDLY...
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=5, algorithm="label")
    # ...auto falls back to the star engine and still answers exactly
    got = {r.node: r.cluster_id
           for r in connected_components(chain, max_iter=5).collect()}
    assert len(got) == 41 and set(got.values()) == {100}


def test_span_dedup_keep_first_semantics(spark):
    """Crafted corpus: a span repeated within a doc and copied across
    docs survives only at its globally-first (doc_id, pos); reassembly
    preserves original order; a fully-duplicated doc collapses to ''."""
    from stonkwhisperer_spark.operators.dedup import span_dedup, word_spans

    boiler = " ".join(f"b{i}" for i in range(16))  # one exact 16-word span
    fresh_a = " ".join(f"a{i}" for i in range(16))
    fresh_c = " ".join(f"c{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (0, f"{boiler} {fresh_a} {boiler}"),  # internal repeat
            (1, f"{fresh_c} {boiler}"),  # cross-doc repeat
            (2, boiler),  # nothing original
        ],
        "doc_id long, text string",
    ).select("doc_id", word_spans(F.col("text"), 16).alias("spans"))
    out = {
        r.doc_id: r
        for r in span_dedup(docs, "doc_id", "spans").collect()
    }
    assert (out[0].n_spans, out[0].n_kept) == (3, 2)
    assert out[0].clean_text == f"{boiler} {fresh_a}"  # order kept, repeat gone
    assert (out[1].n_spans, out[1].n_kept) == (2, 1)
    assert out[1].clean_text == fresh_c
    assert (out[2].n_spans, out[2].n_kept) == (1, 0)
    assert out[2].clean_text == ""


def test_sq8_quantized_topk_recall(spark):
    """Int8 scalar quantization must preserve neighbor structure: the
    SQ8 top-5 per query overlaps the exact dot-product top-5 by >= 60%
    on average (64-dim random vectors; midpoint reconstruction error is
    ~0.2% of each dim's range, so recall is near-perfect in practice),
    and the stored code array is 8-bit."""
    import random

    from stonkwhisperer_spark.operators.similarity import (
        sq8_codebook,
        sq8_codes,
        sq8_topk,
    )

    rng = random.Random(11)
    dim = 64
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    los, his = sq8_codebook(df, dim=dim)
    q = df.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    c = df.select(F.col("vec_id").alias("c_id"), "embedding")
    approx = {
        (r["q_id"], r["c_id"])
        for r in sq8_topk(q, c, los, his, k=5, dim=dim).collect()
    }
    # Exact max-inner-product reference, computed driver-side.
    vecs = dict(rows)
    exact = set()
    for qid in range(6):
        scores = sorted(
            (
                (sum(a * b for a, b in zip(vecs[qid], vecs[cid])), cid)
                for cid in vecs
                if cid != qid
            ),
            key=lambda t: (-t[0], t[1]),
        )
        exact.update((qid, cid) for _, cid in scores[:5])
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.6, f"SQ8 recall {recall} below floor"
    codes = df.select(sq8_codes("embedding", los, his, dim).alias("c")).first()["c"]
    assert len(codes) == dim and all(-128 <= x <= 127 for x in codes)


def test_semantic_dedup_norm_guard(spark):
    """ADVICE-r6: the integer cosine test is int64-safe only for
    ~unit-norm embeddings (norm-based headroom, not component-based);
    on unbounded inputs Spark would wrap silently where DuckDB raises.
    The in-plan guard must raise instead of wrapping."""
    import pytest
    from pyspark.sql import functions as F

    from stonkwhisperer_spark.plans.queries_llm import (
        _SD_NORM_CAP,
        _sd_norm_guard,
    )

    ok = spark.range(1).select(
        _sd_norm_guard(F.lit(_SD_NORM_CAP).cast("bigint")).alias("n")
    )
    assert ok.collect()[0]["n"] == _SD_NORM_CAP
    bad = spark.range(1).select(
        _sd_norm_guard(F.lit(_SD_NORM_CAP + 1).cast("bigint")).alias("n")
    )
    with pytest.raises(Exception, match="unit-norm"):
        bad.collect()


def test_semantic_dedup_parameterized_k(spark):
    """VERDICT-r6 task 5: K is a parameter (the gated queries pin K=8;
    the operator takes any K, default data-derived n/target) — per-
    cluster pair cost is O(n²/K), so K must scale with the corpus."""
    from stonkwhisperer_spark.plans.queries_llm import (
        _km_default_k,
        semantic_clusters_frame,
        semantic_dedup_frame,
    )
    from stonkwhisperer_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    n = load_table(spark, sf, "embeddings").count()

    rows32 = semantic_dedup_frame(spark, sf, k=32).collect()
    assert len(rows32) == n
    assert {r["cluster_id"] for r in rows32} <= set(range(32))
    assert len({r["cluster_id"] for r in rows32}) > 8  # K took effect
    assert all(isinstance(r["keep"], bool) for r in rows32)

    c32 = semantic_clusters_frame(spark, sf, k=32)
    assert {r["cluster_id"] for r in c32.collect()} <= set(range(32))

    # data-derived default: K ≈ ceil(n / target cluster size)
    import math

    from stonkwhisperer_spark.plans.queries_llm import (
        _KM_TARGET_CLUSTER_SIZE,
    )

    class _FakeCount:
        def count(self):
            return 1000

    assert _km_default_k(_FakeCount()) == math.ceil(
        1000 / _KM_TARGET_CLUSTER_SIZE
    )
    default_rows = semantic_clusters_frame(spark, sf).collect()
    assert len(default_rows) == n


def test_pq_topk_recall(spark):
    """Product quantization must preserve neighbor structure: the PQ
    top-5 per query (8 subspaces x 16 centroids, asymmetric distance)
    overlaps the exact squared-L2 top-5 by a measured floor on 64-dim
    random vectors, and the learned codebook is M*K rows of dsub-length
    integer centroids."""
    import random

    from stonkwhisperer_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_codebooks,
        pq_subvectors,
        pq_topk,
    )

    rng = random.Random(7)
    dim = 64
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    approx = {
        (r["q_id"], r["c_id"])
        for r in pq_topk(df, F.col("vec_id") < 6, k=5, dim=dim).collect()
    }
    # Exact squared-L2 reference (PQ's metric), computed driver-side.
    vecs = dict(rows)
    exact = set()
    for qid in range(6):
        scores = sorted(
            (
                (sum((a - b) ** 2 for a, b in zip(vecs[qid], vecs[cid])), cid)
                for cid in vecs
                if cid != qid
            ),
            key=lambda t: (t[0], t[1]),
        )
        exact.update((qid, cid) for _, cid in scores[:5])
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.3, f"PQ recall {recall} below floor"
    cb = pq_codebooks(
        pq_subvectors(df, dim=dim), dim // PQ_M
    ).collect()
    assert len(cb) <= PQ_M * PQ_K
    assert {r["m"] for r in cb} == set(range(PQ_M))
    assert all(len(r["cv"]) == dim // PQ_M for r in cb)

def test_ivfpq_topk_recall_and_pruning(spark):
    """IVF×PQ (VERDICT r7 task 3) must (a) preserve neighbor structure
    vs the exact squared-L2 reference on random vectors, and (b) be a
    true PRUNING of the full-scan PQ ranking: every IVF×PQ hit either
    appears in the uncomposed pq_topk result at the same adist or was
    ranked into the top-k because cell pruning removed higher-ranked
    candidates — so any (q, c) pair present in BOTH results must carry
    the IDENTICAL integer distance (same codebooks, same codes)."""
    import random

    from stonkwhisperer_spark.operators.similarity import ivfpq_topk, pq_topk

    rng = random.Random(11)
    dim = 64
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(256)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = df.filter(F.col("vec_id") % 32 == 0).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    composed = {
        (r["q_id"], r["c_id"]): r["adist"]
        for r in ivfpq_topk(
            df, cents, F.col("vec_id") < 6, k=5, probes=3, dim=dim
        ).collect()
    }
    full = {
        (r["q_id"], r["c_id"]): r["adist"]
        for r in pq_topk(df, F.col("vec_id") < 6, k=5, dim=dim).collect()
    }
    # (b) shared pairs carry identical integer ADC distances
    shared = set(composed) & set(full)
    assert shared, "composition shares no pairs with full-scan PQ"
    assert all(composed[p] == full[p] for p in shared)
    # (a) recall floor vs the exact squared-L2 top-5
    vecs = dict(rows)
    exact = set()
    for qid in range(6):
        scores = sorted(
            (
                (sum((a - b) ** 2 for a, b in zip(vecs[qid], vecs[cid])), cid)
                for cid in vecs
                if cid != qid
            ),
            key=lambda t: (t[0], t[1]),
        )
        exact.update((qid, cid) for _, cid in scores[:5])
    recall = len(set(composed) & exact) / len(exact)
    assert recall >= 0.2, f"IVF×PQ recall {recall} below floor"
    # every query produced a full k (cells at probes=3 hold enough)
    from collections import Counter

    per_q = Counter(q for q, _ in composed)
    assert all(per_q[q] == 5 for q in range(6)), per_q


def test_incremental_lsh_dedup_cross_corpus_only(spark):
    # Corpus doc 1 and incoming doc 100 share identical text (Jaccard
    # 1.0 -> killed); incoming docs 101/102 are near-identical to each
    # other but unlike any corpus doc (must BOTH survive: incoming is
    # never self-compared); incoming 103 is unlike everything.
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    pair = "november oscar papa quebec romeo sierra tango uniform victor whiskey"
    docs = spark.createDataFrame(
        [
            (1, base, False),
            (2, "one two three four five six seven eight nine ten", False),
            (100, base, True),
            (101, pair, True),
            (102, pair + " xray", True),
            (103, "red orange yellow green blue violet purple pink", True),
        ],
        "doc_id long, text string, is_incoming boolean",
    )
    from stonkwhisperer_spark.operators.dedup import incremental_lsh_dedup

    postings = shingle_postings(docs, "doc_id", clean_text_for_nlp("text")).join(
        docs.select("doc_id", "is_incoming"), "doc_id"
    )
    out = {
        r.doc_id: (r.is_dup, r.dup_of)
        for r in incremental_lsh_dedup(postings, threshold=0.8).collect()
    }
    assert set(out) == {100, 101, 102, 103}  # one row per incoming doc
    assert out[100] == (1, 1)  # exact twin of corpus doc 1
    assert out[101] == (0, None)  # near-dup of 102 only — incoming side
    assert out[102] == (0, None)
    assert out[103] == (0, None)


def test_kmv_small_group_exact_and_merge_identity(spark):
    # Group "small" has 10 distinct values (< K=32): the sketch count
    # is EXACT. Group "big" has 500: estimator path. The merged
    # '<all>' sketch (union of per-group k-mins, re-ranked) must be
    # IDENTICAL to a from-scratch global sketch — the global K minima
    # are a subset of the union of per-group K minima.
    from stonkwhisperer_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    rows = spark.createDataFrame(
        [("small", f"s{i % 10}") for i in range(40)]
        + [("big", f"b{i}") for i in range(500)],
        "g string, v string",
    )
    sk = kmv_sketch(rows, "g", "v", k=32)
    est = {r.g: r for r in kmv_estimate(sk, "g", k=32).collect()}
    assert est["small"].n_mins == 10
    assert est["small"].est_distinct == 10  # exact below K
    assert 250 <= est["big"].est_distinct <= 1000  # KMV est, K=32

    merged = kmv_merge(sk, "g", "<all>", k=32)
    direct = kmv_sketch(rows.select(F.lit("<all>").alias("g"), "v"), "g", "v", k=32)
    m = sorted(r._h for r in merged.collect())
    d = sorted(r._h for r in direct.collect())
    assert m == d  # merge is exact, not approximate


def test_cms_one_sided_error_and_hottest_token(spark):
    from stonkwhisperer_spark.operators.sketches import (
        cms_point_estimates,
        cms_table,
    )

    # Zipf-ish stream over a 60-token vocab; "hot" dominates.
    occs = [("hot",)] * 300 + [
        (f"w{i}",) for i in range(60) for _ in range(i % 7 + 1)
    ]
    toks = spark.createDataFrame(occs, "tok string")
    cms = cms_table(toks, "tok", d=4, width=1024)
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_point_estimates(tc, "tok", cms, d=4, width=1024).collect()
    assert all(r.est_cnt >= r.true_cnt for r in est)  # one-sided error
    top = max(est, key=lambda r: (r.est_cnt, r.tok))
    assert top.tok == "hot" and top.true_cnt == 300


def test_ivfpq_refine_exact_rerank_and_recall_gain(spark):
    """The refine leg must (a) return, per query, EXACTLY the best-k of
    its own 4k shortlist under true (fixed-point) squared distance —
    the FAISS Refine contract — and (b) never lose recall vs the
    unrefined composition: any true neighbor the shortlist caught is
    re-ranked into place, so recall(refine) >= recall(ivfpq@k) on the
    same shortlist run."""
    import math
    import random
    from collections import Counter

    from stonkwhisperer_spark.operators.similarity import (
        PQ_SCALE,
        ivfpq_refine_topk,
        ivfpq_topk,
    )

    rng = random.Random(7)
    dim = 64
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(256)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = df.filter(F.col("vec_id") % 32 == 0).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    pred = F.col("vec_id") < 6
    refined = {
        (r["q_id"], r["c_id"]): r["rdist"]
        for r in ivfpq_refine_topk(
            df, cents, pred, k=5, refine_factor=4, probes=3, dim=dim
        ).collect()
    }
    shortlist = [
        (r["q_id"], r["c_id"])
        for r in ivfpq_topk(df, cents, pred, k=20, probes=3, dim=dim).collect()
    ]

    # Reference rescoring in the identical fixed-point domain (float32
    # storage, double widening, floor to 2^20 ints — what both engines
    # compute).
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    qv = {
        i: [math.floor(f32(x) * PQ_SCALE) for x in v] for i, v in rows
    }

    def rdist(q, c):
        return sum((a - b) ** 2 for a, b in zip(qv[q], qv[c]))

    # (a) per query: refined == best-5 of the shortlist by exact rdist
    by_q = {}
    for q, c in shortlist:
        by_q.setdefault(q, []).append(c)
    for q, cands in by_q.items():
        best = sorted(((rdist(q, c), c) for c in cands))[:5]
        want = {(q, c): d for d, c in best}
        got = {p: d for p, d in refined.items() if p[0] == q}
        assert got == want, f"q={q}: refine is not the exact shortlist top-5"

    # (b) recall vs exact top-5 never below the unrefined composition's
    exact = set()
    for qid in range(6):
        scores = sorted(
            (rdist(qid, cid), cid) for cid, _ in rows if cid != qid
        )
        exact.update((qid, cid) for _, cid in scores[:5])
    unrefined = {
        (r["q_id"], r["c_id"])
        for r in ivfpq_topk(df, cents, pred, k=5, probes=3, dim=dim).collect()
    }
    r_ref = len(set(refined) & exact)
    r_unref = len(unrefined & exact)
    assert r_ref >= r_unref, (r_ref, r_unref)

    per_q = Counter(q for q, _ in refined)
    assert all(per_q[q] == 5 for q in range(6)), per_q


def test_sketch_salted_join_result_identical(spark):
    """sketch_salted_join must be result-identical to the plain join:
    hot keys (salted, dim replicated 16x) and cold keys (salt 0, dim
    replicated once) both reproduce every fact row exactly once."""
    from stonkwhisperer_spark.operators.skew import sketch_salted_join

    fact = spark.createDataFrame(
        [(i, "hot") for i in range(300)]
        + [(1000 + i, f"cold{i % 7}") for i in range(70)],
        "event_id long, k string",
    )
    dim = fact.select("k").distinct().withColumn(
        "v", F.concat(F.lit("cat_"), F.col("k"))
    )
    hot = spark.createDataFrame([("hot",)], "k string")
    got = sorted(
        (r.event_id, r.k, r.v)
        for r in sketch_salted_join(fact, dim, "k", hot).collect()
    )
    want = sorted(
        (r.event_id, r.k, r.v) for r in fact.join(dim, "k").collect()
    )
    assert got == want
    # empty hot set degrades to the plain join (everything salt 0)
    none_hot = spark.createDataFrame([], "k string")
    got2 = sorted(
        (r.event_id, r.k, r.v)
        for r in sketch_salted_join(fact, dim, "k", none_hot).collect()
    )
    assert got2 == want


def test_dist_zip_join_matches_global(spark):
    """dist_zip_join must produce the identical positional pairing to
    the single-partition zip_join, including when partition sizes are
    ragged (non-divisible counts) and sides differ in length."""
    from pyspark.sql import functions as F

    from stonkwhisperer_spark.operators.asof import dist_zip_join, zip_join

    left = spark.range(0, 101).select(
        (F.col("id") * 7 % 1000).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(0, 97).select(
        (F.col("id") * 13 % 1000).alias("j"), F.col("id").alias("rv")
    )
    want = sorted(
        (r.k, r.lv, r.j, r.rv)
        for r in zip_join(left, right, F.col("k"), F.col("j")).collect()
    )
    got = sorted(
        (r.k, r.lv, r.j, r.rv)
        for r in dist_zip_join(left, right, F.col("k"), F.col("j"), nparts=7).collect()
    )
    assert got == want and len(got) == 97


def test_ivfsq8_topk_recall_and_pruning(spark):
    """IVF×SQ8 must (a) preserve neighbor structure vs the exact
    inner-product reference on random vectors and (b) be a true
    PRUNING of the full-scan SQ8 ranking: any (q, c) pair present in
    BOTH the composed and the uncomposed results must carry the
    IDENTICAL asymmetric-distance score (same codebook, same dequant,
    same fold order)."""
    import random

    from stonkwhisperer_spark.operators.similarity import (
        ivfsq8_topk,
        sq8_codebook,
        sq8_topk,
    )

    rng = random.Random(13)
    dim = 64
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(256)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    los, his = sq8_codebook(df, dim=dim)
    cents = df.filter(F.col("vec_id") % 32 == 0).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    composed = {
        (r["q_id"], r["c_id"]): r["score"]
        for r in ivfsq8_topk(
            df, cents, F.col("vec_id") < 6, los, his, k=5, probes=3, dim=dim
        ).collect()
    }
    queries = df.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    cands = df.select(F.col("vec_id").alias("c_id"), "embedding")
    full = {
        (r["q_id"], r["c_id"]): r["score"]
        for r in sq8_topk(queries, cands, los, his, k=5, dim=dim).collect()
    }
    shared = set(composed) & set(full)
    assert shared, "composition shares no pairs with full-scan SQ8"
    assert all(composed[p] == full[p] for p in shared)
    # recall floor vs exact max-inner-product top-5
    vecs = dict(rows)
    exact = set()
    for qid in range(6):
        scores = sorted(
            (
                (-sum(a * b for a, b in zip(vecs[qid], vecs[cid])), cid)
                for cid in vecs
                if cid != qid
            ),
            key=lambda t: (t[0], t[1]),
        )
        exact.update((qid, cid) for _, cid in scores[:5])
    recall = len(set(composed) & exact) / len(exact)
    assert recall >= 0.2, f"IVF×SQ8 recall {recall} below floor"
    from collections import Counter

    per_q = Counter(q for q, _ in composed)
    assert all(per_q[q] == 5 for q in range(6)), per_q


def test_hll_accuracy_merge_identity_and_small_range(spark):
    # Group "big" has 5000 distinct values: raw-estimator path, and
    # m=256 gives sigma = 1.04/sqrt(256) = 6.5% — assert 4 sigma.
    # Group "small" has 30: linear-counting path (V>0, est <= 5m/2),
    # which is near-exact at that load factor. The merged '<all>'
    # register table (element-wise max) must be IDENTICAL to a
    # from-scratch global sketch — max is associative.
    from stonkwhisperer_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    rows = spark.createDataFrame(
        [("small", f"s{i % 30}") for i in range(90)]
        + [("big", f"b{i}") for i in range(5000)],
        "g string, v string",
    )
    sk = hll_sketch(rows, "g", "v")
    est = {r.g: r for r in hll_estimate(sk, "g").collect()}
    assert abs(est["big"].est_distinct - 5000) <= 5000 * 0.26
    assert abs(est["small"].est_distinct - 30) <= 5
    assert est["small"].v_zero > 0  # small-range branch exercised

    merged = hll_merge(sk, "g", "<all>")
    direct = hll_sketch(rows.select(F.lit("<all>").alias("g"), "v"), "g", "v")
    m = sorted((r._bkt, r._reg) for r in merged.collect())
    d = sorted((r._bkt, r._reg) for r in direct.collect())
    assert m == d  # merge is exact, not approximate


def test_hll_linear_counting_floor_stable():
    # The linear-counting branch rounds m*ln(m/V) via floor(x + 0.5).
    # For it to be bit-stable across Spark (java.lang.Math.log) and
    # DuckDB (libm log), no possible input may sit near a .5 boundary:
    # a 1-ulp disagreement is ~1e-13, so 1e-3 slack is 10 orders of
    # magnitude of margin. V ranges over 1..m-1 — check exhaustively.
    import math

    m = 256
    gap = min(abs((m * math.log(m / v)) % 1.0 - 0.5) for v in range(1, m))
    assert gap > 1e-3


def test_cms_point_estimate_absent_token_is_zero(spark):
    # A CMS point query is defined for EVERY key: a token that never
    # occurred in the sketched stream must estimate 0 (or a small
    # collision count), never vanish from the output — callers
    # threshold/count the returned rows (sketch_salted_join probes the
    # full key domain, which can include keys with zero fact rows).
    from stonkwhisperer_spark.operators.sketches import (
        cms_point_estimates,
        cms_table,
    )

    toks = spark.createDataFrame([("seen",)] * 5, "tok string")
    cms = cms_table(toks, "tok", d=4, width=1024)
    probe = spark.createDataFrame([("seen",), ("never",)], "tok string")
    est = {r.tok: r.est_cnt for r in cms_point_estimates(probe, "tok", cms, d=4, width=1024).collect()}
    assert set(est) == {"seen", "never"}  # nothing dropped
    assert est["seen"] >= 5  # one-sided
    assert est["never"] <= 1  # 0 unless all 4 buckets collide


def test_dist_zip_rank_is_bigint(spark):
    # The positional-zip global rank must be 64-bit: at >2^31 rows a
    # 32-bit rank wraps and the equi-join silently mispairs.
    from stonkwhisperer_spark.operators.asof import _global_rank

    df = spark.range(10).select(F.col("id").alias("v"))
    ranked = _global_rank(df, ["v"], nparts=4)
    assert dict(ranked.dtypes)["_zip_rn"] == "bigint"


def test_canonical_url_cross_engine_edges(spark, duck):
    # Edge inputs beyond what the registered query synthesizes: empty
    # path, tracking-only query (empty after filter — the DuckDB
    # array_to_string-of-empty-list NULL trap), prefix-named params
    # that must NOT be dropped (ref_src vs ref), whitespace padding,
    # mixed-case scheme, and param-order stability.
    from stonkwhisperer_spark.functions.urls import canonical_url, canonical_url_sql

    urls = [
        "https://other.com/",
        "https://other.com",
        " https://pad.me/x?ref=tw ",
        "https://h.io/p?ref_src=keepme&id=1",
        "http://site.org:80/a/b?z=2&a=1&utm_medium=m",
        "http://site.org/a/b?a=1&z=2",
        "HtTpS://UP.example.COM:443/P/Q/?UTM_x=1#frag",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.c for r in df.select(canonical_url("url").alias("c")).collect()]
    duck.execute("CREATE OR REPLACE TABLE _urls(url VARCHAR)")
    duck.executemany("INSERT INTO _urls VALUES (?)", [(u,) for u in urls])
    want = [r[0] for r in duck.execute(
        f"SELECT {canonical_url_sql('url')} FROM _urls"
    ).fetchall()]
    assert got == want
    assert got[0] == got[1] == "https://other.com"  # trailing slash + empty path
    assert got[2] == "https://pad.me/x"  # tracking-only query drops cleanly
    assert got[3] == "https://h.io/p?id=1&ref_src=keepme"  # ref_src kept, sorted
    assert got[4] == got[5]  # port + tracking + param order all collapse
    # UTM_x is case-sensitive by design (params are case-significant);
    # scheme/host still fold and the fragment drops.
    assert got[6] == "https://up.example.com/P/Q?UTM_x=1"


def test_quantile_summary_error_bound_and_merge(spark):
    # Skewed values (squares) across 8 buckets, k=16: the estimate's
    # true rank must be within N/2k + discretization of the target —
    # assert the structural N/k bound. Merging two disjoint shards'
    # summaries (plain union) must satisfy the same bound on the
    # combined corpus: the weights carry, nothing re-reads the shards.
    from stonkwhisperer_spark.operators.sketches import (
        quantile_estimates,
        quantile_summary,
    )

    n = 4000
    vals = [(i % 8, (i * i) % 100000) for i in range(n)]
    df = spark.createDataFrame(vals, "bucket int, val long")

    def check(est_df, full_vals):
        full = sorted(full_vals)
        n_tot = len(full)
        for r in est_df.collect():
            true_rank = sum(1 for v in full if v <= r.est_value)
            target = r.pct * n_tot / 100
            assert abs(true_rank - target) <= n_tot / 16, (r.pct, true_rank, target)

    summ = quantile_summary(df, "val", F.col("bucket"), k=16)
    check(quantile_estimates(summ, [50, 90, 99]), [v for _, v in vals])

    # Shard merge: two halves sketched independently, summaries unioned.
    a = spark.createDataFrame(vals[: n // 2], "bucket int, val long")
    b = spark.createDataFrame(vals[n // 2 :], "bucket int, val long")
    sa = quantile_summary(a, "val", F.col("bucket"), k=16)
    # disjoint bucket ids so the union keeps both shards' leaves
    sb = quantile_summary(b, "val", (F.col("bucket") + 8), k=16)
    merged = sa.unionByName(sb)
    check(quantile_estimates(merged, [50, 90, 99]), [v for _, v in vals])


def test_bloom_no_false_negatives_and_merge_identity(spark):
    # Contract 1: every inserted key passes the probe — no false
    # negatives, ever. Contract 2: merging per-shard blooms (bitwise
    # OR per word) is IDENTICAL to building one bloom over the union.
    # Contract 3: with m sized ~12 bits/key the FP rate on a disjoint
    # probe set stays near the design point, not saturated.
    from stonkwhisperer_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    d, m = 4, 1 << 12  # 4096 bits for ~340 keys ≈ 12 bits/key
    members = spark.createDataFrame(
        [(f"key{i}",) for i in range(340)], "k string"
    )
    bloom = bloom_build(members, "k", d=d, m_bits=m)

    flags = {
        r.k: r.might_contain
        for r in bloom_probe(members, "k", bloom, d=d, m_bits=m).collect()
    }
    assert all(flags.values())  # no false negatives

    strangers = spark.createDataFrame(
        [(f"other{i}",) for i in range(2000)], "k string"
    )
    fp = sum(
        1
        for r in bloom_probe(strangers, "k", bloom, d=d, m_bits=m).collect()
        if r.might_contain
    )
    # design FP ~ (1 - e^(-d*n/m))^d ~ 0.5%; allow generous slack
    assert fp / 2000 < 0.05

    # merge identity: shard blooms OR'd == direct bloom over the union
    half_a = members.filter(F.substring("k", 4, 10).cast("int") % 2 == 0)
    half_b = members.filter(F.substring("k", 4, 10).cast("int") % 2 == 1)
    merged = bloom_merge(
        bloom_build(half_a, "k", d=d, m_bits=m).unionByName(
            bloom_build(half_b, "k", d=d, m_bits=m)
        )
    )
    direct = {(r.word, r.bits) for r in bloom.collect()}
    assert {(r.word, r.bits) for r in merged.collect()} == direct


def test_bloom_prune_query_confusion_cells(spark):
    # The registered query's contract: the (is_member=true,
    # bloom_pass=false) cell must NOT exist, and every member key must
    # land in the (true, true) cell.
    from stonkwhisperer_spark.plans.registry import query_map

    rows = query_map()["bloom_prune_lineitem"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    cells = {(r.is_member, r.bloom_pass): r.n_keys for r in rows}
    assert (True, False) not in cells  # no false negatives
    assert cells.get((True, True), 0) > 0


def test_kmv_set_ops_exact_below_k(spark):
    # Two shards with a known overlap, all vocab sizes below K: the
    # sketch "estimates" must be EXACT (n_union < k path) and the
    # intersection formula must reproduce the true intersection.
    from stonkwhisperer_spark.operators.sketches import kmv_merge, kmv_sketch

    k = 64
    rows = spark.createDataFrame(
        [("a", f"shared{i}") for i in range(10)]
        + [("a", f"onlya{i}") for i in range(5)]
        + [("b", f"shared{i}") for i in range(10)]
        + [("b", f"onlyb{i}") for i in range(7)],
        "shard string, tok string",
    )
    sk = kmv_sketch(rows, "shard", "tok", k=k)
    u = kmv_merge(sk, "shard", "u", k=k)
    c = (
        u.join(sk.filter(F.col("shard") == "a").select("_h"), "_h")
        .join(sk.filter(F.col("shard") == "b").select("_h"), "_h")
        .count()
    )
    n_u = u.count()
    assert n_u == 22  # 10 shared + 5 + 7
    assert c == 10  # exact intersection below K


def test_bm25_idf_fixed_point_cross_engine(spark):
    """bm25_topk_docs is integer-exact EXCEPT one ln over an exact
    double ratio, fixed-pointed at 2^16 immediately after. IEEE
    division is correctly rounded (identical in both engines), but
    libm ln implementations may differ by 1 ulp — this sweep pins
    floor(65536·ln((2N+2)/(2df+1)) + 0.5) for EVERY df in a domain
    far beyond any tested corpus's vocabulary document frequencies
    (df up to 200k at three corpus sizes), so a divergence that could
    ever flip a gated score fails here first."""
    import duckdb

    from stonkwhisperer_spark.plans.queries_text import _BM25_SCALE

    for n_docs in (350, 35_000, 200_000):
        spark_vals = (
            spark.range(1, n_docs + 1)
            .selectExpr(
                "id AS df",
                f"CAST(floor({_BM25_SCALE} * ln("
                f"  CAST(2 * {n_docs} + 2 AS DOUBLE) / CAST(2 * id + 1 AS DOUBLE)"
                f") + 0.5) AS BIGINT) AS idf_s",
            )
            .toPandas()
            .set_index("df")["idf_s"]
        )
        duck_vals = (
            duckdb.sql(
                f"SELECT r.range AS df, "
                f"CAST(floor({_BM25_SCALE} * ln("
                f"  CAST(2 * {n_docs} + 2 AS DOUBLE) / CAST(2 * r.range + 1 AS DOUBLE)"
                f") + 0.5) AS BIGINT) AS idf_s "
                f"FROM range(1, {n_docs + 1}) r"
            )
            .df()
            .set_index("df")["idf_s"]
        )
        diff = (spark_vals != duck_vals).sum()
        assert diff == 0, f"n_docs={n_docs}: {diff} df values disagree"


def test_pagerank_fixed_point_structure(spark):
    """pagerank (operators/graph.py) on crafted graphs: a 2-cycle is
    symmetric (equal ranks, total mass ~ scale within the documented
    floor leak); a star funnels mass to the center; a source->sink
    chain leaves the source at the bare teleport term."""
    from stonkwhisperer_spark.operators.graph import pagerank

    scale = 10**12

    cyc = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    r = {row.node: row.rank_scaled for row in pagerank(cyc, scale=scale).collect()}
    assert r[1] == r[2]
    leak_bound = 2 * 8 + 16  # |E| * iters floor units + init rounding
    assert scale - leak_bound <= r[1] + r[2] <= scale

    # star: leaves 2..5 -> center 1, center -> leaf 2 (so no dangling)
    star = spark.createDataFrame(
        [(i, 1) for i in range(2, 6)] + [(1, 2)], "src long, dst long"
    )
    s = {row.node: row.rank_scaled for row in pagerank(star, scale=scale).collect()}
    # mass ping-pongs between center and leaf 2 with period 2, so the
    # parity-robust claims are: that pair holds the bulk of the mass,
    # and the three pure leaves tie exactly at the teleport floor.
    assert s[1] + s[2] > (7 * scale) // 10
    assert s[1] > s[3] and s[2] > s[3]
    assert s[3] == s[4] == s[5]

    # chain 1 -> 2 -> 3, 3 -> 2 (keeps 3 non-dangling): node 1 receives
    # nothing, so after round 1 it sits exactly at the teleport term.
    chain = spark.createDataFrame([(1, 2), (2, 3), (3, 2)], "src long, dst long")
    c = {row.node: row.rank_scaled for row in pagerank(chain, scale=scale).collect()}
    assert c[1] == (3 * scale) // (20 * 3)
    # 2<->3 also oscillates with period 2; the parity-free claim is
    # that both hold far more than the never-fed source.
    assert c[2] > c[1] and c[3] > c[1]


def test_prefix_filter_is_lossless_vs_plain_jaccard(spark):
    """The PPJoin prefix-filter theorem claim pinned empirically:
    jaccard_pairs_prefix (threshold 4/5) returns EXACTLY the pair set
    of the plain inverted-index jaccard_pairs (threshold 0.8) — same
    pairs, same scores — on a corpus engineered with hot shingles,
    exact duplicates, barely-over and barely-under pairs, and docs
    with no near-dups. A prefix length rounded wrong (the float-ceil
    trap) or a candidate wrongly excluded shows up as a set diff."""
    from pyspark.sql import functions as F

    from stonkwhisperer_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )

    # Postings built directly: doc -> distinct shingle set.
    sets = {
        1: list(range(10)),                 # base
        2: list(range(10)),                 # exact dup of 1 (J=1.0)
        3: list(range(9)) + [99],           # J(1,3)=9/11 >= 0.8 (barely over)
        4: list(range(10)) + [100, 101],    # J(1,4)=10/12 > 0.8
        5: [0, 1, 2, 200, 201, 202],        # shares the hot head only
        6: [300 + i for i in range(5)],     # disjoint singleton
        7: list(range(8)) + [400, 401],     # J(1,7)=8/12 < 0.8
        8: list(range(10)) + [100],         # J(1,8)=10/11 >= 0.8; J(4,8)=11/12
    }
    rows = [(d, f"s{s}") for d, ss in sets.items() for s in ss]
    postings = spark.createDataFrame(rows, "doc_id long, shingle string")

    plain = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(postings, threshold=0.8).collect()
    }
    pref = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs_prefix(
            postings, threshold_num=4, threshold_den=5
        ).collect()
    }
    assert set(plain) == set(pref)
    for k in plain:
        assert abs(plain[k] - pref[k]) < 1e-12, k
    # sanity: the engineered edges are actually in the answer
    assert (1, 2) in plain and (1, 4) in plain and (1, 8) in plain
    assert (1, 3) in plain          # 9/11 = 0.818, barely over
    assert (1, 7) not in plain      # 8/12 = 0.667, under
    assert not any(5 in k or 6 in k for k in plain)  # hot-head-only / disjoint

    # guard_doc_freq (ADVICE r10): a PASSING guard is a no-op — the
    # byte-identical pair set — while an exceeded guard fails loudly
    # with a diagnostic naming the hot shingle, instead of silently
    # growing one task's aggregation state. Hottest shingle here is
    # s0 (docs 1,2,3,4,5,7,8 → df=7).
    guarded = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs_prefix(
            postings, threshold_num=4, threshold_den=5, guard_doc_freq=7
        ).collect()
    }
    assert guarded == pref
    import pytest

    # AQE may wrap USER_RAISED_EXCEPTION in a stage-materialization
    # error, so match the diagnostic text, not the exception class.
    with pytest.raises(Exception, match="doc-frequency guard"):
        jaccard_pairs_prefix(
            postings, threshold_num=4, threshold_den=5, guard_doc_freq=6
        ).collect()


def test_assign_digest_sensitivity(spark):
    """The r12 digest gate (ivf_assign_incremental / ivf_recluster_
    replace) replaces the O(corpus) assignment collect, so its
    discriminating power IS the correctness guarantee: a single
    misassigned vector must change the digest (count moves between two
    cells), and — the subtler case — a count-preserving SWAP of two
    vectors between cells must change it too (counts identical; the
    modular id sums catch it)."""
    from stonkwhisperer_spark.plans.queries_llm import _assign_digest

    def digest(rows):
        df = spark.createDataFrame(rows, "vec_id bigint, cell bigint")
        return sorted(map(tuple, _assign_digest(df).collect()))

    base = [(i, i % 5) for i in range(100)]
    # Single misassignment: vec 37 moves cell 2 -> 3.
    mis = [(i, 3 if i == 37 else i % 5) for i in range(100)]
    # Count-preserving swap: vec 12 (cell 2) and vec 13 (cell 3)
    # trade cells — every cell keeps its count.
    swap = [
        (i, {12: 3, 13: 2}.get(i, i % 5)) for i in range(100)
    ]
    d0, d1, d2 = digest(base), digest(mis), digest(swap)
    assert d0 != d1, "digest missed a single misassignment"
    assert d0 != d2, "digest missed a count-preserving swap"
    # And the swap really is count-preserving (the hard case).
    counts = lambda d: sorted((r[0], r[1]) for r in d)  # noqa: E731
    assert counts(d0) == counts(d2)

    # ADVICE r12: the algebraic (count, sum, sumsq, min, max) columns
    # have constructible collisions — {10,60,80} and {20,40,90} share
    # count/sum/sum-of-squares, so trading them between two cells whose
    # min/max anchors sit outside both ranges is invisible to every
    # column EXCEPT the keyed-hash sum. Pin that hsum_mod is what
    # catches it: all other columns must be identical across the trade.
    parts_a, parts_b = [10, 60, 80], [20, 40, 90]
    anchors = [(5, 0), (95, 0), (6, 1), (96, 1)]
    alg_base = anchors + [(v, 0) for v in parts_a] + [(v, 1) for v in parts_b]
    alg_swap = anchors + [(v, 1) for v in parts_a] + [(v, 0) for v in parts_b]
    b, s = digest(alg_base), digest(alg_swap)
    assert b != s, "digest missed an equal-count/sum/sumsq cell trade"
    drop_hsum = lambda d: [r[:4] + r[5:] for r in d]  # noqa: E731
    assert drop_hsum(b) == drop_hsum(s), (
        "expected the algebraic columns to collide on this construction "
        "(the case exists to prove hsum_mod adds independent power)"
    )
