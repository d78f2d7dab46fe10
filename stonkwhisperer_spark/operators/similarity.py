"""Similarity search over embedding columns (array<float>).

Two tiers:
  * ``knn_bruteforce`` — exact cosine top-k of every query vector
    against all candidates. O(|Q|·|C|) scans; the correctness baseline
    and fine when |Q| is small (queries broadcast).
  * ``hyperplane_bucket`` — random-hyperplane LSH: each vector maps to
    a small integer bucket (sign bits of dot products with n_planes
    pseudo-random hyperplanes). Restricting search to equal (or
    near-by) buckets is the 100 TB path: the candidate join becomes a
    bucket-equi join instead of a cross join.

Dot products fold left-to-right with ``F.aggregate`` over doubles —
bit-identical to DuckDB's list_reduce, which the oracle uses. No UDFs,
but note the array lambdas (``zip_with``/``aggregate``) execute
INTERPRETED, not in whole-stage codegen — the fold is chosen
deliberately for oracle bit-parity. For throughput-critical scoring use
``dot_unrolled`` (literal-indexed codegen sum; needs a fixed dim and
tolerates a different FP association) — see the ``codegen=`` option on
``knn_bruteforce``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

import hashlib


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i], left-to-right double fold (IEEE-deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    """Euclidean norm, same fold order as dot()."""
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# Crossover between the two kernel shapes (docs/kernel_dim_bench.py,
# 2M pairs, min-of-3, integer dot): the literal-indexed unrolled
# expression stays inside whole-stage codegen + JIT through dim 16
# (dim 8: 0.30 s vs 0.55 s for the HOF fold; dim 16: 0.43 vs 1.04)
# and falls off the hugeMethodLimit cliff into interpreted node-walk
# evaluation by dim 32 (4.71 vs 1.08; dim 64: 11.3 vs 3.7). Both
# shapes fold strictly left-to-right, so results are bit-identical —
# the choice is performance-only. PQ subspace kernels run at
# dsub = dim/M = 8; the full-vector kernels at 64.
_UNROLL_MAX_DIM = 16


def dot_unrolled_int(a: str, b: str, dim: int) -> Column:
    """Σ a[i]·b[i] over BIGINT-element arrays — EXACT and summation-
    order-free (integer addition; the hash-portability requirement of
    the fixed-point similarity queries; see queries_llm.py
    semantic_dedup). The arrays are exactly ``dim`` elements by
    construction; ``dim`` also picks the kernel shape (see
    ``_UNROLL_MAX_DIM``): small dims keep the codegen'd literal-
    indexed sum, large dims use one ``zip_with + aggregate`` pass —
    the former dim-64 unrolled expression exceeded ``hugeMethodLimit``
    and ran INTERPRETED (2·dim element_at node walks per row).
    Measured at sf0.1 on 249k 64-dim pairs: dot 1.58 s → 0.31 s,
    sqdist 0.57 s → 0.31 s against a 0.23 s scan floor, identical
    results."""
    if dim <= _UNROLL_MAX_DIM:
        terms = " + ".join(
            f"(element_at({a}, {d + 1}) * element_at({b}, {d + 1}))"
            for d in range(dim)
        )
        return F.expr(f"CAST(0 AS BIGINT) + {terms}")
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def sqdist_unrolled_int(a: str, b: str, dim: int) -> Column:
    """Σ (a[i]-b[i])² over BIGINT-element arrays, exact (see
    dot_unrolled_int, incl. the dim-based kernel-shape pick) — the
    k-means assignment kernel; PQ calls it at dsub=8 where the
    unrolled shape is ~2× faster (codegen + JIT)."""
    if dim <= _UNROLL_MAX_DIM:
        terms = " + ".join(
            f"((element_at({a}, {d + 1}) - element_at({b}, {d + 1}))"
            f" * (element_at({a}, {d + 1}) - element_at({b}, {d + 1})))"
            for d in range(dim)
        )
        return F.expr(f"CAST(0 AS BIGINT) + {terms}")
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Σ a[i]·b[i] over fixed-dim arrays as doubles. Association is the
    same left-to-right (((0+p1)+p2)+...) as ``dot``'s fold, so results
    match the oracle's list_reduce bit-for-bit on the same doubles.

    Implementation (optimization r15): one ``zip_with + aggregate``
    pass — see ``dot_unrolled_int`` for the measurement that retired
    the dim-unrolled literal-indexed expression (it overflowed
    ``hugeMethodLimit`` into interpreted node-walk evaluation; the HOF
    loop is ~5× faster end-to-end on the pair volume and builds in a
    handful of py4j calls)."""
    del dim
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_unrolled(a: Column | str, dim: int) -> Column:
    """Euclidean norm via the same left-to-right fold order as
    ``norm`` (see dot_unrolled)."""
    del dim
    ca = F.col(a) if isinstance(a, str) else a
    sq = F.transform(ca, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def knn_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "embedding",
    codegen_dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self-match
    excluded when ids collide). Deterministic: cosine ties break on
    candidate id.

    Scale: queries are broadcast (small side); candidates stream
    through a single narrow pass per partition; norms are computed ONCE
    per vector (not per pair), so each pair costs a single dot fold;
    the top-k is a window over q_id — with few queries, partitions are
    |C| rows each, so for large |Q| switch to the LSH-bucketed path.

    ``codegen_dim``: when the embedding dim is fixed and known, pass it
    to score with the unrolled codegen expressions instead of the
    interpreted array folds (same fold order, JVM codegen throughput)."""
    if codegen_dim is not None:
        _norm = lambda col: norm_unrolled(col, codegen_dim)  # noqa: E731
        _dot = lambda a, b: dot_unrolled(a, b, codegen_dim)  # noqa: E731
        qn, cn, dv, dw = vec, vec, "_qv", "_cv"  # names → single-expr build
    else:
        _norm, _dot = norm, dot
        qn = cn = F.col(vec)
        dv, dw = F.col("_qv"), F.col("_cv")
    q = queries.select(F.col(q_id), F.col(vec).alias("_qv"), _norm(qn).alias("_qn"))
    c = candidates.select(F.col(c_id), F.col(vec).alias("_cv"), _norm(cn).alias("_cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(q_id) != F.col(c_id))
        .select(
            q_id,
            c_id,
            (_dot(dv, dw) / (F.col("_qn") * F.col("_cn"))).alias("cosine"),
        )
    )
    w = W.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1]:
    md5-derived, computed once driver-side and inlined as a literal —
    any engine (or oracle SQL) reproduces the exact double."""
    h = int(hashlib.md5(f"p{plane}d{dim}".encode()).hexdigest()[:15], 16)
    return ((h % 2001) - 1000) / 1000.0


def probe_buckets(bucket: Column, multi_probe: int) -> Column:
    """Probe set for multi-probe LSH: the primary bucket plus the
    ``multi_probe`` buckets at Hamming distance 1 (each sign bit
    flipped in turn). A vector near hyperplane p can land on either
    side of it; probing the flipped bucket recovers neighbors the hard
    sign split separated — recall rises at the cost of multi_probe+1
    candidate lookups per vector (still bucket-bounded, never
    all-pairs)."""
    return F.array(bucket, *[bucket.bitwiseXOR(F.lit(1 << p)) for p in range(multi_probe)])


def lsh_candidate_pairs(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    multi_probe: int = 0,
) -> DataFrame:
    """Unordered candidate pairs (id_a < id_b) whose LSH buckets
    collide; with ``multi_probe`` > 0 the left side also probes the
    Hamming-1 buckets of its first ``multi_probe`` planes. One equi
    shuffle on bucket; quadratic work bounded per bucket
    (Σ|bucket|·|probed bucket|), pairs deduped once at the end."""
    if multi_probe > n_planes:
        # Flipping a bit beyond the bucket width would make probe ids
        # outside 0..2^n_planes-1 that can never match a primary bucket
        # — pure wasted shuffle rows, not added recall.
        raise ValueError(
            f"multi_probe ({multi_probe}) cannot exceed n_planes ({n_planes})"
        )
    b = hyperplane_bucket(vec, n_planes, dim)
    left = vecs.select(
        F.col(id_col).alias("id_a"),
        F.explode(probe_buckets(b, multi_probe)).alias("bucket"),
    )
    right = vecs.select(F.col(id_col).alias("id_b"), b.alias("bucket"))
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def hyperplane_bucket(vec: Column | str, n_planes: int, dim: int) -> Column:
    """LSH bucket id (0..2^n_planes-1): bit p = sign of <vec, plane_p>.
    Map-only; the plane components are literals, the per-plane dot is a
    left-chained double sum (same order as an oracle SQL twin). Pass a
    column NAME for single-``F.expr`` construction (one py4j call for
    the n_planes·dim-term tree instead of thousands — see
    dot_unrolled)."""
    if isinstance(vec, str):
        plane_sums = []
        for p in range(n_planes):
            terms = " + ".join(
                f"(cast(element_at({vec}, {d + 1}) as double) * {plane_component(p, d)!r}D)"
                for d in range(dim)
            )
            plane_sums.append(
                f"(CASE WHEN 0.0D + {terms} >= 0 THEN {1 << p} ELSE 0 END)"
            )
        return F.expr(f"cast({' + '.join(plane_sums)} as int)")
    bucket = F.lit(0)
    for p in range(n_planes):
        s: Column = F.lit(0.0)
        for d in range(dim):
            s = s + F.element_at(vec, d + 1).cast("double") * F.lit(plane_component(p, d))
        bucket = bucket + F.when(s >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")


def ivf_assign(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    cent_id: str = "cent_id",
    vec: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine (deterministic ties → smallest cent_id).
    Returns (id_col, cell, _vn, vec) — norm and embedding ride along so
    downstream search needs no re-join against the vector table.

    Scale: centroids broadcast (k rows); each vector expands to k
    scored rows MAP-SIDE, then ONE partial-aggregated shuffle of a
    single row per vector picks the argmax — max over a
    (cosine, -cent_id, payload) struct is lexicographic, so the payload
    columns never influence the choice. No window sort, no driver
    round trip."""
    c = centroids.select(
        F.col(cent_id), F.col(vec).alias("_cv"), norm_unrolled(vec, dim).alias("_cn")
    )
    v = vecs.select(F.col(id_col), F.col(vec), norm_unrolled(vec, dim).alias("_vn"))
    scored = v.crossJoin(F.broadcast(c)).select(
        id_col,
        vec,
        "_vn",
        cent_id,
        (dot_unrolled(vec, "_cv", dim) / (F.col("_vn") * F.col("_cn"))).alias("_cos"),
    )
    best = F.max(
        F.struct(
            F.col("_cos").alias("c"),
            (-F.col(cent_id)).alias("nc"),
            F.col("_vn").alias("vn"),
            F.col(vec).alias("v"),
        )
    ).alias("_best")
    return scored.groupBy(id_col).agg(best).select(
        id_col,
        (-F.col("_best.nc")).alias("cell"),
        F.col("_best.vn").alias("_vn"),
        F.col("_best.v").alias(vec),
    )


def ivf_probe(
    queries: DataFrame,
    centroids: DataFrame,
    probes: int,
    q_id: str = "q_id",
    vec: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-query probe list: the ``probes`` nearest centroid cells by
    cosine (ties → smallest cell). Returns (q_id, _qv, _qn, cell) — the
    query vector and norm ride along so candidate scoring needs no
    re-join. Centroids broadcast; the ranking window partitions on the
    (small) query set only."""
    c = centroids.select(
        F.col("cent_id"), F.col(vec).alias("_cv"), norm_unrolled(vec, dim).alias("_cn")
    )
    q = queries.select(F.col(q_id), F.col(vec).alias("_qv"), norm_unrolled(vec, dim).alias("_qn"))
    qscore = q.crossJoin(F.broadcast(c)).select(
        q_id,
        "_qv",
        "_qn",
        F.col("cent_id").alias("cell"),
        (dot_unrolled("_qv", "_cv", dim) / (F.col("_qn") * F.col("_cn"))).alias("_cos"),
    )
    wq = W.partitionBy(q_id).orderBy(F.desc("_cos"), F.col("cell"))
    return (
        qscore.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= probes)
        .select(q_id, "_qv", "_qn", "cell")
    )


def ivf_topk(
    queries: DataFrame,
    vecs: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    probes: int = 2,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF approximate top-k: each query probes its ``probes`` nearest
    centroid cells and ranks ONLY the vectors assigned there by exact
    cosine. Returns (q_id, c_id, cosine), ties on c_id; self-matches
    excluded.

    Scale: the inverted-file discipline — search cost drops from
    |Q|·|V| to |Q|·probes·avg_cell, and the candidate join is an
    equi-join on cell with the (tiny) probe list broadcast, so the
    vector table is touched by exactly one scan + one assignment
    shuffle. Recall < 1 by construction; raise ``probes`` to trade
    compute for recall (nprobe in FAISS terms)."""
    assign = ivf_assign(vecs, centroids, id_col=c_id, vec=vec, dim=dim)
    probe = ivf_probe(queries, centroids, probes, q_id=q_id, vec=vec, dim=dim)
    scored = (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col(q_id) != F.col(c_id))
        .select(
            q_id,
            c_id,
            (dot_unrolled("_qv", vec, dim) / (F.col("_qn") * F.col("_vn"))).alias("cosine"),
        )
    )
    wk = W.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (
        scored.withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8): 4x-compressed int8 vector codes + asymmetric
# distance computation — the memory-side ANN scale lever (FAISS SQ8 /
# Milvus IVF_SQ8 shape, complementing the LSH/IVF search-side levers).
# ---------------------------------------------------------------------------
def sq8_codebook(
    vecs: DataFrame, vec: str = "embedding", dim: int = 64
) -> tuple[list[float], list[float]]:
    """Per-dimension [min, max] over the corpus — the scalar-quantization
    codebook. ONE aggregation pass (2·dim map-side-combined min/max
    partials), 2·dim doubles on the driver; broadcast into every
    quantize/dequantize expression as literals. Exact regardless of
    partitioning (min/max are order-free), so re-deriving the codebook
    on any engine yields identical codes."""
    row = vecs.agg(
        *[F.min(F.col(vec)[i].cast("double")).alias(f"_lo{i}") for i in range(dim)],
        *[F.max(F.col(vec)[i].cast("double")).alias(f"_hi{i}") for i in range(dim)],
    ).collect()[0]
    return (
        [row[f"_lo{i}"] for i in range(dim)],
        [row[f"_hi{i}"] for i in range(dim)],
    )


def _sq8_code(vec: str, i: int, lo: float, hi: float):
    """8-bit code for dimension ``i``: floor((v-lo)/(hi-lo)·256) clamped
    to [0,255]; constant dimensions (hi == lo) code 0."""
    if not hi > lo:
        return F.lit(0).cast("bigint")
    ratio = (F.col(vec)[i].cast("double") - F.lit(lo)) / F.lit(hi - lo) * F.lit(256)
    return F.least(F.lit(255), F.greatest(F.lit(0), F.floor(ratio).cast("bigint")))


def _dequant_array(
    src: str, los: list[float], his: list[float], dim: int
) -> Column:
    """Bucket-midpoint dequantized double array of an SQ8-coded vector
    (reconstruction = lo + (code + 0.5)·(hi - lo)/256), built ONCE per
    candidate row — the shared ADC candidate side of :func:`sq8_topk`
    and :func:`ivfsq8_topk`, kept in one place so the documented
    bit-identical evaluation order cannot drift between them."""

    def _d(i: int) -> Column:
        lo, hi = los[i], his[i]
        if not hi > lo:
            return F.lit(lo)
        scale = (hi - lo) / 256
        return F.lit(lo) + (
            _sq8_code(src, i, lo, hi).cast("double") + F.lit(0.5)
        ) * F.lit(scale)

    return F.array(*[_d(i) for i in range(dim)])


def sq8_codes(
    vec: str, los: list[float], his: list[float], dim: int = 64
) -> Column:
    """``array<tinyint>`` of per-dimension codes — the STORED form: 64
    bytes/vector instead of 256 (float32) or 512 (float64). At 100 TB
    of embeddings this 4× is the difference between an in-memory
    candidate scan and a spilled one. Codes are biased by -128 into
    signed-byte range (tinyint is signed); readers recover the
    unsigned code as ``stored + 128``."""
    return F.array(
        *[
            (_sq8_code(vec, i, los[i], his[i]) - F.lit(128)).cast("tinyint")
            for i in range(dim)
        ]
    )


def sq8_topk(
    queries: DataFrame,
    candidates: DataFrame,
    los: list[float],
    his: list[float],
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate max-inner-product top-k by ASYMMETRIC distance
    computation (ADC): queries stay full-precision, candidates are
    scored through their dequantized int8 codes (reconstruction =
    bucket midpoint: lo + (code + 0.5)·(hi - lo)/256). Returns
    (q_id, c_id, score), score ties broken on c_id; self-matches
    excluded. Deterministic to the bit: quantize, dequantize, and the
    left-fold dot use one fixed evaluation order, so any engine
    re-deriving them from the same codebook agrees exactly.

    Scale: same broadcast-queries/stream-candidates shape as
    :func:`knn_bruteforce` but the candidate side reads 1 byte per
    dimension — :func:`ivfsq8_topk` is the composed FAISS-style
    IVF_SQ8: bucket prune first, ADC-scan only the survivors."""
    q = queries.select(F.col(q_id), F.col(vec).alias("_qv"))
    # Dequantize ONCE per candidate (a 64-element array build), not once
    # per (candidate, query) pair — the former per-pair expression
    # re-ran the quantize+dequantize chain |Q|× per candidate and its
    # ~600-node tree exceeded hugeMethodLimit into interpreted
    # node-walk evaluation (optimization r15, guide §1.2 step 2). The
    # per-pair work is then ONE shared dot fold (dot_unrolled) in the
    # same left-to-right order, so scores are bit-identical.
    c = candidates.select(
        F.col(c_id),
        _dequant_array(vec, los, his, dim).alias("_dv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(q_id) != F.col(c_id))
        .select(q_id, c_id, dot_unrolled("_qv", "_dv", dim).alias("score"))
    )
    w = W.partitionBy(q_id).orderBy(F.desc("score"), F.col(c_id))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the third FAISS-style ANN leg next to the
# IVF coarse quantizer and SQ8 scalar quantization: split each vector
# into M subvectors, k-means each subspace into K centroids, store one
# K-ary code per subspace (M bytes/vector at K<=256 — here 8 codes, a
# 32x compression over float32), and answer queries by asymmetric
# distance over per-query lookup tables. Integer-exact throughout
# (2^20 fixed-point, the semantic_clusters convention) so a DuckDB twin
# reproduces codes and distances to the bit.
# ---------------------------------------------------------------------------
PQ_M = 8          # subspaces (64-dim corpus -> 8 dims each)
PQ_K = 16         # centroids per subspace; seeds = vec_id 0..15
PQ_SCALE = 1 << 20


def pq_subvectors(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
    m: int = PQ_M,
) -> DataFrame:
    """(id, m, sv): integer-quantized subvectors — one map-only pass,
    F.inline over a literal array of (m, slice) structs, everything in
    codegen. sv elements are floor(x·2^20) bigints, so all downstream
    distances are exact int64 (unit-norm components keep every
    subspace distance below 8·(2·2^20)² = 2^45)."""
    dsub = dim // m
    qv = [
        F.floor(F.col(vec)[i].cast("double") * F.lit(float(PQ_SCALE))).cast(
            "bigint"
        )
        for i in range(dim)
    ]
    subs = F.array(
        *[
            F.struct(
                F.lit(mm).cast("int").alias("m"),
                F.array(*qv[mm * dsub : (mm + 1) * dsub]).alias("sv"),
            )
            for mm in range(m)
        ]
    )
    return vecs.select(F.col(id_col), F.inline(subs))


def _pq_assign(sub: DataFrame, cents: DataFrame, dsub: int) -> DataFrame:
    """(id, m, key) with key = min over same-subspace centroids of
    dist·K + cid — the integer argmin encoding (cid < K), deterministic
    under ties. Centroids are M·K rows -> broadcast; one map-only pass
    + a partial-aggregated min keyed on (id, m)."""
    idc = sub.columns[0]
    return (
        sub.join(F.broadcast(cents), "m")
        .select(
            idc,
            "m",
            (sqdist_unrolled_int("sv", "cv", dsub) * PQ_K + F.col("cid")).alias(
                "key"
            ),
        )
        .groupBy(idc, "m")
        .agg(F.min("key").alias("key"))
    )


def pq_codebooks(sub: DataFrame, dsub: int) -> DataFrame:
    """(m, cid, cv): K centroids per subspace — seeds are the first K
    ids' subvectors, one Lloyd refinement with integer-mean updates
    (the semantic_clusters k-means, keyed by subspace). The update
    shuffle carries M·K·dsub values; assignment is broadcast+map."""
    idc = sub.columns[0]
    c0 = sub.filter(F.col(idc) < PQ_K).select(
        "m", F.col(idc).alias("cid"), F.col("sv").alias("cv")
    )
    a1 = _pq_assign(sub, c0, dsub).select(
        idc, "m", (F.col("key") % PQ_K).alias("cluster")
    )
    dims = (
        a1.join(sub, [idc, "m"])
        .select("m", "cluster", F.posexplode("sv").alias("i", "val"))
        .groupBy("m", "cluster", "i")
        .agg(F.expr("sum(val) DIV count(1)").alias("cval"))
    )
    return (
        dims.groupBy("m", "cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cval"))),
                lambda s: s.getField("cval"),
            ).alias("cv")
        )
        .select("m", F.col("cluster").alias("cid"), "cv")
    )


def pq_topk(
    vecs: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """PQ approximate k-NN: encode every vector as PQ_M subspace codes
    against corpus-learned codebooks, then rank candidates per query by
    ADC — the query's exact distance to each centroid, summed over the
    candidate's codes. Returns (q_id, c_id, adist) with adist ascending,
    ties on c_id, self-matches excluded. Queries = rows satisfying
    ``query_pred``.

    Scale: codes are M small ints per vector (32× under float32 — the
    reason PQ is the billion-vector default); the distance TABLE is
    |Q|·M·K rows broadcast into a map-only join against the codes, and
    the per-(q, c) sum is one partial-aggregated shuffle keyed on
    uniform ids. :func:`ivfpq_topk` is the IVF composition (FAISS
    IVF-PQ): coarse cells prune candidates, PQ codes score survivors."""
    codes, dt = _pq_train_encode(vecs, query_pred, id_col, vec, dim)
    adist = (
        codes.join(F.broadcast(dt), ["m", "code"])
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id", "c_id")
        .agg(F.sum("d").cast("bigint").alias("adist"))
    )
    w = W.partitionBy("q_id").orderBy(F.asc("adist"), F.col("c_id"))
    return (
        adist.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _pq_query_sub(
    vecs: DataFrame,
    sub: DataFrame,
    query_pred: Column,
    id_col: str,
    vec: str,
    dim: int,
) -> DataFrame:
    """Query-side subvectors as (q_id, m, sv). When ``query_pred`` only
    references columns present on the already-checkpointed subvector
    frame (the common id-only case), filter THAT instead of re-running
    the quantization chain on the vector table (ADVICE r7) — resolved
    by attempting the cheap plan and falling back on analysis failure."""
    from pyspark.errors import AnalysisException

    try:
        return sub.filter(query_pred).select(
            F.col(id_col).alias("q_id"), "m", "sv"
        )
    except AnalysisException:  # predicate needs vector-table columns
        return pq_subvectors(vecs.filter(query_pred), id_col, vec, dim).select(
            F.col(id_col).alias("q_id"), "m", "sv"
        )


def _pq_train_encode(
    vecs: DataFrame,
    query_pred: Column,
    id_col: str,
    vec: str,
    dim: int,
) -> tuple[DataFrame, DataFrame]:
    """The shared PQ chain behind :func:`pq_topk` and :func:`ivfpq_topk`:
    train codebooks on the corpus subvectors (both frames eagerly
    checkpointed — they are read by multiple consumers), encode every
    vector as (c_id, m, code), and build the query-side ADC distance
    table (q_id, m, code, d). One definition so the composed and
    uncomposed paths can never diverge."""
    dsub = dim // PQ_M
    sub = pq_subvectors(vecs, id_col, vec, dim).localCheckpoint(eager=True)
    cents = pq_codebooks(sub, dsub).localCheckpoint(eager=True)
    codes = _pq_assign(sub, cents, dsub).select(
        F.col(id_col).alias("c_id"), "m", (F.col("key") % PQ_K).alias("code")
    )
    qsub = _pq_query_sub(vecs, sub, query_pred, id_col, vec, dim)
    dt = qsub.join(F.broadcast(cents), "m").select(
        "q_id",
        "m",
        F.col("cid").alias("code"),
        sqdist_unrolled_int("sv", "cv", dsub).alias("d"),
    )
    return codes, dt


def ivfpq_topk(
    vecs: DataFrame,
    centroids: DataFrame,
    query_pred: Column,
    k: int = 5,
    probes: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF×PQ — the FAISS IVF-PQ billion-vector default, composed from
    the two legs this module already ships: the IVF coarse quantizer
    prunes the candidate set to each query's ``probes`` nearest cells,
    and PQ asymmetric distance scores ONLY those survivors through
    their 8-code compressed forms. Returns (q_id, c_id, adist)
    ascending, ties on c_id, self-matches excluded. PQ encodes the raw
    vectors, not cell residuals (FAISS ``by_residual=false``) — one
    corpus-wide codebook set keeps the distance tables |Q|·M·K and the
    whole chain integer-exact (2^20 fixed-point), so a SQL twin
    replays train → encode → prune → ADC to the bit; the coarse
    probe/assign side is the same order-fixed double cosine as
    :func:`ivf_topk`.

    Scale — what the composition buys at 10⁹+ vectors: uncomposed
    ``pq_topk`` is still a LINEAR scan (every vector's codes meet every
    query's distance table); here the ADC join and its per-(q,c)
    partial-aggregated sum touch probes·avg_cell candidates per query
    instead of N. Costs stay: one broadcast(|C| centroids)+map
    assignment shuffle, one broadcast(M·K)+map encode pass, then the
    pruned ADC. Memory stays M bytes/vector (32×) — prune-side AND
    compression-side levers at once, which is why this configuration
    is the one a 100 TB embedding corpus actually runs."""
    assign = ivf_assign(vecs, centroids, id_col=id_col, vec=vec, dim=dim).select(
        F.col(id_col).alias("c_id"), "cell"
    )
    probe = ivf_probe(
        vecs.filter(query_pred).select(F.col(id_col).alias("q_id"), vec),
        centroids,
        probes,
        vec=vec,
        dim=dim,
    ).select("q_id", "cell")
    codes, dt = _pq_train_encode(vecs, query_pred, id_col, vec, dim)
    # Prune FIRST, map-side: the probe list broadcasts into the coarse
    # assignment, so the (q_id, c_id) candidate set — probes·avg_cell
    # rows per query — exists BEFORE the codes table is touched; only
    # then do the survivors' codes meet the broadcast distance table
    # (AQE broadcasts the candidate side of the codes join when small).
    candidates = (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
    )
    adist = (
        codes.join(candidates, "c_id")
        .join(F.broadcast(dt), ["q_id", "m", "code"])
        .groupBy("q_id", "c_id")
        .agg(F.sum("d").cast("bigint").alias("adist"))
    )
    w = W.partitionBy("q_id").orderBy(F.asc("adist"), F.col("c_id"))
    return (
        adist.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def quantized_vectors(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
    out: str = "_qv",
) -> DataFrame:
    """(id, qv): the full vector in the PQ fixed-point integer domain
    (floor(x·2^20) per component, one map-only codegen projection).
    The exact-rescore twin of :func:`pq_subvectors` — distances over
    these arrays are exact int64, bit-replayable by a SQL engine."""
    qv = F.array(
        *[
            F.floor(F.col(vec)[i].cast("double") * F.lit(float(PQ_SCALE))).cast(
                "bigint"
            )
            for i in range(dim)
        ]
    )
    return vecs.select(F.col(id_col), qv.alias(out))


def ivfpq_refine_topk(
    vecs: DataFrame,
    centroids: DataFrame,
    query_pred: Column,
    k: int = 5,
    refine_factor: int = 4,
    probes: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF-PQ + exact re-ranking — FAISS's ``IVFPQ,Refine`` production
    default: :func:`ivfpq_topk` produces a per-query shortlist of
    ``refine_factor * k`` candidates through the compressed codes, then
    ONLY those candidates are re-scored against the raw (fixed-point
    quantized) vectors and the true top-k re-ranked by exact squared
    distance. Returns (q_id, c_id, rdist) ascending, ties on c_id.
    The refine step repairs exactly the errors PQ compression
    introduces: any true neighbor the shortlist caught is returned in
    its correct rank, so recall@k equals shortlist recall@(rf·k) — and
    the ranking among returned candidates is exact, which the
    uncomposed ADC ranking never guarantees.

    Scale: the shortlist is |Q|·rf·k rows — it BROADCASTS into the
    corpus's quantized-vector projection (one map-side join, no
    shuffle), the query side is |Q| quantized rows broadcast likewise,
    and the re-rank window partitions on q_id over rf·k rows per
    query. Cost on top of ivfpq_topk: ONE more corpus map pass +
    |Q|·rf·k exact 64-dim integer distances — the standard accuracy
    lever that avoids ever touching full vectors for non-candidates
    (at 10⁹ vectors the refine reads rf·k·|Q| raw vectors, not 10⁹)."""
    shortlist = ivfpq_topk(
        vecs,
        centroids,
        query_pred,
        k=refine_factor * k,
        probes=probes,
        id_col=id_col,
        vec=vec,
        dim=dim,
    ).select("q_id", "c_id")
    cq = quantized_vectors(vecs, id_col, vec, dim, out="_cqv").join(
        F.broadcast(shortlist),
        F.col(id_col) == F.col("c_id"),
    )
    qq = quantized_vectors(
        vecs.filter(query_pred), id_col, vec, dim, out="_qqv"
    ).select(F.col(id_col).alias("_q2"), "_qqv")
    rescored = cq.join(
        F.broadcast(qq), F.col("q_id") == F.col("_q2")
    ).select(
        "q_id",
        "c_id",
        sqdist_unrolled_int("_qqv", "_cqv", dim).alias("rdist"),
    )
    w = W.partitionBy("q_id").orderBy(F.asc("rdist"), F.col("c_id"))
    return (
        rescored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ivfsq8_topk(
    vecs: DataFrame,
    centroids: DataFrame,
    query_pred: Column,
    los: list[float],
    his: list[float],
    k: int = 5,
    probes: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF×SQ8 — FAISS ``IVF_SQ8``, composed from the coarse quantizer
    and the scalar-quantization leg exactly as :func:`ivfpq_topk`
    composes IVF×PQ: the probe list broadcasts into the coarse
    assignment so the candidate set (probes·avg_cell rows per query)
    exists BEFORE any scoring expression runs, then ONLY the survivors
    pay the asymmetric-distance score (full-precision query ·
    bucket-midpoint dequantized candidate, the same fixed-order fold as
    :func:`sq8_topk` — bit-reproducible from the codebook). Returns
    (q_id, c_id, score) descending, ties on c_id, self-matches
    excluded.

    Scale: uncomposed SQ8 is a linear ADC scan (4× cheaper bytes, same
    row count); the composition adds the IVF prune on top, so the scan
    touches probes·avg_cell candidates per query at 1 byte/dim each —
    the memory lever and the pruning lever at once. Cell skew is the
    knob to watch: assignment shuffles one row per vector, and a hot
    cell bounds per-query work, not per-partition work."""
    # Dequantize ONCE per assigned candidate row, BEFORE the probe
    # join fans it out to probes·|Q| pairs; the per-pair score is then
    # the ONE shared dot fold (dot_unrolled) in the same left-to-right
    # order as sq8_topk — bit-identical scores (optimization r15; the
    # former per-pair ~600-node expression ran interpreted past
    # hugeMethodLimit).
    assign = ivf_assign(vecs, centroids, id_col=id_col, vec=vec, dim=dim).select(
        F.col(id_col).alias("c_id"), "cell", F.col(vec).alias("_cv")
    ).select(
        "c_id",
        "cell",
        _dequant_array("_cv", los, his, dim).alias("_dv"),
    )
    probe = ivf_probe(
        vecs.filter(query_pred).select(F.col(id_col).alias("q_id"), vec),
        centroids,
        probes,
        vec=vec,
        dim=dim,
    ).select("q_id", "_qv", "cell")

    scored = (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id", dot_unrolled("_qv", "_dv", dim).alias("score")
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("score"), F.col("c_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
