"""Shared, per-process, read-only stream landings (VERDICT r9 task 5).

The five stream-maintained sketch queries (streaming_sketch / _cms /
_hll / _quantiles / _bloom) all replay the same ingest shape: the
document corpus arriving in N micro-batch shards. Through round 9 each
query built its OWN landing — four corpus slices apiece, and for the
token sketches a full clean+tokenize per micro-batch plus another for
the probe side — so one bench process paid the same corpus passes five
times over (~26 s of suite wall at sf0.1).

This module builds each landing ONCE per (process, sf_dir), exactly
how a production deployment points every downstream consumer at the
same seeded ingest stream. Only the LANDING (input data) is shared;
every query keeps its own scratch state dirs, stream checkpoints and
sinks, so the incremental-maintenance loops under test stay fully
independent. Landings live in the scratch area and are removed at
process exit.

Shard layout: ``N_BATCHES`` files, file i holding the rows with
``doc_id % N_BATCHES == i`` — with ``maxFilesPerTrigger=1`` a drain
sees exactly N_BATCHES micro-batches, and because every maintained
sketch's merge is exact (K-minima union / counter addition / register
max / summary union / bitwise OR), shard ORDER never affects the final
state the oracles hash.
"""

from __future__ import annotations

import atexit
import shutil
import threading

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.session import scratch_dir
from stonkwhisperer_spark.sources.tables import load_table

N_BATCHES = 3  # >= 3 keeps real merge coverage (first fold + 2 refolds)

_LANDINGS: dict[tuple[str, str], str] = {}
_ROOTS: list[str] = []
# Build-once contract under CONCURRENT callers (ADVICE r10):
# flows_e2e_state already runs flow work in thread pools, and two
# threads racing a check-then-build would both append shard files into
# one landing path, breaking the exactly-N_BATCHES part-file layout the
# maxFilesPerTrigger=1 drains depend on. One lock serializes builds;
# reads after publication are lock-free dict hits.
_BUILD_LOCK = threading.Lock()


def build_once(cache, key, build):
    """Double-checked build-once: return ``cache[key]``, constructing
    it with ``build()`` under the shared fixture lock if absent. Every
    per-process fixture cache (the stream landings here, the CDC /
    replication seeds in queries_flows) routes through this so the
    build-once-under-concurrency contract lives in ONE place. ``build``
    must not itself call build_once — the lock is not reentrant, and
    fixture builds are deliberately flat."""
    if key in cache:
        return cache[key]
    with _BUILD_LOCK:
        if key in cache:  # double-checked: a racer built it
            return cache[key]
        cache[key] = build()
    return cache[key]


def _cleanup() -> None:
    for root in _ROOTS:
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup)


def docs_landing(spark: SparkSession, sf_dir: str) -> str:
    """N_BATCHES-file landing of (doc_id, source, text, n_chars)."""

    def _build() -> str:
        root = scratch_dir("stonkw_fixture_docs_")
        _ROOTS.append(root)
        path = f"{root}/landing"
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text", "n_chars"
        )
        for i in range(N_BATCHES):
            docs.filter(F.col("doc_id") % N_BATCHES == i).coalesce(1).write.mode(
                "append"
            ).parquet(path)
        return path

    return build_once(_LANDINGS, ("docs", sf_dir), _build)


def token_landing(spark: SparkSession, sf_dir: str) -> str:
    """N_BATCHES-file landing of exploded clean tokens
    (doc_id, source, tok) — ONE clean+tokenize pass over the corpus,
    staged to parquet, then sliced into shard files without touching
    the regex chain again. Batch-side consumers (CMS true counts,
    bloom vocabulary probes) read this landing directly instead of
    re-tokenizing the corpus."""

    def _build() -> str:
        from stonkwhisperer_spark.functions.hashing import tokens_of
        from stonkwhisperer_spark.functions.text import clean_text_for_nlp

        root = scratch_dir("stonkw_fixture_toks_")
        _ROOTS.append(root)
        path = f"{root}/landing"
        staging = f"{root}/staging"
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        toks = docs.select(
            "doc_id",
            "source",
            F.explode(tokens_of(clean_text_for_nlp("text"))).alias("tok"),
        ).filter(F.col("tok") != "")
        toks.write.parquet(staging)
        staged = spark.read.parquet(staging)
        for i in range(N_BATCHES):
            staged.filter(F.col("doc_id") % N_BATCHES == i).coalesce(1).write.mode(
                "append"
            ).parquet(path)
        shutil.rmtree(staging, ignore_errors=True)
        return path

    return build_once(_LANDINGS, ("tokens", sf_dir), _build)
