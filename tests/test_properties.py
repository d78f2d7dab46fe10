"""Property-based tests (SURVEY §5 item 4): clean_text_for_nlp
invariants over arbitrary inputs, and merge idempotence over arbitrary
key multisets. Hypothesis drives the inputs; one Spark job evaluates
the whole batch of examples (per-example jobs would be prohibitively
slow)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stonkwhisperer_spark.functions.text import clean_text_for_nlp

_texts = st.lists(
    st.one_of(st.none(), st.text(max_size=80)),
    min_size=1,
    max_size=30,
)


def _clean_all(spark, samples):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(samples)], "i long, t string")
    return [r.c for r in df.select("i", clean_text_for_nlp("t").alias("c")).orderBy("i").collect()]


def test_clean_text_invariants(spark):
    # collect many hypothesis examples first, run ONE Spark job
    collected: list[list[str | None]] = []

    @settings(max_examples=30, deadline=None)
    @given(_texts)
    def gather(samples):
        collected.append(samples)

    gather()
    flat = [t for batch in collected for t in batch]
    # anchor cases the reference regexes target (transformation.py:278-291)
    flat += [
        None, "", "<b>HTML</b>", "see http://x.y/z now", "tail [+123 chars]",
        "Mixed CASE!  spaces\t\tand\npunct?!", "naked<tag", "www.example.com path",
    ]
    for raw, out in zip(flat, _clean_all(spark, flat)):
        assert out is not None  # null guard: None -> ''
        assert out == out.lower()  # lowercased
        assert re.fullmatch(r"[\w\s.!?]*", out), (raw, out)  # charset
        assert "  " not in out and out == out.strip()  # collapsed + trimmed
        assert "<" not in out and ">" not in out  # tags gone


def test_merge_idempotence_property(spark, tmp_path):
    from stonkwhisperer_spark.sinks.writers import merge_append

    key_batches: list[list[str]] = []

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.sampled_from([f"k{i}" for i in range(12)]), min_size=1, max_size=20))
    def gather(keys):
        key_batches.append(keys)

    gather()
    path = str(tmp_path / "target")
    seen: set[str] = set()
    for n, keys in enumerate(key_batches):
        batch = spark.createDataFrame([(k, n) for k in keys], "k string, batch long")
        inserted = merge_append(spark, path, batch, ["k"])
        # exactly the never-seen keys insert, regardless of batch dups
        assert inserted == len(set(keys) - seen)
        seen |= set(keys)
        # re-running the same batch immediately inserts nothing
        assert merge_append(spark, path, batch, ["k"]) == 0
    assert spark.read.parquet(path).count() == len(seen)


def test_bloom_bits_match_pure_python_replay(spark):
    # Cross-implementation property: Spark's bloom_build must produce
    # EXACTLY the packed words a direct Python replay of the portable
    # hash computes, for arbitrary key sets — the same independence
    # argument as the DuckDB oracle, from a third implementation. And
    # every built key must probe positive (no false negatives).
    import hashlib

    from stonkwhisperer_spark.operators.sketches import bloom_build, bloom_probe

    d, m = 3, 1 << 10
    batches: list[list[str]] = []

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"), min_size=0, max_size=24), min_size=1, max_size=12))
    def gather(keys):
        batches.append(keys)

    gather()
    keys = sorted({f"b{i}|{k}" for i, batch in enumerate(batches) for k in batch})

    expect: dict[int, int] = {}
    for k in keys:
        for seed in range(d):
            h = int(hashlib.md5(f"{seed}|{k}".encode()).hexdigest()[:15], 16)
            bit = h % m
            expect[bit // 32] = expect.get(bit // 32, 0) | (1 << (bit % 32))

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    bloom = bloom_build(df, "k", d=d, m_bits=m)
    got = {r.word: r.bits for r in bloom.collect()}
    assert got == expect

    flags = bloom_probe(df, "k", bloom, d=d, m_bits=m).collect()
    assert all(r.might_contain for r in flags)
