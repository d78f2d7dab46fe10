"""Portable deterministic hashing + shingling for dedup/fingerprinting.

``portable_hash64`` is a 60-bit integer hash derived from md5 that
computes IDENTICALLY in Spark (conv(substr(md5(x),1,15),16,10)) and
DuckDB (('0x' || substr(md5(x),1,15))::bigint) — the property the
oracle-parity harness needs. Engine-native hashes (xxhash64, DuckDB
hash()) are faster but engine-specific; swap them in via the
``native=True`` flag when cross-engine determinism isn't required
(md5 is still JVM-side codegen — no Python involved either way).

Seeded variants prefix the input with "<seed>|" — the standard trick to
derive a hash family for MinHash from one base hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def portable_hash64(col: Column | str, seed: int | None = None, native: bool = False) -> Column:
    """60-bit non-negative integer hash of a string column, identical in
    Spark and DuckDB. ``native=True`` uses xxhash64 instead (faster,
    Spark-only — do not use under oracle comparison)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}|"), c)
    if native:
        return F.xxhash64(c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB twin of portable_hash64."""
    if seed is not None:
        expr = f"'{seed}|' || {expr}"
    return f"cast(('0x' || substr(md5({expr}), 1, 15)) AS bigint)"


def tokens_of(clean_col: Column | str) -> Column:
    """Whitespace tokens of an already-cleaned (single-spaced, trimmed)
    text column; '' → ['']."""
    c = F.col(clean_col) if isinstance(clean_col, str) else clean_col
    return F.split(c, " ")


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-gram word shingles from a token array; fewer than n
    tokens → empty array. Map-only (no shuffle, no UDF)."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)]))
    return F.array_distinct(F.when(F.size(toks) >= n, gram).otherwise(F.array().cast("array<string>")))


def shingles_sql(toks_expr: str, n: int = 3) -> str:
    """DuckDB twin of shingles (1-based list indexing)."""
    gram = " || ' ' || ".join(f"{toks_expr}[i + {k}]" for k in range(n))
    return (
        f"list_distinct(CASE WHEN len({toks_expr}) >= {n} "
        f"THEN list_transform(range(1, len({toks_expr}) - {n - 2}), i -> {gram}) "
        f"ELSE [] END)"
    )


def shingle_postings(
    df: "DataFrame", id_col: str, clean_text: Column, n: int = 3
) -> "DataFrame":
    """(id, shingle) posting list — distinct n-gram shingles per doc —
    via posexplode + lead windows instead of an array transform.

    Same output as explode(shingles(...)), but ~16x faster: higher-order
    array functions evaluate interpreted (outside codegen), while
    posexplode, lead, concat_ws and the distinct all stay in codegen'd
    operators. The window shuffles on the id — a uniform
    high-cardinality key — which also balances work regardless of the
    input's file/row-group layout.
    """
    toks = df.select(
        F.col(id_col), F.posexplode(tokens_of(clean_text)).alias("pos", "tok")
    )
    w = W.partitionBy(id_col).orderBy("pos")
    grams = toks.select(
        F.col(id_col),
        F.concat_ws(
            " ", "tok", *[F.lead("tok", k).over(w) for k in range(1, n)]
        ).alias("shingle"),
        F.lead("tok", n - 1).over(w).alias("_full"),
    )
    return grams.filter(F.col("_full").isNotNull()).drop("_full").distinct()
