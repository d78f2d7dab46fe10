"""Text column functions — native Spark expressions, no UDFs.

``clean_text_for_nlp`` reproduces the reference's row-wise pandas
``.apply`` cleaner (data_pipeline/tasks/transformation.py:278-291) as a
chain of JVM-side column expressions: the whole thing stays inside
whole-stage codegen, so it vectorizes for free instead of paying a
Python round-trip per row (the reference pays one per cell).

The text-analysis helpers (token_count, language_id, quality_signals)
are the training-data-pipeline extensions: all built-ins, all codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword seeds per language for the n-gram language-ID heuristic.
# Tiny on purpose: broadcast as a literal map, no UDF, no model file.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "fr": ("le", "la", "les", "et", "de", "des", "un", "une", "est"),
    "es": ("el", "la", "los", "las", "de", "que", "y", "es", "en"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我"),
}


def clean_text_for_nlp(col: Column | str) -> Column:
    """Lowercase; strip HTML tags, URLs, ``[+N chars]`` remnants and
    non-word chars (keeping ``.!?`` sentence punctuation); collapse
    whitespace; null → ''.

    Mirrors reference transformation.py:278-291 regex-for-regex:
      :282 lower, :283 ``<[^>]+>``, :284 ``http\\S+|www\\S+|https\\S+``,
      :285-287 ``\\[\\+\\d+ chars\\]``, :288 ``[^\\w\\s.!?]``,
      :289 ``\\s+``→' ' + strip, :279-280 null guard.
    """
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    c = F.lower(c)
    c = F.regexp_replace(c, r"<[^>]+>", "")
    c = F.regexp_replace(c, r"http\S+|www\S+|https\S+", "")
    c = F.regexp_replace(c, r"\[\+\d+ chars\]", "")
    c = F.regexp_replace(c, r"[^\w\s.!?]", "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def clean_text_for_nlp_sql(expr: str) -> str:
    """DuckDB-SQL rendering of the same chain (oracle parity; RE2 and
    Java regex agree on these ASCII-class patterns)."""
    c = f"coalesce({expr}, '')"
    c = f"lower({c})"
    c = f"regexp_replace({c}, '<[^>]+>', '', 'g')"
    c = f"regexp_replace({c}, 'http\\S+|www\\S+|https\\S+', '', 'g')"
    c = f"regexp_replace({c}, '\\[\\+\\d+ chars\\]', '', 'g')"
    c = f"regexp_replace({c}, '[^\\w\\s.!?]', '', 'g')"
    c = f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"
    return c


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/null strings."""
    c = F.trim(F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit("")))
    return F.when(c == "", F.lit(0)).otherwise(F.size(F.split(c, r"\s+"))).cast("long")


def token_count_sql(expr: str) -> str:
    c = f"trim(coalesce({expr}, ''))"
    return f"cast(case when {c} = '' then 0 else len(regexp_split_to_array({c}, '\\s+')) end as bigint)"


def language_id(col: Column | str) -> Column:
    """Marker-word language heuristic: argmax over per-language hit
    counts of a tiny stopword list; 'und' when nothing matches.

    Scale note: pure codegen'd expressions over a split() array — no
    shuffle, no UDF; at 100 TB this is a map-only pass.
    """
    c = clean_text_for_nlp(col)
    toks = F.split(c, " ")
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))  # noqa: B023
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_signals(col: Column | str) -> dict[str, Column]:
    """Document quality scoring signals (length, punctuation ratio,
    stopword ratio, mean word length) as a dict of named columns."""
    raw = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    n_chars = F.length(raw)
    toks = F.split(F.trim(raw), r"\s+")
    n_tokens = F.when(F.trim(raw) == "", F.lit(0)).otherwise(F.size(toks))
    n_punct = F.length(raw) - F.length(F.regexp_replace(raw, r"[.!?,;:]", ""))
    stop_arr = F.array(*[F.lit(m) for m in _LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"), 6),
        "stopword_ratio": F.round(n_stop.cast("double") / safe_tokens, 6),
        "mean_token_len": F.round(
            (F.length(F.regexp_replace(raw, r"\s+", ""))).cast("double") / safe_tokens, 6
        ),
    }
