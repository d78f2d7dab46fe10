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


# BPE-pre-tokenizer-ish segmentation (GPT-2 family shape, ASCII-only so
# Java regex and RE2 agree): letter runs | single digits | single
# non-alnum marks; whitespace separates, digits split one per token.
_BPE_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def bpe_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex — the
    LLM-pipeline budget estimator (whitespace counts undercount
    punctuation-heavy text; digit splitting matches BPE behavior).
    Map-only codegen, no UDF."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_PATTERN), F.lit(0))).cast("long")


def bpe_token_count_sql(expr: str) -> str:
    """DuckDB twin of bpe_token_count."""
    return (
        f"cast(len(regexp_extract_all(coalesce({expr}, ''), "
        f"'{_BPE_PATTERN}')) as bigint)"
    )


# Language-ID normalization keeps CJK (U+4E00-U+9FFF) alongside ASCII
# word chars: clean_text_for_nlp's [^\w\s.!?] strips CJK entirely (Java
# \w is ASCII), which made zh markers unreachable. Replacement is ' '
# (not '') so stripped punctuation never glues adjacent words together.
_LANGID_STRIP = r"[^\w\s\x{4e00}-\x{9fff}]"


def _langid_parts(col: Column | str) -> tuple[Column, Column]:
    raw = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    norm = F.regexp_replace(F.lower(raw), _LANGID_STRIP, " ")
    toks = F.split(F.trim(norm), r"\s+")
    return norm, toks


def _token_hits(text: Column, markers, lowercase: bool = False) -> Column:
    """Codegen whole-token occurrence count: how many tokens of ``text``
    (whitespace-tokenized) equal any marker, repeats counted.

    Exactly the semantics of
    ``size(filter(split(text), t -> array_contains(markers, t)))`` but
    WITHOUT the interpreted higher-order lambda (lambdafunction
    evaluates outside whole-stage codegen and dominated the quality
    cascade's cost): the text is squished to single spaces, every space
    doubled so each token carries its OWN delimiters (" the  the " lets
    ``" the "`` match twice without overlap), and ONE regexp_count with
    a literal alternation counts every marker in a single pass. One
    compact codegen'd expression per marker SET — not per marker — so
    the generated method stays far below the JVM 64 KB limit (the
    per-marker replace/length expansion of this same idea pushed
    whole-stage codegen into janino failure and interpreted fallback;
    measured 0 value diffs, ~10x faster). Markers must be \\w-only
    (regex-literal) tokens — asserted."""
    assert all(m.isalnum() for m in markers), markers
    squished = F.regexp_replace(F.trim(text), r"\s+", " ")
    if lowercase:
        squished = F.lower(squished)
    padded = F.concat(
        F.lit(" "), F.replace(squished, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    pat = " (" + "|".join(markers) + ") "
    return F.regexp_count(padded, F.lit(pat)).cast("long")


def language_id(col: Column | str) -> Column:
    """Marker-word language heuristic: argmax over per-language hit
    counts; 'und' when nothing matches. Latin languages score by
    whole-token match; zh scores by CJK marker-character occurrences
    (whitespace tokenization doesn't apply to Chinese). Ties resolve to
    the lexicographically-largest language code (struct-max semantics).

    Scale note: pure codegen'd length/replace expressions — no shuffle,
    no UDF, no interpreted lambdas; at 100 TB this is a map-only pass.
    """
    norm, _ = _langid_parts(col)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        if lang == "zh":
            # Occurrence count of single CJK marker chars — one
            # regexp_count alternation pass (chars need no token
            # padding; equal to the sum of per-char counts).
            hits: Column = F.regexp_count(
                norm, F.lit("(" + "|".join(markers) + ")")
            ).cast("long")
        else:
            # Whole-token hit count in pure codegen (norm is already
            # lowercased); see _token_hits for the delimiter-doubling
            # trick replacing the interpreted filter() lambda.
            hits = _token_hits(norm, markers)
        scores.append(F.struct(hits.cast("long").alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def language_id_sql(expr: str) -> str:
    """DuckDB twin of language_id. Tie-break parity: Spark's struct-max
    picks the largest (hits, lang) pair, so among tied hit counts the
    lexicographically-largest code wins — the CASE tests codes in
    descending lexicographic order."""
    raw = f"coalesce({expr}, '')"
    norm = f"regexp_replace(lower({raw}), '{_LANGID_STRIP}', ' ', 'g')"
    toks = f"regexp_split_to_array(trim({norm}), '\\s+')"
    hit_exprs: dict[str, str] = {}
    for lang, markers in _LANG_MARKERS.items():
        if lang == "zh":
            parts = [
                f"(len({norm}) - len(replace({norm}, '{m}', '')))" for m in markers
            ]
            hit_exprs[lang] = "(" + " + ".join(parts) + ")"
        else:
            lst = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
            hit_exprs[lang] = f"len(list_filter({toks}, t -> list_contains({lst}, t)))"
    best = "greatest(" + ", ".join(hit_exprs.values()) + ")"
    ordered = sorted(hit_exprs, reverse=True)  # desc lexicographic
    cases = " ".join(f"WHEN {hit_exprs[lang]} = {best} THEN '{lang}'" for lang in ordered)
    return f"(CASE WHEN {best} = 0 THEN 'und' {cases} END)"


def quality_signals(col: Column | str) -> dict[str, Column]:
    """Document quality scoring signals (length, punctuation ratio,
    stopword ratio, mean word length) as a dict of named columns.

    Ratios are raw IEEE-double divisions of integer counts — no
    rounding — so they reproduce bit-exactly on any engine that
    computes the same counts (oracle parity, SURVEY §7.4).
    """
    raw = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    n_chars = F.length(raw)
    toks = F.split(F.trim(raw), r"\s+")
    n_tokens = F.when(F.trim(raw) == "", F.lit(0)).otherwise(F.size(toks))
    n_punct = F.length(raw) - F.length(F.regexp_replace(raw, r"[.!?,;:]", ""))
    # lowercase=True mirrors the old filter's lower(t) compare; raw is
    # NOT punctuation-stripped here, so "the," stays a non-match — same
    # tokenization as the split() above.
    n_stop = _token_hits(raw, _LANG_MARKERS["en"], lowercase=True)
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"),
        "stopword_ratio": n_stop.cast("double") / safe_tokens,
        "mean_token_len": F.length(F.regexp_replace(raw, r"\s+", "")).cast("double")
        / safe_tokens,
    }


def quality_signals_sql(expr: str) -> dict[str, str]:
    """DuckDB twin of quality_signals, keyed by the same output names."""
    raw = f"coalesce({expr}, '')"
    toks = f"regexp_split_to_array(trim({raw}), '\\s+')"
    n_tokens = f"(CASE WHEN trim({raw}) = '' THEN 0 ELSE len({toks}) END)"
    n_punct = f"(len({raw}) - len(regexp_replace({raw}, '[.!?,;:]', '', 'g')))"
    stop_lst = "[" + ", ".join(f"'{m}'" for m in _LANG_MARKERS["en"]) + "]"
    n_stop = f"len(list_filter({toks}, t -> list_contains({stop_lst}, lower(t))))"
    safe = f"cast(greatest({n_tokens}, 1) AS double)"
    return {
        "n_chars": f"cast(len({raw}) AS bigint)",
        "n_tokens": f"cast({n_tokens} AS bigint)",
        "punct_ratio": f"cast({n_punct} AS double) / cast(greatest(len({raw}), 1) AS double)",
        "stopword_ratio": f"cast({n_stop} AS double) / {safe}",
        "mean_token_len": f"cast(len(regexp_replace({raw}, '\\s+', '', 'g')) AS double) / {safe}",
    }
