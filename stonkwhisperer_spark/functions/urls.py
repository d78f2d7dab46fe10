"""URL canonicalization for dedup keys — engine-portable.

The reference dedups articles on the RAW url string
(reference: app/Services/data_pipeline.py — the articles merge sink
anti-joins on url), which treats `HTTPS://Site.com/a?utm_source=rss`
and `https://site.com/a` as different documents. A crawl-scale
pipeline canonicalizes first; this module does the standard surgery
as pure column expressions with a DuckDB SQL twin, staying inside the
Java-regex ∩ RE2 pattern subset (same contract as the PII scrubber):

  * fragment dropped;
  * scheme + host lowercased (path/query case preserved — it is
    significant);
  * default port stripped (:443 for https, :80 for http);
  * trailing slashes stripped from the path;
  * tracking params removed (utm_*, fbclid, gclid, igshid, mc_cid,
    mc_eid, ref), remaining params sorted byte-wise so param order
    never splits a dedup group.

Contract: absolute http(s) URLs. The param filter/sort runs as
higher-order array functions (interpreted, not codegen) — fine at
article-table cardinality; posexplode + re-aggregate is the swap if a
URL column ever rides the 100 TB fact path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking params dropped during canonicalization. Kept as one
# alternation used verbatim by BOTH engines.
TRACKING_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|igshid|mc_cid|mc_eid|ref)(=|$)"

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url(col: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL (see module doc)."""
    s = F.trim(F.col(col) if isinstance(col, str) else col)
    s = F.regexp_replace(s, "#.*", "")  # fragment
    scheme = F.lower(F.regexp_extract(s, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(s, _HOST_RE, 1))
    host = (
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_replace(F.regexp_extract(s, _PATH_RE, 1), "/+$", "")
    params = F.filter(
        F.split(F.regexp_extract(s, _QUERY_RE, 1), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE),
    )
    query = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` — byte-identical output."""
    s = f"regexp_replace(trim({expr}), '#.*', '')"
    scheme = f"lower(regexp_extract({s}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({s}, '{_HOST_RE}', 1))"
    host = (
        f"CASE WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"ELSE {hostport} END"
    )
    path = f"regexp_replace(regexp_extract({s}, '{_PATH_RE}', 1), '/+$', '')"
    params = (
        f"list_filter(string_split(regexp_extract({s}, '{_QUERY_RE}', 1), '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_RE}'))"
    )
    # coalesce: DuckDB's array_to_string over an EMPTY list yields NULL
    # (Spark's array_join yields ''), which would null out the whole ||
    # chain for tracking-only query strings.
    query = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END"
    )
