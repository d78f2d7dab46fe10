"""URL-content fetch adapters (SURVEY.md §2.1 S4/S5) as Arrow-batched
``mapInPandas`` stages.

Reference: Celery workers fan URL batches out to an asyncio httpx loop
with a 15 s per-URL timeout and trafilatura text extraction
(data_pipeline/tasks/extraction.py:229-269, 329-378). The Spark-native
shape is identical minus the broker: each PARTITION is the batch, a
concurrent fetch loop inside ``mapInPandas`` fetches its URLs, and
``df.repartition(n)`` replaces the hand-rolled 4-way split
(extraction.py:68) as the concurrency knob.

Backends, auto-selected best-first:
  * ``httpx`` — asyncio client, when the library is installed;
  * ``urllib`` — stdlib, ALWAYS available: per-partition thread pool,
    per-URL timeout, error isolation. This is a real network client —
    tests exercise it end-to-end against a local http.server;
  * ``stub`` — deterministic offline content, for plumbing tests that
    must not depend on any socket.

Text extraction (the trafilatura respec) is a pure-stdlib HTML→text
pass: drop script/style/head blocks, strip tags, unescape entities,
collapse whitespace. Not a readability model — but a real extractor,
applied to really-fetched bytes.
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # pragma: no cover - not available in this environment
    import httpx  # type: ignore[import-not-found]

    _HAVE_HTTPX = True
except ImportError:
    _HAVE_HTTPX = False

FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("fetch_status", T.StringType(), True),
    ]
)

# Default retry pacing. The reference's Celery ``countdown=30`` is a
# NON-blocking requeue of the whole batch (extraction.py:229-236); a
# literal 30 s default here would instead block a Spark task thread for
# up to ~60 s per persistently-failing URL wave. The in-engine default
# is therefore a small exponential schedule (1 s, 2 s, capped); pass
# ``backoff_sec=30.0, backoff_exponential=False`` for documented
# reference-parity pacing.
DEFAULT_BACKOFF_SEC = 1.0
DEFAULT_BACKOFF_CAP_SEC = 30.0


def backoff_delay(
    attempt: int,
    backoff_sec: float = DEFAULT_BACKOFF_SEC,
    backoff_cap_sec: float = DEFAULT_BACKOFF_CAP_SEC,
    exponential: bool = True,
) -> float:
    """Seconds to sleep after failed attempt ``attempt`` (0-based).
    Exponential doubling from ``backoff_sec`` capped at
    ``backoff_cap_sec``; flat ``backoff_sec`` when ``exponential`` is
    False (the reference-parity schedule — the caller chose that exact
    wait, so the cap does not apply to it)."""
    if backoff_sec <= 0:
        return 0.0
    if not exponential:
        return backoff_sec
    return min(backoff_sec * (2.0**attempt), backoff_cap_sec)


_DROP_BLOCKS = re.compile(
    r"<(script|style|head|noscript)\b[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL
)
_TAGS = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")


def extract_article_text(html_doc: str) -> str:
    """trafilatura-respec text extraction (extraction.py:329-378), pure
    stdlib: remove non-content blocks, strip tags, unescape entities,
    normalize whitespace."""
    no_blocks = _DROP_BLOCKS.sub(" ", html_doc)
    text = _TAGS.sub(" ", no_blocks)
    return _WS.sub(" ", _html.unescape(text)).strip()


def _fetch_batch_stub(urls: list[str]) -> list[tuple[str, str | None, str]]:
    """OFFLINE STUB: deterministic fake content keyed by the url — for
    plumbing tests with no socket dependency."""
    return [
        (u, f"stub content for {u}" if not u.endswith("/404") else None,
         "stub:404" if u.endswith("/404") else "stub:200")
        for u in urls
    ]


def _fetch_batch_urllib(
    urls: list[str],
    timeout: float,
    max_workers: int = 16,
    retries: int = 3,
    backoff_sec: float = DEFAULT_BACKOFF_SEC,
    backoff_exponential: bool = True,
) -> list[tuple[str, str | None, str]]:
    """Stdlib network client: thread-pooled GETs (urllib blocks, so
    threads supply the concurrency asyncio gives httpx), per-URL
    timeout, per-URL failure isolation (reference :343-346).

    Retry contract (reference extraction.py:229-236 — Celery
    ``max_retries=3`` with a 30 s countdown): TRANSIENT failures —
    connection errors, per-URL timeouts, HTTP 5xx — are retried up to
    ``retries`` total attempts, pacing each wait with
    :func:`backoff_delay` (small exponential default; Celery's flat
    30 s requeue is non-blocking there but would pin a task thread
    here, so the flat schedule is opt-in); a DETERMINISTIC rejection
    (HTTP 4xx) is returned immediately, and after exhaustion the row
    defaults to (content=None, last error status) without affecting
    any other URL in the batch."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor
    from urllib.error import HTTPError, URLError
    from urllib.request import urlopen

    def one(u: str) -> tuple[str, str | None, str]:
        last = "error:unreachable"
        for attempt in range(max(1, retries)):
            try:
                with urlopen(u, timeout=timeout) as resp:  # noqa: S310 — caller-supplied URLs are the operator's contract
                    body = resp.read().decode("utf-8", errors="replace")
                    return (u, body, str(resp.status))
            except HTTPError as e:
                if e.code < 500:  # 4xx: deterministic, never retried
                    return (u, None, str(e.code))
                last = str(e.code)
            except ValueError as e:
                # Malformed URL (no scheme): deterministic — fails
                # identically on every attempt, so retrying only burns
                # the backoff budget. Return immediately, like 4xx.
                return (u, None, f"error:{type(e).__name__}")
            except URLError as e:
                # URLError is two populations: a STRING reason is a
                # structural rejection ("unknown url type: htp") —
                # deterministic, return immediately; an exception
                # reason (DNS, refused connection, TLS) is transient.
                if isinstance(getattr(e, "reason", None), str):
                    return (u, None, f"error:{type(e).__name__}")
                last = f"error:{type(e).__name__}"
            except OSError as e:
                last = f"error:{type(e).__name__}"
            if attempt + 1 < max(1, retries) and backoff_sec > 0:
                _time.sleep(
                    backoff_delay(attempt, backoff_sec, exponential=backoff_exponential)
                )
        return (u, None, last)

    if not urls:
        return []
    with ThreadPoolExecutor(max_workers=min(max_workers, len(urls))) as pool:
        return list(pool.map(one, urls))


async def _fetch_batch_httpx(  # pragma: no cover
    urls: list[str],
    timeout: float,
    retries: int = 3,
    backoff_sec: float = DEFAULT_BACKOFF_SEC,
    backoff_exponential: bool = True,
):
    """httpx twin of _fetch_batch_urllib — the SAME retry SCHEDULE and
    status classification (success = any final 2xx body; transient =
    connection/timeout/socket errors and 5xx, retried with
    :func:`backoff_delay`; 4xx and other deterministic rejections
    returned immediately). Exception TYPE STRINGS in failure statuses
    still differ per backend (httpx.ConnectError vs URLError) — the
    parity claim covers the retry schedule and the
    success/transient/deterministic classification, not the error
    labels."""
    import asyncio

    async with httpx.AsyncClient(follow_redirects=True, timeout=timeout) as client:
        async def one(u: str):
            last = "error:unreachable"
            for attempt in range(max(1, retries)):
                try:
                    r = await client.get(u)
                    # Any final 2xx returns the body — urllib's urlopen
                    # succeeds for the whole 2xx class, so a 201/204
                    # must not fall into the deterministic-reject arm
                    # on this backend only.
                    if 200 <= r.status_code < 300:
                        return (u, r.text, str(r.status_code))
                    if r.status_code < 500:  # 4xx: deterministic
                        return (u, None, str(r.status_code))
                    last = str(r.status_code)
                except (httpx.UnsupportedProtocol, httpx.InvalidURL) as e:
                    # Structurally-invalid URL: DETERMINISTIC even though
                    # UnsupportedProtocol subclasses TransportError — the
                    # urllib arm rejects these immediately, and a retry
                    # can never fix a malformed URL.
                    return (u, None, f"error:{type(e).__name__}")
                except (httpx.TransportError, OSError) as e:
                    # conn/timeout/socket: transient — OSError included
                    # to match the urllib arm's transient set.
                    last = f"error:{type(e).__name__}"
                except Exception as e:  # noqa: BLE001 — deterministic (bad URL etc.)
                    return (u, None, f"error:{type(e).__name__}")
                if attempt + 1 < max(1, retries) and backoff_sec > 0:
                    await asyncio.sleep(
                        backoff_delay(
                            attempt, backoff_sec, exponential=backoff_exponential
                        )
                    )
            return (u, None, last)

        return await asyncio.gather(*(one(u) for u in urls))


def fetch_url_content(
    df: DataFrame,
    url_col: str = "url",
    timeout: float = 15.0,
    backend: str | None = None,
    extract: bool = False,
    retries: int = 3,
    backoff_sec: float = DEFAULT_BACKOFF_SEC,
    backoff_exponential: bool = True,
) -> DataFrame:
    """S4/S5: enrich each row's url with fetched content. One concurrent
    batch per partition (the reference's Celery batch = our partition);
    control fan-out with ``df.repartition(n)`` upstream.

    ``backend``: None → httpx if installed else urllib; or force
    'httpx' / 'urllib' / 'stub'. ``extract=True`` applies the HTML→text
    extractor to successful fetches (S5's fetch+extract contract).
    ``timeout``/``retries`` default to the reference's 15 s per-URL
    timeout and 3-attempt retry policy (extraction.py:229-236, 339);
    transient failures retry, 4xx returns immediately, exhaustion
    defaults the row to null content. Retry pacing defaults to a small
    exponential schedule (:func:`backoff_delay`) because a flat 30 s
    sleep would block executor task threads where Celery's countdown
    only requeues; ``backoff_sec=30.0, backoff_exponential=False`` is
    the documented reference-parity opt-in.

    Returns (url, content, fetch_status); join back on url for the
    metadata-preserving variant (J1's url-equi respec)."""
    if backend is None:
        backend = "httpx" if _HAVE_HTTPX else "urllib"
    if backend not in ("httpx", "urllib", "stub"):
        raise ValueError(f"unknown fetch backend: {backend}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = [u for u in pdf[url_col].tolist() if u is not None]
            if backend == "httpx":  # pragma: no cover
                import asyncio

                rows = asyncio.run(
                    _fetch_batch_httpx(
                        urls,
                        timeout,
                        retries=retries,
                        backoff_sec=backoff_sec,
                        backoff_exponential=backoff_exponential,
                    )
                )
            elif backend == "urllib":
                rows = _fetch_batch_urllib(
                    urls,
                    timeout,
                    retries=retries,
                    backoff_sec=backoff_sec,
                    backoff_exponential=backoff_exponential,
                )
            else:
                rows = _fetch_batch_stub(urls)
            if extract:
                rows = [
                    (u, extract_article_text(c) if c is not None else None, s)
                    for u, c, s in rows
                ]
            yield pd.DataFrame(rows, columns=["url", "content", "fetch_status"])

    return df.select(url_col).distinct().mapInPandas(run, FETCH_RESULT_SCHEMA)
