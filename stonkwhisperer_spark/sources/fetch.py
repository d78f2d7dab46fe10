"""URL-content fetch adapters (SURVEY.md §2.1 S4/S5) as Arrow-batched
``mapInPandas`` stages.

Reference: Celery workers fan URL batches out to an asyncio httpx loop
with a 15 s per-URL timeout and trafilatura text extraction
(data_pipeline/tasks/extraction.py:229-269, 329-378). The Spark-native
shape is identical minus the broker: each PARTITION is the batch, an
async loop inside ``mapInPandas`` fetches its URLs concurrently, and
``df.repartition(n)`` replaces the hand-rolled 4-way split
(extraction.py:68) as the concurrency knob.

httpx/trafilatura are not installed in this environment, so the network
call is behind an import-try: with the libraries present the real
fetcher runs; without them ``fetch_url_content`` uses a deterministic
offline stub (clearly marked) so the plumbing — schema, partition
batching, timeout bookkeeping — stays executable and tested.
"""

from __future__ import annotations

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


def _fetch_batch_stub(urls: list[str]) -> list[tuple[str, str | None, str]]:
    """OFFLINE STUB: deterministic fake content keyed by the url — used
    when httpx is unavailable. Real deployments hit the network below."""
    return [
        (u, f"stub content for {u}" if not u.endswith("/404") else None,
         "stub:404" if u.endswith("/404") else "stub:200")
        for u in urls
    ]


async def _fetch_batch_httpx(urls: list[str], timeout: float):  # pragma: no cover
    import asyncio

    async with httpx.AsyncClient(follow_redirects=True, timeout=timeout) as client:
        async def one(u: str):
            try:
                r = await client.get(u)
                return (u, r.text if r.status_code == 200 else None, str(r.status_code))
            except Exception as e:  # noqa: BLE001 — per-URL failure isolation (ref :343-346)
                return (u, None, f"error:{type(e).__name__}")

        return await asyncio.gather(*(one(u) for u in urls))


def fetch_url_content(df: DataFrame, url_col: str = "url", timeout: float = 15.0) -> DataFrame:
    """S4/S5: enrich each row's url with fetched content. One async
    batch per partition (the reference's Celery batch = our partition);
    control fan-out with ``df.repartition(n)`` upstream.

    Returns (url, content, fetch_status); join back on url for the
    metadata-preserving variant (J1's url-equi respec)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = [u for u in pdf[url_col].tolist() if u is not None]
            if _HAVE_HTTPX:  # pragma: no cover
                import asyncio

                rows = asyncio.run(_fetch_batch_httpx(urls, timeout))
            else:
                rows = _fetch_batch_stub(urls)
            yield pd.DataFrame(rows, columns=["url", "content", "fetch_status"])

    return df.select(url_col).distinct().mapInPandas(run, FETCH_RESULT_SCHEMA)
