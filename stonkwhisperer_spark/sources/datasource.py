"""Spark 4 Python Data Source packaging the reference's REST extract
layer (SURVEY §2.1 S1–S3, §7.1) as a first-class pluggable source:

    spark.dataSource.register(LandingApiDataSource)
    spark.read.format("stonkw_api").option("kind", "news").load()
    spark.readStream.format("stonkw_api").option("kind", "posts").load()

The reference fans its extractors out as 4 Celery batches of at most
``DATA_FETCH_LIMIT_PER_FLOW``=100 records (extraction.py:68-84,
core/constants.py:28). Here the SAME contract is expressed through the
engine: ``n_batches`` becomes the source's input partitions (Spark
schedules them; no hand-rolled np.array_split), ``limit`` the per-load
record cap, and the declared RAW_* schema replaces pandas inference.

The HTTP call itself is stubbed with deterministic synthetic records —
httpx/trafilatura are not installed in this environment (same honest
boundary as sources/fetch.py); ``_fetch_page`` is the single seam where
a real client drops in. Everything engine-facing — schema declaration,
partition planning, Arrow-batched record iteration, streaming offsets —
is real and tested.

Streaming uses SimpleDataSourceStreamReader: the offset is the page
number (the API-pagination respec of the reference's daily poll); each
micro-batch reads one page until ``max_pages``, then returns empty
batches. Exactly-once comes from the offset log + the downstream
idempotent merge sink (streaming/jobs.py), mirroring the batch split.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from stonkwhisperer_spark.schemas import (
    RAW_BARS_SCHEMA,
    RAW_NEWS_SCHEMA,
    RAW_POSTS_SCHEMA,
)

_SCHEMAS = {"news": RAW_NEWS_SCHEMA, "posts": RAW_POSTS_SCHEMA, "bars": RAW_BARS_SCHEMA}
_DEFAULT_LIMIT = 100  # DATA_FETCH_LIMIT_PER_FLOW, core/constants.py:28
_DEFAULT_BATCHES = 4  # the reference's Celery fan-out width


def _fetch_page(kind: str, page: int, page_size: int) -> Iterator[tuple]:
    """Deterministic stand-in for one API page fetch. Replace the body
    with the real httpx call on a networked deployment; the signature
    (kind, page, size) -> row tuples is the whole contract."""
    base = page * page_size
    for i in range(base, base + page_size):
        if kind == "news":
            yield (
                (f"src{i % 5}", f"Source {i % 5}"),
                None if i % 7 == 0 else f"author_{i % 13}",
                f"Title {i}",
                f"description {i}",
                f"https://news.example.com/{i}",
                f"https://img.example.com/{i}",
                f"2024-03-{(i % 28) + 1:02d}T{i % 24:02d}:15:30Z",
                f"body text {i}",
            )
        elif kind == "posts":
            yield (
                f"t3_{i}",
                f"r_sub{i % 5}",
                None if i % 23 == 0 else f"u_{i % 31}",
                f"Post {i}",
                f"self text {i}" if i % 3 == 0 else None,
                (i * 7) % 1000 - 50,
                (i * 3) % 200,
                i % 3 == 0,
                f"https://link.example.com/{i}",
                ("DD", "News", None, "Discussion")[i % 4],
                (i % 100) / 100.0,
                f"https://reddit.com/r/all/{i}",
                1700000000 + i * 60,
                None,
                None,
                None,
                None,
                None,
                None,
            )
        else:  # bars
            yield (
                f"S{i % 15}",
                f"2024-01-02 09:{30 + (i // 15) % 30:02d}:00",
                "N/A" if i % 13 == 0 else f"{100 + i % 900}.{i % 10000:04d}",
                f"{101 + i % 900}.{i % 10000:04d}",
                f"{99 + i % 900}.{i % 10000:04d}",
                f"{100 + (i + 3) % 900}.{i % 10000:04d}",
                f"{100 + (i + 5) % 900}.{i % 10000:04d}",
                "x" if i % 17 == 0 else str(i % 5000),
                None if i % 19 == 0 else str(i % 500),
            )


class _Batch(InputPartition):
    def __init__(self, kind: str, page: int, page_size: int):
        self.kind, self.page, self.page_size = kind, page, page_size


class LandingApiReader(DataSourceReader):
    """Batch reader: one input partition per API batch — the Celery
    4-way split (extraction.py:68) expressed as Spark task parallelism.
    Rows stream out per partition and cross into the JVM Arrow-batched."""

    def __init__(self, kind: str, limit: int, n_batches: int):
        self.kind, self.limit, self.n_batches = kind, limit, n_batches

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.limit // self.n_batches)  # ceil split, like array_split
        return [
            _Batch(self.kind, p, min(per, self.limit - p * per))
            for p in range(self.n_batches)
            if self.limit - p * per > 0
        ]

    def read(self, partition: _Batch) -> Iterator[tuple]:
        # batch p owns record ids [p*ceil, p*ceil + its size): disjoint
        # slices whose union is exactly `limit` distinct records.
        start = partition.page * (-(-self.limit // self.n_batches))
        for off, row in enumerate(_fetch_page(partition.kind, 0, self.limit)):
            if start <= off < start + partition.page_size:
                yield row


class LandingApiStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader: offset = next page number. Each micro-batch is
    one API page until ``max_pages``; afterwards empty batches (a live
    deployment would keep polling). commit() is a no-op — replay safety
    comes from the offset log plus the idempotent merge sink."""

    def __init__(self, kind: str, page_size: int, max_pages: int):
        self.kind, self.page_size, self.max_pages = kind, page_size, max_pages

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict) -> tuple[Sequence[tuple], dict]:
        page = start["page"]
        if page >= self.max_pages:
            return [], start
        # materialized list, not a generator: the framework's prefetch
        # cache copy.copy()s the returned rows for replay
        return list(_fetch_page(self.kind, page, self.page_size)), {"page": page + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay of [start, end) pages after a failure
        for page in range(start["page"], end["page"]):
            yield from _fetch_page(self.kind, page, self.page_size)


class LandingApiDataSource(DataSource):
    """``format("stonkw_api")`` — options:
    kind=news|posts|bars, limit (batch cap, default 100),
    n_batches (partition fan-out, default 4),
    page_size / max_pages (streaming pagination)."""

    @classmethod
    def name(cls) -> str:
        return "stonkw_api"

    def schema(self) -> StructType:
        return _SCHEMAS[self.options.get("kind", "news")]

    def reader(self, schema: StructType) -> DataSourceReader:
        return LandingApiReader(
            self.options.get("kind", "news"),
            int(self.options.get("limit", _DEFAULT_LIMIT)),
            int(self.options.get("n_batches", _DEFAULT_BATCHES)),
        )

    def simpleStreamReader(self, schema: StructType) -> DataSourceStreamReader:
        return LandingApiStreamReader(
            self.options.get("kind", "news"),
            int(self.options.get("page_size", 25)),
            int(self.options.get("max_pages", 4)),
        )
