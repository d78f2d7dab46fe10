"""Landing-zone readers (S1-S3 contract) + fetch adapter plumbing
(S4/S5): declared schemas, arrival ids, partition-batched fetch."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from stonkwhisperer_spark.pipelines import clean_news
from stonkwhisperer_spark.schemas import RAW_NEWS_SCHEMA
from stonkwhisperer_spark.sources.fetch import fetch_url_content
from stonkwhisperer_spark.sources.landing import read_landing


def _drop_news(spark, path):
    rows = [
        (("s1", "Source One"), "an author", "T1", "desc", "https://e.com/1", None,
         "2024-03-01 10:00:00", "Body one."),
        (("s2", "Source Two"), None, "T2 headline", None, "https://e.com/2", None,
         "2024-03-02 11:00:00", None),
        (("s1", "Source One"), "an author", "T1-dup", "desc", "https://e.com/1", None,
         "2024-03-01 10:05:00", "Body dup."),
    ]
    spark.createDataFrame(rows, RAW_NEWS_SCHEMA).coalesce(1).write.parquet(path)


def test_read_landing_schema_and_pipeline(spark, tmp_path):
    path = str(tmp_path / "news_drop")
    _drop_news(spark, path)
    raw = read_landing(spark, path, "news")
    assert [f.name for f in raw.schema.fields[:-1]] == [f.name for f in RAW_NEWS_SCHEMA.fields]
    assert "_arrival_id" in raw.columns

    clean = clean_news(raw)
    rows = {r.url: r for r in clean.collect()}
    # url dedup kept one row per url; null content+description coalesced
    # down to the raw title (C2 chain)
    assert len(rows) == 2
    assert rows["https://e.com/2"].content == "T2 headline"
    assert rows["https://e.com/2"].author == "No Author"
    assert rows["https://e.com/1"].source_name == "Source One"
    assert rows["https://e.com/1"].published_at is not None


def test_fetch_url_content_stub(spark):
    df = spark.createDataFrame(
        [("https://x.com/a",), ("https://x.com/404",), ("https://x.com/a",)], "url string"
    )
    out = {
        r.url: r
        for r in fetch_url_content(df.repartition(2), backend="stub").collect()
    }
    assert len(out) == 2  # distinct urls only
    assert out["https://x.com/a"].content is not None
    assert out["https://x.com/404"].content is None
    assert out["https://x.com/404"].fetch_status.endswith("404")
    # no per-row python: the stage is arrow-batched (MapInPandas /
    # ArrowEvalPython), never row-at-a-time BatchEvalPython
    plan = fetch_url_content(df, backend="stub")._jdf.queryExecution().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_python_datasource_batch_contract(spark):
    """LandingApiDataSource: declared RAW_* schema, the Celery-split
    respec as input partitions, disjoint batch slices, and the output
    feeds the pipelines directly."""
    from stonkwhisperer_spark.pipelines import clean_news
    from stonkwhisperer_spark.schemas import RAW_NEWS_SCHEMA
    from stonkwhisperer_spark.sources.datasource import LandingApiDataSource

    spark.dataSource.register(LandingApiDataSource)
    df = (
        spark.read.format("stonkw_api")
        .option("kind", "news")
        .option("limit", 90)
        .option("n_batches", 4)
        .load()
    )
    assert df.schema == RAW_NEWS_SCHEMA
    assert df.rdd.getNumPartitions() == 4  # the 4-way fan-out is Spark's now
    assert df.count() == 90  # ceil-split slices are disjoint and exhaustive
    assert df.select("url").distinct().count() == 90

    cleaned = clean_news(
        df.withColumn("_arrival_id", F.monotonically_increasing_id()),
        order_col="_arrival_id",
    )
    assert cleaned.count() == 90 and "content_cleaned" in cleaned.columns

    bars = (
        spark.read.format("stonkw_api").option("kind", "bars").option("limit", 45).load()
    )
    assert bars.count() == 45 and bars.schema.fieldNames()[0] == "symbol"


def test_python_datasource_stream_pagination(spark, tmp_path):
    """Streaming side: offset = page number; maxFilesPerTrigger-style
    pacing falls out of one-page-per-micro-batch; max_pages bounds the
    run so availableNow-less tests stay deterministic."""
    import time

    from stonkwhisperer_spark.sources.datasource import LandingApiDataSource

    spark.dataSource.register(LandingApiDataSource)
    stream = (
        spark.readStream.format("stonkw_api")
        .option("kind", "posts")
        .option("page_size", 25)
        .option("max_pages", 3)
        .load()
    )
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline and n < 75:
            try:
                n = spark.read.parquet(out).count()
            except Exception:
                n = 0
            time.sleep(0.5)
    finally:
        q.stop()
    assert n == 75  # 3 pages x 25, then empty batches
    assert spark.read.parquet(out).select("reddit_id").distinct().count() == 75


def test_fetch_url_content_real_http(spark):
    """S4/S5 over a REAL network round trip: a local http.server serves
    an HTML article + a 404; the urllib backend fetches through actual
    Spark Python workers (mapInPandas), and the extractor reduces the
    HTML to its article text. No stub in this path."""
    import http.server
    import threading

    PAGE = (b"<html><head><title>t</title><style>p{color:red}</style></head>"
            b"<body><script>var x=1;</script><h1>Big News</h1>"
            b"<p>Spark &amp; DuckDB agree.</p></body></html>")

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/article":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(PAGE)
            else:
                self.send_error(404)

        def log_message(self, *a):  # keep pytest output clean
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        df = spark.createDataFrame(
            [(f"{base}/article",), (f"{base}/missing",)], "url string"
        )
        out = {
            r.url: r
            for r in fetch_url_content(
                df.repartition(2), backend="urllib", extract=True
            ).collect()
        }
        ok = out[f"{base}/article"]
        assert ok.fetch_status == "200"
        # title sits inside <head>, which the extractor drops wholesale
        assert ok.content == "Big News Spark & DuckDB agree."
        missing = out[f"{base}/missing"]
        assert missing.fetch_status == "404" and missing.content is None
    finally:
        server.shutdown()
        server.server_close()


def test_fetch_retry_and_timeout_semantics():
    """The reference's retry/timeout contract (extraction.py:229-236,
    339 — 3 attempts, per-URL timeout, per-record failure isolation)
    pinned against a real local http.server, per record:

    * transient 5xx → retried, succeeds once the server recovers;
    * 4xx → deterministic rejection, returned immediately, NO retry;
    * persistent 5xx → retries exhaust, row defaults to null content
      with the last status;
    * timeout → row defaults to (None, error:*) without delaying or
      failing the other URLs in the same batch."""
    import http.server
    import threading
    import time

    from stonkwhisperer_spark.sources.fetch import _fetch_batch_urllib

    hits: dict[str, int] = {}
    lock = threading.Lock()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            with lock:
                hits[self.path] = hits.get(self.path, 0) + 1
                n = hits[self.path]
            if self.path == "/flaky":
                if n <= 2:
                    self.send_error(503)
                else:
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(b"recovered")
            elif self.path == "/always500":
                self.send_error(500)
            elif self.path == "/slow":
                time.sleep(1.5)
                try:
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(b"too late")
                except BrokenPipeError:
                    pass  # the timed-out client already disconnected
            elif self.path == "/ok":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"fine")
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        # retry-then-succeed: two 503s then 200 under the 3-attempt policy.
        rows = dict(
            (u, (c, s))
            for u, c, s in _fetch_batch_urllib(
                [f"{base}/flaky"], timeout=5.0, retries=3, backoff_sec=0.0
            )
        )
        assert rows[f"{base}/flaky"] == ("recovered", "200")
        assert hits["/flaky"] == 3

        # 4xx is deterministic: one attempt only, no retry burn.
        rows = dict(
            (u, (c, s))
            for u, c, s in _fetch_batch_urllib(
                [f"{base}/missing"], timeout=5.0, retries=3, backoff_sec=0.0
            )
        )
        assert rows[f"{base}/missing"] == (None, "404")
        assert hits["/missing"] == 1

        # exhaustion defaults the record: retries attempts, last status.
        rows = dict(
            (u, (c, s))
            for u, c, s in _fetch_batch_urllib(
                [f"{base}/always500"], timeout=5.0, retries=2, backoff_sec=0.0
            )
        )
        assert rows[f"{base}/always500"] == (None, "500")
        assert hits["/always500"] == 2

        # timeout-then-default, isolated per record: the slow URL times
        # out (after its retry budget) while /ok in the SAME batch
        # succeeds untouched.
        rows = dict(
            (u, (c, s))
            for u, c, s in _fetch_batch_urllib(
                [f"{base}/slow", f"{base}/ok"],
                timeout=0.3,
                retries=2,
                backoff_sec=0.0,
            )
        )
        slow_content, slow_status = rows[f"{base}/slow"]
        assert slow_content is None and slow_status.startswith("error:")
        assert rows[f"{base}/ok"] == ("fine", "200")

        # malformed URLs = deterministic rejections: both the
        # unknown-scheme URLError (string reason) and the scheme-less
        # ValueError return immediately even with a punishing backoff
        # configured (no sleep burned).
        t0 = time.monotonic()
        rows = dict(
            (u, (c, s))
            for u, c, s in _fetch_batch_urllib(
                ["htp://nowhere.invalid/x", "no-scheme-at-all"],
                timeout=5.0,
                retries=3,
                backoff_sec=30.0,
            )
        )
        assert time.monotonic() - t0 < 5.0
        for u in ("htp://nowhere.invalid/x", "no-scheme-at-all"):
            bad_content, bad_status = rows[u]
            assert bad_content is None and bad_status.startswith("error:")
    finally:
        server.shutdown()
        server.server_close()


def test_fetch_backoff_schedule():
    """Retry pacing contract (ADVICE r10): the in-engine default is a
    small exponential schedule — 1 s, 2 s, 4 s … capped at 30 s — so a
    partition of persistently-failing URLs never blocks its task thread
    for the reference's flat 30 s Celery countdown unless the caller
    opts into reference-parity pacing explicitly."""
    from stonkwhisperer_spark.sources.fetch import (
        DEFAULT_BACKOFF_CAP_SEC,
        DEFAULT_BACKOFF_SEC,
        backoff_delay,
    )

    assert DEFAULT_BACKOFF_SEC == 1.0 and DEFAULT_BACKOFF_CAP_SEC == 30.0
    assert [backoff_delay(a) for a in range(7)] == [1, 2, 4, 8, 16, 30, 30]
    # Reference-parity opt-in: flat 30 s per wait. The flat schedule is
    # the caller's EXPLICIT wait — the exponential cap never shortens it
    # (a flat 60 s must stay 60 s, not silently become the 30 s cap).
    assert [backoff_delay(a, 30.0, exponential=False) for a in range(3)] == [30, 30, 30]
    assert backoff_delay(0, 60.0, exponential=False) == 60.0
    # Zero/negative disables sleeping entirely (the test-suite path).
    assert backoff_delay(5, 0.0) == 0.0 and backoff_delay(5, -1.0) == 0.0
    # Cap respected for a custom base too.
    assert backoff_delay(10, 0.5, backoff_cap_sec=8.0) == 8.0


def test_extract_article_text_pure():
    from stonkwhisperer_spark.sources.fetch import extract_article_text

    html_doc = (
        "<html><head><script>no()</script></head><body>"
        "<div>A &lt;tagged&gt; story.</div>\n\n<p>Second   para.</p></body></html>"
    )
    assert extract_article_text(html_doc) == "A <tagged> story. Second para."


def test_txlog_stream_reader_offsets_and_partitions(spark, tmp_path):
    """The txlog streaming source's control plane: offsets are commit
    versions, partitions cover exactly the files the polled commits
    added (compaction rewrites excluded), and the executor read yields
    Arrow batches tagged with the originating commit."""
    from stonkwhisperer_spark.sinks.writers import compact, merge_append
    from stonkwhisperer_spark.sources.txlog_stream import (
        VERSION_COL,
        _table_schema,
        _TxlogStreamReader,
    )

    target = str(tmp_path / "t")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    b2 = spark.createDataFrame([(3, "c")], "k long, s string")
    merge_append(spark, target, b1, ["k"])  # v1
    merge_append(spark, target, b2, ["k"])  # v2
    assert compact(spark, target) > 0       # v3 — must stay invisible

    schema = _table_schema(target)
    assert [f.name for f in schema.fields] == ["k", "s"]
    # startingVersion is INCLUSIVE (Delta semantics): subscribing at 2
    # delivers version 2 itself; the internal offset is therefore 1.
    reader = _TxlogStreamReader(schema, {"path": target, "startingVersion": "2"})
    assert reader.initialOffset() == {"version": 1}
    assert reader.latestOffset() == {"version": 3}

    parts = reader.partitions({"version": 1}, {"version": 3})
    assert parts and all(v == 2 for p in parts for (_, v, _c) in p.files)
    # Byte-bounded packing (default 128 MB target): this window's tiny
    # files coalesce into ONE read task — the fork-count discipline a
    # near-empty poll depends on.
    assert len(parts) == 1

    rows = []
    for p in parts:
        for rb in reader.read(p):
            rows.extend(rb.to_pylist())
    assert sorted((r["k"], r["s"], r[VERSION_COL]) for r in rows) == [(3, "c", 2)]

    # Nothing new past the latest offset.
    assert reader.partitions({"version": 3}, {"version": 3}) == []

    # A tight maxPartitionBytes (openCost dominates every real file)
    # splits the same window back into one task per file — the
    # catch-up-over-large-files shape, deterministically re-planned.
    tight = _TxlogStreamReader(
        schema,
        {
            "path": target,
            "maxPartitionBytes": "1",
            "openCostInBytes": "0",
        },
    )
    tparts = tight.partitions({"version": 0}, {"version": 3})
    assert len(tparts) == sum(len(p.files) for p in tparts)
    trows = []
    for p in tparts:
        for rb in tight.read(p):
            trows.extend(rb.to_pylist())
    assert sorted((r["k"], r["s"]) for r in trows) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]


def test_txlog_stream_packs_from_commit_log_sizes(spark, tmp_path, monkeypatch):
    """Commits record their files' sizes in the manifest (r16), and the
    streaming source's split packing reads them from the log — ZERO
    driver stat syscalls on the poll path for size-carrying commits.
    Legacy commits (no sizes entry) fall back to one stat per file."""
    from stonkwhisperer_spark.sinks import writers as wr
    from stonkwhisperer_spark.sources import txlog_stream as ts

    target = str(tmp_path / "t")
    wr.merge_append(
        spark,
        target,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string"),
        ["k"],
    )  # v1: append (add files)
    wr.merge_upsert(
        spark,
        target,
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, s string"),
        ["k"],
    )  # v2: upsert (cdc files)

    commits = wr._commits(target)
    for c in commits:
        recorded = set(c.get("sizes", {}))
        assert recorded == set(c["add"]) | set(c.get("cdc", []))
        for rel, sz in c["sizes"].items():
            assert sz == os.path.getsize(os.path.join(target, rel))

    schema = ts._table_schema(target)
    reader = ts._TxlogStreamReader(schema, {"path": target})

    def _no_stat(path):
        raise AssertionError(f"poll path statted {path}")

    monkeypatch.setattr(ts.os.path, "getsize", _no_stat)
    parts = reader.partitions({"version": 0}, {"version": 2})
    assert parts  # packed purely from log metadata
    rows = []
    for p in parts:
        for rb in reader.read(p):
            rows.extend(rb.to_pylist())
    assert sorted((r["k"], r["s"], r["_change_type"]) for r in rows) == [
        (1, "a", "insert"),
        (2, "B", "update_postimage"),
        (2, "b", "insert"),
        (2, "b", "update_preimage"),
        (3, "c", "insert"),
    ]

    # Legacy manifests (pre-r16, no sizes) still plan via the stat
    # fallback rather than failing.
    monkeypatch.undo()
    for c in wr._commits(target):
        mf = os.path.join(target, "_txlog", f"{c['version']:08d}.json")
        body = json.load(open(mf))
        body.pop("sizes", None)
        with open(mf, "w") as fh:
            json.dump(body, fh)
    legacy = ts._TxlogStreamReader(schema, {"path": target})
    lparts = legacy.partitions({"version": 0}, {"version": 2})
    lrows = []
    for p in lparts:
        for rb in legacy.read(p):
            lrows.extend(rb.to_pylist())
    assert sorted((r["k"], r["s"]) for r in lrows) == sorted(
        (r["k"], r["s"]) for r in rows
    )


def test_txlog_stream_size_option_parsing():
    """maxPartitionBytes/openCostInBytes accept Spark-style size-suffix
    strings; junk raises a message naming the option (ADVICE r15)."""
    import pytest

    from stonkwhisperer_spark.sources.txlog_stream import _parse_bytes

    assert _parse_bytes("128m", "maxPartitionBytes") == 128 * 1024**2
    assert _parse_bytes("4mb", "openCostInBytes") == 4 * 1024**2
    assert _parse_bytes("1g", "maxPartitionBytes") == 1024**3
    assert _parse_bytes("2048", "maxPartitionBytes") == 2048
    assert _parse_bytes(7, "maxPartitionBytes") == 7
    with pytest.raises(ValueError, match="maxPartitionBytes"):
        _parse_bytes("huge", "maxPartitionBytes")


def test_txlog_stream_reader_schema_evolution(spark, tmp_path):
    """The streaming CDC source resolves the log's union schema and
    null-fills fields a file predates, agreeing with the batch feed
    (regression: footer-inferred schema from the oldest commit dropped
    evolved columns; reading a declared-but-absent column crashed)."""
    from stonkwhisperer_spark.sinks.writers import merge_append
    from stonkwhisperer_spark.sources.txlog_stream import (
        VERSION_COL,
        _table_schema,
        _TxlogStreamReader,
    )

    target = str(tmp_path / "t")
    merge_append(
        spark, target, spark.createDataFrame([(1, "a")], "k long, s string"), ["k"]
    )
    merge_append(
        spark,
        target,
        spark.createDataFrame([(2, "b", "en")], "k long, s string, lang string"),
        ["k"],
    )

    schema = _table_schema(target)
    assert [f.name for f in schema.fields] == ["k", "s", "lang"]
    reader = _TxlogStreamReader(schema, {"path": target})
    rows = []
    for p in reader.partitions({"version": 0}, reader.latestOffset()):
        for rb in reader.read(p):
            rows.extend(rb.to_pylist())
    assert sorted((r["k"], r["lang"], r[VERSION_COL]) for r in rows) == [
        (1, None, 1),
        (2, "en", 2),
    ]


def test_txlog_stream_reader_typed_cdc(spark, tmp_path):
    """Upsert commits stream as TYPED change rows: the planner schedules
    the commit's _change_data files (never the rewritten data files, so
    carried-over rows don't replay), and read() surfaces the files' own
    _change_type; insert commits keep tagging 'insert' from add files."""
    from stonkwhisperer_spark.sinks.writers import merge_append, merge_upsert
    from stonkwhisperer_spark.sources.txlog_stream import (
        CHANGE_COL,
        VERSION_COL,
        _table_schema,
        _TxlogStreamReader,
    )

    target = str(tmp_path / "t")
    merge_append(
        spark,
        target,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string"),
        ["k"],
    )  # v1
    merge_upsert(
        spark,
        target,
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, s string"),
        ["k"],
    )  # v2

    reader = _TxlogStreamReader(_table_schema(target), {"path": target})
    rows = []
    for p in reader.partitions({"version": 0}, reader.latestOffset()):
        for rb in reader.read(p):
            rows.extend(rb.to_pylist())
    assert sorted((r["k"], r["s"], r[CHANGE_COL], r[VERSION_COL]) for r in rows) == [
        (1, "a", "insert", 1),
        (2, "B", "update_postimage", 2),
        (2, "b", "insert", 1),
        (2, "b", "update_preimage", 2),
        (3, "c", "insert", 2),
    ]


def test_txlog_stream_max_commits_per_trigger(spark, tmp_path):
    """Source rate limiting (SURVEY §2.9, the reference's LIMIT-100
    polling): a 6-commit backlog with maxCommitsPerTrigger=2 drains in
    ≥3 non-empty micro-batches — never one giant catch-up batch — and
    the drained table is identical to the unlimited read."""
    import time

    from stonkwhisperer_spark.sinks.writers import merge_append
    from stonkwhisperer_spark.sources.txlog_stream import (
        TxlogChangeFeedDataSource,
        _table_schema,
        _TxlogStreamReader,
    )

    target = str(tmp_path / "t")
    for i in range(6):
        merge_append(
            spark,
            target,
            spark.createDataFrame([(i, f"v{i}")], "k long, s string"),
            ["k"],
        )

    # Control plane first (no Spark roundtrip): offsets advance by 2.
    reader = _TxlogStreamReader(
        _table_schema(target), {"path": target, "maxCommitsPerTrigger": "2"}
    )
    assert reader.initialOffset() == {"version": 0}
    assert reader.latestOffset() == {"version": 2}
    assert reader.latestOffset() == {"version": 4}
    assert reader.latestOffset() == {"version": 6}
    assert reader.latestOffset() == {"version": 6}  # caught up

    # The real stream: processingTime trigger (availableNow downgrades
    # to single-batch in the Python bridge — it would stop at 2 commits).
    try:
        spark.dataSource.register(TxlogChangeFeedDataSource)
    except Exception:
        pass
    name = "txlog_rate_limited"
    feed = (
        spark.readStream.format("stonkw_txlog_cdc")
        .option("path", target)
        .option("maxCommitsPerTrigger", 2)
        .load()
    )
    q = (
        feed.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and spark.table(name).count() < 6:
            time.sleep(0.5)
        assert spark.table(name).count() == 6, "backlog did not drain"
        busy = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(busy) >= 3, (
            f"6-commit backlog drained in {len(busy)} batches; "
            "rate limit not applied"
        )
    finally:
        q.stop()
    rows = {(r.k, r.s, r._commit_version) for r in spark.table(name).collect()}
    assert rows == {(i, f"v{i}", i + 1) for i in range(6)}


def test_txlog_stream_starting_timestamp_and_horizon(spark, tmp_path):
    """startingTimestamp subscribes from the first commit at/after the
    instant (Delta semantics); both start options together raise; a
    vacuumed table refuses subscriptions below the retention horizon."""
    import time as _time

    import pytest

    from stonkwhisperer_spark.sinks.writers import merge_append, merge_upsert, vacuum
    from stonkwhisperer_spark.sources.txlog_stream import (
        _table_schema,
        _TxlogStreamReader,
    )

    target = str(tmp_path / "t")
    merge_append(
        spark, target, spark.createDataFrame([(1, "a")], "k long, s string"), ["k"]
    )
    _time.sleep(0.05)
    mid = int(_time.time() * 1000)
    _time.sleep(0.05)
    merge_append(
        spark, target, spark.createDataFrame([(2, "b")], "k long, s string"), ["k"]
    )
    schema = _table_schema(target)

    reader = _TxlogStreamReader(
        schema, {"path": target, "startingTimestamp": str(mid)}
    )
    assert reader.initialOffset() == {"version": 1}  # v2 inclusive
    # an instant after every commit → future-only subscription
    reader = _TxlogStreamReader(
        schema,
        {"path": target, "startingTimestamp": str(int(_time.time() * 1000) + 10_000)},
    )
    assert reader.initialOffset() == {"version": 2}
    with pytest.raises(ValueError, match="not both"):
        _TxlogStreamReader(
            schema,
            {"path": target, "startingVersion": "1", "startingTimestamp": str(mid)},
        )

    # vacuum to horizon 2, then a below-horizon subscription must refuse
    merge_upsert(
        spark, target, spark.createDataFrame([(1, "A")], "k long, s string"), ["k"]
    )
    vacuum(target, retain_versions=1)  # head=3 → cutoff=2
    with pytest.raises(ValueError, match="retention horizon"):
        _TxlogStreamReader(schema, {"path": target, "startingVersion": "1"})
    _TxlogStreamReader(schema, {"path": target, "startingVersion": "3"})


def test_jsonl_roundtrip_surfaces_corrupt_line(spark):
    # The malformed landing line must surface as exactly one
    # '<corrupt>' group (PERMISSIVE + corrupt-record column), never be
    # silently dropped, and never poison the typed groups.
    from stonkwhisperer_spark.plans.registry import query_map

    rows = {
        r.lang: r
        for r in query_map()["jsonl_ingest_roundtrip"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    bad = rows.pop("<corrupt>")
    assert bad.n_docs == 1 and bad.sum_chars is None
    assert all(r.sum_chars is not None for r in rows.values())
