"""stonkwhisperer_spark — a PySpark-native analytics engine with the
capabilities of the gazi04/stonkWhisperer pipeline (see SURVEY.md).

Layout:
    session.py    SparkSession factory tuned for local[32] / cluster parity
    schemas.py    explicit StructTypes (reference entities + raw landing zone)
    sources/      table loaders, landing-zone readers, mapInPandas fetch
                  adapters (httpx behind an import-try)
    functions/    scalar column libraries: text cleaning/quality, portable
                  hashing + shingling (cross-engine deterministic)
    operators/    composable DataFrame operators: joins (broadcast dim,
                  anti-merge, lookup-or-create), gap-fill windows, as-of
                  join, dedup (Jaccard/MinHash-LSH/SimHash), similarity
                  (kNN, hyperplane LSH), profiling, multimodal plumbing
    pipelines/    the reference's three transform flows (news/posts/bars)
    plans/        registered analytics queries + DuckDB oracle SQL
    sinks/        partitioned + idempotent merge-append writers
    streaming/    Structured Streaming jobs (watermark dedup, windowed
                  bars, foreachBatch merge)
    ml/           MLlib sentiment pipeline (Tokenizer→TF-IDF→LR)
"""

__version__ = "0.1.0"
