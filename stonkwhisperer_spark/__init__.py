"""stonkwhisperer_spark — a PySpark-native analytics engine with the
capabilities of the gazi04/stonkWhisperer pipeline (see SURVEY.md).

Layout:
    session.py    SparkSession factory tuned for local[32] / cluster parity
    schemas.py    explicit StructTypes (reference entities + testdata tables)
    sources/      table loaders, landing-zone readers, REST adapters (stubbed)
    functions/    scalar column-function libraries (text, time, quality)
    operators/    composable DataFrame operators (clean, dedup, gapfill, joins,
                  profiling, similarity, multimodal)
    plans/        registered analytics queries + DuckDB oracle SQL
    sinks/        partitioned/idempotent writers
    streaming/    Structured Streaming jobs (watermark dedup, windowed bars)
"""

__version__ = "0.1.0"
