"""Python-execution-path queries: the Arrow-batched grouped-map
(``applyInPandas``) and Python UDTF surfaces under the oracle gate.

Everything hot-path in this repo stays JVM-side; these two queries
exist to gate the Python escape hatches THEMSELVES — the contract a
user relies on when built-ins genuinely can't express their logic. The
computations are integer/string-exact (run-length counts, token
positions), so the oracle compare is bit-stable despite crossing the
Arrow boundary twice.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves postponed
# (string) type hints against the defining function's globals, so
# ``pd.Series`` must be importable from here, not a function local.

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# applyInPandas grouped map: per-user run-length encoding of the event
# sequence — order-dependent, per-group, exact.
# --------------------------------------------------------------------------
_RUNS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_runs", T.LongType(), False),
        T.StructField("first_type", T.StringType(), True),
        T.StructField("last_type", T.StringType(), True),
        T.StructField("longest_run", T.LongType(), False),
    ]
)


@register(
    "user_event_runs",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER w AS prev_type,
             row_number()     OVER w AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    agg AS (
      SELECT user_id,
             count(*) AS n_events,
             CAST(sum(CASE WHEN prev_type IS NULL OR event_type != prev_type
                      THEN 1 ELSE 0 END) AS BIGINT)               AS n_runs,
             max(CASE WHEN rn = 1 THEN event_type END)            AS first_type,
             max(CASE WHEN rn = n_events THEN event_type END)     AS last_type
      FROM ordered GROUP BY user_id
    ),
    runs AS (
      SELECT user_id, rn,
             sum(CASE WHEN prev_type IS NULL OR event_type != prev_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS run_id
      FROM ordered
    ),
    longest AS (
      SELECT user_id, max(run_len) AS longest_run
      FROM (SELECT user_id, run_id, count(*) AS run_len
            FROM runs GROUP BY user_id, run_id)
      GROUP BY user_id
    )
    SELECT a.user_id, a.n_events, a.n_runs, a.first_type, a.last_type,
           l.longest_run
    FROM agg a JOIN longest l USING (user_id)
    """,
)
def q_user_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user run-length encoding of the time-ordered event-type
    sequence (count of runs, longest run, first/last type) via
    ``applyInPandas`` — the Arrow grouped-map path, where per-group
    ORDER-dependent logic runs as real Python over the whole group.
    The oracle is the gaps-and-islands SQL twin, so the Python result
    must agree row-for-row with the relational formulation.

    Scale: one shuffle on user_id ships each group to one Python
    worker as a single Arrow batch; state is one group in memory —
    the documented constraint of grouped-map (a 100 TB pipeline keys
    groups small, exactly like this per-user shape)."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )

    def rle(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        types = pdf["event_type"].tolist()
        runs = [len(list(g)) for _, g in __import__("itertools").groupby(types)]
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(types)],
                "n_runs": [len(runs)],
                "first_type": [types[0]],
                "last_type": [types[-1]],
                "longest_run": [max(runs)],
            }
        )

    return events.groupBy("user_id").applyInPandas(rle, _RUNS_SCHEMA)


# --------------------------------------------------------------------------
# Python UDTF: one row in → N rows out with per-row Python logic — the
# table-function escape hatch (Spark 4 ``udtf``).
# --------------------------------------------------------------------------
_UDTF_DOCS = 100


@register(
    "doc_token_positions_udtf",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < {_UDTF_DOCS}
    ),
    p AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) + 1),
                                   i -> {{'pos': i - 1, 'tok': toks[i]}})) AS s
      FROM t
    )
    SELECT doc_id,
           cast(s.pos AS int)         AS pos,
           s.tok                      AS token,
           cast(length(s.tok) AS int) AS token_len
    FROM p
    """,
)
def q_doc_token_positions_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, position, token, length) rows emitted by a real Python
    UDTF — the 1→N table-function path (LATERAL JOIN over a Python
    generator), gated against the unnest-with-ordinality SQL twin. The
    JVM explode family (doc_shingles) remains the hot-path tool; this
    gates the Python escape hatch for generators built-ins can't
    express.

    Scale: map-only — the UDTF runs inside the scan stage's Python
    worker, no shuffle; output cardinality is Σ tokens, the same as the
    explode twin."""
    from pyspark.sql.functions import lit, udtf

    # useArrow: the Arrow-optimized UDTF evaluator (ArrowEvalPythonUDTF)
    # — row-at-a-time BatchEvalPython stays banned by the plan audit.
    @udtf(returnType="pos int, token string, token_len int", useArrow=True)
    class TokenPositions:
        def eval(self, text: str):  # noqa: D401 - UDTF contract
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok, len(tok)

    spark.udtf.register("token_positions", TokenPositions)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _UDTF_DOCS
    )
    docs.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.token_len
        FROM _udtf_docs d, LATERAL token_positions(d.text) t
        """
    )


# --------------------------------------------------------------------------
# event_weighted_stats_udaf — the pandas GROUPED_AGG UDAF escape hatch
# under the gate (the one Python surface shape not yet driver-checked:
# grouped-map, UDTF, and MLlib already are). Arithmetic kept integer-
# exact so the hash cannot drift on float partial-agg order.
# --------------------------------------------------------------------------
@register(
    "event_weighted_stats_udaf",
    oracle="""
    WITH w AS (
      SELECT event_type,
             (event_id % 10) + 1                                  AS wt,
             CAST(floor(value * 10000) AS BIGINT)                 AS v_cents
      FROM events
    )
    SELECT event_type,
           CAST(sum(wt) AS BIGINT)            AS sum_w,
           CAST(sum(wt * v_cents) AS BIGINT)  AS sum_wv,
           CAST(CAST(sum(wt * v_cents) AS DOUBLE)
                / CAST(sum(wt) AS DOUBLE) / 10000.0 AS DOUBLE)    AS weighted_avg
    FROM w GROUP BY event_type
    """,
)
def q_event_weighted_stats_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted value statistics per event type through a
    pandas GROUPED_AGG UDAF (``@pandas_udf`` returning a scalar per
    group, Arrow-batched) — the aggregation escape hatch users take
    when a built-in aggregate can't express the logic. Here the logic
    IS expressible (the production shape is plain ``F.sum``, and the
    DuckDB twin states it), so this query exists to gate the UDAF
    path's correctness: weights and values are pre-quantized to int64
    JVM-side (floor to cents), so the Python-side sums are exact
    integers and immune to float partial-aggregation order; the single
    final division is one deterministic IEEE op on both engines.

    Scale: GROUPED_AGG ships each group's column slice through Arrow —
    fine for bounded group counts (5 event types), the wrong tool for
    billions of groups; partial aggregation does NOT apply (the UDAF
    sees whole groups), which is exactly the trade this docstring and
    the JVM twin document."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def int_sum(s: pd.Series) -> int:
        # int64 sum of int64 inputs — exact, order-free.
        return int(s.sum())

    events = load_table(spark, sf_dir, "events")
    w = events.select(
        "event_type",
        ((F.col("event_id") % 10) + 1).alias("wt"),
        F.floor(F.col("value") * 10000).cast("bigint").alias("v_cents"),
    ).withColumn("wv", F.col("wt") * F.col("v_cents"))
    agg = w.groupBy("event_type").agg(
        int_sum("wt").alias("sum_w"),
        int_sum("wv").alias("sum_wv"),
    )
    return agg.select(
        "event_type",
        "sum_w",
        "sum_wv",
        (
            F.col("sum_wv").cast("double")
            / F.col("sum_w").cast("double")
            / F.lit(10000.0)
        ).alias("weighted_avg"),
    )
