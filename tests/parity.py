"""Local emulation of the driver's DuckDB-oracle compare:
row count + column names + order-insensitive exact value multiset.
Run it at sf0.001 in the dev loop to catch hash drift before the driver
does at sf0.01.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from pathlib import Path

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def _norm(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(timespec="microseconds"))
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_norm(x) for x in v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_norm(row[i]) for i in order) for row in rows),
        key=lambda t: tuple((str(x),) for x in t),
    )


def audit_schema(spark_df, name: str = "?") -> None:
    """Driver-canonicalizer discipline: the driver canon round-trips
    results through pandas sort_values + value hashing, which chokes on
    array columns (unhashable) and drifts on raw Spark Decimal vs DuckDB
    decimal→float string forms (CORRECTNESS_r02 bars_clean /
    doc_fingerprints). No registered query may emit decimal, array, or
    map columns in its final projection — serialize or cast first."""
    from pyspark.sql import types as T

    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.DecimalType, T.ArrayType, T.MapType))
    ]
    assert not bad, (
        f"[{name}] driver-canon-unsafe column types in final projection: {bad} "
        "(cast decimals to double, serialize arrays/maps to strings)"
    )


def audit_oracle_schema(arrow_table, name: str = "?") -> None:
    """Mirror of :func:`audit_schema` for the DuckDB side: the driver
    pulls oracle results through arrow/pandas, where DuckDB HUGEINT
    (e.g. ``sum(BIGINT)``) surfaces as decimal128 → ``Decimal`` and
    hash-mismatches Spark's int64 even when every value is equal
    (CORRECTNESS_r04 pack_documents / user_event_runs). Ban decimal in
    the oracle's final projection — ``CAST(... AS BIGINT/DOUBLE)``."""
    import pyarrow as pa

    bad = [
        f"{f.name}:{f.type}"
        for f in arrow_table.schema
        if pa.types.is_decimal(f.type)
    ]
    assert not bad, (
        f"[{name}] oracle emits decimal columns (DuckDB HUGEINT?): {bad} "
        "— wrap in CAST(... AS BIGINT) / CAST(... AS DOUBLE) in the SQL"
    )


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    audit_schema(spark_df, name)
    srows = [tuple(r) for r in spark_df.collect()]
    scols = spark_df.columns
    # Fetch the oracle through arrow — the driver's path. fetchall()
    # converts HUGEINT to Python int and would mask the drift audited
    # above, leaving this suite green while the driver hash is red.
    tbl = con.execute(sql).fetch_arrow_table()
    audit_oracle_schema(tbl, name)
    dcols = list(tbl.column_names)
    drows = [tuple(rec[c] for c in dcols) for rec in tbl.to_pylist()]

    assert sorted(scols) == sorted(dcols), (
        f"[{name}] column mismatch: spark={sorted(scols)} duckdb={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"[{name}] row count mismatch: spark={len(srows)} duckdb={len(drows)}"
    )
    ms, md = _multiset(srows, scols), _multiset(drows, dcols)
    if ms != md:
        diffs = [(a, b) for a, b in zip(ms, md) if a != b][:5]
        raise AssertionError(f"[{name}] value mismatch; first diffs (spark vs duckdb): {diffs}")
