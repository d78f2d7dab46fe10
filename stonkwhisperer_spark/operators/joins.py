"""Join-family operators (SURVEY.md §2.4 J1–J6) as composable
DataFrame transforms.

Reference semantics re-expressed Spark-first:
  * J2 broadcast dim lookup — reference ships a ticker→company_id dict to
    every Celery worker (data_pipeline/tasks/loading.py:93-115,
    services/company_service.py:23-33); here it is an explicit
    ``F.broadcast`` inner join (inner = the reference's skip-unknown rows
    semantics, loading.py:330-333).
  * J3/J4 left-anti vs target — reference queries existing keys and skips
    matches (loading.py:150-161, 213-224); here a ``left_anti`` join.
  * J5 lookup-or-create — reference probes an intra-batch url→Article
    cache, creating rows on miss (loading.py:226-274); here
    dropDuplicates (the batch cache) + anti-join (the lookup) + union
    (the create) + equi-join (the FK backfill).

Scale posture: dims are broadcast explicitly; the anti/semi joins shuffle
on the (high-cardinality) natural key only; fact⋈fact joins shuffle on
their equi-key and rely on AQE for skew splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    facts: DataFrame,
    dim: DataFrame,
    on: Column | str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """J2: enrich a fact table from a small dimension via broadcast join.

    ``how='inner'`` reproduces the reference's skip-unknown-key behavior
    (loading.py:330-333); use ``'left'`` to keep unmatched facts.
    """
    return facts.join(F.broadcast(dim), on, how)


def new_rows_anti(
    incoming: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """J3/J4: rows of ``incoming`` whose key is absent from ``existing``
    (the insert set of an idempotent merge, loading.py:150-161).

    ``existing`` needs only the key columns; they are projected here so
    the scan on the target side prunes to the key columns.
    """
    return incoming.join(existing.select(*keys), list(keys), "left_anti")


def lookup_or_create(
    batch: DataFrame,
    existing: DataFrame,
    key: str,
    create_cols: dict[str, Column],
) -> DataFrame:
    """J5: return a complete dimension covering every key in ``batch`` —
    existing rows as-is, missing keys materialized via ``create_cols``
    (column expressions evaluated over the deduplicated batch).

    The reference's intra-batch cache (loading.py:274) becomes
    ``dropDuplicates([key])``; the DB probe becomes an anti-join.
    """
    wanted = batch.select(key).where(F.col(key).isNotNull()).dropDuplicates([key])
    missing = wanted.join(existing.select(key), [key], "left_anti")
    created = missing.select(key, *[c.alias(n) for n, c in create_cols.items()])
    return existing.unionByName(created)


def fk_backfill(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    fk_col: str,
    dim_id: str = "id",
) -> DataFrame:
    """J5 step 2 / J6: left-join facts to a dimension on a natural key and
    project the dimension id as ``fk_col`` (reference loading.py:276-292,
    posts→article_id)."""
    dim_kv = dim.select(F.col(on), F.col(dim_id).alias(fk_col))
    return facts.join(F.broadcast(dim_kv), [on], "left")
