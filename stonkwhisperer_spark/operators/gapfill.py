"""Group-wise gap-fill operators (SURVEY.md §2.6 W1–W4).

Reference semantics (data_pipeline/tasks/transformation.py:206-215):
``sort_values(['symbol','timestamp'])`` then per-symbol ``ffill()`` on
price columns, ``bfill()`` for leading nulls, and constant 0-fill for
volume columns — re-expressed as window functions:

  * ffill = ``last(c, ignorenulls=True)`` over rows from the partition
    start to the current row (W2);
  * bfill = ``first(c, ignorenulls=True)`` over the current row to the
    partition end (W3);
  * constant fill = ``na.fill`` / ``coalesce`` (W4).

The explicit sort the reference performs (W1) is the window's orderBy —
Spark sorts within each key partition only, never globally. Ordering
carries a tie-breaker column so duplicate timestamps fill
deterministically (SURVEY §7.4).

Scale: one hash shuffle on the partition keys; per-key data is sorted
within its task. Keys must be reasonably high-cardinality (symbols,
users) — the same caveat as any window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _desc(o: Column | str) -> Column:
    return F.col(o).desc() if isinstance(o, str) else o.desc()


def _windows(keys: Sequence[str], order: Sequence[Column | str]):
    # Both fills are RUNNING frames (unboundedPreceding → currentRow):
    # bfill runs over the REVERSED ordering instead of a
    # currentRow → unboundedFollowing frame. Same semantics ("first
    # non-null at-or-after this row"), very different cost: Spark's
    # WindowExec evaluates growing frames incrementally (O(n) per
    # partition) but re-aggregates shrinking/following frames per row
    # (O(n²) — measured 10s vs <2s on a 67k-row partition).
    wff = W.partitionBy(*keys).orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wbf = W.partitionBy(*keys).orderBy(*[_desc(o) for o in order]).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return wff, wbf


def _ff(c: str, wff) -> Column:
    return F.last(c, ignorenulls=True).over(wff)


def _bf(c: str, wbf) -> Column:
    # last-non-null over the descending running frame == first non-null
    # at-or-after the row in ascending order.
    return F.last(c, ignorenulls=True).over(wbf)


def forward_fill(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column | str], cols: Sequence[str]
) -> DataFrame:
    """W2: per-key forward fill of ``cols`` in ``order``."""
    wff, _ = _windows(keys, order)
    return df.withColumns({c: _ff(c, wff) for c in cols})


def backward_fill(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column | str], cols: Sequence[str]
) -> DataFrame:
    """W3: per-key backward fill of ``cols`` in ``order``."""
    _, wbf = _windows(keys, order)
    return df.withColumns({c: _bf(c, wbf) for c in cols})


def gap_fill(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
    fill_cols: Sequence[str],
    const_fill: dict[str, float | int] | None = None,
) -> DataFrame:
    """W1–W4 composed: ffill then bfill ``fill_cols`` per key, then
    constant-fill ``const_fill`` columns (reference
    transformation.py:206-215 end-to-end).

    Both windows share one hash partitioning (one shuffle); the two
    sort orders cost one extra in-partition sort — the price of keeping
    both fills on O(n) running frames (see _windows).
    """
    wff, wbf = _windows(keys, order)
    out = df.withColumns(
        {c: F.coalesce(_ff(c, wff), _bf(c, wbf)) for c in fill_cols}
    )
    if const_fill:
        out = out.na.fill(const_fill)
    return out
