"""Harness-glue collect discipline (VERDICT r11 task 5).

Several registered queries exercise side-effecting lifecycles (txlog
commits, MERGE maintenance, streaming drains) whose scratch state is
deleted before the function returns, so the gate relation must be
materialized on the driver first. Every such glue collect routes
through :func:`bounded_collect`, which enforces the site's documented
row bound — the driver never silently holds an unbounded relation, and
a query whose "bounded" relation grows past its documented bound fails
loud instead of quietly becoming an O(corpus) driver materialization
(the ivf_assign_incremental r11 finding).

The per-site bounds and why each holds are inventoried in
``docs/SCALE.md`` ("Harness-glue collect inventory");
``tests/test_plan_audit.py`` asserts no bare ``.collect()`` remains in
``plans/`` outside this helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row


def bounded_collect(df: DataFrame, cap: int, what: str) -> list[Row]:
    """Collect ``df`` asserting at most ``cap`` rows.

    The fetch itself is capped (``limit(cap + 1)``), so even on
    violation the driver materializes one row past the bound, never
    the full relation. ``what`` names the collected relation for the
    error message and greps (it should match the inventory row in
    docs/SCALE.md).
    """
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise AssertionError(
            f"bounded_collect[{what}]: relation exceeded its documented "
            f"driver bound of {cap} rows — fix the query or re-derive "
            "the bound (docs/SCALE.md, 'Harness-glue collect inventory')"
        )
    return rows
