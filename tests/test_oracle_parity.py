"""Every registered query with an oracle must hash-match DuckDB at
sf0.001 (the driver re-runs the same compare at sf0.01)."""

from __future__ import annotations

import pytest

from stonkwhisperer_spark.plans.registry import QUERIES, query_map

from .conftest import SF_ORACLE
from .parity import compare, register_views

query_map()  # populate registry
NAMES = sorted(QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_parity(spark, duck, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_ORACLE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors driver behavior
        return
    register_views(duck, SF_ORACLE)
    compare(df, duck, spec.oracle, name=name)
