#!/usr/bin/env python
"""Dev-loop parity runner: compare every registered query (or the names
given as argv) against its DuckDB oracle at sf0.001 (override with
PARITY_SF_DIR). Faster feedback than the full pytest session."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

from stonkwhisperer_spark.plans.registry import QUERIES, query_map  # noqa: E402
from stonkwhisperer_spark.session import get_spark  # noqa: E402
from tests.parity import audit_schema, compare, register_views  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
    all_names = list(query_map())  # also populates QUERIES via _load()
    names = sys.argv[1:] or all_names
    spark = get_spark(app_name="parity-dev", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    register_views(con, sf_dir)
    failed = []
    for name in names:
        spec = QUERIES[name]
        if spec.oracle is None:
            df = spec.fn(spark, sf_dir)
            audit_schema(df, name)
            print(f"  {name}: (no oracle — rows-only) rows={df.count()}")
            continue
        try:
            compare(spec.fn(spark, sf_dir), con, spec.oracle, name)
            print(f"  {name}: OK")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"  {name}: FAIL {str(e)[:400]}")
    spark.stop()
    if failed:
        sys.exit(f"FAILED: {failed}")
    print("all green")


if __name__ == "__main__":
    main()
