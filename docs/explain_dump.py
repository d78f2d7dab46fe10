"""Dump .explain("formatted") for named queries to <outdir>/<query>_<tag>.txt.

Optimization-round evidence helper (plans/r15/): run once at the
pre-change tree (tag=before) and once at the post-change tree
(tag=after). Building a query's DataFrame runs its gate machinery
(txlog commits, drains), so only pass queries whose RETURNED plan is
the evidence target.

Usage: python docs/explain_dump.py <outdir> <tag> <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stonkwhisperer_spark.plans.registry import query_map  # noqa: E402
from stonkwhisperer_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, tag, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stonkwhisperer-explain", cpus="8")
    qmap = query_map()
    for name in names:
        df = qmap[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
