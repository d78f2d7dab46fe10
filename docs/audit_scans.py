"""Repeated-scan audit: for every registered query, count the physical
plan's scans of each big table and how many DISTINCT pruned schemas
they use. Interpretation (see docs/SCALE.md "Repeated-scan audit"):

* N scans, 1 distinct schema  -> canonical-identical subtrees; AQE's
  stage cache / ReuseExchange collapses them at runtime (the shape the
  r10 jaccard rebuild and the r11 bm25/corpus_drift fixes converge on).
* extra scans with THIN schemas (no fat column) -> cheap columnar
  reads; parquet column pruning means they never touch the text bytes.
* >=2 distinct schemas that EACH include a fat column (documents.text,
  embeddings.embedding) -> the real smell: per-branch pruning broke
  exchange reuse and the corpus pays multiple full passes. Fix with a
  shared subtree (align pruning) or an eager localCheckpoint of the
  bounded intermediate.

Usage: python docs/audit_scans.py [query ...]   (default: all; prints
only flagged queries unless names are given)
"""

import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")
from stonkwhisperer_spark.plans.registry import query_map  # noqa: E402
from stonkwhisperer_spark.session import get_spark  # noqa: E402

FAT = {"documents": "text", "embeddings": "embedding"}
SF = "/root/testdata/sf0.01"

# Documented multi-pass designs — the repeated fat scan is the chosen
# memory/IO tradeoff, not lost exchange reuse:
#   dsir_sample: DSIR's contract is "stream the raw pool twice, never
#   materialize it" (pass 1: bucket counts, no doc_id; pass 2: per-doc
#   rescoring against the broadcast affinity table). Collapsed from an
#   accidental 3 passes to the documented 2 in round 11.
ALLOWED_MULTI_PASS = {"dsir_sample"}


def audit(plan: str) -> dict[str, Counter]:
    out: dict[str, Counter] = {}
    for table in ("documents", "embeddings", "lineitem", "orders", "events"):
        schemas = re.findall(
            rf"FileScan parquet[^\n]*{table}\.parquet[^\n]*ReadSchema: ([^\n]*)",
            plan,
        )
        if schemas:
            out[table] = Counter(schemas)
    return out


def main() -> None:
    registered = query_map()
    unknown = [n for n in sys.argv[1:] if n not in registered]
    if unknown:
        # A typo'd name would otherwise match nothing, audit zero
        # queries, and print "all clean" — a false negative for
        # exactly the user who asked about a specific query.
        sys.exit(f"unknown query name(s): {unknown} — not in query_map()")
    spark = get_spark(app_name="scan-audit", cpus="8")
    names = sys.argv[1:] or list(registered)
    explicit = bool(sys.argv[1:])
    flagged = []
    for name, fn in registered.items():
        if name not in names:
            continue
        try:
            plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — side-effecting e2e queries
            print(f"  {name}: skipped ({type(e).__name__})")
            continue
        tables = audit(plan)
        smells = {
            t: c
            for t, c in tables.items()
            if t in FAT
            and name not in ALLOWED_MULTI_PASS
            and sum(1 for s in c if FAT[t] in s) >= 2
        }
        if smells:
            flagged.append(name)
            print(f"FLAG {name}:")
            for t, c in smells.items():
                for schema, n in c.items():
                    print(f"    {n} x {t} {schema[:100]}")
        elif explicit:
            print(f"  {name}: clean", {t: dict(c) for t, c in tables.items()})
    spark.stop()
    print(f"flagged: {flagged}" if flagged else "all clean")


if __name__ == "__main__":
    main()
