"""Regenerate docs/SCALING.md from three bench_full.json captures.

Usage:
    for sf in 0.001 0.01 0.1; do
        SPARK_GRAFT_SF_DIR=/root/testdata/sf$sf python bench.py
        cp bench_full.json /tmp/bench_sf${sf//./}.json   # or any naming
    done
    python docs/gen_scaling.py /tmp/b001.json /tmp/b01.json /tmp/b1.json
"""

import json
import sys

p001, p01, p1 = sys.argv[1:4]
b = [json.load(open(p)) for p in (p001, p01, p1)]
q001, q01, q1 = (x["queries"] for x in b)
common = sorted(set(q001) & set(q01) & set(q1))
ratios = {n: q1[n] / q001[n] for n in common if q001[n] > 0}
by_ratio = sorted(ratios, key=ratios.get, reverse=True)
assert len(by_ratio) == len(common), (
    "a query with a 0s sf0.001 timing was dropped from the ratio table — "
    "the sidecar would no longer be complete"
)

# Machine-readable sidecar (VERDICT r12 task 6): the complete per-query
# numbers behind every claim in SCALING.md, so "N of M grow <=2x" and
# the debut ratios are checkable without re-running the three sweeps.
sidecar = {
    "sf_dirs": ["sf0.001", "sf0.01", "sf0.1"],
    "suite_totals_sec": [b[0]["value"], b[1]["value"], b[2]["value"]],
    "n_queries": len(by_ratio),
    "queries": {
        n: {
            "sf0.001": q001[n],
            "sf0.01": q01[n],
            "sf0.1": q1[n],
            "x100_ratio": round(ratios[n], 3),
        }
        for n in by_ratio
    },
}
with open("docs/scaling_full.json", "w") as f:
    json.dump(sidecar, f, indent=1)

out = [
    "# Measured weak scaling (local[32], 100x data range)",
    "",
    "`bench.py` at sf0.001 / sf0.01 / sf0.1 — a 100x row-count range on the",
    "same 32-core box. The interesting number is the **x100 ratio** (sf0.1",
    "time / sf0.001 time): a query whose plan is dominated by per-row work",
    "scales toward 100x; one dominated by fixed overhead (job scheduling,",
    "planning, state-store setup) stays near 1x. On a real cluster the",
    "fixed costs stay fixed while per-row work spreads over executors — so",
    "the x100 column bounds how a 100x scale-up degrades each query at",
    "constant parallelism. Timings are quarantined (cache cleared between",
    "queries; outliers re-run against bench_ref.json, min kept).",
    "",
    f"Suite totals: sf0.001 = {b[0]['value']:.1f}s, sf0.01 = "
    f"{b[1]['value']:.1f}s, sf0.1 = {b[2]['value']:.1f}s — **100x the "
    f"data, {b[2]['value'] / b[0]['value']:.2f}x the wall time** across "
    f"all {len(common)} queries.",
    "",
    "Regenerate: see docs/gen_scaling.py.",
    "",
    "## Per-query ratios (complete, most data-sensitive first)",
    "",
    "Machine-readable twin: `docs/scaling_full.json` (same numbers,",
    "regenerated together by this script).",
    "",
    "| query | sf0.001 s | sf0.01 s | sf0.1 s | x100 ratio |",
    "|---|---|---|---|---|",
]
for n in by_ratio:
    out.append(
        f"| {n} | {q001[n]:.2f} | {q01[n]:.2f} | {q1[n]:.2f} | {ratios[n]:.1f}x |"
    )

grow_le2 = sum(1 for r in ratios.values() if r <= 2.0)
steepest = by_ratio[0]
out += [
    "",
    "## Reading the numbers",
    "",
    f"* **No query grows more than {max(ratios.values()):.0f}x across the "
    "100x range.** At these scales every plan is still overhead-dominated "
    "— the per-row work that WILL dominate at 100 TB is exactly the part "
    "a cluster parallelizes, and each such query shuffles once on a "
    "high-cardinality key (docs/SCALE.md shuffle inventory), so that "
    "work divides across executors instead of serializing.",
    f"* {grow_le2} of {len(ratios)} queries grow <=2x — "
    "scheduling/planning cost, amortized identically on a cluster.",
    f"* The steepest grower is `{steepest}` "
    f"({ratios[steepest]:.1f}x)"
    + (
        ": the applyInPandas grouped map — Python-per-group cost grows "
        "with rows by design; it exists to gate the escape hatch, and "
        "its JVM twin (the oracle's gaps-and-islands form) is the "
        "production shape."
        if steepest == "user_event_runs"
        else "."
    ),
    "* Near-dup/ANN families grow with candidate-PAIR counts, which are "
    "bucket-bounded by construction — not the |V|^2 all-pairs curve.",
    "* Streaming drains, `flows_e2e`, txlog lifecycle exercises, and "
    "`sentiment_scores` are fixed-cost job pipelines (ratios near 1x): "
    "micro-batch/commit machinery, not data volume.",
    "",
]
open("docs/SCALING.md", "w").write("\n".join(out))
print("written docs/SCALING.md,", len(common), "queries")
