"""Micro-bench: literal-indexed unrolled expression vs zip_with/aggregate
HOF fold for the integer dot/sqdist kernels, across dimensions.

Motivation (optimization r15): batch 1d rewrote the dim-64 kernels as
HOF folds because the 64-term unrolled trees ran INTERPRETED past
hugeMethodLimit. But the PQ subspace kernels run the same helpers at
dsub = dim/M = 8, where the unrolled tree is small enough to stay in
whole-stage codegen + JIT — there the HOF's per-row interpreter
overhead may be the slower side. This prints per-dim steady times for
both shapes over the same pair volume so the kernel can pick by dim.

Usage: python docs/kernel_dim_bench.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stonkwhisperer_spark.session import get_spark  # noqa: E402


def unrolled_int(a: str, b: str, dim: int):
    terms = " + ".join(
        f"(element_at({a}, {d + 1}) * element_at({b}, {d + 1}))"
        for d in range(dim)
    )
    return F.expr(f"CAST(0 AS BIGINT) + {terms}")


def hof_int(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="kernel-dim-bench", cpus="32")
    spark.range(32).count()  # warm

    for dim in (4, 8, 16, 32, 64):
        base = spark.range(n).select(
            "id",
            F.expr(
                f"transform(sequence(1, {dim}), i -> CAST((id * i) % 1021 AS BIGINT))"
            ).alias("va"),
            F.expr(
                f"transform(sequence(1, {dim}), i -> CAST((id * (i+3)) % 1021 AS BIGINT))"
            ).alias("vb"),
        ).localCheckpoint(eager=True)
        for label, col in (
            ("unrolled", unrolled_int("va", "vb", dim)),
            ("hof", hof_int("va", "vb")),
        ):
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                base.select(F.sum(col)).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"dim={dim:3d} {label:9s} {best:7.3f}s", flush=True)
        base.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
