"""Skew-handling operators: salted two-phase aggregation and salted
broadcast-side explosion for joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these explicit forms cover the cases AQE can't: a single
pathologically hot GROUP BY key (AQE only splits join partitions, not
aggregation keys), and non-broadcastable skewed joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    Phase 1 groups by (keys..., salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the partials per key. ``aggs``
    maps output name → (merge_fn_name, phase1_expr) where merge_fn is
    'sum', 'min', or 'max' (the re-aggregable merges; count merges via
    sum). Results are identical to a direct groupBy for these
    decomposable aggregates.

    Note: Spark's OWN hash aggregation already does map-side partials,
    which handles most aggregation skew; explicit salting matters when
    the per-key STATE is heavy (collect_list-ish) or partial aggs are
    disabled. It is also the didactic pattern for salted JOINs.
    """
    salted = df.withColumn("_salt", (F.spark_partition_id() + F.monotonically_increasing_id()) % n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (_, expr) in aggs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    return phase1.groupBy(*keys).agg(
        *[merge[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``small`` is modest
    but above the broadcast threshold: salt the skewed side, explode
    the small side ``n_salts``× so every (key, salt) pair matches.
    Shuffle partitions then hold at most 1/n_salts of a hot key."""
    salted = skewed.withColumn("_salt", (F.crc32(F.col(on).cast("string")) + F.spark_partition_id()) % n_salts)
    exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(exploded, [on, "_salt"]).drop("_salt")


def sketch_salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    hot_keys: DataFrame,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join that salts ONLY the hot keys — the production
    refinement of :func:`salted_join`, whose blanket n_salts× small-side
    explosion taxes every key to protect the few. ``hot_keys`` is a
    one-column (``on``) relation of keys needing the treatment —
    typically the output of a Count-Min point-estimate scan
    (:func:`stonkwhisperer_spark.operators.sketches.cms_point_estimates`
    over the key domain, thresholded), so detection costs a sketch
    probe, not a second exact aggregation over the fact table.

    Both sides learn hotness from the BROADCAST hot set: hot fact rows
    spread over ``n_salts`` salts (the salt must vary per ROW within a
    hot key — crc32(key)+partition_id, same recipe as
    :func:`salted_join`; a key-only salt would re-collapse the hot key
    onto one reducer), cold rows keep salt 0; the small side
    replicates hot keys ``n_salts``× and cold keys once. The join
    is then a plain equi-join on (key, salt): result-identical to the
    unsalted join (pytest + oracle-gated), with shuffle partitions
    bounded at 1/n_salts of a hot key and ZERO replication overhead on
    the cold long tail.

    A false positive from the sketch (CMS error is one-sided: only
    overestimates) merely salts a cold key — result unchanged, cost a
    few extra small-side rows. At 100 TB this is the difference
    between replicating a 10⁶-row dim 16× and replicating 20 hot
    rows 16×."""
    hot = F.broadcast(hot_keys.select(F.col(on)).distinct().withColumn("_hot", F.lit(True)))
    sk = (
        skewed.join(hot, on, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                (F.crc32(F.col(on).cast("string")) + F.spark_partition_id())
                % n_salts,
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    sm = (
        small.join(hot, on, "left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hot").isNotNull(),
                    F.array(*[F.lit(i).cast("long") for i in range(n_salts)]),
                ).otherwise(F.array(F.lit(0).cast("long")))
            ),
        )
        .drop("_hot")
    )
    return sk.join(sm, [on, "_salt"]).drop("_salt")
