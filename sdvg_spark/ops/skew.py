"""Skew-mitigation helpers.

Spark's own defenses cover most skew: hash aggregation does map-side
partial aggregation (a hot key collapses to one row per input
partition before the shuffle), and AQE splits skewed JOIN partitions
(``spark.sql.adaptive.skewJoin.enabled``, on via
:func:`sdvg_spark.session.configure_session`). The residual case is an
aggregate whose per-key state is NOT constant-size — ``collect_list``,
``collect_set``, large HLL/sketch buffers, or windowed accumulations —
where every row of a hot key still lands on one reducer. Salting fixes
that: shard each key across ``n_salts`` sub-keys, aggregate partially
per shard, then combine the (now n_salts-bounded) shards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# out-of-the-box decomposable aggregates: (partial fn, final combine fn)
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "collect_set": (F.collect_set, None),  # final = flatten+distinct
    "collect_list": (F.collect_list, None),  # final = flatten
    # composed in-line rather than via the table:
    #   avg                   -> sum partial + count partial, sum/sum final
    #   approx_count_distinct -> hll_sketch_agg partial, hll_union_agg +
    #                            hll_sketch_estimate final (DataSketches
    #                            HLL is union-mergeable, so sharding is
    #                            lossless: estimate(union(shards)) ==
    #                            estimate(whole)). Exact count_distinct
    #                            is NOT decomposable over salts (distinct
    #                            sets overlap across shards) — use the
    #                            sketch or a two-phase distinct instead.
    "avg": (None, None),
    "approx_count_distinct": (None, None),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    n_salts: int = 64,
    salt_by: str = "partition",
) -> DataFrame:
    """Two-stage aggregation sharding hot keys over ``n_salts`` salts.

    ``aggs`` maps output name -> (fn, column) with fn one of ``sum``,
    ``count``, ``min``, ``max``, ``avg``, ``approx_count_distinct``,
    ``collect_set``, ``collect_list``. Stage 1 groups by (keys, salt) —
    a hot key's rows spread over ``n_salts`` reducers; stage 2 groups by
    keys alone and combines the at-most-``n_salts`` partial rows per
    key. ``avg`` is composed as sum+count partials;
    ``approx_count_distinct`` shards DataSketches HLL sketches and
    unions them (lossless under union).

    ``salt_by`` picks the shard derivation (every listed aggregate is
    shard-order-insensitive, so BOTH give the deterministic plain
    GROUP BY answer — collect_* outputs are sorted for that reason):

    * ``"partition"`` (default): salt = spark_partition_id % n_salts.
      Rows of a key within one input partition share a salt, so stage
      1's map-side combine still collapses them to ONE partial row per
      (key, partition) — the pre-shuffle data volume of a PLAIN
      aggregate. A hot key spanning many input partitions (the normal
      skew shape: scans interleave keys) still fans out across shards.
      The r9 sf100 probe measured the row-salt form at 11.3 GB memory
      spill on a NON-skewed high-cardinality key space: the row salt
      multiplied every partition's partial-agg key space x n_salts for
      zero benefit, which this derivation never does.
    * ``"row"``: salt = monotonically_increasing_id % n_salts — shards
      even a key confined to a single input partition, at n_salts x
      the partial-agg state. Reach for it only when one upstream
      partition itself holds the hot key (e.g. a pre-sorted input).
    """
    for name, (fn, _) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(
                f"{name}: {fn!r} is not decomposable; supported: "
                f"{sorted(_DECOMPOSABLE)}"
            )
    if salt_by == "partition":
        salt = F.pmod(F.spark_partition_id().cast("long"), F.lit(n_salts))
    elif salt_by == "row":
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    else:
        raise ValueError(f"salt_by must be partition|row, got {salt_by!r}")
    salted = df.withColumn("__salt", salt)
    partials = []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            partials.append(F.sum(col).alias(f"__p_{name}_s"))
            partials.append(F.count(col).alias(f"__p_{name}_c"))
        elif fn == "approx_count_distinct":
            partials.append(F.hll_sketch_agg(col).alias(f"__p_{name}"))
        else:
            partials.append(_DECOMPOSABLE[fn][0](col).alias(f"__p_{name}"))
    stage1 = salted.groupBy(*keys, "__salt").agg(*partials)
    finals = []
    for name, (fn, _col) in aggs.items():
        p = F.col(f"__p_{name}")
        if fn == "collect_set":
            finals.append(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list(p)))).alias(name)
            )
        elif fn == "collect_list":
            finals.append(F.array_sort(F.flatten(F.collect_list(p))).alias(name))
        elif fn == "avg":
            finals.append(
                (F.sum(f"__p_{name}_s") / F.sum(f"__p_{name}_c")).alias(name)
            )
        elif fn == "approx_count_distinct":
            finals.append(F.hll_sketch_estimate(F.hll_union_agg(p)).alias(name))
        else:
            finals.append(_DECOMPOSABLE[fn][1](p).alias(name))
    return stage1.groupBy(*keys).agg(*finals)
