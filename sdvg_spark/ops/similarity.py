"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one broadcast of the query set,
one scan of the corpus, per-partition partial top-k then a tiny final
reduce (never a global sort of the scored corpus). Scale path:
random-hyperplane LSH bucketing (search only matching buckets) with
multi-probe, trading recall for a corpus-fraction scan.

All scoring is native ``zip_with``/``aggregate`` expressions — the dot
product never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sdvg_spark.ops.dedup import _hyperplane_signature, cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Plan shape at scale: ``queries`` is broadcast (it is the small
    side by construction); scoring is a map-only stage over corpus
    partitions; the only shuffle is the per-query top-k reduce, whose
    input is already cut to ≤ k rows per (query, partition) by the
    per-partition window — shuffle volume is O(q·k·partitions), not
    O(q·corpus).

    Ties broken by corpus id ascending (deterministic).
    """
    q = queries.select(F.col(query_id).alias("q_id"), F.col(query_vec).alias("__qv"))
    from sdvg_spark.ops.dedup import widen

    c = widen(corpus).select(F.col(corpus_id).alias("c_id"), F.col(corpus_vec).alias("__cv"))
    scored = c.join(F.broadcast(q)).select(
        "q_id",
        "c_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    # partial top-k inside each partition (no shuffle), then final top-k
    part = scored.withColumn(
        "__pr",
        F.row_number().over(
            Window.partitionBy(F.spark_partition_id(), "q_id").orderBy(
                F.desc("cosine"), F.asc("c_id")
            )
        ),
    ).where(F.col("__pr") <= k)
    final = part.withColumn(
        "rank",
        F.row_number().over(Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))),
    ).where(F.col("rank") <= k)
    return final.select("q_id", "c_id", "cosine", "rank")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    k: int = 10,
    n_planes: int = 12,
    multiprobe: int = 1,
    seed: int = 7,
    dims: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane signatures bucket the
    corpus; each query probes its own bucket plus all buckets within
    Hamming distance ``multiprobe`` (flip each subset of ≤ m bits).

    At 100 TB the corpus is hash-partitioned (optionally bucketed on
    disk) by signature, so a probe touches ~corpus/2^n_planes rows per
    bucket. Recall grows with ``multiprobe``.
    """
    if dims is None:
        from sdvg_spark.ops.dedup import _infer_dims

        dims = _infer_dims(corpus, corpus_vec)
    from sdvg_spark.ops.dedup import widen

    sig_c = _hyperplane_signature(F.col(corpus_vec), n_planes, seed, dims)
    c = widen(corpus).select(
        F.col(corpus_id).alias("c_id"), F.col(corpus_vec).alias("__cv"), sig_c.alias("__sig")
    )
    sig_q = _hyperplane_signature(F.col(query_vec), n_planes, seed, dims)
    q = queries.select(
        F.col(query_id).alias("q_id"), F.col(query_vec).alias("__qv"), sig_q.alias("__qsig")
    )
    # probe signatures: original + single-bit flips (+ pairs if m=2, ...)
    probes = [F.col("__qsig")]
    if multiprobe >= 1:
        probes += [
            F.col("__qsig").bitwiseXOR(F.lit(1 << b).cast("long")) for b in range(n_planes)
        ]
    if multiprobe >= 2:
        probes += [
            F.col("__qsig")
            .bitwiseXOR(F.lit(1 << b1).cast("long"))
            .bitwiseXOR(F.lit(1 << b2).cast("long"))
            for b1 in range(n_planes)
            for b2 in range(b1 + 1, n_planes)
        ]
    qp = q.select("q_id", "__qv", F.explode(F.array(*probes)).alias("__sig"))
    scored = qp.join(c, "__sig").select(
        "q_id", "c_id", cosine(F.col("__qv"), F.col("__cv")).alias("cosine")
    ).dropDuplicates(["q_id", "c_id"])
    final = scored.withColumn(
        "rank",
        F.row_number().over(Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))),
    ).where(F.col("rank") <= k)
    return final.select("q_id", "c_id", "cosine", "rank")
