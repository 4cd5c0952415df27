"""Embedding storage ops: int8 quantization / dequantization.

At 100 TB the embedding column dominates storage (64 × float32 = 256 B
per row); symmetric int8 quantization cuts it 4× (1 B per dim + one
float scale) at a bounded reconstruction error of scale/2 per element —
the standard trade ANN stores (FAISS SQ8-style) make before indexing.

Everything is a per-row expression: one pass over the vector computes
the max-abs scale, a second emits round(x/scale) int8 codes — no
shuffle, no UDF, and every step is plain IEEE arithmetic, so the DuckDB
oracle reproduces the codes bit-for-bit (Spark's round is HALF_UP =
ties away from zero, same as DuckDB's round).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Q_MAX = 127  # symmetric int8 range [-127, 127]
_HASH_MOD = 1_000_000_007
_HASH_BASE = 31


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    out_scale: str = "scale",
    out_vec: str = "qvec",
    keep: list[str] | None = None,
) -> DataFrame:
    """(id, [keep...], scale, qvec): symmetric per-vector int8
    quantization.

    scale = max|x| / 127 (1.0 for all-zero vectors); code = round(x /
    scale) ∈ [-127, 127]. Reconstruction x̂ = code·scale satisfies
    |x̂ - x| ≤ scale/2 elementwise. ``keep`` columns ride through the
    projection untouched (no join, stays map-only).
    """
    keep = keep or []
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(float(Q_MAX))).otherwise(F.lit(1.0))
    # scale must be a named column (not re-derived per element) so the
    # codes divide by the exact same double the row reports
    staged = df.select(F.col(id_col), *keep, v.alias("__v"), scale.alias(out_scale))
    qvec = F.transform(
        F.col("__v"), lambda x: F.round(x / F.col(out_scale)).cast("int")
    )
    return staged.select(id_col, *keep, out_scale, qvec.alias(out_vec))


def dequantize(qvec: Column, scale: Column) -> Column:
    """x̂ = code·scale, back to array<double>."""
    return F.transform(qvec, lambda q: q.cast("double") * scale)


def qvec_checksum(qvec: Column) -> Column:
    """Order-sensitive polynomial hash of the code vector — a scalar
    that equals iff every code matches (used by the oracle row so the
    compare stays on scalar columns)."""
    return F.aggregate(
        qvec,
        F.lit(0).cast("long"),
        lambda acc, q: (acc * _HASH_BASE + q.cast("long")) % _HASH_MOD,
    )


def quantize_oracle_sql(
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`quantize_embeddings` summarized to
    scalars: per-vector scale, code min/max/sum, and the polynomial
    checksum over the full code sequence."""
    return f"""
WITH b AS (SELECT {id_col}, list_transform({vec_col}, x -> x::DOUBLE) AS v FROM {table}),
s AS (SELECT {id_col}, v,
        (CASE WHEN amax > 0 THEN amax / {float(Q_MAX)!r} ELSE 1.0 END) AS scale
      FROM (SELECT {id_col}, v,
              list_max(list_transform(v, x -> abs(x))) AS amax FROM b)),
q AS (SELECT {id_col}, scale,
        list_transform(v, x -> CAST(round(x / scale) AS INTEGER)) AS qv
      FROM s)
SELECT {id_col}, scale,
  list_min(qv) AS q_min, list_max(qv) AS q_max,
  list_sum(qv)::BIGINT AS q_sum,
  list_reduce(list_prepend(0::BIGINT, list_transform(qv, q -> q::BIGINT)),
              (acc, q) -> (acc * {_HASH_BASE} + q) % {_HASH_MOD}) AS q_hash
FROM q"""
