"""Deterministic training-order shuffle and source interleaving.

The dataloader step AFTER packing (``ops/corpus.py:pack_sequences``):
a training run wants its samples in a seeded, reproducible global
order — the same order on every re-run, every resume, and every
cluster layout — usually with per-source interleave ratios (the
Megatron-style "blendable dataset": in any window of the stream,
sources appear in the configured proportions, not in corpus
proportions or storage order).

Everything here is a pure ORDERING KEY computed row-wise from
``f(seed, id)`` — integer-only expressions both engines evaluate
bit-identically — plus ONE range shuffle (Spark's global ``orderBy``)
to lay the stream out. No window over the whole corpus, no
single-partition stage, no skew (the keys are uniform hashes):

* ``order_key(seed, id)`` — a 60-bit uniform hash, the md5-prefix
  fold the dedup family already proved engine-portable
  (``ops/corpus.py:duplicate_spans``);
* interleaving scales a 30-bit slice of that hash by
  ``count(source) / weight(source)``: within a source the seeded hash
  order is kept, and a prefix ``[0, T]`` of the key space contains
  ``T · w_s / 2^30`` samples of each source — the mix is the WEIGHTS,
  independent of source size (a source exhausts when its stream runs
  dry, exactly like rate-based blending). All arithmetic stays in
  BIGINT (30-bit hash × count < 2^61): float division would round
  differently per engine and break the oracle.

Resume/slicing composes with ``generate_from/to``-style bounds: the
key is stable, so "the first k samples" is a deterministic set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 30-bit slice keeps key * count inside BIGINT for counts < 2^31;
# weights are scaled to ppm so float ratios stay integer-exact
_H_BITS = 30
_H_MOD = 1 << _H_BITS
_W_SCALE = 1_000_000
# counts at or above this would overflow key * count past 2^61 — at
# that size (2B+ rows in ONE source) shard the source first; enforced
# by a raise_error branch inside the blend-key expression
_MAX_SOURCE_ROWS = (1 << 61) // _H_MOD


def order_hash(seed: int, id_col: Column) -> Column:
    """The seeded 60-bit ordering hash: uniform, engine-portable
    (md5-prefix fold), integer-exact."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{int(seed)}:"), id_col.cast("string"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
    )


def sql_order_hash(seed: int, id_sql: str) -> str:
    """DuckDB mirror of :func:`order_hash`."""
    return (
        f"CAST(('0x' || substr(md5('{int(seed)}:' || CAST({id_sql} AS VARCHAR)),"
        f" 1, 15))::UBIGINT AS BIGINT)"
    )


def _int_weights(ratios: dict[str, float]) -> dict[str, int]:
    w = {s: int(round(float(r) * _W_SCALE)) for s, r in ratios.items()}
    bad = sorted(s for s, v in w.items() if v <= 0)
    if bad:
        raise ValueError(f"interleave ratios must be > 0, got {bad}")
    return w


def training_order(
    df: DataFrame,
    id_col: str,
    *,
    seed: int,
    source_col: str | None = None,
    ratios: dict[str, float] | None = None,
    weight_expr: str | None = None,
    key_col: str = "order_key",
) -> DataFrame:
    """Seeded deterministic global training order.

    Without ``ratios``: appends ``key_col`` = the 60-bit seeded hash of
    ``id_col`` and returns the frame globally sorted by (key, id) —
    one range shuffle, a partition-layout-independent shuffle of the
    corpus.

    With ``ratios`` (requires ``source_col``): every source present in
    the data must appear in ``ratios``; ``key_col`` becomes the
    blending key ``(hash % 2^30) * count(source) DIV weight(source)``
    — any prefix of the sorted stream mixes sources in ``ratios``
    proportions (independent of source sizes) while within-source
    order stays the seeded hash order. Per-source counts come from one
    tiny aggregation broadcast back onto the stream; ties break by
    (hash, id), so the full sort key is deterministic across engines
    and partitionings.

    ``weight_expr`` is the open-world alternative to ``ratios``: a SQL
    expression (over the input columns) yielding the PRE-SCALED
    integer weight — e.g. a rule over the source NAME — for corpora
    whose source set is unbounded or not enumerable up front. The same
    text evaluates in the DuckDB oracle, so rule-derived blends stay
    value-exact. A NULL weight (rule doesn't match) raises inside the
    plan, same as an unknown ``ratios`` source.
    """
    if ratios is not None and weight_expr is not None:
        raise ValueError("pass ratios or weight_expr, not both")
    hk = order_hash(seed, F.col(id_col))
    if ratios is None and weight_expr is None:
        return df.withColumn(key_col, hk).orderBy(key_col, id_col)
    if source_col is None:
        raise ValueError("ratios/weight_expr given but source_col is None")
    if weight_expr is not None:
        wcol = F.expr(weight_expr).cast("long")
    else:
        w = _int_weights(ratios)
        weights = F.create_map(
            *[F.lit(x) for kv in w.items() for x in kv]  # src, weight, src, ...
        )
        wcol = weights[F.col(source_col)]
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n_src"))
    staged = (
        df.join(F.broadcast(counts), source_col)
        .withColumn("__hk", hk)
        .withColumn("__w", wcol)
    )
    # an unknown source would make __w NULL and the key NULL (silently
    # sorted first), and a zero/negative rule-derived weight would
    # divide-by-zero or invert the order; raise inside the key
    # expression instead — the CASE is codegen and free when the
    # contract holds. (A separate assert column would be pruned away
    # and never run.)
    key = F.expr(
        f"((__hk % {_H_MOD}) * CASE WHEN __n_src >= {_MAX_SOURCE_ROWS} THEN "
        f"CAST(raise_error(concat('source too large for the 30-bit blend key "
        f"(shard it first): ', CAST({source_col} AS STRING))) AS BIGINT) "
        f"ELSE __n_src END) DIV "
        f"(CASE WHEN __w IS NULL OR __w <= 0 THEN CAST(raise_error(concat("
        f"'source missing from ratios or non-positive weight: ', "
        f"CAST({source_col} AS STRING)"
        f")) AS BIGINT) ELSE __w END)"
    )
    out_cols = df.columns
    return (
        staged.withColumn(key_col, key)
        .orderBy(key_col, "__hk", id_col)
        .select(*out_cols, key_col)
    )


def training_order_oracle_sql(
    *,
    table: str,
    id_col: str,
    seed: int,
    source_col: str | None = None,
    ratios: dict[str, float] | None = None,
    weight_expr: str | None = None,
    key_col: str = "order_key",
    select_cols: str = "*",
    prelude_ctes: str = "",
) -> str:
    """DuckDB mirror of :func:`training_order` (the key VALUES — the
    driver's comparison is order-insensitive, and the key IS the
    order). ``prelude_ctes`` lets the caller define ``table`` as a CTE
    chain (``"p AS (...), packs AS (...),"`` — trailing comma);
    ``weight_expr`` must be the SAME text passed to the Spark side."""
    hk = sql_order_hash(seed, id_col)
    if ratios is None and weight_expr is None:
        if prelude_ctes:
            return (
                f"WITH {prelude_ctes.rstrip(', ')} "
                f"SELECT {select_cols}, {hk} AS {key_col} FROM {table}"
            )
        return f"SELECT {select_cols}, {hk} AS {key_col} FROM {table}"
    assert source_col is not None
    if weight_expr is not None:
        wsql = f"({weight_expr})"
    else:
        w = _int_weights(ratios)
        cases = " ".join(f"WHEN '{s}' THEN {v}" for s, v in sorted(w.items()))
        wsql = f"(CASE {source_col} {cases} END)"
    return f"""
WITH {prelude_ctes}
c AS (SELECT {source_col} AS __s, count(*) AS __n_src FROM {table} GROUP BY 1)
SELECT {select_cols},
  (({hk} % {_H_MOD}) * __n_src) // {wsql} AS {key_col}
FROM {table} JOIN c ON {source_col} = __s"""
