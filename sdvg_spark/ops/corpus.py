"""Corpus-level text operators: vocabulary building and benchmark
decontamination.

Both are standard steps of an LLM training-data pipeline that the
per-document operators in :mod:`sdvg_spark.ops.text` don't cover:

* :func:`corpus_vocab` — global token-frequency table (term frequency +
  document frequency, top-N), the input to tokenizer/vocab training.
  One explode + one aggregation; Zipf-skewed heads are absorbed by
  map-side partial aggregation (each task emits at most one partial row
  per distinct token, so the hot token shuffles ~n_tasks rows, not its
  full count).
* :func:`decontaminate` — flag documents sharing any word n-gram with a
  benchmark/eval set (the GPT-3/PaLM-style 13-gram contamination
  check; `n` is a knob). The benchmark side is tiny by construction
  (eval suites vs a 100 TB corpus), so its distinct-gram table rides a
  broadcast and the whole check is map-side against the corpus scan —
  no corpus shuffle. Only matching (doc, gram) hits are aggregated.

Everything is expression-level (tokenize → explode → join/agg): no
UDFs, whole-stage codegen end-to-end, exact DuckDB SQL mirrors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sdvg_spark.ops.text import sql_tokens, tokens


def word_ngrams(toks: Column, n: int) -> Column:
    """Distinct word ``n``-grams of a token array as space-joined
    strings; empty array when the document has fewer than ``n`` tokens
    (``sequence`` would otherwise generate a DESCENDING range and
    fabricate grams)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def sql_word_ngrams(tokens_sql: str, n: int) -> str:
    """DuckDB mirror of :func:`word_ngrams` (1-based inclusive
    ``list_slice``; ``range(a, b)`` is half-open)."""
    return (
        f"CASE WHEN len({tokens_sql}) >= {n} THEN list_distinct(list_transform("
        f"range(1, len({tokens_sql}) - {n} + 2), "
        f"i -> array_to_string(list_slice({tokens_sql}, i, i + {n - 1}), ' '))) "
        f"ELSE []::VARCHAR[] END"
    )


def corpus_vocab(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_n: int = 1000,
) -> DataFrame:
    """Top-``top_n`` tokens by corpus frequency.

    Returns (token, tf, df, rank): total occurrences, number of distinct
    documents containing the token, and the dense 1-based rank by
    (tf DESC, token ASC) — a total order, so the cut is deterministic.

    Plan shape: explode → partial-agg → one shuffle on token →
    TakeOrdered(top_n) on (tf, token) — never a global sort of the
    vocabulary. ``countDistinct`` adds the standard expand/two-phase
    distinct aggregation; at extreme scale swap it for a mergeable HLL
    sketch (``ops/skew.py``) if approximate df suffices.
    """
    toks = docs.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    vocab = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("__doc").alias("df"),
    )
    top = vocab.orderBy(F.desc("tf"), F.asc("token")).limit(top_n)
    # the window runs on <= top_n rows (post-limit) — single-partition
    # is the point, not a bottleneck
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "tf", "df", "rank"
    )


def corpus_vocab_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 1000,
) -> str:
    tk = sql_tokens(text_col)
    return f"""
WITH t AS (SELECT {id_col} AS d, unnest({tk}) AS token FROM {table}),
v AS (SELECT token, count(*) AS tf, count(DISTINCT d) AS df FROM t GROUP BY token),
r AS (SELECT token, tf, df,
        row_number() OVER (ORDER BY tf DESC, token) AS rank FROM v)
SELECT token, tf, df, rank FROM r WHERE rank <= {top_n}"""


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark contamination check: for every document, count distinct
    word ``n``-grams shared with ANY benchmark item and the number of
    benchmark items touched; ``contaminated`` = at least one shared
    gram. Returns one row per input document (clean docs carry zeros).

    Plan shape at 100 TB: the benchmark's distinct-gram table is
    orders of magnitude smaller than the corpus (eval suites are KBs to
    MBs) and rides a broadcast, so the check is a map-side hash join
    against the corpus scan — the only shuffle is the per-doc hit
    aggregation over MATCHING grams (≈0 rows for a clean corpus). Set
    ``broadcast_bench=False`` to fall back to a shuffle join when the
    benchmark set is genuinely huge.
    """
    doc_grams = docs.select(
        F.col(id_col).alias("__doc"),
        F.explode(word_ngrams(tokens(F.col(text_col)), n)).alias("gram"),
    )
    bench_grams = bench.select(
        F.col(bench_id_col).alias("__bench"),
        F.explode(word_ngrams(tokens(F.col(bench_text_col)), n)).alias("gram"),
    )
    right = F.broadcast(bench_grams) if broadcast_bench else bench_grams
    hits = (
        doc_grams.join(right, "gram")
        .where(F.col("__doc") != F.col("__bench"))
        .groupBy("__doc")
        .agg(
            F.countDistinct("gram").alias("n_hit_grams"),
            F.countDistinct("__bench").alias("n_bench_docs"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(hits.withColumnRenamed("__doc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
            F.coalesce("n_bench_docs", F.lit(0)).alias("n_bench_docs"),
            F.col("n_hit_grams").isNotNull().alias("contaminated"),
        )
    )


def decontaminate_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_filter: str = "doc_id % 97 = 0",
    n: int = 8,
) -> str:
    """DuckDB mirror of :func:`decontaminate` with the benchmark set
    drawn from the same table by ``bench_filter`` (the shape the
    ``queries()`` entry uses; a real deployment passes a separate
    benchmark table)."""
    grams = sql_word_ngrams(sql_tokens(text_col), n)
    return f"""
WITH g AS (SELECT {id_col} AS d, unnest({grams}) AS gram FROM {table}),
b AS (SELECT d AS bench, gram FROM g
      WHERE d IN (SELECT {id_col} FROM {table} WHERE {bench_filter})),
h AS (SELECT g.d, count(DISTINCT g.gram) AS n_hit_grams,
             count(DISTINCT b.bench) AS n_bench_docs
      FROM g JOIN b USING (gram) WHERE g.d <> b.bench GROUP BY g.d)
SELECT t.{id_col} AS {id_col},
  coalesce(h.n_hit_grams, 0) AS n_hit_grams,
  coalesce(h.n_bench_docs, 0) AS n_bench_docs,
  (h.d IS NOT NULL) AS contaminated
FROM {table} t LEFT JOIN h ON t.{id_col} = h.d"""
