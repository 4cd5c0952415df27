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

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sdvg_spark.ops.text import rle_postings, sql_tokens, tokens


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
    from sdvg_spark.ops.dedup import widen

    toks = widen(docs).select(
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
    from sdvg_spark.ops.dedup import widen

    # a small parquet input arrives as one partition and would run the
    # whole gram explode on one core; at real scale widen() is a no-op.
    # Tokenization is staged behind a projection boundary on both sides:
    # word_ngrams' slice-lambda defeats subexpression elimination, so an
    # inlined tokens() would retokenize the document once per gram.
    doc_grams = (
        widen(docs)
        .select(
            F.col(id_col).alias("__doc"),
            tokens(F.col(text_col)).alias("__toks"),
        )
        .select("__doc", F.explode(word_ngrams(F.col("__toks"), n)).alias("gram"))
    )
    bench_grams = bench.select(
        F.col(bench_id_col).alias("__bench"),
        tokens(F.col(bench_text_col)).alias("__toks"),
    ).select("__bench", F.explode(word_ngrams(F.col("__toks"), n)).alias("gram"))
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


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    *,
    budget: int = 2048,
    n_buckets: int = 128,
    carry: list[str] | None = None,
    id_bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid out in
    ``id_col`` order as one global token stream and cut every
    ``budget`` tokens — each doc gets the pack (training sequence) its
    first token lands in and its offset within that pack. This is the
    standard LLM dataloader packing step; the assignment is a pure
    function of the global prefix sum, so it is deterministic and
    independent of partitioning.

    ``carry``: extra columns of ``docs`` passed through to the output
    unchanged — callers that would otherwise JOIN the packing back onto
    per-doc columns (curate's fingerprint/split) ride them through the
    one range shuffle instead (a few bytes per row vs. a full extra
    equi-join of the doc set).

    Distributed prefix-sum shape (NO single-partition global window —
    the naive ``Window.orderBy(id)`` cumsum serializes the corpus
    through one task at 100 TB):

    1. contiguous id-range buckets (width from one column-pruned
       min/max aggregate — the only driver action);
    2. per-bucket token sums -> a tiny (``n_buckets``-row) window
       cumsum for exclusive bucket offsets — single-partition BY
       DESIGN, on n_buckets rows, not the corpus;
    3. broadcast-join the offsets back and run the cumsum window
       PARTITIONED by bucket — full parallelism across buckets, one
       range shuffle of (id, n) pairs total.

    Returns (id, n_tokens, pack_id, pack_offset). Docs longer than the
    remaining pack space straddle the cut, exactly like the dataloader
    they feed. Empty docs (0 tokens) sit at their boundary offset.
    """
    carry = carry or []
    d = docs.select(
        F.col(id_col).alias("__id"), F.col(n_tokens_col).alias("__n"), *carry
    )
    if id_bounds is not None:
        # caller-supplied COVERING id bounds (e.g. parquet footer
        # min/max stats — no Spark job). The bucketing is internal:
        # any covering bounds yield the identical global prefix sum,
        # only the bucket balance changes, so a superset (e.g. the
        # parent table's bounds for a filtered subset) is fine.
        lo, hi = int(id_bounds[0]), int(id_bounds[1])
    else:
        bounds = d.select(
            F.min("__id").alias("lo"), F.max("__id").alias("hi")
        ).first()
        if bounds["lo"] is None:
            spark = docs.sparkSession
            carry_schema = "".join(
                f", {c} {docs.schema[c].dataType.simpleString()}" for c in carry
            )
            return spark.createDataFrame(
                [],
                f"{id_col} long, n_tokens long, pack_id long, pack_offset long"
                + carry_schema,
            )
        lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, (hi - lo) // n_buckets + 1)
    # integer DIV, not `/`+cast: `/` is double division, which silently
    # loses exactness past 2^53 — real 64-bit doc ids (and the global
    # token cumsum at 100 TB) can exceed that
    b = d.withColumn(
        "__b", F.expr(f"(__id - {lo}L) DIV {width}L")
    )
    sums = b.groupBy("__b").agg(F.sum("__n").alias("__bsum"))
    # exclusive prefix over the bucket sums: n_buckets rows, so the
    # unpartitioned window is intentionally tiny
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        "__b", F.coalesce(F.sum("__bsum").over(wb), F.lit(0)).alias("__off")
    )
    w = (
        Window.partitionBy("__b")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        b.join(F.broadcast(offsets), "__b")
        .withColumn(
            "__start", F.col("__off") + F.coalesce(F.sum("__n").over(w), F.lit(0))
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__n").cast("long").alias("n_tokens"),
            F.expr(f"__start DIV {int(budget)}L").alias("pack_id"),
            F.pmod(F.col("__start"), F.lit(int(budget))).cast("long").alias("pack_offset"),
            *carry,
        )
    )
    return packed


def pack_sequences_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    n_tokens_sql: str | None = None,
    budget: int = 2048,
) -> str:
    """DuckDB mirror: the global-window cumsum IS the semantics; the
    Spark side merely computes the same prefix sum distributively.

    The windowed ``sum(BIGINT)`` is HUGEINT in DuckDB — it converts to
    float64 under pandas/Arrow fetch, which breaks a value-hash against
    Spark's int64 even when every value is identical. Cast the cumsum
    and everything derived from it back to BIGINT so the oracle's
    output types match the Spark schema under ANY fetch path."""
    n = n_tokens_sql or "len(" + sql_tokens("text") + ")"
    return f"""
WITH d AS (SELECT {id_col} AS id, {n}::BIGINT AS n FROM {table}),
c AS (SELECT id, n,
        coalesce(sum(n) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0)::BIGINT AS start FROM d)
SELECT id AS {id_col}, n AS n_tokens,
  (start // {budget})::BIGINT AS pack_id,
  (start % {budget})::BIGINT AS pack_offset
FROM c"""


def pack_sequences_nostraddle(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    *,
    budget: int = 2048,
    n_shards: int = 64,
) -> DataFrame:
    """First-fit (no-straddle) sequence packing: documents never cross
    a pack boundary — a doc that would push the pack past ``budget``
    opens a new pack instead. This is the other standard dataloader
    convention next to :func:`pack_sequences`' concat-then-chunk
    (reference parity: the reference has no packer; this is part of
    the beyond-parity training-data surface).

    Packing is greedy within contiguous id-range SHARDS (pack ids are
    per-shard), exactly how real dataloaders pack per worker/shard —
    a single global greedy would serialize the corpus through one
    task. Rule, applied in ``id_col`` order within a shard: keep a
    running ``fill``; if ``fill + n > budget`` the doc starts a new
    pack (so an oversized doc occupies a pack alone), else it lands at
    offset ``fill``. Zero-length docs attach to the current pack.

    Implementation: one range shuffle of (id, n) pairs into shards,
    then a per-shard Arrow-batched kernel that jumps pack boundaries
    with ``searchsorted`` over the shard cumsum — O(packs · log docs)
    per shard, not a per-doc Python loop. Shard metadata is 16 B/doc;
    at 25 B docs (100 TB corpus) and 4096 shards that is ~100 MB per
    task — size ``n_shards`` accordingly.

    Returns (id, n_tokens, shard, pack_id, pack_offset); ``pack_id``
    is local to ``shard``.
    """
    import numpy as np
    import pandas as pd

    d = docs.select(
        F.col(id_col).alias("__id"), F.col(n_tokens_col).cast("long").alias("__n")
    )
    bounds = d.select(F.min("__id").alias("lo"), F.max("__id").alias("hi")).first()
    spark = docs.sparkSession
    out_schema = (
        f"{id_col} long, n_tokens long, shard long, pack_id long, pack_offset long"
    )
    if bounds["lo"] is None:
        return spark.createDataFrame([], out_schema)
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, (hi - lo) // n_shards + 1)
    b = d.withColumn("__shard", F.expr(f"(__id - {lo}L) DIV {width}L"))
    budget_ = int(budget)

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id")
        n = pdf["__n"].to_numpy(dtype=np.int64)
        c = np.cumsum(n)
        packs = np.empty(len(n), dtype=np.int64)
        offs = np.empty(len(n), dtype=np.int64)
        start, base, pack = 0, 0, 0
        while start < len(n):
            end = int(np.searchsorted(c, base + budget_, side="right"))
            if end <= start:  # oversized doc: a pack of its own
                end = start + 1
            packs[start:end] = pack
            offs[start:end] = (c[start:end] - n[start:end]) - base
            base = int(c[end - 1])
            pack += 1
            start = end
        return pd.DataFrame(
            {
                id_col: pdf["__id"].to_numpy(),
                "n_tokens": n,
                "shard": pdf["__shard"].to_numpy(),
                "pack_id": packs,
                "pack_offset": offs,
            }
        )

    return b.groupBy("__shard").applyInPandas(pack_shard, out_schema)


def pack_sequences_nostraddle_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    n_tokens_sql: str | None = None,
    budget: int = 2048,
    n_shards: int = 64,
) -> str:
    """DuckDB mirror of :func:`pack_sequences_nostraddle`: a per-doc
    recursive CTE replays the greedy fill within each shard (recursion
    depth = max docs per shard — an oracle-scale construct, the Spark
    side is the scalable one). The shard rule recomputes the same
    contiguous-range bucketing from the data's own min/max."""
    n = n_tokens_sql or "len(" + sql_tokens("text") + ")"
    return f"""
WITH RECURSIVE base AS (
  SELECT {id_col} AS id, {n}::BIGINT AS n FROM {table}
), lim AS (
  SELECT min(id) AS lo,
         greatest(1, (max(id) - min(id)) // {n_shards} + 1) AS w FROM base
), d AS (
  SELECT (id - lo) // w AS shard, id, n,
         row_number() OVER (PARTITION BY (id - lo) // w ORDER BY id) AS rn
  FROM base, lim
), s AS (
  SELECT shard, rn, id, n,
         0::BIGINT AS pack, 0::BIGINT AS off, n::BIGINT AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.id, d.n,
         CASE WHEN s.fill + d.n > {budget} THEN s.pack + 1 ELSE s.pack END,
         CASE WHEN s.fill + d.n > {budget} THEN 0 ELSE s.fill END,
         CASE WHEN s.fill + d.n > {budget} THEN d.n ELSE s.fill + d.n END
  FROM s JOIN d ON d.shard = s.shard AND d.rn = s.rn + 1
)
SELECT id AS {id_col}, n AS n_tokens, shard::BIGINT AS shard,
       pack AS pack_id, off AS pack_offset
FROM s"""


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int,
    stride: int,
) -> DataFrame:
    """Split every document into fixed-size token windows with overlap —
    the chunking step in front of an embedding pipeline (RAG indexing,
    similarity search over long docs).

    Chunk k covers tokens ``[k·stride, k·stride + chunk_tokens)``;
    chunks are emitted while their START lies inside the document, so
    the final chunk may be short but no empty chunks appear, and a doc
    shorter than one window still yields exactly one chunk. Empty
    documents yield none.

    Output: ``(id, chunk_seq, n_chunk_tokens, chunk_text)``.

    Scale shape: pure expression work — tokenize once, one
    ``sequence``/``explode`` per doc (amplification = 1/stride tokens
    per output row), ``slice`` + ``array_join`` per chunk. Map-only: no
    shuffle at any corpus size; chunk ids stay stable under
    repartitioning because they derive from (id, k), not row order.
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    toks = tokens(F.col(text_col))
    staged = df.select(F.col(id_col), toks.alias("__toks")).where(
        F.size(F.col("__toks")) > 0
    )
    # number of chunks: 1 + floor((n - 1) / stride) — starts at 0, s, 2s…
    # while start < n
    n = F.size(F.col("__toks"))
    n_chunks = F.lit(1) + F.floor((n - F.lit(1)) / F.lit(stride)).cast("int")
    out = staged.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_seq"),
        F.col("__toks"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_seq") * stride + 1, chunk_tokens)
    return out.select(
        F.col(id_col),
        F.col("chunk_seq"),
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_documents_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int,
    stride: int,
) -> str:
    """DuckDB mirror of :func:`chunk_documents`: same tokenization, same
    chunk count arithmetic (integer, exact), 1-based inclusive
    ``list_slice`` windows."""
    l = sql_tokens(text_col)
    return f"""
WITH t AS (
  SELECT {id_col}, {l} AS toks FROM {table} WHERE len({l}) > 0),
c AS (
  SELECT {id_col}, toks,
    unnest(range(0, 1 + (len(toks) - 1) // {stride})) AS chunk_seq
  FROM t)
SELECT {id_col}, chunk_seq,
  len(list_slice(toks, chunk_seq * {stride} + 1, chunk_seq * {stride} + {chunk_tokens})) AS n_chunk_tokens,
  array_to_string(list_slice(toks, chunk_seq * {stride} + 1, chunk_seq * {stride} + {chunk_tokens}), ' ') AS chunk_text
FROM c"""


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    span_tokens: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated token spans — one row per OCCURRENCE of
    a ``span_tokens``-token window whose exact text appears in at least
    ``min_docs`` distinct documents: (id, span_start [1-based token
    index], span_fp, n_docs).

    This is the bounded, equi-join-costed cousin of suffix-array
    substring dedup (the "dedup training data at the substring level"
    step): fixed-width windows catch every repeated run of
    ≥ span_tokens tokens (a longer shared substring simply yields a run
    of flagged windows), and the follow-up policy — trim the span, drop
    the doc, or weight it down — stays with the caller.

    Plan shape: positional explode of per-doc windows (corpus ×
    ~n_tokens rows, but ids + 60-bit md5-fold fingerprints only — the
    gram TEXT never shuffles), one groupBy(fp) census keeping only
    fingerprints seen in ≥ min_docs docs (tiny by construction), then
    an inner join back. The census side carries a ``shuffle_hash``
    hint: a sort-merge join would SORT the occurrence table — the
    corpus × n_tokens side — by fingerprint; hashing the census (the
    provably-smaller side: distinct flagged fingerprints ≤
    occurrences) costs one in-memory map per partition instead. (The
    r9 sf100 probe showed the join sort was NOT the query's 12.3 GB
    spill — that is the census countDistinct's partial maps, see the
    in-body comment — but SMJ would add a sort on top of it.) Skewed
    boilerplate fingerprints split under AQE skew-join like any hot
    equi-key.
    """
    from sdvg_spark.ops.text import tokens

    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    # stage tokenization behind a projection boundary: `toks` is
    # referenced once per WINDOW below, and higher-order lambdas defeat
    # subexpression elimination — inlining retokenizes the document per
    # window (measured 6.4x slower at sf0.1, the q_text_features lesson)
    from sdvg_spark.ops.dedup import widen

    # widen(): tokenize + per-window md5 is the heavy map stage; a
    # single-row-group input would run it on one core (no-op at scale)
    staged = widen(docs).select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    grams = F.when(
        n >= span_tokens,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(span_tokens - 1)),
            lambda i: F.array_join(F.slice(toks, i, span_tokens), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # fingerprints are computed AFTER the positional explode, where the
    # md5/conv/substring chain runs inside WholeStageCodegen. The
    # in-row alternative — transform(grams, g -> md5-fold(g)) with a
    # per-doc array_distinct census — was measured and REJECTED:
    # higher-order functions are CodegenFallback, so wrapping the
    # fingerprint chain in a lambda evaluates it interpreted per
    # window (same-session sf0.1 A/B: 1.56 s -> 4.8 s, 3x) to buy only
    # 18% of the sf100 census spill (12.3 -> 10.1 GB). The remaining
    # spill is the countDistinct partial map over a near-raw
    # fingerprint space — the r8-adjudicated graceful class (an exact
    # ≥min_docs census must move each distinct fingerprint once; one
    # 16 GiB probe JVM holds ~100 executors' key share).
    occ = staged.select(
        F.col(id_col), F.posexplode(grams).alias("__p", "__g")
    ).select(
        F.col(id_col),
        (F.col("__p") + F.lit(1)).cast("long").alias("span_start"),
        F.conv(F.substring(F.md5(F.col("__g")), 1, 15), 16, 10)
        .cast("long")
        .alias("span_fp"),
    )
    # ONE shared exchange: repartition the occurrence table by
    # fingerprint and let both the census aggregate and the join read
    # it. The census's required distribution is satisfied, the join's
    # streamed side is satisfied, and the two branches canonicalize to
    # the same exchange subtree, so ReuseExchange runs the
    # tokenize+window+md5 scan ONCE (it previously ran twice — the two
    # branches' exchanges differed because the census's partial
    # distinct carried different columns). Dropping the map-side
    # partial distinct also removes the census's partial-map memory —
    # the r8-adjudicated sf100 spill lived exactly there — while
    # shuffle bytes stay ~occurrence-sized (the fingerprint space is
    # near-raw, so partial dedup bought almost nothing).
    occ = occ.repartition("span_fp")
    census = (
        occ.groupBy("span_fp")
        # `+ 0 * min(span_start)` adds exactly 0 (span_start ≥ 1, never
        # null) — it exists so the census branch consumes the SAME
        # columns as the join branch: otherwise column pruning rewrites
        # its exchange to a narrower projection, the two subtrees no
        # longer canonicalize equal, and ReuseExchange cannot fire
        # (verified in-plan: two full Scan+tokenize+md5 chains). The
        # optimizer cannot fold `0 * min(...)` away (null semantics),
        # which is the point.
        .agg(
            (
                F.countDistinct(id_col) + F.lit(0) * F.min("span_start")
            ).alias("n_docs")
        )
        .where(F.col("n_docs") >= F.lit(int(min_docs)))
    )
    return occ.join(census.hint("shuffle_hash"), "span_fp").select(
        id_col, "span_start", "span_fp", "n_docs"
    )


def duplicate_spans_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
    min_docs: int = 2,
) -> str:
    """DuckDB mirror of :func:`duplicate_spans` — same tokenization,
    same positional windows, same md5-prefix 60-bit fingerprint, same
    distinct-doc census."""
    toks = sql_tokens(text_col)
    return f"""
WITH d AS (SELECT {id_col} AS id, {toks} AS toks FROM {table}),
w AS (
  SELECT id, p AS span_start,
    CAST(('0x' || substr(md5(array_to_string(list_slice(toks, p, p + {span_tokens - 1}), ' ')), 1, 15))::UBIGINT AS BIGINT) AS span_fp
  FROM d, unnest(CASE WHEN len(toks) >= {span_tokens}
                 THEN range(1, len(toks) - {span_tokens - 1} + 1)
                 ELSE []::BIGINT[] END) AS u(p)),
c AS (SELECT span_fp, count(DISTINCT id) AS n_docs FROM w GROUP BY span_fp
      HAVING count(DISTINCT id) >= {int(min_docs)})
SELECT w.id AS {id_col}, w.span_start, w.span_fp, c.n_docs
FROM w JOIN c USING (span_fp)"""


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    span_tokens: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """The REWRITE step of substring-level dedup: every flagged window
    from :func:`duplicate_spans` keeps its CANONICAL occurrence (the
    lexicographically-first (doc, start)) and is masked out of every
    other document carrying it. Returns one row per input document:
    (id, trimmed_text, n_tokens, n_masked) — ``trimmed_text`` is the
    surviving tokens of the NORMALIZED stream (lowercased,
    whitespace-split, single-space rejoined; span masking is defined on
    tokens, so the rewrite operates on the same stream the detector
    hashed), ``n_masked`` how many token positions were removed.

    Plan shape: the detector's occurrence table (ids + fingerprints)
    ranks canonicals with one window, non-canonical occurrences fold to
    ONE masked-position list per document (positions are
    doc-length-bounded), and the rewrite itself happens IN-ROW —
    ``array_except`` of the position sequence, ``element_at`` to
    re-materialize the surviving tokens. The corpus token stream never
    shuffles: the only corpus-sized exchanges are the detector's own.
    (The previous form positionally anti-joined an exploded corpus
    token table and re-grouped it with collect_list — at the sf100
    probe those two corpus-token exchanges and the list buffers were
    23 GB of shuffle and 17.7 GB of spill, all of which this shape
    deletes.) No all-pairs term anywhere; a boilerplate span shared
    by millions of docs is one fingerprint group in the canonical
    window (AQE-skew-splittable) and its masks stay per-doc-bounded.
    """
    from sdvg_spark.ops.text import tokens

    occ = duplicate_spans(
        docs, id_col, text_col, span_tokens=span_tokens, min_docs=min_docs
    )
    w = Window.partitionBy("span_fp").orderBy(F.col(id_col), F.col("span_start"))
    masks = (
        occ.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)  # canonical occurrence survives
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.col("span_start"),
                    F.col("span_start") + F.lit(span_tokens - 1),
                )
            ).alias("__mp"),
        )
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("__mp")).alias("__mask"))
    )
    staged = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).join(masks.hint("shuffle_hash"), id_col, "left")
    t = F.col("__toks")
    kept_pos = F.array_except(
        F.sequence(F.lit(1), F.size(t)),
        F.coalesce(F.col("__mask"), F.array().cast("array<long>")),
    )
    staged2 = staged.select(
        F.col(id_col),
        "__toks",
        F.when(F.size(t) > 0, kept_pos)
        .otherwise(F.array().cast("array<long>"))
        .alias("__kept"),
    )
    k = F.col("__kept")
    return staged2.select(
        F.col(id_col),
        F.array_join(
            # positions coerced to bigint by the array_except against
            # the long mask; element_at wants int
            F.transform(k, lambda p: F.element_at(t, p.cast("int"))), " "
        ).alias("trimmed_text"),
        F.size(t).cast("long").alias("n_tokens"),
        (F.size(t) - F.size(k)).cast("long").alias("n_masked"),
    )


def remove_duplicate_spans_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
    min_docs: int = 2,
) -> str:
    """DuckDB mirror of :func:`remove_duplicate_spans` — same detector,
    same canonical rule, same positional masking and rejoin."""
    toks = sql_tokens(text_col)
    return f"""
WITH d AS (SELECT {id_col} AS id, {toks} AS toks FROM {table}),
w AS (
  SELECT id, p AS span_start,
    CAST(('0x' || substr(md5(array_to_string(list_slice(toks, p, p + {span_tokens - 1}), ' ')), 1, 15))::UBIGINT AS BIGINT) AS span_fp
  FROM d, unnest(CASE WHEN len(toks) >= {span_tokens}
                 THEN range(1, len(toks) - {span_tokens - 1} + 1)
                 ELSE []::BIGINT[] END) AS u(p)),
c AS (SELECT span_fp FROM w GROUP BY span_fp
      HAVING count(DISTINCT id) >= {int(min_docs)}),
occ AS (
  SELECT w.id, w.span_start, w.span_fp,
    row_number() OVER (PARTITION BY w.span_fp ORDER BY w.id, w.span_start) AS rn
  FROM w JOIN c USING (span_fp)),
mask AS (
  SELECT DISTINCT id, unnest(range(span_start, span_start + {span_tokens})) AS mp
  FROM occ WHERE rn > 1),
tk AS (SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p FROM d),
kept AS (
  SELECT tk.id, tk.tok, tk.p FROM tk
  WHERE NOT EXISTS (SELECT 1 FROM mask m WHERE m.id = tk.id AND m.mp = tk.p)),
reb AS (
  SELECT id, string_agg(tok, ' ' ORDER BY p) AS trimmed_text,
         count(*) AS n_kept
  FROM kept GROUP BY id)
SELECT d.id AS {id_col},
  coalesce(r.trimmed_text, '') AS trimmed_text,
  len(d.toks)::BIGINT AS n_tokens,
  (len(d.toks) - coalesce(r.n_kept, 0))::BIGINT AS n_masked
FROM d LEFT JOIN reb r ON r.id = d.id"""


def unigram_nll(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_n: int = 1000,
    alpha: float = 0.5,
    round_digits: int = 9,
) -> DataFrame:
    """CCNet-style language-model quality signal: per-document mean
    negative log-likelihood (and perplexity) under a Lidstone-smoothed
    top-``top_n`` unigram model fit on the corpus itself. Low-ppl docs
    read like the corpus's bulk; high-ppl docs are noise/boilerplate —
    the classic LM-filter axis next to the heuristic quality score.

    Model: p(tok) = (tf + α)/(N + α·(V+1)) for the ``top_n``
    most-frequent tokens (ties broken by token, same cut as
    :func:`corpus_vocab`); every other token shares the OOV mass
    α/(N + α·(V+1)). N = total corpus tokens, V = distinct corpus
    tokens — one column-pruned aggregate at plan-build time (the same
    count-as-literal pattern as tfidf's N; a 1-row crossJoin would plan
    a BroadcastNestedLoopJoin).

    Determinism: each doc's Σ ln p folds in TOKEN ORDER (positional
    sort before the fold — a plain grouped SUM would accumulate in
    partition order and make the last float bits partition-dependent);
    the oracle folds the same way, and outputs are round-``round_digits``
    like the other float features.

    Returns (id, n_tokens, n_oov, nll, ppl); empty docs carry nll 0.

    Plan shape: token explode → broadcast join against the top-N vocab
    (vocab is top_n rows by construction) → one groupBy(doc) with an
    ordered fold. One corpus-token shuffle — the same class as
    tfidf/vocab; no all-pairs, no driver data beyond the N/V scalars.
    """
    from sdvg_spark.ops.text import tokens

    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    toks = tokens(F.col(text_col))
    tok_rows = docs.select(
        F.col(id_col), F.posexplode(toks).alias("__p", "__tok")
    )
    stats = tok_rows.select(
        F.count(F.lit(1)).alias("n"), F.countDistinct("__tok").alias("v")
    ).first()
    n_total, v_total = int(stats["n"] or 0), int(stats["v"] or 0)
    denom = float(n_total) + alpha * (v_total + 1)
    vocab = (
        tok_rows.groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .orderBy(F.desc("__tf"), F.asc("__tok"))
        .limit(top_n)
        .select(
            "__tok",
            F.log((F.col("__tf") + F.lit(float(alpha))) / F.lit(denom)).alias("__lnp"),
        )
    )
    ln_oov = F.log(F.lit(float(alpha)) / F.lit(denom))
    scored = (
        tok_rows.join(F.broadcast(vocab), "__tok", "left")
        .select(
            id_col,
            "__p",
            F.coalesce(F.col("__lnp"), ln_oov).alias("__lnp"),
            F.col("__lnp").isNull().cast("long").alias("__oov"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__oov").alias("n_oov"),
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("__p", "__lnp"))),
                    lambda s: s["__lnp"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__sum_lnp"),
        )
        .select(
            id_col,
            F.col("__n").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            F.round(-F.col("__sum_lnp") / F.col("__n"), round_digits).alias("nll"),
            F.round(F.exp(-F.col("__sum_lnp") / F.col("__n")), round_digits).alias("ppl"),
        )
    )
    base = docs.select(F.col(id_col))
    return base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.coalesce("nll", F.lit(0.0)).alias("nll"),
        F.coalesce("ppl", F.lit(1.0)).alias("ppl"),
    )


def unigram_nll_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 1000,
    alpha: float = 0.5,
    round_digits: int = 9,
) -> str:
    """DuckDB mirror of :func:`unigram_nll` — same vocab cut, same
    smoothing arithmetic on the same doubles, same token-order fold."""
    toks = sql_tokens(text_col)
    a = repr(float(alpha))
    return f"""
WITH d AS (SELECT {id_col} AS id, {toks} AS toks FROM {table}),
tk AS (SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p FROM d),
st AS (SELECT count(*) AS n, count(DISTINCT tok) AS v FROM tk),
vocab AS (
  SELECT tok, ln((count(*) + {a}) / (st.n + {a} * (st.v + 1))) AS lnp
  FROM tk, st GROUP BY tok, st.n, st.v
  ORDER BY count(*) DESC, tok LIMIT {int(top_n)}),
sc AS (
  SELECT tk.id, tk.p,
    coalesce(v.lnp, (SELECT ln({a} / (n + {a} * (v + 1))) FROM st)) AS lnp,
    (v.tok IS NULL)::INT AS oov
  FROM tk LEFT JOIN vocab v USING (tok)),
agg AS (
  SELECT id, count(*) AS n_tokens, sum(oov) AS n_oov,
    list_sum(list_transform(list_sort(list({{'p': p, 'l': lnp}})), r -> r.l)) AS slnp
  FROM sc GROUP BY id)
SELECT d.id AS {id_col},
  coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
  coalesce(a.n_oov, 0)::BIGINT AS n_oov,
  coalesce(round(-a.slnp / a.n_tokens, {round_digits}), 0.0) AS nll,
  coalesce(round(exp(-a.slnp / a.n_tokens), {round_digits}), 1.0) AS ppl
FROM d LEFT JOIN agg a ON a.id = d.id"""


def bigram_nll(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_n: int = 2000,
    ctx_top_n: int = 2000,
    alpha: float = 0.5,
    round_digits: int = 9,
) -> DataFrame:
    """KenLM-class transition quality signal: per-document mean
    negative log-likelihood (and perplexity) of its TOKEN TRANSITIONS
    under an add-α bigram model fit on the corpus itself — the
    next-order LM-filter axis after :func:`unigram_nll` (CCNet scores
    with a 5-gram KenLM; the bigram is the smallest model that sees
    word ORDER, so shuffled/boilerplate text scores high here while
    passing a unigram filter).

    Model, for transition (w, x): p(x|w) = (c(w,x) + α) / (ĉ(w) +
    α·(V+1)) where c(w,x) comes from the top-``top_n`` bigram table
    (count desc, gram asc — the corpus_vocab cut), ĉ(w) =
    max(context count from the top-``ctx_top_n`` context table else 0,
    c(w,x)) — the max keeps p < 1 when a retained bigram's context
    fell outside the context cut (true ĉ(w) ≥ c(w,x) always, so this
    is the tighter valid bound and equals the true count whenever the
    context is in-table — and both engines compute the identical
    expression) — and V = distinct transition contexts in the corpus.
    Transitions outside the bigram cut share the OOV mass
    α/(ĉ(w) + α·(V+1)) with ĉ from the context table alone (0 if
    absent). Docs with < 2 tokens have no transitions: nll 0, ppl 1.

    Determinism: both cuts are (count desc, key asc); each doc's
    Σ ln p folds in TRANSITION ORDER with the exact sequential
    left-to-right addition sequence; ln p doubles are evaluated ONCE
    by Spark JVM expressions and carried into the kernel (the
    :func:`_nll_inrow_scored` contract); outputs round to
    ``round_digits``.

    Plan shape — born on the scale tier (the shape the r10 unigram
    spill fix converged to, adopted here from day one): TWO
    corpus-transition aggregates build the bigram/context tables
    (token-keyed shuffles, the tfidf/vocab class), their ≤ top_n ln p
    rows collect into broadcast dicts, and the scored stage is a
    MAP-ONLY Arrow fold over each doc's own token list — no
    posexplode, no doc-keyed exchange, no window sort, nothing to
    spill at any corpus size. Reference for the operator class:
    CCNet (Wenzek et al. 2020) LM perplexity filtering.
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if top_n < 1 or ctx_top_n < 1:
        raise ValueError("top_n and ctx_top_n must be >= 1")
    spark = docs.sparkSession
    toks = _safe_tokens(text_col)
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from pyspark import StorageLevel

    from sdvg_spark.ops.dedup import widen

    # ONE pass over the transition stream: the full (bigram, count)
    # table is aggregated once and persisted (the tokfreq pattern —
    # collapsed, vocab²-bounded, evictable); the context counts are
    # DERIVED from it (ctx count ≡ Σ bigram counts sharing the context
    # — exact integer identity), and V is the derived table's row
    # count. The previous shape re-ran the corpus gram explode four
    # times (V countDistinct, ctx aggregate, bigram aggregate, and the
    # ctx aggregate again inside the OOV collect).
    tr = widen(docs, min_bytes=4 << 20).select(F.explode(grams).alias("__g"))
    bigfull = (
        tr.groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__cb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ctx_full = (
        bigfull.select(
            F.split_part(F.col("__g"), F.lit(" "), F.lit(1)).alias("__ctx"), "__cb"
        )
        .groupBy("__ctx")
        .agg(F.sum("__cb").alias("__cc"))
    )
    v_total = int(ctx_full.count())  # materializes bigfull; V = distinct contexts
    denom_pad = F.lit(float(alpha)) * F.lit(float(v_total + 1))
    a = F.lit(float(alpha))
    ctxc = ctx_full.orderBy(F.desc("__cc"), F.asc("__ctx")).limit(ctx_top_n)
    big = (
        bigfull.orderBy(F.desc("__cb"), F.asc("__g"))
        .limit(top_n)
        .withColumn("__ctx", F.split_part(F.col("__g"), F.lit(" "), F.lit(1)))
        .join(F.broadcast(ctxc), "__ctx", "left")
        .select(
            "__g",
            F.log(
                (F.col("__cb") + a)
                / (
                    F.greatest(F.coalesce(F.col("__cc"), F.lit(0)), F.col("__cb"))
                    + denom_pad
                )
            ).alias("__lnp"),
        )
    )
    ctx_oov = ctxc.select(
        "__ctx", F.log(a / (F.col("__cc") + denom_pad)).alias("__lnp")
    )
    # ONE collect for the bigram table, the context-OOV table AND the
    # global OOV constant (union with a side tag; the constant rides as
    # a Catalyst-constant-folded literal — the same JVM Math.log double
    # the dedicated range(1) job produced): 3 driver actions → 1, and
    # the two table subtrees evaluate concurrently off the shared
    # bigfull cache.
    side_pdf = (
        big.select(F.lit(0).alias("__side"), F.col("__g").alias("__k"), "__lnp")
        .unionByName(
            ctx_oov.select(
                F.lit(1).alias("__side"), F.col("__ctx").alias("__k"), "__lnp"
            )
        )
        .unionByName(
            spark.range(1).select(
                F.lit(2).alias("__side"),
                F.lit("").alias("__k"),
                F.log(a / denom_pad).alias("__lnp"),
            )
        )
        .toPandas()
    )
    sides = side_pdf["__side"].to_numpy()
    big_pdf = side_pdf[sides == 0]
    ctx_pdf = side_pdf[sides == 1]
    ln_oov_g = float(side_pdf[sides == 2]["__lnp"].iloc[0])
    bigd = dict(zip(big_pdf["__k"].tolist(), big_pdf["__lnp"].tolist()))
    ctxd = dict(zip(ctx_pdf["__k"].tolist(), ctx_pdf["__lnp"].tolist()))
    # everything downstream reads the collected dicts, never bigfull —
    # release the cache so long-lived sessions don't accumulate blocks
    bigfull.unpersist()
    # broadcast lifetime: same note as _nll_inrow_scored's tok2lnp
    bc = spark.sparkContext.broadcast((bigd, ctxd))

    staged = widen(docs, min_bytes=4 << 20).select(F.col(id_col), toks.alias("__toks"))
    out_schema = StructType(
        [
            StructField(id_col, staged.schema[id_col].dataType, True),
            StructField("n_trans", LongType(), False),
            StructField("n_oov", LongType(), False),
            StructField("__sum_lnp", DoubleType(), False),
        ]
    )

    def fold_batches(batches):
        bd, cd = bc.value
        for b in batches:
            la = b.column(1)
            counts = la.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
            flat = la.flatten()
            de = flat.dictionary_encode()
            dict_toks = de.dictionary.to_pylist()
            total = len(de)
            tcounts = np.maximum(counts - 1, 0)
            ends = np.cumsum(counts)
            if total and len(dict_toks):
                idx = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                # transition start positions: every flat index except
                # each nonempty doc's LAST element
                mask = np.ones(total, dtype=bool)
                mask[ends[counts > 0] - 1] = False
                tpos = np.flatnonzero(mask)
                d_card = np.int64(len(dict_toks))
                pk = idx[tpos] * d_card + idx[tpos + 1]
                upairs, inv = np.unique(pk, return_inverse=True)
                u_lnp = np.empty(len(upairs), dtype=np.float64)
                u_oov = np.empty(len(upairs), dtype=np.int64)
                for j, key in enumerate(upairs):
                    t1 = dict_toks[int(key // d_card)]
                    g = t1 + " " + dict_toks[int(key % d_card)]
                    lp = bd.get(g)
                    if lp is None:
                        u_oov[j] = 1
                        u_lnp[j] = cd.get(t1, ln_oov_g)
                    else:
                        u_oov[j] = 0
                        u_lnp[j] = lp
                flat_lnp = u_lnp[inv]
                flat_oov = u_oov[inv]
            else:
                flat_lnp = np.zeros(0, dtype=np.float64)
                flat_oov = np.zeros(0, dtype=np.int64)
            tends = np.cumsum(tcounts)
            tstarts = tends - tcounts
            oov_cum = np.concatenate([[0], np.cumsum(flat_oov)])
            n_oov = oov_cum[tends] - oov_cum[tstarts]
            sums = _sequential_segment_sums(flat_lnp, tstarts, tcounts)
            yield pa.record_batch(
                [
                    b.column(0),
                    pa.array(tcounts, type=pa.int64()),
                    pa.array(n_oov, type=pa.int64()),
                    pa.array(sums, type=pa.float64()),
                ],
                names=[id_col, "n_trans", "n_oov", "__sum_lnp"],
            )

    folded = staged.mapInArrow(fold_batches, out_schema)
    return folded.select(
        id_col,
        F.col("n_trans").cast("long").alias("n_trans"),
        F.col("n_oov").cast("long").alias("n_oov"),
        F.when(
            F.col("n_trans") > 0,
            F.round(-F.col("__sum_lnp") / F.col("n_trans"), round_digits),
        )
        .otherwise(F.lit(0.0))
        .alias("nll"),
        F.when(
            F.col("n_trans") > 0,
            F.round(F.exp(-F.col("__sum_lnp") / F.col("n_trans")), round_digits),
        )
        .otherwise(F.lit(1.0))
        .alias("ppl"),
    )


def bigram_nll_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2000,
    ctx_top_n: int = 2000,
    alpha: float = 0.5,
    round_digits: int = 9,
) -> str:
    """DuckDB mirror of :func:`bigram_nll` — same cuts, same ĉ(w)
    max-bound, same smoothing arithmetic, same transition-order fold."""
    toks = sql_tokens(text_col)
    a = repr(float(alpha))
    return f"""
WITH d AS (SELECT {id_col} AS id, {toks} AS toks FROM {table}),
tr AS (
  SELECT id, p, toks[p] AS ctx, toks[p] || ' ' || toks[p + 1] AS g
  FROM d, unnest(range(1, len(toks))) AS u(p)),
st AS (SELECT count(DISTINCT ctx) AS v FROM tr),
ctxc AS (
  SELECT ctx, count(*) AS cc FROM tr GROUP BY ctx
  ORDER BY count(*) DESC, ctx LIMIT {int(ctx_top_n)}),
big AS (
  SELECT g, count(*) AS cb FROM tr GROUP BY g
  ORDER BY count(*) DESC, g LIMIT {int(top_n)}),
bigl AS (
  SELECT b.g,
    ln((b.cb + {a}) / (greatest(coalesce(c.cc, 0), b.cb) + {a} * (st.v + 1))) AS lnp
  FROM big b LEFT JOIN ctxc c ON c.ctx = split_part(b.g, ' ', 1), st),
sc AS (
  SELECT tr.id, tr.p,
    coalesce(b.lnp,
      ln({a} / (coalesce(c.cc, 0) + {a} * (SELECT v + 1 FROM st)))) AS lnp,
    (b.g IS NULL)::INT AS oov
  FROM tr LEFT JOIN bigl b USING (g) LEFT JOIN ctxc c USING (ctx)),
agg AS (
  SELECT id, count(*) AS n_trans, sum(oov) AS n_oov,
    list_sum(list_transform(list_sort(list({{'p': p, 'l': lnp}})), r -> r.l)) AS s
  FROM sc GROUP BY id)
SELECT d.id AS {id_col},
  coalesce(a.n_trans, 0)::BIGINT AS n_trans,
  coalesce(a.n_oov, 0)::BIGINT AS n_oov,
  coalesce(round(-a.s / a.n_trans, {round_digits}), 0.0) AS nll,
  coalesce(round(exp(-a.s / a.n_trans), {round_digits}), 1.0) AS ppl
FROM d LEFT JOIN agg a ON a.id = d.id"""


def collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_count: int = 5,
    top_n: int = 50,
    round_digits: int = 9,
) -> DataFrame:
    """PMI collocation mining — the word2vec/phrase-detection step that
    finds token pairs occurring together far more often than chance
    (Mikolov et al. 2013 §4's data-driven phrases; classic pointwise
    mutual information over adjacent-bigram counts).

    PMI(x,y) = ln( p(xy) / (p(x)·p(y)) ) with p(xy) = c_xy/N_bi over
    bigram windows and p(x) = c_x/N_uni over tokens. Pairs below
    ``min_count`` are dropped first (PMI's low-frequency pathologies),
    then the top ``top_n`` survive by score.

    Determinism: the cut ranks by ``c_xy / (c_x·c_y)`` — a SINGLE IEEE
    division of exactly-representable doubles, monotone in PMI for
    fixed corpus totals (ln is monotone; N²/N_bi is a constant factor)
    — with (w1, w2) tie-breaks, so both engines cut identically without
    comparing ln outputs. The displayed ``pmi`` is round-``round_digits``.

    Returns (w1, w2, pair_count, w1_count, w2_count, pmi, rank).

    Plan shape: one tokenize scan feeds a token-keyed unigram agg and a
    pair-keyed bigram agg (two shuffles of corpus tokens — the same
    class as corpus_vocab); ``min_count`` filters the pair table BEFORE
    its two unigram joins, so the joins move only surviving pairs;
    TakeOrdered(top_n) — never a global sort. Corpus totals are two
    scalars computed once at plan-build time (the count-as-literal
    pattern; a 1-row crossJoin would plan a BroadcastNestedLoopJoin).
    No broadcast of the unigram table: a 100 TB corpus's vocabulary
    can exceed broadcast limits, and the post-filter pair table is the
    small side anyway.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    from pyspark import StorageLevel

    from sdvg_spark.ops.dedup import widen

    t = tokens(F.col(text_col))
    staged = widen(docs, min_bytes=4 << 20).select(t.alias("__t"))
    # The collapsed unigram and (unfiltered) bigram count tables are
    # persisted (the tokfreq pattern: vocab-bounded, evictable,
    # recomputable) and everything else derives from them: the corpus
    # totals are exact integer sums of the cached counts (Σ unigram
    # counts ≡ token count; Σ pair counts ≡ pair count), and the two
    # unigram join sides read one cache. The previous shape tokenized
    # the corpus SIX times (totals scan, two join sides, pair scan,
    # plus re-evaluations); now twice — the two distinct aggregations,
    # which is the floor without a combined doc-level pass. Storage
    # contract (the semantic_dedup convention): the returned plan joins
    # both caches, so they live until the caller drops the plan;
    # sessions running many fits own cleanup.
    uni = (
        staged.select(F.explode("__t").alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs = F.when(
        F.size("__t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__t") - F.lit(1)),
            lambda i: F.struct(
                F.get("__t", i - F.lit(1)).alias("w1"),
                F.get("__t", i).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bifull = (
        staged.select(F.explode(pairs).alias("__p"))
        .select(F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ONE action for both totals (token_divergence's union-fusion
    # pattern): the unigram and bigram cache materializations run as
    # independent stages of a single job — concurrent, not serial —
    # and the totals are the same exact integer sums.
    tot = (
        uni.select(F.lit(0).alias("__side"), F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"))
        .unionByName(
            bifull.select(
                F.lit(1).alias("__side"),
                F.coalesce(F.sum("pair_count"), F.lit(0)).alias("__n"),
            )
        )
        # exactly 2 rows by construction (union of two global
        # aggregates) — statically bounded driver fetch, Arrow-batched
        .toPandas()
    )
    by_side = dict(zip(tot["__side"].astype(int).tolist(), tot["__n"].astype(int).tolist()))
    n_uni, n_bi = by_side[0], by_side[1]
    bi = bifull.where(F.col("pair_count") >= min_count)
    u1 = uni.select(F.col("__w").alias("w1"), F.col("__c").alias("w1_count"))
    u2 = uni.select(F.col("__w").alias("w2"), F.col("__c").alias("w2_count"))
    joined = bi.join(u1, "w1").join(u2, "w2")
    score = F.col("pair_count").cast("double") / (
        F.col("w1_count").cast("double") * F.col("w2_count").cast("double")
    )
    p_xy = F.col("pair_count").cast("double") / F.lit(float(n_bi))
    p_x = F.col("w1_count").cast("double") / F.lit(float(n_uni))
    p_y = F.col("w2_count").cast("double") / F.lit(float(n_uni))
    top = joined.orderBy(
        score.desc(), F.asc("w1"), F.asc("w2")
    ).limit(top_n)
    w = Window.orderBy(score.desc(), F.asc("w1"), F.asc("w2"))
    return (
        top.withColumn("pmi", F.round(F.log(p_xy / (p_x * p_y)), round_digits))
        .withColumn("rank", F.row_number().over(w))
        .select("w1", "w2", "pair_count", "w1_count", "w2_count", "pmi", "rank")
    )


def collocations_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
    round_digits: int = 9,
) -> str:
    """DuckDB mirror of :func:`collocations` — same integer counts,
    same single-division ranking score, same PMI arithmetic order."""
    tk = sql_tokens(text_col)
    return f"""
WITH d AS (SELECT {tk} AS t FROM {table}),
tot AS (SELECT coalesce(sum(len(t)), 0)::BIGINT AS n_uni,
               coalesce(sum(greatest(len(t) - 1, 0)), 0)::BIGINT AS n_bi
        FROM d),
tks AS (SELECT unnest(t) AS w FROM d),
uni AS (SELECT w, count(*)::BIGINT AS c FROM tks GROUP BY w),
bi AS (SELECT unnest(list_transform(range(1, len(t)),
                     i -> {{'w1': t[i], 'w2': t[i + 1]}})) AS p
       FROM d),
bc AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*)::BIGINT AS pair_count
       FROM bi GROUP BY 1, 2 HAVING count(*) >= {int(min_count)}),
j AS (SELECT w1, w2, pair_count, u1.c AS w1_count, u2.c AS w2_count
      FROM bc JOIN uni u1 ON u1.w = bc.w1 JOIN uni u2 ON u2.w = bc.w2),
r AS (SELECT *, row_number() OVER (
        ORDER BY pair_count::DOUBLE / (w1_count::DOUBLE * w2_count::DOUBLE)
                 DESC, w1, w2) AS rank
      FROM j)
SELECT w1, w2, pair_count, w1_count, w2_count,
  round(ln((pair_count::DOUBLE / n_bi::DOUBLE) /
           ((w1_count::DOUBLE / n_uni::DOUBLE) *
            (w2_count::DOUBLE / n_uni::DOUBLE))), {int(round_digits)}) AS pmi,
  rank
FROM r, tot WHERE rank <= {int(top_n)}"""


def token_divergence(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    *,
    top_n: int = 1000,
    alpha: float = 0.5,
    round_digits: int = 9,
) -> DataFrame:
    """Distribution drift between two corpus slices: KL(a‖b), KL(b‖a)
    and Jensen–Shannon divergence of their smoothed unigram
    distributions — the dataset-shift monitor a pipeline runs when a
    new crawl/domain lands next to the existing training mix.

    Model: the shared vocabulary is the ``top_n`` tokens by COMBINED
    frequency (ties by token — a total order, deterministic cut); each
    side's distribution is Lidstone-smoothed over vocab + one OOV
    bucket, p(t) = (c(t)+α)/(N+α·(V+1)), which sums to exactly 1.
    Natural-log divergences (nats).

    Returns ONE row: (n_tokens_a, n_tokens_b, vocab_size, kl_ab,
    kl_ba, js).

    Determinism: per-token float terms fold in TOKEN ORDER over the
    ≤``top_n``-element vocab array (the unigram_nll pattern), the OOV
    bucket's term is added last, and every double expression has the
    same textual shape as the oracle's — so both engines emit
    identical bits before rounding.

    Plan shape: one token-keyed count agg per side, a full-outer merge
    of two count tables, TakeOrdered(top_n) for the vocab, and a
    single ≤top_n-row fold. Corpus totals and vocab-mass sums are four
    scalars (count-as-literal pattern). The vocab is traversed twice
    (scalar job + fold job) — persist upstream counts if the corpus
    scan dominates.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    a = float(alpha)

    def counts(d: DataFrame, out: str) -> DataFrame:
        from sdvg_spark.ops.dedup import widen

        return (
            widen(d, min_bytes=4 << 20)
            .select(F.explode(tokens(F.col(text_col))).alias("__w"))
            .groupBy("__w")
            .agg(F.count(F.lit(1)).alias(out))
        )

    from pyspark import StorageLevel

    # persist each side's collapsed count table (tokfreq pattern): the
    # N totals are exact integer sums of the cached counts (Σ counts ≡
    # token-stream length), so the two dedicated corpus tokenize scans
    # disappear, and the vocab/fold consumers read the caches — 6
    # tokenize passes (2 count aggs + 2 totals + 2 re-evaluations in
    # the final action) become the 2-agg floor. Storage contract (the
    # semantic_dedup convention): the RETURNED plan reads these caches,
    # so they live until the caller drops the plan (ContextCleaner
    # reaps them); sessions running many fits own cleanup.
    ca = counts(docs_a, "__ca").persist(StorageLevel.MEMORY_AND_DISK)
    cb = counts(docs_b, "__cb").persist(StorageLevel.MEMORY_AND_DISK)
    # ONE action for both totals: the union evaluates the two cached
    # count tables as independent stages of a single job, so the two
    # corpus tokenize passes run CONCURRENTLY (guide §2.6) instead of
    # as two serial jobs — and the totals are the same exact integer
    # sums either way.
    tot = (
        ca.select(F.lit(0).alias("__side"), F.coalesce(F.sum("__ca"), F.lit(0)).alias("__n"))
        .unionByName(
            cb.select(F.lit(1).alias("__side"), F.coalesce(F.sum("__cb"), F.lit(0)).alias("__n"))
        )
        # exactly 2 rows by construction (union of two global
        # aggregates) — statically bounded driver fetch, Arrow-batched
        .toPandas()
    )
    by_side = dict(zip(tot["__side"].astype(int).tolist(), tot["__n"].astype(int).tolist()))
    na, nb = by_side[0], by_side[1]
    merged = ca.join(cb, "__w", "full_outer").select(
        "__w",
        F.coalesce("__ca", F.lit(0)).alias("__ca"),
        F.coalesce("__cb", F.lit(0)).alias("__cb"),
    )
    vocab = merged.orderBy(
        (F.col("__ca") + F.col("__cb")).desc(), F.asc("__w")
    ).limit(top_n)
    sc = vocab.select(
        F.count(F.lit(1)).alias("v"),
        F.coalesce(F.sum("__ca"), F.lit(0)).alias("sva"),
        F.coalesce(F.sum("__cb"), F.lit(0)).alias("svb"),
    ).first()
    v, sva, svb = int(sc["v"]), int(sc["sva"]), int(sc["svb"])
    den_a = float(na) + a * (v + 1)
    den_b = float(nb) + a * (v + 1)

    pa = (F.col("__ca").cast("double") + F.lit(a)) / F.lit(den_a)
    pb = (F.col("__cb").cast("double") + F.lit(a)) / F.lit(den_b)
    m = (pa + pb) / F.lit(2.0)
    terms = vocab.select(
        F.struct(
            F.col("__w").alias("w"),
            (pa * F.log(pa / pb)).alias("a"),
            (pb * F.log(pb / pa)).alias("b"),
            ((pa * F.log(pa / m) + pb * F.log(pb / m)) / F.lit(2.0)).alias("j"),
        ).alias("__s")
    )

    # OOV bucket, appended AFTER the token-ordered fold on both engines
    pa_o = (float(na - sva) + a) / den_a
    pb_o = (float(nb - svb) + a) / den_b
    m_o = (pa_o + pb_o) / 2.0
    oov_a = pa_o * math.log(pa_o / pb_o)
    oov_b = pb_o * math.log(pb_o / pa_o)
    oov_j = (pa_o * math.log(pa_o / m_o) + pb_o * math.log(pb_o / m_o)) / 2.0

    def fold(field: str) -> Column:
        return F.aggregate(
            F.transform(
                F.sort_array(F.collect_list("__s")), lambda s: s[field]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return terms.agg(
        F.lit(na).cast("long").alias("n_tokens_a"),
        F.lit(nb).cast("long").alias("n_tokens_b"),
        F.lit(v).cast("long").alias("vocab_size"),
        F.round(fold("a") + F.lit(oov_a), round_digits).alias("kl_ab"),
        F.round(fold("b") + F.lit(oov_b), round_digits).alias("kl_ba"),
        F.round(fold("j") + F.lit(oov_j), round_digits).alias("js"),
    )


def token_divergence_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    where_a: str,
    where_b: str,
    top_n: int = 1000,
    alpha: float = 0.5,
    round_digits: int = 9,
) -> str:
    """DuckDB mirror of :func:`token_divergence` — same vocab cut,
    same smoothing shape, same token-order fold, OOV term added last."""
    tk = sql_tokens(text_col)
    a = repr(float(alpha))
    r = int(round_digits)
    return f"""
WITH ta AS (SELECT unnest({tk}) AS w FROM {table} WHERE {where_a}),
tb AS (SELECT unnest({tk}) AS w FROM {table} WHERE {where_b}),
ka AS (SELECT w, count(*)::BIGINT AS ca FROM ta GROUP BY w),
kb AS (SELECT w, count(*)::BIGINT AS cb FROM tb GROUP BY w),
u AS (SELECT coalesce(ka.w, kb.w) AS w, coalesce(ca, 0) AS ca,
             coalesce(cb, 0) AS cb
      FROM ka FULL OUTER JOIN kb ON ka.w = kb.w),
vocab AS (SELECT w, ca, cb FROM u ORDER BY (ca + cb) DESC, w LIMIT {int(top_n)}),
sc AS (SELECT (SELECT count(*) FROM ta)::BIGINT AS na,
              (SELECT count(*) FROM tb)::BIGINT AS nb,
              (SELECT count(*) FROM vocab)::BIGINT AS v,
              (SELECT coalesce(sum(ca), 0) FROM vocab)::BIGINT AS sva,
              (SELECT coalesce(sum(cb), 0) FROM vocab)::BIGINT AS svb),
terms AS (SELECT w,
    (ca + {a}) / (na + {a} * (v + 1)) AS pa,
    (cb + {a}) / (nb + {a} * (v + 1)) AS pb
  FROM vocab, sc),
folded AS (SELECT
    list_sort(list({{'w': w,
      'a': pa * ln(pa / pb),
      'b': pb * ln(pb / pa),
      'j': (pa * ln(pa / ((pa + pb) / 2)) + pb * ln(pb / ((pa + pb) / 2))) / 2
    }})) AS arr
  FROM terms),
oov AS (SELECT
    ((na - sva) + {a}) / (na + {a} * (v + 1)) AS pa,
    ((nb - svb) + {a}) / (nb + {a} * (v + 1)) AS pb
  FROM sc)
SELECT sc.na AS n_tokens_a, sc.nb AS n_tokens_b, sc.v AS vocab_size,
  round(coalesce(list_sum(list_transform(arr, x -> x.a)), 0.0)
        + oov.pa * ln(oov.pa / oov.pb), {r}) AS kl_ab,
  round(coalesce(list_sum(list_transform(arr, x -> x.b)), 0.0)
        + oov.pb * ln(oov.pb / oov.pa), {r}) AS kl_ba,
  round(coalesce(list_sum(list_transform(arr, x -> x.j)), 0.0)
        + (oov.pa * ln(oov.pa / ((oov.pa + oov.pb) / 2))
           + oov.pb * ln(oov.pb / ((oov.pa + oov.pb) / 2))) / 2, {r}) AS js
FROM sc, folded, oov"""


def zipf_fit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_n: int = 1000,
    round_digits: int = 9,
) -> DataFrame:
    """Zipf-law fit of the corpus frequency-rank curve: least-squares
    regression of ln(tf) on ln(rank) over the top-``top_n`` vocabulary
    — natural text sits near slope -1; strong deviation flags
    boilerplate/spam/templated corpora (a cheap corpus-health scalar
    next to :func:`token_divergence`).

    Returns ONE row: (n_ranks, slope, intercept, r2), with the
    closed-form least-squares solution evaluated from rank-ordered
    folded sums — the fold order, the ln inputs (exact integers), and
    the final expression shapes are identical in the DuckDB oracle, so
    the doubles match bitwise before rounding. Degenerate inputs
    (fewer than 2 ranks, or zero x-variance) return 0.0 fits.

    Plan shape: one corpus-token shuffle for term frequencies,
    TakeOrdered(top_n) for the rank cut (tf DESC, token — a total
    order), a ≤top_n-row window for ranks and one fold. Same cost
    class as corpus_vocab.
    """
    if top_n < 2:
        raise ValueError(f"top_n must be >= 2, got {top_n}")
    tf = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .orderBy(F.desc("__tf"), F.asc("__w"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("__tf"), F.asc("__w"))
    ranked = tf.withColumn("__r", F.row_number().over(w))
    x = F.log(F.col("__r").cast("double"))
    y = F.log(F.col("__tf").cast("double"))
    terms = ranked.select(
        F.struct(
            F.col("__r").alias("r"),
            x.alias("x"),
            y.alias("y"),
            (x * y).alias("xy"),
            (x * x).alias("xx"),
            (y * y).alias("yy"),
        ).alias("__s")
    )

    def fold(field: str) -> Column:
        return F.aggregate(
            F.transform(F.sort_array(F.collect_list("__s")), lambda s: s[field]),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_ranks"),
        fold("x").alias("sx"),
        fold("y").alias("sy"),
        fold("xy").alias("sxy"),
        fold("xx").alias("sxx"),
        fold("yy").alias("syy"),
    )
    n = F.col("n_ranks").cast("double")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    ok = (F.col("n_ranks") >= 2) & (den != 0.0)
    slope = F.when(ok, num / den).otherwise(F.lit(0.0))
    intercept = F.when(ok, (F.col("sy") - (num / den) * F.col("sx")) / n).otherwise(
        F.lit(0.0)
    )
    r2 = F.when(ok & (den_y != 0.0), (num * num) / (den * den_y)).otherwise(
        F.lit(0.0)
    )
    return agg.select(
        "n_ranks",
        F.round(slope, round_digits).alias("slope"),
        F.round(intercept, round_digits).alias("intercept"),
        F.round(r2, round_digits).alias("r2"),
    )


def zipf_fit_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    top_n: int = 1000,
    round_digits: int = 9,
) -> str:
    """DuckDB mirror of :func:`zipf_fit` — same rank cut, same
    rank-ordered folds, same closed-form expression shapes."""
    tk = sql_tokens(text_col)
    r = int(round_digits)
    return f"""
WITH tks AS (SELECT unnest({tk}) AS w FROM {table}),
v AS (SELECT w, count(*)::BIGINT AS tf FROM tks GROUP BY w
      ORDER BY tf DESC, w LIMIT {int(top_n)}),
rk AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, w) AS r FROM v),
t AS (SELECT r, ln(r::DOUBLE) AS x, ln(tf::DOUBLE) AS y FROM rk),
f AS (SELECT count(*)::BIGINT AS n_ranks,
        list_sort(list({{'r': r, 'x': x, 'y': y,
                         'xy': x * y, 'xx': x * x, 'yy': y * y}})) AS arr
      FROM t),
s AS (SELECT n_ranks,
        coalesce(list_sum(list_transform(arr, e -> e.x)), 0.0) AS sx,
        coalesce(list_sum(list_transform(arr, e -> e.y)), 0.0) AS sy,
        coalesce(list_sum(list_transform(arr, e -> e.xy)), 0.0) AS sxy,
        coalesce(list_sum(list_transform(arr, e -> e.xx)), 0.0) AS sxx,
        coalesce(list_sum(list_transform(arr, e -> e.yy)), 0.0) AS syy
      FROM f)
SELECT n_ranks,
  round(CASE WHEN n_ranks >= 2
             AND n_ranks::DOUBLE * sxx - sx * sx != 0.0
        THEN (n_ranks::DOUBLE * sxy - sx * sy)
             / (n_ranks::DOUBLE * sxx - sx * sx)
        ELSE 0.0 END, {r}) AS slope,
  round(CASE WHEN n_ranks >= 2
             AND n_ranks::DOUBLE * sxx - sx * sx != 0.0
        THEN (sy - ((n_ranks::DOUBLE * sxy - sx * sy)
                    / (n_ranks::DOUBLE * sxx - sx * sx)) * sx)
             / n_ranks::DOUBLE
        ELSE 0.0 END, {r}) AS intercept,
  round(CASE WHEN n_ranks >= 2
             AND n_ranks::DOUBLE * sxx - sx * sx != 0.0
             AND n_ranks::DOUBLE * syy - sy * sy != 0.0
        THEN ((n_ranks::DOUBLE * sxy - sx * sy)
              * (n_ranks::DOUBLE * sxy - sx * sy))
             / ((n_ranks::DOUBLE * sxx - sx * sx)
                * (n_ranks::DOUBLE * syy - sy * sy))
        ELSE 0.0 END, {r}) AS r2
FROM s"""


def dsir_logweights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    buckets: int = 256,
    alpha: float = 0.5,
    round_digits: int = 9,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score each raw doc
    by how much more likely its hashed-unigram features are under the
    TARGET distribution (a curated, high-quality slice) than under the
    raw corpus itself —

        logweight(d) = Σ_tok  ln p̂_target[b(tok)] − ln p̂_raw[b(tok)]

    with b(tok) a ``buckets``-way feature hash and Lidstone-smoothed
    bucket probabilities p̂[b] = (cnt[b] + α)/(n + α·B). Positive means
    target-like; ``selected`` marks logweight ≥ 0 (the threshold form
    of importance resampling — no global rank, so no single-partition
    window; feed the weight to token_budget_sample for a budgeted
    draw).

    The bucket hash is md5's 60-bit prefix mod ``buckets`` — the same
    engine-mirrorable fold as sampling's string-key draw, exact in
    DuckDB. Per-doc sums fold in TOKEN order (the unigram_nll
    pattern); smoothing literals are embedded bit-exact on both sides.

    Scale shape: two bucket-count aggregates (corpus-token shuffles
    with map-side combine collapsing to ≤``buckets`` rows each), the
    ≤``buckets``-row log-likelihood-ratio table broadcast back, one
    groupBy(doc) ordered fold. No all-pairs, no driver data beyond the
    two token totals.
    """
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")

    def bucket(tok: Column) -> Column:
        h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
        return (h % F.lit(int(buckets))).alias("__b")

    def bucket_counts(df_: DataFrame) -> DataFrame:
        staged = df_.select(tokens(F.col(text_col)).alias("__toks"))
        return (
            staged.select(F.explode("__toks").alias("__tok"))
            .select(bucket(F.col("__tok")))
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias("__c"))
        )

    tgt = bucket_counts(target)
    raw = bucket_counts(docs)
    # ONE action for both totals (side-tagged union of the two sum
    # aggregates): same exact integer sums, concurrent evaluation
    tot = (
        tgt.select(F.lit(0).alias("__side"), F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"))
        .unionByName(
            raw.select(F.lit(1).alias("__side"), F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"))
        )
        # exactly 2 rows by construction (union of two global
        # aggregates) — statically bounded driver fetch, Arrow-batched
        .toPandas()
    )
    by_side = dict(zip(tot["__side"].astype(int).tolist(), tot["__n"].astype(int).tolist()))
    n_t, n_r = by_side[0], by_side[1]
    if n_t == 0 or n_r == 0:
        raise ValueError("target and raw corpora must both contain tokens")
    a = float(alpha)
    denom_t, denom_r = float(n_t) + a * buckets, float(n_r) + a * buckets
    llr_tbl = (
        raw.withColumnRenamed("__c", "__cr")
        .join(tgt.withColumnRenamed("__c", "__ct"), "__b", "full")
        .select(
            "__b",
            (
                F.log((F.coalesce("__ct", F.lit(0)) + F.lit(a)) / F.lit(denom_t))
                - F.log((F.coalesce("__cr", F.lit(0)) + F.lit(a)) / F.lit(denom_r))
            ).alias("__llr"),
        )
    )
    tok_rows = docs.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("__p", "__tok")
    ).select(id_col, "__p", bucket(F.col("__tok")))
    scored = (
        tok_rows.join(F.broadcast(llr_tbl), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.round(
                F.aggregate(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("__p", "__llr"))),
                        lambda s: s["__llr"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                round_digits,
            ).alias("logweight"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("logweight", F.lit(0.0)).alias("logweight"),
            (F.coalesce("logweight", F.lit(0.0)) >= F.lit(0.0)).alias("selected"),
        )
    )


def dsir_logweights_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    target_filter: str,
    buckets: int = 256,
    alpha: float = 0.5,
    round_digits: int = 9,
) -> str:
    """DuckDB mirror of :func:`dsir_logweights` with target = rows
    matching ``target_filter`` and raw = the whole table — same md5
    bucket fold, same smoothing doubles, same token-order sum."""
    from sdvg_spark.core.rng import dlit

    toks = sql_tokens(text_col)
    b = int(buckets)
    a = dlit(float(alpha))
    ab = dlit(float(alpha) * b)
    hb = f"(CAST(('0x' || substr(md5(tok), 1, 15))::UBIGINT AS BIGINT) % {b})"
    return f"""
WITH d AS (SELECT {id_col} AS id, ({target_filter}) AS is_t, {toks} AS toks
           FROM {table}),
tk AS (SELECT id, is_t, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p
       FROM d),
bk AS (SELECT id, is_t, p, {hb} AS b FROM tk),
rc AS (SELECT b, count(*) AS cr FROM bk GROUP BY b),
tc AS (SELECT b, count(*) AS ct FROM bk WHERE is_t GROUP BY b),
nt AS (SELECT CAST(count(*) AS DOUBLE) + {ab} AS dt FROM bk WHERE is_t),
nr AS (SELECT CAST(count(*) AS DOUBLE) + {ab} AS dr FROM bk),
llr AS (SELECT coalesce(rc.b, tc.b) AS b,
          ln((coalesce(tc.ct, 0) + {a}) / (SELECT dt FROM nt))
          - ln((coalesce(rc.cr, 0) + {a}) / (SELECT dr FROM nr)) AS llr
        FROM rc FULL JOIN tc ON rc.b = tc.b),
agg AS (SELECT bk.id, count(*) AS n_tokens,
          round(list_sum(list_transform(list_sort(list({{'p': p, 'l': llr}})),
                                        r -> r.l)), {round_digits}) AS lw
        FROM bk JOIN llr USING (b) GROUP BY bk.id)
SELECT d.id AS {id_col},
  coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
  coalesce(a.lw, 0.0) AS logweight,
  (coalesce(a.lw, 0.0) >= 0.0) AS selected
FROM d LEFT JOIN agg a ON a.id = d.id"""


# ---------------------------------------------------------------------------
# Scale tiers (folded back from the r10 staging module ops/vocab.py,
# the same r9→r10 pattern as ops/ivf_merge.py → similarity.py)
#
# Why the tiers exist: the r9 sf100 probe measured unigram_nll at
# 20.7 GB and dsir_logweights at 18.6 GB of memory spill in their
# token-stream aggregates (SHUFFLE_r09.md). The restructured shapes
# below are value-identical to the reference shapes above (pinned by
# tests/test_vocab_tiers.py) and have been the DEFAULT at every corpus
# size since the r10 A/B measured them winning at every point
# (50k docs: nll 1.61→1.30 s, dsir 2.27→1.88 s; 500k: nll 15.9→10.7,
# dsir 83.3→49.6; 5M/sf100: nll spill → ZERO with shuffle write
# 2155 → 6.6 MB, dsir 18.6 GB → ZERO — SHUFFLE_r10).

# Tier bound for delegating back to the reference shapes; 0 = the
# restructured shape always (the measured default). The reference
# shapes remain reachable via an explicit scale_min_docs and serve as
# the value-identity witnesses the tier tests pin against.
_SCALE_MIN_DOCS = 0

# in-row nll fold: max broadcast-vocab entries (min(top_n, V)); a
# 2M-entry str→double dict is ~200 MB driver/executor-side — past this
# the scored stage falls back to the shuffle-based window formulation
# (and the vocab-side broadcast JOIN hint is dropped too: past the cap
# the lookup table is no longer credibly "the small side", so the
# planner's own size estimate / AQE decides the join strategy)
_INROW_MAX_VOCAB = 2_000_000


def _safe_tokens(text_col: str) -> Column:
    # null text must behave like an empty doc (size(NULL) is -1 with
    # ANSI off; an unguarded fold would emit NULL sums)
    return F.coalesce(
        tokens(F.col(text_col)), F.array().cast("array<string>")
    )


def _nll_inrow_scored(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    ln_oov_expr: Column,
) -> DataFrame:
    """Map-only scored stage: per-doc (n_tokens, n_oov, Σ ln p) folded
    IN-ROW by an Arrow-batched kernel against the broadcast top-N vocab
    — no posexplode, no (doc)-keyed exchange, no window sort. The dsir
    in-row fold precedent (its LLR table embeds as ≤``buckets``
    literals); the nll vocab is a string→double lookup a codegen HOF
    cannot express without an O(V)-per-token literal scan, so the fold
    crosses to Python once per Arrow batch instead:

    * the vocab (≤ top_n rows) and the OOV constant are evaluated by
      the SAME Spark expressions as the join formulation and collected
      — the kernel looks up the very doubles the broadcast join would
      have carried (JVM ``Math.log``; a Python ``math.log`` recompute
      could differ in the last ulp);
    * per batch, the token lists are flattened and dictionary-encoded
      arrow-side, the ≤ distinct-per-batch dictionary is mapped through
      the vocab dict in Python, and scores gather back by index — the
      per-token hot path never touches Python objects;
    * each doc's Σ ln p is the exact sequential left-to-right fold
      ((x1+x2)+x3)+… — the bit-identical addition sequence of the
      collect_list/window folds (0.0 + x1 ≡ x1: ln p < 0, never
      -0.0). Short docs fold COLUMN-WISE (step j adds every active
      doc's j-th score to its running sum — the same sequential order,
      one vectorized gather+add per step instead of a Python loop per
      doc); docs longer than ``_FOLD_COLWISE_MAX`` fold individually
      via ``np.add.accumulate`` (sequential by definition; the big
      slices amortize the per-call overhead). ``np.add.reduceat`` is
      NOT usable here: despite folding "per segment", its add loop is
      partially unrolled and measurably deviates from the sequential
      fold (max |Δ| ~6e-13 on 1M-element probes — reduceat matches
      neither accumulate nor pairwise np.sum), which would break the
      tier tests' bit-identity contract. dedup.py's reduceat uses are
      ``minimum`` (order-free) and integer adds (exact) — the idiom
      does not transfer to float sums. n_oov/n_tokens are exact
      integer reductions.

    Returns (id, __n, n_oov, __sum_lnp) — one row per input doc; the
    caller applies the shared nll/ppl arithmetic Spark-side so
    round/exp stay JVM-evaluated.
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = docs.sparkSession
    # the OOV constant rides the vocab collect as a literal column —
    # Catalyst constant-folds it with JVM Math.log (the same double the
    # dedicated range(1) job produced), so ONE job fetches vocab + OOV.
    # Empty vocab (no rows to carry the literal) falls back to the
    # driver-local single-row evaluation.
    vocab_pdf = vocab.select("__tok", "__lnp", ln_oov_expr.alias("__lnoov")).toPandas()
    if len(vocab_pdf):
        ln_oov = float(vocab_pdf["__lnoov"].iloc[0])
    else:
        ln_oov = float(spark.range(1).select(ln_oov_expr.alias("v")).first()["v"])
    tok2lnp = dict(
        zip(vocab_pdf["__tok"].tolist(), vocab_pdf["__lnp"].tolist())
    )
    # NOTE like tokfreq's persist: this broadcast (≤ _INROW_MAX_VOCAB
    # entries, worst case ~200 MB) is never destroyed here — the
    # returned plan references it lazily, so eager cleanup would break
    # re-execution. Sessions running MANY fits accumulate one dict per
    # call on the executors until GC of the plan; call
    # spark.sparkContext._jsc.sc().cleaner() relies on weak refs, i.e.
    # dropping the returned DataFrame releases it.
    bc = spark.sparkContext.broadcast(tok2lnp)

    from sdvg_spark.ops.dedup import widen

    staged = widen(docs, min_bytes=4 << 20).select(
        F.col(id_col), _safe_tokens(text_col).alias("__toks")
    )
    out_schema = StructType(
        [
            StructField(id_col, staged.schema[id_col].dataType, True),
            StructField("__n", LongType(), False),
            StructField("n_oov", LongType(), False),
            StructField("__sum_lnp", DoubleType(), False),
        ]
    )

    def fold_batches(batches):
        t2l = bc.value
        for b in batches:
            la = b.column(1)
            counts = la.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
            flat = la.flatten()
            de = flat.dictionary_encode()
            dict_toks = de.dictionary.to_pylist()
            lnp_tbl = np.fromiter(
                (t2l.get(t, ln_oov) for t in dict_toks),
                dtype=np.float64,
                count=len(dict_toks),
            )
            oov_tbl = np.fromiter(
                (t not in t2l for t in dict_toks),
                dtype=np.int64,
                count=len(dict_toks),
            )
            if len(dict_toks):
                idx = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                flat_lnp = lnp_tbl[idx]
                flat_oov = oov_tbl[idx]
            else:
                flat_lnp = np.zeros(0, dtype=np.float64)
                flat_oov = np.zeros(0, dtype=np.int64)
            ends = np.cumsum(counts)
            starts = ends - counts
            oov_cum = np.concatenate([[0], np.cumsum(flat_oov)])
            n_oov = oov_cum[ends] - oov_cum[starts]
            sums = _sequential_segment_sums(flat_lnp, starts, counts)
            yield pa.record_batch(
                [
                    b.column(0),
                    pa.array(counts, type=pa.int64()),
                    pa.array(n_oov, type=pa.int64()),
                    pa.array(sums, type=pa.float64()),
                ],
                names=[id_col, "__n", "n_oov", "__sum_lnp"],
            )

    return staged.mapInArrow(fold_batches, out_schema)


# column-wise fold cut: docs up to this many tokens fold in the
# vectorized column loop (≤ this many Python-level steps per batch for
# ALL of them together); longer docs fold one np.add.accumulate each
# (few of them, big slices — the per-call overhead amortizes)
_FOLD_COLWISE_MAX = 64


def _sequential_segment_sums(flat, starts, counts):
    """Per-segment sums of ``flat`` in the EXACT sequential
    left-to-right addition order (the fold the nll tier contract pins;
    see the reduceat note in :func:`_nll_inrow_scored`). Segments are
    [starts[i], starts[i]+counts[i]); empty segments sum to 0.0."""
    import numpy as np

    sums = np.zeros(len(counts), dtype=np.float64)
    if not len(counts):
        return sums
    long_idx = np.flatnonzero(counts > _FOLD_COLWISE_MAX)
    for i in long_idx:
        # accumulate is sequential by definition: the exact
        # ((x1+x2)+x3)+… fold
        sums[i] = np.add.accumulate(flat[starts[i] : starts[i] + counts[i]])[-1]
    short = np.flatnonzero((counts > 0) & (counts <= _FOLD_COLWISE_MAX))
    if not len(short):
        return sums
    # descending-length order makes the active set a shrinking prefix
    order = short[np.argsort(-counts[short], kind="stable")]
    st_o = starts[order]
    ct_o = counts[order]
    run = np.zeros(len(order), dtype=np.float64)
    neg = -ct_o  # ascending; actives at step j are counts > j
    for j in range(int(ct_o[0])):
        na = int(np.searchsorted(neg, -j, side="left"))
        # run[:na] += x_j for every doc still active — ONE elementwise
        # add per step, i.e. each doc's sum grows strictly
        # left-to-right (the sequential fold, vectorized across docs)
        run[:na] += flat[st_o[:na] + j]
    sums[order] = run
    return sums


def unigram_nll_tiered(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_n: int = 1000,
    alpha: float = 0.5,
    round_digits: int = 9,
    n_docs: int | None = None,
    scale_min_docs: int = _SCALE_MIN_DOCS,
    scored_fold: str = "inrow",
) -> DataFrame:
    """:func:`unigram_nll` with a scale tier.

    ``n_docs`` (the tier probe) may be passed from parquet footer
    metadata / catalog stats to skip the plan-build count job. Below
    ``scale_min_docs`` this delegates verbatim; above it the model-fit
    side is restructured (value-identically — same N, V, tf integers,
    so the same lnp doubles) to remove the sf100 spill sources:

    * N = map-side Σ size(tokens) — no token-stream count aggregate;
    * the vocab tf aggregate reads RLE postings
      (:func:`sdvg_spark.ops.text.rle_postings` — shared with the
      tfidf scale tier; input shrinks by the within-doc repetition
      factor and each partial-agg map key appears once per doc, not
      once per occurrence);
    * V = the persisted vocab aggregate's row count — no full-stream
      ``countDistinct`` partials. The collapsed (token, tf) table is
      persisted MEMORY_AND_DISK (recomputable, evictable) because V
      and the top-N cut both read it; callers running many fits per
      session can unpersist via the returned plan's sources or accept
      LRU eviction;
    * the per-doc scored fold (``scored_fold``, default ``"inrow"``)
      runs MAP-ONLY: an Arrow-batched kernel folds Σ ln p in-row
      against the broadcast ≤ top_n vocab — no posexplode, no
      (doc)-keyed exchange, no window sort. ``"window"`` is the
      shuffle-based fallback past ``_INROW_MAX_VOCAB`` broadcast
      entries: since r12 a SINGLE (id, pos) window spec with
      streaming frames (running sums + row_number + lead-is-null) —
      the prior second, orderless spec's unbounded frame buffered
      every row of a doc before emitting, the spill-prone half of the
      7.0 GB sf100 residue (SHUFFLE_r10 probe #3). On the fallback
      the vocab join also drops
      its broadcast HINT (the Python dict was never the only hazard —
      a >2M-row JVM broadcast is one too, so past the cap the planner
      decides from its own size estimate). Both folds perform the
      small tier's exact left-to-right addition sequence
      (bit-identical NLL floats, tier-test-pinned); the original
      collect_list fold's 128-group ObjectHashAggregate fallback was
      the 20.7 GB spill the r10 tier removed.

    Precondition (in-row fold): ``id_col`` values are unique — the
    map-only kernel emits ONE ROW PER INPUT ROW, while the reference/
    window shapes groupBy(id) and would merge duplicate ids into one
    row. The documents contract everywhere in this package (and both
    fixtures) has unique doc ids; pass pre-deduplicated input or use
    ``scored_fold="window"`` if yours does not.
    """
    if n_docs is None and scale_min_docs > 0:
        n_docs = docs.count()
    if scale_min_docs > 0 and n_docs < scale_min_docs:
        return unigram_nll(
            docs, id_col, text_col,
            top_n=top_n, alpha=alpha, round_digits=round_digits,
        )
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    from pyspark import StorageLevel

    tokfreq = (
        rle_postings(docs, id_col, text_col)
        .groupBy("token")
        .agg(F.sum("tf").alias("__tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ONE aggregate over the collapsed (token, tf) table yields both V
    # (row count) and N (Σ tf ≡ Σ size(tokens) — rle tf's sum to the
    # token-stream length exactly) while materializing the cache. The
    # previous shape paid a SECOND full corpus tokenize pass just for
    # N, plus a separate count job for V.
    vn = tokfreq.agg(
        F.count(F.lit(1)).alias("__v"), F.sum("__tf").alias("__n")
    ).first()
    v_total = int(vn["__v"] or 0)
    n_total = int(vn["__n"] or 0)
    denom = float(n_total) + alpha * (v_total + 1)
    vocab = (
        tokfreq.orderBy(F.desc("__tf"), F.asc("token"))
        .limit(top_n)
        .select(
            F.col("token").alias("__tok"),
            F.log((F.col("__tf") + F.lit(float(alpha))) / F.lit(denom)).alias("__lnp"),
        )
    )
    ln_oov = F.log(F.lit(float(alpha)) / F.lit(denom))
    if scored_fold not in ("inrow", "window"):
        raise ValueError(f"scored_fold must be 'inrow' or 'window', got {scored_fold!r}")
    hint_broadcast = True
    if scored_fold == "inrow" and min(top_n, v_total) > _INROW_MAX_VOCAB:
        # the broadcast dict is bounded by min(top_n, V) entries; past
        # the cap the lookup table stops being "small side" (in EITHER
        # runtime: Python dict or JVM broadcast) and the shuffle-based
        # window formulation without a broadcast hint is the safe shape
        scored_fold = "window"
        hint_broadcast = False
    if scored_fold == "inrow":
        folded = _nll_inrow_scored(docs, id_col, text_col, vocab, ln_oov)
        # the in-row fold COLLECTED the vocab (broadcast dict); the
        # returned plan never reads tokfreq — release the cache so
        # repeated fits in a long-lived session don't accumulate blocks
        # (the window fallback below keeps it: its plan joins `vocab`)
        tokfreq.unpersist()
        n = F.col("__n")
        return folded.select(
            id_col,
            n.alias("n_tokens"),
            F.col("n_oov").alias("n_oov"),
            F.when(n > 0, F.round(-F.col("__sum_lnp") / n, round_digits))
            .otherwise(F.lit(0.0))
            .alias("nll"),
            F.when(n > 0, F.round(F.exp(-F.col("__sum_lnp") / n), round_digits))
            .otherwise(F.lit(1.0))
            .alias("ppl"),
        )
    tok_rows = docs.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("__p", "__tok")
    )
    # ONE window spec (partitionBy id, orderBy pos): the running-frame
    # sums, row_number and lead(pos) all share it, so Spark plans a
    # single WindowExec with streaming (bounded-buffer) frames. The
    # previous shape added a second, ORDERLESS spec (sum/count over the
    # whole partition) whose unbounded frame buffers every row of a doc
    # in an ExternalAppendOnlyUnsafeRowArray before emitting — the
    # spill-prone half of the r10 7.0 GB sf100 shuffle+window residue.
    # Value parity: at the last row (lead(pos) IS NULL — posexplode
    # positions are distinct within a doc) the running Σ__lnp has added
    # the identical left-to-right sequence, the running Σ__oov is an
    # order-free integer sum, and row_number equals the partition count.
    w_ord = Window.partitionBy(id_col).orderBy("__p")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        tok_rows.join(
            F.broadcast(vocab) if hint_broadcast else vocab, "__tok", "left"
        )
        .select(
            id_col,
            "__p",
            F.coalesce(F.col("__lnp"), ln_oov).alias("__lnp"),
            F.col("__lnp").isNull().cast("long").alias("__oov"),
        )
        .select(
            id_col,
            F.sum("__lnp").over(w_run).alias("__sum_lnp"),
            F.sum("__oov").over(w_run).alias("n_oov"),
            F.row_number().over(w_ord).alias("__n"),
            F.lead("__p", 1).over(w_ord).alias("__nxt"),
        )
        .where(F.col("__nxt").isNull())
        .select(
            id_col,
            F.col("__n").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            F.round(-F.col("__sum_lnp") / F.col("__n"), round_digits).alias("nll"),
            F.round(F.exp(-F.col("__sum_lnp") / F.col("__n")), round_digits).alias("ppl"),
        )
    )
    base = docs.select(F.col(id_col))
    return base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.coalesce("nll", F.lit(0.0)).alias("nll"),
        F.coalesce("ppl", F.lit(1.0)).alias("ppl"),
    )


def dsir_logweights_tiered(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    buckets: int = 256,
    alpha: float = 0.5,
    round_digits: int = 9,
    n_docs: int | None = None,
    scale_min_docs: int = _SCALE_MIN_DOCS,
) -> DataFrame:
    """:func:`dsir_logweights` with a scale tier. Below
    ``scale_min_docs`` (tier probe ``n_docs``, footer/
    catalog-suppliable) this delegates verbatim; above it the scored
    stage goes MAP-ONLY:

    the two bucket-count aggregates and the LLR arithmetic are
    unchanged (same Spark expressions ⇒ bit-identical doubles), but
    the ≤``buckets``-row LLR table is COLLECTED and embedded as an
    array literal, and each document folds Σ llr[bucket(tok)] in-row
    in token order (same addition sequence as the small tier's
    positional fold ⇒ same floats). No token explode, no per-doc
    collect_list buffer — at sf100 that buffer was the operator's
    entire 18.6 GB spill — and no (doc)-keyed shuffle: after the two
    tiny aggregates the whole query is one pass over the corpus.

    The in-row bucket hash runs interpreted inside the HOF lambda
    (md5 → 60-bit prefix → mod), the same per-token md5 count as the
    exploded path; the expression-plumbing overhead is bought back
    many times over by deleting the shuffle + spill.
    """
    if n_docs is None and scale_min_docs > 0:
        n_docs = docs.count()
    if scale_min_docs > 0 and n_docs < scale_min_docs:
        return dsir_logweights(
            docs, target, id_col, text_col,
            buckets=buckets, alpha=alpha, round_digits=round_digits,
        )
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")

    def bucket(tok: Column) -> Column:
        h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
        return h % F.lit(int(buckets))

    def bucket_counts(df_: DataFrame) -> DataFrame:
        from sdvg_spark.ops.dedup import widen

        staged = widen(df_, min_bytes=4 << 20).select(_safe_tokens(text_col).alias("__toks"))
        return (
            staged.select(F.explode("__toks").alias("__tok"))
            .select(bucket(F.col("__tok")).alias("__b"))
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias("__c"))
        )

    # each bucket table (≤ buckets rows by construction) is evaluated
    # ONCE and collected; N totals are exact integer sums of the
    # collected counts, and the LLR join below reads the collected rows
    # back as local relations — the previous shape ran every bucket
    # aggregate TWICE (once for its N, once inside the llr join)
    spark = docs.sparkSession
    # ONE collect for both ≤buckets-row tables (side-tagged union): the
    # two corpus tokenize passes evaluate as independent stages of a
    # single job — concurrent, not serial — with identical rows.
    both_pdf = (
        bucket_counts(target).select(F.lit(0).alias("__side"), "__b", "__c")
        .unionByName(
            bucket_counts(docs).select(F.lit(1).alias("__side"), "__b", "__c")
        )
        .toPandas()
    )
    tgt_pdf = both_pdf[both_pdf["__side"] == 0][["__b", "__c"]]
    raw_pdf = both_pdf[both_pdf["__side"] == 1][["__b", "__c"]]
    n_t = int(tgt_pdf["__c"].sum()) if len(tgt_pdf) else 0
    n_r = int(raw_pdf["__c"].sum()) if len(raw_pdf) else 0
    if n_t == 0 or n_r == 0:
        raise ValueError("target and raw corpora must both contain tokens")
    tgt = spark.createDataFrame(tgt_pdf, "__b long, __c long")
    raw = spark.createDataFrame(raw_pdf, "__b long, __c long")
    a = float(alpha)
    denom_t, denom_r = float(n_t) + a * buckets, float(n_r) + a * buckets
    # identical expression to the small tier's llr_tbl — materialized
    # driver-side (grouped on __b = hash % buckets: ≤ buckets rows by
    # construction, the same bounded-aggregate toPandas pattern as
    # sampling.py), so the literals below carry the very doubles the
    # broadcast join would have carried
    llr_pdf = (
        raw.withColumnRenamed("__c", "__cr")
        .join(tgt.withColumnRenamed("__c", "__ct"), "__b", "full")
        .select(
            "__b",
            (
                F.log((F.coalesce("__ct", F.lit(0)) + F.lit(a)) / F.lit(denom_t))
                - F.log((F.coalesce("__cr", F.lit(0)) + F.lit(a)) / F.lit(denom_r))
            ).alias("__llr"),
        )
        .toPandas()
    )
    # buckets absent from BOTH corpora never join a row in the small
    # tier either (no token hashes there), but the literal array needs
    # every index populated — the zero-count llr is the right value
    # and unreachable from this corpus by construction
    llr = [
        math.log(a / denom_t) - math.log(a / denom_r)
    ] * int(buckets)
    for b_i, v in zip(llr_pdf["__b"], llr_pdf["__llr"]):
        llr[int(b_i)] = float(v)
    arr = F.array(*[F.lit(v) for v in llr])
    from sdvg_spark.ops.dedup import widen

    staged = widen(docs, min_bytes=4 << 20).select(
        F.col(id_col), _safe_tokens(text_col).alias("__toks")
    )
    lnsum = F.aggregate(
        F.transform(
            F.col("__toks"),
            lambda t: F.element_at(arr, (bucket(t) + F.lit(1)).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return staged.select(
        id_col,
        F.size("__toks").cast("long").alias("n_tokens"),
        F.round(F.coalesce(lnsum, F.lit(0.0)), round_digits).alias("logweight"),
    ).select(
        id_col,
        "n_tokens",
        "logweight",
        (F.col("logweight") >= F.lit(0.0)).alias("selected"),
    )
