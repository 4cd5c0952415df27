"""Scale tiers for the corpus-vocabulary LM-signal operators
(:func:`~sdvg_spark.ops.corpus.unigram_nll`,
:func:`~sdvg_spark.ops.corpus.dsir_logweights`).

Why this module exists (round-10 staging, fold into corpus.py at
round 11): the r9 sf100 probe measured unigram_nll at 20.7 GB and
dsir_weights at 18.6 GB of memory spill (SHUFFLE_r09.md) in their
token-stream aggregates, and the r9 verdict ordered the tfidf
RLE-pre-count treatment applied to both. corpus.py itself is
certificate-frozen this round — the rotation ledger's freshness
arithmetic (36 round-8 certificates MUST rotate into the 50-slot
driver window, and a corpus.py edit would invalidate 14 more r9
certificates, overflowing the window) — so the tiers stage here, the
exact pattern ops/ivf_merge.py used in r9 before its r10 fold-back.

What the restructured shapes change (value-identical to the corpus.py
reference shapes, pinned by tests/test_vocab_tiers.py; the DEFAULT at
every corpus size since the r10 A/B — see _SCALE_MIN_DOCS):

* ``unigram_nll`` scale tier: N comes from a map-side
  ``sum(size(tokens))`` instead of a token-stream count; the vocab
  aggregate consumes in-row run-length postings (one (token, tf) row
  per DISTINCT per-doc term — the tfidf RLE fold, ops/text.py:832-878)
  instead of the raw token stream; V is the persisted vocab
  aggregate's own row count instead of a second full-stream
  ``countDistinct``; and the per-doc scored fold becomes a running-sum
  window over (id, p) — the identical left-to-right addition sequence
  (bit-identical doubles), but ONE post-shuffle sort instead of
  collect_list buffers, whose 128-group ObjectHashAggregate fallback
  was the ENTIRE 20.7 GB sf100 spill (probed: the spill survived the
  vocab-side fix byte-for-byte and died with the fold).
* ``dsir_logweights`` scale tier: the ≤``buckets``-row LLR table is
  collected (the values are computed by the SAME Spark expressions as
  the small tier, so the doubles are bit-identical) and embedded as an
  array literal; each doc then folds Σ llr[bucket(tok)] IN-ROW in
  token order — no token explode, no per-doc collect_list buffer (the
  sf100 spill), no (doc) shuffle at all: the scored stage is map-only.

Reference parity: both operators are training-data-pipeline additions
(SURVEY.md §2 extension families; DSIR per Xie et al. 2023, CCNet-style
LM filtering per Wenzek et al. 2020) — the reference engine has no
corpus operators; see corpus.py for the semantic contracts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tier bound. Originally 2M docs on the tfidf precedent ("below this
# the raw-stream aggregates are cheapest"), but the r10 A/B measured
# the restructured shapes WINNING at every size on the fixtures —
# 50k docs: nll 1.61→1.30 s, dsir 2.27→1.88 s; 500k: nll 15.9→10.7,
# dsir 83.3→49.6; 5M (sf100): nll spill 20.7→7.0 GB, dsir 18.6 GB→0 —
# so the restructured shape is now the DEFAULT at every size and the
# corpus.py delegates remain reachable via an explicit scale_min_docs
# (and as the value-identity reference the tier tests pin against).
_SCALE_MIN_DOCS = 0

# in-row nll fold: max broadcast-vocab entries (min(top_n, V)); a
# 2M-entry str→double dict is ~200 MB driver/executor-side — past this
# the scored stage falls back to the shuffle-based window formulation
_INROW_MAX_VOCAB = 2_000_000


def _safe_tokens(text_col: str) -> Column:
    from sdvg_spark.ops.text import tokens

    # null text must behave like an empty doc (size(NULL) is -1 with
    # ANSI off; an unguarded fold would emit NULL sums)
    return F.coalesce(
        tokens(F.col(text_col)), F.array().cast("array<string>")
    )


def rle_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, tf): per-document term counts computed INSIDE each
    row — the sorted-array run-length fold in pure codegen HOFs — so
    the raw token stream never leaves its row and a downstream
    vocab aggregate sees one row per distinct per-doc term instead of
    one per token occurrence. Same construction as the tfidf RLE tier
    (ops/text.py:832-878); staged here because text.py is also
    certificate-frozen this round — deduplicate on the r11 fold-back.
    """
    srt = df.select(
        F.col(id_col), F.array_sort(_safe_tokens(text_col)).alias("__srt")
    )
    s = F.col("__srt")

    def guarded_seq(n: Column) -> Column:
        # sequence(1, 0) counts DOWN ([1, 0]) and element_at(x, 0)
        # throws even non-ANSI — empty inputs need an explicit branch
        return F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )

    starts = srt.select(
        F.col(id_col),
        "__srt",
        F.filter(
            guarded_seq(F.size(s)),
            lambda p: F.when(p == F.lit(1), F.lit(True)).otherwise(
                F.element_at(s, p) != F.element_at(s, p - F.lit(1))
            ),
        ).alias("__starts"),
    )
    st = F.col("__starts")
    bounds = F.concat(st, F.array(F.size(s) + F.lit(1)))
    posting_structs = starts.select(
        F.col(id_col),
        F.inline_outer(
            F.transform(
                guarded_seq(F.size(st)),
                lambda j: F.struct(
                    F.element_at(s, F.element_at(st, j)).alias("token"),
                    (
                        F.element_at(bounds, j + F.lit(1)) - F.element_at(bounds, j)
                    ).cast("long").alias("tf"),
                ),
            )
        ),
    )
    return posting_structs.where(F.col("token").isNotNull())


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
    * each doc's Σ ln p is ``np.add.accumulate`` over its slice —
      sequential left-to-right by definition, the bit-identical
      addition sequence of the collect_list/window folds (0.0 + x1 ≡
      x1: ln p < 0, never -0.0). n_oov/n_tokens are exact integer
      reductions.

    Returns (id, __n, n_oov, __sum_lnp) — one row per input doc; the
    caller applies the shared nll/ppl arithmetic Spark-side so
    round/exp stay JVM-evaluated.
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = docs.sparkSession
    vocab_pdf = vocab.toPandas()
    # one driver-local row evaluates the OOV expression in the SAME
    # JVM fold Catalyst would have used for the join's coalesce side
    ln_oov = float(spark.range(1).select(ln_oov_expr.alias("v")).first()["v"])
    tok2lnp = dict(
        zip(vocab_pdf["__tok"].tolist(), vocab_pdf["__lnp"].tolist())
    )
    bc = spark.sparkContext.broadcast(tok2lnp)

    staged = docs.select(
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
            sums = np.zeros(len(counts), dtype=np.float64)
            for i in np.flatnonzero(counts):
                # accumulate is sequential by definition: the exact
                # ((x1+x2)+x3)+… fold the tier contract pins
                sums[i] = np.add.accumulate(flat_lnp[starts[i] : ends[i]])[-1]
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
    """:func:`~sdvg_spark.ops.corpus.unigram_nll` with a scale tier.

    ``n_docs`` (the tier probe) may be passed from parquet footer
    metadata / catalog stats to skip the plan-build count job. Below
    ``scale_min_docs`` this delegates verbatim; above it the model-fit
    side is restructured (value-identically — same N, V, tf integers,
    so the same lnp doubles) to remove the sf100 spill sources:

    * N = map-side Σ size(tokens) — no token-stream count aggregate;
    * the vocab tf aggregate reads RLE postings (input shrinks by the
      within-doc repetition factor and each partial-agg map key
      appears once per doc, not once per occurrence);
    * V = the persisted vocab aggregate's row count — no full-stream
      ``countDistinct`` partials. The collapsed (token, tf) table is
      persisted MEMORY_AND_DISK (recomputable, evictable) because V
      and the top-N cut both read it; callers running many fits per
      session can unpersist via the returned plan's sources or accept
      LRU eviction;
    * the per-doc scored fold (``scored_fold``, default ``"inrow"``)
      runs MAP-ONLY: an Arrow-batched kernel folds Σ ln p in-row
      against the broadcast ≤ top_n vocab — no posexplode, no
      (doc)-keyed exchange, no window sort. ``"window"`` keeps the
      r10 running-sum-window shape (one post-shuffle sort; its
      shuffle-write external sort was the residual 7.0 GB sf100 spill
      — SHUFFLE_r10 probe #3) as the fallback past ``_INROW_MAX_VOCAB``
      broadcast entries. Both perform the small tier's exact
      left-to-right addition sequence (bit-identical NLL floats,
      tier-test-pinned); the original collect_list fold's 128-group
      ObjectHashAggregate fallback was the 20.7 GB spill the r10 tier
      removed.
    """
    from sdvg_spark.ops.corpus import unigram_nll
    from sdvg_spark.ops.text import tokens

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

    n_total = int(
        docs.select(F.sum(F.size(_safe_tokens(text_col)))).first()[0] or 0
    )
    tokfreq = (
        rle_postings(docs, id_col, text_col)
        .groupBy("token")
        .agg(F.sum("tf").alias("__tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    v_total = tokfreq.count()  # materializes the cache AND is V
    denom = float(n_total) + alpha * (v_total + 1)
    vocab = (
        tokfreq.orderBy(F.desc("__tf"), F.asc("token"))
        .limit(top_n)
        .select(
            F.col("token").alias("__tok"),
            F.log((F.col("__tf") + F.lit(float(alpha))) / F.lit(denom)).alias("__lnp"),
        )
    )
    # scored tail, two formulations (value-identical — same addition
    # sequence; pinned by tests/test_vocab_tiers.py):
    #
    # * "inrow" (default): the Arrow-batched in-row fold — map-only, no
    #   posexplode, no (doc)-keyed exchange, no window sort. The sf100
    #   probe of the window formulation isolated its residual 7.0 GB
    #   memory spill to the shuffle-WRITE external sort of the
    #   (id, p, lnp) window input itself (SHUFFLE_r10 probe #3) — the
    #   positional-fold contract forces that exchange in ANY
    #   shuffle-based shape, so the fix is to never shuffle the token
    #   stream: the vocab is ≤ top_n rows and rides a broadcast.
    # * "window": a running-sum window over (id, p) — one post-shuffle
    #   sort, no collect_list buffers (whose 128-group
    #   ObjectHashAggregate fallback was the original 20.7 GB spill).
    #   Kept as the shuffle-based fallback and the tier tests' second
    #   witness.
    from pyspark.sql import Window

    ln_oov = F.log(F.lit(float(alpha)) / F.lit(denom))
    if scored_fold not in ("inrow", "window"):
        raise ValueError(f"scored_fold must be 'inrow' or 'window', got {scored_fold!r}")
    if scored_fold == "inrow" and min(top_n, v_total) > _INROW_MAX_VOCAB:
        # the broadcast dict is bounded by min(top_n, V) entries; past
        # the cap the lookup table stops being "small side" and the
        # shuffle-based window formulation is the safe shape
        scored_fold = "window"
    if scored_fold == "inrow":
        folded = _nll_inrow_scored(docs, id_col, text_col, vocab, ln_oov)
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
    w_ord = Window.partitionBy(id_col).orderBy("__p")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(id_col)
    scored = (
        tok_rows.join(F.broadcast(vocab), "__tok", "left")
        .select(
            id_col,
            "__p",
            F.coalesce(F.col("__lnp"), ln_oov).alias("__lnp"),
            F.col("__lnp").isNull().cast("long").alias("__oov"),
        )
        .select(
            id_col,
            F.sum("__lnp").over(w_run).alias("__sum_lnp"),
            F.sum("__oov").over(w_all).alias("n_oov"),
            F.count(F.lit(1)).over(w_all).alias("__n"),
            F.row_number().over(w_ord).alias("__rn"),
        )
        .where(F.col("__rn") == F.col("__n"))
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
    """:func:`~sdvg_spark.ops.corpus.dsir_logweights` with a scale
    tier. Below ``scale_min_docs`` (tier probe ``n_docs``, footer/
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
    from sdvg_spark.ops.corpus import dsir_logweights

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
        staged = df_.select(_safe_tokens(text_col).alias("__toks"))
        return (
            staged.select(F.explode("__toks").alias("__tok"))
            .select(bucket(F.col("__tok")).alias("__b"))
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias("__c"))
        )

    tgt = bucket_counts(target)
    raw = bucket_counts(docs)
    n_t = int(tgt.select(F.sum("__c")).first()[0] or 0)
    n_r = int(raw.select(F.sum("__c")).first()[0] or 0)
    if n_t == 0 or n_r == 0:
        raise ValueError("target and raw corpora must both contain tokens")
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
    import math

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
    staged = docs.select(
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
