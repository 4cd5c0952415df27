"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine.

Scale notes (the design constraint is ~100 TB of documents):

* Exact dedup is one shuffle on the content hash — the minimum possible.
* MinHash signatures are computed in a single shuffle-free pass per row
  with ``aggregate``/``zip_with`` higher-order expressions (no explode,
  no Python); only the tiny banded signature is shuffled for bucketing.
* Candidate verification is confined to LSH buckets, so the quadratic
  term is per-bucket, not global.
* The brute-force n-gram Jaccard pair join exists as the small-scale /
  oracle-checkable path; its candidate generation joins on a shared
  shingle (inverted index), never a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE61 = (1 << 61) - 1
MERSENNE31 = (1 << 31) - 1
_LONG_MAX = (1 << 63) - 1

_BYTE_SUFFIX = {
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
}


def _bytes_conf(spark, key: str, default: int) -> int:
    """Read a Spark byte-size conf as an int.

    ``spark.conf.get`` returns the *display* string — plain ints but
    also suffixed forms like ``"10485760b"`` (what a session that set
    the conf programmatically reads back) or ``"10MB"``. A bare
    ``int()`` parse raises on those and silently falls back, which made
    the simhash tier decision ignore the session's REAL threshold.
    Negative values pass through (``-1`` = broadcast disabled)."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:  # pragma: no cover - conf unreadable
        return default
    for suf in sorted(_BYTE_SUFFIX, key=len, reverse=True):
        if raw.endswith(suf):
            num = raw[: -len(suf)]
            break
    else:
        num, suf = raw, "b"
    try:
        return int(num) * _BYTE_SUFFIX[suf]
    except ValueError:  # pragma: no cover - unparseable form
        return default


def widen(df: DataFrame, min_bytes: int = 0) -> DataFrame:
    """Repartition up to cluster parallelism when the input is narrow.

    ``min_bytes``: skip the repartition when the plan-statistics size
    estimate is below this — for map stages whose per-byte cost is
    moderate, the extra exchange + 32-task stage overhead (~0.2 s
    local) exceeds the parallelization gain on tiny inputs, while a
    single-row-group input of a few MB still serializes seconds of
    work on one core and should widen. Callers with very expensive
    per-row expressions (full text-feature suites) keep the default 0.

    A small parquet input arrives as 1-2 partitions, which would run a
    whole shingle/signature/feature pipeline on one core; at real scale
    inputs are already wide and this is a no-op (no shuffle inserted —
    an unconditional ``repartition`` would re-shuffle a 100 TB corpus
    just in case). The partition probe reads the JVM plan directly:
    ``df.rdd`` would additionally build the Python-serializer RDD
    wrapper on every op call.

    Target = max(cluster parallelism, the session's configured shuffle
    width). The conf matters for EXPLODING map stages (simhash subset
    keys are a 200×+ row fan-out at corpus scale): with
    ``scale_shuffle_partitions`` sizing the conf to input bytes, the
    map tasks feeding the big exchange shrink with scale too —
    SHUFFLE_r07 measured the sf10 simhash spill coming from 32 map
    tasks each sort-spilling a ~170 MB shuffle write, not from the
    reduce side.
    """
    spark = df.sparkSession
    try:
        conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # pragma: no cover - non-numeric (auto) setting
        conf_parts = 0
    target = max(spark.sparkContext.defaultParallelism, conf_parts)
    parts = -1
    try:
        ep = df._jdf.queryExecution().executedPlan()
        if ep.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            # AQE plan (it contains an exchange): asking its RDD for a
            # partition count FINALIZES the plan — materializing every
            # upstream shuffle as a real Spark job whose output is NOT
            # reused by the later action (separate query executions
            # don't share exchanges). Measured on simhash: the probe
            # re-ran the full scan + shuffle write per invocation. The
            # pre-execution initialPlan's outputPartitioning answers
            # the only question widen has (did an upstream exchange
            # already provide >= target-way parallelism?) without
            # running anything. UnknownPartitioning reports 0 and
            # falls through to the RDD probe below.
            parts = int(ep.initialPlan().outputPartitioning().numPartitions())
            if parts >= target:
                return df
    except Exception:  # pragma: no cover - connect-style sessions
        parts = -1
    if parts < target:
        try:
            parts = df._jdf.rdd().getNumPartitions()
        except Exception:  # pragma: no cover - connect-style sessions
            parts = df.rdd.getNumPartitions()
    if parts >= target:
        return df
    if min_bytes > 0:
        try:
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:  # pragma: no cover - stats unavailable
            est = min_bytes  # unknown size: keep the widen
        if est < min_bytes:
            return df
    return df.repartition(target)


def char_shingles(text: Column, k: int = 5, lowercase: bool = True) -> Column:
    """Distinct character k-shingles of ``text`` as an array<string>.

    Whole-stage-codegen expression: sequence + transform + substring.
    Short texts (< k chars) yield the single truncated shingle.
    """
    t = F.lower(text) if lowercase else text
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(k))))


def word_shingles_from(words: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of a pre-split word array. Take this
    entry point (with the word array STAGED behind a projection
    boundary) when shingling a corpus: the slice lambda below defeats
    subexpression elimination, so an inlined split would re-split the
    document once per shingle."""
    n = F.greatest(F.size(words) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n - F.lit(1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + F.lit(1), k), " "))
    )


def word_shingles(text: Column, k: int = 3, lowercase: bool = True) -> Column:
    """Distinct word k-shingles (space-joined) as an array<string>."""
    t = F.lower(text) if lowercase else text
    return word_shingles_from(F.split(F.trim(t), r"\s+"), k)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two pre-distinct arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep one row per distinct ``cols`` content — the survivor is the
    row with the smallest ``id_col`` (deterministic under any partition
    layout). One hash-shuffle on the content columns; rows never move
    twice. At 100 TB: shuffle keyed on xxhash64(content) distributes
    uniformly, no skew unless the data is one giant duplicate class —
    AQE skew-join handles that.
    """
    w = Window.partitionBy(*[F.col(c) for c in cols]).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style paragraph-level dedup: split every document on
    ``sep``, keep only the FIRST corpus-wide occurrence of each
    paragraph (first = smallest ``(doc id, paragraph index)``), and
    reassemble each document from its surviving paragraphs — the step
    that strips boilerplate (headers, footers, cookie banners) shared
    across pages BEFORE document-level dedup ever sees them.

    One row per input document: ``(id, clean_text, n_paras, n_kept)``
    — ``clean_text`` is the ``sep``-joined survivors in original order
    ('' when every paragraph was someone else's), ``n_paras`` counts
    the document's non-empty paragraphs, ``n_kept`` the survivors.
    Empty/whitespace-only paragraphs are dropped on both sides of the
    comparison (they carry no content and would all "duplicate" each
    other).

    Scale shape: explode → ONE window partitioned by the paragraph
    text with ``row_number() <= 1`` directly above it — Spark rewrites
    that to WindowGroupLimit, so each map task pre-prunes to one
    candidate per paragraph before the shuffle and a hot boilerplate
    paragraph never concentrates its full occurrence list in one task
    — then one ``id``-keyed regroup to reassemble. Survivor choice is
    a pure function of content + ids (partition-layout independent).

    ``sep`` is a LITERAL string: it is regex-escaped before the split
    so it always means the same characters the reassembly joins with
    (``F.split`` treats its pattern as a Java regex — an unescaped
    ``sep='.'`` or ``'|'`` would split on everything/every position
    while the join and the DuckDB oracle treated it literally).
    """
    import re as _re

    paras = F.filter(
        F.split(F.col(text_col), _re.escape(sep)),
        lambda p: F.length(F.trim(p)) > 0,
    )
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(paras).alias("__idx", "__p"),
    )
    w = Window.partitionBy("__p").orderBy("__id", "__idx")
    kept = (
        exploded.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
    )
    out = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__p"))),
                lambda s: s["__p"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.size(paras).cast("long").alias("n_paras"),
    )
    return (
        base.join(out, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_paras",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def paragraph_dedup_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_sql: str = "text",
) -> str:
    """DuckDB mirror of :func:`paragraph_dedup` (sep = newline)."""
    return f"""
WITH d AS (SELECT {id_col} AS id, ({text_sql}) AS t FROM {table}),
p0 AS (SELECT id, list_filter(
         list_transform(range(1, len(string_split(t, chr(10))) + 1),
           i -> {{'idx': i, 'para': string_split(t, chr(10))[i]}}),
         s -> length(trim(s.para)) > 0) AS ps FROM d),
e AS (SELECT id, unnest(ps) AS s FROM p0),
r AS (SELECT id, s.idx AS idx, s.para AS para,
        row_number() OVER (PARTITION BY s.para ORDER BY id, s.idx) AS rn
      FROM e),
k AS (SELECT id, string_agg(para, chr(10) ORDER BY idx) AS clean_text,
        count(*) AS n_kept
      FROM r WHERE rn = 1 GROUP BY id)
SELECT p0.id AS {id_col},
  coalesce(k.clean_text, '') AS clean_text,
  len(p0.ps)::BIGINT AS n_paras,
  coalesce(k.n_kept, 0)::BIGINT AS n_kept
FROM p0 LEFT JOIN k ON p0.id = k.id"""


def incremental_exact_dedup(
    new_df: DataFrame,
    seen_hashes: DataFrame,
    cols: list[str],
    id_col: str,
    *,
    hash_col: str = "content_hash",
) -> DataFrame:
    """Dedup an INCREMENT against an existing corpus: keep a new row iff
    it is (a) the smallest-id row of its content within the batch and
    (b) its content hash is absent from ``seen_hashes`` — the
    production shape for adding a crawl/snapshot to a deduplicated
    100 TB corpus without rescanning it.

    ``seen_hashes`` is the store of previously-admitted content hashes
    (one ``hash_col`` sha256-hex column; persist it bucketed by the
    hash so every increment's anti-join is co-located). Output = the
    admitted rows PLUS their ``hash_col`` — append it to the store for
    the next increment.

    Plan shape: one content shuffle for the within-batch survivor
    window, then a LEFT ANTI join against the store — batch-sized, not
    corpus-sized, work; the full corpus is only ever touched through
    its 32-byte-per-doc hash column.
    """
    h = F.sha2(F.concat_ws("\x1f", *[F.col(c) for c in cols]), 256)
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    batch_first = (
        new_df.withColumn(hash_col, h)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    store = seen_hashes.select(F.col(hash_col))
    return batch_first.join(store, hash_col, "left_anti")


def sql_incremental_exact_dedup(
    *,
    new_sql: str,
    seen_sql: str,
    cols: list[str],
    id_col: str,
    hash_col: str = "content_hash",
) -> str:
    """DuckDB mirror of :func:`incremental_exact_dedup` — same sha256
    over the same 0x1f-joined content, same min-id batch survivor, same
    anti-join (NOT EXISTS) against the seen-hash store."""
    content = f"concat_ws(chr(31), {', '.join(cols)})"
    return f"""
WITH newb AS ({new_sql}),
seen AS ({seen_sql}),
hashed AS (
  SELECT *, sha256({content}) AS {hash_col},
    row_number() OVER (PARTITION BY sha256({content}) ORDER BY {id_col}) AS __rn
  FROM newb)
SELECT * EXCLUDE (__rn) FROM hashed
WHERE __rn = 1
  AND NOT EXISTS (SELECT 1 FROM seen WHERE seen.{hash_col} = hashed.{hash_col})"""


def duplicate_classes(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """All rows annotated with their duplicate-class representative
    (min id over rows sharing ``cols``) and the class size."""
    w = Window.partitionBy(*[F.col(c) for c in cols])
    return df.withColumn("class_rep", F.min(id_col).over(w)).withColumn(
        "class_size", F.count(F.lit(1)).over(w)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def _hash_params(n_hashes: int, seed: int) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) parameter lists for the universal hash family
    h_i(x) = (a_i * x + b_i) mod 2^31-1, derived from a seed via
    SplitMix64 (driver-side numpy; a != 0). 31-bit field keeps a*x in
    signed-long range — ONE multiply per hash in codegen."""
    import numpy as np

    from sdvg_spark.core.rng import splitmix64_np

    ks = np.arange(n_hashes * 2, dtype=np.uint64) + np.uint64(seed)
    h = splitmix64_np(ks) % np.uint64(MERSENNE31)
    a = (h[:n_hashes] | np.uint64(1)).tolist()  # odd, nonzero
    b = h[n_hashes:].tolist()
    return [int(x) for x in a], [int(x) for x in b]


def minhash_signature(
    shingles: Column, n_hashes: int = 128, seed: int = 42
) -> Column:
    """MinHash signature (array<bigint> of length ``n_hashes``) in one
    shuffle-free pass: a running elementwise-min ``aggregate`` over the
    shingle array, ``zip_with(acc, hashes(s), least)``.

    The per-shingle 64-bit base hash is ``xxhash64`` (JVM native); the
    family is (a*x+b) mod 2^31-1 on the folded base hash — a, b, x
    < 2^31 so the product fits a signed long with one multiply.

    NOTE: prefer :func:`minhash_signature_agg` — Spark evaluates
    higher-order lambdas interpreted, so this one-pass form costs
    |shingles|*n_hashes interpreted ops per row.
    """
    a_arr, b_arr = _hash_params(n_hashes, seed)
    A = F.lit(a_arr)
    B = F.lit(b_arr)
    p = F.lit(MERSENNE31)

    def hashes_of(s: Column) -> Column:
        x = F.pmod(F.xxhash64(s), p)
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda i: F.pmod(F.element_at(A, i + F.lit(1)) * x + F.element_at(B, i + F.lit(1)), p),
        )

    init = F.array_repeat(F.lit(_LONG_MAX), n_hashes)
    return F.aggregate(
        shingles, init, lambda acc, s: F.zip_with(acc, hashes_of(s), lambda a, b: F.least(a, b))
    )


def minhash_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: array of ``bands`` hashes, one per contiguous
    ``rows_per_band`` slice (banding for LSH bucketing)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(",", F.transform(F.slice(sig, b * F.lit(rows_per_band) + F.lit(1), rows_per_band), lambda v: v.cast("string"))),
            b,
        ),
    )


def minhash_signature_agg(
    base: DataFrame, n_hashes: int, seed: int
) -> DataFrame:
    """MinHash signatures via explode + ``n_hashes`` min-aggregates.

    Spark's higher-order lambdas (aggregate/zip_with) are interpreted,
    not codegen'd — the one-pass :func:`minhash_signature` burns CPU at
    |shingles|×n_hashes interpreted ops per row. This variant exploses
    shingles and lets hash-aggregate codegen do the mins. Map-side
    partial aggregation collapses each doc inside its input partition,
    so the shuffle carries ONE row per document (n_hashes longs), not
    the shingle set — this is the 100 TB path.

    Input: (__id, __sh array<string>); output: (__id, __sig).
    """
    a_arr, b_arr = _hash_params(n_hashes, seed)
    p = F.lit(MERSENNE31)
    # project the base hash once so the 128 aggregates share it
    inv = base.select("__id", F.explode("__sh").alias("__s")).select(
        "__id", F.pmod(F.xxhash64(F.col("__s")), p).alias("__x")
    )
    x = F.col("__x")
    aggs = [
        F.min(F.pmod(F.lit(a_arr[i]) * x + F.lit(b_arr[i]), p)).alias(f"__h{i}")
        for i in range(n_hashes)
    ]
    sig = inv.groupBy("__id").agg(*aggs)
    return sig.select(
        "__id", F.array(*[F.col(f"__h{i}") for i in range(n_hashes)]).alias("__sig")
    )


def minhash_band_store(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    n_hashes: int = 128,
    bands: int = 32,
    seed: int = 42,
) -> DataFrame:
    """(id, band, bhash) — the persisted LSH index of a deduplicated
    corpus, the artifact :func:`incremental_minhash_dedup` probes so an
    increment never re-signatures the corpus. ~24 B × ``bands`` per doc
    (vs the corpus text itself); write it bucketed by (band, bhash)
    (``sinks/bucketed.py``) so every increment's candidate join is
    co-located, and append the admitted docs' rows after each batch.
    """
    staged = widen(df).select(
        F.col(id_col).alias("__id"), F.lower(F.col(text_col)).alias("__in")
    )
    shingled = staged.select(
        "__id", char_shingles(F.col("__in"), shingle_k, lowercase=False).alias("__sh")
    )
    sigs = minhash_signature_agg(shingled, n_hashes, seed)
    return sigs.select(
        F.col("__id").alias(id_col),
        F.posexplode(
            minhash_bands(F.col("__sig"), bands, n_hashes // bands)
        ).alias("band", "bhash"),
    )


def incremental_minhash_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    store: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    n_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """NEAR-duplicate increment admission — the fuzzy sibling of
    :func:`incremental_exact_dedup`: a new doc is admitted iff it has
    no exact-verified near-duplicate (Jaccard ≥ ``threshold``) in the
    existing corpus AND no smaller-id near-duplicate within the batch.

    One row per batch doc: (id, drop_reason, admitted) with
    ``drop_reason`` ∈ ('corpus', 'batch', NULL) — corpus wins when
    both apply. The decision is a pure function of exact Jaccard, so a
    plain SQL join is a value-exact oracle whenever the banding's
    candidate recall holds (same bimodal-corpus argument as
    ``dedup_minhash``: miss probability ≤ (1-s^r)^b per true pair,
    every candidate exact-verified — no false positives ever).

    Scale shape (the incremental contract): the corpus is touched only
    through ``store`` — its pre-built (id, band, bhash) index
    (:func:`minhash_band_store`, bucketed ⇒ co-located probe) — and
    through point lookups of CANDIDATE docs' text for exact
    verification. At a production threshold candidates are
    batch-sized, so signatures, the store probe, and verification are
    all increment-scale work; the 100 TB corpus is never rescanned.
    ``new_df``/``corpus_df`` carry (id, text); band params must match
    the store's by contract. The batch shingle projection stays
    ``persist()``-ed for the lifetime of the returned plan (it feeds
    signatures and both verification legs) — increment-scale blocks,
    released with the returned reference.
    """
    rows_per_band = n_hashes // bands

    def sh_of(df_: DataFrame, idc: str) -> DataFrame:
        staged = widen(df_).select(
            F.col(id_col).alias(idc), F.lower(F.col(text_col)).alias("__in")
        )
        return staged.select(
            idc, char_shingles(F.col("__in"), shingle_k, lowercase=False).alias("__sh")
        )

    new_sh = sh_of(new_df, "__nid").persist()
    sigs = minhash_signature_agg(
        new_sh.select(F.col("__nid").alias("__id"), "__sh"), n_hashes, seed
    )
    nb = sigs.select(
        F.col("__id").alias("__nid"),
        F.posexplode(
            minhash_bands(F.col("__sig"), bands, rows_per_band)
        ).alias("band", "bhash"),
    )

    # corpus candidates: store probe -> distinct (new, corpus) pairs ->
    # point-fetch candidate corpus text -> exact verify
    cand = (
        nb.join(
            store.select(F.col(id_col).alias("__cid"), "band", "bhash"),
            ["band", "bhash"],
        )
        .select("__nid", "__cid")
        .dropDuplicates(["__nid", "__cid"])
    )
    corp_sh = sh_of(
        corpus_df.join(
            cand.select(F.col("__cid").alias(id_col)).distinct(), id_col
        ),
        "__cid",
    ).withColumnRenamed("__sh", "__csh")
    corpus_hit = (
        cand.join(new_sh, "__nid")
        .join(corp_sh, "__cid")
        .where(jaccard(F.col("__sh"), F.col("__csh")) >= F.lit(threshold))
        .select("__nid")
        .distinct()
        .withColumn("__corpus_dup", F.lit(True))
    )

    # within-batch: banded self-join, keep only (smaller -> larger),
    # exact verify, drop the larger side
    bleft = nb.select(F.col("__nid").alias("__ida"), "band", "bhash")
    bright = nb.select(F.col("__nid").alias("__idb"), "band", "bhash")
    bpairs = (
        bleft.join(bright, ["band", "bhash"])
        .where(F.col("__ida") < F.col("__idb"))
        .select("__ida", "__idb")
        .dropDuplicates(["__ida", "__idb"])
    )
    batch_hit = (
        bpairs.join(new_sh.select(F.col("__nid").alias("__ida"), "__sh"), "__ida")
        .join(
            new_sh.select(F.col("__nid").alias("__idb"), F.col("__sh").alias("__shb")),
            "__idb",
        )
        .where(jaccard(F.col("__sh"), F.col("__shb")) >= F.lit(threshold))
        .select(F.col("__idb").alias("__nid"))
        .distinct()
        .withColumn("__batch_dup", F.lit(True))
    )

    out = (
        new_df.select(F.col(id_col).alias("__nid"))
        .join(corpus_hit, "__nid", "left")
        .join(batch_hit, "__nid", "left")
        .select(
            F.col("__nid").alias(id_col),
            F.when(F.col("__corpus_dup"), "corpus")
            .when(F.col("__batch_dup"), "batch")
            .alias("drop_reason"),
        )
        .withColumn("admitted", F.col("drop_reason").isNull())
    )
    return out


def sql_incremental_minhash_dedup(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_filter: str,
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> str:
    """DuckDB mirror of :func:`incremental_minhash_dedup` with batch =
    rows matching ``batch_filter`` and corpus = the rest — exact
    Jaccard on both legs (the banding is recall-certain on this
    corpus and candidates are exact-verified, so the decisions
    coincide)."""
    k = int(shingle_k)
    sh = (
        f"list_distinct(list_transform(range(1, greatest(length(lower({text_col}))-{k-1}, 1)+1), "
        f"i -> substr(lower({text_col}), i, {k})))"
    )
    jac = (
        "len(list_intersect(a.s, b.s))::DOUBLE"
        " / (len(a.s)+len(b.s)-len(list_intersect(a.s, b.s)))::DOUBLE"
    )
    return f"""
WITH sh AS (SELECT {id_col} AS id, ({batch_filter}) AS is_batch, {sh} AS s
            FROM {table}),
chit AS (SELECT a.id FROM sh a JOIN sh b ON NOT b.is_batch AND {jac} >= {threshold}
         WHERE a.is_batch GROUP BY a.id),
bhit AS (SELECT a.id FROM sh a JOIN sh b
           ON b.is_batch AND b.id < a.id AND {jac} >= {threshold}
         WHERE a.is_batch GROUP BY a.id)
SELECT sh.id AS {id_col},
  CASE WHEN chit.id IS NOT NULL THEN 'corpus'
       WHEN bhit.id IS NOT NULL THEN 'batch' END AS drop_reason,
  (chit.id IS NULL AND bhit.id IS NULL) AS admitted
FROM sh LEFT JOIN chit ON sh.id = chit.id
        LEFT JOIN bhit ON sh.id = bhit.id
WHERE sh.is_batch"""


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    n_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    seed: int = 42,
    use_word_shingles: bool = False,
    est_margin: float = 0.1,
    mode: str = "auto",
    broadcast_max_bytes: int = 200_000_000,
    est_chars: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact-verified Jaccard ≥
    threshold) via MinHash-LSH.

    Pipeline: signatures via codegen'd min-aggregates (one shuffled row
    per doc) → explode only the ``bands`` band-hashes → self-join on
    (band, band_hash) → distinct candidate pairs → **two-tier verify**:

    1. signature estimate — fraction of equal minhash components ≈
       Jaccard (σ = √(s(1-s)/n_hashes) ≈ 0.04 at n=128); pairs below
       ``threshold - est_margin`` (≈2σ) are dropped without ever
       touching the shingle arrays;
    2. exact Jaccard on the shingle sets for the survivors only.

    At a low threshold the band filter floods (e.g. 0.4 with b=32,r=4
    admits ~4% of ALL pairs), so verification must never be per-pair
    joins of heavyweight arrays. Two physical strategies, chosen like
    Spark chooses broadcast-vs-shuffle joins:

    * ``broadcast``: the signature matrix (n_docs × n_hashes int64) and
      xxhash64'd shingle sets ride one broadcast; a single
      ``mapInPandas`` pass over the candidate pairs does the numpy
      estimate filter AND the exact set intersection — zero extra
      shuffles.
    * ``join`` (cluster-scale corpus): estimate via zip_with on a
      signature equi-join, then exact verification joining shingle
      arrays for near-threshold survivors only.

    ``mode="auto"`` picks the tier from a BYTE estimate, not a row
    count: one column-pruned scan of ``sum(length(text))`` bounds the
    driver-side shingle-hash footprint at 8 bytes per character
    (distinct shingles ≤ characters), and the broadcast tier engages
    only below ``broadcast_max_bytes`` (default 200 MB — a 16 GB
    surprise at 2M × 1k-shingle docs is exactly what a row cap allows).
    Callers at known scale pass ``mode`` explicitly and skip the
    estimate job entirely.
    """
    rows_per_band = n_hashes // bands
    # stage the per-window-referenced input (lowered text / word array)
    # behind a projection boundary: the shingle lambdas defeat
    # subexpression elimination, so inlining would re-lower/re-split
    # the document once per shingle (O(len^2) per doc)
    if use_word_shingles:
        staged = widen(df).select(
            F.col(id_col).alias("__id"),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__in"),
        )
        sh = word_shingles_from(F.col("__in"), 3)
    else:
        staged = widen(df).select(
            F.col(id_col).alias("__id"),
            F.lower(F.col(text_col)).alias("__in"),
        )
        sh = char_shingles(F.col("__in"), shingle_k, lowercase=False)
    shingled = staged.select("__id", sh.alias("__sh"))
    if mode == "auto":
        if est_chars is None:
            est = df.select(F.sum(F.length(F.col(text_col))).alias("c")).first()
            est_chars = int(est["c"] or 0)
        # est_chars: caller-supplied character bound (e.g. the text
        # column's uncompressed parquet-footer bytes — an upper bound on
        # characters, driver-side metadata only) skips the sizing scan.
        est_bytes = 8 * est_chars
        mode = "broadcast" if est_bytes <= broadcast_max_bytes else "join"
    if mode == "broadcast":
        return _minhash_pairs_broadcast(
            shingled,
            n_hashes=n_hashes,
            bands=bands,
            rows_per_band=rows_per_band,
            threshold=threshold,
            est_margin=est_margin,
            seed=seed,
        )
    sigs = minhash_signature_agg(shingled, n_hashes, seed)
    from pyspark import StorageLevel

    # both subtrees feed multiple joins; avoid recomputing them.
    # DISK_ONLY, deliberately: these blocks live until the returned
    # plan is garbage-collected, and MEMORY_AND_DISK residency was
    # measured (sf100 probe) stealing unified memory from every LATER
    # query in the session — a subsequent paragraph_dedup's map sort
    # spilled 312 MB purely from this op's pinned blocks. The tables
    # are re-read cold exactly once per downstream join, and at corpus
    # scale (TBs of shingles) memory residency was never realistic.
    shingled = shingled.persist(StorageLevel.DISK_ONLY)
    sigs = sigs.persist(StorageLevel.DISK_ONLY)
    # band hashes only — shingle arrays do NOT ride through the self-join
    banded = sigs.select(
        "__id",
        F.posexplode(minhash_bands(F.col("__sig"), bands, rows_per_band)).alias(
            "__band", "__bhash"
        ),
    )
    left = banded.select(F.col("__id").alias("id_a"), "__band", "__bhash")
    right = banded.select(F.col("__id").alias("id_b"), "__band", "__bhash")
    cand = (
        left.join(right, ["__band", "__bhash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    # tier 1: estimate from signatures (one row of n_hashes longs per doc)
    #
    # The attach joins carry WIDE payloads (1 KB signature rows here,
    # multi-KB shingle arrays below). As sort-merge joins their sorts
    # buffer those payloads per task and spilled 5.7 GB at the sf100
    # probe; a shuffle-hash join instead hash-builds the hinted side
    # PER PARTITION (5M sigs / 1062 partitions ≈ 5 MB per task) and
    # STREAMS the wide rows — no sort, no payload buffering, same
    # output. Build sides are chosen so the per-task hash map is always
    # the bounded one: the doc-keyed tables (one row per doc) build,
    # the pair stream streams — except the first shingle join, where
    # the post-estimate pair list is the smallest relation of all.
    sig_a = sigs.select(F.col("__id").alias("id_a"), F.col("__sig").alias("__siga"))
    sig_b = sigs.select(F.col("__id").alias("id_b"), F.col("__sig").alias("__sigb"))
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("__siga"), F.col("__sigb"), lambda a, b: a == b),
                lambda eq: eq,
            )
        ).cast("double")
        / n_hashes
    )
    near = (
        cand.join(sig_a.hint("shuffle_hash"), "id_a")
        .join(sig_b.hint("shuffle_hash"), "id_b")
        .where(est >= F.lit(threshold - est_margin))
        .select("id_a", "id_b")
    )
    # tier 2: exact verification joins the arrays for survivors only
    sh_a = shingled.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
    sh_b = shingled.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
    return (
        near.hint("shuffle_hash").join(sh_a, "id_a")
        .join(sh_b.hint("shuffle_hash"), "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def _minhash_pairs_broadcast(
    shingled: DataFrame,
    *,
    n_hashes: int,
    bands: int,
    rows_per_band: int,
    threshold: float,
    est_margin: float,
    seed: int,
) -> DataFrame:
    """Small-corpus strategy: ONE distributed pass, everything else on
    the driver in numpy — the analogue of a broadcast join's
    build-side-fits decision.

    The only cluster work is shingling + per-shingle ``xxhash64``
    (executors own the heavy text scan); the sorted hash sets arrive as
    one Arrow transfer. Signatures (``minimum.reduceat`` over the same
    (a·x+b) mod 2^31-1 family the join tier uses), band bucketing
    (lexsort + group boundaries), the signature-estimate filter, and the
    exact set intersections are all vectorized driver work — for corpora
    under ``broadcast_max_docs`` this removes three shuffles, a
    re-evaluated shingle pipeline, and a 128-aggregate job that together
    dominate wall-clock. Shingles compare by 64-bit hash — collision
    odds ~(shingles²)/2^64, immaterial for dedup semantics.
    """
    import numpy as np
    import pandas as pd

    from sdvg_spark.core.rng import splitmix64_np

    spark = shingled.sparkSession
    hashed = shingled.select(
        "__id",
        F.array_sort(F.transform(F.col("__sh"), lambda s: F.xxhash64(s))).alias("__hs"),
    )
    # Signatures and band hashes are computed on the EXECUTORS (one
    # mapInArrow pass over the widened shingle table): the 128-hash
    # minimum.reduceat sweep was the single largest cost of this tier
    # when it ran on the driver — a serial pass over every shingle hash
    # of the corpus × n_hashes. The kernel is the exact same integer
    # arithmetic ((a·x+b) mod 2^31−1 minima, SplitMix64 band chains), so
    # signature values are bit-identical; the driver keeps only the
    # bucket grouping, the estimate filter and the exact verification.
    a_arr, b_arr = _hash_params(n_hashes, seed)

    def sig_kernel(batches):
        import pyarrow as pa

        from sdvg_spark.core.rng import splitmix64_np

        for b in batches:
            ids_a = b.column(0)
            hs = b.column(1)
            n = len(ids_a)
            if n == 0:
                continue
            counts = hs.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
            flat = (
                hs.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
            )
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            x = np.mod(flat, MERSENNE31)
            sig = np.empty((n, n_hashes), dtype=np.int64)
            for i in range(n_hashes):
                sig[:, i] = np.minimum.reduceat(
                    (a_arr[i] * x + b_arr[i]) % MERSENNE31, starts
                )
            usig = sig.view(np.uint64)
            bh = np.empty((n, bands), dtype=np.uint64)
            for bi in range(bands):
                acc = np.full(n, 0x9E3779B97F4A7C15 ^ bi, dtype=np.uint64)
                for r in range(rows_per_band):
                    acc = splitmix64_np(acc ^ usig[:, bi * rows_per_band + r])
                bh[:, bi] = acc
            sig_off = pa.array(
                np.arange(0, (n + 1) * n_hashes, n_hashes, dtype=np.int32)
            )
            bh_off = pa.array(np.arange(0, (n + 1) * bands, bands, dtype=np.int32))
            yield pa.RecordBatch.from_arrays(
                [
                    ids_a,
                    hs,
                    pa.ListArray.from_arrays(
                        sig_off, pa.array(sig.ravel(), type=pa.int64())
                    ),
                    pa.ListArray.from_arrays(
                        bh_off, pa.array(bh.ravel().view(np.int64), type=pa.int64())
                    ),
                ],
                names=["__id", "__hs", "__sig", "__bh"],
            )

    sig_df = hashed.mapInArrow(
        sig_kernel,
        "__id long, __hs array<long>, __sig array<long>, __bh array<long>",
    )
    pdf = sig_df.toPandas()  # Arrow-batched: arrays land as numpy, not boxed rows
    ids = pdf["__id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    sets = pdf["__hs"].to_numpy()[order]
    n_docs = len(ids)
    empty = pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64"),
        }
    )
    if n_docs == 0:
        return spark.createDataFrame(empty, "id_a long, id_b long, jaccard double")
    lens = np.fromiter((len(s) for s in sets), count=n_docs, dtype=np.int64)
    sh_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=sh_off[1:])
    sh_flat = np.concatenate(sets) if n_docs else np.empty(0, dtype=np.int64)
    sh_flat = sh_flat.astype(np.int64, copy=False)
    sig_mat = np.stack(pdf["__sig"].to_numpy()[order]).astype(np.int64, copy=False)
    bhash = np.stack(pdf["__bh"].to_numpy()[order]).astype(np.int64).view(np.uint64)

    # bucket grouping: one sort of the (band, bhash) keys; same-bucket
    # runs become candidate groups
    band_idx = np.tile(np.arange(bands, dtype=np.int64), n_docs)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), bands)
    keys = bhash.ravel() ^ splitmix64_np(band_idx.view(np.uint64))
    srt = np.argsort(keys, kind="stable")
    keys_s, docs_s = keys[srt], doc_idx[srt]
    boundary = np.flatnonzero(np.concatenate(([True], keys_s[1:] != keys_s[:-1], [True])))
    pair_a: list[np.ndarray] = []
    pair_b: list[np.ndarray] = []
    tri_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for g in range(len(boundary) - 1):
        lo, hi = boundary[g], boundary[g + 1]
        m = hi - lo
        if m < 2:
            continue
        tri = tri_cache.get(m)
        if tri is None:
            tri = np.triu_indices(m, k=1)
            tri_cache[m] = tri
        members = docs_s[lo:hi]
        pair_a.append(members[tri[0]])
        pair_b.append(members[tri[1]])
    if not pair_a:
        return spark.createDataFrame(empty, "id_a long, id_b long, jaccard double")
    ia = np.concatenate(pair_a)
    ib = np.concatenate(pair_b)
    swap = ia > ib
    ia[swap], ib[swap] = ib[swap], ia[swap]
    keep = ia != ib
    ia, ib = ia[keep], ib[keep]
    uniq = np.unique(ia * np.int64(n_docs) + ib)
    ia, ib = uniq // n_docs, uniq % n_docs

    # tier 1: signature estimate filter. Per-hash column loop, NOT
    # sig_mat[ia] gathers — the full (n_pairs, n_hashes) gather would be
    # a fresh multi-hundred-MB allocation, and on hosts with slow
    # first-touch memory (this one faults fresh pages at ~7 MB/s) that
    # single line costs minutes; the per-column temporaries are a few MB
    # and get recycled by malloc after the first iteration.
    eq_cnt = np.zeros(len(ia), dtype=np.int32)
    for i in range(n_hashes):
        col = sig_mat[:, i]
        eq_cnt += col[ia] == col[ib]
    est = eq_cnt / n_hashes
    near = np.flatnonzero(est >= threshold - est_margin)
    # tier 2: exact Jaccard on the surviving pairs only
    out_a, out_b, out_j = [], [], []
    for k in near:
        da, db = ia[k], ib[k]
        sa = sh_flat[sh_off[da] : sh_off[da + 1]]
        sb = sh_flat[sh_off[db] : sh_off[db + 1]]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            out_a.append(ids[da])
            out_b.append(ids[db])
            out_j.append(j)
    result = pd.DataFrame(
        {
            "id_a": pd.Series(out_a, dtype="int64"),
            "id_b": pd.Series(out_b, dtype="int64"),
            "jaccard": pd.Series(out_j, dtype="float64"),
        }
    )
    return spark.createDataFrame(
        result if len(result) else empty, "id_a long, id_b long, jaccard double"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """ALL pairs with n-gram Jaccard ≥ threshold — exact, via an
    inverted-index join (pairs must share ≥1 shingle; sound because
    threshold > 0). The small-scale / oracle-checkable path; for
    100 TB use :func:`minhash_lsh_pairs`.
    """
    base = (
        # staged lowering: char_shingles' substr lambda would otherwise
        # re-lower the document once per shingle (O(len^2) per doc)
        widen(df)
        .select(F.col(id_col).alias("__id"), F.lower(F.col(text_col)).alias("__lt"))
        .select(
            "__id", char_shingles(F.col("__lt"), shingle_k, lowercase=False).alias("__sh")
        )
    )
    inv = base.select("__id", F.explode("__sh").alias("__s"))
    # |A ∩ B| directly from the inverted index: shingles are distinct
    # per doc, so the co-occurrence count of a pair IS the intersection
    # size. No shingle arrays ever cross a join.
    shared = (
        inv.alias("a")
        .join(inv.alias("b"), "__s")
        .where(F.col("a.__id") < F.col("b.__id"))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    sizes = base.select("__id", F.size("__sh").alias("__n"))
    sz_a = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    sz_b = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        shared.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("__shared").cast("double")
            / (F.col("__na") + F.col("__nb") - F.col("__shared")).cast("double"),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash


def simhash(text: Column, token_pattern: str = r"\s+") -> Column:
    """64-bit SimHash of the token multiset — one shuffle-free pass.

    Per token, xxhash64 contributes ±1 to each of 64 bit-position
    counters (``aggregate`` + ``zip_with``); the sign vector reassembles
    into a long. Hamming-near SimHashes ⇒ near-duplicate texts.
    """
    tokens = F.split(F.trim(F.lower(text)), token_pattern)
    init = F.array_repeat(F.lit(0), 64)
    # bit masks as Python literals (bit 63 via two's complement)
    masks = [F.lit(1 << b if b < 63 else -(1 << 63)).cast("long") for b in range(64)]

    def contrib(t: Column) -> Column:
        h = F.xxhash64(t)
        return F.array(
            *[F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)) for m in masks]
        )

    counters = F.aggregate(
        tokens, init, lambda acc, t: F.zip_with(acc, contrib(t), lambda a, b: a + b)
    )
    # reassemble MSB-first with a doubling fold: acc = acc*2 + sign-bit
    # (the *2 wraps at bit 63 — ANSI off, two's complement)
    return F.aggregate(
        F.reverse(counters),
        F.lit(0).cast("long"),
        lambda acc, c: acc * F.lit(2) + F.when(c > 0, F.lit(1)).otherwise(F.lit(0)),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(__id, __sim): 64-bit SimHash per row via a vectorized Arrow
    kernel — map-only, no shuffle, fully distributed.

    The expression-based :func:`simhash` builds 64 interpreted CASE
    branches per token; at scan scale that burns ~100× the CPU of this
    batch kernel (``unpackbits`` → ``add.reduceat`` per-doc bit
    counters, ``packbits`` reassembly). Token hash is the first 8 bytes
    (big-endian) of md5 — any deterministic 64-bit hash serves SimHash,
    and this one is reproducible in plain SQL
    (``('0x' || substr(md5(tok),1,16))::UBIGINT``), which is what makes
    the operator oracle-checkable end-to-end.
    """
    import numpy as np
    import pandas as pd

    # (the single widen lives in the return chain below — per-token
    # Python md5 is heavy; never run it on one core. A second widen
    # call here used to re-probe the already-exchanged plan, which
    # finalized AQE and re-ran the scan+shuffle as a wasted job.)

    def kernel(batches):
        import hashlib

        # md5 per token OCCURRENCE is the kernel's dominant cost, but
        # Heaps' law makes most occurrences repeats — memoize per
        # distinct token (task-lifetime dict, ~1 µs md5+encode vs
        # ~50 ns hit). Values are identical by md5 determinism. The
        # cap bounds task memory at scale (~1M entries ≈ tens of MB;
        # a clear only re-pays md5, never changes values).
        tok_cache: dict = {}
        _md5 = hashlib.md5
        _from_bytes = int.from_bytes

        def _htok(t, _c=tok_cache):
            v = _c.get(t)
            if v is None:
                if len(_c) > 1_000_000:
                    _c.clear()
                v = _from_bytes(_md5(t.encode("utf-8")).digest()[:8], "big")
                _c[t] = v
            return v

        for pdf in batches:
            texts = pdf[text_col]
            n = len(texts)
            if n == 0:
                continue
            tok_lists = [str(t).lower().split() for t in texts]
            lens = np.fromiter((len(t) for t in tok_lists), count=n, dtype=np.int64)
            sims = np.zeros(n, dtype=np.uint64)
            nonempty = np.flatnonzero(lens > 0)
            if len(nonempty):
                flat = [tok for i in nonempty for tok in tok_lists[i]]
                h = np.fromiter(
                    (_htok(t) for t in flat),
                    count=len(flat),
                    dtype=np.uint64,
                )
                # (n_tokens, 64) ±1 contributions, summed per doc
                bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1)
                contrib = bits.astype(np.int32) * 2 - 1
                off = np.zeros(len(nonempty), dtype=np.int64)
                np.cumsum(lens[nonempty][:-1], out=off[1:])
                counters = np.add.reduceat(contrib, off, axis=0)
                sim_bits = (counters > 0).astype(np.uint8)
                packed = np.packbits(sim_bits, axis=1)
                sims[nonempty] = packed.view(np.uint64).ravel()
            yield pd.DataFrame(
                {
                    "__id": pdf[id_col].to_numpy(dtype=np.int64),
                    "__sim": sims.view(np.int64),
                }
            )

    # null texts carry no signal: drop them (matching the expression
    # path, whose NULL simhash never joined) instead of stringifying
    # None into a shared "none" token that would make every null-text
    # doc an exact duplicate of the others
    return (
        widen(df)
        .select(id_col, text_col)
        .where(F.col(text_col).isNotNull())
        .mapInPandas(kernel, "__id long, __sim long")
    )


def _simhash_blocking(n: int, max_distance: int, max_keys: int = 256) -> int:
    """Pick the SimHash block count for a corpus of ``n`` docs.

    With ``b`` blocks and subset size ``r = b - max_distance``, the
    pigeonhole principle guarantees every pair within ``max_distance``
    shares ALL blocks of at least one r-subset — full recall for ANY
    ``b ≥ max_distance + 1`` (Manku et al.'s web-crawl near-dup
    scheme). Since the final Hamming filter then makes the OUTPUT
    invariant to ``b``, the block count is a pure cost knob:

    - explode cost: C(b, r) keys per doc (linear, map-side);
    - random-background candidates: ~C(b, r) · n² / 2^key_bits.

    Pick the smallest ``b`` whose expected background stays ≤ 10·n
    (candidate volume linear in the corpus — the fixed 16-bit-quarter
    scheme measured 17.9× shuffle growth on 9.3× input at sf1), capped
    at C(b, r) ≤ ``max_keys`` so the exploded key array stays a sane
    codegen size. Falls back to the largest capped config when even it
    misses the target (background then grows quadratically again, but
    never worse than a narrower key)."""
    from math import comb

    if max_distance >= 16:
        raise ValueError("max_distance must be < 16 (64-bit signature, >=4-bit blocks)")
    last = max_distance + 1
    for b in range(max_distance + 1, 17):
        r = b - max_distance
        if comb(b, r) > max_keys:
            break
        last = b
        widths = [64 // b + (1 if i < 64 % b else 0) for i in range(b)]
        key_bits = sum(sorted(widths)[:r])  # conservative: narrowest subset
        if comb(b, r) * n * n <= 10 * max(n, 1) * (1 << key_bits):
            return b
    return last


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_distance: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """ALL near-duplicate pairs with SimHash Hamming distance ≤
    ``max_distance`` — exact recall, no cross join at any scale.

    Candidate generation splits the 64-bit signature into ``b`` blocks
    and equi-joins on every ``(b - max_distance)``-subset of them
    (pigeonhole: ≤ d differing bits can break at most d blocks, so some
    subset survives intact). ``b`` is auto-sized from the corpus count
    via :func:`_simhash_blocking` — bigger corpora get wider effective
    keys (more blocks, larger subsets) so the random-collision
    background stays ~linear in n; the output is invariant to the
    choice. Pass ``n_docs`` to skip the sizing ``count()`` (for parquet
    sources it is metadata-only).

    The signature table is materialized ONCE (eager ``localCheckpoint``,
    16 B/doc) before the self-join: both join sides derive from it, and
    without the checkpoint Spark re-evaluates the tokenize+md5 Arrow
    kernel — the dominant cost of the whole operator — once PER SIDE at
    every scale (measured 2×0.45 s of a 3.2 s sf0.1 wall; the r7 driver
    regression to 2.76 s was exactly this double-eval plus the dedup
    exchange carrying unfiltered background candidates, both fixed
    here). At 100 TB the checkpoint is (id, sim) only — ~16 GB per
    billion docs spread across executor storage, far below the cost of
    re-tokenizing the corpus.
    """
    from itertools import combinations

    sh = simhash_df(df, id_col, text_col).localCheckpoint(eager=True)
    if n_docs is None:
        n_docs = sh.count()  # metadata-free but cached: O(partitions)
    b_cnt = _simhash_blocking(int(n_docs), max_distance)
    r = b_cnt - max_distance
    widths = [64 // b_cnt + (1 if i < 64 % b_cnt else 0) for i in range(b_cnt)]
    offsets = [sum(widths[:i]) for i in range(b_cnt)]

    # All blocking expressions are authored as SQL STRINGS and parsed in
    # one ``F.expr`` call each: Column-algebra construction is a py4j
    # round trip per node, and these expressions have hundreds of nodes
    # once combos grow (the emit-once CASE alone measured 1.74 s of
    # pure driver-side py4j at 28 combos, 13 s+ extrapolated at the
    # sf10 auto-blocking's 210 — construction cost, before any data
    # moved).
    def blk_sql(col: str, i: int) -> str:
        s = f"shiftrightunsigned({col}, {offsets[i]})"
        if widths[i] < 64:
            s = f"({s} & {(1 << widths[i]) - 1}L)"
        return s

    def subset_key_sql(S: tuple[int, ...]) -> str:
        # shift-accumulate (bitwise, ANSI-safe: no overflow semantics);
        # single-block subsets use the block value directly so a full
        # 64-bit block never hits a degenerate shiftleft(_, 64)
        acc = blk_sql("__sim", S[0])
        for i in S[1:]:
            acc = f"(shiftleft({acc}, {widths[i]}) | {blk_sql('__sim', i)})"
        return acc

    combos = list(combinations(range(b_cnt), r))
    key_array = F.expr(
        "array(" + ", ".join(subset_key_sql(S) for S in combos) + ")"
    )
    keyed = sh.select(
        "__id",
        "__sim",
        F.posexplode(key_array).alias("__k", "__kv"),
    )
    a = keyed.select(F.col("__id").alias("id_a"), F.col("__sim").alias("sim_a"), "__k", "__kv")
    b = keyed.select(F.col("__id").alias("id_b"), F.col("__sim").alias("sim_b"), "__k", "__kv")

    # EMIT-ONCE: a pair sharing m subsets would surface m times; instead
    # of a dropDuplicates SHUFFLE over the candidate-pair stream (3.3 GB
    # at the sf10 scale point, SHUFFLE_r07), emit each pair only at the
    # CANONICAL matching subset — the r lowest matching block indices.
    # The join key already proves the subset's own blocks match, so
    # "S is canonical" reduces to: every block BELOW max(S) that is NOT
    # in S mismatches. One CASE on __k whose branch is that (tiny)
    # conjunction — a single branch evaluates per pair, linear
    # expression size. (Two rejected forms of this predicate measured
    # 23 µs/pair: a boolean-array + array_position scan, and a
    # bitmask + lowest-r-set-bits peel whose `rem` re-inlined the whole
    # 8-comparison mask at every peel step — join conditions get no
    # subexpression elimination.) Built lazily: only the SHUFFLE-HASH
    # tier evaluates it, and its construction is not free even as a
    # single parsed string.
    def emit_once_sql() -> Column:
        branches = []
        for kk, S in enumerate(combos):
            below = [i for i in range(max(S)) if i not in S]
            conj = (
                " AND ".join(
                    f"({blk_sql('sim_a', i)} != {blk_sql('sim_b', i)})"
                    for i in below
                )
                or "true"
            )
            branches.append(f"WHEN {kk} THEN ({conj})")
        return F.expr("CASE __k " + " ".join(branches) + " ELSE false END")

    # Tiering, sized from the exploded side (~40 B × keys × docs):
    #
    # * BROADCAST tier (fits autoBroadcastJoinThreshold): plain BHJ —
    #   full scan-side parallelism, no exchange — and the duplicate
    #   emissions are removed by a dropDuplicates over the (tiny at
    #   this size) pair stream: measured 1.1 s vs 3.3 s for the
    #   emit-once join condition at sf0.1 (complex non-equi conditions
    #   evaluate per CANDIDATE pair and dominate at high match rates).
    # * SHUFFLE-HASH tier (everything bigger): shuffle_hash hint (a
    #   per-partition hash build replaces the two SMJ sorts that
    #   spilled 4.6 GB at sf10) + the emit-once condition instead of
    #   dropDuplicates (the pair exchange alone re-spilled 2.1 GB at
    #   sf10: 65 s / 5.3 GB write vs 61 s / 2.0 GB write / ZERO spill).
    est_bytes = int(n_docs) * len(combos) * 40
    bcast_thresh = _bytes_conf(
        df.sparkSession, "spark.sql.autoBroadcastJoinThreshold", 10 * 1024 * 1024
    )
    hamming = hamming64(F.col("sim_a"), F.col("sim_b"))
    if 0 < est_bytes <= max(bcast_thresh, 0):
        # hamming-filter BEFORE the dedup exchange: the candidate stream
        # is true-pairs×multiplicity PLUS the random background, and the
        # background (hamming > d) is pure exchange waste
        cand = (
            a.join(b, ["__k", "__kv"])
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", hamming)
            .where(F.col("hamming") <= F.lit(max_distance))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        cand = (
            a.join(b.hint("shuffle_hash"), ["__k", "__kv"])
            .where((F.col("id_a") < F.col("id_b")) & emit_once_sql())
            .withColumn("hamming", hamming)
            .where(F.col("hamming") <= F.lit(max_distance))
        )
    return cand.select("id_a", "id_b", "hamming")


def _local_edge_pdf(edges: DataFrame, src_col: str, dst_col: str, cap: int | None):
    """Driver-resident edge list, or None.

    Two ways in: (a) the edge plan optimizes to a ``LocalRelation`` —
    the pairs were computed driver-side already (e.g. the minhash
    broadcast tier), so reading them back is a LocalTableScan, not a
    cluster pass; (b) the caller allows a bounded collect probe
    (``cap`` rows) — used when the caller knows re-evaluating the edge
    plan is affordable or has persisted it."""
    try:
        plan = edges._jdf.queryExecution().optimizedPlan()
        is_local = plan.getClass().getSimpleName() == "LocalRelation"
    except Exception:  # pragma: no cover - connect-style sessions
        is_local = False
    if is_local:
        return edges.select(src_col, dst_col).toPandas()
    if cap is not None:
        # Bounded one-shot-ish limit evaluation. initialNumPartitions =
        # 2× parallelism covers every partition in ONE job at bench-like
        # partition counts (the expected small-edge-list case) while the
        # DEFAULT 4× escalation takes over at cluster partition counts —
        # the previous 10M override evaluated ALL partitions in one
        # executeTake batch, and since every task may return up to cap+1
        # rows, a duplicate-heavy over-cap corpus could ship
        # partitions × cap rows (tens of GB) to the driver before the
        # probe rejected. Batched escalation stops fetching as soon as
        # cap+1 rows arrive, so driver exposure per batch is
        # batch_partitions × cap worst-case, and anything that still
        # trips spark.driver.maxResultSize lands in the except below —
        # probe abandoned, the distributed loop (which never collects
        # edges) takes over.
        spark = edges.sparkSession
        key = "spark.sql.limit.initialNumPartitions"
        try:
            prev = spark.conf.get(key, None)
        except Exception:  # pragma: no cover
            prev = None
        try:
            spark.conf.set(
                key, str(2 * spark.sparkContext.defaultParallelism)
            )
            pdf = edges.select(src_col, dst_col).limit(cap + 1).toPandas()
        except Exception:
            # oversized task-result fetch (maxResultSize) or any other
            # probe failure: fall back to the distributed fixpoint
            return None
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        if len(pdf) <= cap:
            return pdf
    return None


def _unionfind_min_labels(src, dst):
    """(ids, rep) arrays: min-id component labels over the edge list.

    Union-find with path compression, union by MIN root index; ids are
    processed through a sorted dense mapping, so the min root index IS
    the min id — identical labels to the distributed hash-to-min
    fixpoint, by construction."""
    import numpy as np

    ids = np.unique(np.concatenate([src, dst]))
    a = np.searchsorted(ids, src)
    b = np.searchsorted(ids, dst)
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in zip(a.tolist(), b.tolist()):
        ra, rb = find(i), find(j)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.fromiter(
        (find(i) for i in range(len(ids))), dtype=np.int64, count=len(ids)
    )
    return ids, ids[roots]


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
    local_max_edges: int | None = None,
) -> DataFrame:
    """(id, rep): connected components of the near-duplicate pair graph
    — every node labeled with the smallest id reachable from it. This is
    the step that turns PAIRS into dedup decisions (keep ``rep``, drop
    the rest), and the reason pair ops alone aren't a dedup pipeline.

    Algorithm: min-label propagation OVER THE EDGE SUBGRAPH ONLY — a
    node untouched by any edge can never change its label, so the
    iteration runs on the distinct edge endpoints (duplicate clusters
    are a tiny fraction of a real corpus) and the full node set gets
    its labels back through one final left join + coalesce. Each round
    every subgraph node takes the minimum label among itself and its
    neighbors; convergence needs O(graph diameter) rounds, and
    duplicate clusters are near-cliques (diameter ≤ ~3), so 3-4 rounds
    settle real corpora. Each round ends in an EAGER
    ``localCheckpoint`` — iterative self-reference doubles the LOGICAL
    plan per round (new = union(lab, edges ⋈ lab)), and without
    truncation round ~12's plan is millions of nodes: Catalyst's own
    plan-string rendering OOMed the driver before any data moved.
    Checkpointing caches the round's labels AND cuts the lineage, so
    every round starts from a leaf. Convergence is detected by the sum
    of labels (strictly decreasing until fixpoint — one cheap agg
    action, no row-wise diff join).

    Each round is propagate + POINTER-HALVING: after taking the min
    label over self+neighbors, every node re-labels to its
    representative's representative (``rep := rep[rep]`` — an
    equi-join of the label table with itself; reps are always subgraph
    nodes, so the join is total). Halving compresses label paths
    geometrically, so rounds grow O(log diameter) instead of
    O(diameter) — a 1000-link adversarial chain settles in ~12 rounds
    rather than ~1000.

    Halving is ADAPTIVE: the first three rounds run plain propagation —
    near-clique duplicate clusters (the overwhelmingly common shape)
    converge within them, paying zero extra cost — and from round 4 on
    each round adds the halving self-join, checkpointing the
    propagation result first so the self-join's two sides read one
    materialization instead of recomputing the groupBy twice.

    At 100 TB: rounds × (joins + agg on the EDGE-NODE set, not the
    corpus) is the textbook distributed CC cost (hash-to-min with path
    compression on the long-chain tail).
    """
    # -- driver tier ---------------------------------------------------------
    # When the edge list is already driver-resident (LocalRelation — the
    # minhash broadcast tier computes pairs on the driver) or the caller
    # allows a bounded probe, a union-find here replaces the whole
    # iterative loop: each distributed round costs 2+ actions of
    # shuffles/checkpoints, which dominates small-corpus wall time (the
    # same build-side-fits reasoning as a broadcast join). Labels are
    # identical by construction (min-id components either way). The tier
    # is INT-ID ONLY (the union-find casts to int64); string or other
    # id types keep the distributed fixpoint, which is type-agnostic.
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_is_int = isinstance(
        nodes.schema[id_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    )
    loc = (
        _local_edge_pdf(edges, src_col, dst_col, local_max_edges)
        if id_is_int
        else None
    )
    if loc is not None:
        import numpy as np
        import pandas as pd

        spark = nodes.sparkSession
        if stats is not None:
            stats["rounds"] = 0
            stats["tier"] = "local"
        if len(loc) == 0:
            return nodes.select(id_col).withColumn("rep", F.col(id_col))
        ids, rep = _unionfind_min_labels(
            loc[src_col].to_numpy(dtype=np.int64),
            loc[dst_col].to_numpy(dtype=np.int64),
        )
        idt = nodes.schema[id_col].dataType.simpleString()
        sub = spark.createDataFrame(
            pd.DataFrame({id_col: ids, "__rep": rep}),
            f"{id_col} {idt}, __rep {idt}",
        )
        return (
            nodes.select(id_col)
            .join(F.broadcast(sub), id_col, "left")
            .select(
                id_col, F.coalesce(F.col("__rep"), F.col(id_col)).alias("rep")
            )
        )

    und = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
    und = und.persist()
    # both directions are present, so `s` alone covers every endpoint
    lab = und.select(F.col("s").alias("v")).distinct().withColumn("rep", F.col("v"))
    prev_sum = None
    prev_lab = None
    it = -1  # stays -1 when max_iter <= 0 (rounds = 0)
    for it in range(max_iter):
        msg = und.join(lab, und.s == lab.v).select(F.col("d").alias("v"), "rep")
        prop = (
            lab.unionByName(msg)
            .groupBy("v")
            .agg(F.min("rep").alias("rep"))
        )
        if it >= 3:
            # pointer halving: rep := rep[rep] (total: every rep is a
            # subgraph node, hence present in prop's v column)
            prop = prop.localCheckpoint(eager=True)
            look = prop.select(F.col("v").alias("__lv"), F.col("rep").alias("__lrep"))
            new = (
                prop.join(look, prop.rep == look.__lv)
                .select("v", F.col("__lrep").alias("rep"))
                .localCheckpoint(eager=True)
            )
            prop.unpersist()  # `new` is materialized and lineage-free
        else:
            new = prop.localCheckpoint(eager=True)
        if id_is_int:
            # numeric ids: Σ labels strictly decreases until fixpoint
            # (min-propagation is monotone) — one cheap agg action
            total = new.agg(F.sum("rep").alias("t")).first()["t"]
            converged = total == prev_sum
            prev_sum = total
        else:
            # non-numeric ids: sum() of string labels is NULL, which
            # made the old check read "converged" after round 1 (wrong
            # labels on any chain needing more rounds). Exact change
            # test between the two checkpointed label tables instead —
            # same O(edge-node) cost class as the sum action.
            converged = prev_lab is not None and (
                new.join(
                    prev_lab.select(F.col("v"), F.col("rep").alias("__prev")), "v"
                )
                .where(F.col("rep") != F.col("__prev"))
                .isEmpty()
            )
        if prev_lab is not None:
            prev_lab.unpersist()
        prev_lab = new
        lab = new
        if converged:
            break
    und.unpersist()
    # introspection for scale reports: rounds actually run, returned via
    # the caller-owned `stats` dict (a function attribute here would be
    # shared global state — two interleaved CC invocations would
    # overwrite each other's count).
    if stats is not None:
        stats["rounds"] = it + 1
    sub = lab.select(F.col("v").alias(id_col), F.col("rep").alias("__rep"))
    return (
        nodes.select(id_col)
        .join(sub, id_col, "left")
        .select(
            id_col, F.coalesce(F.col("__rep"), F.col(id_col)).alias("rep")
        )
    )


def connected_components_oracle_sql(
    *,
    nodes_sql: str,
    edges_sql: str,
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`connected_components`: a recursive
    transitive-closure walk, then min reachable id per node. Closure
    size is O(Σ cluster²) — fine at oracle scale, which is the point of
    the Spark implementation existing."""
    return f"""
WITH RECURSIVE nodes AS ({nodes_sql}),
e0 AS ({edges_sql}),
edges AS (SELECT s, d FROM (
    SELECT id_a AS s, id_b AS d FROM e0
    UNION SELECT id_b AS s, id_a AS d FROM e0)),
walk(v, m) AS (
  SELECT n.{id_col}, n.{id_col} FROM nodes n
  UNION
  SELECT e.d, w.m FROM walk w JOIN edges e ON e.s = w.v)
SELECT v AS {id_col}, min(m) AS rep FROM walk GROUP BY v"""


def simhash_pairs_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
) -> str:
    """DuckDB SQL reproducing :func:`simhash_pairs` value-for-value.

    Re-derives every 64-bit SimHash in SQL — whitespace tokenization
    (Python ``str.split`` ≡ regex ``\\s+`` split with empties dropped),
    md5-based token hash, per-bit ±1 majority — then emits ALL pairs
    with Hamming ≤ max_distance. Since :func:`simhash_pairs` blocks
    with subset size ``b - max_distance`` (full pigeonhole recall for
    any block count), its output equals this blocking-free form — the
    oracle proves the blocking loses nothing.
    """
    bit_aggs = ",\n    ".join(
        f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS c{b}"
        for b in range(64)
    )
    sim_u = " + ".join(
        f"(CASE WHEN c{b} > 0 THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END)"
        for b in range(64)
    )
    return f"""
WITH base AS (SELECT {id_col} AS did, {text_col} AS txt FROM {table} WHERE {text_col} IS NOT NULL),
toks AS (
  SELECT did, unnest(list_filter(string_split_regex(lower(txt), '\\s+'), x -> x <> '')) AS tok
  FROM base),
th AS (SELECT did, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv FROM toks),
bits AS (SELECT did,
    {bit_aggs}
  FROM th GROUP BY did),
persig AS (SELECT did, ({sim_u}) AS simu FROM bits),
sims AS (
  SELECT b.did, coalesce(p.simu, 0::HUGEINT) AS simu
  FROM base b LEFT JOIN persig p USING (did)),
pairs AS (
  SELECT a.did AS id_a, b.did AS id_b,
    {_sql_xor_name('a.simu', 'b.simu')} AS xu
  FROM sims a JOIN sims b ON a.did < b.did)
SELECT id_a, id_b,
  bit_count(((xu // 4294967296)::BIGINT))::INTEGER + bit_count((xu % 4294967296)::BIGINT)::INTEGER AS hamming
FROM pairs
WHERE (bit_count(((xu // 4294967296)::BIGINT)) + bit_count((xu % 4294967296)::BIGINT)) <= {max_distance}"""


def _sql_xor_name(a: str, b: str) -> str:
    """xor of two HUGEINT expressions in [0, 2^64) via 32-bit halves
    (DuckDB xor() is BIGINT-only)."""
    t = 1 << 32
    return (
        f"(xor((({a}) // {t})::BIGINT, (({b}) // {t})::BIGINT)::HUGEINT * {t} + "
        f"xor((({a}) % {t})::BIGINT, (({b}) % {t})::BIGINT)::HUGEINT)"
    )


# ---------------------------------------------------------------------------
# embedding near-dup


def bounded_local_vectors(
    df: DataFrame, id_col: str, vec_col: str, max_bytes: int, known_dims: int | None = None
):
    """Materialize an (ids, float64 matrix) pair on the driver, guarded
    by a pre-flight byte estimate — the driver-OOM-safe replacement for
    a bare ``collect()``.

    Default path: one cheap aggregate (count + max vector length,
    column-pruned) bounds the Arrow transfer at ``n × (8·dims + 8)``
    bytes BEFORE any data moves; returns ``None`` when the estimate
    exceeds ``max_bytes`` so callers can fall back to a distributed
    strategy.

    ``known_dims`` path: when the caller already knows the vector
    width (e.g. from an in-hand centroid matrix), the byte cap
    translates to a row cap, so a single ``limit(cap+1)``-guarded
    collect replaces the estimate job + collect job pair — half the
    fixed per-job latency for interactive callers. A ``limit`` already
    on ``df`` composes (Spark keeps the smaller).

    Ids are returned sorted ascending with the matrix re-ordered to
    match (callers binary-search them).
    """
    import numpy as np

    if known_dims is not None:
        cap = max_bytes // (8 * max(known_dims, 1) + 8)
        pdf = df.select(id_col, vec_col).limit(cap + 1).toPandas()
        if len(pdf) > cap:
            return None
        d = known_dims
    else:
        est = df.select(
            F.count(F.lit(1)).alias("n"), F.max(F.size(F.col(vec_col))).alias("d")
        ).first()
        n = int(est["n"] or 0)
        d = int(est["d"] or 0)
        if n * (8 * d + 8) > max_bytes:
            return None
        pdf = df.select(id_col, vec_col).toPandas()  # Arrow-batched
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    if len(pdf) == 0:
        return ids, np.empty((0, d), dtype=np.float64)
    mat = np.array(list(pdf[vec_col].to_numpy()[order]), dtype=np.float64)
    return ids, mat


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 7,
    exact: bool = False,
    dims: int | None = None,
    exact_max_bytes: int = 1 << 30,
    exact_max_rows: int = 1_000_000,
    on_exact_overflow: str = "fallback",
    bucket_cap: int = 32_768,
    max_oversized_buckets: int = 10_000,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    ``exact=True``: exact all-pairs via a broadcast of the (normalized)
    embedding matrix and a blocked numpy matmul per partition — each
    task computes its row-block × corpusᵀ, so the O(n²) similarity work
    is distributed and vectorized, never an interpreted per-pair
    expression, row-chunked to ≤ 32 MB score matrices
    (``similarity._SCORE_CHUNK_ELEMS`` — an unchunked Arrow batch
    against a 200k corpus is a 16 GB allocation, the r9 probe OOM).
    The tier is guarded two ways, both with ``on_exact_overflow``
    semantics (``"fallback"`` → LSH with a warning, ``"error"`` →
    raise): ``exact_max_bytes`` (default 1 GiB — above it the corpus
    doesn't fit any executor's broadcast) and ``exact_max_rows``
    (default 1M — bytes bound the MEMORY but rows² bound the WORK: a
    512 MB / 2M-row corpus passes the byte cap yet costs ~10^14 FLOP
    all-pairs, hours on one node; past the row cap the LSH tier is the
    honest scale path). No unbounded driver materialization on any
    path.

    Otherwise: random-hyperplane LSH — sign signature over ``n_planes``
    seeded hyperplanes (vectorized matmul kernel), block on the
    signature, verify cosine within blocks.
    """
    df = widen(df)
    if exact:
        import numpy as np
        import pandas as pd

        spark = df.sparkSession
        # dims (footer metadata/catalog stats) → single limit-guarded
        # collect; the estimate job only runs when the width is unknown
        loc = bounded_local_vectors(
            df, id_col, vec_col, exact_max_bytes, known_dims=dims
        )
        if loc is not None and len(loc[0]) > exact_max_rows:
            loc = None  # work cap: n² pair work past this is not a plan
        if loc is None:
            if on_exact_overflow == "error":
                raise ValueError(
                    f"embedding corpus exceeds exact_max_bytes={exact_max_bytes} "
                    f"or exact_max_rows={exact_max_rows}; "
                    "use exact=False (LSH) or raise the caps"
                )
            import warnings

            warnings.warn(
                "embedding_dup_pairs: corpus too large for the exact tier "
                "(bytes or quadratic work); falling back to LSH "
                "(approximate recall)",
                stacklevel=2,
            )
            exact = False
        else:
            ids, mat = loc
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            mat = mat / norms[:, None]
            bc = spark.sparkContext.broadcast((ids, mat))
            thr = float(threshold)

            def block_pairs(batches):
                # row-chunked like similarity._SCORE_CHUNK_ELEMS: a full
                # Arrow batch (10k rows) against a 200k corpus is a
                # 16 GB score matrix — at the r9 sf10/sf100 probes that
                # OOM-killed the Python workers (the same defect class
                # the r8 ANN chunking fixed; this tier was never probed
                # then). 32 MB of doubles per matmul instead.
                from sdvg_spark.ops.similarity import _SCORE_CHUNK_ELEMS

                b_ids, b_mat = bc.value
                n = len(b_ids)
                step = max(1, _SCORE_CHUNK_ELEMS // max(n, 1))
                for pdf in batches:
                    if not len(pdf):
                        continue
                    ia = np.searchsorted(b_ids, pdf["id_a"].to_numpy(dtype=np.int64))
                    for s0 in range(0, len(ia), step):
                        blk = ia[s0 : s0 + step]
                        sims = b_mat[blk] @ b_mat.T  # (≤step, n)
                        ra, cb = np.nonzero(sims >= thr)
                        keep = b_ids[blk[ra]] < b_ids[cb]
                        yield pd.DataFrame(
                            {
                                "id_a": b_ids[blk[ra[keep]]],
                                "id_b": b_ids[cb[keep]],
                                "cosine": sims[ra[keep], cb[keep]],
                            }
                        )

            return df.select(F.col(id_col).alias("id_a")).mapInPandas(
                block_pairs, "id_a long, id_b long, cosine double"
            )
    # LSH tier (also the exact-overflow fallback): one map pass emits
    # (signature, id, vector), then a groupBy(sig).applyInPandas matmul
    # verifies cosine WITHIN each bucket — the same per-bucket kernel
    # shape as semantic_dedup. The previous form self-joined ids on the
    # signature (materializing every candidate pair as rows), then
    # re-attached both vectors with two more corpus joins and verified
    # with the interpreted per-element cosine; this shape shuffles the
    # corpus once, keeps pairs inside numpy, and never evaluates an
    # interpreted lambda per candidate. Oversized buckets (skewed /
    # near-constant corpora, > bucket_cap rows — identical vectors
    # always share a bucket, so n_planes can't fix this) fall back to a
    # BLOCKED sub-join: rows get a block index within their bucket
    # (row_number // bucket_cap) and every block pair (i ≤ j) becomes
    # its own applyInPandas group, so all pairs are still found with
    # per-task memory bounded at 2×bucket_cap rows. The fallback only
    # engages for the (pre-counted) oversized signatures — the common
    # path keeps its single corpus shuffle; the degenerate path's
    # quadratic emit (n/cap groups per row) is inherent to all-pairs on
    # a degenerate bucket, not an artifact. The pre-count is one
    # map-side-combined agg (a second signature map pass — signatures
    # are a cheap matmul, cheaper than persisting the corpus).
    import numpy as np
    import pandas as pd

    if dims is None:
        dims = _infer_dims(df, vec_col)
    from sdvg_spark.ops.similarity import hyperplane_weights

    w_flat = hyperplane_weights(n_planes, 1, seed, dims).reshape(n_planes, dims)
    thr = float(threshold)

    def sig_kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            M = np.array(list(pdf["__v"]), dtype=np.float64)
            bits = (M @ w_flat.T) >= 0  # sign rule ≡ hyperplane_sigs_df
            sig = np.zeros(n, dtype=np.int64)
            for p in range(n_planes):
                sig |= bits[:, p].astype(np.int64) << p
            yield pd.DataFrame(
                {"__sig": sig, "__id": pdf["__id"], "__v": pdf["__v"]}
            )

    def bucket_pairs(pdf):
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        M = np.array(list(pdf["__v"]), dtype=np.float64)
        nrm = np.linalg.norm(M, axis=1)
        nrm[nrm == 0] = 1.0
        Mn = M / nrm[:, None]
        ids = pdf["__id"].to_numpy(dtype=np.int64)
        out_a, out_b, out_s = [], [], []
        # 32 MB score-matrix cap (a fixed 2048-row block against a
        # bucket_cap bucket is 512 MB × 32 workers — the r9 probe OOM)
        from sdvg_spark.ops.similarity import _SCORE_CHUNK_ELEMS

        step = max(1, _SCORE_CHUNK_ELEMS // max(n, 1))
        for s0 in range(0, n, step):
            S = Mn[s0 : s0 + step] @ Mn.T  # (block, n)
            ra, cb = np.nonzero(S >= thr)
            ga = ra + s0
            keep = ga < cb
            if keep.any():
                ai, bi = ga[keep], cb[keep]
                lo, hi = np.minimum(ids[ai], ids[bi]), np.maximum(ids[ai], ids[bi])
                out_a.append(lo)
                out_b.append(hi)
                out_s.append(S[ra[keep], cb[keep]])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_s),
            }
        )

    def block_bucket_pairs(pdf):
        # oversized-bucket fallback group: rows of block lo and block hi
        # of one signature (lo == hi → all-pairs within the block).
        lo = int(pdf["__lo"].iloc[0])
        hi = int(pdf["__hi"].iloc[0])
        if lo == hi:
            return bucket_pairs(pdf[pdf["__blk"] == lo])
        a = pdf[pdf["__blk"] == lo]
        b = pdf[pdf["__blk"] == hi]
        if not len(a) or not len(b):
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        Ma = np.array(list(a["__v"]), dtype=np.float64)
        Mb = np.array(list(b["__v"]), dtype=np.float64)
        for M in (Ma, Mb):
            nrm = np.linalg.norm(M, axis=1)
            nrm[nrm == 0] = 1.0
            M /= nrm[:, None]
        ida = a["__id"].to_numpy(dtype=np.int64)
        idb = b["__id"].to_numpy(dtype=np.int64)
        out_a, out_b, out_s = [], [], []
        from sdvg_spark.ops.similarity import _SCORE_CHUNK_ELEMS

        step = max(1, _SCORE_CHUNK_ELEMS // max(len(Mb), 1))
        for s0 in range(0, len(Ma), step):
            S = Ma[s0 : s0 + step] @ Mb.T
            ra, cb = np.nonzero(S >= thr)
            if len(ra):
                ai, bi = ida[ra + s0], idb[cb]
                out_a.append(np.minimum(ai, bi))
                out_b.append(np.maximum(ai, bi))
                out_s.append(S[ra, cb])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_s),
            }
        )

    vec_type = dict(df.dtypes)[vec_col]
    sigged = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).mapInPandas(sig_kernel, f"__sig long, __id long, __v {vec_type}")
    # pre-count oversized signatures (map-side-combined: bytes/sig); the
    # collect is bounded at max_oversized_buckets — beyond that the
    # corpus is degenerate past what any blocking can absorb.
    over_pdf = (
        sigged.groupBy("__sig")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > bucket_cap)
        .select("__sig")
        .limit(max_oversized_buckets + 1)
        .toPandas()  # limit-bounded: ≤ (max_oversized_buckets+1) 8-byte rows
    )
    if len(over_pdf) > max_oversized_buckets:
        raise ValueError(
            f"embedding_dup_pairs: > {max_oversized_buckets} LSH buckets exceed "
            f"bucket_cap={bucket_cap}; the signature distribution is degenerate "
            "— raise n_planes or pre-cluster the corpus"
        )
    oversized = [int(x) for x in over_pdf["__sig"]]
    small = sigged
    if oversized:
        small = sigged.where(~F.col("__sig").isin(oversized))
    out = small.groupBy("__sig").applyInPandas(
        bucket_pairs, "id_a long, id_b long, cosine double"
    )
    if oversized:
        big = sigged.where(F.col("__sig").isin(oversized))
        w = Window.partitionBy("__sig").orderBy("__id")
        blocked = big.withColumn(
            "__blk", ((F.row_number().over(w) - F.lit(1)) / F.lit(bucket_cap)).cast("int")
        )
        nblk = blocked.withColumn(
            "__nblk", (F.max("__blk").over(Window.partitionBy("__sig")) + F.lit(1))
        )
        # row in block b of an m-block bucket joins groups (min(b,t),
        # max(b,t)) for t in 0..m-1 — every block pair meets exactly once
        exploded = nblk.withColumn(
            "__t", F.explode(F.sequence(F.lit(0), F.col("__nblk") - F.lit(1)))
        ).select(
            "__sig",
            "__id",
            "__v",
            "__blk",
            F.least("__blk", "__t").alias("__lo"),
            F.greatest("__blk", "__t").alias("__hi"),
        )
        big_pairs = exploded.groupBy("__sig", "__lo", "__hi").applyInPandas(
            block_bucket_pairs, "id_a long, id_b long, cosine double"
        )
        out = out.unionByName(big_pairs)
    return out


def _infer_dims(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first row (one tiny job)."""
    row = df.select(F.size(F.col(vec_col)).alias("n")).first()
    return int(row.n) if row else 0


# (the interpreted expression-based hyperplane signature was replaced by
# sdvg_spark.ops.similarity.hyperplane_sigs_df — one numpy matmul per
# Arrow batch instead of n_planes×dims interpreted lambda ops per row)


# ---------------------------------------------------------------------------
# SemDeDup: cluster-bucketed semantic dedup


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_cells: int | None = None,
    target_cell_rows: int = 256,
    min_cells: int = 16,
    threshold: float = 0.4,
    centroid_max_bytes: int = 64_000_000,
    n_rows: int | None = None,
    dims: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    deduplicate WITHIN clusters only — the all-pairs cosine work drops
    from O(n²) to O(Σ cell²), and with ``n_cells ∝ n`` cells stay
    bounded so total work is ~linear.

    Returns one row per input vector: ``(id, cell, rep, keep)`` —
    ``rep`` the smallest id in the vector's within-cell duplicate
    component (itself if unique), ``keep = (id = rep)``.

    Cell assignment reuses the IVF contract (ops/similarity.py): the
    ``n_cells`` smallest-id vectors are the centroids (deterministic and
    SQL-mirrorable; ids are uncorrelated with content so this is an
    unbiased sample), nearest-centroid by cosine with ties to the lowest
    cell. Pair finding is ONE ``groupBy(cell).applyInPandas`` matmul —
    each task holds one cell's (rows × dims) matrix and its rows²
    similarity block, never a corpus-wide pair join (a self-join that
    attaches vectors to every candidate pair materializes
    O(Σ cell²) kilobyte rows and OOMed at the 10x point; the per-cell
    kernel's footprint is O(cell²) floats per task). Components come
    from :func:`connected_components` (min-label propagation) —
    exactly the pairs→decisions step the pair ops alone don't provide.

    At 100 TB: assignment is map-only (broadcast centroid matmul); the
    self-join shuffles (id, cell) pairs once; within-cell pair counts
    are the operator's honest cost knob — and the knob is LOAD-BEARING:
    cells must shrink as the corpus grows or the within-cell O(cell²)
    silently reverts to all-pairs (observed: 16 cells over a 50k-vector
    corpus → 78M candidate pairs → OOM). By default ``n_cells`` is
    therefore derived from the corpus: ``max(min_cells,
    n // target_cell_rows)`` — expected cell ≈ ``target_cell_rows``
    regardless of scale (the SemDeDup paper's ~√n cells has the same
    intent); the count is one distributed aggregate, mirrored in SQL
    via a subquery LIMIT so the oracle stays value-exact at every sf.
    A production run would Lloyd-train centroids
    (``ivf_train_centroids``) and persist the assignment partitioned by
    cell; the smallest-id contract keeps every stage reproducible in
    plain SQL.

    Storage contract: the corpus-scale (id, cell, vector) cache lives
    only while pairs + components are computed — once CC converges it
    is ``unpersist()``-ed, and the returned plan reads from a slim
    (id, cell) checkpoint (~16 B/row) plus CC's label checkpoint, so
    repeated invocations in a long-lived session accumulate only
    output-scale blocks (drop the returned reference to let the
    ContextCleaner reap those).
    """
    import numpy as np

    from sdvg_spark.ops.similarity import _centroid_assign_kernel

    if n_cells is None:
        # n_rows: caller-supplied corpus size (e.g. parquet footer
        # metadata — no Spark job); falls back to one count action.
        n_cells = max(
            min_cells, (df.count() if n_rows is None else n_rows) // target_cell_rows
        )
    # dims (footer metadata/catalog stats) → the centroid collect is a
    # single limit-guarded job instead of estimate job + collect job
    loc = bounded_local_vectors(
        df.orderBy(F.col(id_col)).limit(n_cells),
        id_col,
        vec_col,
        centroid_max_bytes,
        known_dims=dims,
    )
    if loc is None:
        raise ValueError("n_cells × dims exceeds centroid_max_bytes")
    _, cent = loc
    cnorm = np.linalg.norm(cent, axis=1)
    cnorm[cnorm == 0] = 1.0
    bc = df.sparkSession.sparkContext.broadcast(cent / cnorm[:, None])

    wide = widen(df)
    # persisted: the assignment feeds the per-cell pair kernel, the
    # component seed labels, AND the final decision join — without it
    # the Arrow kernel re-scans the corpus once per consumer (and once
    # per CC round through the unpersisted round-0 labels).
    # MEMORY_AND_DISK spills rather than OOMs at scale.
    assign = wide.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("__v")
    ).mapInPandas(
        _centroid_assign_kernel(bc, "c_id", 1, vec_out="__v"),
        f"c_id long, cell int, __v {df.schema[vec_col].dataType.simpleString()}",
    ).persist()

    thr = float(threshold)

    def cell_pairs(pdf):
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        if n > 32_768:
            # a degenerate cell (e.g. a near-constant corpus collapsing
            # into one centroid) would make the n² block a multi-GB
            # task — fail with the actionable knob instead of an
            # executor OOM
            raise ValueError(
                f"semantic_dedup cell has {n} rows (> 32768): raise n_cells / "
                "lower target_cell_rows, or pre-split degenerate clusters"
            )
        M = np.array(list(pdf["__v"]), dtype=np.float64)
        nrm = np.linalg.norm(M, axis=1)
        nrm[nrm == 0] = 1.0
        S = (M / nrm[:, None]) @ (M / nrm[:, None]).T
        ia, ib = np.nonzero(np.triu(S >= thr, k=1))
        ids = pdf["c_id"].to_numpy(dtype=np.int64)
        a, b = ids[ia], ids[ib]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi})

    pairs = assign.groupBy("cell").applyInPandas(cell_pairs, "id_a long, id_b long")
    # Materialize the slim (id, cell) projection first (one job, which
    # also populates the assign cache that the pair kernel then reads),
    # run CC — its loop is eager, consuming `pairs` into its own
    # checkpoints — and release the corpus-scale vector cache: the
    # returned plan needs only slim + labels, so a long-lived session
    # keeps output-scale blocks, not vector-width ones.
    slim = assign.select("c_id", "cell").localCheckpoint(eager=True)
    # local_max_edges: duplicate pairs are a small fraction of any real
    # corpus, so CC's bounded probe usually lands the whole edge list on
    # the driver and replaces the iterative loop (tens of shuffle
    # actions) with one union-find. Above the cap the probe's partial
    # evaluation is wasted and the loop re-evaluates the cell kernels
    # once more — the giant-duplicate-graph regime where the loop cost
    # dominates anyway.
    labels = connected_components(
        slim.select(F.col("c_id")), pairs, id_col="c_id",
        local_max_edges=2_000_000,
    )
    assign.unpersist()
    return (
        slim.join(labels, "c_id")
        .select(
            F.col("c_id").alias(id_col),
            "cell",
            F.col("rep"),
            (F.col("c_id") == F.col("rep")).alias("keep"),
        )
    )


def semantic_dedup_oracle_sql(
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    target_cell_rows: int = 256,
    min_cells: int = 16,
    threshold: float = 0.4,
) -> str:
    """DuckDB mirror of :func:`semantic_dedup` value-for-value: same
    smallest-id centroids and tie rules as the IVF oracle (including
    the corpus-derived cell count, via a subquery LIMIT), within-cell
    pairs at the same threshold, then the recursive-CTE component walk
    of :func:`connected_components_oracle_sql` (restricted to each
    node's own cell by construction — edges never cross cells)."""
    lim = (
        str(n_cells)
        if n_cells is not None
        else f"(SELECT greatest({min_cells}, count(*) // {target_cell_rows}) FROM {table})"
    )
    asgn = f"""
cent AS (
  SELECT row_number() OVER (ORDER BY {id_col}) - 1 AS cell, {vec_col} AS cvec
  FROM (SELECT * FROM {table} ORDER BY {id_col} LIMIT {lim})),
asgn AS (
  SELECT vid, cell FROM (
    SELECT e.{id_col} AS vid, c.cell,
      row_number() OVER (PARTITION BY e.{id_col}
        ORDER BY list_cosine_similarity(e.{vec_col}::DOUBLE[], c.cvec::DOUBLE[]) DESC,
                 c.cell) AS rn
    FROM {table} e CROSS JOIN cent c)
  WHERE rn = 1)"""
    edges_sql = f"""
WITH {asgn}
SELECT a.vid AS id_a, b.vid AS id_b
FROM asgn a JOIN asgn b ON a.cell = b.cell AND a.vid < b.vid
JOIN {table} ea ON ea.{id_col} = a.vid
JOIN {table} eb ON eb.{id_col} = b.vid
WHERE list_cosine_similarity(ea.{vec_col}::DOUBLE[], eb.{vec_col}::DOUBLE[]) >= {threshold}"""
    cc = connected_components_oracle_sql(
        nodes_sql=f"SELECT {id_col} AS vid FROM {table}",
        edges_sql=edges_sql,
        id_col="vid",
    )
    return f"""
WITH {asgn},
cc AS ({cc})
SELECT cc.vid AS {id_col}, asgn.cell, cc.rep, (cc.vid = cc.rep) AS keep
FROM cc JOIN asgn ON asgn.vid = cc.vid"""
