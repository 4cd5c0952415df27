"""One-call curation pipeline: the standard training-data flow —
quality/language filter → near-dup dedup → PII redaction → train/val/
test split → sequence packing — composed from the repo's oracle-proven
operators into a single labeled DataFrame.

Every document comes back with its full disposition: why it was
dropped (`drop_reason`), or — for keepers — its split label and packed
training-sequence coordinates. Nothing is silently discarded, which is
what makes a curation run auditable (and lets the DuckDB oracle check
the ENTIRE pipeline end-to-end, not just each stage in isolation).

Plan shape at 100 TB: features and redaction are map-only expressions;
dedup is the minhash band shuffle + the CC label propagation (both
byte-tiered in ops/dedup.py); split is map-only; packing is the
distributed prefix-sum of ops/corpus.py. The disposition joins are all
co-partitioned on the doc id.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sdvg_spark.ops import text as T


@dataclass
class CurationConfig:
    lang: str | None = "en"            # keep docs predicted as this language
    min_quality: float = 0.0           # keep docs with round(quality,9) >= this
    dedup_threshold: float | None = 0.4  # None disables near-dup removal
    minhash_bands: int = 21
    redact: bool = True                # PII-scrub the surviving text
    split: dict[str, float] | None = field(
        default_factory=lambda: {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    split_seed: int = 0
    pack_budget: int | None = 2048     # None disables packing
    pack_buckets: int = 128
    # character-count bound for the minhash tier decision (e.g. from
    # parquet footer metadata); None = measure with one scan job
    minhash_est_chars: int | None = None
    # covering (min, max) id bounds for the packing bucketer (e.g.
    # parquet footer stats); None = measure with one bounds job. Any
    # covering superset yields identical pack coordinates.
    pack_id_bounds: tuple[int, int] | None = None


def curate(
    docs: DataFrame,
    cfg: CurationConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the curation pipeline; one output row per INPUT document.

    Columns: id, lang_pred, quality (round-9), n_tokens, keep,
    drop_reason ('lang' | 'quality' | 'duplicate' | null),
    redacted_fp (fingerprint of the kept doc's redacted text; null for
    dropped), split, pack_id, pack_offset (null for dropped / disabled
    stages). Filters compare the ROUND-9 quality on both engine and
    oracle so a last-ulp difference can never flip a keep decision.

    Storage contract: the feature projection and the kept-set are
    ``persist()``-ed for the lifetime of the returned plan (they feed
    multiple downstream stages — dropping them would re-run the full
    text pass per consumer). In a long-lived session, materialize the
    result and release the reference (ContextCleaner reaps the blocks)
    or ``spark.catalog.clearCache()``; the CLI path exits its JVM, so
    no cleanup is needed there.
    """
    cfg = cfg or CurationConfig()
    from sdvg_spark.ops.dedup import widen

    # widen(): the feature pass below is the pipeline's single most
    # expensive map; a narrow (single-row-group) input would serialize
    # it on one core. No-op at real scale (guide §2.5).
    docs = widen(docs)

    def build_feat_exprs() -> list:
        return [
            [
                F.col(id_col).alias("id"),
                F.col(text_col).alias("t"),
                T.tokens(F.col(text_col)).alias("toks"),
            ],
            [
                F.col("id"),
                F.col("t"),
                T.detect_language(F.col("t"), F.col("toks")).alias("lang_pred"),
                F.round(T.quality_score(F.col("t"), F.col("toks")), 9).alias(
                    "quality"
                ),
                F.size("toks").cast("long").alias("n_tokens"),
            ],
        ]

    stage_cols, feat_cols = T._cached_lit(
        f"curate:feats:{id_col}:{text_col}", build_feat_exprs
    )
    staged = docs.select(*stage_cols)
    feats = staged.select(*feat_cols)
    lang_ok = F.lit(True) if cfg.lang is None else F.col("lang_pred") == cfg.lang
    qual_ok = F.col("quality") >= cfg.min_quality
    # persisted: the feature projection (tokenize + language + quality
    # over every document — the pipeline's single most expensive map) is
    # consumed by the minhash pair stage, the component seed labels, AND
    # the disposition join; without the persist each consumer re-runs
    # the full text pass. MEMORY_AND_DISK spills rather than OOMs.
    feats = (
        feats.withColumn("__lang_ok", lang_ok)
        .withColumn("__qual_ok", qual_ok)
        .persist()
    )

    passed = feats.where(F.col("__lang_ok") & F.col("__qual_ok"))
    if cfg.dedup_threshold is not None:
        from sdvg_spark.ops.dedup import connected_components, minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            passed.select("id", "t"),
            "id",
            "t",
            threshold=cfg.dedup_threshold,
            bands=cfg.minhash_bands,
            est_chars=cfg.minhash_est_chars,
        )
        comp = connected_components(
            passed.select("id"), pairs, id_col="id"
        ).withColumnRenamed("rep", "__rep")
        feats = feats.join(comp, "id", "left")
    else:
        feats = feats.withColumn("__rep", F.col("id"))

    disposition = feats.withColumn(
        "drop_reason",
        F.when(~F.col("__lang_ok"), "lang")
        .when(~F.col("__qual_ok"), "quality")
        .when(F.col("__rep") != F.col("id"), "duplicate"),
    ).withColumn("keep", F.col("drop_reason").isNull())

    # persisted: fingerprinting, the split draw, and sequence packing
    # each re-read the kept set (packing runs multiple jobs of its own)
    kept = disposition.where("keep").select("id", "t", "n_tokens").persist()
    # extras are built as COLUMNS on the kept set, not as joins: the
    # fingerprint is a map expression, the split label is a pure
    # function of the id (hash_split is a withColumn), and the packing
    # coordinates carry the two small columns through their one range
    # shuffle (pack_sequences(carry=...)) — the previous shape
    # re-joined the kept set twice for values that were already
    # row-local (two whole equi-join exchanges for ~16 bytes/row).
    extras = kept.select(
        "id",
        "n_tokens",
        T.fingerprint(
            T.redact_pii(F.col("t")) if cfg.redact else F.col("t")
        ).alias("redacted_fp"),
    )
    carry = ["redacted_fp"]
    if cfg.split:
        from sdvg_spark.ops.sampling import hash_split

        extras = hash_split(extras, "id", cfg.split, seed=cfg.split_seed)
        carry.append("split")
    if cfg.pack_budget:
        from sdvg_spark.ops.corpus import pack_sequences

        extras = pack_sequences(
            extras,
            "id",
            "n_tokens",
            budget=cfg.pack_budget,
            n_buckets=cfg.pack_buckets,
            carry=carry,
            id_bounds=cfg.pack_id_bounds,
        ).select("id", *carry, "pack_id", "pack_offset")
    else:
        extras = extras.select("id", *carry)

    out = disposition.select(
        F.col("id").alias(id_col),
        "lang_pred",
        "quality",
        "n_tokens",
        "keep",
        "drop_reason",
    ).join(extras.withColumnRenamed("id", id_col), id_col, "left")
    return out


def curate_oracle_sql(
    cfg: CurationConfig | None = None,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`curate` — the whole pipeline as one SQL
    statement over the same table, composed from each stage's proven
    mirror (feature expressions, exact-jaccard edges for the
    recall-certain minhash regime, recursive-closure components, the
    frf split chain, the window-cumsum packing)."""
    cfg = cfg or CurationConfig()
    from sdvg_spark.ops.dedup import connected_components_oracle_sql
    from sdvg_spark.ops.sampling import hash_split_oracle_sql

    lang_sql = T.sql_detect_language(text_col)
    qual_sql = f"round({T.sql_quality_score(text_col)}, 9)"
    ntok_sql = f"len({T.sql_tokens(text_col)})"
    lang_ok = "TRUE" if cfg.lang is None else f"lang_pred = '{cfg.lang}'"
    qual_ok = f"quality >= {cfg.min_quality!r}"

    # exact-jaccard edges over the PASSED set (5-char shingles — the
    # minhash op's recall-certain contract at bands>=21, threshold 0.4)
    thr = cfg.dedup_threshold if cfg.dedup_threshold is not None else 2.0
    edges = f"""
SELECT a.id AS id_a, b.id AS id_b FROM shing a, shing b
WHERE a.id < b.id
  AND len(list_intersect(a.s, b.s))::DOUBLE
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE >= {thr}"""
    cc = connected_components_oracle_sql(
        nodes_sql="SELECT id FROM passed",
        edges_sql=edges,
        id_col="id",
    )
    split_sql = hash_split_oracle_sql(
        table="kept",
        id_col="id",
        fractions=cfg.split or {"all": 1.0},
        seed=cfg.split_seed,
    )
    red = T.sql_redact_pii("t") if cfg.redact else "t"
    budget = cfg.pack_budget or (1 << 60)
    return f"""
WITH feats AS (
  SELECT {id_col} AS id, {text_col} AS t,
    {lang_sql.replace(text_col, f'{text_col}')} AS lang_pred,
    {qual_sql} AS quality,
    {ntok_sql}::BIGINT AS n_tokens
  FROM {table}),
flags AS (SELECT *, ({lang_ok}) AS lang_ok, ({qual_ok}) AS qual_ok FROM feats),
passed AS (SELECT * FROM flags WHERE lang_ok AND qual_ok),
shing AS (SELECT id, list_distinct(list_transform(
            range(1, greatest(length(lower(t)) - 4, 1) + 1),
            i -> substr(lower(t), i, 5))) AS s FROM passed),
comp AS (SELECT * FROM ({cc}) c),
disp AS (
  SELECT f.id, f.t, f.lang_pred, f.quality, f.n_tokens,
    CASE WHEN NOT f.lang_ok THEN 'lang'
         WHEN NOT f.qual_ok THEN 'quality'
         WHEN c.rep IS NOT NULL AND c.rep <> f.id THEN 'duplicate'
    END AS drop_reason
  FROM flags f LEFT JOIN comp c ON c.id = f.id),
kept AS (SELECT id, t, n_tokens FROM disp WHERE drop_reason IS NULL),
extras AS (SELECT id, {T.sql_fingerprint(red)} AS redacted_fp FROM kept),
sp AS (SELECT * FROM ({split_sql}) s),
pk AS (
  SELECT id,
    (start // {budget})::BIGINT AS pack_id,
    (start % {budget})::BIGINT AS pack_offset
  FROM (SELECT id, coalesce(sum(n_tokens) OVER (ORDER BY id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start
        FROM kept))
SELECT d.id AS {id_col}, d.lang_pred, d.quality, d.n_tokens,
  (d.drop_reason IS NULL) AS keep, d.drop_reason,
  e.redacted_fp, sp.split, pk.pack_id, pk.pack_offset
FROM disp d
LEFT JOIN extras e ON e.id = d.id
LEFT JOIN sp ON sp.id = d.id
LEFT JOIN pk ON pk.id = d.id"""
