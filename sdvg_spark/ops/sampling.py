"""Deterministic splitting & sampling for training-data pipelines.

Train/val/test assignment and (stratified) subsampling are the first
operations a 100 TB corpus hits after dedup. Both are expressed as pure
functions of (id, seed) via the engine's synced fastRandomFloat
(SplitMix64+XorShift64, `sdvg_spark/core/rng.py`), NOT `F.rand()`:

* map-only — no shuffle, no state, native Column expressions inside
  whole-stage codegen; the scan's partitioning is preserved;
* reproducible — the same row lands in the same split on every run,
  every retry, any partitioning, and any engine (the same chain exists
  as numpy kernel, Column expression, and DuckDB SQL);
* stable under corpus growth — adding rows never reassigns existing
  ids (unlike `randomSplit`, which reflows with partition layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sdvg_spark.core.rng import frf_col


def _unit_draw(id_col: Column, seed: int) -> Column:
    return frf_col(id_col.cast("long") + F.lit(int(seed)))


def _string_key_draw(c: Column, seed: int) -> Column:
    """Unit draw for STRING keys: md5 → first 15 hex chars → 60-bit int
    → frf. Mirrorable exactly in DuckDB (same md5, same fold). Keying a
    split on a string GROUP column (source/domain/author) is the
    leakage-safe form: every row of a group lands in the same split, so
    near-duplicates within a group can't straddle train/test."""
    h = F.conv(F.substring(F.md5(F.coalesce(c, F.lit(""))), 1, 15), 16, 10).cast(
        "long"
    )
    return frf_col(h + F.lit(int(seed)))


def _draw(df: DataFrame, id_col: str, seed: int) -> Column:
    if dict(df.dtypes).get(id_col) == "string":
        return _string_key_draw(F.col(id_col), seed)
    return _unit_draw(F.col(id_col), seed)


def _cumulative(fractions: dict[str, float]) -> list[tuple[str, float]]:
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    out, acc = [], 0.0
    for name, frac in fractions.items():
        if frac < 0:
            raise ValueError(f"negative fraction for {name!r}")
        acc += frac
        out.append((name, acc))
    return out


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    *,
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Append a deterministic split label drawn from frf(id + seed).

    ``fractions`` maps label -> share (must sum to 1; dict order defines
    the threshold order, so the same dict always produces the same
    assignment). Expected shares hold in distribution; exact per-label
    counts are not forced (same contract as hash-based splits in
    feature stores).

    ``id_col`` may be numeric (row id) or string. Passing a string
    GROUP column (source/domain) gives a group-aware split: all rows of
    a group share one label, so near-duplicates inside the group cannot
    leak across train/test.
    """
    cum = _cumulative(fractions)
    u = _draw(df, id_col, seed)
    if len(cum) == 1:
        return df.withColumn(out_col, F.lit(cum[0][0]))
    case = F.when(u < F.lit(cum[0][1]), F.lit(cum[0][0]))
    for name, bound in cum[1:-1]:
        case = case.when(u < F.lit(bound), F.lit(name))
    return df.withColumn(out_col, case.otherwise(F.lit(cum[-1][0])))


def sample_fraction(
    df: DataFrame, id_col: str, fraction: float, *, seed: int = 0
) -> DataFrame:
    """Keep each row iff frf(id + seed) < fraction — a deterministic,
    partitioning-independent Bernoulli sample."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(_draw(df, id_col, seed) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict,
    *,
    default: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: keep a row of
    stratum s iff frf(id + seed) < fractions[s] (``default`` for
    unlisted strata). The fraction map is a literal CASE chain — no join
    against a fractions table, so the plan stays map-only."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0, 1]")
    thresh: Column = F.lit(float(default))
    items = list(fractions.items())
    if items:
        case = F.when(F.col(strata_col) == F.lit(items[0][0]), F.lit(float(items[0][1])))
        for k, v in items[1:]:
            case = case.when(F.col(strata_col) == F.lit(k), F.lit(float(v)))
        thresh = case.otherwise(F.lit(float(default)))
    return df.where(_draw(df, id_col, seed) < thresh)


def hash_split_oracle_sql(
    *,
    table: str,
    id_col: str,
    fractions: dict[str, float],
    seed: int = 0,
    id_is_string: bool = False,
    carry: list[str] | None = None,
) -> str:
    """DuckDB mirror of :func:`hash_split`: the same frf chain on the
    same ids compared against the same Python-computed cumulative
    thresholds (bit-identical doubles on both sides). With
    ``id_is_string`` the seed expression folds the key through the same
    md5-prefix integer as :func:`_string_key_draw`."""
    from sdvg_spark.core.rng import dlit, frf_cte_chain

    cum = _cumulative(fractions)
    if id_is_string:
        key = (
            f"CAST(('0x' || substr(md5(coalesce({id_col}, '')), 1, 15))::UBIGINT"
            f" AS BIGINT)"
        )
    else:
        key = id_col
    chain, final = frf_cte_chain(
        "src", f"{key} + {int(seed)}", carry=carry or [id_col], out="u"
    )
    if len(cum) == 1:
        case = f"'{cum[0][0]}'"
    else:
        whens = " ".join(
            f"WHEN u < {dlit(bound)} THEN '{name}'" for name, bound in cum[:-1]
        )
        case = f"CASE {whens} ELSE '{cum[-1][0]}' END"
    cols = ", ".join(carry or [id_col])
    return (
        f"WITH src AS (SELECT {cols} FROM {table}), {chain} "
        f"SELECT {cols}, {case} AS split FROM {final}"
    )


def stratified_sample_oracle_sql(
    *,
    table: str,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    seed: int = 0,
    carry: list[str] | None = None,
) -> str:
    """DuckDB mirror of :func:`stratified_sample`: the same frf draw on
    the same ids against the same literal per-stratum thresholds
    (bit-identical doubles via ``dlit``)."""
    from sdvg_spark.core.rng import dlit, frf_cte_chain

    carry = carry or [id_col, strata_col]
    chain, final = frf_cte_chain(
        "src", f"{id_col} + {int(seed)}", carry=carry, out="u"
    )
    whens = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {dlit(float(v))}"
        for k, v in fractions.items()
    )
    thresh = f"CASE {whens} ELSE {dlit(float(default))} END" if whens else dlit(float(default))
    cols = ", ".join(carry)
    return (
        f"WITH src AS (SELECT {cols} FROM {table}), {chain} "
        f"SELECT {cols} FROM {final} WHERE u < {thresh}"
    )


def stratified_sample_exact(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    *,
    n_per_stratum: int,
    seed: int = 0,
    out_rank: str = "samp_rank",
) -> DataFrame:
    """Exactly ``min(n_per_stratum, |stratum|)`` rows per stratum,
    deterministically — the exact-count companion to
    :func:`stratified_sample`'s Bernoulli draw (eval sets, per-domain
    caps, balanced fine-tuning mixes need exact counts).

    Rows rank within their stratum by the frf(id + seed) unit draw
    (string ids fold through the md5-prefix integer), ties broken by
    id; keep rank ≤ n. The draw is a pure f(id), so the selected set is
    identical under any partitioning and engine — unlike
    ``df.sampleBy``, which is neither exact-count nor partition-stable.

    Scale shape: ``row_number() ≤ n`` over a per-stratum window —
    Spark's WindowGroupLimit pushes the limit MAP-SIDE (each partition
    forwards at most n rows per stratum into the single shuffle), so a
    hot stratum costs one bounded sorted partition, not its full row
    count.
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    u = _draw(df, id_col, seed)
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(id_col).asc())
    return df.withColumn(out_rank, F.row_number().over(w)).where(
        F.col(out_rank) <= F.lit(int(n_per_stratum))
    )


def stratified_sample_exact_oracle_sql(
    *,
    table: str,
    id_col: str,
    strata_col: str,
    n_per_stratum: int,
    seed: int = 0,
    id_is_string: bool = False,
    carry: list[str] | None = None,
) -> str:
    """DuckDB mirror of :func:`stratified_sample_exact`: the same frf
    draw ranked by the same (u, id) order within each stratum."""
    from sdvg_spark.core.rng import frf_cte_chain

    carry = carry or [id_col, strata_col]
    if id_is_string:
        key = (
            f"CAST(('0x' || substr(md5(coalesce({id_col}, '')), 1, 15))::UBIGINT"
            f" AS BIGINT)"
        )
    else:
        key = id_col
    chain, final = frf_cte_chain("src", f"{key} + {int(seed)}", carry=carry, out="u")
    cols = ", ".join(carry)
    return (
        f"WITH src AS (SELECT {cols} FROM {table}), {chain}, "
        f"r AS (SELECT {cols}, row_number() OVER "
        f"(PARTITION BY {strata_col} ORDER BY u, {id_col}) AS samp_rank FROM {final}) "
        f"SELECT {cols}, samp_rank FROM r WHERE samp_rank <= {int(n_per_stratum)}"
    )


def quantile_band_filter(
    df: DataFrame,
    col: str,
    *,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
) -> DataFrame:
    """Keep rows whose ``col`` lies within the corpus's exact
    [``lower_q``, ``upper_q``] quantile band — the trim-the-tails
    quality gate (drop the shortest/most-repetitive/highest-perplexity
    slices without hand-picking absolute thresholds; Gopher and CCNet
    both gate on quantiles of exactly such per-doc signals).

    Bounds use Spark's EXACT interpolated ``percentile`` (the
    quantile_cont definition DuckDB shares, so the oracle filters on
    bit-identical thresholds); rows with NULL ``col`` are dropped
    (their band membership is unknowable). Inclusive on both edges.

    Plan shape: one single-scan aggregate computes both bounds
    (count-as-literal pattern — two scalars to the driver, no 1-row
    crossJoin), then the filter is a map-only predicate pushed at the
    second scan. Two passes over the input by construction; persist
    upstream if the scan dominates.
    """
    if not 0.0 <= lower_q <= upper_q <= 1.0:
        raise ValueError(
            f"need 0 <= lower_q <= upper_q <= 1, got {lower_q}, {upper_q}"
        )
    row = df.select(
        F.expr(
            f"percentile({col}, array({float(lower_q)}D, {float(upper_q)}D))"
        ).alias("b")
    ).first()
    bounds = row["b"]
    if bounds is None or bounds[0] is None:  # empty/all-NULL input
        return df.where(F.lit(False))
    lo, hi = float(bounds[0]), float(bounds[1])
    return df.where(F.col(col).isNotNull() & F.col(col).between(lo, hi))


def quantile_band_filter_oracle_sql(
    *,
    table: str,
    col: str,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
    select: str = "*",
) -> str:
    """DuckDB mirror of :func:`quantile_band_filter` —
    ``quantile_cont`` shares Spark ``percentile``'s interpolated
    definition, so both engines cut on identical doubles."""
    return f"""
WITH b AS (SELECT quantile_cont({col}, {float(lower_q)}) AS lo,
                  quantile_cont({col}, {float(upper_q)}) AS hi
           FROM {table})
SELECT {select} FROM {table}, b
WHERE {col} IS NOT NULL AND {col} >= b.lo AND {col} <= b.hi"""


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    score_col: str,
    *,
    budget: int,
    score_lo: float = 0.0,
    score_hi: float = 1.0,
    n_bins: int = 256,
    max_bin_rows: int = 1 << 22,
    materialize: str = "persist",
) -> DataFrame:
    """Best-first selection up to a global token budget: rank documents
    by ``score_col`` DESC (ties by id ASC) and mark ``selected`` those
    whose inclusive running token total stays within ``budget`` — the
    "curate the best N-billion tokens" step that turns a scored corpus
    into a fixed training budget (quality-weighted data selection à la
    DSIR/QuRating pipelines, reduced to its deterministic core).

    One row per scored input doc: (id, n_tokens, score, cum_tokens,
    selected). Rows with NULL score or NULL token count are dropped
    (their rank is unknowable). The output is a pure function of the
    input (never of partitioning).

    Distributed shape — the global score-ordered cumsum is the same
    prefix-sum decomposition as :func:`~sdvg_spark.ops.corpus.
    pack_sequences`, on a float axis: scores bin into ``n_bins``
    fixed-width ranges over [``score_lo``, ``score_hi``] (binning is
    monotone with the sort order, out-of-range scores clamp to the edge
    bins), per-bin cumsums run PARTITIONED by bin at full parallelism,
    and exclusive bin offsets come from one ``n_bins``-row aggregate. No
    single-partition corpus window; one range shuffle of (id, n, s)
    triples total. Integer token sums stay exact past 2^53.

    Bin-skew guard: a corpus whose scores collapse into few values
    (near-constant quality scores) would put everything in ONE bin and
    degenerate the per-bin window to a single partition. Bins holding
    more than ``max_bin_rows`` rows get a secondary key, exact in both
    regimes because it is monotone with the within-bin sort order
    ``(score DESC, id ASC)``: a CONSTANT-score bin sub-buckets on id
    ranges (the tie order is id, so fixed-width id buckets decompose the
    prefix sum exactly); a bin with score spread re-bins on its observed
    ``[min_s, max_s]`` range at 256× resolution. Residual pathologies
    (≥``max_bin_rows`` rows at one exact score among varied others, or
    extreme id clustering) stay CORRECT — they just fall back to a
    larger window partition for that cell.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget!r}")
    if not score_hi > score_lo:
        raise ValueError(f"need score_hi > score_lo, got {score_lo}, {score_hi}")
    if materialize not in ("persist", "checkpoint", "none"):
        raise ValueError(
            f"materialize must be persist|checkpoint|none, got {materialize!r}"
        )
    # The op consumes its input TWICE (the ≤n_bins stats aggregate,
    # then the windowed cumsum). Materialize the slim 24 B/row triple
    # projection once — without this the caller's upstream (typically
    # a full tokenize+quality scan of the corpus) re-executes per
    # pass: the sf100 probe measured token_budget_sample at 1417 s,
    # double-scanning a 5M-doc tokenization to select 68 MB of
    # triples. Default is persist(MEMORY_AND_DISK) + a materializing
    # count: recomputable from lineage on executor loss and evictable
    # under memory pressure, unlike localCheckpoint, whose blocks are
    # unrecoverable if an executor dies mid-query (explicitly unsafe
    # under dynamic allocation) and pinned for the session lifetime.
    # "checkpoint" keeps the old localCheckpoint behavior (skips the
    # second upstream recompute even on cache eviction — acceptable
    # only with static executors); "none" skips materialization so a
    # caller that already persisted upstream doesn't double-cache.
    d = df.select(
        F.col(id_col).alias("__id"),
        F.col(n_tokens_col).cast("long").alias("__n"),
        F.col(score_col).cast("double").alias("__s"),
    ).where(F.col("__n").isNotNull() & F.col("__s").isNotNull())
    if materialize == "persist":
        from pyspark import StorageLevel

        d = d.persist(StorageLevel.MEMORY_AND_DISK)
        d.count()  # populate the cache before the two consuming passes
    elif materialize == "checkpoint":
        d = d.localCheckpoint(eager=True)
    span = float(score_hi) - float(score_lo)
    raw_bin = F.floor(
        (F.lit(float(score_hi)) - F.col("__s")) / F.lit(span) * F.lit(int(n_bins))
    )
    b = d.withColumn(
        "__b",
        F.least(F.greatest(raw_bin, F.lit(0)), F.lit(int(n_bins) - 1)).cast("long"),
    )
    # one ≤n_bins-row aggregate: bin sums (for offsets) + the per-bin
    # stats the skew guard needs to pick a secondary-key scheme
    stats_pdf = (
        b.groupBy("__b")
        .agg(
            F.sum("__n").alias("bsum"),
            F.count(F.lit(1)).alias("bcnt"),
            F.min("__s").alias("mns"),
            F.max("__s").alias("mxs"),
            F.min("__id").alias("mni"),
            F.max("__id").alias("mxi"),
        )
        .toPandas()  # grouped on __b: ≤ n_bins fixed-width rows
    )
    stats = stats_pdf.sort_values("__b").to_dict("records")
    spark = df.sparkSession
    run = 0
    off_rows = []
    heavy = []
    for r in stats:
        off_rows.append((int(r["__b"]), run))
        run += int(r["bsum"])
        if int(r["bcnt"]) > int(max_bin_rows):
            heavy.append(r)
    if not off_rows:
        off_rows = [(0, 0)]  # empty input: keep the join schema valid
    offsets = spark.createDataFrame(off_rows, "__b long, __off long")

    if heavy:
        refine = 256
        u = F.lit(0).cast("long")
        for r in heavy:
            bid = int(r["__b"])
            if r["mxs"] > r["mns"]:  # score spread: re-bin observed range
                span_b = float(r["mxs"]) - float(r["mns"])
                expr = F.floor(
                    (F.lit(float(r["mxs"])) - F.col("__s")) / F.lit(span_b) * F.lit(refine)
                )
            else:  # constant score: tie order is id ASC -> id ranges
                nb = min(4096, max(16, 4 * (int(r["bcnt"]) // int(max_bin_rows) + 1)))
                width = max(1, (int(r["mxi"]) - int(r["mni"]) + 1 + nb - 1) // nb)
                expr = F.floor((F.col("__id") - F.lit(int(r["mni"]))) / F.lit(width))
            u = F.when(
                F.col("__b") == bid,
                F.least(F.greatest(expr, F.lit(0)), F.lit(refine * 16 - 1)).cast("long"),
            ).otherwise(u)
        b = b.withColumn("__u", u)
        usums = b.groupBy("__b", "__u").agg(F.sum("__n").alias("__usum"))
        wu = Window.partitionBy("__b").orderBy("__u").rowsBetween(
            Window.unboundedPreceding, -1
        )
        uoff = usums.select(
            "__b", "__u", F.coalesce(F.sum("__usum").over(wu), F.lit(0)).alias("__uoff")
        )
    else:
        # no heavy bins: one cell per bin, offset 0 — no second corpus agg
        b = b.withColumn("__u", F.lit(0).cast("long"))
        uoff = spark.createDataFrame(
            [(bb, 0, 0) for bb, _ in off_rows], "__b long, __u long, __uoff long"
        )
    w = (
        Window.partitionBy("__b", "__u")
        .orderBy(F.desc("__s"), F.asc("__id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        b.join(F.broadcast(offsets), "__b")
        .join(F.broadcast(uoff), ["__b", "__u"])
        .withColumn("__cum", F.col("__off") + F.col("__uoff") + F.sum("__n").over(w))
        .select(
            F.col("__id").alias(id_col),
            F.col("__n").alias("n_tokens"),
            F.col("__s").alias("score"),
            F.col("__cum").cast("long").alias("cum_tokens"),
            (F.col("__cum") <= F.lit(int(budget))).alias("selected"),
        )
    )


def token_budget_sample_oracle_sql(
    *,
    table: str,
    id_col: str,
    n_tokens_sql: str,
    score_sql: str,
    budget: int,
) -> str:
    """DuckDB mirror: the plain global-window cumsum IS the semantics
    (HUGEINT window sums cast back to BIGINT — the driver's pandas
    fetch otherwise floats them)."""
    return f"""
WITH d AS (
  SELECT {id_col} AS id, ({n_tokens_sql})::BIGINT AS n,
         ({score_sql})::DOUBLE AS s
  FROM {table}
  WHERE ({n_tokens_sql}) IS NOT NULL AND ({score_sql}) IS NOT NULL
), c AS (
  SELECT id, n, s,
         (sum(n) OVER (ORDER BY s DESC, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum
  FROM d
)
SELECT id AS {id_col}, n AS n_tokens, s AS score,
       cum AS cum_tokens, cum <= {int(budget)} AS selected
FROM c"""


def source_cap(
    df: DataFrame,
    id_col: str,
    group_col: str,
    score_col: str,
    *,
    max_rows: int,
    pre_salts: int = 16,
) -> DataFrame:
    """Per-group quota: keep at most ``max_rows`` docs per
    ``group_col`` (source/domain/author), best ``score_col`` first
    (ties by id ASC) — the domain-cap step that stops one crawl domain
    from dominating a training mix. Returns ONLY the kept rows:
    (id, group, score, cap_rank) with ``cap_rank`` in [1, max_rows].

    Skew-safe at 100 TB: a naive ``row_number() OVER (PARTITION BY
    group)`` funnels each group through ONE task — a 10-billion-row
    domain would serialize. Instead a salted PRE-PRUNE takes each
    (group, salt)'s local top-``max_rows`` first (the global top-k of a
    group is always contained in the union of its per-salt top-k), so
    the exact final window sees ≤ ``pre_salts × max_rows`` rows per
    group regardless of group size. Rows with NULL score are dropped.
    """
    if max_rows < 1:
        raise ValueError(f"max_rows must be >= 1, got {max_rows!r}")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        F.col(score_col).cast("double").alias("__s"),
    ).where(F.col("__s").isNotNull())
    pre = (
        Window.partitionBy("__g", "__salt")
        .orderBy(F.desc("__s"), F.asc("__id"))
    )
    surv = (
        base.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("__id")), F.lit(int(pre_salts)))
        )
        .withColumn("__pr", F.row_number().over(pre))
        .where(F.col("__pr") <= max_rows)
    )
    w = Window.partitionBy("__g").orderBy(F.desc("__s"), F.asc("__id"))
    return (
        surv.withColumn("cap_rank", F.row_number().over(w))
        .where(F.col("cap_rank") <= max_rows)
        .select(
            F.col("__id").alias(id_col),
            F.col("__g").alias(group_col),
            F.col("__s").alias("score"),
            "cap_rank",
        )
    )


def source_cap_oracle_sql(
    *,
    table: str,
    id_col: str,
    group_col: str,
    score_sql: str,
    max_rows: int,
) -> str:
    """DuckDB mirror of :func:`source_cap` — the pre-prune is an
    implementation detail (provably lossless), so the oracle is the
    plain per-group ranked filter."""
    return f"""
SELECT id AS {id_col}, g AS {group_col}, s AS score, rn AS cap_rank FROM (
  SELECT {id_col} AS id, {group_col} AS g, ({score_sql})::DOUBLE AS s,
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY ({score_sql})::DOUBLE DESC, {id_col}) AS rn
  FROM {table} WHERE ({score_sql}) IS NOT NULL)
WHERE rn <= {int(max_rows)}"""
