"""Temporal joins the built-in Spark operators don't express directly:
as-of join (latest-prior match) and point-in-interval range join.

Both are implemented as compositions of shuffle-friendly primitives —
no broadcast-nested-loop, no cartesian product, no per-row Python:

* :func:`asof_join` uses the union+window formulation: tag both sides,
  union them, and carry the most recent right-side payload forward with
  ``last(..., ignorenulls=True)`` over an ordered window. ONE shuffle
  total (the window's ``partitionBy``), versus a sort-merge join's two,
  and there is no candidate-pair blow-up at any skew level — each left
  row is touched exactly once. This is the canonical scalable as-of
  shape at 100 TB: the union preserves the key partitioning and the
  per-key sort is exactly what the window needs.

* :func:`range_join` buckets the point side into fixed-width bins
  (map-only, each point lands in exactly one bin), explodes each
  interval over the bins it covers (linear in interval length / bucket
  width), and equi-joins on ``(keys…, bin)`` before re-checking the
  exact bounds. Each matching (interval, point) pair is produced
  exactly once — a point lives in one bin — so no post-join dedup is
  needed. The join is a plain hash/sort-merge equi-join: AQE skew
  splitting applies, and the optimizer sees a normal join, not a
  ``BroadcastNestedLoopJoin`` (which a naive ``ON p BETWEEN lo AND hi``
  degenerates to and which is quadratic at scale).

Reference parity note: the reference engine (tarantool/sdvg) is a data
generator and has no join operators; these belong to the beyond-parity
analytics surface (SURVEY.md §8) alongside dedup and retrieval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType
from pyspark.sql.window import Window

__all__ = ["asof_join", "gap_fill_locf", "range_join"]


def _as_number(df: DataFrame, col: str) -> Column:
    """Orderable numeric image of a column: epoch-µs for timestamps
    (NTZ interpreted in the session time zone — a constant offset,
    irrelevant for binning since both sides shift identically),
    identity otherwise. Plain ordering stays on the native type."""
    if isinstance(df.schema[col].dataType, (TimestampType, TimestampNTZType)):
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "left",
    direction: str = "backward",
    matched_ts: str = "matched_ts",
    suffix: str = "",
    tolerance: int | float | None = None,
) -> DataFrame:
    """Attach to every left row the payload of the temporally nearest
    right row with the same ``on`` key.

    ``direction="backward"`` (the default) matches the LATEST right row
    with ``right_ts <= left_ts`` (pandas ``merge_asof`` / DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics, ties inclusive);
    ``"forward"`` matches the EARLIEST right row with
    ``right_ts >= left_ts``.

    Contract: the right side must be unique per ``(on…, right_ts)`` —
    with duplicates the picked row would be engine-dependent (DuckDB's
    ASOF JOIN leaves it undefined too). Pre-aggregate the right side
    (e.g. ``max_by`` per key+ts) before calling.

    NULL keys follow JOIN semantics, not window semantics: a null key
    never matches anything (right rows with a null key are dropped;
    left rows with one surface unmatched) — without this, the window
    partition would happily pair nulls with nulls.

    Output: every left column, plus ``matched_ts`` (the matched right
    timestamp, null if unmatched) and each payload column (renamed with
    ``suffix`` if given). ``how="inner"`` drops unmatched left rows,
    ``"left"`` keeps them with null payload.

    ``tolerance`` (pandas ``merge_asof`` parity): the maximum allowed
    |left_ts − matched_ts| — µs for timestamp columns, native units for
    numerics. A match farther away counts as no match (payload nulled
    under ``"left"``, row dropped under ``"inner"``). Applied as a
    post-window expression, so it costs no extra shuffle.

    Scale shape: one shuffle (window ``partitionBy(on)``); no join
    operator at all, so no pair explosion under key skew — a hot key
    costs one sorted partition, the same as any per-key window. The
    payload rides as a single struct so all fields always come from the
    SAME matched row (per-column ``last(ignorenulls)`` could otherwise
    mix rows when payload fields are legitimately null).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    out_cols = list(left.columns)
    for c in payload:
        if c + suffix in out_cols or c + suffix == matched_ts:
            raise ValueError(
                f"payload column {c + suffix!r} collides with a left column; "
                "pass suffix= to rename"
            )

    t, tag, pay = "__asof_t", "__asof_side", "__asof_p"
    # join semantics for nulls: a null-key right row can match nothing
    keycond = None
    for c in on:
        cond = F.col(c).isNotNull()
        keycond = cond if keycond is None else (keycond & cond)
    right = right.where(keycond)
    # one struct per right row: matched ts + payload, so every output
    # field provably comes from the same matched row
    r2 = right.select(
        *on,
        F.col(right_ts).alias(t),
        F.lit(0).alias(tag),
        F.struct(F.col(right_ts).alias("__mt"), *[F.col(c) for c in payload]).alias(pay),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
    )
    l2 = left.select(
        *on,
        F.col(left_ts).alias(t),
        F.lit(1).alias(tag),
        F.lit(None).cast(r2.schema[pay].dataType).alias(pay),
        *[F.col(c) for c in left.columns if c not in on],
    )
    # backward: ascending time, right (tag 0) before left at equal ts so
    # an equal-timestamp right row is eligible; forward: descending time,
    # same tie rule
    order = [F.col(t).asc(), F.col(tag).asc()]
    if direction == "forward":
        order = [F.col(t).desc(), F.col(tag).asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r2.unionByName(l2)
        .withColumn("__m", F.last(pay, ignorenulls=True).over(w))
        .where(F.col(tag) == 1)
    )
    if tolerance is not None:
        is_ts = isinstance(
            left.schema[left_ts].dataType, (TimestampType, TimestampNTZType)
        )

        def num(c: Column) -> Column:
            return F.unix_micros(c.cast("timestamp")) if is_ts else c

        gap = num(F.col(t)) - num(F.col("__m.__mt"))
        if direction == "forward":
            gap = -gap
        matched = matched.withColumn(
            "__m", F.when(gap <= F.lit(tolerance), F.col("__m"))
        )
    out = matched.select(
        *left.columns,
        F.col("__m.__mt").alias(matched_ts),
        *[F.col(f"__m.{c}").alias(c + suffix) for c in payload],
    )
    if how == "inner":
        out = out.where(F.col(matched_ts).isNotNull())
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket: int,
    bounds: str = "[]",
) -> DataFrame:
    """Join every point row to every interval row of the same ``on`` key
    whose ``[lo, hi]`` range contains the point (bounds configurable:
    ``"[]" "[)" "(]" "()"``).

    Timestamp columns are binned on their epoch-µs image (``bucket`` is
    then in MICROSECONDS); numeric columns are binned directly.

    Scale shape: the point side gets exactly one bin (map-only); each
    interval is exploded over ``(hi-lo)/bucket + 1`` bins — choose
    ``bucket`` near the typical interval length so the explosion factor
    stays ~2. The join is a plain equi-join on ``(keys…, bin)`` (hash or
    sort-merge, AQE-skew-splittable), never a BroadcastNestedLoopJoin.
    Column names must be disjoint across the two inputs apart from
    ``on``.
    """
    if bounds not in ("[]", "[)", "(]", "()"):
        raise ValueError(f"bounds must be one of [] [) (] (), got {bounds!r}")
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")

    b = "__range_bin"
    p_n = _as_number(points, point_col)
    lo_n = _as_number(intervals, lo_col)
    hi_n = _as_number(intervals, hi_col)
    pb = points.withColumn(b, F.floor(p_n / F.lit(bucket)))
    ib = intervals.withColumn(
        b,
        F.explode(
            F.sequence(F.floor(lo_n / F.lit(bucket)), F.floor(hi_n / F.lit(bucket)))
        ),
    )
    p, lo, hi = F.col(point_col), F.col(lo_col), F.col(hi_col)
    cond = (p >= lo) if bounds[0] == "[" else (p > lo)
    cond = cond & ((p <= hi) if bounds[1] == "]" else (p < hi))
    return ib.join(pb, [*on, b]).where(cond).drop(b)


def gap_fill_locf(
    observations: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    step_us: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Hypertable-style gap-fill: a fixed-step time grid per key, each
    grid point carrying the last observation at or before it (LOCF —
    last observation carried forward; null before the first one).

    The grid spans each key's own [min, max] observation window,
    aligned down to a ``step_us`` multiple (so grid timestamps are
    bucket boundaries, comparable across keys). It is generated
    distributively — per-key bounds from one aggregate, then
    ``sequence``+``explode`` — and the fill is :func:`asof_join`, so
    the whole operator is three map-side-combined shuffles (bounds agg,
    per-(key, ts) dedup agg, the as-of window) regardless of scale.
    With duplicate observations per (key, ts) the
    one with the greatest ``tiebreak_col`` wins (required if
    duplicates are possible — the as-of contract needs a unique right
    side).

    Output: keys…, ``ts`` (grid point, µs-exact timestamp), ``obs_us``
    (µs of the carried observation, null in leading gaps), and the
    ``value_cols`` as carried.
    """
    obs_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_ts = observations.groupBy(*keys, obs_us.alias("__us"))
    if tiebreak_col is None:
        obs = per_ts.agg(*[F.max(c).alias(c) for c in value_cols])
    else:
        obs = per_ts.agg(
            *[F.max_by(F.col(c), F.col(tiebreak_col)).alias(c) for c in value_cols]
        )
    bounds = observations.groupBy(*keys).agg(
        F.min(obs_us).alias("__mn"), F.max(obs_us).alias("__mx")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(
                # integer alignment (mn - mn % step): float division
                # could lose a µs near 2^53
                F.col("__mn") - F.col("__mn") % F.lit(step_us),
                F.col("__mx"),
                F.lit(step_us),
            )
        ).alias("__g_us"),
    )
    filled = asof_join(
        grid, obs,
        on=keys, left_ts="__g_us", right_ts="__us",
        payload=value_cols, matched_ts="obs_us",
    )
    return filled.select(
        *keys, F.timestamp_micros(F.col("__g_us")).alias("ts"), "obs_us", *value_cols
    )
