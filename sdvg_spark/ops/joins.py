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
    mode: str = "auto",
    broadcast_max_rows: int = 2_000_000,
    broadcast_max_bytes: int = 256_000_000,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Attach to every left row the payload of the temporally nearest
    right row with the same ``on`` key.

    ``direction="backward"`` (the default) matches the LATEST right row
    with ``right_ts <= left_ts`` (pandas ``merge_asof`` / DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics, ties inclusive);
    ``"forward"`` matches the EARLIEST right row with
    ``right_ts >= left_ts``; ``"nearest"`` the smaller |gap| of the two
    (ties to the backward match, pandas' rule; in the window tier both
    candidates come from ONE Exchange with two in-partition sorts).

    Contract: the right side must be unique per ``(on…, right_ts)`` —
    with duplicates the picked row would be engine-dependent (DuckDB's
    ASOF JOIN leaves it undefined too). Either pre-aggregate the right
    side (e.g. ``max_by`` per key+ts) before calling, or pass
    ``right_tiebreak``: among equal ``(on…, right_ts)`` right rows the
    one with the GREATEST tiebreak wins (nulls lose to any non-null),
    in every direction and in both tiers. The tiebreak rides the
    window's EXISTING per-key sort as one extra order column — it costs
    no shuffle, where a ``max_by`` pre-aggregation over a right side
    whose (key, ts) pairs are near-unique (real telemetry) is a full
    near-raw-cardinality hash aggregate: at the sf100 probe that
    partial-agg was 17.7 GB of memory spill in gap_fill_locf before
    this parameter replaced it (SHUFFLE_r09.md).

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

    Two execution tiers (``mode``): ``"window"`` — the union+window
    formulation, one shuffle of left+right, right for any input sizes;
    ``"broadcast"`` — the small-right-side tier: the right side is
    collected, sorted per key, broadcast, and every left Arrow batch
    binary-searches it (``np.searchsorted``) — ZERO shuffle, the as-of
    equivalent of a broadcast hash join, right when the right side is a
    dimension-sized table (rates, config history, calibration curves)
    and the left is the 100 TB fact stream. ``"auto"`` (default) runs a
    column-pruned byte+row estimate of the right side (the same
    pre-flight-estimate tiering as the dedup operators) and picks
    broadcast only when it fits both ``broadcast_max_rows`` and
    ``broadcast_max_bytes`` — a wide-payload right side can never OOM
    the driver at plan time. Both tiers are value-identical (asserted
    against each other on randomized data in tests/test_joins.py).

    Window-tier scale shape: one shuffle (window ``partitionBy(on)``);
    no join operator at all, so no pair explosion under key skew — a
    hot key costs one sorted partition, the same as any per-key window.
    The payload rides as a single struct so all fields always come from
    the SAME matched row (per-column ``last(ignorenulls)`` could
    otherwise mix rows when payload fields are legitimately null).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if mode not in ("auto", "window", "broadcast"):
        raise ValueError(f"mode must be auto/window/broadcast, got {mode!r}")
    out_cols = list(left.columns)
    for c in payload:
        if c + suffix in out_cols or c + suffix == matched_ts:
            raise ValueError(
                f"payload column {c + suffix!r} collides with a left column; "
                "pass suffix= to rename"
            )

    t, tag, pay = "__asof_t", "__asof_side", "__asof_p"
    tb = "__asof_tb"
    if right_tiebreak is not None and right_tiebreak not in right.columns:
        raise ValueError(f"right_tiebreak {right_tiebreak!r} not in right columns")
    # join semantics for nulls: a null-key right row can match nothing
    keycond = None
    for c in on:
        cond = F.col(c).isNotNull()
        keycond = cond if keycond is None else (keycond & cond)
    right = right.where(keycond)

    if mode != "window":
        loc = _bounded_local_right(
            right,
            [*on, right_ts, *payload]
            + ([right_tiebreak] if right_tiebreak not in (None, *on, right_ts, *payload) else []),
            broadcast_max_rows,
            broadcast_max_bytes,
        )
        if loc is not None:
            if right_tiebreak is not None:
                # same winner as the window tier's tiebreak sort: keep
                # the greatest-tiebreak row per (key, ts) — driver-side
                # pandas, bounded by the broadcast caps
                extra = right_tiebreak not in (*on, right_ts, *payload)
                loc = (
                    loc.sort_values([*on, right_ts, right_tiebreak], na_position="first")
                    .drop_duplicates([*on, right_ts], keep="last")
                    .drop(columns=[right_tiebreak] if extra else [])
                    .reset_index(drop=True)
                )
            return _asof_broadcast(
                left, right, loc,
                on=on, left_ts=left_ts, right_ts=right_ts, payload=payload,
                how=how, direction=direction, matched_ts=matched_ts,
                suffix=suffix, tolerance=tolerance,
            )
        if mode == "broadcast":
            raise ValueError(
                f"right side exceeds broadcast_max_rows={broadcast_max_rows} "
                f"or broadcast_max_bytes={broadcast_max_bytes}; "
                "use mode='window' (or 'auto')"
            )
    # one struct per right row: matched ts + payload, so every output
    # field provably comes from the same matched row
    tbcols_r = (
        [F.col(right_tiebreak).alias(tb)] if right_tiebreak is not None else []
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias(t),
        F.lit(0).alias(tag),
        *tbcols_r,
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
        *(
            [F.lit(None).cast(right.schema[right_tiebreak].dataType).alias(tb)]
            if right_tiebreak is not None
            else []
        ),
        F.lit(None).cast(r2.schema[pay].dataType).alias(pay),
        *[F.col(c) for c in left.columns if c not in on],
    )
    # backward: ascending time, right (tag 0) before left at equal ts so
    # an equal-timestamp right row is eligible; forward: descending time,
    # same tie rule. nearest: BOTH windows over the same partitioning —
    # one Exchange, two sorts — then pick the smaller |gap| (ties ->
    # backward, pandas merge_asof's rule).
    def w_of(desc: bool):
        order = [F.col(t).desc() if desc else F.col(t).asc(), F.col(tag).asc()]
        if right_tiebreak is not None:
            # among equal (key, ts) right rows the cumulative
            # last(ignorenulls) picks the row latest in sort order —
            # tiebreak ASC (nulls first) makes that the greatest
            # tiebreak, in both directions (tag separates the sides, so
            # the extra column never reorders left rows relative to
            # right ones)
            order.append(F.col(tb).asc_nulls_first())
        return (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    is_ts = isinstance(
        left.schema[left_ts].dataType, (TimestampType, TimestampNTZType)
    )

    def num(c: Column) -> Column:
        return F.unix_micros(c.cast("timestamp")) if is_ts else c

    def tol_gate(m: Column, gap: Column) -> Column:
        if tolerance is None:
            return m
        return F.when(gap <= F.lit(tolerance), m)

    u = r2.unionByName(l2)
    if direction == "nearest":
        matched = (
            u.withColumn("__mb", F.last(pay, ignorenulls=True).over(w_of(False)))
            .withColumn("__mf", F.last(pay, ignorenulls=True).over(w_of(True)))
            .where(F.col(tag) == 1)
        )
        gb = num(F.col(t)) - num(F.col("__mb.__mt"))
        gf = num(F.col("__mf.__mt")) - num(F.col(t))
        mb = tol_gate(F.col("__mb"), gb)
        mf = tol_gate(F.col("__mf"), gf)
        matched = matched.withColumn(
            "__m",
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(gf < gb, mf)
            .otherwise(mb),
        )
    else:
        matched = (
            u.withColumn(
                "__m", F.last(pay, ignorenulls=True).over(w_of(direction == "forward"))
            ).where(F.col(tag) == 1)
        )
        gap = num(F.col(t)) - num(F.col("__m.__mt"))
        if direction == "forward":
            gap = -gap
        matched = matched.withColumn("__m", tol_gate(F.col("__m"), gap))
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
    if bucket < 1:
        # floor(x / 0) is NULL in Spark: every bin would be null and the
        # join would silently return zero rows instead of erroring
        raise ValueError(f"bucket must be >= 1, got {bucket!r}")
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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket: int,
    bounds: str = "[)",
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair of the same
    ``on`` key whose intervals overlap — ``"[)"`` (half-open, the
    session/outage convention: touching endpoints do NOT overlap) or
    ``"[]"`` (closed: they do). Completes the temporal-join family
    next to :func:`asof_join` (point↔point) and :func:`range_join`
    (point↔interval).

    Scale shape: both sides explode over the fixed-width bins their
    interval covers (``(hi-lo)/bucket + 1`` each — choose ``bucket``
    near the typical interval length so the factor stays ~2) and meet
    in a plain equi-join on ``(keys…, bin)`` — hash/sort-merge,
    AQE-skew-splittable, never a BroadcastNestedLoopJoin. A pair
    sharing k bins would surface k times; instead of a
    ``dropDuplicates`` shuffle, each pair is emitted EXACTLY ONCE, in
    the bin where the overlap starts (``bin ==
    floor(max(lo_l, lo_r)/bucket)`` — a map-side predicate).

    Timestamp bounds are binned/compared on their epoch-µs image
    (``bucket`` then in MICROSECONDS). Reversed intervals
    (``hi < lo``) are dropped — Spark's ``sequence`` would otherwise
    descend and fabricate bins. Zero-length intervals ``[x, x)`` are
    the EMPTY SET under half-open bounds, so ``"[)"`` drops them too
    (they'd otherwise read as overlapping any interval containing x);
    under ``"[]"`` they are points and kept. Column names must be
    disjoint across the two inputs apart from ``on``.
    """
    if bounds not in ("[]", "[)"):
        raise ValueError(f"bounds must be '[]' or '[)', got {bounds!r}")
    if bucket < 1:
        raise ValueError(f"bucket must be >= 1, got {bucket!r}")
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")

    b = "__iv_bin"

    def binned(df: DataFrame, lo_col: str, hi_col: str, lo_img: str) -> DataFrame:
        lo_n = _as_number(df, lo_col)
        hi_n = _as_number(df, hi_col)
        keep = hi_n > lo_n if bounds == "[)" else hi_n >= lo_n
        return (
            df.where(keep)
            .withColumn(lo_img, lo_n)
            .withColumn(
                b,
                F.explode(
                    F.sequence(
                        F.floor(F.col(lo_img) / F.lit(bucket)),
                        F.floor(hi_n / F.lit(bucket)),
                    )
                ),
            )
        )

    lb = binned(left, left_lo, left_hi, "__l_lo_n")
    rb = binned(right, right_lo, right_hi, "__r_lo_n")
    joined = lb.join(rb, [*on, b])
    llo, lhi = F.col(left_lo), F.col(left_hi)
    rlo, rhi = F.col(right_lo), F.col(right_hi)
    if bounds == "[]":
        cond = (llo <= rhi) & (rlo <= lhi)
    else:
        cond = (llo < rhi) & (rlo < lhi)
    emit_once = F.col(b) == F.floor(
        F.greatest(F.col("__l_lo_n"), F.col("__r_lo_n")) / F.lit(bucket)
    )
    return joined.where(cond & emit_once).drop(b, "__l_lo_n", "__r_lo_n")


def gap_fill_locf(
    observations: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    step_us: int,
    tiebreak_col: str | None = None,
    start_us: int | None = None,
    end_us: int | None = None,
) -> DataFrame:
    """Hypertable-style gap-fill: a fixed-step time grid per key, each
    grid point carrying the last observation at or before it (LOCF —
    last observation carried forward; null before the first one).

    The grid spans each key's own [min, max] observation window,
    aligned down to a ``step_us`` multiple (so grid timestamps are
    epoch-aligned bucket boundaries, comparable across keys); pass
    ``start_us`` / ``end_us`` (epoch-µs, inclusive) to pin either bound
    globally instead — every key then shares an identical grid, the
    shape a cross-key join or matrix export needs.

    Plan shape — the grid is GENERATED, never sorted: one lead-window
    over the observations (each observation learns its validity
    interval ``[ts, next ts)``) and each observation then
    ``sequence``+``explode``-s the grid points it covers MAP-SIDE,
    after the sort; the leading-gap (pre-first-observation) null rows
    come from the per-key bounds aggregate the same way. Two map-side-
    combined shuffles regardless of scale — the bounds aggregate and
    the observation window — and the only sorted relation is the
    observations themselves. The previous formulation (grid explode →
    as-of union window) sorted grid+observations TOGETHER: with a
    fine grid the sort input is dominated by the OUTPUT (sf100 probe:
    1.5G grid points over 100M events — 17.7 GB of memory spill
    through the dedup agg + as-of sort; the interval formulation
    sorts 100M rows and spills nothing, SHUFFLE_r09.md).

    Duplicate observations per (key, ts): the one with the greatest
    ``tiebreak_col`` wins — duplicates resolve INSIDE the window's
    existing per-key sort (non-winners get an empty validity interval),
    costing no extra shuffle. Without ``tiebreak_col`` a dedup
    aggregate (max per value column) is the only deterministic option
    and adds a third shuffle (its (key, ts) grouping is near-raw
    cardinality over real telemetry — prefer the tiebreak).

    Output: keys…, ``ts`` (grid point, µs-exact timestamp), ``obs_us``
    (µs of the carried observation, null in leading gaps), and the
    ``value_cols`` as carried.
    """
    step = F.lit(step_us)
    obs_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    if tiebreak_col is None:
        obs = observations.groupBy(*keys, obs_us.alias("__us")).agg(
            *[F.max(c).alias(c) for c in value_cols]
        )
        order = [F.col("__us").asc()]
    else:
        obs = observations.select(
            *keys, obs_us.alias("__us"), *value_cols,
            F.col(tiebreak_col).alias("__tb"),
        )
        # duplicates sort before their max-tiebreak winner: lead(ts)
        # hands every non-winner its own ts back -> empty interval
        order = [F.col("__us").asc(), F.col("__tb").asc_nulls_first()]

    # integer alignment (x - floormod(x, step)): float division could
    # lose a µs near 2^53. Grid points are epoch multiples of step, so
    # alignment needs no per-key anchor. pmod, not % — Spark's % is
    # truncated (sign-of-dividend), so for NEGATIVE (pre-1970) epochs
    # `c - c % step` would round toward zero, i.e. UP: cov_hi =
    # down(next-1) could reach into the next observation's interval and
    # emit the same grid point twice with conflicting LOCF values. pmod
    # is non-negative for positive step, making down()/up() true
    # floor/ceil alignment on the whole int64 line (mirrored with
    # ((x % s + s) % s) in the DuckDB oracle).
    def down(c: Column) -> Column:
        return c - F.pmod(c, step)

    def up(c: Column) -> Column:
        return c + F.pmod(step - F.pmod(c, step), step)

    w_ord = Window.partitionBy(*keys).orderBy(*order)
    w_all = Window.partitionBy(*keys)
    lo = (
        F.lit(int(start_us) - int(start_us) % step_us)
        if start_us is not None
        else down(F.min("__us").over(w_all))
    )
    hi_g = (
        F.lit(int(end_us) - int(end_us) % step_us)
        if end_us is not None
        else down(F.max("__us").over(w_all))
    )
    nxt = F.lead("__us").over(w_ord)
    cov_lo = F.greatest(up(F.col("__us")), lo)
    cov_hi = F.least(F.coalesce(down(nxt - 1), hi_g), hi_g)
    covered = (
        obs.withColumn("__lo", cov_lo)
        .withColumn("__hi", cov_hi)
        .where(F.col("__lo") <= F.col("__hi"))
        .select(
            *keys,
            F.explode(F.sequence("__lo", "__hi", step)).alias("__g_us"),
            F.col("__us").alias("obs_us"),
            *value_cols,
        )
    )
    bounds = observations.groupBy(*keys).agg(F.min(obs_us).alias("__mn"))
    gap_lo = (
        F.lit(int(start_us) - int(start_us) % step_us)
        if start_us is not None
        else down(F.col("__mn"))
    )
    gap_hi_cap = (
        F.lit(int(end_us) - int(end_us) % step_us)
        if end_us is not None
        else None
    )
    gap_hi = down(F.col("__mn") - 1)
    if gap_hi_cap is not None:
        gap_hi = F.least(gap_hi, gap_hi_cap)
    gaps = (
        bounds.withColumn("__lo", gap_lo)
        .withColumn("__hi", gap_hi)
        .where(F.col("__lo") <= F.col("__hi"))
        .select(
            *keys,
            F.explode(F.sequence("__lo", "__hi", step)).alias("__g_us"),
            F.lit(None).cast("long").alias("obs_us"),
            *[
                F.lit(None).cast(observations.schema[c].dataType).alias(c)
                for c in value_cols
            ],
        )
    )
    return gaps.unionByName(covered).select(
        *keys, F.timestamp_micros(F.col("__g_us")).alias("ts"), "obs_us", *value_cols
    )


def _bounded_local_right(
    right: DataFrame, cols: list[str], max_rows: int, max_bytes: int = 256_000_000
):
    """Collect the right side as pandas iff it fits BOTH ``max_rows``
    and an estimated ``max_bytes``. A row cap alone says nothing about
    width — 2M rows of 100 kB texts would be 200 GB on the driver — so
    one column-pruned pre-flight aggregate (8 bytes per scalar,
    octet_length for strings/binary, 8·size for arrays) bounds the
    Arrow transfer BEFORE any data moves; an oversized side costs the
    estimate job only, never a materialization. None when too big.

    The right side is computed twice (estimate, then fetch) by
    design: persisting it for the pair of jobs would MATERIALIZE an
    arbitrarily large right into executor memory/disk during the
    estimate — before the caps have ruled — which is exactly the
    failure mode the pre-flight exists to prevent. The second compute
    of a small right is the structural price of the safety property
    (measured ~0.3 s on events_asof's clicks aggregate at sf0.1).

    FIXED-WIDTH fast path: when every projected column is a scalar of
    known width (no string/binary/array), the byte cap is exactly a
    row cap (``max_bytes // per_row``), so ONE ``limit``-guarded
    collect replaces the estimate job + fetch job pair — same caps,
    same decision, half the jobs and one evaluation of the right side
    (events_asof's clicks aggregate: 5 build jobs → 2). Variable-width
    columns keep the two-pass estimate."""
    from pyspark.sql.types import ArrayType, BinaryType, StringType

    sel = right.select(*cols)
    var_width = [
        fld
        for fld in sel.schema.fields
        if isinstance(fld.dataType, (StringType, BinaryType, ArrayType))
    ]
    if not var_width:
        per_row_const = 8 + 8 * len(sel.schema.fields)
        cap = min(int(max_rows), int(max_bytes) // per_row_const)
        pdf = sel.limit(cap + 1).toPandas()
        if len(pdf) > cap:
            return None
        return pdf
    per_row = F.lit(8).cast("long")
    for fld in sel.schema.fields:
        if isinstance(fld.dataType, (StringType, BinaryType)):
            per_row = per_row + F.coalesce(
                F.octet_length(F.col(fld.name)).cast("long"), F.lit(0)
            ) + F.lit(8)
        elif isinstance(fld.dataType, ArrayType):
            per_row = per_row + F.coalesce(
                F.size(F.col(fld.name)).cast("long"), F.lit(0)
            ) * F.lit(8) + F.lit(8)
        else:
            per_row = per_row + F.lit(8)
    est = sel.select(F.count(F.lit(1)).alias("n"), F.sum(per_row).alias("b")).first()
    if int(est["n"] or 0) > max_rows or int(est["b"] or 0) > max_bytes:
        return None
    return sel.toPandas()


def _asof_broadcast(
    left: DataFrame,
    right: DataFrame,
    right_pdf,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str,
    direction: str,
    matched_ts: str,
    suffix: str,
    tolerance,
) -> DataFrame:
    """Broadcast tier of :func:`asof_join`: the right side, sorted per
    key, rides a broadcast; each left Arrow batch resolves its matches
    with one ``np.searchsorted`` per key group — map-only, ZERO shuffle
    (plan-asserted in tests). ``right`` supplies output TYPES only; the
    data is ``right_pdf``."""
    import numpy as np
    import pandas as pd

    spark = left.sparkSession
    rt_is_ts = isinstance(
        right.schema[right_ts].dataType, (TimestampType, TimestampNTZType)
    )
    lt_is_ts = isinstance(
        left.schema[left_ts].dataType, (TimestampType, TimestampNTZType)
    )
    if rt_is_ts or lt_is_ts:
        # toPandas/Arrow yield session-local naive datetimes whose
        # int64 image this tier reinterprets as UTC epoch-µs
        # (timestamp_micros on the way back) — under a non-UTC session
        # matched_ts would silently shift by the zone offset.
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
            raise ValueError(
                f"asof_join's broadcast tier requires spark.sql.session.timeZone"
                f"=UTC for timestamp columns (session has {tz!r}); set the "
                "session to UTC or pass mode='window'"
            )

    def ts_num(series):
        if np.issubdtype(series.dtype, np.datetime64):
            # .to_numpy() is load-bearing: a Series here would silently
            # switch the downstream indexing from positional to label
            return series.astype("datetime64[us]").astype("int64").to_numpy()
        return series.to_numpy()

    groups: dict = {}
    if len(right_pdf):
        rts_all = ts_num(right_pdf[right_ts])
        pay_all = {c: right_pdf[c].to_numpy() for c in payload}
        gb = right_pdf.groupby(on if len(on) > 1 else on[0], sort=False)
        for key, idx in gb.indices.items():
            k = key if isinstance(key, tuple) else (key,)
            order = np.argsort(rts_all[idx], kind="stable")
            sel = np.asarray(idx)[order]
            groups[k] = (rts_all[sel], {c: pay_all[c][sel] for c in payload})
    bc = spark.sparkContext.broadcast(groups)

    lcols = list(left.columns)
    # matched ts: µs double for timestamps (exact ≤ 2^53, cast back
    # below), native type otherwise; payload keeps the right side's
    # Spark types, carried as object arrays with None for misses
    mt_sql = "double" if rt_is_ts else right.schema[right_ts].dataType.simpleString()
    schema = ", ".join(
        [f"`{c}` {left.schema[c].dataType.simpleString()}" for c in lcols]
        + [f"`__mt` {mt_sql}"]
        + [
            f"`{c}{suffix}` {right.schema[c].dataType.simpleString()}"
            for c in payload
        ]
    )
    backward = direction == "backward"
    tol = tolerance

    def run(batches):
        g = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            lv_all = ts_num(pdf[left_ts])
            valid = pd.notna(pdf[left_ts]).to_numpy()
            mt = np.full(n, None, dtype=object)
            pay_out = {c: np.full(n, None, dtype=object) for c in payload}
            key_index: dict = {}
            for i, k in enumerate(zip(*[pdf[c] for c in on])):
                if valid[i]:
                    key_index.setdefault(k, []).append(i)
            for k, rows in key_index.items():
                ent = g.get(k)
                if ent is None:
                    continue
                rts, pays = ent
                rows = np.asarray(rows)
                lv = lv_all[rows]

                def side(back: bool):
                    if back:
                        p = np.searchsorted(rts, lv, side="right") - 1
                        o = p >= 0
                    else:
                        p = np.searchsorted(rts, lv, side="left")
                        o = p < len(rts)
                    safe = np.clip(p, 0, len(rts) - 1)
                    gp = (lv - rts[safe]) if back else (rts[safe] - lv)
                    if tol is not None:
                        o = o & (gp <= tol)
                    return p, o, gp

                if direction == "nearest":
                    pb, okb, gpb = side(True)
                    pf, okf, gpf = side(False)
                    # smaller gap wins; ties -> backward (pandas' rule)
                    use_f = okf & (~okb | (gpf < gpb))
                    pos = np.where(use_f, pf, pb)
                    ok = okb | okf
                else:
                    pos, ok, _ = side(backward)
                hit, hpos = rows[ok], pos[ok]
                # fancy-indexed assignment: object arrays accept numpy
                # slices directly, no per-row Python loop
                mval = rts[hpos].astype("float64") if rt_is_ts else rts[hpos]
                mt[hit] = mval
                for c in payload:
                    pay_out[c][hit] = pays[c][hpos]
            out = pdf[lcols].copy()
            out["__mt"] = mt
            for c in payload:
                out[c + suffix] = pay_out[c]
            if how == "inner":
                out = out[pd.notna(out["__mt"])]
            yield out

    res = left.mapInPandas(run, schema)
    mt_col = (
        F.timestamp_micros(F.col("__mt").cast("long")).cast(
            right.schema[right_ts].dataType
        )
        if rt_is_ts
        else F.col("__mt")
    )
    return res.select(
        *lcols, mt_col.alias(matched_ts), *[F.col(c + suffix) for c in payload]
    )
