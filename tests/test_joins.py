"""As-of join and range join: semantics on hand-checkable data, and
plan-shape assertions (no join at all for as-of; never a nested-loop /
cartesian for the range join)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sdvg_spark.ops.joins import asof_join, range_join


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d"), (3, 7, "e")],
        "k int, t int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 150), (2, 11, 211), (9, 1, 901)],
        "k int, t int, payload int",
    )
    return left, right


def test_asof_backward_left(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t", payload=["payload"]
    )
    got = {(r.k, r.t): (r.matched_ts, r.payload) for r in out.collect()}
    assert got == {
        (1, 10): (10, 100),  # tie: equal ts is eligible (>=)
        (1, 20): (15, 150),  # latest prior, not just any prior
        (1, 5): (None, None),  # nothing at or before
        (2, 10): (None, None),  # right row is later
        (3, 7): (None, None),  # key absent on the right
    }
    assert out.count() == left.count()  # left join keeps everything


def test_asof_forward_and_inner(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        payload=["payload"], direction="forward", how="inner",
    )
    got = {(r.k, r.t): (r.matched_ts, r.payload) for r in out.collect()}
    assert got == {
        (1, 10): (10, 100),  # equal ts eligible forward too
        (1, 5): (10, 100),   # earliest following
        (2, 10): (11, 211),
    }  # (1,20) and (3,7) dropped by inner


def test_asof_payload_fields_come_from_same_row(spark):
    # a right row with a NULL payload field must not be "patched" by an
    # older row's value — the struct carry guarantees row coherence
    left = spark.createDataFrame([(1, 30)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 10, "old", 1), (1, 20, None, 2)], "k int, t int, a string, b int"
    )
    row = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t", payload=["a", "b"]
    ).first()
    assert (row.matched_ts, row.a, row.b) == (20, None, 2)


def test_asof_is_joinless_single_shuffle(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t", payload=["payload"],
        mode="window",
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan  # union+window, no join operator at all
    # exactly one shuffle: the window's hashpartitioning over the union
    assert plan.count("hashpartitioning") == 1


def test_asof_broadcast_tier_is_map_only(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t", payload=["payload"],
        mode="broadcast",
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan  # zero shuffle: broadcast + searchsorted
    assert "Join" not in plan
    # oversized right side must refuse loudly in forced-broadcast mode
    with pytest.raises(ValueError, match="broadcast_max_rows"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                  payload=["payload"], mode="broadcast", broadcast_max_rows=2)


def test_asof_rejects_collisions_and_bad_args(spark):
    left, right = _asof_fixture(spark)
    with pytest.raises(ValueError, match="collides"):
        # 'tag' exists on the left
        asof_join(left, right.withColumnRenamed("payload", "tag"),
                  on=["k"], left_ts="t", right_ts="t", payload=["tag"])
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                  payload=["payload"], how="outer")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                  payload=["payload"], direction="sideways")


@pytest.mark.parametrize("bounds", ["[]", "[)", "(]", "()"])
def test_range_join_matches_naive(spark, bounds):
    import random

    rng = random.Random(7)
    pts = [(rng.randrange(3), i, rng.randrange(0, 1000)) for i in range(200)]
    ivs = []
    for j in range(40):
        lo = rng.randrange(0, 950)
        ivs.append((rng.randrange(3), j, lo, lo + rng.randrange(0, 120)))
    points = spark.createDataFrame(pts, "k int, pid int, p int")
    intervals = spark.createDataFrame(ivs, "k int, iid int, lo int, hi int")
    out = range_join(
        points, intervals, on=["k"], point_col="p", lo_col="lo", hi_col="hi",
        bucket=64, bounds=bounds,
    )
    got = {(r.iid, r.pid) for r in out.collect()}
    lo_ok = (lambda p, lo: p >= lo) if bounds[0] == "[" else (lambda p, lo: p > lo)
    hi_ok = (lambda p, hi: p <= hi) if bounds[1] == "]" else (lambda p, hi: p < hi)
    want = {
        (j[1], i[1])
        for i in pts
        for j in ivs
        if i[0] == j[0] and lo_ok(i[2], j[2]) and hi_ok(i[2], j[3])
    }
    assert got == want


def test_range_join_no_nested_loop(spark):
    points = spark.createDataFrame([(1, 1, 5)], "k int, pid int, p int")
    intervals = spark.createDataFrame([(1, 1, 0, 10)], "k int, iid int, lo int, hi int")
    out = range_join(
        points, intervals, on=["k"], point_col="p", lo_col="lo", hi_col="hi",
        bucket=8,
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert out.count() == 1


def test_range_join_timestamps_and_ambiguity(spark):
    points = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:05:00")], "k int, pid int, p string"
    ).withColumn("p", F.col("p").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", "2024-01-01 00:10:00"),
         (1, 2, "2024-01-01 00:06:00", "2024-01-01 00:10:00")],
        "k int, iid int, lo string, hi string",
    ).withColumn("lo", F.col("lo").cast("timestamp")).withColumn(
        "hi", F.col("hi").cast("timestamp"))
    out = range_join(
        points, intervals, on=["k"], point_col="p", lo_col="lo", hi_col="hi",
        bucket=60_000_000,  # 1-minute µs bins
    )
    assert [r.iid for r in out.collect()] == [1]
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(points.withColumnRenamed("p", "lo"), intervals,
                   on=["k"], point_col="lo", lo_col="lo", hi_col="hi", bucket=1)


def test_gap_fill_locf(spark):
    from sdvg_spark.ops.joins import gap_fill_locf

    obs = spark.createDataFrame(
        [
            # key 1: events at t=15µs and t=33µs; grid step 10 -> 10,20,30
            (1, 15, 1.5, 100),
            # duplicate at the same (key, ts): greater tiebreak must win
            (1, 15, 9.9, 99),
            (1, 33, 3.3, 101),
            # key 2: single event exactly on a grid boundary
            (2, 20, 2.0, 200),
        ],
        "k int, t long, v double, seq long",
    ).withColumn("t", F.timestamp_micros(F.col("t")))
    out = gap_fill_locf(
        obs, keys=["k"], ts_col="t", value_cols=["v"],
        step_us=10, tiebreak_col="seq",
    )
    # grid timestamps are µs past the epoch -> read the microsecond field
    got = {(r.k, r.ts.microsecond): (r.obs_us, r.v) for r in out.collect()}
    assert got == {
        (1, 10): (None, None),  # leading gap before the first event
        (1, 20): (15, 1.5),     # carried forward; seq=100 beat seq=99
        (1, 30): (15, 1.5),     # still carried across an empty bucket
        (2, 20): (20, 2.0),     # boundary-aligned event is eligible (>=)
    }


def test_gap_fill_locf_negative_epochs_floor_aligned(spark):
    """Pre-1970 timestamps: grid alignment must FLOOR on the whole
    int64 line (pmod), not round toward zero. The r9 advice
    counterexample: step=6, obs at -7µs and 0µs — truncated % aligned
    down(-7-? ) wrongly so grid point 0 was emitted by BOTH
    observations with conflicting LOCF values. Floor alignment gives
    every grid point exactly one owner."""
    from sdvg_spark.ops.joins import gap_fill_locf

    obs = spark.createDataFrame(
        [(1, -7, 1.0, 1), (1, 0, 2.0, 2)],
        "k int, t long, v double, seq long",
    ).withColumn("t", F.timestamp_micros(F.col("t")))
    out = gap_fill_locf(
        obs, keys=["k"], ts_col="t", value_cols=["v"],
        step_us=6, tiebreak_col="seq",
    )
    rows = [
        (int(r["g"]), r.obs_us, r.v)
        for r in out.selectExpr("unix_micros(ts) as g", "obs_us", "v").collect()
    ]
    assert sorted(rows) == [
        (-12, None, None),  # floor(-7/6)*6 = -12: leading gap bucket
        (-6, -7, 1.0),      # -7's interval covers [-6, -1] -> grid -6
        (0, 0, 2.0),        # 0 owns its own boundary point, exactly once
    ]
    assert len(rows) == len(set(r[0] for r in rows))  # no duplicate grid points


def test_joins_ops_empty_inputs(spark):
    """Empty sides must yield empty (or fully-null-payload) results, not
    crash — no guard branches needed, the plans are closed under empty
    relations; this pins that."""
    from sdvg_spark.ops.joins import gap_fill_locf

    left = spark.createDataFrame([(1, 10, "a")], "k int, t int, tag string")
    e_l = left.limit(0)
    right = spark.createDataFrame([(1, 5, 50)], "k int, t int, payload int")
    e_r = right.limit(0)
    assert asof_join(e_l, right, on=["k"], left_ts="t", right_ts="t",
                     payload=["payload"]).count() == 0
    row = asof_join(left, e_r, on=["k"], left_ts="t", right_ts="t",
                    payload=["payload"]).first()
    assert (row.matched_ts, row.payload) == (None, None)
    ivs = spark.createDataFrame([(1, 1, 0, 10)], "k int, iid int, lo int, hi int")
    assert range_join(left.selectExpr("k", "t as p"), ivs.limit(0),
                      on=["k"], point_col="p", lo_col="lo", hi_col="hi",
                      bucket=8).count() == 0
    assert gap_fill_locf(e_r.selectExpr("k", "t", "payload as v"),
                         keys=["k"], ts_col="t", value_cols=["v"],
                         step_us=10).count() == 0


def test_asof_tolerance(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        payload=["payload"], tolerance=3,
    )
    got = {(r.k, r.t): (r.matched_ts, r.payload) for r in out.collect()}
    # (1,10) matches (1,10): gap 0 <= 3; (1,20)'s nearest is (1,15): gap 5 -> nulled
    assert got[(1, 10)] == (10, 100)
    assert got[(1, 20)] == (None, None)
    inner = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        payload=["payload"], tolerance=3, how="inner",
    )
    assert {(r.k, r.t) for r in inner.collect()} == {(1, 10)}


@pytest.mark.parametrize("mode", ["window", "broadcast"])
@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("how", ["left", "inner"])
def test_asof_matches_naive_randomized(spark, direction, how, mode):
    """asof_join vs a pure-Python reference over seeded random data:
    many keys, equal-timestamp ties, keys missing on either side, and a
    tolerance — every (direction, how, tier) combination, so the two
    independent tier implementations are also checked against each
    other."""
    import random

    rng = random.Random(direction + how)
    left = [(rng.randrange(6), rng.randrange(50), i) for i in range(300)]
    right = {}
    for j in range(150):
        k, t = rng.randrange(8), rng.randrange(50)
        # unique per (key, ts): the operator's right-side contract
        right[(k, t)] = 1000 + j
    tol = 7

    def expected(k, t):
        if direction == "backward":
            cands = [(rt, p) for (rk, rt), p in right.items()
                     if rk == k and rt <= t and t - rt <= tol]
            return max(cands) if cands else None
        cands = [(rt, p) for (rk, rt), p in right.items()
                 if rk == k and rt >= t and rt - t <= tol]
        return min(cands) if cands else None

    ldf = spark.createDataFrame(left, "k int, t int, lid int")
    rdf = spark.createDataFrame(
        [(k, t, p) for (k, t), p in right.items()], "k int, t int, payload int"
    )
    out = asof_join(
        ldf, rdf, on=["k"], left_ts="t", right_ts="t", payload=["payload"],
        direction=direction, how=how, tolerance=tol, mode=mode,
    )
    got = {r.lid: (r.matched_ts, r.payload) for r in out.collect()}
    for k, t, lid in left:
        want = expected(k, t)
        if want is None:
            if how == "left":
                assert got[lid] == (None, None), (k, t)
            else:
                assert lid not in got, (k, t)
        else:
            assert got[lid] == want, (k, t)


def test_asof_null_keys_follow_join_semantics(spark):
    """A null key must match NOTHING (join semantics) — the window
    partition would otherwise pair null with null."""
    left = spark.createDataFrame([(None, 10, 1), (1, 10, 2)], "k int, t int, lid int")
    right = spark.createDataFrame([(None, 5, 500), (1, 5, 100)], "k int, t int, payload int")
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                    payload=["payload"])
    got = {r.lid: r.payload for r in out.collect()}
    assert got == {1: None, 2: 100}
    inner = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                      payload=["payload"], how="inner")
    assert [r.lid for r in inner.collect()] == [2]


@pytest.mark.parametrize("mode", ["window", "broadcast"])
def test_asof_timestamp_types_randomized(spark, mode):
    """Same randomized cross-check but with real TIMESTAMP columns —
    the broadcast tier's datetime path (pandas datetime64 → µs ndarray)
    is a separate code path from the integer one and once hid a
    label-vs-position indexing bug the int fixture could not catch."""
    import random

    rng = random.Random(mode)
    left = [(rng.randrange(4), rng.randrange(0, 3_600) * 1_000_000, i)
            for i in range(200)]
    right = {}
    for j in range(80):
        right[(rng.randrange(5), rng.randrange(0, 3_600) * 1_000_000)] = 100 + j

    ldf = spark.createDataFrame(left, "k int, us long, lid int").withColumn(
        "t", F.timestamp_micros(F.col("us")))
    rdf = spark.createDataFrame(
        [(k, t, p) for (k, t), p in right.items()], "k int, us long, payload int"
    ).withColumn("t", F.timestamp_micros(F.col("us")))
    out = asof_join(ldf.drop("us"), rdf.drop("us"),
                    on=["k"], left_ts="t", right_ts="t",
                    payload=["payload"], mode=mode)
    got = {r.lid: (r.matched_ts, r.payload) for r in out.collect()}

    def expected(k, us):
        c = [(rt, p) for (rk, rt), p in right.items() if rk == k and rt <= us]
        return max(c) if c else None

    from datetime import datetime, timezone
    for k, us, lid in left:
        want = expected(k, us)
        if want is None:
            assert got[lid] == (None, None), (k, us)
        else:
            mt, p = got[lid]
            assert p == want[1], (k, us)
            assert int(mt.replace(tzinfo=timezone.utc).timestamp() * 1e6) == want[0] \
                or int(mt.timestamp() * 1e6) == want[0]


@pytest.mark.parametrize("mode", ["window", "broadcast"])
def test_asof_nearest_matches_naive(spark, mode):
    """direction='nearest' vs a pure-Python reference (smaller |gap|
    wins, ties to the backward match, tolerance gates each side) on
    both tiers."""
    import random

    rng = random.Random("near" + mode)
    left = [(rng.randrange(5), rng.randrange(60), i) for i in range(250)]
    right = {}
    for j in range(100):
        right[(rng.randrange(6), rng.randrange(60))] = 1000 + j
    tol = 5

    def expected(k, t):
        back = [(rt, p) for (rk, rt), p in right.items()
                if rk == k and rt <= t and t - rt <= tol]
        fwd = [(rt, p) for (rk, rt), p in right.items()
               if rk == k and rt >= t and rt - t <= tol]
        b = max(back) if back else None
        f = min(fwd) if fwd else None
        if b is None:
            return f
        if f is None:
            return b
        return f if (f[0] - t) < (t - b[0]) else b  # tie -> backward

    ldf = spark.createDataFrame(left, "k int, t int, lid int")
    rdf = spark.createDataFrame(
        [(k, t, p) for (k, t), p in right.items()], "k int, t int, payload int"
    )
    out = asof_join(ldf, rdf, on=["k"], left_ts="t", right_ts="t",
                    payload=["payload"], direction="nearest",
                    tolerance=tol, mode=mode)
    got = {r.lid: (r.matched_ts, r.payload) for r in out.collect()}
    for k, t, lid in left:
        assert got[lid] == (expected(k, t) or (None, None)), (k, t, mode)


def test_gap_fill_pinned_global_bounds(spark):
    """start_us/end_us pin an identical grid for every key — the shape
    a cross-key join or matrix export needs."""
    from sdvg_spark.ops.joins import gap_fill_locf

    obs = spark.createDataFrame(
        [(1, 15, 1.5), (2, 37, 2.0)], "k int, t long, v double"
    ).withColumn("t", F.timestamp_micros(F.col("t")))
    out = gap_fill_locf(
        obs, keys=["k"], ts_col="t", value_cols=["v"],
        step_us=10, start_us=10, end_us=40,
    )
    grids = {}
    for r in out.collect():
        grids.setdefault(r.k, []).append(r.ts.microsecond)
    assert sorted(grids[1]) == sorted(grids[2]) == [10, 20, 30, 40]
    vals = {(r.k, r.ts.microsecond): r.v for r in out.collect()}
    assert vals[(1, 10)] is None and vals[(1, 20)] == 1.5
    assert vals[(2, 30)] is None and vals[(2, 40)] == 2.0


def test_range_join_rejects_zero_bucket(spark):
    """bucket=0 would make floor(x/0) NULL (all bins null, silent empty
    join) — it must raise instead."""
    import pytest

    from sdvg_spark.ops.joins import range_join

    pts = spark.createDataFrame([(1, 5)], "k int, p long")
    ivs = spark.createDataFrame([(1, 0, 10)], "k int, lo long, hi long")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="bucket"):
            range_join(pts, ivs, on=["k"], point_col="p",
                       lo_col="lo", hi_col="hi", bucket=bad)


def test_asof_auto_byte_cap_routes_wide_payload_to_window(spark):
    """A right side under the row cap but over the BYTE cap (wide text
    payload) must take the window tier, not collect to the driver —
    and still produce identical values."""
    from sdvg_spark.ops.joins import asof_join

    left = spark.createDataFrame([(1, 10), (1, 25)], "k int, t long")
    right = spark.createDataFrame(
        [(1, 5, "x" * 1000), (1, 20, "y" * 1000)], "k int, t int, payload string"
    )
    kw = dict(on=["k"], left_ts="t", right_ts="t", payload=["payload"])
    capped = asof_join(left, right, **kw, broadcast_max_bytes=500)
    # zero-shuffle broadcast tier would have no Exchange; the capped
    # plan must fall back to the one-shuffle window tier
    assert "Exchange" in capped._jdf.queryExecution().executedPlan().toString()
    uncapped = asof_join(left, right, **kw)
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, uncapped.collect()))


def test_asof_broadcast_tier_rejects_non_utc_session(spark):
    """The broadcast tier reinterprets collected naive datetimes as UTC
    epoch-µs; a non-UTC session must raise, not silently shift."""
    import pytest

    from sdvg_spark.ops.joins import asof_join

    left = spark.createDataFrame([(1, 10)], "k int, t long").withColumn(
        "t", F.timestamp_micros(F.col("t"))
    )
    right = spark.createDataFrame([(1, 5, 1.0)], "k int, t long, v double").withColumn(
        "t", F.timestamp_micros(F.col("t"))
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="timeZone"):
            asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                      payload=["v"], mode="broadcast")
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_interval_join_matches_naive_predicate_join(spark):
    """The bucketed emit-once form must equal the naive overlap
    predicate join exactly — every pair once, across bucket widths that
    slice intervals into 1..many bins, for both bounds conventions;
    reversed intervals are dropped."""
    from sdvg_spark.ops.joins import interval_join

    left = spark.createDataFrame(
        [
            # (key, id, lo, hi): nested, touching, disjoint, zero-length,
            # long spans, reversed (dropped)
            (1, 10, 0, 100), (1, 11, 50, 60), (1, 12, 100, 200),
            (1, 13, 500, 500), (2, 20, 0, 1000), (2, 21, 30, 20),
        ],
        "k int, l_id int, l_lo long, l_hi long",
    )
    right = spark.createDataFrame(
        [
            (1, 90, 60, 100), (1, 91, 100, 150), (1, 92, 55, 58),
            (1, 93, 500, 500), (1, 94, 400, 600),
            (2, 95, 999, 2000), (2, 96, 1000, 1500),
        ],
        "k int, r_id int, r_lo long, r_hi long",
    )
    for bounds in ("[)", "[]"):
        lo_l, hi_l = F.col("l_lo"), F.col("l_hi")
        lo_r, hi_r = F.col("r_lo"), F.col("r_hi")
        if bounds == "[]":
            cond = (lo_l <= hi_r) & (lo_r <= hi_l)
            keep_l, keep_r = hi_l >= lo_l, hi_r >= lo_r
        else:
            # [x, x) is the empty set: zero-length intervals match
            # nothing under half-open bounds (they are dropped, not
            # treated as points inside longer intervals)
            cond = (lo_l < hi_r) & (lo_r < hi_l)
            keep_l, keep_r = hi_l > lo_l, hi_r > lo_r
        naive = sorted(
            (r.l_id, r.r_id)
            for r in left.where(keep_l)
            .join(right.where(keep_r), "k")
            .where(cond)
            .collect()
        )
        for bucket in (1, 7, 64, 10_000):
            got = sorted(
                (r.l_id, r.r_id)
                for r in interval_join(
                    left, right, on=["k"],
                    left_lo="l_lo", left_hi="l_hi",
                    right_lo="r_lo", right_hi="r_hi",
                    bucket=bucket, bounds=bounds,
                ).collect()
            )
            assert got == naive, (bounds, bucket)


def test_interval_join_rejects_bad_args(spark):
    import pytest

    from sdvg_spark.ops.joins import interval_join

    df = spark.createDataFrame([(1, 0, 1)], "k int, lo long, hi long")
    df2 = spark.createDataFrame([(1, 0, 1)], "k int, lo2 long, hi2 long")
    with pytest.raises(ValueError, match="bucket"):
        interval_join(df, df2, on=["k"], left_lo="lo", left_hi="hi",
                      right_lo="lo2", right_hi="hi2", bucket=0)
    with pytest.raises(ValueError, match="bounds"):
        interval_join(df, df2, on=["k"], left_lo="lo", left_hi="hi",
                      right_lo="lo2", right_hi="hi2", bucket=1, bounds="(]")
    with pytest.raises(ValueError, match="ambiguous"):
        interval_join(df, df, on=["k"], left_lo="lo", left_hi="hi",
                      right_lo="lo", right_hi="hi", bucket=1)


@pytest.mark.parametrize("mode", ["window", "broadcast"])
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_right_tiebreak_matches_max_by_preagg(spark, direction, mode):
    """right_tiebreak must pick exactly the row a max_by(key, ts)
    pre-aggregation would have picked, in every direction and tier —
    the contract that lets gap_fill_locf drop its near-raw-cardinality
    dedup aggregate (the sf100 17.7 GB spill, SHUFFLE_r09)."""
    import random

    from sdvg_spark.ops.joins import asof_join

    rng = random.Random(42)
    right_rows = []
    seq = 0
    for k in ("a", "b"):
        for ts in range(0, 100, 7):
            for _ in range(rng.randint(1, 4)):  # duplicates per (k, ts)
                seq += 1
                right_rows.append((k, ts, seq * 11 % 97, float(seq)))
    right = spark.createDataFrame(right_rows, "k string, ts long, tb long, v double")
    left = spark.createDataFrame(
        [("a", t) for t in range(0, 100, 5)] + [("b", t) for t in range(3, 100, 9)],
        "k string, ts long",
    )
    # reference: deterministic max_by pre-agg then plain asof
    ded = right.groupBy("k", "ts").agg(F.max_by("v", "tb").alias("v"))
    want = {
        (r.k, r.ts): (r.matched_ts, r.v)
        for r in asof_join(
            left, ded, on=["k"], left_ts="ts", right_ts="ts",
            payload=["v"], direction=direction, suffix="_m", mode=mode,
        ).withColumnRenamed("v_m", "v").collect()
    }
    got = {
        (r.k, r.ts): (r.matched_ts, r.v)
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            payload=["v"], direction=direction, suffix="_m", mode=mode,
            right_tiebreak="tb",
        ).withColumnRenamed("v_m", "v").collect()
    }
    assert got == want


def test_asof_right_tiebreak_nulls_lose(spark):
    from sdvg_spark.ops.joins import asof_join

    right = spark.createDataFrame(
        [("a", 10, None, 1.0), ("a", 10, 5, 2.0), ("a", 10, 3, 3.0)],
        "k string, ts long, tb long, v double",
    )
    left = spark.createDataFrame([("a", 11)], "k string, ts long")
    for mode in ("window", "broadcast"):
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            payload=["v"], mode=mode, right_tiebreak="tb", suffix="_m",
        ).collect()
        assert len(out) == 1 and out[0]["v_m"] == 2.0, mode


def test_asof_right_tiebreak_unknown_column_raises(spark):
    from sdvg_spark.ops.joins import asof_join

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, ts long, v double")
    with pytest.raises(ValueError, match="right_tiebreak"):
        asof_join(df, df.drop("v"), on=["k"], left_ts="ts", right_ts="ts",
                  payload=[], right_tiebreak="nope")


def test_gap_fill_tiebreak_path_matches_preagg_path(spark):
    """gap_fill_locf with a tiebreak (in-window resolution, two
    shuffles) must produce exactly the rows of the explicit
    max_by-pre-aggregated formulation (its previous plan)."""
    import random

    from sdvg_spark.ops.joins import gap_fill_locf

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(6):
        for _ in range(rng.randint(2, 12)):
            eid += 1
            rows.append((u, rng.randint(0, 50) * 1_000_000, float(eid % 13), eid))
    obs = spark.createDataFrame(rows, "u long, ts long, v double, eid long")
    obs = obs.withColumn("ts", F.timestamp_micros("ts"))
    ded = (
        obs.groupBy("u", F.unix_micros("ts").alias("us"))
        .agg(F.max_by("v", "eid").alias("v"))
        .select("u", F.timestamp_micros("us").alias("ts"), "v",
                F.lit(0).alias("eid"))
    )
    kw = dict(keys=["u"], ts_col="ts", value_cols=["v"], step_us=7_000_000)
    want = sorted(map(tuple, gap_fill_locf(ded, tiebreak_col=None, **kw).collect()))
    got = sorted(
        map(tuple, gap_fill_locf(obs.select("u", "ts", "v", "eid"),
                                 tiebreak_col="eid", **kw).collect())
    )
    assert got == want


def test_gap_fill_tiebreak_plan_has_no_dedup_aggregate(spark):
    """The tiebreak path's window tier is TWO exchanges (bounds agg +
    as-of window) — the near-raw-cardinality (key, ts) dedup aggregate
    is gone from the plan, not just cheap."""
    from sdvg_spark.ops.joins import gap_fill_locf

    obs = spark.createDataFrame(
        [(1, 10_000_000, 1.0, 1)], "u long, ts long, v double, eid long"
    ).withColumn("ts", F.timestamp_micros("ts"))
    plan = (
        gap_fill_locf(obs, keys=["u"], ts_col="ts", value_cols=["v"],
                      step_us=1_000_000, tiebreak_col="eid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "max_by" not in plan
