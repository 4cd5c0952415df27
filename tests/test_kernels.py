"""Deterministic kernels: hash rng, sequencers, permutations.

The engine's idempotence rests on these being pure functions of
(seed, index) with three bit-identical implementations (numpy / Spark
Column / DuckDB SQL).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from sdvg_spark.core.rng import derive_seed, frf_col, frf_cte_chain, frf_np
from sdvg_spark.core.sequence import (
    LFSR_TABLE_CAP,
    feistel_np,
    lfsr_walk,
    ordered_np,
    perm_np,
    resolve_mode,
)


def test_frf_range_and_determinism():
    x = np.arange(10_000, dtype=np.uint64)
    a = frf_np(x)
    b = frf_np(x)
    assert np.array_equal(a, b)
    assert (a >= 0).all() and (a < 1).all()
    # roughly uniform
    assert 0.45 < a.mean() < 0.55


def test_derive_seed_stable():
    # frozen contract values — changing the seed derivation silently
    # breaks idempotent regeneration of existing datasets
    s1 = derive_seed(42, "m.col")
    assert s1 == derive_seed(42, "m.col")
    assert s1 != derive_seed(43, "m.col")
    assert s1 != derive_seed(42, "m.col2")
    assert 0 <= s1 < (1 << 64)


def test_frf_col_matches_numpy(spark):
    ids = np.arange(5000, dtype=np.uint64)
    seed = derive_seed(7, "m.c")
    # seed may exceed int64; emulate the engine's wrap to signed
    s64 = seed - (1 << 64) if seed >= (1 << 63) else seed
    expected = frf_np(ids + np.uint64(seed))
    got = np.array(
        [
            r.r
            for r in spark.range(5000)
            .select(
                F.col("id"),
                frf_col(F.col("id") + F.lit(s64).cast("long")).alias("r"),
            )
            .orderBy("id")
            .collect()
        ]
    )
    assert np.allclose(got, expected, rtol=0, atol=0)


def test_frf_cte_chain_matches_numpy():
    ids = np.arange(1000, dtype=np.uint64)
    seed = derive_seed(11, "x.y")
    expected = frf_np(ids + np.uint64(seed))
    con = duckdb.connect()
    chain, final = frf_cte_chain(
        "src", f"(i + {seed})", carry=["i"], out="r"
    )
    rows = con.execute(
        f"WITH src AS (SELECT range::BIGINT AS i FROM range(1000)), {chain} "
        f"SELECT r FROM {final} ORDER BY i"
    ).fetchall()
    got = np.array([r[0] for r in rows])
    assert np.allclose(got, expected, rtol=0, atol=0)


@pytest.mark.parametrize("mode", ["lfsr", "feistel"])
@pytest.mark.parametrize("n", [1, 2, 7, 64, 1000, 4097])
def test_perm_bijective(mode, n):
    idx = np.arange(n, dtype=np.uint64)
    out = perm_np(idx, n, seed=5, mode=mode)
    assert sorted(out.tolist()) == list(range(n))


def test_perm_seed_sensitivity():
    idx = np.arange(1000, dtype=np.uint64)
    a = perm_np(idx, 1000, seed=1, mode="feistel")
    b = perm_np(idx, 1000, seed=2, mode="feistel")
    assert not np.array_equal(a, b)


def test_perm_cycles():
    """Indices beyond the domain repeat the same permutation order."""
    n = 257
    idx = np.arange(n, dtype=np.uint64)
    first = perm_np(idx, n, seed=3, mode="feistel")
    second = perm_np(idx + np.uint64(n), n, seed=3, mode="feistel")
    assert np.array_equal(first, second)


def test_lfsr_walk_full_period():
    walk = lfsr_walk(100, seed=9)
    assert sorted(walk.tolist()) == list(range(100))


def test_resolve_mode_caps_lfsr():
    assert resolve_mode(1000, "auto") == "lfsr"
    assert resolve_mode(LFSR_TABLE_CAP + 1, "auto") == "feistel"


def test_ordered_sequencer():
    k = np.arange(10, dtype=np.uint64)
    out = ordered_np(k, distinct=5, cycle=10)
    assert out.tolist() == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]
    # monotone step function, hits every distinct value
    assert sorted(set(out.tolist())) == [0, 1, 2, 3, 4]


def test_feistel_large_domain():
    n = 10**12
    idx = np.array([0, 1, n - 1, n // 2], dtype=np.uint64)
    out = feistel_np(idx, n, seed=1)
    assert (out < n).all()
    # injective on the sample
    assert len(set(out.tolist())) == len(out)


def test_frf_matches_pure_python_reference():
    """Independent check of the Go fastRandomFloat formula
    (reference generator/utils.go:180-196) using Python bigints —
    catches any numpy uint64 semantics drift."""
    import numpy as np

    from sdvg_spark.core.rng import MASK64, frf_np

    def go_frf(seed: int) -> float:
        seed = (seed + 0x9E3779B97F4A7C15) & MASK64
        seed ^= seed >> 30
        seed = (seed * 0xBF58476D1CE4E5B9) & MASK64
        seed ^= seed >> 27
        seed = (seed * 0x94D049BB133111EB) & MASK64
        seed ^= seed >> 31
        seed ^= seed >> 12
        seed = (seed ^ (seed << 25)) & MASK64
        seed ^= seed >> 27
        return seed / float(MASK64)

    xs = [0, 1, 2, 42, 12345678901234567890, MASK64, MASK64 - 1, 2**63, 977]
    got = frf_np(np.array([x & MASK64 for x in xs], dtype=np.uint64))
    for x, g in zip(xs, got):
        assert g == go_frf(x & MASK64), (x, g, go_frf(x & MASK64))
