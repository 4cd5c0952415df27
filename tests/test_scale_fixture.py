"""Guards on tools/make_scale.py — the scale-fixture builder.

The sf100 probes are only evidence if the fixture is sound: replica
content variants must be pairwise disjoint when composed across build
levels, or cross-replica duplicate classes reappear and the dedup/ANN
rows measure a corrupted corpus (the r9 ADVICE finding: cyclic
rotations reduce mod dims and collided on 36 of 100 grid pairs)."""

from __future__ import annotations

import importlib.util
import os

import pytest

_MS_PATH = os.path.join(
    os.path.dirname(__file__), "..", "tools", "make_scale.py"
)


def _ms():
    spec = importlib.util.spec_from_file_location("make_scale_t", _MS_PATH)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_variant_permutations_disjoint_across_levels():
    ms = _ms()
    # the grids actually used: sf0.1->sf1 (stride 1), sf1->sf10
    # (stride 10), sf10->sf100 (stride 100), at the fixture's 64 dims
    for stride in (1, 10, 100):
        ms.assert_disjoint_variants(10, stride, 64)


def test_old_rotation_grid_would_have_collided():
    """The defect the permutation fix removes: composed cyclic
    rotations reduce mod dims. Keep the demonstration as a regression
    sentinel — if someone reintroduces rotations, the disjointness
    assert above must be what stops them, and this test documents
    why."""
    def rot(v, dims=64):
        r = v % dims
        return tuple(list(range(r, dims)) + list(range(0, r)))

    seen = {}
    collisions = 0
    for outer in range(10):
        po = rot(outer * 100)
        for inner in range(10):
            comp = tuple(rot(inner)[po[i]] for i in range(64))
            if comp in seen:
                collisions += 1
            seen[comp] = (outer, inner)
    assert collisions == 36  # the measured r9 defect size


def test_dim_permutation_is_isometry():
    import numpy as np

    ms = _ms()
    perm = ms._dim_perm(101, 64)
    assert sorted(perm) == list(range(64))
    rng = np.random.default_rng(3)
    X = rng.normal(size=(50, 64))
    P = X[:, list(perm)]
    # norms and pairwise dot products preserved exactly
    assert np.allclose(np.linalg.norm(X, axis=1), np.linalg.norm(P, axis=1))
    assert np.allclose(X @ X.T, P @ P.T)
    assert ms._dim_perm(0, 64) == tuple(range(64))  # replica 0 identity


def test_collision_guard_raises_on_bad_grid():
    ms = _ms()
    real = ms._dim_perm

    def fake(v, dims):  # every variant maps to the identity
        return tuple(range(dims))

    ms._dim_perm = fake
    try:
        with pytest.raises(AssertionError, match="variant collision"):
            ms.assert_disjoint_variants(10, 100, 64)
    finally:
        ms._dim_perm = real
