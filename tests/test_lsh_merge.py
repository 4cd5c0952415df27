"""Task-merged LSH kernel (ops/ivf_merge.py:lsh_topk_merged): value
identity with the certified similarity.lsh_topk path, the bounded-pool
emission that replaces the batch triple buffer (the sf100
worker-killer, SHUFFLE_r09.md), and the cross-table pair dedup rule."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _embeddings(spark, n=150, dims=16):
    rng = np.random.default_rng(23)
    rows = []
    for i in range(n):
        v = rng.normal(size=dims)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    # NOTE: no planted exact-duplicate pairs here — two distinct ids
    # with identical vectors produce a true cosine tie whose computed
    # scores differ in the last ulp across gemm block shapes, so the
    # tie winner is legitimately batch-layout-dependent in BOTH
    # kernels (covered tie-aware in the kernel-level tests below).
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_merged_value_identical_to_lsh_topk(spark):
    from sdvg_spark.ops.ivf_merge import lsh_topk_merged
    from sdvg_spark.ops.similarity import lsh_topk

    emb = _embeddings(spark)
    q = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    kw = dict(k=5, n_planes=4, n_tables=6, multiprobe=1)
    a = {(r.q_id, r.rank): (r.c_id, r.cosine)
         for r in lsh_topk(emb, q, **kw).collect()}
    b = {(r.q_id, r.rank): (r.c_id, r.cosine)
         for r in lsh_topk_merged(emb, q, **kw).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for key, (cid, cos) in a.items():
        assert b[key][0] == cid, key
        assert b[key][1] == pytest.approx(cos, abs=1e-12)


class _FakeBroadcast:
    def __init__(self, value):
        self.value = value


def _lsh_inputs(n_corpus=300, n_queries=9, dims=12, n_planes=3, n_tables=5,
                multiprobe=1, seed=5):
    from sdvg_spark.ops.similarity import hyperplane_weights

    rng = np.random.default_rng(seed)
    C = rng.normal(size=(n_corpus, dims))
    C /= np.linalg.norm(C, axis=1)[:, None]
    # duplicate a corpus direction so a pair collides in EVERY table
    C[-1] = C[0]
    c_ids = np.arange(n_corpus, dtype=np.int64) * 3 + 2
    Q = rng.normal(size=(n_queries, dims))
    q_ids = np.arange(n_queries, dtype=np.int64) * 100
    w_flat = hyperplane_weights(n_planes, n_tables, 7, dims).reshape(
        n_tables * n_planes, dims
    )
    qbits = (Q @ w_flat.T) >= 0
    qsigs = np.zeros((n_queries, n_tables), dtype=np.int64)
    for t in range(n_tables):
        for p in range(n_planes):
            qsigs[:, t] |= qbits[:, t * n_planes + p].astype(np.int64) << p
    flips = [0] + [1 << b for b in range(n_planes)] if multiprobe >= 1 else [0]
    tables = []
    for t in range(n_tables):
        buckets: dict = {}
        for qi in range(n_queries):
            for fl in flips:
                buckets.setdefault(int(qsigs[qi, t]) ^ fl, []).append(qi)
        tables.append({s: np.array(v, dtype=np.int64) for s, v in buckets.items()})
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    Qn = Q / qn[:, None]
    return (q_ids, Qn, w_flat, n_tables, n_planes, tables), C, c_ids


def _run_kernel(factory, bc_val, C, c_ids, top, batch_size, **kw):
    import pandas as pd

    kern = factory(_FakeBroadcast(bc_val), top, **kw)
    batches = (
        pd.DataFrame({"c_id": c_ids[s : s + batch_size], "__v": list(C[s : s + batch_size])})
        for s in range(0, len(c_ids), batch_size)
    )
    frames = list(kern(batches))
    return (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame({"q_id": [], "c_id": [], "cosine": []})
    )


def test_lsh_taskmerge_kernel_bounded_and_reduce_equal():
    """Across many batches the merged kernel emits at most queries × k
    deduped rows, and the exact global per-query top-k both kernels
    reduce to is identical — including pairs that collide in several
    tables (which must count ONCE, hence dedup-before-cut). Tiny
    compact_rows forces the threshold + compaction path."""
    from sdvg_spark.ops.ivf_merge import _lsh_taskmerge_kernel, _pool_topk, _dedup_pool
    from sdvg_spark.ops.similarity import _lsh_fused_kernel

    bc_val, C, c_ids = _lsh_inputs()
    q_ids = bc_val[0]
    top = 4
    merged = _run_kernel(
        _lsh_taskmerge_kernel, bc_val, C, c_ids, top, batch_size=37, compact_rows=16
    )
    fused = _run_kernel(_lsh_fused_kernel, bc_val, C, c_ids, top, batch_size=37)
    assert len(merged) <= len(q_ids) * top
    # merged output carries no duplicate (q, c) pairs
    assert not merged.duplicated(subset=["q_id", "c_id"]).any()

    def reduce(df):
        q = df["q_id"].to_numpy(np.int64)
        c = df["c_id"].to_numpy(np.int64)
        # 12-dp rounding: the planted duplicate direction creates true
        # cosine ties whose floats differ in the last ulp across gemm
        # block shapes; rounding restores the tie so the id-asc cut is
        # deterministic in both kernels
        s = np.round(df["cosine"].to_numpy(np.float64), 12)
        q, c, s = _dedup_pool(q, c, s)
        q, c, s = _pool_topk(q, c, s, top)
        return list(zip(q.tolist(), c.tolist()))

    assert reduce(merged) == reduce(fused)


def test_dedup_pool_keeps_one_instance():
    from sdvg_spark.ops.ivf_merge import _dedup_pool

    q = np.array([1, 1, 1, 2], dtype=np.int64)
    c = np.array([5, 5, 6, 5], dtype=np.int64)
    s = np.array([0.9, 0.9, 0.8, 0.7])
    qq, cc, ss = _dedup_pool(q, c, s)
    assert list(zip(qq.tolist(), cc.tolist())) == [(1, 5), (1, 6), (2, 5)]
