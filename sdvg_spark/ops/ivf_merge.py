"""Scale-hardened IVF cosine top-k: task-merged kernel emission.

Search semantics are IDENTICAL to :func:`sdvg_spark.ops.similarity.
ivf_topk` — same smallest-id centroid sample, same float64
normalize + stable-argsort probe assignment, same scoring arithmetic
(the kernel calls similarity's ``_block_topk_into`` directly), same
(cosine DESC, id ASC) final ranking — so the shared DuckDB mirror
:func:`sdvg_spark.ops.similarity.ivf_topk_oracle_sql` stays a
value-exact oracle. What changes is HOW MANY rows the corpus-pass
kernel hands to the ranking exchange.

Why: the round-9 sf100 probe (SHUFFLE_r09.md) pinned ``ann_ivf``'s
50 GB disk / 127 GB memory spill to the map-side rank≤k prune sorting
the kernel's per-(batch, cell, query) emission — ≈ queries × n_probe
× k rows per task before the prune can cut. Per-query top-k under the
total order (score DESC, id ASC) is associative across row subsets:
``topk(A ∪ B) == topk(topk(A) ∪ topk(B))``, because a row ranked ≤ k
in the union is ranked ≤ k in every subset containing it. So the
kernel here keeps ONE running top-k pool per query across all the
Arrow batches and cells a task sees (compacted with a single
lexsort + group-rank pass whenever the pool passes ~1M rows) and
emits once per task — ≤ queries × k rows, which makes the pre-rank
sort kilobytes-to-megabytes per task instead of gigabytes.

Why a separate module (round-9 rotation constraint): similarity.py's
six driver rows are this round's deferred r8 certificates
(tools/rotation_ledger.py); editing that file would strand five ANN
queries stale past the 50-row driver window, and the window has no
free slots. This entry point supersedes ``ivf_topk`` for the
``ann_ivf`` driver row this round and should FOLD BACK into
similarity.py next round when the ann family rotates in-window
(delete this module then).

Reference parity: the reference engine has no ANN operator — this is
part of the training-data-pipeline family (SURVEY.md §2 extension),
matching the brute/LSH/IVF tiering of public IVF literature (the
inverted-file structure of Sivic & Zisserman / FAISS's IndexIVFFlat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Compact the running pool once it holds this many candidate rows
# (3 × int64/float64 arrays ≈ 24 MB at the bound): large enough that
# compaction is amortized across many emit-bounded blocks, small
# enough that a task's peak candidate footprint stays flat no matter
# how many batches × cells it scans.
_POOL_COMPACT_ROWS = 1_000_000


def _pool_topk(q, c, s, top: int):
    """Exact per-query top-``top`` of a candidate pool under the total
    order (score DESC, c_id ASC): one lexsort + group-rank pass, no
    per-query Python loop. Unlike ``_topk_select``'s per-block cut
    (which keeps k-th-score ties as a cheap over-approximation), this
    cuts exactly at ``top`` — safe because the ordering it cuts by is
    the same total order the final ranking window uses, so every
    globally ranked-≤ k row survives the pool cut."""
    import numpy as np

    order = np.lexsort((c, -s, q))
    qo = q[order]
    starts = np.flatnonzero(np.r_[True, qo[1:] != qo[:-1]])
    grp = np.repeat(starts, np.diff(np.append(starts, len(qo))))
    keep = (np.arange(len(qo)) - grp) < top
    idx = order[keep]
    return q[idx], c[idx], s[idx]


def _ivf_taskmerge_kernel(bc, top_n: int, compact_rows: int = _POOL_COMPACT_ROWS):
    """mapInPandas kernel: cell assignment + candidate scoring + ONE
    running per-query top-k pool for the whole task.

    Identical per-block scoring to similarity's ``_ivf_fused_kernel``
    (it calls the same ``_block_topk_into``); the difference is that
    block winners accumulate into a task-wide pool that is compacted
    to exact per-query top-k whenever it exceeds ``compact_rows``, and
    the task emits a single Arrow batch of ≤ queries × top_n rows at
    the end instead of per-(batch, cell) frames.
    """
    import numpy as np
    import pandas as pd

    from sdvg_spark.ops.similarity import _block_topk_into

    def run(batches):
        q_ids, Qn, cent, probing = bc.value
        if len(q_ids) == 0:
            return
        acc_q: list = []
        acc_c: list = []
        acc_s: list = []
        pending = 0

        def compact():
            nonlocal pending
            q = np.concatenate(acc_q)
            c = np.concatenate(acc_c)
            s = np.concatenate(acc_s)
            q, c, s = _pool_topk(q, c, s, top_n)
            acc_q[:], acc_c[:], acc_s[:] = [q], [c], [s]
            pending = len(q)

        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(list(pdf["__v"]), dtype=np.float64)
            nrm = np.linalg.norm(M, axis=1)
            nrm[nrm == 0] = 1.0
            C = M / nrm[:, None]
            c_ids = pdf["c_id"].to_numpy(dtype=np.int64)
            cells = np.argmax(C @ cent.T, axis=1)  # first max = lowest cell
            before = len(acc_q)
            for cell in np.unique(cells):
                qidx = probing[cell]
                if not len(qidx):
                    continue
                rows = np.flatnonzero(cells == cell)
                _block_topk_into(
                    C[rows], c_ids[rows], Qn, qidx, q_ids, top_n,
                    acc_q, acc_c, acc_s,
                )
            pending += sum(len(a) for a in acc_q[before:])
            if pending > compact_rows:
                compact()
        if acc_q:
            compact()
            yield pd.DataFrame(
                {"q_id": acc_q[0], "c_id": acc_c[0], "cosine": acc_s[0]}
            )

    return run


def ivf_topk_merged(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 12,
    dims: int | None = None,
    centroid_max_bytes: int = 64_000_000,
) -> DataFrame:
    """Drop-in, value-identical replacement for :func:`similarity.
    ivf_topk` whose corpus-pass kernel emits ≤ queries × k rows per
    TASK (running top-k merge) instead of per (batch, cell) — the
    sf100 ranking-sort spill fix. Driver-side setup (centroid sample,
    query collect, probe map) mirrors ivf_topk line-for-line; see that
    docstring for the structure, caps, and determinism contract.

    At 100 TB: still ONE map-only corpus pass; the final exchange now
    moves O(tasks × queries × k) rows and the map-side rank≤k prune
    sorts only the kernel's already-merged pool (≈ 12 MB/task at the
    sf100 census that previously sorted 4.8M rows/task, 127 GB spill).
    """
    import numpy as np

    from sdvg_spark.ops.dedup import bounded_local_vectors, widen

    loc = bounded_local_vectors(
        corpus.orderBy(F.col(corpus_id)).limit(n_cells),
        corpus_id,
        corpus_vec,
        centroid_max_bytes,
        known_dims=dims,
    )
    if loc is None:
        raise ValueError("n_cells × dims exceeds centroid_max_bytes")
    _, cent = loc  # ids sorted ascending -> cell index = rank of id
    cnorm = np.linalg.norm(cent, axis=1)
    cnorm[cnorm == 0] = 1.0
    cent = cent / cnorm[:, None]
    spark = corpus.sparkSession

    qloc = bounded_local_vectors(
        queries.select(F.col(query_id).alias("q_id"), F.col(query_vec).alias("__qv")),
        "q_id",
        "__qv",
        256_000_000,
        known_dims=cent.shape[1],
    )
    if qloc is None:
        raise ValueError("query set exceeds max_query_bytes")
    q_ids, Q = qloc
    if len(q_ids) == 0:
        return spark.createDataFrame(
            [], "q_id long, c_id long, cosine double, rank int"
        )
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    Qn = Q / qn[:, None]
    order = np.argsort(-(Qn @ cent.T), axis=1, kind="stable")[:, :n_probe]
    probing = [np.flatnonzero((order == c).any(axis=1)) for c in range(len(cent))]
    bc = spark.sparkContext.broadcast((q_ids, Qn, cent, probing))

    part = (
        widen(corpus)
        .select(F.col(corpus_id).alias("c_id"), F.col(corpus_vec).alias("__v"))
        .mapInPandas(
            _ivf_taskmerge_kernel(bc, int(k)), "q_id long, c_id long, cosine double"
        )
    )
    final = part.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
        ),
    ).where(F.col("rank") <= k)
    return final.select("q_id", "c_id", "cosine", "rank")


def _dedup_pool(q, c, s):
    """Drop repeated (q, c) pairs from a candidate pool (cross-table
    LSH collisions of the same pair score identically, so any instance
    may be kept). MUST run before a top-k cut: a pair duplicated into
    two of a query's k slots would evict a genuine winner that the
    final ranking (which sees each pair once) still needs."""
    import numpy as np

    o = np.lexsort((c, q))
    q, c, s = q[o], c[o], s[o]
    first = np.r_[True, (q[1:] != q[:-1]) | (c[1:] != c[:-1])]
    return q[first], c[first], s[first]


def _lsh_taskmerge_kernel(bc, top_n: int, compact_rows: int = _POOL_COMPACT_ROWS):
    """mapInPandas kernel: per-table signatures + bucket scoring + ONE
    running per-query top-k pool for the whole task — the scale fix for
    similarity's ``_lsh_fused_kernel``, which buffers the full batch
    triple set (tables × probing-queries × rows) before compacting; at
    the sf100 census that is ~110 GB per 64k-row Arrow batch and the
    Python workers die on the allocation (SHUFFLE_r09.md).

    Three bounds replace the batch buffer:

    * per-(table, bucket) block cut — each scored block contributes at
      most |probing queries| × top_n rows (``_topk_select``, the exact
      per-block cut every kernel here shares);
    * a per-query score threshold — once a query's pool holds top_n
      candidates, its k-th score is a floor no later candidate may
      under-run (ties kept: ``>=``), so post-warmup blocks contribute
      little;
    * pool compaction past ``compact_rows``: dedup cross-table (q, c)
      repeats, cut to exact per-query top-k, refresh the thresholds.

    The pool stores query INDICES (positions in the sorted q_ids /
    Qn), mapped to ids once at emission.
    """
    import numpy as np
    import pandas as pd

    from sdvg_spark.ops.similarity import _SCORE_CHUNK_ELEMS, _topk_select

    def run(batches):
        q_ids, Qn, w_flat, n_tables, n_planes, tables = bc.value
        nq = len(q_ids)
        if nq == 0:
            return
        q_arr = np.asarray(q_ids, dtype=np.int64)
        acc_q: list = []
        acc_c: list = []
        acc_s: list = []
        pending = 0
        thr = np.full(nq, -np.inf)

        def compact():
            nonlocal pending
            q = np.concatenate(acc_q)
            c = np.concatenate(acc_c)
            s = np.concatenate(acc_s)
            q, c, s = _dedup_pool(q, c, s)
            q, c, s = _pool_topk(q, c, s, top_n)
            acc_q[:], acc_c[:], acc_s[:] = [q], [c], [s]
            pending = len(q)
            starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
            counts = np.diff(np.append(starts, len(q)))
            full = counts >= top_n
            thr[q[starts[full]]] = s[starts[full] + top_n - 1]

        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(list(pdf["__v"]), dtype=np.float64)
            c_ids = pdf["c_id"].to_numpy(dtype=np.int64)
            bits = (M @ w_flat.T) >= 0  # sign rule ≡ hyperplane_sigs_df
            sigs = np.zeros((len(M), n_tables), dtype=np.int64)
            for t in range(n_tables):
                for p in range(n_planes):
                    sigs[:, t] |= bits[:, t * n_planes + p].astype(np.int64) << p
            nrm = np.linalg.norm(M, axis=1)
            nrm[nrm == 0] = 1.0
            C = M / nrm[:, None]
            for t in range(n_tables):
                tbl = tables[t]
                col = sigs[:, t]
                uniq, inv = np.unique(col, return_inverse=True)
                for ui in range(len(uniq)):
                    qidx = tbl.get(int(uniq[ui]))
                    if qidx is None or not len(qidx):
                        continue
                    rows = np.flatnonzero(inv == ui)
                    ids_b = c_ids[rows]
                    Cb = C[rows]
                    top = min(top_n, len(rows))
                    qidx = np.asarray(qidx, dtype=np.int64)
                    chunk = max(1, _SCORE_CHUNK_ELEMS // len(rows))
                    for s0 in range(0, len(qidx), chunk):
                        qc = qidx[s0 : s0 + chunk]
                        sims = Cb @ Qn[qc].T  # (rows, |qc|)
                        cols, rws = _topk_select(sims, ids_b, top)
                        sv = sims[rws, cols]
                        qi = qc[cols]
                        keep = sv >= thr[qi]
                        if not keep.any():
                            continue
                        acc_q.append(qi[keep])
                        acc_c.append(ids_b[rws[keep]])
                        acc_s.append(sv[keep])
                        pending += int(keep.sum())
                        if pending > compact_rows:
                            compact()
        if acc_q:
            compact()
            yield pd.DataFrame(
                {"q_id": q_arr[acc_q[0]], "c_id": acc_c[0], "cosine": acc_s[0]}
            )

    return run


def lsh_topk_merged(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    multiprobe: int = 1,
    seed: int = 7,
    dims: int | None = None,
) -> DataFrame:
    """Drop-in, value-identical replacement for :func:`similarity.
    lsh_topk` built on :func:`_lsh_taskmerge_kernel` — same hyperplane
    tensor, signatures, multiprobe expansion, scoring arithmetic, and
    (cosine DESC, id ASC) ranking (``lsh_topk_oracle_sql`` stays the
    oracle), but the corpus-pass kernel never materializes more than
    the compaction pool: at the sf100 census the old kernel's batch
    triple buffer is ~110 GB and kills the worker; this one peaks at
    ~25 MB. Driver-side setup mirrors lsh_topk line-for-line; folds
    back into similarity.py with the round-10 certificate rotation.
    """
    import numpy as np

    from sdvg_spark.ops.dedup import bounded_local_vectors, widen
    from sdvg_spark.ops.similarity import hyperplane_weights

    spark = corpus.sparkSession
    qloc = bounded_local_vectors(
        queries.select(F.col(query_id).alias("q_id"), F.col(query_vec).alias("__qv")),
        "q_id",
        "__qv",
        256_000_000,
    )
    if qloc is None:
        raise ValueError("query set exceeds max_query_bytes")
    q_ids, Q = qloc
    if len(q_ids) == 0:
        return spark.createDataFrame(
            [], "q_id long, c_id long, cosine double, rank int"
        )
    if dims is None:
        dims = Q.shape[1]
    w_flat = hyperplane_weights(n_planes, n_tables, seed, dims).reshape(
        n_tables * n_planes, dims
    )
    qbits = (Q @ w_flat.T) >= 0
    qsigs = np.zeros((len(q_ids), n_tables), dtype=np.int64)
    for t in range(n_tables):
        for p in range(n_planes):
            qsigs[:, t] |= qbits[:, t * n_planes + p].astype(np.int64) << p
    flips = [0]
    if multiprobe >= 1:
        flips += [1 << b for b in range(n_planes)]
    if multiprobe >= 2:
        flips += [
            (1 << b1) | (1 << b2)
            for b1 in range(n_planes)
            for b2 in range(b1 + 1, n_planes)
        ]
    tables: list[dict] = []
    for t in range(n_tables):
        buckets: dict = {}
        for qi in range(len(q_ids)):
            for fl in flips:
                buckets.setdefault(int(qsigs[qi, t]) ^ fl, []).append(qi)
        tables.append({s: np.array(v, dtype=np.int64) for s, v in buckets.items()})
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    Qn = Q / qn[:, None]
    bc = spark.sparkContext.broadcast(
        (q_ids, Qn, w_flat, n_tables, n_planes, tables)
    )
    part = (
        widen(corpus)
        .select(F.col(corpus_id).alias("c_id"), F.col(corpus_vec).alias("__v"))
        .mapInPandas(
            _lsh_taskmerge_kernel(bc, int(k)), "q_id long, c_id long, cosine double"
        )
    )
    final = part.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
        ),
    ).where(F.col("rank") <= k)
    return final.select("q_id", "c_id", "cosine", "rank")
