"""Interleaved same-session A/B of the IVF index write layout.

r11 left one open adjudication (VERDICT item 2): `ann_ivf_index`'s
clustered write (one repartition by (cell, salt) before
partitionBy("cell")) landed after the main after-sessions and its raw
bench delta was confounded with host drift. This probe answers it the
way the verdict asked:

1. interleaved arms in ONE session (≥4 reps/arm, alternating order so
   ambient drift hits both arms equally), timing the exact
   train+write+search build the bench query performs, plus the write
   phase alone;
2. a wide-input write-layout row: the same write from a
   1062-partition source (the SHUFFLE_r11 sf100 scan layout),
   counting files and bytes/file per cell for both arms — the
   17k-fragment claim, measured instead of extrapolated.

Usage: python tools/probe_ivf_ab.py [reps_per_arm]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def calib() -> float:
    import numpy as np

    from sdvg_spark.core.rng import frf_np

    x = np.arange(10_000_000, dtype=np.uint64)
    t0 = time.time()
    frf_np(x)
    return round(time.time() - t0, 3)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from sdvg_spark.ops.similarity import (
        ivf_index_topk,
        ivf_train_centroids,
        ivf_write_index,
    )
    from sdvg_spark.session import get_spark, scale_shuffle_partitions

    spark = get_spark(app_name="probe-ivf-ab", master=f"local[{cpus}]")
    scale_shuffle_partitions(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.count()  # warm scan
    dims = E._parquet_list_dims(sf_dir, "embeddings", "embedding")
    n_rows = E._parquet_rows(sf_dir, "embeddings")
    vec_type = dict(emb.dtypes)["embedding"]

    print(f"calibration_10m: {calib()} s")

    def one(clustered: bool) -> tuple[float, float]:
        base = tempfile.mkdtemp(prefix="ivf_ab_")
        path = base + "/index"
        t0 = time.time()
        cent = ivf_train_centroids(
            emb, n_cells=16, n_iters=0, dims=dims, n_rows=n_rows
        )
        tw0 = time.time()
        ivf_write_index(emb, path, cent, cluster=clustered)
        tw1 = time.time()
        q = emb.where(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        out = ivf_index_topk(
            q, path, cent, k=10, n_probe=12,
            index_schema=f"c_id long, vec {vec_type}, cell int",
        )
        out.write.format("noop").mode("overwrite").save()
        total = time.time() - t0
        shutil.rmtree(base, ignore_errors=True)
        return round(total, 3), round(tw1 - tw0, 3)

    one(True)  # warm codegen/arrow on an untimed rep
    rows: list[tuple[str, float, float]] = []
    for r in range(reps):
        for arm in ((True, False) if r % 2 == 0 else (False, True)):
            tot, wr = one(arm)
            rows.append(("clustered" if arm else "unclustered", tot, wr))
            print(f"rep{r} {'clustered' if arm else 'unclustered':>12}: "
                  f"total={tot}s write={wr}s", flush=True)
    for name in ("clustered", "unclustered"):
        ts = [t for a, t, _ in rows if a == name]
        ws = [w for a, _, w in rows if a == name]
        print(f"{name}: total min={min(ts)} med={sorted(ts)[len(ts)//2]} "
              f"write min={min(ws)} med={sorted(ws)[len(ws)//2]}")
    print(f"calibration_10m_end: {calib()} s")

    # ---- wide-source write-layout row (sf100-shape: 1062 source tasks) ----
    import numpy as np  # noqa: F401

    wide = (
        spark.range(512_000)
        .repartition(1062)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: F.rand(42) + i * 0.001,
            ).cast("array<float>").alias("embedding"),
        )
    )
    cent = ivf_train_centroids(wide, n_cells=16, n_iters=0, dims=16, n_rows=512_000)
    for arm, clustered in (("clustered", True), ("unclustered", False)):
        base = tempfile.mkdtemp(prefix="ivf_layout_")
        path = base + "/index"
        t0 = time.time()
        ivf_write_index(wide, path, cent, cluster=clustered)
        wall = round(time.time() - t0, 3)
        files = []
        for root, _dirs, fs in os.walk(path):
            files += [os.path.join(root, f) for f in fs if f.endswith(".parquet")]
        sizes = sorted(os.path.getsize(f) for f in files)
        med = sizes[len(sizes) // 2] if sizes else 0
        print(
            f"layout {arm}: write={wall}s files={len(files)} "
            f"median_bytes={med} min={sizes[0] if sizes else 0} "
            f"max={sizes[-1] if sizes else 0}",
            flush=True,
        )
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
