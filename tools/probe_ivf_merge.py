"""ANN spill probe over the entry queries (default: ann_ivf, ann_lsh
— the task-merged similarity.py defaults since round 10).

Reproduces the SHUFFLE_r09 ann probe conditions on an embeddings-only
scale fixture (the query reads nothing else) so kernel changes can be
measured against the recorded sf100 rows (ivf: 50 GB disk spill;
lsh: worker OOM) under the SAME partitioning:

    SPARK_DRIVER_MEMORY=16g python tools/probe_ivf_merge.py \
        <sf_dir> [shuffle_partitions]

`shuffle_partitions` pins the conf to the value the FULL-table dir
would have produced (100 at sf10, 1062 at sf100 — an embeddings-only
dir sizes to ~1/15 of that, which would under-state the per-task
census the recorded row measured). Attribution is by job group via the
status REST API, same as tools/shuffle_report.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1]
    pin = int(sys.argv[2]) if len(sys.argv) > 2 else None

    import __spark_entry__ as E
    from sdvg_spark.session import get_spark, scale_shuffle_partitions

    spark = get_spark(app_name="probe-ivf-merge")
    sc = spark.sparkContext
    base = sc.uiWebUrl
    app_id = _api(base, "applications")[0]["id"]

    n = scale_shuffle_partitions(spark, sf_dir)
    if pin:
        spark.conf.set("spark.sql.shuffle.partitions", str(pin))
        n = pin
    print(f"<!-- {sf_dir}: shuffle.partitions={n} -->", flush=True)

    qs = dict(E.queries())
    only = [q for q in os.environ.get("PROBE_QUERIES", "").split(",") if q]
    for name in only or ("ann_ivf", "ann_lsh"):
        tag = f"{name}@{sf_dir}"
        sc.setJobGroup(tag, tag)
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        finally:
            sc.setJobGroup("", "")
        wall = time.time() - t0
        time.sleep(1.0)  # AppStatusListener aggregates asynchronously
        jobs = _api(base, f"applications/{app_id}/jobs")
        stage_ids = set()
        for j in jobs:
            if j.get("jobGroup") == tag:
                stage_ids.update(j.get("stageIds", []))
        stages = _api(base, f"applications/{app_id}/stages?status=complete")
        mine = [s for s in stages if s["stageId"] in stage_ids]
        print(
            f"| {name} | {wall:.1f} s | "
            f"{sum(s.get('shuffleWriteBytes', 0) for s in mine) / 1e6:.1f} | "
            f"{sum(s.get('memoryBytesSpilled', 0) for s in mine) / 1e6:.1f} | "
            f"{sum(s.get('diskBytesSpilled', 0) for s in mine) / 1e6:.1f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
