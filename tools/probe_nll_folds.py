"""A/B spill probe of unigram_nll's two scored-fold shapes.

    SPARK_DRIVER_MEMORY=16g python tools/probe_nll_folds.py \
        <sf_dir> <shuffle_partitions> [inrow,window]

Reproduces the SHUFFLE_r10 late-follow-up rows: serialized runs in one
session, partitions pinned to the full-dir census value (100 at sf10,
1062 at sf100), REST-API job-group attribution (the same protocol as
tools/probe_ivf_merge.py). The window shape is the shuffle-based
running-sum-window fold; inrow is the map-only Arrow fold default.
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
    pin = int(sys.argv[2])
    folds = (sys.argv[3] if len(sys.argv) > 3 else "inrow,window").split(",")

    from sdvg_spark.ops.corpus import unigram_nll_tiered
    from sdvg_spark.session import get_spark

    spark = get_spark(app_name="probe-nll-folds")
    sc = spark.sparkContext
    base = sc.uiWebUrl
    app_id = _api(base, "applications")[0]["id"]
    spark.conf.set("spark.sql.shuffle.partitions", str(pin))
    print(f"<!-- {sf_dir}: shuffle.partitions={pin} -->", flush=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    for fold in folds:
        tag = f"nll-{fold}@{sf_dir}"
        sc.setJobGroup(tag, tag)
        t0 = time.time()
        try:
            unigram_nll_tiered(
                docs, "doc_id", "text", top_n=500, scored_fold=fold
            ).write.format("noop").mode("overwrite").save()
        finally:
            sc.setJobGroup("", "")
        wall = time.time() - t0
        time.sleep(1.5)  # AppStatusListener aggregates asynchronously
        jobs = _api(base, f"applications/{app_id}/jobs")
        stage_ids = set()
        for j in jobs:
            if j.get("jobGroup") == tag:
                stage_ids.update(j.get("stageIds", []))
        # ALL statuses — a failed/skipped/finalizing stage silently
        # dropped from the sum would under-report spill; the status
        # breakdown line makes partial attribution visible
        stages = _api(base, f"applications/{app_id}/stages")
        mine = [s for s in stages if s["stageId"] in stage_ids]
        by_status: dict[str, int] = {}
        for s in mine:
            by_status[s.get("status", "?")] = by_status.get(s.get("status", "?"), 0) + 1
        print(
            f"| nll/{fold} | {wall:.1f} s | "
            f"write {sum(s.get('shuffleWriteBytes', 0) for s in mine) / 1e6:.1f} MB | "
            f"memspill {sum(s.get('memoryBytesSpilled', 0) for s in mine) / 1e6:.1f} MB | "
            f"diskspill {sum(s.get('diskBytesSpilled', 0) for s in mine) / 1e6:.1f} MB | "
            f"stages {sorted(by_status.items())} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
