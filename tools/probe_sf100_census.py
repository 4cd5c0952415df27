"""r12 composition-scale proofs (VERDICT r11 item 6): curate census +
duplicate_spans at the sf100de fixture, on the r12-optimized shapes.

    SPARK_DRIVER_MEMORY=16g python tools/probe_sf100_census.py \
        <sf_dir> <shuffle_partitions> [query ...]

Protocol unchanged from SHUFFLE_r08-r11: one standalone session,
shuffle partitions pinned to the full-dir census value (1062 at sf100),
REST-API job-group attribution, probes SERIALIZED. Reports wall,
shuffle write, input bytes, and memory/disk spill per query.
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
    names = sys.argv[3:] or ["curate", "duplicate_spans"]

    import __spark_entry__ as E
    from sdvg_spark.session import get_spark

    spark = get_spark(app_name="probe-sf100-census")
    sc = spark.sparkContext
    base = sc.uiWebUrl
    app_id = _api(base, "applications")[0]["id"]
    spark.conf.set("spark.sql.shuffle.partitions", str(pin))
    print(f"<!-- {sf_dir}: shuffle.partitions={pin} -->", flush=True)
    qs = E.queries()
    for name in names:
        tag = f"{name}@{sf_dir}"
        sc.setJobGroup(tag, tag)
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        finally:
            sc.setJobGroup("", "")
        wall = time.time() - t0
        time.sleep(2.0)  # AppStatusListener aggregates asynchronously
        jobs = _api(base, f"applications/{app_id}/jobs")
        stage_ids = set()
        for j in jobs:
            if j.get("jobGroup") == tag:
                stage_ids.update(j.get("stageIds", []))
        stages = _api(base, f"applications/{app_id}/stages")
        mine = [s for s in stages if s["stageId"] in stage_ids]
        by_status: dict[str, int] = {}
        for s in mine:
            by_status[s.get("status", "?")] = by_status.get(s.get("status", "?"), 0) + 1
        print(
            f"| {name} | {wall:.1f} s | "
            f"write {sum(s.get('shuffleWriteBytes', 0) for s in mine) / 1e6:.1f} MB | "
            f"input {sum(s.get('inputBytes', 0) for s in mine) / 1e6:.1f} MB | "
            f"memspill {sum(s.get('memoryBytesSpilled', 0) for s in mine) / 1e6:.1f} MB | "
            f"diskspill {sum(s.get('diskBytesSpilled', 0) for s in mine) / 1e6:.1f} MB | "
            f"stages {sorted(by_status.items())} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
