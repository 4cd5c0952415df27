"""A/B/C probe of the events_session_window batch scale candidates.

Races, in ONE 16 GiB session with sf100-pinned shuffle partitions
(same protocol as tools/probe_ivf_merge.py):

  A. current default — native session_window with shuffle_first
     (repartition(user_id) then one merged agg stage; SHUFFLE_r10:
     67.8 s / zero spill at sf100de, +18 s over the r9 spilling plan)
  B. sessionize_batch_twolevel — (user, coarse-bucket) pre-split local
     sessions + per-user interval-chain merge (SURVEY §9 item 3)
  C. sessionize_batch_windowform — lag/cumsum session ids + sort-agg,
     emitting session_window-shaped rows (no session-merge operator)

    SPARK_DRIVER_MEMORY=16g python tools/probe_session_variants.py \
        <sf_dir> [shuffle_partitions] [reps]

Attribution by job group via the status REST API; variants serialized,
order ABC per rep so later reps are steady-state.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1]
    pin = int(sys.argv[2]) if len(sys.argv) > 2 else None
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import __spark_entry__ as E
    from sdvg_spark.session import get_spark, scale_shuffle_partitions
    from sdvg_spark.streaming import (
        sessionize_batch_twolevel,
        sessionize_batch_windowform,
    )

    spark = get_spark(app_name="probe-session-variants")
    sc = spark.sparkContext
    base = sc.uiWebUrl
    app_id = _api(base, "applications")[0]["id"]

    n = scale_shuffle_partitions(spark, sf_dir)
    if pin:
        spark.conf.set("spark.sql.shuffle.partitions", str(pin))
        n = pin
    print(f"<!-- {sf_dir}: shuffle.partitions={n} -->", flush=True)

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    vmic = F.round(F.col("value") * 1e6).cast("long")
    aggs = {
        "n_events": F.count(F.lit(1)),
        "session_value": (F.sum(vmic) / 1e6),
    }

    def variant_a():
        return E.queries()["events_session_window"](spark, sf_dir)

    def variant_b():
        return sessionize_batch_twolevel(
            ev,
            "ts",
            1800,
            {"n_events": F.count(F.lit(1)), "__vm": F.sum(vmic)},
            {"n_events": F.sum("n_events"), "session_value": F.sum("__vm") / 1e6},
            keys=["user_id"],
        ).select("user_id", "session_start", "session_end", "n_events", "session_value")

    def variant_c():
        return sessionize_batch_windowform(
            ev, "ts", 1800, aggs, keys=["user_id"]
        ).select("user_id", "session_start", "session_end", "n_events", "session_value")

    variants = [("A_session_window", variant_a), ("B_twolevel", variant_b), ("C_windowform", variant_c)]
    for rep in range(reps):
        for name, fn in variants:
            tag = f"{name}#r{rep}"
            sc.setJobGroup(tag, tag)
            t0 = time.time()
            try:
                fn().write.format("noop").mode("overwrite").save()
            finally:
                sc.setJobGroup("", "")
            wall = time.time() - t0
            time.sleep(1.0)
            jobs = _api(base, f"applications/{app_id}/jobs")
            stage_ids = set()
            for j in jobs:
                if j.get("jobGroup") == tag:
                    stage_ids.update(j.get("stageIds", []))
            # all statuses, so partial/failed runs can't under-report
            stages = _api(base, f"applications/{app_id}/stages")
            mine = [s for s in stages if s["stageId"] in stage_ids]
            print(
                f"| {tag} | {wall:.1f} s | "
                f"{sum(s.get('shuffleWriteBytes', 0) for s in mine) / 1e6:.1f} MB | "
                f"{sum(s.get('memoryBytesSpilled', 0) for s in mine) / 1e6:.1f} | "
                f"{sum(s.get('diskBytesSpilled', 0) for s in mine) / 1e6:.1f} | "
                f"statuses={sorted({s.get('status') for s in mine})} |",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
