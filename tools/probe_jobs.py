"""Per-query JOB ATTRIBUTION probe: list every Spark job a query fires
(build + action), with its description and duration, via the local UI
REST API.

Usage: python tools/probe_jobs.py <query> [<query> ...]

Complements probe_query.py (which counts jobs but cannot say WHICH
action fired them). Used for the r12 job-floor sweep: each job line is
either an AQE shuffle-stage materialization (reduce exchanges to remove
it) or an eager driver action (replace with footer stats / fuse)."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def ui_jobs(port: int) -> list[dict]:
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    return json.load(urllib.request.urlopen(f"{base}/{app_id}/jobs?status=succeeded", timeout=10))


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as E
    from sdvg_spark.session import get_spark, scale_shuffle_partitions

    spark = get_spark(app_name="probe-jobs", master=f"local[{cpus}]")
    scale_shuffle_partitions(spark, sf_dir)
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1])
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    qs = E.queries()
    sc = spark.sparkContext

    for name in names:
        # warm rep (codegen, memoized exprs), then the measured rep
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        before = {j["jobId"] for j in ui_jobs(port)}
        sc.setJobDescription(f"{name} build")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t1 = time.time()
        sc.setJobDescription(f"{name} action")
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        sc.setJobDescription(None)
        time.sleep(0.2)
        print(f"== {name}  build={t1-t0:.3f}s action={t2-t1:.3f}s")
        for j in sorted(ui_jobs(port), key=lambda j: j["jobId"]):
            if j["jobId"] in before:
                continue
            dur = ""
            try:
                from datetime import datetime

                st = datetime.strptime(j["submissionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
                en = datetime.strptime(j["completionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
                dur = f"{(en - st).total_seconds():.3f}s"
            except Exception:
                pass
            desc = j.get("description", "") or j["name"]
            print(f"  job {j['jobId']:>4} {dur:>8} [{j.get('numTasks', '?')} tasks] {desc[:140]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
