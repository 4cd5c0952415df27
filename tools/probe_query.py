"""Per-query timing probe: construction vs action, job/stage counts.

Usage: python tools/probe_query.py <query> [reps] [sf_dir]

For each rep: time DataFrame construction (eager build work shows up
here) and the noop-sink action separately; report Spark job and stage
counts attributed to each phase via the status tracker. Rep 1 absorbs
codegen warmup — compare steady-state reps.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    reps = int(os.environ.get("PROBE_REPS", "3"))
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as E
    from sdvg_spark.session import get_spark, scale_shuffle_partitions

    spark = get_spark(app_name="probe-query", master=f"local[{cpus}]")
    scale_shuffle_partitions(spark, sf_dir)
    # warm scan path like bench.py
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    qs = E.queries()
    st = spark.sparkContext.statusTracker()

    for name in names:
        print(f"== {name}", flush=True)
        for rep in range(1, reps + 1):
            j0 = len(st.getJobIdsForGroup(None) or [])
            sc = spark.sparkContext
            sc.setJobDescription(f"{name} rep{rep} build")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            j1 = len(st.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"{name} rep{rep} action")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = len(st.getJobIdsForGroup(None) or [])
            sc.setJobDescription(None)
            print(
                f"rep{rep}: build={t1-t0:.3f}s ({j1-j0} jobs)  "
                f"action={t2-t1:.3f}s ({j2-j1} jobs)  total={t2-t0:.3f}s",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
