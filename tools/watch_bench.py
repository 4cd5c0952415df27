"""Mini-bench for adjudicating specific watch-listed queries across
host-noise windows.

    python tools/watch_bench.py [q1,q2,...] [runs]

Runs bench.py's calibration kernel first (so every sample carries its
own host-speed tag), then the named queries (default: the r10 verdict
watch list) ``runs`` times each (default 3) at $SPARK_GRAFT_SF_DIR,
noop sink, and prints one JSON line. The adjudication protocol
(BASELINE.md): collect samples across sessions, compare MINIMA, and
only trust sessions whose calibration lands in the quiet band
(~15 s on this host; 150+ s sessions are co-tenant-contended and
prove nothing).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WATCH = [
    "stratified_sample",
    "dedup_minhash",
    "text_features",
    "duplicate_spans",
    "ann_topk",
]


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else WATCH
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from bench import calibrate_cpu

    cal = calibrate_cpu()

    import __spark_entry__ as E
    from sdvg_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="watch-bench")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    qs = E.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = samples
    print(
        json.dumps(
            {
                "calibration_sec": round(cal, 3),
                "sf_dir": sf_dir,
                "runs": out,
                "min": {k: min(v) for k, v in out.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
