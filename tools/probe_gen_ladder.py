"""Generation throughput ladder: the bench 8-column mix at arbitrary
row counts, noop sink, steady-state (warm run first, median of 3).

    SPARK_DRIVER_MEMORY=16g python tools/probe_gen_ladder.py [rows ...]

Default ladder extends the recorded 20M/200M points one decade to 2B,
plus a point past 2^31 (2.5B) so the Feistel permutation and every
downstream kernel are exercised beyond the int32 id regime (row ids,
generator numbers, and partition offsets must all be 64-bit clean;
a 2^31 wrap would show up as a throughput cliff or a crash, and the
ladder's values/s row is the receipt either way).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import GEN_BENCH_CFG


def main() -> None:
    rows_list = [int(float(a)) for a in sys.argv[1:]] or [
        2_000_000_000,
        2_500_000_000,
    ]

    from pyspark.sql import SparkSession

    from sdvg_spark.config.model import parse_config
    from sdvg_spark.engine import Engine
    from sdvg_spark.session import configure_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Speculative execution is this probe's straggler/wedged-worker
    # mitigation (first 2B attempt: one Python worker deadlocked in
    # the socket pair after ~1.7B rows, parking the whole job on task
    # 499/500 — the exact failure speculation exists for; generation
    # tasks are pure functions of the row index, so a speculative
    # duplicate is always safe). Must be set at context creation.
    spark = configure_session(
        SparkSession.builder.appName("probe-gen-ladder")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "5s")
        .config("spark.speculation.multiplier", "4")
        .config("spark.speculation.quantile", "0.9")
        .getOrCreate()
    )

    print("| rows × cols | wall (min of 2) | values/s |", flush=True)
    print("|---|---|---|", flush=True)
    for rows in rows_list:
        cfg = dict(GEN_BENCH_CFG)
        cfg["models"] = {
            "bench": {**GEN_BENCH_CFG["models"]["bench"], "rows_count": rows}
        }
        # ~4M rows/partition keeps Arrow batches and task sorts flat at
        # any ladder height (the 20M point used 128 partitions = 156k/
        # task only because 2M-row jobs are overhead-bound).
        parts = max(int(cpus) * 4, rows // 4_000_000)
        df = Engine(parse_config(cfg)).model_df(spark, "bench", num_partitions=parts)
        df.write.format("noop").mode("overwrite").save()  # warm/codegen
        runs = []
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        wall = min(runs)
        print(
            f"| {rows/1e6:.0f}M × 8 | {wall:.1f} s (runs: "
            f"{', '.join(f'{r:.1f}' for r in runs)}) | "
            f"{rows * 8 / wall / 1e6:.1f}M |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
