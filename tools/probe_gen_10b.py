"""Generation ladder closure (VERDICT r11 item 7): one >= 10B-row
point of the bench 8-column mix, noop sink.

    SPARK_DRIVER_MEMORY=16g python tools/probe_gen_10b.py [rows]

Single timed run (default 10B rows = 80B values): at ~35-50M values/s
a run is 27-38 min, so the 3-pass protocol of probe_gen_ladder.py
(warm + median-of-2) would take ~2 h; the ladder's 2B/2.5B points
established steady-state repeatability, and this point exists to close
the 100 TB-shape claim (no cliff past 2^33 domains, throughput moves
only with the rejection rate). Codegen/JIT warm-up is paid by a 20M-row
warm run of the same model shape first, so the timed run measures the
kernels, not compilation.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import GEN_BENCH_CFG


def main() -> None:
    rows = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000_000

    from pyspark.sql import SparkSession

    from sdvg_spark.config.model import parse_config
    from sdvg_spark.engine import Engine
    from sdvg_spark.session import configure_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # speculation: the wedged-Python-worker mitigation documented in
    # SHUFFLE_r11 (generation tasks are pure functions of the row index)
    spark = configure_session(
        SparkSession.builder.appName("probe-gen-10b")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "5s")
        .config("spark.speculation.multiplier", "4")
        .config("spark.speculation.quantile", "0.9")
        .getOrCreate()
    )

    def mk(n: int):
        cfg = dict(GEN_BENCH_CFG)
        cfg["models"] = {
            "bench": {**GEN_BENCH_CFG["models"]["bench"], "rows_count": n}
        }
        parts = max(int(cpus) * 4, n // 4_000_000)
        return Engine(parse_config(cfg)).model_df(spark, "bench", num_partitions=parts)

    mk(20_000_000).write.format("noop").mode("overwrite").save()  # warm
    df = mk(rows)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(
        f"| {rows/1e6:.0f}M x 8 | {wall:.1f} s (single run) | "
        f"{rows * 8 / wall / 1e6:.1f}M values/s |",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
