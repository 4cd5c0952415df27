"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly one JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "extra": {...}}

Two benchmark families:
* generation throughput — the engine's reason to exist: a mixed-type
  model (the reference's bench column mix, bench_test.go:95-415) at
  2M rows through the feistel (100 TB-path) permutation, devnull sink.
* data-pipeline + analytics queries at the given scale factor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GEN_BENCH_ROWS = 2_000_000

GEN_BENCH_CFG = {
    "random_seed": 42,
    "permutation": "feistel",
    "models": {
        "bench": {
            "rows_count": GEN_BENCH_ROWS,
            "columns": [
                {"name": "i64", "type": "integer", "type_params": {"bit_width": 64}},
                {"name": "i32_ord", "type": "integer", "type_params": {"bit_width": 32, "from": 0, "to": 2_000_000}, "ordered": True},
                {"name": "f64", "type": "float", "type_params": {"bit_width": 64, "from": 0, "to": 1}},
                {"name": "dt", "type": "datetime"},
                {"name": "enum", "type": "string", "values": ["a", "b", "c", "d", "e"]},
                {"name": "uuid", "type": "uuid"},
                {"name": "s8", "type": "string", "type_params": {"min_length": 8, "max_length": 8}},
                {"name": "mix", "type": "integer", "ranges": [
                    {"type_params": {"bit_width": 32, "from": 0, "to": 100}, "range_percentage": 0.5},
                    {"type_params": {"bit_width": 32, "from": 1000, "to": 2000}, "range_percentage": 0.3},
                    {"type_params": {"bit_width": 32, "from": 10**6, "to": 10**7}, "range_percentage": 0.2, "ordered": True}]},
            ],
        }
    },
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)
    import __spark_entry__ as E
    from sdvg_spark.config.model import parse_config
    from sdvg_spark.engine import Engine
    from sdvg_spark.session import get_spark

    spark = get_spark(app_name="sdvg-bench", master=f"local[{cpus}]")
    times: dict[str, float] = {}
    extra: dict[str, float] = {}

    # -- generation throughput (devnull sink = count action) ----------------
    cfg = parse_config(GEN_BENCH_CFG)
    eng = Engine(cfg)
    # Protocol mirrors the reference CI (Makefile:22-23): Go's testing.B
    # loops the op and excludes setup, so we compile + warm on run 1 and
    # report run 2 (steady-state throughput, not codegen latency).
    df = eng.model_df(spark, "bench", num_partitions=int(cpus) * 2)
    df.write.format("noop").mode("overwrite").save()
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    times["generate_mixed_2m"] = round(dt, 3)
    extra["gen_rows_per_s"] = round(GEN_BENCH_ROWS / dt)
    extra["gen_values_per_s"] = round(GEN_BENCH_ROWS * 8 / dt)

    # -- pipeline + analytics at sf ----------------------------------------
    # warm the scan path (parquet reader init, codegen infra) so the
    # first query doesn't absorb session boot costs
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    qs = E.queries()
    bench_queries = [
        "text_features",
        "dedup_minhash",
        "dedup_simhash",
        "ann_topk",
        "ann_lsh",
        "ann_ivf",
        "pricing_summary",
        "top_revenue",
        "events_sessionize",
        "user_running_value",
    ]
    for name in bench_queries:
        # two full runs (construction + action: some operators do their
        # heavy work while building the DataFrame); report the warm one
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "wall-clock of headline queries (generation 2M rows feistel + pipeline ops + analytics)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
