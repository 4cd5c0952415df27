"""Per-query shuffle/input byte report via Spark's status REST API.

Quantifies the plan-audit story the plan tests assert qualitatively:
how many bytes each headline query actually shuffles at a given scale
factor. Run:

    python tools/shuffle_report.py [sf_dir] > SHUFFLE_r{N}.md

Each query runs once (after a warm-up run of the first query to absorb
session costs); stages completed during the run are attributed to it by
stage-id watermark, and their shuffle write/read + input bytes summed.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "text_features",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_exact",
    "ann_topk",
    "ann_lsh",
    "ann_ivf",
    "ann_quantized",
    "pricing_summary",
    "top_revenue",
    "events_sessionize",
    "user_running_value",
    "skew_salted_agg",
    "data_split",
    "embedding_quantize",
]


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as E
    from sdvg_spark.session import get_spark

    spark = get_spark(app_name="shuffle-report")
    base = spark.sparkContext.uiWebUrl
    app_id = _api(base, "applications")[0]["id"]
    qs = E.queries()

    def stages():
        return _api(base, f"applications/{app_id}/stages?status=complete")

    def run(name):
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        time.sleep(1.0)  # AppStatusListener aggregates asynchronously

    run(QUERIES[0])  # warm-up: scan/codegen init lands outside the table
    rows = []
    for name in QUERIES:
        before = max((s["stageId"] for s in stages()), default=-1)
        run(name)
        mine = [s for s in stages() if s["stageId"] > before]
        rows.append(
            {
                "query": name,
                "stages": len(mine),
                "shuffle_write_mb": sum(s.get("shuffleWriteBytes", 0) for s in mine) / 1e6,
                "shuffle_read_mb": sum(s.get("shuffleReadBytes", 0) for s in mine) / 1e6,
                "spill_mb": sum(s.get("diskBytesSpilled", 0) for s in mine) / 1e6,
            }
        )

    # on-disk table sizes give the denominator (stage inputBytes is
    # unreliable for the vectorized parquet reader in this build — it
    # records footer reads only)
    tables_mb = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    ) / 1e6
    print(f"# Shuffle report — sf_dir={sf_dir} (tables on disk: {tables_mb:.0f} MB)")
    print()
    print("Bytes each headline query moves through the shuffle (status")
    print("REST API, one run per query after warm-up). This is the scale")
    print("story behind the plan tests: a query whose shuffle is a small")
    print("fraction of its input stays network-light at 100x, and zero")
    print("spill means partitions fit executor memory at this sizing.")
    print()
    print("| query | stages | shuffle write MB | shuffle read MB | spill MB |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['stages']} | {r['shuffle_write_mb']:.2f} "
            f"| {r['shuffle_read_mb']:.2f} | {r['spill_mb']:.2f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
