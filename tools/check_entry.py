"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against
``oracle_sql()`` via DuckDB: row count, sorted column names, and an
order-insensitive value multiset. Prints one line per query.

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


EXACT = os.environ.get("EXACT", "") == "1"


def norm(v):
    if isinstance(v, float):
        # EXACT=1 predicts the driver's value-hash (bit-exact doubles);
        # the default 1e-9 tolerance only predicts rows/schema.
        return v if EXACT else round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from sdvg_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; tools/make_scale.py
        # fixtures are Spark-written part-file directories
        path = f"{sf_dir}/{t}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            rows = [tuple(norm(v) for v in r) for r in df.collect()]
            cols = sorted(df.columns)
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"OK-ROWSONLY {name}: rows={len(rows)} ({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = sorted(d[0] for d in cur.description)
            orows = [tuple(norm(v) for v in r) for r in cur.fetchall()]
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            n_fail += 1
            continue
        if cols != ocols:
            print(f"FAIL {name}: schema {cols} != {ocols}")
            n_fail += 1
            continue
        if len(rows) != len(orows):
            print(f"FAIL {name}: rowcount {len(rows)} != {len(orows)}")
            n_fail += 1
            continue
        # order-insensitive: sort by column name, then sort row tuples
        sidx = [df.columns.index(c) for c in cols]
        oidx = [[d[0] for d in cur.description].index(c) for c in ocols]
        srt = sorted((tuple(r[i] for i in sidx) for r in rows), key=repr)
        ort = sorted((tuple(r[i] for i in oidx) for r in orows), key=repr)
        if srt != ort:
            bad = next((a, b) for a, b in zip(srt, ort) if a != b)
            print(f"FAIL {name}: values differ; first diff {bad}")
            n_fail += 1
            continue
        print(f"OK {name}: rows={len(rows)} ({time.time()-t0:.1f}s)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
