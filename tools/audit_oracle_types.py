"""Cross-check oracle output TYPES against the Spark schema.

Root cause this guards (CORRECTNESS_r05's ``pack_sequences`` red row):
the driver fetches both the Spark result and the DuckDB oracle result
through pandas before hashing. A DuckDB column whose type drifted from
BIGINT — the classic case is ``sum(BIGINT)`` -> HUGEINT — lands in
pandas as float64, so its values stringify/hash as ``0.0`` against
Spark's int64 ``0`` even though every value is numerically equal. The
drift is only fatal when the Spark side has NO nulls (a nullable int64
collapses to float64 on BOTH sides and accidentally matches — which is
why ``curate`` stayed green with the same HUGEINT pack columns).

This audit fetches every oracle via Arrow — which preserves the true
DuckDB type (HUGEINT -> decimal128, nullable BIGINT -> int64) — and
flags any column whose type family differs from the Spark column's.
Every flag is a latent driver hash-mismatch; fix it with an explicit
cast in the oracle SQL.

Usage: python tools/audit_oracle_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_SPARK_FAMILY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "boolean": "bool",
    "string": "string",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}


def _arrow_family(t) -> str:
    s = str(t)
    if s.startswith("decimal"):
        return "DECIMAL"  # always a flag: pandas-converts to float64/object
    if "int" in s:
        return "int"
    if s in ("float", "double") or s.startswith("halffloat"):
        return "float"
    if s == "bool":
        return "bool"
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("date"):
        return "date"
    if "string" in s or "utf8" in s:
        return "string"
    return s


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from sdvg_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    n_flag = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            spark_fields = {
                f.name: f.dataType.simpleString() for f in fn(spark, sf_dir).schema.fields
            }
            schema = con.execute(oracles[name]).fetch_arrow_table().schema
        except Exception as ex:
            print(f"ERR  {name}: {ex}")
            n_flag += 1
            continue
        bad = []
        for field in schema:
            sf = spark_fields.get(field.name)
            if sf is None:
                bad.append(f"{field.name}: oracle-only column")
                continue
            want = _SPARK_FAMILY.get(sf, sf)
            got = _arrow_family(field.type)
            if want != got:
                bad.append(f"{field.name}: spark={sf} oracle_arrow={field.type}")
        if bad:
            n_flag += 1
            print(f"FLAG {name}: " + "; ".join(bad))
        else:
            print(f"ok   {name}")
    print(f"flagged={n_flag}")
    return 1 if n_flag else 0


if __name__ == "__main__":
    raise SystemExit(main())
