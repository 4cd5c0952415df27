"""Table profiling: per-column statistics in one pass — the ANALYZE
step that fronts any large-scale ingestion (schema drift detection,
null audits, cardinality estimates for partitioning decisions).

One wide aggregate computes count / nulls / exact distinct / min / max
for every profiled column simultaneously (single scan; the distinct
counts ride Spark's expand-based multi-distinct aggregation), then a
``stack`` pivots the 1-row result into one row per column. Values are
rendered to strings through dialect-portable formatting (C-style printf
for floats, explicit micro-second patterns for timestamps) so the
DuckDB oracle matches byte-for-byte.

At 100 TB: exact multi-distinct over many columns is the expensive
part (one expand row per distinct-agg per input row); swap
``exact_distinct=False`` to use approx_count_distinct at fixed memory
when estimates suffice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _render(c: str, t: str):
    col = F.col(c)
    if t in ("float", "double"):
        return lambda x: F.format_string("%.9f", x)
    if t == "timestamp":
        return lambda x: F.date_format(x, _TS_FMT_SPARK)
    return lambda x: x.cast("string")


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """(column, dtype, n_rows, n_null, n_distinct, min_value,
    max_value) per profiled column, from ONE scan."""
    cols = columns or df.columns
    # report the logical type family: ntz/ltz timestamps profile
    # identically, and the label is part of the cross-engine contract
    dtypes = {
        c: ("timestamp" if t.startswith("timestamp") else t)
        for c, t in df.dtypes
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        r = _render(c, dtypes[c])
        distinct = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{i}"),
            distinct.alias(f"__d_{i}"),
            r(F.min(F.col(c))).alias(f"__mn_{i}"),
            r(F.max(F.col(c))).alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    parts = []
    for i, c in enumerate(cols):
        parts.append(
            f"'{c}', '{dtypes[c]}', __n, __n - __nn_{i}, "
            f"CAST(__d_{i} AS BIGINT), __mn_{i}, __mx_{i}"
        )
    stacked = one.selectExpr(
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(column, dtype, n_rows, n_null, n_distinct, min_value, max_value)"
    )
    return stacked


def profile_table_oracle_sql(
    *,
    table: str,
    columns: list[tuple[str, str]],
) -> str:
    """DuckDB mirror; ``columns`` is [(name, spark_dtype), ...] — the
    dtype string is part of the output contract, so the oracle echoes
    the Spark names."""
    selects = []
    for c, t in columns:
        if t in ("float", "double"):
            mn = f"printf('%.9f', min({c}))"
            mx = f"printf('%.9f', max({c}))"
        elif t == "timestamp":
            mn = f"strftime(min({c}), '{_TS_FMT_DUCK}')"
            mx = f"strftime(max({c}), '{_TS_FMT_DUCK}')"
        else:
            mn = f"CAST(min({c}) AS VARCHAR)"
            mx = f"CAST(max({c}) AS VARCHAR)"
        selects.append(
            f"SELECT '{c}' AS \"column\", '{t}' AS dtype, count(*) AS n_rows, "
            f"count(*) - count({c}) AS n_null, "
            f"count(DISTINCT {c}) AS n_distinct, {mn} AS min_value, "
            f"{mx} AS max_value FROM {table}"
        )
    return "\nUNION ALL\n".join(selects)
