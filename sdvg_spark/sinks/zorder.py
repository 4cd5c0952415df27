"""Z-order (Morton) clustering for the parquet sink.

``sort_by`` gives tight row-group statistics on ONE leading key;
filters on any other column still read everything. Z-ordering
interleaves the bits of several normalized keys into one clustering
value, so row-group min/max envelopes stay small on EVERY participating
column — the multi-dimensional data-skipping layout (Delta/Iceberg
``OPTIMIZE ZORDER BY``) that matters at 100 TB, where a point filter on
a secondary column should prune files, not scan them.

Cost model: unlike the task-local ``sort_by``, clustering requires one
range shuffle on the z-value (data must MOVE to co-locate). That is the
standard price of any clustered rewrite; the generation engine pays it
once at write time and every selective reader wins afterwards.

Key normalization needs per-column [lo, hi] bounds. The config-driven
engine derives them from the model itself (``type_params.from/to`` —
the generator's declared value space), so no extra pass over the data;
columns whose bounds the config can't state (FK, enums, strings) fall
back to one min/max aggregate, or raise for non-numeric types.
"""

from __future__ import annotations

from datetime import timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], *, bits: int = 16) -> Column:
    """Interleave ``bits`` bits of each (already-normalized, integer in
    [0, 2^bits)) column into one long Morton code: bit b of column i
    lands at position ``b * k + i``. k·bits must fit 63 bits."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} columns x {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftrightunsigned(c, b).bitwiseAND(F.lit(1)), b * k + i)
            )
    return z


def normalized_key(col: Column, lo: float, hi: float, *, bits: int = 16) -> Column:
    """Map a numeric column to an order-preserving integer in
    [0, 2^bits): floor-scale by the [lo, hi] envelope, clamped (values
    outside the declared bounds saturate rather than wrap)."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) * F.lit(top / (hi - lo))
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit(top)
    )


def _config_bounds(model, name: str):
    """[lo, hi] from the model's declared value space, or None when the
    config can't state it (FK / enum / string columns)."""
    col = next((c for c in model.columns if c.name == name), None)
    if col is None or col.foreign_key or not col.ranges:
        return None
    if any(r.values for r in col.ranges):
        return None
    if col.type == "integer" or col.type == "float":
        los = [r.type_params.from_ for r in col.ranges if r.type_params is not None]
        his = [r.type_params.to for r in col.ranges if r.type_params is not None]
        if not los or any(v is None for v in los + his):
            return None
        return float(min(los)), float(max(his))
    if col.type == "datetime":
        tps = [r.type_params for r in col.ranges if r.type_params is not None]
        if not tps:
            return None

        def us(dt):
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return dt.timestamp() * 1e6

        return min(us(t.from_) for t in tps), max(us(t.to) for t in tps)
    return None


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    *,
    bounds: dict[str, tuple[float, float]] | None = None,
    lead: list[str] | None = None,
    bits: int = 16,
) -> DataFrame:
    """Range-repartition + sort ``df`` by the Morton code of ``cols``.

    ``bounds`` maps column -> (lo, hi); missing entries are measured
    with ONE combined min/max aggregate (a single extra job — the
    config-driven writer passes declared bounds and skips it).
    ``lead`` columns (hive partition keys) prefix both the range
    partitioning and the sort, so the dynamic-partition writer sees
    partition-led order and each hive partition is z-clustered
    internally. The helper z column never reaches the output.
    """
    bounds = dict(bounds or {})
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in bounds]
    for c in missing:
        t = dtypes.get(c, "")
        if not (
            t in ("tinyint", "smallint", "int", "bigint", "float", "double", "date")
            or t.startswith("decimal")
            or t == "timestamp"
        ):
            raise ValueError(f"zorder_by[{c}]: non-numeric type {t!r} unsupported")
    if missing:
        agg = df.select(
            *[F.min(_as_num(c, dtypes)).alias(f"lo_{i}") for i, c in enumerate(missing)],
            *[F.max(_as_num(c, dtypes)).alias(f"hi_{i}") for i, c in enumerate(missing)],
        ).first()
        for i, c in enumerate(missing):
            lo, hi = agg[f"lo_{i}"], agg[f"hi_{i}"]
            bounds[c] = (float(lo or 0), float(hi or 0))
    eff_bits = min(bits, 63 // len(cols))  # keys and interleave MUST agree
    keys = [
        normalized_key(_as_num(c, dtypes), bounds[c][0], bounds[c][1], bits=eff_bits)
        for c in cols
    ]
    lead = lead or []
    z = df.withColumn("__z", zorder_value(keys, bits=eff_bits))
    z = z.repartitionByRange(*[F.col(c) for c in lead], F.col("__z"))
    z = z.sortWithinPartitions(*lead, "__z")
    return z.drop("__z")


def _as_num(c: str, dtypes: dict[str, str]) -> Column:
    """Timestamps cluster on their epoch-micros; everything else on the
    raw numeric value."""
    if dtypes.get(c) == "timestamp":
        return F.unix_micros(F.col(c)).cast("double")
    if dtypes.get(c) == "date":
        return F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
    return F.col(c)


def apply_zorder(df: DataFrame, model, out, *, lead: list[str] | None = None) -> DataFrame:
    """Writer hook: cluster ``df`` by ``out.zorder_by`` using
    config-declared bounds where the model states them."""
    bounds = {}
    for c in out.zorder_by:
        b = _config_bounds(model, c)
        if b is not None:
            bounds[c] = b
    return cluster_by_zorder(df, out.zorder_by, bounds=bounds, lead=lead)
