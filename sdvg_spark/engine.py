"""The engine: a validated config becomes one DataFrame per model.

Execution model (Spark-first; see SURVEY.md §7): each model is
``spark.range(generate_from, generate_to)`` and every column is a
deterministic expression of the row id. Nothing here shuffles — the
sequencer pipeline (permute -> range dispatch -> draw number -> jitter ->
null gate -> value) is a pure function of (seed, column key, id), so
generation is embarrassingly parallel and idempotent under any
partitioning. At 100 TB this means: no stage boundaries, no skew, output
parallelism == input splits of ``range``.

The one non-native step is the seeded permutation (a pandas UDF over
Arrow batches — numpy uint64 kernels). Columns whose sequencers are all
*ordered* skip it entirely and stay in whole-stage codegen. Value
functions are native Column expressions for integer/float/datetime/enum/
name/phone; uuid/template/plain-string/text use vectorized numpy UDFs.

Foreign keys re-evaluate the *parent's* pure expression on the child's
row-ids (the reference's zero-shuffle trick, task.go:86-114): referential
integrity without materializing or joining the parent.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sdvg_spark.config.model import ColumnSpec, ConfigError, GenerationConfig, ModelSpec
from sdvg_spark.core.rng import derive_seed
from sdvg_spark.core.sequence import ordered_col, ordered_np, perm_np, resolve_mode
from sdvg_spark.generators.values import EnumGen, make_value_gen
from sdvg_spark.session import configure_session


@dataclass
class RangePlan:
    """Physical plan for one generation range of a column."""

    index: int
    off: int  # first generator-number of this range's block
    cnt: int  # block size == sequencer cycle length
    distinct: int
    ordered: bool
    order_seed: int
    factor: float  # jitter scale: 1 - distinct/|value space|
    null_pct: float
    vgen: object


@dataclass
class ColumnPlan:
    """Physical plan for one column: sequencer tier + range plans."""

    name: str
    column_type: str
    rows: int  # column-sequencer domain/cycle (child rows for FK)
    data_seed: int  # seed of the column whose value space we draw from
    perm_mode: str
    ranges: list[RangePlan]
    dtype: str  # final Spark type (widest across ranges)

    @property
    def all_ordered_single(self) -> bool:
        return len(self.ranges) == 1 and self.ranges[0].ordered

    @property
    def fully_udf(self) -> bool:
        """Every range's value generator needs the Python path (uuid,
        free-form strings, templates, text): fuse sequencer + value into
        ONE pandas UDF so each row crosses the JVM<->Arrow boundary once,
        not twice."""
        return all(not r.vgen.is_native for r in self.ranges)

    @property
    def pure_native(self) -> bool:
        """No sequencer kernel needed: single ordered range, no jitter
        (factor 0) and no null gate — the whole column is a closed-form
        expression of id and stays in whole-stage codegen."""
        if not self.all_ordered_single:
            return False
        r = self.ranges[0]
        return r.factor == 0.0 and r.null_pct == 0.0


def plan_column(cfg: GenerationConfig, model: ModelSpec, column: ColumnSpec) -> ColumnPlan:
    """Resolve a column (following FK indirection) into a physical plan.

    Mirrors the reference's generator wiring (generator/generator.go:
    30-151): FK columns reuse the parent's seed and value space; distinct
    counts derive from the *data* model's row count; ranges get
    contiguous blocks of ceil(rows * pct) generator numbers.
    """
    data_model, data_column = cfg.data_source(model, column)
    base_seed = cfg.random_seed
    col_seed = derive_seed(base_seed, f"{model.name}.{column.name}")
    data_seed = derive_seed(base_seed, f"{data_model.name}.{data_column.name}")

    is_fk = bool(column.foreign_key)
    rows = data_model.rows_count
    if is_fk and not column.foreign_key_order:
        rows = model.rows_count

    plans: list[RangePlan] = []
    off = 0
    for i, r in enumerate(data_column.ranges):
        cnt = math.ceil(rows * r.range_percentage)
        vgen = make_value_gen(data_column.type, r)
        distinct = math.ceil(data_model.rows_count * r.range_percentage)
        if r.distinct_percentage:
            distinct = math.ceil(distinct * r.distinct_percentage)
        if r.distinct_count:
            if r.distinct_count > distinct:
                raise ConfigError(
                    f"{model.name}.{column.name}: impossible to generate "
                    f"{r.distinct_count} distinct values in {distinct} rows"
                )
            distinct = r.distinct_count
        space = vgen.values_count()
        if float(distinct) > space:
            if r.distinct_percentage or r.distinct_count:
                raise ConfigError(
                    f"{model.name}.{column.name}: impossible to generate "
                    f"{distinct} distinct values"
                )
            distinct = int(space)
        distinct = max(distinct, 1)

        ordered = r.ordered
        order_seed = data_seed
        if is_fk and not column.foreign_key_order:
            ordered = column.ranges[0].ordered if column.ranges else False
            order_seed = col_seed

        vgen.set_total(distinct)
        factor = 1.0 - (float(distinct) / space if math.isfinite(space) else 0.0)
        plans.append(
            RangePlan(
                index=i,
                off=off,
                cnt=cnt,
                distinct=distinct,
                ordered=ordered,
                order_seed=order_seed,
                factor=factor,
                null_pct=r.null_percentage,
                vgen=vgen,
            )
        )
        off += cnt

    dtype = _column_dtype(data_column, plans)
    return ColumnPlan(
        name=column.name,
        column_type=data_column.type,
        rows=rows,
        data_seed=data_seed,
        perm_mode=resolve_mode(rows, cfg.permutation),
        ranges=plans,
        dtype=dtype,
    )


def _column_dtype(data_column: ColumnSpec, plans: list[RangePlan]) -> str:
    """Widest Spark type across ranges (the reference writer uses the max
    bit width, parquet.go:120-250)."""
    t = data_column.type
    if t == "integer":
        width = 8
        for r in data_column.ranges:
            if r.type_params is not None:
                width = max(width, r.type_params.bit_width)
            else:
                width = max(width, 32)  # enum range in an integer column
        return {8: "tinyint", 16: "smallint", 32: "int", 64: "bigint"}[width]
    if t == "float":
        width = 32
        for r in data_column.ranges:
            if r.type_params is not None:
                width = max(width, r.type_params.bit_width)
        return "float" if width == 32 else "double"
    if t == "datetime":
        units = {
            getattr(r.type_params, "unit", "us")
            for r in data_column.ranges
            if r.type_params is not None
        }
        return "bigint" if units == {"ns"} else "timestamp"
    return "string"  # string / uuid


# ---------------------------------------------------------------------------
# sequencer kernel (the only pandas-UDF stage of the pipeline)


def _make_sequencer(plan: ColumnPlan, spark: SparkSession):
    """Closure: uint64 id array -> (ridx, num, r01) numpy arrays.

    One vectorized pass computes the column-level permutation, the
    range dispatch, the per-range draw number, and the frf hash draw
    (jitter/null source). LFSR parity tables ride a Spark broadcast so
    executors get them once; feistel mode needs none (100 TB path).

    Accepted deviation (multi-range columns only): the per-range draw
    is derived from the permuted generator number (k = gnum - off), not
    from the reference's stateful hit-count pull order — same value
    multiset and multiplicities, permuted row order; ``ordered`` ranges
    inside multi-range columns are monotone per block. A row-order-
    exact replay would need a global hit rank (shuffle) and break pure
    f(id). See SURVEY §7.
    """
    rows = plan.rows
    data_seed = plan.data_seed
    mode = plan.perm_mode
    single_ordered = plan.all_ordered_single
    offs = np.array([r.off for r in plan.ranges], dtype=np.uint64)
    cnts = np.array([r.cnt for r in plan.ranges], dtype=np.uint64)
    distincts = np.array([r.distinct for r in plan.ranges], dtype=np.uint64)
    ordereds = np.array([r.ordered for r in plan.ranges], dtype=bool)
    order_seeds = np.array([r.order_seed for r in plan.ranges], dtype=np.uint64)
    bounds = np.cumsum(cnts)  # dispatch boundaries (exclusive)

    # Ship parity tables via broadcast (they can be MBs); feistel needs
    # none. A range whose distinct exceeds the parity cap (e.g. an FK
    # into a >cap parent from a small child) gets no table and falls
    # back to feistel per-range (range_perm_mode).
    tables_bc = None
    if mode == "lfsr" and not single_ordered:
        from sdvg_spark.core.sequence import lfsr_walk, range_perm_mode

        tables = {"col": np.asarray(lfsr_walk(rows, data_seed))}
        for r in plan.ranges:
            if not r.ordered and range_perm_mode(mode, r.distinct) == "lfsr":
                tables[r.index] = np.asarray(lfsr_walk(r.distinct, int(r.order_seed)))
        tables_bc = spark.sparkContext.broadcast(tables)

    from sdvg_spark.core.rng import frf_np

    def compute(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if single_ordered:
            ridx = np.zeros(len(idx), dtype=np.int64)
            num = ordered_np(idx, int(distincts[0]), int(cnts[0]))
        else:
            if tables_bc is not None:
                tables = tables_bc.value
                gnum = tables["col"][(idx % np.uint64(rows)).astype(np.int64)]
            else:
                gnum = perm_np(idx, rows, data_seed, mode)
            ridx = np.searchsorted(bounds, gnum, side="right").astype(np.int64)
            np.minimum(ridx, len(bounds) - 1, out=ridx)
            k = gnum - offs[ridx]
            num = np.zeros(len(idx), dtype=np.uint64)
            for j in range(len(offs)):
                m = ridx == j
                if not m.any():
                    continue
                if ordereds[j]:
                    num[m] = ordered_np(k[m], int(distincts[j]), int(cnts[j]))
                else:
                    tab = tables_bc.value.get(j) if tables_bc is not None else None
                    if tab is not None:
                        num[m] = tab[(k[m] % distincts[j]).astype(np.int64)]
                    else:
                        num[m] = perm_np(k[m], int(distincts[j]), int(order_seeds[j]), "feistel")
        r01 = frf_np(num + np.uint64(data_seed))
        return ridx, num, r01

    return compute


def _make_sequence_kernel(plan: ColumnPlan, spark: SparkSession):
    """pandas UDF: id -> struct(ridx, num, r01) — struct(num, r01) for
    single-range columns, whose ridx is the constant 0 (the dispatch
    field would ship 4 dead bytes per row per column through Arrow;
    at the 20M-row bench mix that is ~320 MB of transfer for nothing).

    Emitting r01 here — not as a native column expression — matters:
    the SplitMix chain as a Catalyst tree doubles in size per scramble
    step (each xor references its operand twice), and every downstream
    reference re-inlines it. The Arrow node is a materialization
    barrier, so the value expressions only ever reference cheap struct
    fields.
    """
    compute = _make_sequencer(plan, spark)

    if len(plan.ranges) == 1:

        @pandas_udf("num long, r01 double")
        def kernel(ids: pd.Series) -> pd.DataFrame:
            idx = ids.to_numpy(dtype=np.int64).astype(np.uint64)
            _, num, r01 = compute(idx)
            return pd.DataFrame({"num": num.astype(np.int64), "r01": r01})

        return kernel

    @pandas_udf("ridx int, num long, r01 double")
    def kernel(ids: pd.Series) -> pd.DataFrame:
        idx = ids.to_numpy(dtype=np.int64).astype(np.uint64)
        ridx, num, r01 = compute(idx)
        return pd.DataFrame(
            {"ridx": ridx.astype(np.int32), "num": num.astype(np.int64), "r01": r01}
        )

    return kernel


def _make_fused_kernel(plan: ColumnPlan, spark: SparkSession):
    """pandas UDF: id -> final value, for columns whose every range needs
    the Python value path (uuid/template/plain-string/text).

    Fusing sequencer + jitter + null gate + value into one UDF halves
    the JVM<->Arrow round-trips versus kernel + value-UDF chaining —
    measured 35 s -> ~8 s for 2M uuid rows on local[32].
    """
    compute = _make_sequencer(plan, spark)
    ranges = plan.ranges

    @pandas_udf(plan.dtype)
    def kernel(ids: pd.Series) -> pd.Series:
        idx = ids.to_numpy(dtype=np.int64).astype(np.uint64)
        ridx, num, r01 = compute(idx)
        numf = num.astype(np.float64)
        out = pd.Series(np.empty(len(idx), dtype=object))
        for r in ranges:
            m = ridx == r.index if len(ranges) > 1 else np.ones(len(idx), dtype=bool)
            if not m.any():
                continue
            number = numf[m] + r01[m] * r.factor
            vals = pd.Series(r.vgen.np_value(number))
            if r.null_pct > 0:
                vals[np.asarray(r01[m] < r.null_pct)] = None
            out[np.asarray(m)] = vals.to_numpy(dtype=object)
        return out

    return kernel


def _make_value_udf(vgen, dtype: str):
    """Vectorized numpy value kernel for the non-native generators."""

    @pandas_udf(dtype)
    def value_udf(number: pd.Series) -> pd.Series:
        out = vgen.np_value(number.to_numpy(dtype=np.float64))
        return pd.Series(out)

    return value_udf


def value_expr(plan: ColumnPlan, num: Column, ridx: Column, r01: Column) -> Column:
    """Jitter + null gate + value dispatch, given the draw numbers.

    ``r01`` = frf(data_seed + num) drives BOTH the jitter and the null
    gate (reference generator.go:220-237 uses the same hash draw for
    both); it arrives pre-computed from the sequencer kernel."""

    def range_value(r: RangePlan) -> Column:
        number = num.cast("double") + r01 * F.lit(r.factor)
        native = r.vgen.expr(number, num)
        value = (
            native
            if native is not None
            else _make_value_udf(r.vgen, r.vgen.spark_dtype)(number)
        )
        value = value.cast(plan.dtype)
        if r.null_pct > 0:
            value = F.when(
                r01 < F.lit(r.null_pct), F.lit(None).cast(plan.dtype)
            ).otherwise(value)
        return value

    if len(plan.ranges) == 1:
        result = range_value(plan.ranges[0])
    else:
        result = None
        for r in plan.ranges:
            cond = ridx == F.lit(r.index)
            v = range_value(r)
            result = F.when(cond, v) if result is None else result.when(cond, v)
    return result.alias(plan.name)


class Engine:
    """Config -> DataFrames -> sinks."""

    def __init__(self, cfg: GenerationConfig):
        self.cfg = cfg

    def plans_for(self, model: ModelSpec) -> list[ColumnPlan]:
        return [plan_column(self.cfg, model, c) for c in model.columns]

    def model_df(
        self,
        spark: SparkSession,
        model_name: str,
        generate_from: int | None = None,
        generate_to: int | None = None,
        num_partitions: int | None = None,
        keep_id: bool = False,
    ) -> DataFrame:
        configure_session(spark)
        model = self.cfg.models[model_name]
        lo = model.generate_from if generate_from is None else generate_from
        hi = model.generate_to if generate_to is None else generate_to
        base = (
            spark.range(lo, hi, 1, num_partitions)
            if num_partitions
            else spark.range(lo, hi)
        )
        plans = self.plans_for(model)
        return self.apply_columns(spark, base, plans, keep_id=keep_id)

    def apply_columns(
        self,
        spark: SparkSession,
        base: DataFrame,
        plans: list[ColumnPlan],
        keep_id: bool = False,
        extra_cols: list[str] | None = None,
    ) -> DataFrame:
        """Evaluate column plans over ANY DataFrame with an ``id`` column
        (batch ``spark.range`` or a streaming rate source — generation is
        a pure function of the row index either way)."""
        extra = [F.col(c) for c in (extra_cols or [])]

        # Stage 1: one Arrow kernel per non-closed-form column — fused
        # (value included) when every range needs the Python value path,
        # else a sequencer struct whose fields feed native expressions.
        seq_cols = []
        for plan in plans:
            if plan.pure_native:
                continue
            if plan.fully_udf:
                kernel = _make_fused_kernel(plan, spark)
                seq_cols.append(kernel(F.col("id")).alias(f"__val_{plan.name}"))
            else:
                kernel = _make_sequence_kernel(plan, spark)
                seq_cols.append(kernel(F.col("id")).alias(f"__seq_{plan.name}"))
        staged = base.select(F.col("id"), *extra, *seq_cols) if seq_cols else base

        # Stage 2: jitter + null gate + value dispatch, all native.
        exprs = []
        for plan in plans:
            if plan.pure_native:
                r = plan.ranges[0]
                num = ordered_col(F.col("id"), r.distinct, r.cnt)
                ridx = F.lit(0)
                r01 = F.lit(0.0)
            elif plan.fully_udf:
                exprs.append(F.col(f"__val_{plan.name}").alias(plan.name))
                continue
            else:
                num = F.col(f"__seq_{plan.name}.num")
                # single-range kernels omit the constant dispatch field
                ridx = (
                    F.col(f"__seq_{plan.name}.ridx")
                    if len(plan.ranges) > 1
                    else F.lit(0)
                )
                r01 = F.col(f"__seq_{plan.name}.r01")
            exprs.append(value_expr(plan, num, ridx, r01))
        if keep_id:
            exprs = [F.col("id"), *exprs]
        return staged.select(*extra, *exprs)

    def model_df_with_id(self, spark: SparkSession, model_name: str, **kw) -> DataFrame:
        """model_df plus the raw row-id column (oracle comparisons)."""
        return self.model_df(spark, model_name, keep_id=True, **kw)

    def column_df(
        self,
        spark: SparkSession,
        model_name: str,
        column_name: str,
        num_partitions: int | None = None,
    ) -> DataFrame:
        """(id, <column>) for exactly one column — avoids planning the
        whole model (oracle checks are per-column)."""
        configure_session(spark)
        model = self.cfg.models[model_name]
        plan = plan_column(self.cfg, model, model.column(column_name))
        lo, hi = model.generate_from, model.generate_to
        base = (
            spark.range(lo, hi, 1, num_partitions)
            if num_partitions
            else spark.range(lo, hi)
        )
        if plan.pure_native:
            r = plan.ranges[0]
            num = ordered_col(F.col("id"), r.distinct, r.cnt)
            ridx = F.lit(0)
            r01 = F.lit(0.0)
            staged = base
        elif plan.fully_udf:
            kernel = _make_fused_kernel(plan, spark)
            return base.select(
                F.col("id"), kernel(F.col("id")).alias(plan.name)
            )
        else:
            kernel = _make_sequence_kernel(plan, spark)
            staged = base.select(F.col("id"), kernel(F.col("id")).alias("__seq"))
            num = F.col("__seq.num")
            ridx = F.col("__seq.ridx")
            r01 = F.col("__seq.r01")
        return staged.select(F.col("id"), value_expr(plan, num, ridx, r01))

    def run(self, spark: SparkSession, models: list[str] | None = None) -> dict[str, str]:
        """Generate + write every (non-ignored) model. Returns model->path."""
        from sdvg_spark.sinks.writers import write_model

        written: dict[str, str] = {}
        for name, model in self.cfg.models.items():
            if name in self.cfg.models_to_ignore:
                continue
            if models is not None and name not in models:
                continue
            df = self.model_df(spark, name)
            written[name] = write_model(spark, df, model, self.cfg.output)
        return written
