"""Generator property suite over collected DataFrames.

Port of the reference's property helpers (SURVEY.md §5): type/bounds,
ordered monotonicity, distinct cardinality, FK containment, null
fraction, range counts, and the flagship idempotence property —
additionally asserted across different partition counts (the
Spark-specific hazard).
"""

from __future__ import annotations

import re

import pytest

from sdvg_spark.config.model import parse_config
from sdvg_spark.engine import Engine

ROWS = 4000

CFG = {
    "random_seed": 42,
    "models": {
        "m": {
            "rows_count": ROWS,
            "columns": [
                {"name": "i_ord", "type": "integer",
                 "type_params": {"bit_width": 64, "from": 1, "to": ROWS}, "ordered": True},
                {"name": "i_rand", "type": "integer",
                 "type_params": {"bit_width": 32, "from": -500, "to": 500}},
                {"name": "i_dist", "type": "integer",
                 "type_params": {"bit_width": 64, "from": 0, "to": 10**12},
                 "distinct_count": 32},
                {"name": "i_uniq", "type": "integer",
                 "type_params": {"bit_width": 64, "from": 0, "to": 10**15},
                 "distinct_percentage": 1.0},
                {"name": "f32", "type": "float", "type_params": {"from": 0, "to": 5}},
                {"name": "f_null", "type": "float",
                 "type_params": {"bit_width": 64, "from": -1, "to": 1},
                 "null_percentage": 0.25},
                {"name": "dt_ord", "type": "datetime", "ordered": True},
                {"name": "dt_rand", "type": "datetime",
                 "type_params": {"from": "2020-01-01T00:00:00Z", "to": "2021-01-01T00:00:00Z"}},
                {"name": "enum", "type": "string", "values": ["bronze", "gold", "silver"]},
                {"name": "first_name", "type": "string",
                 "type_params": {"logical_type": "first_name"}},
                {"name": "phone", "type": "string", "type_params": {"logical_type": "phone"}},
                {"name": "uuid", "type": "uuid"},
                {"name": "s_simple", "type": "string",
                 "type_params": {"min_length": 4, "max_length": 12}},
                {"name": "s_tmpl", "type": "string", "type_params": {"template": "AA-00-aa"}},
                {"name": "ranges", "type": "integer", "ranges": [
                    {"type_params": {"bit_width": 16, "from": 0, "to": 10},
                     "range_percentage": 0.3},
                    {"type_params": {"bit_width": 16, "from": 1000, "to": 2000},
                     "range_percentage": 0.7, "ordered": True}]},
            ],
        },
        "child": {
            "rows_count": 6000,
            "columns": [{"name": "pid", "foreign_key": "m.i_ord"}],
        },
        "child_ord": {
            "rows_count": 6000,
            "columns": [
                {"name": "pid", "foreign_key": "m.i_ord", "foreign_key_order": True}
            ],
        },
        "m_slice": {
            "rows_count": ROWS,
            "generate_from": 1000,
            "generate_to": 3000,
            "columns": [
                {"name": "v", "type": "integer",
                 "type_params": {"bit_width": 64, "from": 1, "to": ROWS}, "ordered": True}],
        },
    },
}


@pytest.fixture(scope="module")
def rows(spark):
    eng = Engine(parse_config(CFG))
    df = eng.model_df(spark, "m")
    collected = df.collect()
    assert len(collected) == ROWS
    return {"df": df, "rows": collected, "eng": eng}


def col(rows, name):
    return [r[name] for r in rows["rows"]]


def test_dtypes(rows):
    dt = dict(rows["df"].dtypes)
    assert dt["i_ord"] == "bigint"
    assert dt["i_rand"] == "int"
    assert dt["f32"] == "float"
    assert dt["f_null"] == "double"
    assert dt["dt_ord"] == "timestamp"
    assert dt["enum"] == "string"
    assert dt["uuid"] == "string"
    assert dt["ranges"] == "smallint"


def test_integer_ordered_exact_sequence(rows):
    # from=1, to=ROWS, ordered, distinct=rows -> exactly 1..ROWS
    assert col(rows, "i_ord") == list(range(1, ROWS + 1))


def test_integer_bounds(rows):
    vals = col(rows, "i_rand")
    assert all(-500 <= v <= 500 for v in vals)
    # random permutation should hit a good spread
    assert len(set(vals)) > 500


def test_distinct_count_exact(rows):
    assert len(set(col(rows, "i_dist"))) == 32


def test_distinct_percentage_all_unique(rows):
    vals = col(rows, "i_uniq")
    assert len(set(vals)) == ROWS


def test_float_bounds(rows):
    assert all(0.0 <= v <= 5.0 for v in col(rows, "f32"))


def test_null_percentage(rows):
    vals = col(rows, "f_null")
    frac = sum(v is None for v in vals) / len(vals)
    assert abs(frac - 0.25) < 0.03
    assert all(-1.0 <= v <= 1.0 for v in vals if v is not None)


def test_datetime_ordered_monotone(rows):
    vals = col(rows, "dt_ord")
    assert all(a <= b for a, b in zip(vals, vals[1:]))


def test_datetime_bounds(rows):
    from datetime import datetime

    vals = col(rows, "dt_rand")
    lo, hi = datetime(2020, 1, 1), datetime(2021, 1, 1)
    assert all(lo <= v <= hi for v in vals)


def test_enum_membership_and_balance(rows):
    vals = col(rows, "enum")
    assert set(vals) == {"bronze", "gold", "silver"}
    counts = {v: vals.count(v) for v in set(vals)}
    # round-robin block repeat keeps counts within one block of each other
    assert max(counts.values()) - min(counts.values()) <= ROWS // 3


def test_first_name_in_locale_pack(rows):
    from sdvg_spark.generators.locales import get_locale

    names = set(get_locale("en").first_names())
    vals = col(rows, "first_name")
    assert all(v in names for v in vals)


def test_phone_shape(rows):
    pat = re.compile(r"^[0-9+\-() .]+$")
    assert all(pat.match(v) for v in col(rows, "phone"))


def test_uuid_v4_shape_unique(rows):
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    vals = col(rows, "uuid")
    assert all(pat.match(v) for v in vals)
    assert len(set(vals)) == ROWS


def test_string_length_bounds(rows):
    assert all(4 <= len(v) <= 12 for v in col(rows, "s_simple"))


def test_template(rows):
    pat = re.compile(r"^[A-Z]{2}-[0-9]{2}-[a-z]{2}$")
    assert all(pat.match(v) for v in col(rows, "s_tmpl"))


def test_range_counts_exact(rows):
    vals = col(rows, "ranges")
    in1 = sum(0 <= v <= 10 for v in vals)
    in2 = sum(1000 <= v <= 2000 for v in vals)
    assert in1 + in2 == ROWS
    # LFSR permutation is bijective -> block sizes are exact (ceil)
    assert in1 == 1200
    assert in2 == 2800


def test_range_ordered_distribution(rows):
    """`ordered` inside a multi-range column: values are monotone in the
    range's draw sequence (pure-function form; the reference's
    sequential walk is monotone in visit order — documented deviation,
    SURVEY §7). Externally observable contract: the value multiset is
    the balanced floor-step sequence over the range domain."""
    sub = sorted(v for v in col(rows, "ranges") if v >= 1000)
    assert sub[0] == 1000 and sub[-1] == 2000
    counts = {v: sub.count(v) for v in set(sub)}
    # 2800 draws over 1001 distinct values -> each value 2-3 times
    assert set(counts.values()) <= {2, 3}


def test_foreign_key_containment(rows, spark):
    parents = set(col(rows, "i_ord"))
    child = rows["eng"].model_df(spark, "child").collect()
    assert len(child) == 6000
    assert all(r.pid in parents for r in child)


def test_foreign_key_ordered(rows, spark):
    """FK-ordered: sequencer cycle = PARENT row count (reference
    generator.go:38-44), so the child ramps monotonically and wraps
    when it outgrows the parent."""
    vals = [r.pid for r in rows["eng"].model_df(spark, "child_ord").collect()]
    parents = set(col(rows, "i_ord"))
    assert all(v in parents for v in vals)
    first, second = vals[:ROWS], vals[ROWS:]
    assert all(a <= b for a, b in zip(first, first[1:]))
    assert all(a <= b for a, b in zip(second, second[1:]))
    assert second[0] <= first[-1]  # wrapped back to the ramp start


def test_slice_matches_full(rows, spark):
    sliced = rows["eng"].model_df(spark, "m_slice").collect()
    assert len(sliced) == 2000
    # ordered column over the same domain: slice == rows [1000, 3000)
    assert [r.v for r in sliced] == list(range(1001, 3001))


def test_idempotence_partition_layouts(rows, spark):
    a = rows["eng"].model_df(spark, "m", num_partitions=2).collect()
    b = rows["eng"].model_df(spark, "m", num_partitions=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_seed_changes_data(spark):
    cfg2 = {**CFG, "random_seed": 43}
    eng2 = Engine(parse_config(cfg2))
    base = Engine(parse_config(CFG))
    a = [r.i_rand for r in base.model_df(spark, "m").collect()]
    b = [r.i_rand for r in eng2.model_df(spark, "m").collect()]
    assert a != b


def test_fk_into_oversized_parent_falls_back_to_feistel_per_range(spark):
    """A small child whose FK references a parent with rows_count above
    the LFSR parity cap must generate (the oversized RANGE falls back to
    feistel even though the column tier resolved to lfsr)."""
    from sdvg_spark.config.model import parse_config
    from sdvg_spark.engine import Engine

    big = 5_000_000  # > LFSR_TABLE_CAP (1<<22)
    cfg = parse_config(
        {
            "random_seed": 11,
            "models": {
                "p": {
                    "rows_count": big,
                    "columns": [
                        {"name": "pid", "type": "integer",
                         "type_params": {"bit_width": 64, "from": 1, "to": 10**12}}
                    ],
                },
                "c": {
                    "rows_count": 2000,
                    "columns": [{"name": "ref", "foreign_key": "p.pid"}],
                },
            },
            "models_to_ignore": ["p"],
        }
    )
    rows = Engine(cfg).model_df(spark, "c").collect()
    assert len(rows) == 2000
    assert all(1 <= r.ref <= 10**12 for r in rows)


def test_datetime_ns_unit_lossless_and_oracle_exact(spark):
    """unit: ns emits bigint epoch-nanos carrying the full nanosecond
    interpolation (the reference's datetime precision); truncating to
    micros reproduces the default timestamp column exactly, and the
    DuckDB oracle mirrors the bigint values bit-for-bit."""
    import duckdb

    from sdvg_spark.config.model import parse_config
    from sdvg_spark.engine import Engine
    from sdvg_spark.oracle import column_oracle_sql

    def cfg(unit):
        return parse_config(
            {
                "random_seed": 13,
                "models": {
                    "m": {
                        "rows_count": 4000,
                        "columns": [
                            {"name": "t", "type": "datetime", "type_params": {
                                "from": "2020-01-01T00:00:00.000001Z",
                                "to": "2020-01-01T00:00:00.999999Z",
                                "unit": unit}}],
                    }
                },
            }
        )

    c_ns, c_us = cfg("ns"), cfg("us")
    ns = {r.id: r.t for r in Engine(c_ns).column_df(spark, "m", "t").collect()}
    us = {r.id: r.t for r in Engine(c_us).column_df(spark, "m", "t").collect()}
    assert len(ns) == 4000
    # some values must carry a sub-microsecond tail, else ns adds nothing
    assert any(v % 1000 for v in ns.values())
    from datetime import timezone

    for i, v in ns.items():
        micros = us[i].replace(tzinfo=timezone.utc).timestamp()
        assert v // 1000 == round(micros * 1_000_000)

    sql = column_oracle_sql(c_ns, "m", "t")
    assert sql is not None
    oracle = {int(i): int(v) for i, v in duckdb.connect().execute(sql).fetchall()}
    assert oracle == {int(i): int(v) for i, v in ns.items()}


def test_text_unranking_is_injective(spark):
    """The length-bucketed text unranking must stay a bijection over
    rank space: a distinct-heavy text column produces all-unique values
    (what distinct_percentage configs rely on)."""
    from sdvg_spark.config.model import parse_config
    from sdvg_spark.engine import Engine

    cfg = parse_config(
        {
            "random_seed": 11,
            "models": {
                "m": {
                    "rows_count": 4000,
                    "columns": [
                        {
                            "name": "t",
                            "type": "string",
                            "type_params": {
                                "logical_type": "text",
                                "min_length": 20,
                                "max_length": 60,
                            },
                            "distinct_percentage": 1.0,
                        }
                    ],
                }
            },
        }
    )
    vals = [r.t for r in Engine(cfg).model_df(spark, "m").collect()]
    assert all(v for v in vals)  # every rank decodes (no dead "" ranks)
    assert len(set(vals)) == len(vals)


def test_feistel_mode_engine_vs_oracle_exact(spark):
    """The scale-tier (feistel) permutation end-to-end: engine output
    must equal the DuckDB oracle VALUE-FOR-VALUE with the permutation
    forced to feistel (the driver's gen rows run the lfsr tier at
    oracle scales, so without this test a feistel network change has
    no engine-vs-oracle witness — added with the r10 unbalanced-Feistel
    rewrite). Covers a random integer column and a multi-range mix."""
    import duckdb

    from sdvg_spark.config.model import parse_config
    from sdvg_spark.engine import Engine
    from sdvg_spark.oracle import column_oracle_sql

    cfg = parse_config(
        {
            "random_seed": 99,
            "permutation": "feistel",
            "models": {
                "m": {
                    "rows_count": 3000,
                    "columns": [
                        {"name": "v", "type": "integer",
                         "type_params": {"bit_width": 32, "from": -500, "to": 500}},
                        {"name": "mix", "type": "integer", "ranges": [
                            {"type_params": {"bit_width": 32, "from": 0, "to": 100},
                             "range_percentage": 0.6},
                            {"type_params": {"bit_width": 32, "from": 1000, "to": 2000},
                             "range_percentage": 0.4}]},
                    ],
                }
            },
        }
    )
    eng = Engine(cfg)
    for col in ("v", "mix"):
        got = {r.id: r[col] for r in eng.column_df(spark, "m", col).collect()}
        sql = column_oracle_sql(cfg, "m", col)
        assert sql is not None
        want = {int(i): int(v) for i, v in duckdb.connect().execute(sql).fetchall()}
        assert got == want and len(got) == 3000, col
