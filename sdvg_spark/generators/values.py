"""Value generators: the n-th element of each type's ordered value space.

Contract (mirroring the reference Generator interface, /root/reference
.../generator/value/interfaces.go:4-13): ``value(number)`` returns the
number-th element of the type's totally ordered value space after
``set_total(distinct_count)``; ``values_count`` is the size of that
space (used to clamp distinct counts and derive the jitter factor).

Each generator exposes up to three synchronized forms:

* ``expr(number, num)``  — native Spark Column (JVM, codegen); preferred
* ``np_value(number)``   — numpy kernel for the Arrow/pandas-UDF path
* ``sql(number_expr)``   — DuckDB SQL mirror for exact oracle queries
                           (None when not SQL-expressible)

``number`` is the jittered draw (float64 = num + frf*factor, frf < 1 so
``floor(number) == num`` always); ``num`` is the integer draw.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from sdvg_spark.config.model import (
    DateTimeParams,
    FloatParams,
    IntegerParams,
    StringParams,
)
from sdvg_spark.core.rng import dlit
from sdvg_spark.generators import locales

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)
_TWO63 = float(1 << 63)


def _unix_sec_nsec(dt: datetime) -> tuple[int, int]:
    """Floor seconds since epoch + nanosecond remainder (Go Unix() semantics)."""
    delta = dt - _EPOCH
    sec = delta.days * 86400 + delta.seconds
    nsec = delta.microseconds * 1000
    return sec, nsec


def _ordered_int64_py(from_: int, to: int, number: float, total: int) -> int:
    step = (float(to) - float(from_) + 1.0) / float(total)
    v = step * number
    u = int(v) & ((1 << 64) - 1)
    if u >= (1 << 63):
        u -= 1 << 64
    return from_ + u


def _ordered_int64_np(from_: int, to: int, number: np.ndarray, total: int) -> np.ndarray:
    step = (float(to) - float(from_) + 1.0) / float(total)
    v = step * number
    u = v.astype(np.uint64)  # trunc toward zero; v >= 0 always
    with np.errstate(over="ignore"):
        # from + int64(uint64(v)): two's-complement wrap addition
        return u.view(np.int64) + np.int64(from_)


def _ordered_int64_col(from_: int, to: int, number: Column, total: int) -> Column:
    """Native Spark: from + int64(uint64(step * number)).

    The uint64->int64 reinterpretation matters only when the value space
    crosses 2^63 (e.g. full-range 64-bit integers); handled by an
    explicit branch since a double->long cast saturates rather than
    wraps. Requires ANSI off so the long addition wraps like Go.
    """
    step = (float(to) - float(from_) + 1.0) / float(total)
    v = number * F.lit(step)
    small = F.lit(from_) + v.cast("long")
    big = F.lit(from_) + (v - F.lit(_TWO63)).cast("long") + F.lit(-(1 << 63))
    return F.when(v < F.lit(_TWO63), small).otherwise(big)


def _ordered_int64_sql(from_: int, to: int, number_expr: str, total: int) -> str | None:
    step = (float(to) - float(from_) + 1.0) / float(total)
    if float(to) - float(from_) + 1.0 >= _TWO63:
        return None  # DuckDB BIGINT arithmetic would overflow-error
    return f"({from_} + CAST(trunc(({number_expr}) * {dlit(step)}) AS BIGINT))"


# ---------------------------------------------------------------------------


class IntegerGen:
    """n-th integer of [from, to]; semantics per reference value/integer.go."""

    is_native = True

    def __init__(self, params: IntegerParams):
        self.p = params
        self.total = 1

    @property
    def spark_dtype(self) -> str:
        return {8: "tinyint", 16: "smallint", 32: "int", 64: "bigint"}[self.p.bit_width]

    def values_count(self) -> float:
        return self.p.values_count

    def set_total(self, total: int) -> None:
        self.total = max(total, 1)

    def expr(self, number: Column, num: Column) -> Column:
        v = _ordered_int64_col(self.p.from_, self.p.to, number, self.total)
        return v.cast(self.spark_dtype)

    def np_value(self, number: np.ndarray) -> np.ndarray:
        v = _ordered_int64_np(self.p.from_, self.p.to, number, self.total)
        dt = {8: np.int8, 16: np.int16, 32: np.int32, 64: np.int64}[self.p.bit_width]
        return v.astype(dt)

    def sql(self, number_expr: str) -> str | None:
        base = _ordered_int64_sql(self.p.from_, self.p.to, number_expr, self.total)
        if base is None:
            return None
        cast = {8: "TINYINT", 16: "SMALLINT", 32: "INTEGER", 64: "BIGINT"}[self.p.bit_width]
        return f"CAST({base} AS {cast})"


class FloatGen:
    """Linear interpolation from..to; float32 cast for bit_width 32."""

    is_native = True

    def __init__(self, params: FloatParams):
        self.p = params
        self.total = 1

    @property
    def spark_dtype(self) -> str:
        return "float" if self.p.bit_width == 32 else "double"

    def values_count(self) -> float:
        return math.inf

    def set_total(self, total: int) -> None:
        self.total = max(total, 1)

    def expr(self, number: Column, num: Column) -> Column:
        if self.p.from_ == self.p.to:
            v = F.lit(float(self.p.from_))
        else:
            s = number / F.lit(float(self.total))
            v = F.lit(self.p.from_) * (F.lit(1.0) - s) + F.lit(self.p.to) * s
        return v.cast(self.spark_dtype)

    def np_value(self, number: np.ndarray) -> np.ndarray:
        if self.p.from_ == self.p.to:
            v = np.full(len(number), self.p.from_)
        else:
            s = number / float(self.total)
            v = self.p.from_ * (1.0 - s) + self.p.to * s
        return v.astype(np.float32) if self.p.bit_width == 32 else v

    def sql(self, number_expr: str) -> str | None:
        if self.p.from_ == self.p.to:
            v = f"({dlit(self.p.from_)})"
        else:
            s = f"(({number_expr}) / {dlit(self.total)})"
            v = f"({dlit(self.p.from_)} * (1.0 - {s}) + {dlit(self.p.to)} * {s})"
        return f"CAST({v} AS REAL)" if self.p.bit_width == 32 else f"CAST({v} AS DOUBLE)"


class DateTimeGen:
    """Seconds and nanoseconds interpolated independently (reference
    value/datetime.go:29-67). Default unit "us" emits a Spark TIMESTAMP
    (µs — the reference's nanosecond tail truncated, documented
    deviation, SURVEY.md §7); unit "ns" emits BIGINT epoch-nanoseconds,
    lossless parity with the reference's nanosecond carry."""

    def __init__(self, params: DateTimeParams):
        self.p = params
        self.total = 1
        self.from_sec, self.from_nsec = _unix_sec_nsec(params.from_)
        self.to_sec, to_nsec = _unix_sec_nsec(params.to)
        self.to_nsec = to_nsec + (1_000_000_000 if to_nsec < self.from_nsec else 0)
        self.ns_unit = getattr(params, "unit", "us") == "ns"

    is_native = True

    @property
    def spark_dtype(self) -> str:
        return "bigint" if self.ns_unit else "timestamp"

    def values_count(self) -> float:
        sec_count = float(self.to_sec - self.from_sec) + 1
        nsec_count = float(self.to_nsec - self.from_nsec) + 1
        return sec_count * nsec_count

    def set_total(self, total: int) -> None:
        self.total = max(total, 1)

    def _sec_nsec_cols(self, number: Column) -> tuple[Column, Column]:
        vsec = _ordered_int64_col(self.from_sec, self.to_sec, number, self.total)
        vnsec = _ordered_int64_col(self.from_nsec, self.to_nsec, number, self.total)
        vnsec = F.when(vnsec > F.lit(1_000_000_000), vnsec - F.lit(1_000_000_000)).otherwise(vnsec)
        return vsec, vnsec

    def expr(self, number: Column, num: Column) -> Column:
        vsec, vnsec = self._sec_nsec_cols(number)
        if self.ns_unit:
            return vsec * F.lit(1_000_000_000) + vnsec
        return F.timestamp_micros(vsec * F.lit(1_000_000) + (vnsec / F.lit(1000)).cast("long"))

    def np_value(self, number: np.ndarray) -> np.ndarray:
        vsec = _ordered_int64_np(self.from_sec, self.to_sec, number, self.total)
        vnsec = _ordered_int64_np(self.from_nsec, self.to_nsec, number, self.total)
        vnsec = np.where(vnsec > 1_000_000_000, vnsec - 1_000_000_000, vnsec)
        if self.ns_unit:
            return vsec * 1_000_000_000 + vnsec  # int64 nanos
        return vsec * 1_000_000 + vnsec // 1000  # int64 micros

    def sql(self, number_expr: str) -> str | None:
        vsec = _ordered_int64_sql(self.from_sec, self.to_sec, number_expr, self.total)
        vnsec_raw = _ordered_int64_sql(self.from_nsec, self.to_nsec, number_expr, self.total)
        if vsec is None or vnsec_raw is None:
            return None
        vnsec = (
            f"(CASE WHEN {vnsec_raw} > 1000000000 THEN {vnsec_raw} - 1000000000 "
            f"ELSE {vnsec_raw} END)"
        )
        if self.ns_unit:
            return f"CAST({vsec} * 1000000000 + {vnsec} AS BIGINT)"
        return f"make_timestamp({vsec} * 1000000 + {vnsec} // 1000)"


class UUIDGen:
    """16 bytes drawn by repeated base-255 digit extraction of
    number/total, then RFC-4122 v4/variant bits forced; canonical
    36-char string form (reference value/uuid.go:28-48)."""

    def __init__(self):
        self.total = 1

    spark_dtype = "string"
    is_native = False

    def values_count(self) -> float:
        return float((1 << 118) - 1)

    def set_total(self, total: int) -> None:
        self.total = max(total, 1)

    def expr(self, number: Column, num: Column) -> None:
        return None  # UDF path only

    # canonical 8-4-4-4-12 layout: char positions of each byte's nibbles
    _DASHES = (8, 13, 18, 23)
    _NIBBLE_POS = [
        (0, 1), (2, 3), (4, 5), (6, 7),          # bytes 0-3
        (9, 10), (11, 12),                        # bytes 4-5
        (14, 15), (16, 17),                       # bytes 6-7
        (19, 20), (21, 22),                       # bytes 8-9
        (24, 25), (26, 27), (28, 29), (30, 31), (32, 33), (34, 35),  # 10-15
    ]
    _HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)

    def np_value(self, number: np.ndarray) -> np.ndarray:
        n = len(number)
        idx = number / float(self.total)
        b = np.empty((n, 16), dtype=np.uint8)
        for i in range(16):  # 16 vectorized passes, no per-row work
            pos = np.floor(255.0 * idx)
            b[:, i] = pos.astype(np.uint8)
            idx = 255.0 * idx - pos
            np.maximum(idx, 0.0, out=idx)
        b[:, 6] = (b[:, 6] & 0x0F) | 0x40
        b[:, 8] = (b[:, 8] & 0x3F) | 0x80
        out = np.empty((n, 36), dtype=np.uint8)
        out[:, list(self._DASHES)] = ord("-")
        for j, (hi, lo) in enumerate(self._NIBBLE_POS):
            out[:, hi] = self._HEX[b[:, j] >> 4]
            out[:, lo] = self._HEX[b[:, j] & 0xF]
        return out.reshape(-1).view("S36").astype("U36")

    def sql(self, number_expr: str) -> str | None:
        return None

    def sql_lateral(
        self, number_expr: str, prefix: str
    ) -> tuple[list[tuple[str, str]], str]:
        """DuckDB mirror of :meth:`np_value` via lateral column aliases.

        The 16-step ``floor(255·idx)`` digit chain is stepwise IEEE
        float arithmetic — each stage must reference the *named* prior
        stage (a closed form would round differently), which lateral
        aliases express without exponential expression blowup.
        """
        lat: list[tuple[str, str]] = [(f"{prefix}i0", f"(({number_expr}) / {dlit(self.total)})")]
        for i in range(16):
            lat.append((f"{prefix}b{i}", f"floor(255.0 * {prefix}i{i})"))
            lat.append(
                (
                    f"{prefix}i{i+1}",
                    f"greatest(255.0 * {prefix}i{i} - {prefix}b{i}, 0.0)",
                )
            )
        byte_exprs = [f"CAST({prefix}b{i} AS INTEGER)" for i in range(16)]
        byte_exprs[6] = f"(({byte_exprs[6]} & 15) | 64)"   # version 4
        byte_exprs[8] = f"(({byte_exprs[8]} & 63) | 128)"  # RFC 4122 variant
        fmt = "%02x" * 4 + "-" + "%02x" * 2 + "-" + "%02x" * 2 + "-" + "%02x" * 2 + "-" + "%02x" * 6
        value = f"printf('{fmt}', {', '.join(byte_exprs)})"
        return lat, value


class EnumGen:
    """values[floor(number) / rows_per_value] over the pre-sorted literal
    list (nulls first). ``values`` must already be coerced/sorted by the
    config layer."""

    is_native = True

    def __init__(self, values: list, column_type: str):
        self.values = values
        self.column_type = column_type
        self.total = 1
        self.rows_per_value = 1

    @property
    def spark_dtype(self) -> str:
        return {
            "integer": "int",
            "float": "float",
            "string": "string",
            "datetime": "timestamp",
            "uuid": "string",
        }[self.column_type]

    def dtype_for(self, bit_width: int | None = None) -> str:
        if self.column_type == "integer" and bit_width:
            return {8: "tinyint", 16: "smallint", 32: "int", 64: "bigint"}[bit_width]
        if self.column_type == "float" and bit_width:
            return "float" if bit_width == 32 else "double"
        return self.spark_dtype

    def values_count(self) -> float:
        return float(len(self.values))

    def set_total(self, total: int) -> None:
        self.total = max(total, 1)
        self.rows_per_value = math.ceil(self.total / len(self.values))

    def _array_lit(self, dtype: str) -> Column:
        return F.array(*[F.lit(v).cast(dtype) for v in self.values])

    def expr(self, number: Column, num: Column, dtype: str | None = None) -> Column:
        dt = dtype or self.spark_dtype
        idx = F.floor(num / F.lit(self.rows_per_value)).cast("int")
        return F.element_at(self._array_lit(dt), idx + F.lit(1))

    def np_value(self, number: np.ndarray) -> np.ndarray:
        idx = (number.astype(np.int64) // self.rows_per_value).astype(np.int64)
        out = np.empty(len(number), dtype=object)
        for r in range(len(number)):
            out[r] = self.values[int(idx[r])]
        return out

    def sql(self, num_expr: str, duck_type: str | None = None) -> str:
        def lit(v) -> str:
            if v is None:
                return "NULL"
            if isinstance(v, str):
                esc = v.replace("'", "''")
                return f"'{esc}'"
            if isinstance(v, datetime):
                return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
            return repr(v)

        items = ", ".join(lit(v) for v in self.values)
        cast = f"::{duck_type}" if duck_type else ""
        return f"(([{items}])[(({num_expr}) // {self.rows_per_value})::BIGINT + 1]){cast}"


# ---------------------------------------------------------------------------
# string family


class StringGen:
    """Dispatches on logical_type/template like the reference
    StringGenerator (value/string.go): plain lexicographic strings,
    templates, names, phones, or word-unranked text."""

    def __init__(self, params: StringParams):
        self.p = params
        self.total = 1
        self.pack = locales.get_locale(params.locale)
        self.charset = locales.charset_for(params)
        self.count_by_prefix: list[float] = []
        self.sum_by_prefix: list[float] = []
        self.completions: list[int] = []
        self._prepare()

    spark_dtype = "string"

    @property
    def is_native(self) -> bool:
        return self.p.logical_type in ("first_name", "last_name", "phone") and not self.p.template

    def _prepare(self) -> None:
        p = self.p
        if p.logical_type == "first_name" and not self.pack.first_names(p.min_length, p.max_length):
            raise ValueError(
                f"no first names with length in [{p.min_length}, {p.max_length}]"
            )
        if p.logical_type == "last_name" and not self.pack.last_names_filtered(
            p.min_length, p.max_length
        ):
            raise ValueError(
                f"no last names with length in [{p.min_length}, {p.max_length}]"
            )
        if p.logical_type == "phone" and not self.pack.phone_patterns_filtered(
            p.min_length, p.max_length
        ):
            raise ValueError(
                f"no phone patterns with length in [{p.min_length}, {p.max_length}]"
            )
        if p.logical_type == "text":
            # length-bucketed word tables: the unranking picks a word
            # LENGTH first (≤ ~13 buckets), then indexes into the
            # bucket — O(#lengths) per pick on both the numpy and SQL
            # paths instead of an O(#words) scan (the distinction is a
            # pure re-enumeration of the same value space: comp[] totals
            # are identical, only the rank→text bijection differs).
            by_len: dict[int, list[str]] = {}
            for w in self.pack.words:
                by_len.setdefault(len(w) + 1, []).append(w)
            self.text_wlens = sorted(by_len)
            self.text_by_len = [by_len[L] for L in self.text_wlens]
            self.completions = self._calc_completions(p.max_length + 1)
            # cums[rem] = 0-prepended prefix sums over length buckets of
            # cnt_L * comp[rem - L]; zero blocks (inadmissible lengths)
            # are skipped by upper-bound search automatically
            max_pre = len(self.completions) - 1
            self.text_cums = []
            for rem in range(max_pre + 1):
                acc, row = 0, [0]
                for L, bucket in zip(self.text_wlens, self.text_by_len):
                    if L <= rem:
                        acc += len(bucket) * self.completions[rem - L]
                    row.append(acc)
                self.text_cums.append(row)

    # -- completions DP for text unranking (reference value/string.go:129-171)
    def _calc_completions(self, length: int) -> list[int]:
        comp = [0] * (length + 2)
        comp[0] = 1
        # comp[1]: a 1-char terminal word with no trailing delimiter
        # (L buckets key on len(w)+1, so 1-char words live in L == 2)
        comp[1] = len(self.text_by_len[self.text_wlens.index(2)]) if 2 in self.text_wlens else 0
        for l in range(2, length + 1):
            for L, bucket in zip(self.text_wlens, self.text_by_len):
                if L <= l:
                    comp[l] += len(bucket) * comp[l - L]
        out = []
        for c in comp[: length + 1]:
            if c > (1 << 63) - 1:
                break
            out.append(c)
        return out

    def values_count(self) -> float:
        p = self.p
        if p.template:
            pack = self.pack
            return (
                float(len(pack.large_letters)) ** p.template.count("A")
                + float(len(pack.small_letters)) ** p.template.count("a")
                + float(len(locales.NUMBERS)) ** p.template.count("0")
                + float(len(locales.SPECIAL_CHARS)) ** p.template.count("#")
            )
        if p.logical_type == "first_name":
            return float(len(self.pack.first_names(p.min_length, p.max_length)))
        if p.logical_type == "last_name":
            return float(len(self.pack.last_names_filtered(p.min_length, p.max_length)))
        if p.logical_type == "phone":
            return float(
                sum(
                    10.0 ** pat.count("#")
                    for pat in self.pack.phone_patterns_filtered(p.min_length, p.max_length)
                )
            )
        if p.logical_type == "text":
            if p.min_length > len(self.completions):
                return math.inf
            return float(
                sum(
                    self.completions[length + 1]
                    for length in range(p.min_length, p.max_length + 1)
                    if length + 1 < len(self.completions)
                )
            )
        total = 0.0
        for length in range(p.min_length, p.max_length + 1):
            total += float(len(self.charset)) ** length
        return total

    def set_total(self, total: int) -> None:
        self.total = max(total, 1)
        p = self.p
        if not p.logical_type and not p.template:
            n_len = p.max_length - p.min_length + 1
            count_by_length = [0.0] * (p.max_length + 1)
            avg = math.ceil(self.total / n_len)
            for length in range(p.min_length, p.max_length + 1):
                range_count = float(len(self.charset)) ** length
                if avg > range_count:
                    cur = range_count
                    if length < p.max_length:
                        avg += (avg - range_count) / float(p.max_length - length)
                else:
                    cur = math.ceil(avg)
                count_by_length[length] = cur
            self.count_by_prefix = [0.0] * (p.max_length + 2)
            self.sum_by_prefix = [0.0] * (p.max_length + 2)
            for prefix in range(p.max_length + 1):
                div = float(len(self.charset)) ** prefix
                self.count_by_prefix[prefix] = count_by_length[prefix] / div
                for length in range(p.max_length - prefix + 1):
                    self.sum_by_prefix[prefix] += count_by_length[length + prefix] / div

    # -- native paths -------------------------------------------------------

    def expr(self, number: Column, num: Column) -> Column | None:
        p = self.p
        if p.template:
            return None  # UDF
        if p.logical_type == "first_name":
            names = self.pack.first_names(p.min_length, p.max_length)
            return self._list_pick_col(names, number)
        if p.logical_type == "last_name":
            names = self.pack.last_names_filtered(p.min_length, p.max_length)
            return self._list_pick_col(names, number)
        if p.logical_type == "phone":
            return self._phone_col(number)
        return None  # text / simple string -> UDF

    def _list_pick_col(self, items: list[str], number: Column) -> Column:
        """n-th element of a sorted name list (reference firstName/
        lastName, value/string.go:203-219) as a native array-literal
        lookup — stays inside whole-stage codegen."""
        pos = _ordered_int64_col(0, len(items) - 1, number, self.total)
        return F.element_at(F.lit(items), pos.cast("int") + F.lit(1))

    @staticmethod
    def _splice_pattern(pattern: str, digits: Column) -> Column:
        """Fill '#' slots of pattern left-to-right from a digit string.

        Grouped by runs (one substring per '#' run) — a per-character
        splice deep-copies the digits expression tree per slot and blows
        up Catalyst analysis time.
        """
        import re as _re

        parts: list[Column] = []
        di = 1
        for run in _re.findall(r"#+|[^#]+", pattern):
            if run.startswith("#"):
                parts.append(F.substring(digits, di, len(run)))
                di += len(run)
            else:
                parts.append(F.lit(run))
        return F.concat(*parts)

    def _phone_col(self, number: Column) -> Column:
        pats = self.pack.phone_patterns_filtered(self.p.min_length, self.p.max_length)
        pos = _ordered_int64_col(0, len(pats) - 1, number, self.total).cast("int")
        result = F.lit(None).cast("string")
        for k, pat in enumerate(pats):
            ndig = pat.count("#")
            max_phone = 10**ndig - 1
            phone_num = _ordered_int64_col(0, max_phone, number, self.total)
            digits = F.lpad(phone_num.cast("string"), ndig, "0")
            result = F.when(pos == F.lit(k), self._splice_pattern(pat, digits)).otherwise(
                result
            )
        return result

    # -- SQL mirrors --------------------------------------------------------

    def sql(self, number_expr: str) -> str | None:
        p = self.p
        if p.template:
            return None
        if p.logical_type in ("first_name", "last_name"):
            items = (
                self.pack.first_names(p.min_length, p.max_length)
                if p.logical_type == "first_name"
                else self.pack.last_names_filtered(p.min_length, p.max_length)
            )
            pos = _ordered_int64_sql(0, len(items) - 1, number_expr, self.total)
            lits = ", ".join("'" + s.replace("'", "''") + "'" for s in items)
            return f"([{lits}])[{pos} + 1]"
        if p.logical_type == "phone":
            return self._phone_sql(number_expr)
        return None

    def sql_lateral(
        self, number_expr: str, prefix: str
    ) -> tuple[list[tuple[str, str]], str] | None:
        """DuckDB mirror of the stepwise string unrankings.

        Template columns: the same ``floor(base·idx)`` digit chain as
        UUID (lateral aliases keep IEEE rounding identical
        stage-for-stage), one drawn character per placeholder.
        Plain strings: the prefix-table walk of :meth:`_simple_np`
        (reference simpleString, value/string.go:382-410) unrolled to
        ``max_length`` lateral stages carrying (remaining, active,
        length) per row, plus the quadratic-probe tail extension.
        """
        p = self.p
        if not p.logical_type and not p.template and p.max_length <= 32:
            return self._simple_sql_lateral(number_expr, prefix)
        if p.logical_type == "text" and len(self.completions) <= 80:
            return self._text_sql_lateral(number_expr, prefix)
        if not p.template:
            return None
        from sdvg_spark.generators import locales as _loc

        lat: list[tuple[str, str]] = [
            (f"{prefix}i0", f"(({number_expr}) / {dlit(self.total)})")
        ]
        parts: list[str] = []
        j = 0
        for ch in p.template:
            letters = {
                "A": self.pack.large_letters,
                "a": self.pack.small_letters,
                "0": _loc.NUMBERS,
                "#": _loc.SPECIAL_CHARS,
            }.get(ch)
            if letters is None:
                parts.append("'" + ch.replace("'", "''") + "'")
                continue
            base = len(letters)
            lat.append((f"{prefix}b{j}", f"floor({base}.0 * {prefix}i{j})"))
            lat.append(
                (
                    f"{prefix}i{j+1}",
                    f"greatest({base}.0 * {prefix}i{j} - {prefix}b{j}, 0.0)",
                )
            )
            lits = ", ".join("'" + c.replace("'", "''") + "'" for c in letters)
            parts.append(f"([{lits}])[CAST({prefix}b{j} AS INTEGER) + 1]")
            j += 1
        return lat, "(" + " || ".join(parts) + ")"

    def _simple_sql_lateral(
        self, number_expr: str, prefix: str
    ) -> tuple[list[tuple[str, str]], str]:
        p = self.p
        cbp, sbp, cs = self.count_by_prefix, self.sum_by_prefix, self.charset
        ncs = len(cs)
        cs_list = "[" + ", ".join("'" + c.replace("'", "''") + "'" for c in cs) + "]"
        n_len = p.max_length - p.min_length + 1
        lat: list[tuple[str, str]] = [
            (f"{prefix}r0", f"(({number_expr})::DOUBLE)"),
            (f"{prefix}ni", f"CAST(trunc({number_expr}) AS BIGINT)"),
            (f"{prefix}a0", "TRUE"),
            (f"{prefix}L0", "-1"),
        ]
        for d in range(p.max_length + 1):
            nxt = sbp[d + 1] if d + 1 < len(sbp) else 0.0
            # remain[active] -= cbp[d]
            lat.append(
                (f"{prefix}ra{d}",
                 f"(CASE WHEN {prefix}a{d} THEN {prefix}r{d} - {dlit(cbp[d])} ELSE {prefix}r{d} END)")
            )
            stop_cond = f"({prefix}ra{d} < 0.0)" if nxt != 0.0 else "TRUE"
            lat.append((f"{prefix}s{d}", f"({prefix}a{d} AND {stop_cond})"))
            lat.append(
                (f"{prefix}L{d+1}",
                 f"(CASE WHEN {prefix}s{d} THEN {d} ELSE {prefix}L{d} END)")
            )
            lat.append((f"{prefix}a{d}_", f"({prefix}a{d} AND NOT {prefix}s{d})"))
            if d >= p.max_length:
                # loop epilogue: rows still active get plen = max_length
                lat.append(
                    (f"{prefix}len",
                     f"(CASE WHEN {prefix}a{d}_ THEN {d} ELSE {prefix}L{d+1} END)")
                )
                break
            # active rows draw char d and update remain
            lat.append(
                (f"{prefix}i{d}",
                 f"(CASE WHEN {prefix}a{d}_ THEN floor({prefix}ra{d} / {dlit(nxt)}) ELSE 0.0 END)")
            )
            lat.append(
                (f"{prefix}r{d+1}",
                 f"(CASE WHEN {prefix}a{d}_ THEN {prefix}ra{d} - {dlit(nxt)} * {prefix}i{d} ELSE {prefix}ra{d} END)")
            )
            lat.append(
                (f"{prefix}c{d}",
                 f"least(CAST({prefix}i{d} AS BIGINT), {ncs - 1})")
            )
            lat.append((f"{prefix}a{d+1}", f"{prefix}a{d}_"))
        # tail extension: short prefixes pad to min_len + num % n_len
        lat.append(
            (f"{prefix}dest",
             f"(CASE WHEN {prefix}len < {p.min_length} "
             f"THEN {p.min_length} + ({prefix}ni % {n_len}) ELSE {prefix}len END)")
        )
        parts = []
        for pos in range(p.max_length):
            ext_idx = (
                f"((({prefix}ni + ({pos} - {prefix}len) * ({pos} - {prefix}len)) % {ncs}) + {ncs}) % {ncs}"
            )
            body_char = f"({cs_list})[CAST({prefix}c{pos} AS INTEGER) + 1]" if pos < p.max_length else "''"
            parts.append(
                f"(CASE WHEN {pos} < {prefix}len THEN {body_char} "
                f"WHEN {pos} < {prefix}dest THEN ({cs_list})[({ext_idx}) + 1] "
                f"ELSE '' END)"
            )
        return lat, "(" + " || ".join(parts) + ")"

    def _text_sql_lateral(
        self, number_expr: str, prefix: str
    ) -> tuple[list[tuple[str, str]], str]:
        """DuckDB mirror of :meth:`_text_np` (reference text unranking,
        value/string.go:239-324).

        The per-row word search "find first w with k < comp[rem-wlen],
        else k -= comp[...]" is an upper-bound over the prefix sums of
        those counts; the DP identity comp[rem] = Σ_w comp[rem-wlen]
        bounds every sum below 2^63, so the cumulative tables embed as
        one nested BIGINT list literal indexed by `rem`. The loop
        unrolls to ≤ ⌈max_pre/2⌉+1 stages carrying (rem, k, text, len,
        ok); tail padding repeats a single k-chosen word.
        """
        p = self.p
        words = list(self.pack.words)
        one_letter = self.pack.one_letter_words()
        comp = self.completions
        wlens, by_len, cums = self.text_wlens, self.text_by_len, self.text_cums
        n_lens = len(wlens)
        max_pre = len(comp) - 1
        n_words = len(words)
        n_len = p.max_length - p.min_length + 1
        delim = locales.WORDS_DELIMITER

        def slit(s: str) -> str:
            return "'" + s.replace("'", "''") + "'"

        words_lit = "[" + ", ".join(slit(w) for w in words) + "]"
        onelet_lit = "[" + ", ".join(slit(w) for w in one_letter) + "]"
        # length-bucket tables (see __init__): per-pick search is over
        # ≤ ~13 length blocks, never the full word list
        wlens_lit = "[" + ",".join(str(L) for L in wlens) + "]"
        compl_lit = "[" + ",".join(str(c) for c in comp) + "]"
        bl_lit = (
            "["
            + ", ".join("[" + ", ".join(slit(w) for w in b) + "]" for b in by_len)
            + "]"
        )
        cums_lit = (
            "["
            + ", ".join("[" + ",".join(str(v) for v in row) + "]" for row in cums)
            + "]"
        )

        # bulky lookup literals live in a one-row CTE; scalar subqueries
        # of it are uncorrelated, so DuckDB evaluates them once, and the
        # SQL text stays small however many stages reference them
        vt = f"{prefix}vt"
        ctes = [
            (
                vt,
                f"SELECT {words_lit} AS w, {wlens_lit} AS wl, "
                f"{onelet_lit} AS ol, {compl_lit} AS cp, "
                f"{bl_lit} AS bl, {cums_lit} AS cm",
            )
        ]
        W = f"(SELECT w FROM {vt})"
        WL = f"(SELECT wl FROM {vt})"
        OL = f"(SELECT ol FROM {vt})"
        CP = f"(SELECT cp FROM {vt})"
        BL = f"(SELECT bl FROM {vt})"
        CM = f"(SELECT cm FROM {vt})"
        lat: list[tuple[str, str]] = [
            (f"{prefix}ni", f"CAST(trunc({number_expr}) AS BIGINT)"),
        ]
        lat.append(
            (f"{prefix}wanted", f"({p.min_length} + 1 + ({prefix}ni % {n_len}))")
        )
        lat.append(
            (
                f"{prefix}k0",
                f"CAST(floor({dlit(float(comp[max_pre] - 1))} * "
                f"(({number_expr}) / {dlit(self.total)})) AS BIGINT)",
            )
        )
        lat += [
            (f"{prefix}rem0", f"{max_pre}"),
            (f"{prefix}t0", "''"),
            (f"{prefix}tl0", "0"),
            (f"{prefix}ok0", "TRUE"),
        ]
        n_stages = max_pre // 2 + 2
        for s in range(n_stages):
            P = prefix
            act = f"({P}ok{s} AND {P}rem{s} > 0)"
            term = f"({act} AND {P}rem{s} = 1)"
            mid = f"({act} AND {P}rem{s} > 1)"
            cum = f"({CM}[{P}rem{s} + 1])"
            # j = index of the length block containing k: count of
            # prefix-sum entries <= k minus the leading 0 (zero-width
            # blocks collapse to equal entries, so the upper bound
            # skips them); the list is ≤ #distinct-lengths long
            lat.append(
                (
                    f"{P}j{s}",
                    f"(CASE WHEN {mid} THEN len(list_filter({cum}, c -> c <= {P}k{s})) - 1 ELSE {n_lens} END)",
                )
            )
            found = f"({P}j{s} < {n_lens})"
            # block geometry: word length, per-word completion count,
            # offset within block -> (word index, next k)
            lat.append(
                (
                    f"{P}wl{s}",
                    f"(CASE WHEN {mid} AND {found} THEN {WL}[CAST({P}j{s} AS INTEGER) + 1] ELSE 2 END)",
                )
            )
            lat.append(
                (
                    f"{P}c{s}",
                    f"(CASE WHEN {mid} AND {found} THEN {CP}[CAST({P}rem{s} - {P}wl{s} AS INTEGER) + 1] ELSE 1 END)",
                )
            )
            lat.append(
                (
                    f"{P}of{s}",
                    f"(CASE WHEN {mid} AND {found} THEN {P}k{s} - {cum}[CAST({P}j{s} AS INTEGER) + 1] ELSE 0 END)",
                )
            )
            lat.append(
                (
                    f"{P}ok{s+1}",
                    f"(CASE WHEN {term} THEN {P}k{s} <= {len(one_letter) - 1} "
                    f"WHEN {mid} THEN {found} ELSE {P}ok{s} END)",
                )
            )
            lat.append(
                (
                    f"{P}t{s+1}",
                    f"(CASE WHEN {term} AND {P}k{s} <= {len(one_letter) - 1} "
                    f"THEN {P}t{s} || {OL}[CAST({P}k{s} AS INTEGER) + 1] "
                    f"WHEN {mid} AND {found} "
                    f"THEN {P}t{s} || {BL}[CAST({P}j{s} AS INTEGER) + 1][CAST({P}of{s} // {P}c{s} AS INTEGER) + 1] || {slit(delim)} "
                    f"ELSE {P}t{s} END)",
                )
            )
            lat.append(
                (
                    f"{P}tl{s+1}",
                    f"(CASE WHEN {term} THEN {P}tl{s} + 1 "
                    f"WHEN {mid} AND {found} THEN {P}tl{s} + {P}wl{s} "
                    f"ELSE {P}tl{s} END)",
                )
            )
            lat.append(
                (
                    f"{P}rem{s+1}",
                    f"(CASE WHEN {term} THEN 0 "
                    f"WHEN {mid} AND {found} THEN {P}rem{s} - {P}wl{s} "
                    f"ELSE {P}rem{s} END)",
                )
            )
            lat.append(
                (
                    f"{P}k{s+1}",
                    f"(CASE WHEN {mid} AND {found} THEN {P}of{s} % {P}c{s} "
                    f"ELSE {P}k{s} END)",
                )
            )
        S = n_stages
        P = prefix
        lat.append((f"{P}okF", f"({P}ok{S} AND {P}rem{S} = 0)"))
        lat.append(
            (f"{P}pw", f"{W}[CAST({P}k{S} % {n_words - 1} AS INTEGER) + 1]")
        )
        lat.append(
            (
                f"{P}padded",
                f"(CASE WHEN {P}tl{S} < {P}wanted THEN {P}t{S} || repeat({P}pw || {slit(delim)}, "
                f"CAST(ceil(({P}wanted - {P}tl{S})::DOUBLE / (length({P}pw) + 1)) AS INTEGER)) "
                f"ELSE {P}t{S} END)",
            )
        )
        value = (
            f"(CASE WHEN NOT {P}okF THEN '' "
            f"WHEN length({P}padded) > {P}wanted THEN substring({P}padded, 1, CAST({P}wanted AS INTEGER)) "
            f"ELSE {P}padded END)"
        )
        return lat, value, ctes

    def _phone_sql(self, number_expr: str) -> str:
        pats = self.pack.phone_patterns_filtered(self.p.min_length, self.p.max_length)
        pos = _ordered_int64_sql(0, len(pats) - 1, number_expr, self.total)
        cases = []
        for k, pat in enumerate(pats):
            ndig = pat.count("#")
            max_phone = 10**ndig - 1
            pn = _ordered_int64_sql(0, max_phone, number_expr, self.total)
            digits = f"lpad(CAST({pn} AS VARCHAR), {ndig}, '0')"
            import re as _re

            parts = []
            di = 1
            for run in _re.findall(r"#+|[^#]+", pat):
                if run.startswith("#"):
                    parts.append(f"substring({digits}, {di}, {len(run)})")
                    di += len(run)
                else:
                    parts.append("'" + run.replace("'", "''") + "'")
            cases.append(f"WHEN {pos} = {k} THEN concat({', '.join(parts)})")
        return "(CASE " + " ".join(cases) + " END)"

    # -- numpy kernels ------------------------------------------------------

    def np_value(self, number: np.ndarray) -> np.ndarray:
        p = self.p
        if p.template:
            return self._template_np(number)
        if p.logical_type == "first_name":
            items = self.pack.first_names(p.min_length, p.max_length)
            return self._list_pick_np(items, number)
        if p.logical_type == "last_name":
            items = self.pack.last_names_filtered(p.min_length, p.max_length)
            return self._list_pick_np(items, number)
        if p.logical_type == "phone":
            return self._phone_np(number)
        if p.logical_type == "text":
            return self._text_np(number)
        return self._simple_np(number)

    def _list_pick_np(self, items: list[str], number: np.ndarray) -> np.ndarray:
        pos = _ordered_int64_np(0, len(items) - 1, number, self.total)
        arr = np.array(items, dtype=object)
        return arr[pos.astype(np.int64)]

    def _phone_np(self, number: np.ndarray) -> np.ndarray:
        """Pattern pick + zero-padded digit fill (reference phone,
        value/string.go:221-237)."""
        pats = self.pack.phone_patterns_filtered(self.p.min_length, self.p.max_length)
        pos = _ordered_int64_np(0, len(pats) - 1, number, self.total)
        out = np.empty(len(number), dtype=object)
        for r in range(len(number)):
            pat = pats[int(pos[r])]
            ndig = pat.count("#")
            pn = _ordered_int64_py(0, 10**ndig - 1, float(number[r]), self.total)
            digits = str(pn).zfill(ndig)
            buf = []
            di = 0
            for ch in pat:
                if ch == "#":
                    buf.append(digits[di])
                    di += 1
                else:
                    buf.append(ch)
            out[r] = "".join(buf)
        return out

    def _template_np(self, number: np.ndarray) -> np.ndarray:
        """Digit-chain fill of A/a/0/# template slots (reference
        templateString, value/string.go:174-201)."""
        pack = self.pack
        tmpl = self.p.template
        idx = number / float(self.total)
        cols: list[np.ndarray | str] = []
        for ch in tmpl:
            letters = {
                "A": pack.large_letters,
                "a": pack.small_letters,
                "0": locales.NUMBERS,
                "#": locales.SPECIAL_CHARS,
            }.get(ch)
            if letters is None:
                cols.append(ch)
                continue
            flo = len(letters) * idx
            pos = np.floor(flo)
            idx = np.maximum(flo - pos, 0.0)
            arr = np.array(list(letters), dtype="U1")
            cols.append(arr[pos.astype(np.int64)])
        n = len(number)
        L = len(tmpl)
        mat = np.empty((n, L), dtype="U1")
        for j, c in enumerate(cols):
            mat[:, j] = c  # broadcast for literal str, vector for drawn
        return np.ascontiguousarray(mat).reshape(-1).view(f"U{L}")

    def _simple_np(self, number: np.ndarray) -> np.ndarray:
        """Vectorized lexicographic unranking using the prefix tables
        (reference simpleString, value/string.go:382-410)."""
        p = self.p
        cbp = self.count_by_prefix
        sbp = self.sum_by_prefix
        cs = self.charset
        cs_arr = np.array(list(cs), dtype=object)
        n = len(number)
        remain = number.astype(np.float64).copy()
        chars = np.full((n, p.max_length), -1, dtype=np.int64)
        plen = np.zeros(n, dtype=np.int64)
        active = np.ones(n, dtype=bool)
        for depth in range(p.max_length + 1):
            if not active.any():
                break
            remain[active] -= cbp[depth]
            nxt = sbp[depth + 1] if depth + 1 < len(sbp) else 0.0
            stop = active & ((remain < 0) | (nxt == 0.0))
            plen[stop] = depth
            active &= ~stop
            if not active.any() or depth >= p.max_length:
                plen[active] = depth
                active[:] = False
                break
            i = np.floor(remain[active] / nxt)
            remain[active] -= nxt * i
            chars[active, depth] = np.minimum(i, len(cs) - 1).astype(np.int64)
        # vectorized assembly: (n, max_len) U1 matrix; unused tail stays
        # '\x00' which numpy strips on U-string view conversion.
        n_len = p.max_length - p.min_length + 1
        numi = number.astype(np.int64)
        L = max(p.max_length, 1)
        mat = np.zeros((n, L), dtype="U1")
        cs_u = np.array(list(cs), dtype="U1")
        pos_grid = np.arange(L)[None, :]
        body = pos_grid < plen[:, None]
        safe_chars = np.where(chars[:, :L] >= 0, chars[:, :L], 0)
        mat[body] = cs_u[safe_chars[body]]
        # short strings extend to dest = min_len + num % n_len with
        # cs[(num + i*i) % |cs|], i = offset past the prefix
        dest = np.where(plen < p.min_length, p.min_length + numi % n_len, plen)
        ext = body ^ (pos_grid < dest[:, None])  # plen <= pos < dest
        if ext.any():
            i_off = pos_grid - plen[:, None]
            ext_idx = (numi[:, None] + i_off * i_off) % len(cs)
            mat[ext] = cs_u[ext_idx[ext]]
        return np.ascontiguousarray(mat).reshape(-1).view(f"U{L}")

    def _text_np(self, number: np.ndarray) -> np.ndarray:
        """Combinatorial unranking of word sequences (reference text,
        value/string.go:239-324, re-enumerated by length bucket so each
        pick is O(#distinct word lengths), not O(#words))."""
        from bisect import bisect_right

        p = self.p
        words = list(self.pack.words)
        one_letter = self.pack.one_letter_words()
        comp = self.completions
        wlens, by_len, cums = self.text_wlens, self.text_by_len, self.text_cums
        n_lens = len(wlens)
        max_pre = len(comp) - 1
        n_len = p.max_length - p.min_length + 1
        out = np.empty(len(number), dtype=object)
        for r in range(len(number)):
            num = float(number[r])
            wanted = p.min_length + 1 + int(num) % n_len
            k = int(math.floor((comp[max_pre] - 1) * (num / float(self.total))))
            parts: list[str] = []
            text_len = 0
            remaining = max_pre
            ok = True
            while remaining > 0:
                if remaining == 1:
                    if k > len(one_letter) - 1:
                        ok = False
                        break
                    parts.append(one_letter[k])
                    text_len += 1
                    break
                row = cums[remaining]
                t = bisect_right(row, k) - 1
                if t >= n_lens:  # k beyond every block: no completion
                    ok = False
                    break
                L = wlens[t]
                c = comp[remaining - L]
                off = k - row[t]
                parts.append(by_len[t][off // c])
                parts.append(locales.WORDS_DELIMITER)
                k = off % c
                text_len += L
                remaining -= L
            if not ok:
                out[r] = ""
                continue
            while text_len < wanted:
                w = words[k % (len(words) - 1)]
                parts.append(w)
                parts.append(locales.WORDS_DELIMITER)
                text_len += len(w) + 1
            text = "".join(parts)
            out[r] = text[:wanted] if len(text) > wanted else text
        return out


def make_value_gen(column_type: str, params) -> IntegerGen | FloatGen | DateTimeGen | UUIDGen | EnumGen | StringGen:
    """Build the value generator for one range (enum beats type params)."""
    if params.values is not None:
        return EnumGen(params.values, column_type)
    if column_type == "integer":
        return IntegerGen(params.type_params)
    if column_type == "float":
        return FloatGen(params.type_params)
    if column_type == "string":
        return StringGen(params.type_params)
    if column_type == "datetime":
        return DateTimeGen(params.type_params)
    if column_type == "uuid":
        return UUIDGen()
    raise ValueError(f"unsupported type {column_type!r}")
