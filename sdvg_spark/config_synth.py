"""Config synthesis: SQL DDL / data sample / natural-language description
-> generation config.

Reference surface (SURVEY.md §2.5 EP3; cli/commands/config/common.go:
32-81,205-257): the reference routes ALL three modes through an LLM with
the real config validator in the retry loop. Here the two structured
modes are deterministic parsers (strictly better: no API, reproducible);
the description mode keeps the reference's load-bearing design — a
provider-agnostic chat call whose output must pass ``parse_config``,
with validation errors fed back for up to 3 attempts.
"""

from __future__ import annotations

import csv
import io
import json
import os
import re
import urllib.request
from collections.abc import Callable
from typing import Any

from sdvg_spark.config.model import ConfigError, parse_config

DEFAULT_ROWS = 10_000

# ---------------------------------------------------------------------------
# SQL DDL -> config

_INT_TYPES = {
    "tinyint": 8,
    "smallint": 16,
    "int": 32,
    "integer": 32,
    "mediumint": 32,
    "bigint": 64,
    "serial": 64,
    "bigserial": 64,
}
_FLOAT_TYPES = {"real": 32, "float": 32, "double": 64, "decimal": 64, "numeric": 64}


def _strip_comments(sql: str) -> str:
    sql = re.sub(r"--[^\n]*", "", sql)
    return re.sub(r"/\*.*?\*/", "", sql, flags=re.S)


def _split_columns(body: str) -> list[str]:
    """Split a CREATE TABLE body on top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _column_from_sql(name: str, sqltype: str, extras: str) -> dict[str, Any]:
    t = sqltype.lower()
    m = re.match(r"(\w+)(?:\s*\(\s*(\d+)(?:\s*,\s*(\d+))?\s*\))?", t)
    base = m.group(1) if m else t
    arg = int(m.group(2)) if m and m.group(2) else None
    col: dict[str, Any] = {"name": name}
    if base in _INT_TYPES:
        col["type"] = "integer"
        col["type_params"] = {"bit_width": _INT_TYPES[base]}
    elif base in _FLOAT_TYPES:
        col["type"] = "float"
        col["type_params"] = {"bit_width": _FLOAT_TYPES[base]}
    elif base in ("timestamp", "timestamptz", "datetime", "date", "time"):
        col["type"] = "datetime"
    elif base == "uuid":
        col["type"] = "uuid"
    elif base in ("varchar", "char", "character", "text", "string", "nvarchar"):
        col["type"] = "string"
        if arg:
            col["type_params"] = {"min_length": 1, "max_length": arg}
    elif base in ("bool", "boolean"):
        # no boolean physical type (reference parity); 0/1 integer
        col["type"] = "integer"
        col["type_params"] = {"bit_width": 8, "from": 0, "to": 1}
    else:
        col["type"] = "string"
    ex = extras.lower()
    if "primary key" in ex or "unique" in ex:
        col["distinct_percentage"] = 1.0
        if col["type"] == "integer":
            col.setdefault("type_params", {})
            col["type_params"].setdefault("from", 1)
            col["type_params"].setdefault("to", DEFAULT_ROWS)
            col["ordered"] = True
    ref = re.search(r"references\s+(\w+)\s*\(\s*(\w+)\s*\)", ex)
    if ref:
        return {"name": name, "foreign_key": f"{ref.group(1)}.{ref.group(2)}"}
    return col


def ddl_to_config(sql: str, rows_count: int = DEFAULT_ROWS) -> dict[str, Any]:
    """Deterministic ``CREATE TABLE`` DDL -> generation config.

    Maps SQL types onto the five physical types, PRIMARY KEY/UNIQUE ->
    distinct 100% (integer PKs become ordered 1..N), inline and
    table-level ``REFERENCES`` -> ``foreign_key``. The reference does
    this via LLM few-shots (prompt.yml:296-354); a parser is
    reproducible and needs no API.
    """
    sql = _strip_comments(sql)
    models: dict[str, Any] = {}
    for tm in re.finditer(
        r"create\s+table\s+(?:if\s+not\s+exists\s+)?[\"`']?(\w+)[\"`']?\s*\((.*?)\)\s*(?:;|$)",
        sql,
        flags=re.I | re.S,
    ):
        tname, body = tm.group(1), tm.group(2)
        columns: list[dict[str, Any]] = []
        fk_constraints: dict[str, str] = {}
        pk_cols: list[str] = []
        for part in _split_columns(body):
            low = part.lower()
            if low.startswith(("primary key", "constraint", "foreign key", "unique (", "unique(", "index ", "key ")):
                fk = re.search(
                    r"foreign\s+key\s*\(\s*(\w+)\s*\)\s*references\s+(\w+)\s*\(\s*(\w+)\s*\)",
                    low,
                )
                if fk:
                    fk_constraints[fk.group(1)] = f"{fk.group(2)}.{fk.group(3)}"
                pk = re.match(r"primary\s+key\s*\(\s*([\w\s,]+)\)", low)
                if pk:
                    pk_cols.extend(c.strip() for c in pk.group(1).split(","))
                continue
            cm = re.match(r"[\"`']?(\w+)[\"`']?\s+(\S+)(.*)", part, flags=re.S)
            if not cm:
                continue
            columns.append(_column_from_sql(cm.group(1), cm.group(2), cm.group(3)))
        # rebuild column list applying table-level constraints
        rebuilt = []
        for part_col in columns:
            name = part_col.get("name")
            if name in fk_constraints:
                rebuilt.append({"name": name, "foreign_key": fk_constraints[name]})
            elif name in pk_cols and "foreign_key" not in part_col:
                part_col["distinct_percentage"] = 1.0
                if part_col.get("type") == "integer":
                    part_col.setdefault("type_params", {})
                    part_col["type_params"].setdefault("from", 1)
                    part_col["type_params"].setdefault("to", rows_count)
                    part_col["ordered"] = True
                rebuilt.append(part_col)
            else:
                rebuilt.append(part_col)
        models[tname] = {"rows_count": rows_count, "columns": rebuilt}
    if not models:
        raise ConfigError("no CREATE TABLE statements found")
    raw = {"random_seed": 0, "models": models}
    parse_config(raw)  # validator in the loop, same as every mode
    return raw


# ---------------------------------------------------------------------------
# CSV sample -> config

_UUID_RE = re.compile(
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)
_DT_RE = re.compile(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2})?)?")


def _infer_column(name: str, values: list[str]) -> dict[str, Any]:
    vals = [v for v in values if v not in ("", "null", "NULL", "None")]
    null_pct = 1.0 - (len(vals) / len(values)) if values else 0.0
    col: dict[str, Any] = {"name": name}
    if null_pct > 0:
        col["null_percentage"] = round(null_pct, 4)
    if not vals:
        col.update({"type": "string"})
        return col
    if all(_UUID_RE.match(v) for v in vals):
        col["type"] = "uuid"
        return col
    try:
        ints = [int(v) for v in vals]
        lo, hi = min(ints), max(ints)
        width = 64 if (hi > 2**31 - 1 or lo < -(2**31)) else 32
        col["type"] = "integer"
        col["type_params"] = {"bit_width": width, "from": lo, "to": hi}
        if len(set(ints)) == len(ints):
            col["distinct_percentage"] = 1.0
        if ints == sorted(ints):
            col["ordered"] = True
        return col
    except ValueError:
        pass
    try:
        floats = [float(v) for v in vals]
        col["type"] = "float"
        col["type_params"] = {
            "bit_width": 64,
            "from": min(floats),
            "to": max(floats),
        }
        return col
    except ValueError:
        pass
    if all(_DT_RE.match(v) for v in vals):
        col["type"] = "datetime"
        return col
    distinct = sorted(set(vals))
    if len(distinct) <= max(10, len(vals) // 4):
        col["type"] = "string"
        col["values"] = distinct
        return col
    col["type"] = "string"
    col["type_params"] = {
        "min_length": min(len(v) for v in vals),
        "max_length": max(len(v) for v in vals),
    }
    return col


def sample_to_config(
    text: str, model_name: str = "sample", rows_count: int = DEFAULT_ROWS
) -> dict[str, Any]:
    """CSV sample -> config by per-column type/shape inference."""
    reader = csv.reader(io.StringIO(text.strip()))
    rows = [r for r in reader if r]
    if len(rows) < 2:
        raise ConfigError("need a header row and at least one data row")
    header, data = rows[0], rows[1:]
    cols = []
    for i, name in enumerate(header):
        cols.append(_infer_column(name.strip(), [r[i] if i < len(r) else "" for r in data]))
    raw = {
        "random_seed": 0,
        "models": {model_name: {"rows_count": rows_count, "columns": cols}},
    }
    parse_config(raw)
    return raw


# ---------------------------------------------------------------------------
# description -> config (LLM, validator in the loop)

_SYSTEM_PROMPT = """You generate JSON configs for a synthetic data generator.
Output ONLY a JSON object, no prose. Schema:
{"random_seed": int, "models": {<name>: {"rows_count": int, "columns": [
  {"name": str, "type": "integer|float|string|datetime|uuid",
   "type_params": {..}, "ordered"?: bool, "null_percentage"?: float,
   "distinct_percentage"?: float, "values"?: [..],
   "foreign_key"?: "model.column"}]}}}
type_params by type: integer {bit_width:8|16|32|64, from, to};
float {bit_width:32|64, from, to}; string {min_length, max_length,
locale:"en"|"ru", logical_type?:"first_name"|"last_name"|"phone"|"text",
template?: str}; datetime {from, to} (RFC3339). A foreign_key column has
NO other fields. Every model needs rows_count >= 1."""


def _default_chat(messages: list[dict[str, str]]) -> str:
    """Minimal OpenAI-compatible chat call (any provider implementing the
    /chat/completions wire format; endpoint+key from env)."""
    base = os.environ.get("SDVG_LLM_BASE_URL", "")
    if not base:
        raise ConfigError(
            "description mode needs an LLM endpoint: set SDVG_LLM_BASE_URL "
            "(OpenAI-compatible), SDVG_LLM_API_KEY, SDVG_LLM_MODEL"
        )
    body = json.dumps(
        {
            "model": os.environ.get("SDVG_LLM_MODEL", "gpt-4o-mini"),
            "messages": messages,
            "temperature": 0,
        }
    ).encode()
    req = urllib.request.Request(
        base.rstrip("/") + "/chat/completions",
        data=body,
        headers={
            "Content-Type": "application/json",
            "Authorization": f"Bearer {os.environ.get('SDVG_LLM_API_KEY', '')}",
        },
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        payload = json.loads(resp.read())
    return payload["choices"][0]["message"]["content"]


def describe_to_config(
    description: str,
    chat: Callable[[list[dict[str, str]]], str] | None = None,
    max_attempts: int = 3,
) -> dict[str, Any]:
    """NL description -> config via chat LLM; each attempt is parsed by
    the real validator and errors are fed back (the validator-in-the-
    loop retry is the load-bearing design, reference common.go:205-257).
    """
    chat = chat or _default_chat
    messages = [
        {"role": "system", "content": _SYSTEM_PROMPT},
        {"role": "user", "content": description},
    ]
    last_err: Exception | None = None
    for _ in range(max_attempts):
        reply = chat(messages)
        m = re.search(r"\{.*\}", reply, flags=re.S)
        try:
            if not m:
                raise ConfigError("no JSON object in reply")
            raw = json.loads(m.group(0))
            parse_config(raw)
            return raw
        except (ConfigError, ValueError) as e:
            last_err = e
            messages.append({"role": "assistant", "content": reply})
            messages.append(
                {
                    "role": "user",
                    "content": f"That config failed validation: {e}. "
                    "Reply with ONLY the corrected JSON.",
                }
            )
    raise ConfigError(f"config generation failed after {max_attempts} attempts: {last_err}")
