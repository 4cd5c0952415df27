"""Sinks: devnull / CSV / Parquet / HTTP / TCS, with Hive partitioning.

Spark-native mappings of the reference writers (SURVEY.md §2.4):
rotation (``rows_per_file``) -> ``maxRecordsPerFile``; Hive partition
routing -> ``partitionBy``; CSV float precision and datetime formats ->
pre-write formatting expressions; HTTP/TCS micro-batched POST ->
``foreachPartition`` with exponential backoff.

Known, documented layout deviations from the reference (SURVEY.md §7):
Spark writes ``part-*`` file names (not ``{model}_{n}``), and null
partition values land in ``__HIVE_DEFAULT_PARTITION__`` (not
``col=null``). Contents and directory keys are otherwise equivalent.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request
from typing import Iterable

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sdvg_spark.config.model import ModelSpec, OutputConfig

_RFC3339 = "yyyy-MM-dd'T'HH:mm:ssXXX"

from sdvg_spark.sinks.template import DEFAULT_BODY_TEMPLATE


def _csv_formatted(df: DataFrame, out: OutputConfig) -> DataFrame:
    """Render float/datetime columns to strings the way the reference CSV
    writer does (fixed float precision; RFC3339 or unix datetimes)."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            c = F.when(
                c.isNotNull(), F.format_string(f"%.{out.float_precision}f", c)
            ).alias(f.name)
        elif isinstance(f.dataType, T.TimestampType):
            if out.datetime_format == "unix":
                c = c.cast("long").alias(f.name)
            elif out.datetime_format:
                c = F.date_format(c, out.datetime_format).alias(f.name)
            else:
                c = F.date_format(c, _RFC3339).alias(f.name)
        else:
            c = c.alias(f.name)
        cols.append(c)
    return df.select(*cols)


def _partition_cols(model: ModelSpec) -> list[str]:
    return [pc.name for pc in model.partition_columns]


def write_model(
    spark: SparkSession,
    df: DataFrame,
    model: ModelSpec,
    out: OutputConfig,
    mode: str = "overwrite",
) -> str:
    """Write one model's DataFrame to the configured sink; returns path.

    ``mode="append"`` is the resume path (jobs.run_generate): the
    DataFrame then covers only the missing row range."""
    path = os.path.join(out.dir, model.model_dir)
    parts = _partition_cols(model)

    if out.type == "devnull":
        df.write.format("noop").mode("overwrite").save()
        return "noop://"

    if out.type == "csv":
        w = (
            _csv_formatted(df, out)
            .write.mode(mode)
            .option("header", not out.without_headers)
            .option("sep", out.delimiter)
            .option("emptyValue", "")
            .option("maxRecordsPerFile", model.rows_per_file or 0)
        )
        if parts:
            w = w.partitionBy(*parts)
        w.csv(path)
        return path

    if out.type == "parquet":
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType",
            "TIMESTAMP_MILLIS" if out.timestamp_unit == "millis" else "TIMESTAMP_MICROS",
        )
        w = (
            df.write.mode(mode)
            .option("compression", out.compression)
            .option("maxRecordsPerFile", model.rows_per_file or 0)
        )
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(path)
        return path

    if out.type in ("http", "tcs"):
        _write_http(df, model, out)
        return out.endpoint

    raise ValueError(f"unknown output type {out.type!r}")


def _write_http(df: DataFrame, model: ModelSpec, out: OutputConfig) -> None:
    """Micro-batched POST from each partition with exponential backoff
    (reference writer/http/http.go:81-127). Runs on executors; each
    partition posts independently — at 1000 executors this is 1000
    concurrent senders without driver involvement."""
    endpoint = out.endpoint
    headers = dict(out.headers)
    if out.type == "tcs":
        headers.setdefault("x-tcs-timeout_ms", str(int(out.timeout_seconds * 1000)))
    headers.setdefault("Content-Type", "application/json")
    batch_size = max(out.batch_size, 1)
    timeout = out.timeout_seconds
    model_name = model.name
    col_names = [f.name for f in df.schema.fields]
    body_template = out.body_template or DEFAULT_BODY_TEMPLATE

    def post_partition(rows: Iterable[Row]) -> None:
        # re-import on the executor: unpickling the closure restores the
        # `urllib` package but not the `urllib.request` submodule
        import urllib.request

        from sdvg_spark.sinks.template import render

        def send(batch: list[dict]) -> None:
            body = render(
                body_template, {"ModelName": model_name, "Rows": batch}
            ).encode("utf-8")
            delay = 1.0
            deadline = time.monotonic() + timeout
            while True:
                req = urllib.request.Request(
                    endpoint, data=body, headers=headers, method="POST"
                )
                try:
                    with urllib.request.urlopen(req, timeout=timeout) as resp:
                        if 200 <= resp.status < 300:
                            return
                        raise OSError(f"http status {resp.status}")
                except Exception:
                    if time.monotonic() + delay > deadline:
                        raise
                    time.sleep(delay)
                    delay = min(delay * 2, 600.0)

        batch: list[dict] = []
        for row in rows:
            batch.append({k: row[k] for k in col_names})
            if len(batch) >= batch_size:
                send(batch)
                batch = []
        if batch:
            send(batch)

    df.foreachPartition(post_partition)
