"""Parquet writer honoring per-column encodings via pyarrow.

Spark's parquet writer exposes only global options (dictionary on/off,
compression); the reference supports per-column encodings
(models/generator_model.go:758-767, applied writer/parquet/
parquet.go:178-189). This path keeps the write distributed — every
Spark partition writes its own files through ``pyarrow.parquet``
(``mapInArrow``, so rows stream executor-side as Arrow batches and
never surface as Python objects) — while giving pyarrow the per-column
``column_encoding`` / ``use_dictionary`` knobs.

File naming is reference-style directly (``{model}_{n}.parquet``; with
Hive partitioning, ``col=value`` / ``col=null`` subdirs), numbering
files within each Spark partition by ``partition_id * files_per_task +
seq`` so concurrent tasks never collide. At 1000 executors this is
1000 independent pyarrow writers with no driver involvement.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame

from sdvg_spark.config.model import ModelSpec, OutputConfig

# reference encoding name -> (pyarrow column_encoding, dictionary?)
_ENCODING_MAP = {
    "PLAIN": ("PLAIN", False),
    "PLAIN_DICT": (None, True),
    "RLE_DICTIONARY": (None, True),
    "RLE": ("RLE", False),
    "DELTA_BINARY_PACKED": ("DELTA_BINARY_PACKED", False),
    "DELTA_BYTE_ARRAY": ("DELTA_BYTE_ARRAY", False),
    "DELTA_LENGTH_BYTE_ARRAY": ("DELTA_LENGTH_BYTE_ARRAY", False),
    "BYTE_STREAM_SPLIT": ("BYTE_STREAM_SPLIT", False),
}

# reference codec names (models/generator_output.go) -> pyarrow
_CODEC_MAP = {
    "uncompressed": "none",
    "none": "none",
    "snappy": "snappy",
    "gzip": "gzip",
    "lz4": "lz4",
    "lz4raw": "lz4",
    "lz4_raw": "lz4",
    "zstd": "zstd",
    "brotli": "brotli",
}


def write_parquet_encoded(
    df: DataFrame,
    model: ModelSpec,
    out: OutputConfig,
    path: str,
    mode: str = "overwrite",
) -> None:
    column_encoding: dict[str, str] = {}
    use_dictionary: list[str] = []
    for c in model.columns:
        if c.parquet is None:
            continue
        enc, dict_ = _ENCODING_MAP[c.parquet.encoding]
        if dict_:
            use_dictionary.append(c.name)
        elif enc != "PLAIN":
            column_encoding[c.name] = enc

    codec = _CODEC_MAP.get(out.compression.lower(), out.compression.lower())
    coerce = "ms" if out.timestamp_unit == "millis" else "us"
    rows_per_file = model.rows_per_file or (1 << 62)
    part_cols = [pc.name for pc in model.partition_columns]
    hidden = [pc.name for pc in model.partition_columns if not pc.write_to_output]
    model_name = model.name
    # worst-case files a task can emit: its row share / rows_per_file,
    # +1 per partition-dir remainder; a generous fixed stride keeps
    # numbering collision-free without cross-task coordination
    files_per_task = 1 << 20

    if "://" in path:
        # executor-side pq.write_table + os.makedirs target the local
        # filesystem; shipping this to object stores needs an fsspec
        # filesystem handle per task (not wired yet). Fail loudly
        # instead of scattering local junk dirs across executors.
        raise NotImplementedError(
            "per-column parquet encodings currently support local paths "
            "only; use the default Spark parquet writer (global encoding "
            "options) for object-store outputs"
        )
    if mode == "overwrite" and os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    # append/resume: existing {model}_{n} files survive; new files must
    # number past them BOTH at write time (no silent overwrite) and in
    # the compaction pass
    base = 0
    if mode == "append":
        import re as _re

        pat = _re.compile(rf"^{_re.escape(model.name)}_(\d+)\.parquet$")
        for _root, _dirs, files in os.walk(path):
            for f in files:
                mt = pat.match(f)
                if mt:
                    base = max(base, int(mt.group(1)) + 1)

    def write_task(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        # per partition-dir accumulation: dir -> list[RecordBatch]
        pending: dict[str, list] = {}
        counts: dict[str, int] = {}

        def dir_of(keys) -> str:
            segs = []
            for name, v in zip(part_cols, keys):
                segs.append(f"{name}={'null' if v is None else v}")
            return os.path.join(path, *segs)

        def flush(d: str) -> None:
            nonlocal seq
            tbl = pa.Table.from_batches(pending[d])
            if hidden:
                tbl = tbl.drop_columns(hidden)
            os.makedirs(d, exist_ok=True)
            off = 0
            while off < tbl.num_rows:
                chunk = tbl.slice(off, rows_per_file)
                n = base + pid * files_per_task + seq
                pq.write_table(
                    chunk,
                    os.path.join(d, f"{model_name}_{n}.parquet"),
                    compression=codec,
                    use_dictionary=use_dictionary or False,
                    column_encoding=column_encoding or None,
                    coerce_timestamps=coerce,
                    allow_truncated_timestamps=True,
                )
                seq += 1
                off += rows_per_file
            pending[d] = []
            counts[d] = 0

        for batch in batches:
            if part_cols:
                tbl = pa.Table.from_batches([batch])
                # group rows of this batch by their partition key tuple
                keys_tbl = tbl.select(part_cols)
                df_keys = keys_tbl.to_pandas()
                groups = df_keys.groupby(part_cols, dropna=False, sort=False)
                for key, idx in groups.indices.items():
                    if not isinstance(key, tuple):
                        key = (key,)
                    key = [None if (isinstance(k, float) and math.isnan(k)) else k for k in key]
                    sub = tbl.take(pa.array(idx)).combine_chunks()
                    d = dir_of(key)
                    for b in sub.to_batches():
                        pending.setdefault(d, []).append(b)
                        counts[d] = counts.get(d, 0) + b.num_rows
                    if counts.get(d, 0) >= rows_per_file:
                        flush(d)
            else:
                d = path
                pending.setdefault(d, []).append(batch)
                counts[d] = counts.get(d, 0) + batch.num_rows
                if counts[d] >= rows_per_file:
                    flush(d)
        for d, b in list(pending.items()):
            if b:
                flush(d)
        yield pa.RecordBatch.from_pydict({"files": pa.array([seq], type=pa.int64())})

    df.mapInArrow(write_task, "files long").write.format("noop").mode(
        "overwrite"
    ).save()
    _renumber(path, model_name, base)


def _renumber(path: str, model_name: str, base: int = 0) -> None:
    """Compact sparse file numbers to the smallest free indices per dir.

    Files below ``base`` are previous-run output already compact; new
    sparse numbers (≥ base) fill the gaps after them."""
    if not os.path.isdir(path):
        return
    import re

    pat = re.compile(rf"^{re.escape(model_name)}_(\d+)\.parquet$")
    for root, _dirs, files in os.walk(path):
        matched = sorted(
            (int(m.group(1)), f) for f in files if (m := pat.match(f))
        )
        taken = {n for n, _f in matched if n < base}
        k = 0
        for n, f in matched:
            if n < base:
                continue
            while k in taken:
                k += 1
            if n != k:
                os.rename(
                    os.path.join(root, f),
                    os.path.join(root, f"{model_name}_{k}.parquet"),
                )
            taken.add(k)
