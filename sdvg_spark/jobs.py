"""Generate-job orchestration: conflicts, force-clean, resume, progress.

The reference lifecycle (SURVEY.md §3 EP1, cli/commands/generate/
generate.go:37-174): parse/validate -> output setup (conflict check) ->
backup save or resume -> per-model generation -> teardown. Here each
model is one Spark write action; resume restarts at the exact row count
already on disk (pure index->value generation makes the skip O(1)).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession

from sdvg_spark.backup import (
    ConflictError,
    check_output_conflicts,
    clean_outputs,
    config_diff,
    config_fingerprint,
    load_backup,
    rows_on_disk,
    save_backup,
)
from sdvg_spark.config.model import GenerationConfig, parse_config
from sdvg_spark.engine import Engine

ProgressFn = Callable[[str, float], None]


def run_generate(
    raw: dict[str, Any],
    *,
    spark: SparkSession | None = None,
    force: bool = False,
    continue_generation: bool = False,
    on_progress: ProgressFn | None = None,
) -> dict[str, str]:
    """Full generate lifecycle for a raw config dict; returns model->path.

    ``force`` cleans colliding outputs; ``continue_generation`` resumes
    an interrupted run — the config must be identical to the backed-up
    one (a recursive diff is reported otherwise), and each model
    restarts at the rows already present in its sink directory.
    """
    cfg: GenerationConfig = parse_config(raw)
    out = cfg.output
    file_sink = out.type in ("csv", "parquet")
    active = [m for name, m in cfg.models.items() if name not in cfg.models_to_ignore]
    resume_rows: dict[str, int] = {}

    if file_sink:
        conflicts = check_output_conflicts(out.dir, [m.model_dir for m in active])
        if continue_generation:
            bk = load_backup(out.dir)
            if bk is not None:
                if bk.get("fingerprint") != config_fingerprint(raw):
                    diff = "\n".join(config_diff(bk.get("config", {}), raw))
                    raise ConflictError(
                        "config differs from the backed-up run; cannot resume:\n" + diff
                    )
                for m in active:
                    resume_rows[m.name] = rows_on_disk(
                        os.path.join(out.dir, m.model_dir), out.type
                    )
        elif conflicts:
            if not force:
                raise ConflictError(
                    "output dir contains previous results (use force or "
                    "continue_generation): " + ", ".join(conflicts)
                )
            clean_outputs(out.dir, [m.model_dir for m in active])
        save_backup(out.dir, raw)

    if spark is None:
        from sdvg_spark.session import get_spark

        spark = get_spark()

    from sdvg_spark.sinks.writers import write_model

    eng = Engine(cfg)
    written: dict[str, str] = {}
    for m in active:
        total = m.generate_to - m.generate_from
        done = min(resume_rows.get(m.name, 0), total)
        if on_progress:
            on_progress(m.name, done / total if total else 1.0)
        if done >= total:
            written[m.name] = os.path.join(out.dir, m.model_dir)
            continue
        df = eng.model_df(spark, m.name, generate_from=m.generate_from + done)
        mode = "append" if done > 0 else "overwrite"
        written[m.name] = write_model(spark, df, m, out, mode=mode)
        if on_progress:
            on_progress(m.name, 1.0)
    return written
