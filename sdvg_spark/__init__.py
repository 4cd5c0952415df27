"""sdvg-spark: a PySpark-native deterministic synthetic-data engine.

Re-expresses the capabilities of the reference generator (tarantool/sdvg,
studied at /root/reference) Spark-first: every configured table ("model")
is `spark.range(N)` plus deterministic column expressions — each cell a
pure function of (seed, column, row-index) — so generation is
embarrassingly parallel, shuffle-free, and idempotent under any partition
layout. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

from sdvg_spark.session import get_spark, configure_session  # noqa: F401
