"""Shared fixtures. One session-scoped SparkSession (local[4]) keeps the
suite's JVM boot cost to ~15 s total."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from sdvg_spark.session import get_spark

    s = get_spark(app_name="sdvg-tests", master="local[4]")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s
    s.stop()
