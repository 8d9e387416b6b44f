"""Shared fixtures: one session-scoped local SparkSession (Spark
startup is ~15 s — never per-test)."""

import pytest


@pytest.fixture(scope="session")
def spark():
    from serd_spark.session import get_spark

    s = get_spark(app_name="serd_spark-tests", master="local[4]")
    yield s
    s.stop()
