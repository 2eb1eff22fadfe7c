from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from json_schema_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="jss-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def webpages(spark):
    """Deterministic 5k-row synthetic webpage table (FIXTURES.md §1)."""
    from json_schema_spark.sources.tables import synth_webpages

    df = synth_webpages(spark, 5000, seed=42, partitions=8)
    df.persist()
    df.count()
    yield df
    df.unpersist()
