from __future__ import annotations

import pytest

from markt_database_analyzer_spark.session import get_spark
from markt_database_analyzer_spark.sources.fixtures import fixture_frames


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="mda-tests", extra_conf={"spark.ui.enabled": "false"})
    yield spark


@pytest.fixture(scope="session")
def fixtures(spark):
    mon, prof = fixture_frames(spark)
    mon = mon.cache()
    prof = prof.cache()
    mon.count(), prof.count()
    return mon, prof


SF_DIR = "/root/testdata/sf0.001"
