from __future__ import annotations

import pytest

from transitdata_omm_cancellation_source_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.001"  # pytest uses the small sf; the
# driver harness re-checks at sf0.01 with the identical oracle SQL.


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()
