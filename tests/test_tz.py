"""P11/P12 timezone tests — ports of OmmConnectorTest.java:11-17 plus
epoch-ms round-trips through the Spark expression path.
"""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

from pyspark.sql import Row
from pyspark.sql import functions as F

from transitdata_omm_cancellation_source_spark.functions.scalars import (
    local_str_to_utc_epoch_ms,
    now_strings,
)


def test_local_datetime_string_helsinki():
    # OmmConnectorTest: epoch 1541415600 rendered in Helsinki
    instant = dt.datetime.fromtimestamp(1541415600, tz=dt.timezone.utc)
    assert now_strings(instant, "Europe/Helsinki")[0] == "2018-11-05 13:00:00"


def test_local_datetime_string_utc():
    # same wall-clock via UTC two hours later
    instant = dt.datetime.fromtimestamp(1541422800, tz=dt.timezone.utc)
    assert now_strings(instant, "UTC")[0] == "2018-11-05 13:00:00"


def test_year_start_utc():
    instant = dt.datetime.fromtimestamp(1514764800, tz=dt.timezone.utc)
    assert now_strings(instant, "UTC") == ("2018-01-01 00:00:00", "2018-01-01")


def test_year_boundary_helsinki():
    instant = dt.datetime.fromtimestamp(1514843999, tz=dt.timezone.utc)
    assert now_strings(instant, "Europe/Helsinki")[0] == "2018-01-01 23:59:59"


def test_local_str_to_utc_epoch_ms(spark):
    # toUtcEpochMs (OmmCancellationHandler.java:79-97): Helsinki
    # wall-clock "2024-01-01 12:00:00" == 1704103200000 UTC epoch ms;
    # winter = UTC+2.  Also check a DST (summer, UTC+3) instant.
    df = spark.createDataFrame(
        [
            Row(ts="2024-01-01 12:00:00"),
            Row(ts="2024-07-01 12:00:00"),
        ]
    )
    out = df.select(
        local_str_to_utc_epoch_ms(F.col("ts").cast("timestamp_ntz")).alias("ms")
    ).collect()
    expected = [
        int(
            dt.datetime(2024, 1, 1, 12, tzinfo=ZoneInfo("Europe/Helsinki"))
            .timestamp()
            * 1000
        ),
        int(
            dt.datetime(2024, 7, 1, 12, tzinfo=ZoneInfo("Europe/Helsinki"))
            .timestamp()
            * 1000
        ),
    ]
    assert [r.ms for r in out] == expected
