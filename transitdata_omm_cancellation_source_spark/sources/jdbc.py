"""S1/S2/S3 — the JDBC relational source.

Reference: one SQL Server connection executing a parameterized query
template chosen by mode (``OmmConnector.java:34-51,61-95``).  Two
Spark strategies, both expressed here:

- ``pushdown_query``: ship the whole statement to the database via
  ``option("query", ...)`` — the straight re-host of the reference
  (the DB's optimizer does the joins; Spark sees one relation).
  Right when the DB is the bottleneck-free system of record.
- ``table_reads``: per-table ``spark.read.jdbc`` with partitioned
  reads on the numeric key, joins done Spark-side by Catalyst — the
  100 TB path (parallel extraction, broadcast dims, AQE), and the
  shape the rest of this engine actually uses (testdata parquet
  stands in for the 11 tables; ``plans/omm_model.py`` maps them).

Parameter binding (S2) stays driver-side string substitution of
validated wall-clock literals, exactly the values the reference binds
(``OmmConnector.java:53-59,72-81``) — never raw user input.

No live SQL Server exists in this build, but the JDBC execution leg
itself runs for real: tests/test_jdbc_contract.py seeds an in-process
embedded Derby database (driver shipped in PySpark's jars) and drives
both readers through it, value-comparing against the parquet path.
The T-SQL template text stays covered by the template-selection and
binding unit tests (Derby can't parse SQL Server's dialect).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..plans.cancellation import QueryParams

_TS = re.compile(r"^\d{4}-\d{2}-\d{2}( \d{2}:\d{2}:\d{2})?$")


def _lit(value: str) -> str:
    if not _TS.match(value):
        raise ValueError(f"not a wall-clock literal: {value!r}")
    return f"'{value}'"


def cancellation_query(params: QueryParams) -> str:
    """S3 (template selection) + S2 (binding) -> one pushdown statement.

    The statement text mirrors cancellations_current_future.sql /
    cancellations_past_current_future.sql with the reference's ``?``
    placeholders bound (NOW: 2 params, PAST: 5 — OmmConnector.java:72-81).
    """
    temporal = (
        f"(DC.valid_to > {_lit(params.now)}"
        f" OR (DC.valid_to IS NULL AND AD.status = 'deleted'"
        f" AND DVJ.OperatingDayDate >= {_lit(params.today)}))"
    )
    if params.mode == "PAST":
        temporal = (
            f"({temporal}"
            f" OR ((DC.valid_to <= {_lit(params.now)}"
            f" OR (DC.valid_to IS NULL AND AD.status = 'deleted'"
            f" AND DVJ.OperatingDayDate < {_lit(params.today)}))"
            f" AND DC.last_modified >= {_lit(params.since)}))"
        )
    return f"""SELECT DC.deviation_case_id AS deviation_case_id, DC.valid_from AS VALID_FROM, DC.valid_to AS VALID_TO,
       DC.type AS DEVIATION_CASES_TYPE, DC.last_modified AS DEVIATION_CASES_LAST_MODIFIED,
       AD.last_modified AS AFFECTED_DEPARTURES_LAST_MODIFIED, AD.status AS AFFECTED_DEPARTURES_STATUS,
       AD.type AS AFFECTED_DEPARTURES_TYPE, BLM.title AS TITLE, BLM.description AS DESCRIPTION,
       B.category AS CATEGORY, B.sub_category AS SUB_CATEGORY,
       CONVERT(CHAR(16), DVJ.Id) AS DVJ_ID, KVV.StringValue AS ROUTE_NAME,
       CONVERT(INTEGER, SUBSTRING(CONVERT(CHAR(16), VJT.IsWorkedOnDirectionOfLineGid), 12, 1)) AS DIRECTION,
       CONVERT(CHAR(8), DVJ.OperatingDayDate, 112) AS OPERATING_DAY,
       RIGHT('0' + (CONVERT(VARCHAR(2), (DATEDIFF(HOUR, '1900-01-01', PlannedStartOffsetDateTime)))), 2) + ':' +
       RIGHT('0' + CONVERT(VARCHAR(2), ((DATEDIFF(MINUTE, '1900-01-01', PlannedStartOffsetDateTime)) - +
              ((DATEDIFF(HOUR, '1900-01-01', PlannedStartOffsetDateTime) * 60)))), 2) + ':00' AS START_TIME
FROM OMM_Community.dbo.deviation_cases DC
LEFT JOIN OMM_Community.dbo.affected_departures AD ON DC.deviation_case_id = AD.deviation_case_id
LEFT JOIN OMM_Community.dbo.bulletin_localized_messages BLM ON DC.bulletin_id = BLM.bulletins_id
LEFT JOIN OMM_Community.dbo.bulletins B ON DC.bulletin_id = B.bulletins_id
JOIN ptDOI4_Community.dbo.DatedVehicleJourney DVJ ON DVJ.Id = AD.departure_id
JOIN ptDOI4_Community.dbo.VehicleJourney VJ ON VJ.Id = DVJ.IsBasedOnVehicleJourneyId
JOIN ptDOI4_Community.dbo.VehicleJourneyTemplate VJT ON VJT.Id = DVJ.IsBasedOnVehicleJourneyTemplateId
JOIN ptDOI4_Community.T.KeyVariantValue KVV ON KVV.IsForObjectId = VJ.Id
JOIN ptDOI4_Community.dbo.KeyVariantType KVT ON KVT.Id = KVV.IsOfKeyVariantTypeId
JOIN ptDOI4_Community.dbo.KeyType KT ON KT.Id = KVT.IsForKeyTypeId
JOIN ptDOI4_Community.dbo.ObjectType OT ON OT.Number = KT.ExtendsObjectTypeNumber
WHERE BLM.language_code = 'fi'
  AND {temporal}
  AND KT.Name IN ('JoreIdentity', 'JoreRouteIdentity', 'RouteName')
  AND OT.Name = 'VehicleJourney'
  AND VJT.IsWorkedOnDirectionOfLineGid IS NOT NULL
  AND DVJ.IsReplacedById IS NULL
ORDER BY DC.last_modified"""


def pushdown_query(
    spark: SparkSession,
    url: str,
    params: QueryParams | None = None,
    statement: str | None = None,
    **options: str,
) -> DataFrame:
    """Whole-statement pushdown — the reference's execution model.

    Defaults to the bound cancellation template; ``statement`` lets a
    caller push any other SQL text through the identical reader path
    (the in-process Derby contract test uses this, since the T-SQL
    template targets SQL Server's dialect).
    """
    if statement is None:
        if params is None:
            raise ValueError("either params or statement is required")
        statement = cancellation_query(params)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", statement)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def table_read(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int = 0,
    upper_bound: int = 1 << 40,
    **options: str,
) -> DataFrame:
    """Partitioned per-table extraction; joins then belong to Catalyst."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
