"""Scalar / vector / text expression builders (SURVEY.md §2.2).

Everything here returns Spark ``Column`` expressions built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd; no Python
UDFs on the reference surface (SURVEY §4: zero custom rules needed).
"""

from .scalars import (  # noqa: F401
    direction_from_gid,
    local_str_to_utc_epoch_ms,
    now_strings,
    operating_day,
    start_time_over24h,
    status_from_ad,
)
