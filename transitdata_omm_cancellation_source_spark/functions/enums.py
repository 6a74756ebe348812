"""Enum universes for trip-cancellation messages (SURVEY.md §2.2 P10).

The reference validates strings by ``Enum.valueOf`` against the
``InternalMessages.TripCancellation`` protobuf enums from the public
``HSLdevcom/transitdata-common`` library
(``OmmCancellationHandler.java:57-71``); an invalid string raises
``IllegalArgumentException`` and the *row* is dropped while the batch
continues (S5, ``OmmCancellationHandler.java:161-163``).

Here the universes are engine constants and validation is a Catalyst
``isin`` filter — vectorized, pushdown-friendly, no exceptions in the
row path.  Sets cover every value observed in the reference's data
plus the standard GTFS-RT-flavored universe; anything else is
malformed by definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STATUS = ["RUNNING", "CANCELED"]

#: OmmCancellationHandler.java:27-29 — lowercase on purpose (the Java
#: side lowercases before valueOf, OmmCancellationHandler.java:128).
AFFECTED_DEPARTURES_STATUS = ["active", "deleted"]

DEVIATION_CASES_TYPE = [
    "CANCEL_DEPARTURE",
    "DETOUR",
    "SKIPPED_STOP_CALLS",
    "EARLY_DEPARTURE",
    "EARLIER_DEPARTURE",
    "LATE_DEPARTURE",
    "OTHER",
]

AFFECTED_DEPARTURES_TYPE = [
    "CANCEL_ENTIRE_DEPARTURE",
    "CANCEL_STOPS_FROM_START",
    "CANCEL_STOPS_FROM_MIDDLE",
    "CANCEL_STOPS_FROM_END",
]

CATEGORY = [
    "VEHICLE_BREAKDOWN",
    "ACCIDENT",
    "NO_DRIVER",
    "ASSAULT",
    "WEATHER",
    "VEHICLE_OFF_THE_ROAD",
    "SEIZURE",
    "ITS_SYSTEM_ERROR",
    "OTHER_DRIVER_ERROR",
    "TOO_MANY_PASSENGERS",
    "STRIKE",
    "OTHER",
    "EARLIER_DISRUPTION",
    "NO_TRAFFIC_DISRUPTION",
    "TRACK_BLOCKED",
    "STAFF_DEFICIT",
    "DISTURBANCE",
    "VEHICLE_DEFICIT",
    "ROAD_CLOSED",
    "ROAD_TRENCH",
    "TRACK_MAINTENANCE",
    "TRAFFIC_ACCIDENT",
    "TRAFFIC_JAM",
    "MEDICAL_INCIDENT",
    "WEATHER_CONDITIONS",
    "TECHNICAL_FAILURE",
    "TEST",
    "ROAD_MAINTENANCE",
    "ROAD_OBSTACLE",
    "MISPARKED_VEHICLE",
    "PUBLIC_EVENT",
]

SUB_CATEGORY = [
    "BREAK_MALFUNCTION",
    "OUT_OF_FUEL",
    "FLUID_LEAKAGE",
    "ELECTRIC_MALFUNCTION",
    "ENGINE_MALFUNCTION",
    "OTHER_MALFUNCTION",
    "OWN_FAULT",
    "OPPOSITE_FAULT",
    "ASSAULT",
    "ASSAULT_ON_DRIVER",
    "ASSAULT_ON_PASSENGER",
    "ASSAULT_ON_VEHICLE",
    "PASSED_OUT_PASSENGER",
    "WEATHER",
    "WEATHER_CONDITIONS",
    "SLIPPERINESS",
    "ROAD_CONDITION",
    "VEHICLE_OFF_THE_ROAD_BY_DRIVER_ERROR",
    "VEHICLE_OFF_THE_ROAD_BY_OTHER_REASON",
    "MISSPARKED_VEHICLE",
    "CONGESTION_CAUSED_BY_VEHICLE",
    "CONGESTION_REASON_UKNOWN",
    "CONGESTION_CAUSED_BY_ACCIDENT",
    "DRIVER_SEIZURE",
    "PASSENGER_SEIZURE",
    "PASSENGER_INJURED",
    "OTHER_SEIZURE",
    "DEVICE_ERROR",
    "OPERATOR_DEVICE_ERROR",
    "WRONG_INFORMATION_IN_DEVICE",
    "ITS_MOTHER_SYSTEM_ERROR",
    "USER_ERROR",
    "FALSE_ALARM",
    "OTHER_ITS_ERROR",
    "DRIVER_ERROR",
    "INSUFFICIENT_INSTRUCTIONS_BY_OPERATOR",
    "INSUFFICIENT_INSTRUCTIONS_BY_AUTHORITY",
    "OTHER_ASSAULT",
    "UNKNOWN_CAUSE",
    "OTHER_STRIKE",
    "OTHER_CAUSE",
    "UNDRIVEN_BLOCK",
]


def is_valid_enum(col: Column | str, universe: list[str]) -> Column:
    """P10/S5 — vectorized membership test; NULL counts as invalid."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(universe)
