"""E3 — TripCancellation protobuf wire-format encoding (SURVEY §2.1 S6).

The reference serializes each surviving record as an
``InternalMessages.TripCancellation`` protobuf
(``OmmCancellationHandler.java:112-148``, ``toByteArray`` at the send
site L236).  Its ``.proto`` lives in an external artifact, so the
exact upstream field numbers are not part of the reference repo; this
module defines the engine's OWN stable numbering (documented below)
and emits honest protobuf *wire format* — varint + length-delimited
encoding per the public protobuf spec — implemented in pure Python so
the portable build needs neither the ``protobuf`` package nor the
``spark-protobuf`` jar.  Where those are available at deploy time,
``pyspark.sql.protobuf.functions.to_protobuf`` with a compiled
descriptor is the drop-in replacement; the column contract
(key / value bytes / event time) is identical.

Encoding rules (proto3-compatible):

- string fields  -> wire type 2 (length-delimited UTF-8); empty/null
  fields are omitted, like proto3 default-value elision.
- integer fields -> wire type 0 (varint); zero is omitted.
- enums travel as their string names (the upstream enum numbering is
  in the external artifact; a string field is the faithful portable
  stand-in and round-trips losslessly).
- fields are written in ascending field-number order, making the
  encoding deterministic (protobuf does not require field order;
  fixing it gives byte-stable output for test assertions).

The Spark path is an Arrow-batched pandas UDF over the payload struct
— one Python round trip per batch, no row-at-a-time JVM<->Python
chatter.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: field number -> (name, kind).  Order mirrors the reference's
#: builder sets (OmmCancellationHandler.java:112-148).
TRIP_CANCELLATION_FIELDS: list[tuple[int, str, str]] = [
    (1, "route_id", "string"),
    (2, "direction_id", "int"),
    (3, "start_date", "string"),
    (4, "start_time", "string"),
    (5, "status", "string"),
    (6, "schema_version", "int"),
    (7, "dvj_id", "string"),
    (8, "deviation_case_id", "int"),
    (9, "deviation_cases_type", "string"),
    (10, "affected_departures_type", "string"),
    (11, "title", "string"),
    (12, "description", "string"),
    (13, "category", "string"),
    (14, "sub_category", "string"),
]

_WIRE_VARINT = 0
_WIRE_LEN = 2


def _varint(n: int) -> bytes:
    if n < 0:
        # proto int64 negative values encode as 10-byte two's complement
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, val = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            if val >= 1 << 63:  # re-interpret as signed int64
                val -= 1 << 64
            return val, pos
        shift += 7


def encode_trip_cancellation(record: dict) -> bytes:
    """One record dict -> protobuf wire bytes (deterministic order)."""
    out = bytearray()
    for num, name, kind in TRIP_CANCELLATION_FIELDS:
        v = record.get(name)
        if v is None:
            continue
        if kind == "int":
            v = int(v)
            if v == 0:
                continue  # proto3 default elision
            out += _varint((num << 3) | _WIRE_VARINT)
            out += _varint(v)
        else:
            s = str(v).encode("utf-8")
            if not s:
                continue
            out += _varint((num << 3) | _WIRE_LEN)
            out += _varint(len(s))
            out += s
    return bytes(out)


def decode_trip_cancellation(buf: bytes) -> dict:
    """Wire bytes -> record dict (skips unknown fields, per spec)."""
    by_num = {num: (name, kind) for num, name, kind in TRIP_CANCELLATION_FIELDS}
    out: dict = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 0x7
        if wire == _WIRE_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wire == _WIRE_LEN:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln].decode("utf-8")
            pos += ln
        else:  # pragma: no cover - no fixed32/64 fields in this schema
            raise ValueError(f"unsupported wire type {wire}")
        if num in by_num:
            name, kind = by_num[num]
            out[name] = int(val) if kind == "int" else val
    return out


def protobuf_value(payload_fields: list[str]) -> Column:
    """Column expression: payload struct -> protobuf bytes.

    The pandas UDF is built lazily — decorating at module import would
    require an active SparkContext (DDL type parsing), breaking plain
    imports of the pure-Python codec.
    """

    @pandas_udf("binary")
    def _encode_udf(payload: pd.DataFrame) -> pd.Series:
        cols = payload.columns
        return pd.Series(
            [
                encode_trip_cancellation(dict(zip(cols, row)))
                for row in payload.itertuples(index=False, name=None)
            ]
        )

    return _encode_udf(F.struct(*payload_fields))


def decode_messages(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Inverse path for tests/consumers: bytes column -> payload struct."""
    fields = ", ".join(
        f"{name} {'long' if kind == 'int' else 'string'}"
        for _, name, kind in TRIP_CANCELLATION_FIELDS
    )

    @pandas_udf(f"struct<{fields}>")
    def _decode(vals: pd.Series) -> pd.DataFrame:
        rows = [decode_trip_cancellation(bytes(v)) for v in vals]
        names = [name for _, name, _ in TRIP_CANCELLATION_FIELDS]
        return pd.DataFrame(
            {n: [r.get(n) for r in rows] for n in names}
        )

    return df.withColumn("payload", _decode(F.col(value_col)))
