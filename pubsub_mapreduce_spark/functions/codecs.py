"""Scalar / codec functions F1-F9 from the reference (SURVEY.md section 2.4).

All are thin compositions of built-in ``pyspark.sql.functions`` — they stay
inside whole-stage codegen (no Python UDFs), so they cost nothing at 100TB.

Reference citations:
- F1 JSON serialize          : knobs.go:72, mapper.go:77, reducer.go:105
- F2 JSON deserialize typed  : flood.go:68-72, reducer.go:146-150
- F3 JSON dynamic field pick : knobs.go:93-100
- F4 int -> hex string       : flood.go:77  (strconv.FormatInt(id, 16))
- F5 hex string -> int       : mapper.go:99 (strconv.ParseInt(s, 16, 8))
- F6 base64 encode           : reducer.go:110
- F7 epoch-float timestamp   : simulate-knobs.go:28,66 (UnixNano()/1e9)
- F8 sine/mod/floor math     : simulate-knobs.go:66-69, knobs.go:64
- F9 float -> int64 trunc    : knobs.go:98-99
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# The reference's wire schemas (SURVEY.md section 1.1), made explicit.
KNOBS_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n", LongType()),
        StructField("ts", DoubleType()),  # fractional epoch seconds
    ]
)
FLOOD_SCHEMA = StructType([StructField("Ns", ArrayType(LongType()))])
REDUCER_SCHEMA = StructType([StructField("messages", ArrayType(LongType()))])


def to_json_struct(*cols: Column | str) -> Column:
    """F1: struct -> JSON string (knobs.go:72)."""
    return F.to_json(F.struct(*cols))


def from_json_typed(col: Column | str, schema: StructType) -> Column:
    """F2: JSON string -> typed struct; unknown fields dropped, missing
    fields null (flood.go:68-72 drops/zeroes them — we keep null and let
    callers coalesce, which is the honest Spark semantics)."""
    return F.from_json(col, schema)


def json_field(col: Column | str, path: str) -> Column:
    """F3: dynamic JSON field access (knobs.go:93-100)."""
    return F.get_json_object(col, path)


def int_to_hex(col: Column | str) -> Column:
    """F4: int -> lowercase base-16 string, matching Go's FormatInt
    (flood.go:77 — Go emits lowercase; Spark's ``hex`` is uppercase)."""
    return F.lower(F.hex(col))


def hex_to_int(col: Column | str) -> Column:
    """F5: base-16 string -> long. The reference parses with 8-bit width
    (mapper.go:99) so ids >127 would fail there; we keep full long range
    (divergence noted in SURVEY.md section 7)."""
    return F.conv(col, 16, 10).cast("long")


def b64_encode(col: Column | str) -> Column:
    """F6: bytes/string -> base64 (reducer.go:110)."""
    return F.base64(col if isinstance(col, Column) else F.col(col).cast("binary"))


def epoch_seconds(ts_col: Column | str) -> Column:
    """F7: timestamp -> fractional epoch seconds double, the reference's
    wire time representation (simulate-knobs.go:28)."""
    c = ts_col if isinstance(ts_col, Column) else F.col(ts_col)
    return c.cast("double")


def from_epoch_seconds(col: Column | str) -> Column:
    """F7 inverse: fractional epoch seconds -> TimestampType."""
    return F.timestamp_seconds(col if isinstance(col, Column) else F.col(col))


def sine_wave(t_seconds: Column, amplitude: Column, period_s: Column) -> Column:
    """F8: the simulator's sine profile
    ``n(t) = N * sin(pi * (t mod period) / period)`` (simulate-knobs.go:66-69),
    truncated to long as the reference does (float->int cast)."""
    phase = F.pmod(t_seconds, period_s) / period_s
    return (amplitude * F.sin(phase * math.pi)).cast("long")


def trunc_long(col: Column | str) -> Column:
    """F9: float -> int64 truncation-toward-zero (knobs.go:98-99, Go cast)."""
    c = col if isinstance(col, Column) else F.col(col)
    return c.cast("long")
