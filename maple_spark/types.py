"""Type system mapping — SURVEY.md §1.2.

Reference: ``relations/SQLDataType.java:26-117`` declares the SQL type ids;
``relations/ColumnType.java:16-50`` adds length (CHAR/VARCHAR 1..65535) and
precision/scale (NUMERIC); ``expressions/TypeConverter.java`` implements
value casts and the arithmetic coercion ladder Double > Float > Long >
Integer (``:430-458``).

This module is the declared mapping to Spark types, including the two
decisions SURVEY.md flags:
- TIME has no Spark type → seconds-of-day INTEGER (documented, convertible
  with ``time_to_seconds``/``seconds_to_time_str``);
- CHAR/VARCHAR lengths are metadata (Spark StringType is unbounded) —
  recorded in StructField metadata and enforceable via
  :func:`length_violations`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    ByteType,
    DataType,
    DateType,
    DayTimeIntervalType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    TimestampType,
)

#: SQLDataType name (reference id in comment) → Spark type factory.
SQL_TYPE_MAP: dict[str, DataType] = {
    "INTEGER": IntegerType(),      # 0x01
    "SMALLINT": ShortType(),       # 0x02
    "BIGINT": LongType(),          # 0x03
    "TINYINT": ByteType(),         # 0x04
    "FLOAT": FloatType(),          # 0x05
    "DOUBLE": DoubleType(),        # 0x06
    # NUMERIC (0x07) → DecimalType(p, s) via numeric()
    "CHAR": StringType(),          # 0x15 (length → metadata)
    "VARCHAR": StringType(),       # 0x16 (length → metadata)
    "TEXT": StringType(),          # 0x17
    "BLOB": BinaryType(),          # 0x18
    "DATE": DateType(),            # 0x1F
    "TIME": IntegerType(),         # 0x20 — seconds-of-day (no Spark TimeType)
    "DATETIME": TimestampType(),   # 0x21
    "TIMESTAMP": TimestampType(),  # 0x22
    "INTERVAL": DayTimeIntervalType(),  # types/Interval.java (millis-based)
}


def numeric(precision: int, scale: int) -> DecimalType:
    """NUMERIC(p,s) (SQLDataType 0x07; ColumnType precision/scale)."""
    return DecimalType(precision, scale)


def char_field(name: str, length: int, varying: bool = True, nullable: bool = True) -> StructField:
    """CHAR(n)/VARCHAR(n): StringType with the declared length in metadata
    (reference enforces 1..65535, ColumnType.java:159-265)."""
    if not 1 <= length <= 65535:
        raise ValueError(f"length {length} outside 1..65535")
    return StructField(
        name,
        StringType(),
        nullable,
        metadata={"sql_type": "VARCHAR" if varying else "CHAR", "length": length},
    )


def length_violations(df: DataFrame, col: str, length: int) -> DataFrame:
    """Rows exceeding a declared CHAR/VARCHAR length (enforcement check —
    the reference truncates/rejects at insert; we validate at ingest)."""
    return df.where(F.length(F.col(col)) > length)


# -- TIME helpers (seconds-of-day representation) --------------------------

def time_to_seconds(h: Column, m: Column, s: Column) -> Column:
    """types/Time.java(h/m/s[/ms]) → seconds-of-day int."""
    return (h * 3600 + m * 60 + s).cast("int")


def seconds_to_time_str(sec: Column) -> Column:
    """seconds-of-day → 'HH:mm:ss' display form."""
    return F.date_format(F.timestamp_seconds(sec.cast("bigint")), "HH:mm:ss")


#: Arithmetic coercion ladder (TypeConverter.coerceArithmetic:430-458).
#: Spark's own numeric promotion implements the same ladder; listed for
#: parity checks in tests.
COERCION_LADDER = ["DOUBLE", "FLOAT", "BIGINT", "INTEGER"]
