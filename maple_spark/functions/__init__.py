"""Scalar function library — SURVEY.md §2.8.

The reference registers ~20 scalar functions in a name→class registry
(``functions/FunctionDirectory.java:38-58``), each a small ``Function``
subclass with ``getReturnType`` + per-row ``evaluate``.  Here every one maps
to a JVM-side Catalyst expression from ``pyspark.sql.functions`` — no Python
in the row loop, all eligible for whole-stage codegen and constant folding.

Parity table (reference class → here):
    Abs.java:23        → ABS          ArcCos.java:23    → ACOS
    ArcSin.java:23     → ASIN         ArcTan.java:23    → ATAN
    ArcTan2.java:22    → ATAN2        Ceil.java:22      → CEIL
    Floor.java:22      → FLOOR        Coalesce.java:20  → COALESCE
    Concat.java:22     → CONCAT       Cos.java:23       → COS
    Sin.java:23        → SIN          Tan.java:23       → TAN
    Greatest.java:19   → GREATEST     Least.java:18     → LEAST
    If.java:20         → IF           IfNull.java:17    → IFNULL
    NullIf.java:21     → NULLIF       Pow.java:23       → POW
    Sqrt.java:23       → SQRT         Round.java:23     → ROUND

Also the working string-match operators the reference stubs
(``expressions/StringMatchOperator.java:108-117`` always returns false):
LIKE → ``Column.like``, SIMILAR TO → ``Column.rlike``.

The reference's registry is extensible via ``addFunction(name, Function)``
(``FunctionDirectory.java:79-99``); ``register_udf`` mirrors that, with the
documented caveat that Python UDFs are the slow path.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# -- math (direct re-exports; identical NULL-in → NULL-out semantics) -----
ABS = F.abs
ACOS = F.acos
ASIN = F.asin
ATAN = F.atan
ATAN2 = F.atan2
CEIL = F.ceil
FLOOR = F.floor
COS = F.cos
SIN = F.sin
TAN = F.tan
POW = F.pow
SQRT = F.sqrt
ROUND = F.round

# -- conditional / null handling ------------------------------------------
COALESCE = F.coalesce
GREATEST = F.greatest
LEAST = F.least
NULLIF = F.nullif
IFNULL = F.ifnull


def IF(cond: Column, then: Column, otherwise: Column) -> Column:
    """Reference ``If.java:20`` — 3-arg conditional."""
    return F.when(cond, then).otherwise(otherwise)


# -- string ----------------------------------------------------------------
CONCAT = F.concat


def LIKE(col: Column, pattern: str) -> Column:
    """Working LIKE (reference E6 stub).  %/_ wildcards, NULL-propagating."""
    return col.like(pattern)


def SIMILAR_TO(col: Column, pattern: str) -> Column:
    """Working SIMILAR TO as a regex match (reference E7 stub).

    Dialect contract: Spark compiles with java.util.regex.  The engine
    promises only the Java∩RE2-portable subset (classes, anchors,
    alternation, bounded repeats, ``\\d \\s \\w``, inline ``(?i)``);
    lookaround, backreferences, and possessive quantifiers are Java-only
    and excluded from oracle-gated queries — the portable/non-portable
    split is executable in tests/test_sql_dialect.py (PORTABLE_REGEX /
    JAVA_ONLY_REGEX)."""
    return col.rlike(pattern)


# -- registry (reference FunctionDirectory.addFunction analog) -------------
def register_udf(spark: SparkSession, name: str, fn, return_type) -> None:
    """Register a scalar Python UDF by name for use in spark.sql().

    Prefer built-in Column expressions — a row-at-a-time Python UDF breaks
    whole-stage codegen and serializes every row through the Python worker.
    For numeric/batch work use ``pandas_udf`` (Arrow-vectorized) instead.
    """
    spark.udf.register(name, fn, return_type)


#: name → builder, mirroring FunctionDirectory's string-keyed lookup so a
#: SQL front-end can resolve function calls (grammar nanosql.g:998).
DIRECTORY = {
    "ABS": ABS, "ACOS": ACOS, "ASIN": ASIN, "ATAN": ATAN, "ATAN2": ATAN2,
    "CEIL": CEIL, "CEILING": CEIL, "FLOOR": FLOOR, "COALESCE": COALESCE,
    "CONCAT": CONCAT, "COS": COS, "SIN": SIN, "TAN": TAN,
    "GREATEST": GREATEST, "LEAST": LEAST, "IF": IF, "IFNULL": IFNULL,
    "NULLIF": NULLIF, "POW": POW, "POWER": POW, "SQRT": SQRT, "ROUND": ROUND,
}
