"""Operator surface of the engine — one builder per SURVEY.md §2 row.

Each module maps a family of reference plan nodes to idiomatic DataFrame
compositions.  Builders are *declarative*: they return unexecuted DataFrames
so Catalyst can fuse filter/project into the Parquet scan, choose join
strategies, and run partial aggregation — the optimizations the reference
implements by hand (or stubs) in ``qeval/DPJoinPlanner.java``.
"""

from maple_spark.operators.scan import scan, scan_csv
from maple_spark.operators.joins import (
    join,
    natural_join,
    using_join,
    cross_join,
    semi_join,
    anti_join,
)
from maple_spark.operators.sort import order_by, sort_key
from maple_spark.operators.dml import insert_rows, update_where, delete_where

__all__ = [
    "scan",
    "scan_csv",
    "join",
    "natural_join",
    "using_join",
    "cross_join",
    "semi_join",
    "anti_join",
    "order_by",
    "sort_key",
    "insert_rows",
    "update_where",
    "delete_where",
]
