"""Shared pytest fixtures: one SparkSession per test session.

Mirrors the reference's SqlTestCase harness (SURVEY.md §5 layer 1): boot an
engine once, run queries, compare expected rows.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from maple_spark.session import get_spark

    s = get_spark(shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tmp_warehouse(tmp_path_factory):
    return str(tmp_path_factory.mktemp("warehouse"))


def rows(df):
    """Order-insensitive tuple set (reference checkUnorderedResults).
    None sorts first (matching the engine's NULLS FIRST convention)."""
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is not None, x) for x in t),
    )


def ordered_rows(df):
    """Ordered tuple list (reference checkOrderedResults)."""
    return [tuple(r) for r in df.collect()]
