"""Skew mitigation & co-location — the shuffle-management toolkit.

Two standard techniques the 100 TB plan needs beyond AQE's automatic skew
splitting (`spark.sql.adaptive.skewJoin`, enabled in session.py):

- ``salted_join``: explicit key salting for aggregation/join skew that AQE
  can't fix (e.g. one key is 30% of a fact table and the other side must
  replicate).  Left keys get a random-but-deterministic salt in [0, n);
  the right side is replicated n ways; the join key becomes (key, salt) so
  the hot key spreads over n reducers.
- ``bucket_tables`` + ``bucketed_join``: pre-shuffle both tables into the
  same bucket layout (``bucketBy`` on the join key) so repeated joins on
  that key are shuffle-free — the Spark analog of co-located storage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the left side salted and the right side
    replicated ``n_salts`` ways.

    Deterministic salt rather than rand() so retries/speculative tasks
    agree: a round-robin over ``monotonically_increasing_id`` — NOT a
    hash of the row content, which would collapse to ONE salt when the
    hot key's rows are identical (projected fact tables, dedup-shaped
    data: exactly the skew scenario this operator exists for).  The salt
    only steers placement, never the join result, so its dependence on
    physical row order is harmless.  Use when one side has heavy hitters
    AND the other side is too big to broadcast; cost = n_salts×
    replication of the right side.

    Only inner/left-shaped joins are legal: an unmatched RIGHT row exists
    once per replica, so right/full outer would emit n_salts null-padded
    duplicates for it.  Salt the other side instead for those.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "cross"):
        raise ValueError(
            f"salted_join(how={how!r}): right/full outer joins would "
            "duplicate unmatched right rows once per salt replica; swap the "
            "sides (salt the right table) and use a left-shaped join"
        )
    salt = (
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    ).alias("__salt")
    salted_left = left.select("*", salt)
    replicated_right = right.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    )
    out = salted_left.join(replicated_right, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def bucket_tables(
    spark: SparkSession,
    dfs: dict[str, DataFrame],
    key: str,
    n_buckets: int = 16,
) -> dict[str, DataFrame]:
    """Write each DataFrame as a bucketed+sorted table on ``key`` and
    return the catalog-backed frames.  Joins between any two of them on
    ``key`` need no exchange (SortMergeJoin over pre-bucketed scans)."""
    import shutil

    out = {}
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    for name, df in dfs.items():
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        if warehouse.startswith("file:"):
            # orphaned location from a crashed prior session — DROP only
            # cleans locations the current catalog knows about
            shutil.rmtree(
                warehouse.removeprefix("file:") + f"/{name}", ignore_errors=True
            )
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(name)
        )
        out[name] = spark.table(name)
    return out


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — plans
    without an Exchange on either side (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
