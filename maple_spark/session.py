"""SparkSession factory for the maple_spark engine.

The reference engine (williamxww/maple) configures its runtime through
``src/main/resources/config.conf`` (page size, buffer pool, planner class).
The Spark-native equivalents are session confs: AQE replaces the reference's
static DP join planner (``qeval/DPJoinPlanner.java``), CBO + ANALYZE replaces
its ``qeval/TableStats`` machinery, and the vectorized Parquet reader replaces
the whole column-store layer (``storage/colstore/*``).

Design-for-scale notes (100 TB target):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic join-strategy switching are exactly what a 1000-executor job needs;
  none of it is expressible statically at plan time.
- ``spark.sql.shuffle.partitions`` is only the *initial* number under AQE;
  at cluster scale you would raise the default and let AQE coalesce.  The
  env knob SPARK_GRAFT_SHUFFLE lets bench tune it per scale factor.
- Arrow enabled for the (few) Pandas-UDF code paths (MinHash, embeddings).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle byte-for-byte.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _master_url_like(value: str) -> bool:
    """True iff ``value`` parses as a Spark master URL.

    Must match Spark's actual grammar — local / local[K] / local[*] /
    local[K,F] plus local-cluster[N,C,M] — with numeric bracket bodies:
    a loose startswith("local") would accept e.g. localhost:7077, and a
    loose bracket body ([^\\]]*) would accept local[abc]; both crash
    session creation where an untrusted env value should merely fall
    through to the default.
    """
    return bool(
        re.fullmatch(r"local(\[([0-9]+|\*)(,[0-9]+)?\])?", value)
        or re.fullmatch(r"local-cluster\[[0-9]+,[0-9]+,[0-9]+\]", value)
        or value.startswith(("spark://", "yarn", "k8s://", "mesos://"))
    )


def get_spark(
    app_name: str = "maple_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    Idempotent: Spark returns the active session if one exists; confs are
    applied only on first creation.
    """
    builder = SparkSession.builder.appName(app_name)
    # Master resolution: an explicit argument wins; otherwise defer to a
    # cluster manager configured externally (forcing local[] here would
    # silently demote a 1000-executor submission to the driver machine);
    # only a truly unconfigured run defaults local.  SparkConf cannot be
    # probed for this before the JVM gateway exists (it is an empty local
    # dict until SparkContext._jvm is live), so the externally-configured
    # case is detected from the submit environment instead:
    # - PYSPARK_GATEWAY_PORT: spark-submit launched this Python FROM an
    #   already-configured JVM driver (the canonical `spark-submit
    #   --master yarn app.py` path — the shell-only PYSPARK_SUBMIT_ARGS
    #   is absent there, so the gateway probe is the one that matters);
    # - PYSPARK_SUBMIT_ARGS containing --master: the pyspark shell;
    # - SPARK_MASTER holding a master URL: standalone-cluster convention.
    #   (A bare generic MASTER env var is deliberately NOT honored: other
    #   tooling/CI sets MASTER for unrelated purposes, and Spark itself
    #   never reads it — trusting it would only suppress the local[]
    #   default and crash session creation with "A master URL must be
    #   set".  SPARK_MASTER is likewise only trusted when its value
    #   looks like a master URL.)
    submit_args = os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    spark_master = os.environ.get("SPARK_MASTER", "")
    master_url_like = _master_url_like(spark_master)
    submit_configured = (
        bool(os.environ.get("PYSPARK_GATEWAY_PORT"))
        or "--master" in submit_args
    )
    if master:
        builder = builder.master(master)
    elif submit_configured:
        # spark-submit / pyspark-shell already chose the master; setting
        # one here would OVERRIDE the submit-time conf (builder options
        # win), so never touch it — even if SPARK_MASTER is also set
        pass
    elif master_url_like:
        # standalone-cluster env convention, and nothing stronger is
        # configured: Spark never reads SPARK_MASTER itself, so honoring
        # it means actually passing it through
        builder = builder.master(spark_master)
    else:
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    builder = (
        builder
        # --- planner / optimizer ---------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- python interop --------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- determinism vs the DuckDB oracle --------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(isAdjustedToUTC=false, MICROS) columns (the
        # driver's events.ts layout) must surface as TIMESTAMP, not
        # TIMESTAMP_NTZ: watermarks/event-time reject NTZ, and under a UTC
        # session timezone the values are identical to the DuckDB oracle.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # --- local-mode hygiene ----------------------------------------
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def release_session_state(spark) -> None:
    """Drop cached relations and force both GCs — the between-queries
    hygiene every multi-query harness needs: broadcast relations pile
    up on the driver across a long session (ContextCleaner frees them
    only after the referencing DataFrames are GC'd), and a 100× sweep
    OOM'd in a BroadcastExchange at query ~26 from exactly this.  One
    definition shared by bench.py, the scale sweeps, and the snapshot
    amortization scripts so a future fix to the release protocol lands
    everywhere at once."""
    import gc

    spark.catalog.clearCache()
    gc.collect()
    # Spark Connect sessions have no _jvm gateway — clearCache + Python
    # GC are the portable part; the JVM GC is a classic-mode extra.
    jvm = getattr(spark, "_jvm", None)
    if jvm is not None:
        jvm.System.gc()
