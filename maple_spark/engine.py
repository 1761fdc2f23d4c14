"""Engine facade — the Spark analog of the reference's server entry points.

Reference lifecycle (SURVEY.md §3): parse → analyze → plan → Volcano loop,
driven through ``NanoDBServer.doCommand(s)`` (``server/NanoDBServer.java:99-122``,
``:77-96``).  Here the entire pipeline collapses into Spark SQL; the facade
provides the same ergonomics:

    eng = MapleEngine(spark, sf_dir)
    eng.sql("SELECT ... FROM lineitem ...")      # doCommands analog
    eng.table("orders")                           # open-table analog
    eng.explain("SELECT ...")                     # ExplainCommand
    eng.analyze("lineitem")                       # AnalyzeCommand → CBO stats

plus DDL passthrough (CREATE/DROP on the session catalog).  Statistics feed
Catalyst's CBO exactly like the reference's ``TableStats``/``ColumnStats``
feed its DP join planner (``qeval/DPJoinPlanner.java``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from maple_spark.catalog import TABLES, register_views


class MapleEngine:
    """One engine instance per (session, data directory)."""

    def __init__(self, spark: SparkSession, sf_dir: str, tables=TABLES):
        self.spark = spark
        self.sf_dir = sf_dir
        self._tables = register_views(spark, sf_dir, tables)

    # -- query (doCommands analog) --------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Execute SQL against the registered catalog.  Spark's parser /
        analyzer / Catalyst replace the reference's ANTLR grammar +
        SelectClause analysis + DP planner (SURVEY.md §3 steps 2-5)."""
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self._tables[name]

    # -- utility commands (§2.11) ----------------------------------------
    def explain(self, query: str, mode: str = "formatted") -> str:
        from maple_spark.plans import explain_str

        return explain_str(self.sql(query), mode)

    def analyze(self, name: str, columns: list[str] | None = None) -> None:
        """ANALYZE: compute stats on a cataloged (non-temp) table.  Temp
        views can't hold stats; materialize to the session catalog first."""
        df = self._tables[name]
        tbl = f"maple_{name}"
        self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        # a previous session may have left the managed location behind
        # (DROP only cleans locations the current catalog knows about)
        import shutil

        warehouse = self.spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            shutil.rmtree(
                warehouse.removeprefix("file:") + f"/{tbl}", ignore_errors=True
            )
        df.write.mode("overwrite").saveAsTable(tbl)
        if columns:
            self.spark.sql(
                f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}"
            )
        else:
            self.spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")

    def table_stats(self, name: str) -> dict:
        """TableStats analog: rowCount/sizeInBytes from the catalog."""
        desc = self.spark.sql(f"DESCRIBE TABLE EXTENDED maple_{name}").collect()
        stats = {}
        for row in desc:
            if row["col_name"] == "Statistics":
                stats["statistics"] = row["data_type"]
        return stats
