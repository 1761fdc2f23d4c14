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

    def execute_script(self, script: str) -> list[list | None]:
        """doCommands analog (server/NanoDBServer.java:77-96): run a
        multi-statement SQL script sequentially, returning collected rows
        per statement (None for statements with no result set).  Eager by
        design — script statements see each other's effects, so a lazy
        result handed out here could observe a table a later DROP already
        deleted.  This is the reference's embedded/test-harness entry
        point (CommandResult collects tuples the same way,
        SqlTestCase.java:28); for lazy single-query plans use ``sql()``."""
        results: list[list | None] = []
        for stmt in self._split_statements(script):
            df = self.spark.sql(stmt)
            results.append(df.collect() if df.columns else None)
        return results

    @staticmethod
    def _split_statements(script: str) -> list[str]:
        """Split on ';' outside single/double-quoted strings (the level of
        lexing the task needs — the statements themselves are parsed by
        Spark SQL, not here)."""
        stmts, buf, quote = [], [], None
        for ch in script:
            if quote:
                buf.append(ch)
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
                buf.append(ch)
            elif ch == ";":
                stmts.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        stmts.append("".join(buf))
        return [s.strip() for s in stmts if s.strip()]

    def optimize(self, path: str, target_partitions: int = 8) -> DataFrame:
        """OPTIMIZE analog (commands/OptimizeCommand.java:63): compact a
        parquet location's small files into ``target_partitions`` files."""
        from maple_spark.operators.dml import compact

        return compact(self.spark, path, target_partitions)

    def verify(self, name: str, key: list[str]) -> DataFrame:
        """VERIFY analog (commands/VerifyCommand.java:68): the reference
        checks B+tree index consistency; the engine's integrity invariant
        is key uniqueness — returns the violating keys (empty = verified)."""
        from maple_spark.constraints import pk_violations

        return pk_violations(self._tables[name], key)
