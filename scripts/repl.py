"""Interactive SQL shell — the reference's REPL client made Spark-native.

Reference: ``client/ExclusiveClient.main`` (SURVEY.md §3.1) loops on console
input, parses, plans, executes, and prints tuples.  Here the whole pipeline
is ``MapleEngine.sql`` + ``show()``; meta-commands mirror the reference's
utility commands (EXPLAIN, ANALYZE, EXIT — grammar nanosql.g:711-751).

Usage:  python scripts/repl.py [sf_dir]
    maple> SELECT COUNT(*) FROM lineitem;
    maple> EXPLAIN SELECT * FROM orders WHERE o_orderkey = 1;
    maple> \\d                -- list tables
    maple> EXIT;
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from maple_spark.catalog import TABLES
    from maple_spark.engine import MapleEngine
    from maple_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="maple_repl")
    spark.sparkContext.setLogLevel("ERROR")
    eng = MapleEngine(spark, sf_dir)
    print(f"maple_spark REPL — tables from {sf_dir} (EXIT; to quit)")

    buf: list[str] = []
    while True:
        try:
            prompt = "maple> " if not buf else "   ... "
            line = input(prompt)
        except EOFError:
            break
        if line.strip() == "\\d":
            for t in TABLES:
                print(f"  {t}  ({eng.table(t).count()} rows)")
            continue
        buf.append(line)
        if not line.rstrip().endswith(";"):
            continue
        stmt = " ".join(buf).rstrip().rstrip(";").strip()
        buf = []
        if not stmt:
            continue
        upper = stmt.upper()
        try:
            if upper in ("EXIT", "QUIT"):
                break
            elif upper.startswith("EXPLAIN "):
                print(eng.explain(stmt[len("EXPLAIN "):]))
            elif upper.startswith("ANALYZE "):
                table = stmt.split()[1]
                eng.analyze(table)
                print(f"analyzed {table}: {eng.table_stats(table)}")
            else:
                # reference-dialect statements (CREATE STORE, VERIFY,
                # OPTIMIZE, UPDATE/DELETE, ...) route to the engine;
                # ANSI falls through to spark.sql
                from maple_spark.dialect import route_statement

                df = route_statement(eng, stmt)
                if df is not None:
                    df.show(50, truncate=40)
                else:
                    print("OK")
        except Exception as exc:  # keep the shell alive on bad SQL
            print(f"error: {type(exc).__name__}: {str(exc).splitlines()[0]}")
    print("bye")


if __name__ == "__main__":
    main()
