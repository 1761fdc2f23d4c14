"""Interactive REPL — the reference's primary entry point re-expressed.

Parity surface (SURVEY.md §3.1): `client/ExclusiveClient.main`
(client/ExclusiveClient.java:72) loops on console input with an
`InteractiveLexer` that buffers lines until a statement terminator and
switches between a command prompt and a continuation prompt; statements
run through the same parse/plan/execute pipeline as every other entry
point, results print through `TuplePrinter` (qeval/TuplePrinter.java,
§2.1 S8), and `EXIT`/`QUIT` ends the session (nanosql.g:185-186).

Here the pipeline is `MapleEngine.sql` (Spark SQL parse/optimize/execute)
and the printer is a plain column-aligned text table.  The loop is
stream-in/stream-out so tests drive it in-process; `main()` binds it to
stdin/stdout.  Errors print and the loop continues — an interactive
session never dies on a bad statement.

Sibling: ``scripts/repl.py`` is the human-facing console client (readline
input, ``\\d`` table listing, EXPLAIN/ANALYZE meta-commands, df.show
rendering).  This module is the embeddable core loop with the
TuplePrinter-parity formatter.
"""

from __future__ import annotations

import sys
from typing import IO

from maple_spark.engine import MapleEngine

PROMPT = "CMD> "
CONT_PROMPT = "   > "
MAX_ROWS = 100


def format_rows(columns: list[str], rows: list, max_rows: int = MAX_ROWS) -> str:
    """TuplePrinter-style column-aligned table (qeval/TuplePrinter.java):
    header, separator, one line per row, NULL for SQL NULL."""
    shown = rows[:max_rows]
    cells = [[("NULL" if v is None else str(v)) for v in row] for row in shown]
    widths = [
        max(len(c), *(len(r[i]) for r in cells)) if cells else len(c)
        for i, c in enumerate(columns)
    ]
    lines = [
        " | ".join(c.ljust(w) for c, w in zip(columns, widths)),
        "-+-".join("-" * w for w in widths),
    ]
    lines += [" | ".join(r[i].ljust(widths[i]) for i in range(len(columns))) for r in cells]
    tail = (
        f"({len(rows)} rows)"
        if len(rows) <= max_rows
        else f"(> {max_rows} rows, first {max_rows} shown)"
    )
    return "\n".join(lines + [tail])


def run_repl(
    engine: MapleEngine,
    in_stream: IO[str],
    out_stream: IO[str],
    max_rows: int = MAX_ROWS,
) -> None:
    """Drive the read-parse-execute-print loop until EXIT/QUIT or EOF.

    Lines buffer until a ';' closes the statement (the InteractiveLexer
    behavior: prompt shows CMD> at statement start, `   >` on
    continuation lines).  Statement splitting is quote-aware via
    MapleEngine._split_statements.
    """
    buf: list[str] = []
    out_stream.write(PROMPT)
    out_stream.flush()
    for line in in_stream:
        buf.append(line)
        # quote/comment-aware completeness check: a ';' inside a string
        # literal or -- comment must not flush the buffer; an unterminated
        # trailing statement stays buffered instead of executing early
        script = "".join(buf)
        cut = engine._last_top_level_semicolon(script)
        if cut < 0:
            out_stream.write(CONT_PROMPT)
            out_stream.flush()
            continue
        script, rest = script[: cut + 1], script[cut + 1 :]
        buf = [rest] if rest.strip() else []
        for stmt in engine._split_statements(script):
            if stmt.strip().rstrip(";").upper() in ("EXIT", "QUIT"):
                out_stream.write("bye\n")
                return
            try:
                # dialect router: reference statements (CREATE STORE,
                # ANALYZE, VERIFY, OPTIMIZE, UPDATE/DELETE, ...) run the
                # engine implementations; ANSI flows to spark.sql
                from maple_spark.dialect import ExitScript, route_statement

                df = route_statement(engine, stmt)
                if isinstance(df, ExitScript):
                    out_stream.write("bye\n")
                    return
                if df is not None and df.columns:
                    rows = df.limit(max_rows + 1).collect()
                    out_stream.write(
                        format_rows(df.columns, rows, max_rows) + "\n"
                    )
                else:
                    out_stream.write("OK\n")
            except Exception as exc:  # keep the session alive on bad SQL
                msg = str(exc).splitlines()[0] if str(exc) else repr(exc)
                out_stream.write(f"ERROR: {msg}\n")
        out_stream.write(CONT_PROMPT if buf else PROMPT)
        out_stream.flush()


def main() -> None:
    from maple_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    engine = MapleEngine(get_spark(app_name="maple_repl"), sf_dir)
    run_repl(engine, sys.stdin, sys.stdout)


if __name__ == "__main__":
    main()
