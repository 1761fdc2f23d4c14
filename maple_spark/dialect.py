"""Reference-dialect statement front-end.

The reference accepts a small SQL dialect beyond ANSI (grammar:
``src/main/resources/nanosql.g``).  ANSI statements (SELECT, CREATE
TABLE/VIEW, INSERT ... VALUES on catalog tables, EXPLAIN SELECT) flow to
``spark.sql`` unchanged; this module routes ONLY the statements Spark's
parser cannot run:

- ``CREATE STORE t FROM 'file' (cols)``    (nanosql.g:260-270)  → CSV ingest
- ``CREATE COLSTORE t FROM 'file' (cols)`` (nanosql.g:413-423)  → CSV ingest
  (Parquet *is* the column store — both land in the engine warehouse dir)
- ``ANALYZE [VERBOSE] t, ...``             (nanosql.g:697-706)  → CBO stats
- ``VERIFY t, ...``                        (nanosql.g:722-730)  → full-scan
  integrity check (parquet footer/checksum validation + row count; the
  reference verifies B+tree indexes — VerifyCommand.java:68)
- ``OPTIMIZE t, ...``                      (nanosql.g:735-743)  → small-file
  compaction of dialect-created stores (OptimizeCommand.java:63)
- ``UPDATE t SET c=e [WHERE e]``           (nanosql.g:647-658)  → read-
  transform-rewrite (UpdateCommand.java:30)
- ``DELETE FROM t [WHERE e]``              (nanosql.g:662-671)  → read-
  filter-rewrite (DeleteCommand.java:35)
- ``INSERT INTO t [(cols)] VALUES (...), ... | SELECT ...``
  (nanosql.g:613-642) on a dialect store → parquet append, on a
  view-backed table → unioned view (InsertCommand.java:41,160-185 —
  column list and SELECT form included); inserts on real Spark catalog
  tables fall through to ``spark.sql``
- ``EXPORT t TO 'path' [FORMAT f] [PARTITION BY (cols)] [COMPRESSION c]``
  (extension —
  the file-sink inverse of CREATE STORE; the reference's sinks stop at
  the printer/TupleSender family) → ``engine.export`` /
  ``sources.ingest.write_and_reread``; returns the re-read frame
- ``BEGIN/START TRANSACTION/COMMIT/ROLLBACK`` (nanosql.g:676-694) →
  explicit error: transactions are scoped out (BASELINE.json — Parquet has
  no WAL); a silent no-op would lie about atomicity
- ``CRASH`` (nanosql.g:747) → scoped out, explicit error
- ``EXIT`` / ``QUIT``                      → stop script execution

Statement classification is a first-keyword dispatch plus small regexes —
deliberately NOT a grammar: every routed statement's *body* (expressions,
values) is handed to Spark SQL for real parsing, so this layer only needs
to recognize statement shapes, exactly like the reference's top-level
``command`` rule.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: reference column_type (nanosql.g:320-341) → Spark SQL type
_TYPE_MAP = [
    (re.compile(r"(?:var)?char(?:acter)?(?:\s+varying)?\s*\(\s*\d+\s*\)", re.I), "string"),
    (re.compile(r"int(?:eger)?\b", re.I), "int"),
    (re.compile(r"float\b", re.I), "float"),
    (re.compile(r"double\b", re.I), "double"),
    (re.compile(r"datetime\b", re.I), "timestamp"),
    (re.compile(r"timestamp\b", re.I), "timestamp"),
    (re.compile(r"date\b", re.I), "date"),
    (re.compile(r"time\b", re.I), "string"),  # TIME-of-day: stored as string, see SURVEY §2.8
    (re.compile(r"numeric\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", re.I), None),  # → decimal(p,s)
]

# file_name (nanosql.g:215-231) is an UNQUOTED ident[.ext] in the
# reference; quoted paths are also accepted for real filesystem paths
_CREATE_STORE = re.compile(
    r"^\s*CREATE\s+(?:COL)?STORE\s+(?P<name>\w+)\s+FROM\s+"
    r"(?:'(?P<file>[^']+)'|(?P<file_bare>[\w./\\-]+))\s*\((?P<decl>.*)\)\s*$",
    re.I | re.S,
)
_CREATE_INDEX = re.compile(
    r"^\s*CREATE\s+(?:UNIQUE\s+)?INDEX\s+(?:\w+\s+)?ON\s+(?P<name>\w+)\s*"
    r"\((?P<cols>[\w\s,]+)\)(?:\s+USING\s+\w+)?\s*$",
    re.I,
)
# (?!TABLE\b): Spark's own `ANALYZE TABLE t COMPUTE STATISTICS` must fall
# through to spark.sql, not be parsed as the reference's bare-table form
_ANALYZE = re.compile(
    r"^\s*ANALYZE(?:\s+VERBOSE)?\s+(?!TABLE\b)(?P<tables>[\w\s,]+)$", re.I
)
_VERIFY = re.compile(r"^\s*VERIFY\s+(?P<tables>[\w\s,]+)$", re.I)
_OPTIMIZE = re.compile(r"^\s*OPTIMIZE\s+(?P<tables>[\w\s,]+)$", re.I)
# UPDATE captures the whole body after SET; the SET/WHERE split happens in
# _parse_update with a quote-aware scan (a string literal containing the
# word WHERE must not split the statement — nanosql.g parses with a real
# lexer, so this layer needs at least quote-level fidelity).
_UPDATE = re.compile(
    r"^\s*UPDATE\s+(?P<name>\w+)\s+SET\s+(?P<body>.+)$", re.I | re.S
)
_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<name>\w+)(?P<body>\s+.*)?$", re.I | re.S
)
# Full insert_stmt surface (nanosql.g:613-642): optional column list, then
# either VALUES tuples or a SELECT clause (InsertCommand.java:41 accepts
# both).  (?!SELECT\b) keeps `INSERT INTO t (SELECT ...)` from parsing the
# subquery as a column list.
_INSERT = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<name>\w+)\s*"
    r"(?:\(\s*(?!SELECT\b)(?P<cols>[\w\s,]+?)\s*\)\s*)?"
    r"(?:VALUES\s*(?P<values>\(.+\))|(?P<select>\(?\s*SELECT\b.+?\)?))\s*$",
    re.I | re.S,
)
_EXPLAIN_DML = re.compile(
    r"^\s*EXPLAIN\s+(?P<inner>(?:UPDATE|DELETE|INSERT)\b.+)$", re.I | re.S
)
# EXPORT t TO 'path' [FORMAT orc|csv|json|parquet] [PARTITION BY (cols)]
# — the file-sink inverse of CREATE STORE FROM 'file' (an extension: the
# reference's sink surface stops at the printer/TupleSender family);
# routes to engine.export / sources.ingest.write_and_reread and returns
# the re-read frame as the statement's result set.  The head regex stops
# at the path; trailing clauses parse ORDER-INSENSITIVELY in
# _parse_export_clauses, and junk raises a clear dialect error instead
# of falling through to spark.sql's opaque ParseException (review
# finding, round 11).
_EXPORT = re.compile(
    r"^\s*EXPORT\s+(?P<name>\w+)\s+TO\s+'(?P<path>[^']+)'(?P<rest>.*)$",
    re.I | re.S,
)
# IMPORT t FROM 'path' [FORMAT orc|csv|json|parquet] — the read-back
# inverse of EXPORT (round 12: a dialect-only script could previously
# write a partitioned export but not read it back).  Routes to
# engine.import_table: a metadata-only view registration (never copies
# the files), Hive-partitioned layouts and codecs read natively.
_IMPORT = re.compile(
    r"^\s*IMPORT\s+(?P<name>\w+)\s+FROM\s+'(?P<path>[^']+)'"
    r"(?:\s+FORMAT\s+(?P<fmt>\w+))?\s*$",
    re.I,
)
_EXPORT_FMT = re.compile(r"\bFORMAT\s+(?P<fmt>\w+)", re.I)
_EXPORT_COMP = re.compile(r"\bCOMPRESSION\s+(?P<codec>\w+)", re.I)
_EXPORT_PART = re.compile(
    r"\bPARTITION\s+BY\s*\(\s*(?P<cols>[\w\s,]+?)\s*\)", re.I
)


def _parse_export_clauses(
    rest: str,
) -> tuple[str, list[str] | None, str | None]:
    """(format, partition_by, compression) from EXPORT's tail, clauses
    in any order."""
    fmt = "parquet"
    cols = None
    codec = None
    m = _EXPORT_FMT.search(rest)
    if m:
        fmt = m.group("fmt").lower()
        rest = rest[: m.start()] + rest[m.end():]
    m = _EXPORT_PART.search(rest)
    if m:
        cols = _table_list(m.group("cols"))
        rest = rest[: m.start()] + rest[m.end():]
    m = _EXPORT_COMP.search(rest)
    if m:
        codec = m.group("codec").lower()
        rest = rest[: m.start()] + rest[m.end():]
    if rest.strip():
        raise UnsupportedStatementError(
            f"EXPORT: unrecognized clause {rest.strip()!r} "
            "(expected [FORMAT f] [PARTITION BY (cols)] [COMPRESSION c])"
        )
    return fmt, cols, codec


_TXN = re.compile(r"^\s*(BEGIN|START\s+TRANSACTION|COMMIT|ROLLBACK)(\s+WORK)?\s*$", re.I)
_CRASH = re.compile(r"^\s*CRASH\s*$", re.I)
_EXIT = re.compile(r"^\s*(EXIT|QUIT)\s*$", re.I)


class UnsupportedStatementError(NotImplementedError):
    """Statement the engine deliberately does not support (scoped out)."""


@dataclass
class ExitScript:
    """Sentinel returned by the router when EXIT/QUIT is reached."""


def parse_table_decl(decl: str) -> str:
    """``(id int, name varchar(30), ...)`` body → Spark DDL schema string.
    Column constraints (PRIMARY KEY / NOT NULL / UNIQUE, nanosql.g:350+)
    are accepted and dropped — parquet enforces none of them; VERIFY is
    the a-posteriori checker."""
    out = []
    for raw in _split_top_level_commas(decl):
        raw = raw.strip()
        if not raw or re.match(r"^(PRIMARY|FOREIGN|UNIQUE|CONSTRAINT)\b", raw, re.I):
            continue  # table-level constraint
        m = re.match(r"^(?P<col>\w+)\s+(?P<type>.+)$", raw, re.S)
        if not m:
            raise ValueError(f"unparseable column declaration: {raw!r}")
        col, typ = m.group("col"), m.group("type").strip()
        typ = re.sub(r"\b(PRIMARY\s+KEY|NOT\s+NULL|UNIQUE)\b.*$", "", typ, flags=re.I).strip()
        num = re.match(r"numeric\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", typ, re.I)
        if num:
            out.append(f"{col} decimal({num.group(1)},{num.group(2)})")
            continue
        for pat, spark_t in _TYPE_MAP:
            if spark_t is not None and pat.match(typ):
                out.append(f"{col} {spark_t}")
                break
        else:
            out.append(f"{col} {typ}")  # already a Spark type
    return ", ".join(out)


def _parens_balance(s: str) -> bool:
    """True when the leading '(' of ``s`` matches its FINAL ')' — i.e.
    stripping the outer pair is safe.  Quote-aware.  False for
    ``(SELECT ...) UNION ALL (SELECT ...)``, where the first paren closes
    mid-string and naive stripping would mangle the set operation."""
    depth, quote = 0, None
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if quote:
            if ch == "\\" and i + 1 < n:
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0 and i < n - 1:
                return False  # outer paren closed before the end
        i += 1
    return depth == 0


def _split_top_level_commas(s: str) -> list[str]:
    """Split on ',' outside parens AND outside single/double-quoted
    strings (honoring backslash escapes) — ``SET name = 'a,b', v = 2``
    must split into exactly two assignments."""
    parts, depth, quote, buf = [], 0, None, []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if quote:
            buf.append(ch)
            if ch == "\\" and i + 1 < n:
                buf.append(s[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


def _find_top_level_keyword(s: str, keyword: str) -> int:
    """Index of the first word-boundary ``keyword`` outside quotes and
    parens, or -1.  The quote/escape machinery matches
    ``_split_top_level_commas`` so ``SET c = 'a WHERE b'`` never splits
    inside the literal."""
    depth, quote = 0, None
    i, n, k = 0, len(s), len(keyword)
    while i < n:
        ch = s[i]
        if quote:
            if ch == "\\" and i + 1 < n:
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and s[i : i + k].upper() == keyword.upper():
            before_ok = i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")
            j = i + k
            after_ok = j >= n or not (s[j].isalnum() or s[j] == "_")
            if before_ok and after_ok:
                return i
        i += 1
    return -1


def _parse_update(stmt: str):
    """UPDATE t SET a=e, ... [WHERE e] → (name, {col: Column}, where
    Column) or None.  WHERE is located with the quote-aware scanner; the
    assignment bodies are parsed by Spark via F.expr."""
    m = _UPDATE.match(stmt)
    if not m:
        return None
    body = m.group("body")
    widx = _find_top_level_keyword(body, "WHERE")
    sets, where = (body, None) if widx < 0 else (body[:widx], body[widx + 5 :])
    assignments = {}
    for part in _split_top_level_commas(sets):
        col, expr = part.split("=", 1)
        assignments[col.strip()] = F.expr(expr.strip())
    if where is None:
        cond = F.lit(True)  # no WHERE clause: the grammar's full-table form
    elif where.strip():
        cond = F.expr(where)
    else:
        # a bare trailing WHERE is malformed — raising beats silently
        # rewriting every row as an unconditional update
        raise ValueError(f"UPDATE {m.group('name')}: empty WHERE clause")
    return m.group("name"), assignments, cond


def _parse_delete(stmt: str):
    """DELETE FROM t [WHERE e] → (name, where Column) or None."""
    m = _DELETE.match(stmt)
    if not m:
        return None
    body = m.group("body") or ""
    widx = _find_top_level_keyword(body, "WHERE")
    if widx < 0:
        if body.strip():
            return None  # trailing junk that isn't a WHERE clause
        return m.group("name"), F.lit(True)
    return m.group("name"), F.expr(body[widx + 5 :])


def route_statement(engine, stmt: str):
    """Dispatch one statement.  Returns a DataFrame (result set), None
    (effect-only statement), or ExitScript.  Falls through to
    ``spark.sql`` for everything ANSI."""
    spark: SparkSession = engine.spark

    if _EXIT.match(stmt):
        return ExitScript()
    if _CRASH.match(stmt):
        raise UnsupportedStatementError(
            "CRASH is scoped out (reference CrashCommand tests WAL recovery; "
            "Parquet+Spark has no WAL to recover)"
        )
    if _TXN.match(stmt):
        raise UnsupportedStatementError(
            "transactions are scoped out (BASELINE.json): Parquet storage has "
            "no WAL/lock manager; use a lakehouse table format for ACID"
        )

    m = _CREATE_STORE.match(stmt)
    if m:
        return _create_store(
            engine,
            m.group("name"),
            m.group("file") or m.group("file_bare"),
            m.group("decl"),
        )

    m = _CREATE_INDEX.match(stmt)
    if m:
        return _create_index(engine, m.group("name"), _table_list(m.group("cols")))

    m = _ANALYZE.match(stmt)
    if m:
        for t in _table_list(m.group("tables")):
            engine.analyze(t)
        return None

    m = _VERIFY.match(stmt)
    if m:
        return _verify_tables(engine, _table_list(m.group("tables")))

    m = _EXPORT.match(stmt)
    if m:
        fmt, cols, codec = _parse_export_clauses(m.group("rest"))
        return engine.export(
            m.group("name"), m.group("path"), fmt,
            partition_by=cols, compression=codec,
        )

    m = _IMPORT.match(stmt)
    if m:
        return engine.import_table(
            m.group("name"), m.group("path"),
            (m.group("fmt") or "parquet").lower(),
        )

    m = _OPTIMIZE.match(stmt)
    if m:
        for t in _table_list(m.group("tables")):
            path = engine.store_path(t)
            if path is None:
                raise UnsupportedStatementError(
                    f"OPTIMIZE {t}: not a dialect-created store (read-only "
                    "source tables are compacted by their owner)"
                )
            engine.optimize(path)
            _reload_store(engine, t, path)
        return None

    # EXPLAIN UPDATE/DELETE/INSERT (nanosql.g:711-719 allows DML under
    # EXPLAIN; Spark's parser doesn't for view-backed stores): build the
    # rewrite/append plan without executing it and return its formatted
    # physical plan as a one-column result set.  INSERT only takes this
    # path when the INSERT itself would (dialect-store / view-backed
    # target in the reference grammar's shape) — EXPLAIN INSERT on a real
    # catalog table, or any Spark-only form (INSERT OVERWRITE, qualified
    # names, TABLE source), falls through to spark.sql, mirroring the
    # execution routing so the explained plan is the plan that runs.
    m = _EXPLAIN_DML.match(stmt)
    if m:
        inner = m.group("inner")
        if not inner.upper().lstrip().startswith("INSERT"):
            return _explain_dml(engine, inner)
        mi = _INSERT.match(inner)
        if mi and _dialect_handles_insert(engine, mi.group("name")):
            return _explain_dml(engine, inner)
        return spark.sql(stmt)

    # UPDATE/DELETE: only when Spark SQL can't (plain parquet/temp-view
    # tables).  The WHERE/SET bodies are parsed by Spark via F.expr.
    parsed = _parse_update(stmt)
    if parsed and not _spark_handles_dml(engine, parsed[0]):
        from maple_spark.operators.dml import update_where

        name, assignments, cond = parsed
        return _mutate(engine, name, lambda df: update_where(df, cond, assignments))

    parsed = _parse_delete(stmt)
    if parsed and not _spark_handles_dml(engine, parsed[0]):
        from maple_spark.operators.dml import delete_where

        name, cond = parsed
        return _mutate(engine, name, lambda df: delete_where(df, cond))

    m = _INSERT.match(stmt)
    if m and _dialect_handles_insert(engine, m.group("name")):
        # dialect stores append parquet; view-backed tables re-register a
        # unioned view.  Real session-catalog tables fall through to
        # spark.sql, whose INSERT already handles every form natively.
        return _insert(
            engine,
            m.group("name"),
            _table_list(m.group("cols")) if m.group("cols") else None,
            m.group("values"),
            m.group("select"),
        )

    return spark.sql(stmt)


def _table_list(raw: str) -> list[str]:
    return [t.strip() for t in raw.split(",") if t.strip()]


def _dialect_handles_insert(engine, name: str) -> bool:
    """True when an INSERT targeting ``name`` takes the dialect path
    (parquet-append store or view-backed table, never a real session-
    catalog table).  ONE definition shared by the INSERT execution route
    and EXPLAIN INSERT, so the explained plan is always the plan that
    runs."""
    return not _is_spark_catalog_table(engine.spark, name) and (
        engine.store_path(name) is not None or engine.is_view_table(name)
    )


def _spark_handles_dml(engine, name: str) -> bool:
    """True when ``name`` is a table format with native Spark SQL DML (a
    v2/lakehouse table).  This engine's catalog is temp views + dialect
    stores + v1 managed parquet tables — none support UPDATE/DELETE in
    Spark SQL, so everything takes the rewrite path.  The hook exists so a
    Delta/Iceberg-backed deployment can flip it per table."""
    return False


def _build_dml_frame(engine, inner: str) -> DataFrame:
    """Build (don't execute) the read-transform frame for an UPDATE,
    DELETE, or INSERT statement — shared by EXPLAIN DML
    (nanosql.g:716-717 allows all three under EXPLAIN)."""
    from maple_spark.operators.dml import delete_where, update_where

    parsed = _parse_update(inner)
    if parsed:
        name, assignments, cond = parsed
        return update_where(engine.table(name), cond, assignments)
    parsed = _parse_delete(inner)
    if parsed:
        name, cond = parsed
        return delete_where(engine.table(name), cond)
    m = _INSERT.match(inner)
    if m:
        return _insert_frame(
            engine,
            m.group("name"),
            _table_list(m.group("cols")) if m.group("cols") else None,
            m.group("values"),
            m.group("select"),
        )
    raise ValueError(f"EXPLAIN: unparseable DML statement: {inner!r}")


def _explain_dml(engine, inner: str) -> DataFrame:
    """ExplainCommand parity for DML (ExplainCommand.java:26-29 prints the
    plan without running it): the rewrite's formatted physical plan, one
    line per row."""
    from maple_spark.plans import explain_str

    plan = explain_str(_build_dml_frame(engine, inner), "formatted")
    spark = engine.spark
    return spark.createDataFrame(
        [(line,) for line in plan.splitlines()], "plan string"
    )


def _create_index(engine, name: str, cols: list[str]) -> None:
    """CREATE INDEX (nanosql.g:426-448, CreateIndexCommand.java:76): the
    Parquet-native analog of a secondary index is *layout* — rewrite the
    store sorted (one column: range-sort → row-group min/max skipping) or
    Z-ordered (several columns: min/max pruning on each at once).  Only
    dialect-created stores can be rewritten; the driver's source tables
    are read-only by contract."""
    path = engine.store_path(name)
    if path is None:
        raise UnsupportedStatementError(
            f"CREATE INDEX ON {name}: only dialect-created stores can be "
            "re-laid-out; source tables are read-only (sort/Z-order them at "
            "ingest with csv_to_parquet/zorder_write)"
        )
    df = engine.table(name)
    if len(cols) == 1:
        out = (
            df.repartitionByRange(8, cols[0]).sortWithinPartitions(cols[0])
        ).localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(path)
        _reload_store(engine, name, path)
    else:
        from maple_spark.sources.layout import zorder_write

        staged = df.localCheckpoint(eager=True)
        zorder_write(staged, path, cols)
        _reload_store(engine, name, path)
    return None


def _create_store(engine, name: str, filename: str, decl: str) -> None:
    """CREATE STORE/COLSTORE ... FROM 'file' (cols): ingest the CSV with
    the declared schema into the engine warehouse, register the view.
    Relative paths resolve against the PYTHON process working dir (the
    reference resolves file_name against its server dir); Spark's JVM
    would otherwise resolve them against its own start dir."""
    from maple_spark.sources.ingest import csv_to_parquet

    if not os.path.isabs(filename) and "://" not in filename:
        filename = os.path.abspath(filename)

    schema = parse_table_decl(decl)
    out_path = os.path.join(engine.warehouse, name)
    df = csv_to_parquet(engine.spark, filename, out_path, schema=schema)
    engine.register_store(name, out_path, df)
    return None


def _reload_store(engine, name: str, path: str) -> None:
    df = engine.spark.read.parquet(path)
    engine.register_store(name, path, df)


def _verify_tables(engine, tables: list[str]) -> DataFrame:
    """Full-scan integrity check per table: parquet CRC/footer validation
    happens in the reader; the row count proves every row group decodes."""
    spark = engine.spark
    reports = []
    for t in tables:
        df = engine.table(t)
        n = df.count()
        reports.append((t, n, "ok"))
    return spark.createDataFrame(reports, "table_name string, n_rows long, status string")


def _is_spark_catalog_table(spark: SparkSession, name: str) -> bool:
    """True when ``name`` resolves to a REAL session-catalog table (managed
    or external), not a temp view.  Temp views take lookup precedence in
    Spark, so when one exists the catalog reports TEMPORARY and DML must
    go through the engine's view/store machinery — silently shadowing a
    catalog table with a mutated temp view would make later spark.sql
    INSERTs invisible."""
    try:
        t = spark.catalog.getTable(name)
    except Exception:
        return False
    return (t.tableType or "").upper() not in ("TEMPORARY", "VIEW")


def _mutate(engine, name: str, transform) -> None:
    """Read → transform → rewrite.  Dialect stores rewrite their parquet
    path (staging via localCheckpoint so the read completes before the
    overwrite); session-catalog tables are rewritten IN PLACE with an
    overwrite insertInto (never shadowed by a temp view — a later
    spark.sql INSERT must stay visible); view-only tables re-register the
    transformed view (in-session mutation, source files untouched — the
    testdata contract)."""
    df = engine.table(name)
    out = transform(df)
    path = engine.store_path(name)
    if path is not None:
        materialized = out.localCheckpoint(eager=True)
        materialized.write.mode("overwrite").parquet(path)
        _reload_store(engine, name, path)
    elif _is_spark_catalog_table(engine.spark, name):
        materialized = out.localCheckpoint(eager=True)  # read before truncate
        materialized.write.insertInto(name, overwrite=True)
    else:
        engine.replace_view(name, out)
    return None


def _insert(
    engine,
    name: str,
    cols: list[str] | None,
    values: str | None,
    select: str | None,
) -> None:
    """INSERT INTO t [(cols)] VALUES (...), ... | SELECT ...
    (nanosql.g:613-642; InsertCommand.java:41,160-185 — the reference
    accepts the column list and the SELECT form).  The rows-to-append
    frame comes from :func:`_insert_frame`; the result lands as a parquet
    append (stores) or a unioned view (view-backed tables)."""
    full = _insert_frame(engine, name, cols, values, select)
    path = engine.store_path(name)
    if path is not None:
        # staging break: INSERT ... SELECT may read the very store it
        # appends to — materialize before touching the target path
        materialized = full.localCheckpoint(eager=True)
        materialized.write.mode("append").parquet(path)
        _reload_store(engine, name, path)
    else:
        engine.replace_view(name, engine.table(name).unionByName(full))
    return None


def _insert_frame(
    engine,
    name: str,
    cols: list[str] | None,
    values: str | None,
    select: str | None,
) -> DataFrame:
    """Build (don't write) the rows-to-append frame for an INSERT:
    values/query columns map positionally onto ``cols`` (default: the
    full schema), every expression is parsed/cast by Spark SQL itself,
    unlisted columns fill with NULL, output order follows the table
    schema.  Shared by :func:`_insert` and EXPLAIN INSERT."""
    spark = engine.spark
    target = engine.table(name)
    tcols = target.columns
    if cols is None:
        cols = list(tcols)
    else:
        unknown = [c for c in cols if c not in tcols]
        if unknown:
            raise ValueError(f"INSERT INTO {name}: unknown columns {unknown}")

    def cast_to(colname: str, expr_sql: str) -> str:
        t = target.schema[colname].dataType.simpleString()
        return f"CAST(({expr_sql}) AS {t}) AS {colname}"

    if values is not None:
        row_selects = []
        for tup in _split_top_level_commas(values):
            tup = tup.strip()
            if not (tup.startswith("(") and tup.endswith(")")):
                raise ValueError(f"malformed VALUES tuple: {tup!r}")
            exprs = _split_top_level_commas(tup[1:-1])
            if len(exprs) != len(cols):
                raise ValueError(
                    f"INSERT INTO {name}: {len(exprs)} values for "
                    f"{len(cols)} columns"
                )
            row_selects.append(
                "SELECT "
                + ", ".join(cast_to(c, e.strip()) for e, c in zip(exprs, cols))
            )
        new_rows = spark.sql(" UNION ALL ".join(row_selects))
    else:
        sel = select.strip()
        if sel.startswith("(") and sel.endswith(")") and _parens_balance(sel):
            sel = sel[1:-1].strip()
        src = spark.sql(sel)
        if len(src.columns) != len(cols):
            raise ValueError(
                f"INSERT INTO {name}: query returns {len(src.columns)} "
                f"columns for {len(cols)} target columns"
            )
        new_rows = src.select(
            *[
                F.col(s).cast(target.schema[c].dataType).alias(c)
                for s, c in zip(src.columns, cols)
            ]
        )
    # unlisted columns fill with NULL; order follows the table schema
    return new_rows.select(
        *[
            F.col(c) if c in cols else F.lit(None).cast(target.schema[c].dataType).alias(c)
            for c in tcols
        ]
    )
