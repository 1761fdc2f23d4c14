"""TCP query server — the SharedServer entry point re-expressed.

Reference analog (SURVEY.md §3.2): ``server/SharedServer.main`` accepts
socket connections, reads SQL commands, executes them against the shared
engine, and streams result tuples back through ``TupleSender``.  Here the
wire format is newline-delimited JSON (one request line in, one response
line out) over a threaded socket server, executing against a shared
:class:`maple_spark.engine.MapleEngine`.

Request:  ``{"sql": "SELECT ...", "limit": 1000}``
Response: ``{"ok": true, "columns": [...], "rows": [[...], ...],
            "truncated": false}`` or ``{"ok": false, "error": "..."}``

Scale notes: a SparkSession is driver-side — many clients share ONE
session (Spark serializes job scheduling fairly across threads; set
``spark.scheduler.mode=FAIR`` for interactive mixes).  Results stream to
the client via ``toLocalIterator`` so the driver never materializes more
than ``limit`` rows per request — the reference's TupleSender contract
(send tuples as produced, don't buffer the result set).  A production
deployment would put Spark Connect or the Thrift server here; this
implements the same protocol shape with stdlib only.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading

from maple_spark.engine import MapleEngine

MAX_DEFAULT_ROWS = 1000


def _json_safe(v):
    """Collected Spark values → JSON-encodable (str for the exotic)."""
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    return v


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # one connection, many request lines
        engine: MapleEngine = self.server.engine  # type: ignore[attr-defined]
        for raw in self.rfile:
            if not raw.strip():
                continue
            try:
                # decode STRICTLY, inside the error boundary: invalid
                # UTF-8 must produce an ok:false response line — not a
                # dropped connection, and NOT errors='replace', which
                # would silently mangle a byte inside an otherwise-valid
                # JSON line into U+FFFD and execute the corrupted query
                # with ok:true (review finding, round 10)
                req = json.loads(raw.decode("utf-8").strip())
                limit = int(req.get("limit", MAX_DEFAULT_ROWS))
                # dialect router: same statement surface as the REPL and
                # execute_script (reference parity across all §3 entry
                # points); EXIT closes this connection's loop
                from maple_spark.dialect import ExitScript, route_statement

                # Routing is serialized across handler threads: dialect
                # DML is read-transform-replace on shared engine state
                # (temp views, _tables/_store_paths), so two concurrent
                # UPDATEs on one table would both read the same base plan
                # and the second replace_view would silently drop the
                # first one's update.  The reference runs commands
                # single-threaded too.  Result STREAMING below stays
                # outside the lock — reads can overlap.
                with self.server.route_lock:  # type: ignore[attr-defined]
                    df = route_statement(engine, req["sql"])
                if isinstance(df, ExitScript):
                    self.wfile.write(
                        (json.dumps({"ok": True, "bye": True}) + "\n").encode()
                    )
                    return
                rows, truncated = [], False
                if df is not None:
                    # stream rows; stop at limit instead of collecting the
                    # full result on the driver (TupleSender contract)
                    for row in df.limit(limit + 1).toLocalIterator():
                        if len(rows) == limit:
                            truncated = True
                            break
                        rows.append([_json_safe(v) for v in row])
                resp = {
                    "ok": True,
                    "columns": df.columns if df is not None else [],
                    "rows": rows,
                    "truncated": truncated,
                }
            except Exception as exc:  # noqa: BLE001 — wire boundary
                resp = {"ok": False, "error": f"{type(exc).__name__}: {exc}"}
            self.wfile.write((json.dumps(resp) + "\n").encode("utf-8"))
            self.wfile.flush()


class QueryServer(socketserver.ThreadingTCPServer):
    """Threaded TCP server bound to a shared MapleEngine."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, engine: MapleEngine, host: str = "127.0.0.1", port: int = 0):
        super().__init__((host, port), _Handler)
        self.engine = engine
        self.route_lock = threading.Lock()

    @property
    def port(self) -> int:
        return self.server_address[1]

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t


def query_once(host: str, port: int, sql: str, limit: int = MAX_DEFAULT_ROWS) -> dict:
    """Minimal client: send one request line, read one response line."""
    with socket.create_connection((host, port), timeout=120) as s:
        f = s.makefile("rwb")
        f.write((json.dumps({"sql": sql, "limit": limit}) + "\n").encode())
        f.flush()
        return json.loads(f.readline().decode("utf-8"))
