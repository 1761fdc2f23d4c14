"""Custom Python data source: deterministic synthetic event generator.

Reference analog: the reference's only sources are CSV loads
(``commands/LoadFileCommand.java:35-60``, SURVEY.md §2.1 S5-S7).  This
adds the Spark-4 Python DataSource surface — the extension point a user
reaches for when the data ISN'T files: service backfills, load tests,
synthetic corpora, or custom protocols.  One class gives both the batch
reader (partition-parallel) and a streaming reader (offset cursor +
exact range replay + ``commit`` — via ``SimpleDataSourceStreamReader``,
the API where the engine OWNS the cursor; see _StreamReader's docstring
for the measured duplicate-replay bug that rules out reader-local
cursor state in the full API).

Scale design: every partition generates its slice independently from
(seed, row-id) arithmetic — no driver-side data, no RNG state to
coordinate, so 1000 executors generate 1000 slices concurrently and a
re-read (or a replayed micro-batch) reproduces byte-identical rows.
That replayability is what makes the stream source exactly-once under
checkpoint recovery: offsets name row ranges, and row ranges always
regenerate the same rows.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double"
)

_TYPES = ("click", "view", "purchase", "error")
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _mix(seed: int, i: int) -> int:
    """Deterministic 64-bit mix (splitmix64 finalizer) of (seed, row id)."""
    z = (seed * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _row(seed: int, gid: int, n_users: int):
    h = _mix(seed, gid)
    return (
        gid,
        _EPOCH + timedelta(seconds=gid * 7 + (h & 0x3F)),
        h % n_users,
        _TYPES[(h >> 8) % len(_TYPES)],
        round(((h >> 16) & 0xFFFF) / 655.36, 4),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_users = int(options.get("n_users", 50))
        self.seed = int(options.get("seed", 42))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        if self.n_rows <= 0:  # empty source: zero partitions, not range(0,0,0)
            return [_RangePartition(0, 0)]
        step = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(i, min(i + step, self.n_rows))
            for i in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        for gid in range(partition.start, partition.end):
            yield _row(self.seed, gid, self.n_users)


class _StreamReader(SimpleDataSourceStreamReader):
    """Offsets are row counts; each micro-batch serves the next
    ``rows_per_batch`` ids.  Because rows derive from (seed, id), any
    replayed (start, end) range regenerates identical rows — the property
    checkpoint recovery needs from a source.

    WHY the Simple reader API (bug found by
    test_python_datasource_stream_checkpoint_recovery): the first
    implementation was a full ``DataSourceStreamReader`` that rate-limited
    by ADVANCING a reader-local cursor in ``latestOffset``.  A restarted
    query builds a FRESH reader (cursor 0) while the checkpoint's offset
    log is already at N; ``latestOffset`` then returns a BACKWARDS offset,
    Spark does not order-check Python-source offsets (opaque dicts), logs
    the backwards batch, and every already-served row between the new
    cursor and N is replayed — measured: a 300-row stream stopped at 240
    re-emitted rows 60-239 as duplicates.  And the full API has NO hook
    that hands the recovered position to a fresh reader before its first
    ``latestOffset`` (the runner only ever calls initialOffset /
    latestOffset / partitions / commit — ``deserializeOffset`` is never
    invoked; offsets travel as raw JSON), so reader-local rate-limit
    state is UNRECOVERABLE there by construction.  This API is the one
    built for cursor-from-engine sources: Spark passes the recovered
    offset INTO ``read(start)``, the next offset derives from it, and a
    restart cannot go backwards.  Trade-off, documented: the wrapper
    prefetches each micro-batch on the driver — bounded by
    ``rows_per_batch``, the right cost model for a rate-limited control
    stream (replay of committed ranges runs ``readBetweenOffsets`` on
    executors; bulk generation at scale is the BATCH reader's job, which
    stays partition-parallel)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 500))
        self.n_users = int(options.get("n_users", 50))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start: dict):
        lo = start["offset"]
        # the cursor must be MONOTONE even when the recovered offset
        # exceeds max_rows (a restart with a smaller max_rows than the
        # run that wrote the checkpoint): min() alone would hand Spark a
        # BACKWARDS offset — it doesn't order-check Python-source
        # offsets, so the next batch would re-serve every row between
        # the clamped cursor and the checkpoint as duplicates (the same
        # bug class as the reader-local-cursor design this API replaced;
        # pinned by test_pyds_stream_exhaustion_is_stable)
        hi = max(lo, min(lo + self.rows_per_batch, self.max_rows))
        return (
            iter([_row(self.seed, gid, self.n_users) for gid in range(lo, hi)]),
            {"offset": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        # exact replay of a committed range (executor-side on recovery)
        for gid in range(start["offset"], end["offset"]):
            yield _row(self.seed, gid, self.n_users)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("maple_synth_events")`` / ``readStream`` —
    register with ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "maple_synth_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)
