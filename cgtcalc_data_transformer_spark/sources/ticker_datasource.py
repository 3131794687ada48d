"""Spark 4 STREAMING Python DataSource: a deterministic tick source.

The streaming counterpart of ``eml_datasource.py`` (batch Python
DataSource): the pluggable-source API's stream reader
(``SimpleDataSourceStreamReader``) with real offset tracking —
``initialOffset`` / ``read(start)`` advancing a cursor /
``readBetweenOffsets`` replaying a committed range for recovery.
This is the extension point a custom feed (an internal queue, a
paginated HTTP API, a change feed) plugs into when no built-in
source fits; everything downstream stays declarative.

The tick stream itself is a pure function of the offset — row i is
``(i, i % NUM_BUCKETS, (i*37 % 1000)/10)`` — so replay is exact
(the at-least-once contract ``readBetweenOffsets`` exists for), the
bounded run is reproducible, and the batch twin / DuckDB oracle can
recompute the identical rows from ``range()``.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

TOTAL_TICKS = 1000   # bounded stream: read() stops advancing here
TICKS_PER_BATCH = 128
NUM_BUCKETS = 8


def tick_row(i: int) -> tuple:
    return (i, i % NUM_BUCKETS, (i * 37 % 1000) / 10.0)


class TickerStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.total = int(options.get("totalTicks", TOTAL_TICKS))
        self.per_batch = int(options.get("ticksPerBatch", TICKS_PER_BATCH))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.per_batch, self.total)
        # iter(list), not a bare generator: the prefetch cache pickles
        # the batch to ship it executor-side, and probes exhaustion with
        # next() when the offset stops advancing
        return iter([tick_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # exact replay: rows are a pure function of the offset range
        return iter([tick_row(i) for i in range(int(start["next"]), int(end["next"]))])


class TickerDataSource(DataSource):
    """``spark.readStream.format("ticker").load()`` →
    (tick_id, bucket, value)."""

    @classmethod
    def name(cls) -> str:
        return "ticker"

    def schema(self) -> str:
        return "tick_id bigint, bucket bigint, value double"

    def simpleStreamReader(self, schema) -> TickerStreamReader:
        return TickerStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TickerDataSource)
