"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic event-log generator.

The reference ingests fixed CSV drops; a warehouse team also needs
load-generation / backfill sources that produce the SAME rows on every
run, any partitioning. This source derives every field from the row
index with pure integer arithmetic — no RNG state, so the output is
reproducible across engines (the contract oracle recomputes it in SQL)
and across retries of a lost partition (important at scale: a task
re-run must not invent different data).

Partition-parallel: `partitions()` splits the index range into strided
slices, so a 1000-executor cluster generates 1000 slices concurrently
with zero coordination.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Deterministic field derivations (all int64-safe for rows < ~3e9):
#   user_id  = (i * KNUTH) % N_USERS        — multiplicative scatter
#   value    = ((i * LCG) % 10_000) / 100.0 — two-decimal "amount"
#   kind     = cyclic over the event vocabulary
KNUTH = 2654435761
LCG = 48271
N_USERS = 97
KINDS = ("click", "view", "purchase", "signup", "error")


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 4))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        # Vectorized: one Arrow RecordBatch per partition slice instead
        # of row-at-a-time tuples through the Python worker (measured:
        # 4.5 s → sub-second for a 5k-row scan; the gap scales with
        # row count). numpy int64 math matches the int-arithmetic spec
        # exactly — all products stay below 2^63 for rows < ~3e9.
        import numpy as np
        import pyarrow as pa

        i = np.arange(
            partition.value, self.rows, self.num_partitions, dtype=np.int64
        )
        kinds = np.array(KINDS)[(i % len(KINDS))]
        yield pa.RecordBatch.from_pydict(
            {
                "event_id": pa.array(i),
                "user_id": pa.array((i * KNUTH) % N_USERS),
                "kind": pa.array(kinds, type=pa.string()),
                "value": pa.array(((i * LCG) % 10_000) / 100.0),
            }
        )


def _rows_between(i0: int, i1: int):
    """Deterministic rows for index range [i0, i1) — the same integer
    derivations as the batch reader, so batch scan, first stream pass
    and offset-range REPLAY all produce identical bytes."""
    for i in range(i0, i1):
        yield (
            i,
            (i * KNUTH) % N_USERS,
            KINDS[i % len(KINDS)],
            ((i * LCG) % 10_000) / 100.0,
        )


class _SyntheticEventsSimpleStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic row space.

    Offsets are plain row indices, so `readBetweenOffsets` (the
    recovery path Spark calls when a batch must be REPLAYED after a
    failure before its offset commits) regenerates exactly the rows
    the lost batch contained — the determinism the batch reader
    guarantees across task retries, extended to streaming recovery.
    A `rows` cap makes the stream finite: read() past the cap returns
    an empty iterator with an unchanged offset, which lets
    processAllAvailable()/availableNow drain and stop."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.batch = int(options.get("batch", 100))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i0 = int(start["i"])
        i1 = min(i0 + self.batch, self.rows)
        # a LIST-iterator, not a generator: Spark copy.copy()s the
        # prefetched batch in its offset cache (replay-before-commit),
        # and generators are neither copyable nor picklable
        return iter(list(_rows_between(i0, i1))), {"i": i1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_rows_between(int(start["i"]), int(end["i"]))))


class SyntheticEventsSource(DataSource):
    """`spark.read.format("synthetic_events").option("rows", N)` — and
    `spark.readStream` with the same options for the micro-batch form
    (`batch` rows per trigger)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, kind string, value double"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SyntheticEventsSimpleStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SyntheticEventsSource)
