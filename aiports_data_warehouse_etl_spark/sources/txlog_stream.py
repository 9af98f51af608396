"""Streaming CHANGE-FEED source over a transaction-log table — the
Spark 4 Python Data Source streaming API with the txlog commit log as
the offset space.

``spark.readStream.format("txlog_cdf").option("path", <table>)``
emits every row inserted or deleted by each commit, tagged
``_change_type`` ('insert'/'delete') and ``_commit_version`` — the
streaming twin of ``TxLogTable.changes()`` — so downstream pipelines
(micro-batch ETL into a warehouse, incremental index maintenance,
cache invalidation) consume the curated layer INCREMENTALLY instead
of rescanning snapshots. This is the Load.py dataset-trigger analogue
upgraded to row-level CDC.

Offset design: an offset is simply the last-consumed log VERSION.
Commits are immutable and totally ordered, so
``readBetweenOffsets(v0, v1)`` (Spark's replay path when a batch must
be reconstructed after a failure before its offset committed)
re-reads exactly the commits in (v0, v1] and reproduces the lost
batch byte-for-byte — exactly-once composes with any idempotent or
transactional sink. Data files referenced by old commits stay
readable until vacuum; a replay past the retention window raises
loudly rather than returning a silent hole.

Reader mechanics: SimpleDataSourceStreamReader.read() runs on the
DRIVER and yields plain tuples; files are decoded with pyarrow (no
Spark job for the prefetch batch). That bounds per-trigger volume to
driver-friendly sizes — set ``versions_per_batch`` (default 10)
accordingly; the firehose-scale alternative is the partition-planning
DataSourceStreamReader, which this reader's offset scheme would port
to unchanged.

Commit handling mirrors ``TxLogTable.changes()``: compact commits are
pure layout (skipped); copy-on-write rewrites surface as
delete(old file rows) + insert(new file rows); ``delete_dv`` commits
emit exactly the rows their deletion vector addresses (row-position
lookup inside each target file).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

_LOG_DIR = "_txlog"


def _latest_version(path: str) -> int:
    best = -1
    log_dir = os.path.join(path, _LOG_DIR)
    if not os.path.isdir(log_dir):
        return best
    for name in os.listdir(log_dir):
        if name.endswith(".json") and not name.endswith(".checkpoint.json"):
            best = max(best, int(name.split(".")[0]))
    return best


def _read_commit(path: str, version: int) -> dict:
    fname = f"{version:020d}.json"
    with open(os.path.join(path, _LOG_DIR, fname)) as fh:
        return json.load(fh)


def _table_fields(path: str) -> list[tuple[str, str]]:
    """(name, DDL type) pairs of the table schema at the stream start,
    resolved from the newest commit that recorded a schema."""
    from pyspark.sql import types as T

    for v in range(_latest_version(path), -1, -1):
        c = _read_commit(path, v)
        if c.get("schema"):
            st = T.StructType.fromJson(json.loads(c["schema"]))
            return [(f.name, f.dataType.simpleString()) for f in st.fields]
    raise ValueError(f"txlog table {path} has no schema-bearing commits")


class _TxLogCDFReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.per_batch = int(options.get("versions_per_batch", 10))
        # start AFTER this version (default: from the beginning)
        self.start = int(options.get("start_version", -1))
        self.fields = [name for name, _ in _table_fields(self.path)]

    def initialOffset(self) -> dict:
        return {"v": self.start}

    def read(self, start: dict):
        v0 = int(start["v"])
        v1 = min(v0 + self.per_batch, _latest_version(self.path))
        if v1 <= v0:
            return iter([]), {"v": v0}
        return iter(list(self._rows(v0, v1))), {"v": v1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(int(start["v"]), int(end["v"]))))

    # -- commit decoding (driver-side, pyarrow) -------------------------

    def _file_tuples(self, rel: str, rows_idx=None):
        """Rows of one data file as schema-aligned tuples (missing
        columns None — the mergeSchema additive-evolution contract);
        ``rows_idx`` restricts to the given sorted row positions."""
        import pyarrow.parquet as pq

        abs_path = os.path.join(self.path, rel)
        if not os.path.exists(abs_path):
            raise ValueError(
                f"txlog_cdf: {rel} was vacuumed — the change feed "
                "cannot be reconstructed past the retention window"
            )
        tbl = pq.read_table(abs_path)
        if rows_idx is not None:
            tbl = tbl.take(rows_idx)
        cols = {}
        for name in self.fields:
            if name in tbl.column_names:
                cols[name] = tbl.column(name).to_pylist()
            else:
                cols[name] = [None] * tbl.num_rows
        for i in range(tbl.num_rows):
            yield tuple(cols[name][i] for name in self.fields)

    def _rows(self, v0: int, v1: int):
        for v in range(v0 + 1, v1 + 1):
            c = _read_commit(self.path, v)
            op = c.get("op")
            if op == "compact":
                continue  # pure layout: no row changes
            if op == "delete_dv":
                import pyarrow.parquet as pq

                dv_abs = os.path.join(self.path, c["dv_file"])
                if not os.path.exists(dv_abs):
                    raise ValueError(
                        f"txlog_cdf: {c['dv_file']} was vacuumed — the "
                        "change feed cannot be reconstructed past the "
                        "retention window"
                    )
                dv = pq.read_table(dv_abs)
                by_file: dict[str, list[int]] = {}
                for rel, idx in zip(
                    dv.column("file_rel").to_pylist(),
                    dv.column("row_index").to_pylist(),
                ):
                    by_file.setdefault(rel, []).append(int(idx))
                for rel in sorted(by_file):
                    for row in self._file_tuples(rel, sorted(by_file[rel])):
                        yield row + ("delete", v)
                continue
            for rel in sorted(c.get("remove", [])):
                for row in self._file_tuples(rel):
                    yield row + ("delete", v)
            for add in c.get("add", []):
                for row in self._file_tuples(add["path"]):
                    yield row + ("insert", v)


class TxLogChangeFeedSource(DataSource):
    """``spark.readStream.format("txlog_cdf").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "txlog_cdf"

    def schema(self) -> str:
        fields = _table_fields(self.options["path"])
        cols = ", ".join(f"{n} {t}" for n, t in fields)
        return f"{cols}, _change_type string, _commit_version bigint"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _TxLogCDFReader(self.options)


def register_txlog_cdf(spark) -> None:
    """Idempotent registration of the change-feed source."""
    spark.dataSource.register(TxLogChangeFeedSource)
