"""Native exactly-once streaming SINK for the transaction-log table
(Spark 4 Python Data Source write API):

    df.writeStream.format("txlog") \\
      .option("path", "/warehouse/events_t") \\
      .option("checkpointLocation", ckpt).start()

The foreachBatch sink (``TxLogTable.write_stream``) routes every
micro-batch through a SECOND Spark action on the driver's batch
DataFrame. This sink is the one-pass, executor-parallel path: each
write task streams its partition's Arrow record batches STRAIGHT into
a staged parquet file (the same marker-first staging protocol as
``TxLogTable._stage``, so vacuum can never reap an in-flight file),
and the driver's ``commit()`` folds every task's add-action into ONE
atomic log commit carrying an (app, batchId) transaction marker.

Identity contract (the Delta ``txnAppId`` rule): the idempotence key
is ``(txn_app, batchId)`` and batch ids restart at 0 per checkpoint —
so EACH INDEPENDENT QUERY writing the same table must set its own
``.option("txn_app", ...)``; the default (derived from the table
path) is only safe for a single logical stream per table. A second
query left on the default would have its batch 0 silently swallowed
by the first query's marker.

Exactly-once story, same contract as ``append_batch_txn``:
- a replayed batch (crash between sink commit and Spark's offset
  checkpoint) finds its marker already in the log → the re-staged
  files are reclaimed immediately and the commit is a no-op;
- a failed batch never commits — ``abort()`` (and vacuum, for a
  driver that died before abort) reclaims the staged files;
- CHECK constraints are validated on the STAGED files before the
  commit lands, so the write-time contract holds on this path too
  (a violating micro-batch leaves no trace but the reclaimed stage).

At 100 TB this is the shape that matters: N executor tasks write N
parquet files with zero driver involvement in the data path; the
driver touches only JSON metadata + one bounded validation scan.

Reference parity: the reference's loads append/overwrite raw CSVs
with no atomicity (`dags/Load.py:17-23`); this sink is the
log-structured, exactly-once replacement for its streaming twin.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

_LOG_DIR = "_txlog"
_STAGING_DIR = "_staging"


@dataclass
class _TxLogCommitMessage(WriterCommitMessage):
    """One task's staged output: add-actions + its staging token."""

    adds: list = field(default_factory=list)
    token: str | None = None


class _TxLogStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options: dict, schema) -> None:
        self.path = options["path"]
        self.app = options.get("txn_app", f"txlog_sink:{self.path}")
        self.schema_json = schema.json()
        # The sink's write schema is frozen at STREAM START, so a
        # rename/drop epoch bump landing any time during the stream's
        # life makes every later staged file carry stale physical
        # names. The per-commit policy inspection below only sees the
        # window since its own snapshot; this start marker lets each
        # commit scan (incrementally) for rename commits since stream
        # start and fail the stream for a restart — Delta's
        # schema-change-stops-the-stream behavior.
        from aiports_data_warehouse_etl_spark.sources.txlog import (
            TxLogTable,
        )

        self._rename_checked_upto = TxLogTable(
            None, self.path
        ).latest_version()

    # -- executors: Arrow batches -> one staged parquet file per task --

    def write(self, iterator) -> _TxLogCommitMessage:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from aiports_data_warehouse_etl_spark.sources.txlog import (
            _file_stats,
        )

        batches = [b for b in iterator if b.num_rows > 0]
        if not batches:
            return _TxLogCommitMessage()  # empty task: nothing staged
        token = uuid.uuid4().hex
        # marker BEFORE data — the concurrent-writer protocol vacuum
        # relies on (see TxLogTable._stage)
        os.makedirs(os.path.join(self.path, _STAGING_DIR), exist_ok=True)
        with open(
            os.path.join(self.path, _STAGING_DIR, token), "w"
        ) as fh:
            json.dump({"token": token, "ts": time.time_ns()}, fh)
        rel_dir = os.path.join("data", token)
        abs_dir = os.path.join(self.path, rel_dir)
        os.makedirs(abs_dir)
        rel = os.path.join(rel_dir, "part-00000.parquet")
        abs_path = os.path.join(self.path, rel)
        pq.write_table(pa.Table.from_batches(batches), abs_path)
        return _TxLogCommitMessage(
            adds=[{"path": rel, "stats": _file_stats(abs_path)}],
            token=token,
        )

    # -- driver: fold task stages into ONE idempotent commit -----------

    def _reclaim(self, messages) -> None:
        """Delete staged dirs + markers for a no-op/aborted batch."""
        for m in messages:
            if m is None or not m.token:
                continue
            shutil.rmtree(
                os.path.join(self.path, "data", m.token),
                ignore_errors=True,
            )
            try:
                os.remove(os.path.join(self.path, _STAGING_DIR, m.token))
            except OSError:
                pass

    def _validate_staged(self, adds: list[dict], constraints: dict) -> None:
        """CHECK validation WITHOUT a SparkSession: the Python
        streaming write API runs ``commit()`` in a plain Python worker
        on the driver host (no JVM handle), so the staged files are
        validated with an in-process DuckDB scan instead — same ANSI
        semantics as ``TxLogTable._validate_constraints`` (NULL
        passes, only FALSE violates), one aggregation pass for all
        constraints. Constraint SQL must therefore be ANSI-portable;
        a dialect mismatch raises loudly (fail-shut, never
        fail-open)."""
        import duckdb

        from aiports_data_warehouse_etl_spark.sources.txlog import (
            ConstraintViolation,
        )

        files = [os.path.join(self.path, a["path"]) for a in adds]
        exprs = ", ".join(
            f"sum(CASE WHEN NOT coalesce(({sql}), TRUE) THEN 1 ELSE 0 "
            f'END) AS "{name}"'
            for name, sql in sorted(constraints.items())
        )
        row = duckdb.connect().execute(
            f"SELECT {exprs} FROM read_parquet(?)", [files]
        ).fetchone()
        bad = {
            name: int(n or 0)
            for name, n in zip(sorted(constraints), row)
            if (n or 0) > 0
        }
        if bad:
            detail = ", ".join(
                f"{name} ({n} rows violate: {constraints[name]!r})"
                for name, n in sorted(bad.items())
            )
            raise ConstraintViolation(
                f"write rejected by CHECK constraints: {detail}"
            )

    def commit(self, messages, batchId: int) -> None:
        from aiports_data_warehouse_etl_spark.sources.txlog import (
            TxConflict,
            TxLogTable,
        )

        adds = [a for m in messages if m is not None for a in m.adds]
        if not adds:
            return  # empty micro-batch: nothing to commit or replay
        # spark=None: every operation on this path (txn scan, snapshot
        # fold, atomic commit) is pure JSON metadata — no data read
        t = TxLogTable(None, self.path)
        if t.txn_seen(self.app, int(batchId)):
            # replayed batch: the original commit already holds these
            # rows — reclaim this attempt's stage and no-op
            self._reclaim(messages)
            return
        snap = t._snapshot()
        # rename/drop since STREAM START (not just since this batch's
        # snapshot): staged files carry the stream-start physical
        # names, so any epoch bump in the stream's lifetime means this
        # and every later batch would land stale names under the new
        # epoch. Incremental scan — each commit only reads the log
        # suffix it hasn't inspected yet.
        for i in range(self._rename_checked_upto + 1, snap["version"] + 1):
            if t._read_commit(i).get("op") == "rename_column":
                self._reclaim(messages)
                raise TxConflict(
                    f"txlog sink: column rename/drop at table version "
                    f"{i} during the stream's lifetime — the sink's "
                    "write schema is stale; restart the stream"
                )
        self._rename_checked_upto = snap["version"]
        if snap.get("identity"):
            # id assignment needs reservation + a Spark job; the sink's
            # commit worker has neither — fail shut, point at the
            # foreachBatch sink which routes through append_batch_txn
            self._reclaim(messages)
            raise ValueError(
                "txlog sink: table has GENERATED ALWAYS AS IDENTITY "
                f"column(s) {sorted(snap['identity'])} — use "
                "TxLogTable.write_stream (foreachBatch) for identity "
                "tables; this sink cannot assign ids"
            )
        checks = dict(snap["constraints"])
        for name, expr in snap.get("generated", {}).items():
            # generated columns validate as equality CHECKs here; the
            # sink cannot COMPUTE them post-staging (files are
            # immutable), so a stream that omits the column is refused
            # by the scan erroring on the missing name — fail-shut
            checks[f"__generated_{name}"] = (
                f"{name} IS NOT DISTINCT FROM ({expr})"
            )
        if checks:
            try:
                self._validate_staged(adds, checks)
            except Exception:
                self._reclaim(messages)
                raise
        commit = {
            "op": "append",
            "add": adds,
            "schema": self.schema_json,
            "txn_app": self.app,
            "txn_id": int(batchId),
        }
        for _ in range(20):
            v = t.latest_version() + 1
            # same rebase discipline as TxLogTable.append: a
            # concurrent rename/constraint/identity/protocol commit
            # since the policy snapshot invalidates this batch's
            # staged file or its validation — fail shut, the stream
            # restarts the batch against fresh state (ADVICE r6 #2)
            bad = t._append_policy_conflict(snap["version"], v - 1)
            if bad is not None:
                self._reclaim(messages)
                raise TxConflict(
                    f"txlog sink: concurrent schema/policy commit "
                    f"{bad} since the batch's policy snapshot"
                )
            if t._try_commit(v, commit):
                return
            if t.txn_seen(self.app, int(batchId)):
                self._reclaim(messages)  # a concurrent replay won
                return
        self._reclaim(messages)
        raise TxConflict("txlog sink lost 20 commit races")

    def abort(self, messages, batchId: int) -> None:
        self._reclaim(messages)


class TxLogSinkSource(DataSource):
    """``df.writeStream.format("txlog").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def streamWriter(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError(
                "txlog sink supports append mode only (use "
                "TxLogTable.overwrite_batch_txn for read-modify-write "
                "view maintenance)"
            )
        return _TxLogStreamWriter(self.options, schema)


def register_txlog_sink(spark) -> None:
    """Idempotent registration of the streaming sink."""
    spark.dataSource.register(TxLogSinkSource)
