"""Incremental materialized-view maintenance over a transaction-log
table — the delta-apply identity, end to end:

    view(v_n) = view(v_m) ⊕ fold(changes(m, n))

A SUM/COUNT-per-group aggregate view refreshes by folding ONLY the
rows changed since the last applied source version (+row for inserts,
−row for deletes — deletion-vector deletes included, since the change
feed reconstructs their rows exactly), instead of re-aggregating the
whole source. At 100 TB the refresh cost is O(changed rows + view
cardinality), not O(source) — the difference between a nightly
full-rebuild and a minutes-cadence view.

Exactly-once without extra bookkeeping: the view is itself a
``TxLogTable``, and each refresh commits via ``overwrite_batch_txn``
with the SOURCE VERSION as the transaction id — a crashed or replayed
refresh of the same version is a committed no-op, and the
last-applied version is recovered FROM the view's own log (no side
state files to lose). Concurrent refreshers serialize on the view's
optimistic commit.

Supported aggregates are the self-inverting ones (count, sum — and
avg as sum/count at read time); min/max are NOT expressible by
delta-folding alone (a deleted minimum needs a rescan) — the honest
contract, stated loudly in ``__init__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aiports_data_warehouse_etl_spark.sources.txlog import TxLogTable


class IncrementalAggView:
    """SUM/COUNT-per-group view over ``source``, stored at
    ``view_path`` as its own transaction-log table.

    ``sum_cols``: source columns to SUM per group (each becomes
    ``sum_<col>``); a ``n_rows`` count is always maintained.
    """

    _APP = "matview"

    def __init__(
        self,
        spark: SparkSession,
        source: TxLogTable,
        view_path: str,
        group_cols: list[str],
        sum_cols: list[str],
    ) -> None:
        self.spark = spark
        self.source = source
        self.view = TxLogTable(spark, view_path)
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)

    # -- state ----------------------------------------------------------

    def last_applied_version(self) -> int:
        """Highest source version folded into the view, recovered from
        the view's own commit log (txn markers) — survives restarts
        with no side state."""
        best = -1
        for v in range(self.view.latest_version(), -1, -1):
            c = self.view._read_commit(v)
            if c.get("txn_app") == self._APP:
                best = max(best, int(c["txn_id"]))
                break  # markers are monotone; newest commit wins
        return best

    def read(self) -> DataFrame:
        return self.view.read()

    # -- refresh --------------------------------------------------------

    def _fold(self, feed: DataFrame) -> DataFrame:
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        aggs = [F.sum(sign).cast("long").alias("n_rows")]
        for c in self.sum_cols:
            aggs.append(F.sum(sign * F.col(c)).alias(f"sum_{c}"))
        return feed.groupBy(*self.group_cols).agg(*aggs)

    def refresh(self) -> int | None:
        """Fold source commits (last_applied, latest] into the view.
        Returns the view version written, or None when already
        current. One pass over the CHANGED rows + a keyed full-outer
        merge against the (aggregate-cardinality) view state."""
        last = self.last_applied_version()
        cur = self.source.latest_version()
        if cur <= last:
            return None
        deltas = self._fold(self.source.changes(last, cur))
        if last < 0 or self.view.latest_version() < 0:
            merged = deltas
        else:
            old = self.view.read()
            sum_names = [f"sum_{c}" for c in self.sum_cols]
            o = old.select(
                *self.group_cols,
                F.col("n_rows").alias("__o_n"),
                *[F.col(n).alias(f"__o_{n}") for n in sum_names],
            )
            d = deltas.select(
                *self.group_cols,
                F.col("n_rows").alias("__d_n"),
                *[F.col(n).alias(f"__d_{n}") for n in sum_names],
            )
            j = o.join(d, self.group_cols, "full_outer")
            cols = [
                (
                    F.coalesce(F.col("__o_n"), F.lit(0))
                    + F.coalesce(F.col("__d_n"), F.lit(0))
                )
                .cast("long")
                .alias("n_rows")
            ]
            for n in sum_names:
                cols.append(
                    (
                        F.coalesce(F.col(f"__o_{n}"), F.lit(0.0))
                        + F.coalesce(F.col(f"__d_{n}"), F.lit(0.0))
                    ).alias(n)
                )
            merged = j.select(*self.group_cols, *cols)
        # groups whose rows all vanished leave the view entirely
        merged = merged.filter(F.col("n_rows") > 0)
        return self.view.overwrite_batch_txn(merged, self._APP, cur)
