"""Model-based DML certification: random op sequences against a
pure-Python reference model.

The targeted tests in test_txlog.py pin each DML op's semantics in
isolation; this property test drives RANDOM interleavings of the
whole surface — append, copy-on-write DELETE, merge-on-read
(deletion-vector) DELETE, UPDATE, MERGE upsert, predicate-scoped
replace, compaction, column rename, and RESTORE to any earlier
version — and checks the table equals the model after EVERY op, so
interaction bugs (a DV surviving a compact, a rename epoch misapplied
to a merged file, an update recomputing against a stale name, a
restore resurrecting the wrong schema or deletion vectors) have
nowhere to hide. The model keeps a per-version snapshot history so a
restore is checked against exactly what that version held — rows AND
column name. Hypothesis shrinks any failure to a minimal op sequence.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aiports_data_warehouse_etl_spark.sources.txlog import TxLogTable

_OP = st.one_of(
    st.tuples(st.just("append"), st.integers(1, 5)),
    st.tuples(st.just("delete"), st.integers(0, 4)),
    st.tuples(st.just("delete_dv"), st.integers(0, 4)),
    st.tuples(st.just("update"), st.integers(0, 4)),
    st.tuples(st.just("merge"), st.integers(1, 4)),
    st.tuples(st.just("compact"), st.just(0)),
    st.tuples(st.just("rename"), st.just(0)),
    st.tuples(st.just("replace"), st.integers(0, 4)),
    st.tuples(st.just("restore"), st.integers(0, 7)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(ops=st.lists(_OP, min_size=1, max_size=6))
def test_dml_sequences_match_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("model") / "t")
    t = TxLogTable(spark, path)
    model: dict[int, int] = {}  # id -> val
    next_id = 0
    val_col = "v0"
    renames = 0
    # version -> (rows, val_col): what the table held at each commit,
    # for checking RESTORE against the real historical state
    history: dict[int, tuple[dict[int, int], str]] = {}

    def _df(rows):
        return spark.createDataFrame(
            [(i, v) for i, v in rows], f"id long, {val_col} long"
        )

    # every sequence starts from a non-empty table
    ops = [("append", 4)] + ops
    for op, arg in ops:
        if op == "append":
            rows = [(next_id + j, (next_id + j) * 3 % 17) for j in range(arg)]
            next_id += arg
            t.append(_df(rows))
            model.update(dict(rows))
        elif op in ("delete", "delete_dv"):
            pred = f"{val_col} % 5 = {arg}"
            (t.delete_where if op == "delete" else t.delete_where_dv)(pred)
            model = {i: v for i, v in model.items() if v % 5 != arg}
        elif op == "update":
            t.update_where(
                f"{val_col} % 5 = {arg}", {val_col: f"{val_col} + 1000"}
            )
            model = {
                i: v + 1000 if v % 5 == arg else v
                for i, v in model.items()
            }
        elif op == "merge":
            existing = sorted(model)[: arg // 2]
            fresh = [next_id + j for j in range(arg - len(existing))]
            next_id += len(fresh)
            rows = [(i, i % 23 + 7) for i in existing + fresh]
            t.merge_upsert(_df(rows), keys=["id"])
            model.update(dict(rows))
        elif op == "replace":
            # predicate-scoped overwrite: slice = rows with val%5==arg;
            # incoming rows all inside the slice (contract)
            rows = [(next_id + j, arg + 5 * j) for j in range(2)]
            next_id += 2
            t.replace_where(_df(rows), f"{val_col} % 5 = {arg}")
            model = {i: v for i, v in model.items() if v % 5 != arg}
            model.update(dict(rows))
        elif op == "compact":
            t.compact()
        elif op == "restore":
            vs = sorted(history)
            target = vs[arg % len(vs)]
            t.restore(target)
            model, val_col = dict(history[target][0]), history[target][1]
        elif op == "rename":
            renames += 1  # never reuse a name, even across restores
            new = f"v{renames}"
            t.rename_column(val_col, new)
            val_col = new
        history[t.latest_version()] = (dict(model), val_col)
        got = sorted(
            (r["id"], r[val_col]) for r in t.read().collect()
        )
        assert got == sorted(model.items()), (
            f"divergence after {op}({arg}) in {ops}: "
            f"table={got} model={sorted(model.items())}"
        )
        assert t.read().columns == ["id", val_col]
