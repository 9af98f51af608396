"""REAL cross-process concurrency for the txlog commit protocol.

Every other concurrency test in the suite is single-process with an
injected interleaving; these spawn actual OS processes racing on one
table directory, so the only serialization is the protocol itself —
the O_CREAT|O_EXCL atomic commit create (txlog.py:_try_commit) and
the snapshot-versioned retry loops on top of it (VERDICT r6 #6, the
last untested claim in SCALE.md's concurrency section).

Phase 1 (metadata-only, no Spark in children): 8 processes hammer
``_reserve_identity`` on one table; every claimed range must be
disjoint and the final high-water mark must equal the serial total —
a lost update anywhere shows up as an overlap or a short mark.

Phase 2 (full writers): 4 child processes each open their own
SparkSession and run append batches followed by a DELETE on their own
slice, racing the other writers' appends/DML. Each writer touches
only its own rows, so the final table must equal the per-writer
serial composition regardless of interleaving, and the
GENERATED-ALWAYS identity ids must be globally unique.
"""

from __future__ import annotations

import os
import subprocess
import sys

from aiports_data_warehouse_etl_spark.sources.txlog import TxLogTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RESERVE_CHILD = """
import sys
sys.path.insert(0, {repo!r})
from aiports_data_warehouse_etl_spark.sources.txlog import TxLogTable
t = TxLogTable(None, sys.argv[1])
out = []
for _ in range({n_reservations}):
    first, step = t._reserve_identity("uid", {per}, max_retries=100000)
    out.append(f"{{first}},{{step}}")
print(";".join(out))
"""


def test_multiprocess_identity_reservations_disjoint(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(spark, path)
    t.append(spark.createDataFrame([], "uid long, v double"))
    t.add_identity_column("uid")  # start=1, step=1

    n_procs, n_reservations, per = 8, 25, 3
    script = _RESERVE_CHILD.format(
        repo=REPO, n_reservations=n_reservations, per=per
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, path],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for _ in range(n_procs)
    ]
    claimed: set[int] = set()
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"child failed: {err[-2000:]}"
        for item in out.strip().split(";"):
            first, step = (int(x) for x in item.split(","))
            rng = set(range(first, first + per * step, step))
            dup = claimed & rng
            assert not dup, f"duplicate identity ids across processes: {dup}"
            claimed |= rng
    total = n_procs * n_reservations * per
    assert len(claimed) == total
    # no lost updates: the serial total survived every interleaving
    assert claimed == set(range(1, total + 1))
    ident = TxLogTable(None, path)._snapshot()["identity"]["uid"]
    assert int(ident["next"]) == total + 1


_WRITER_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
path, wid = sys.argv[1], int(sys.argv[2])
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[1]")
    .appName(f"txlog-stress-w{{wid}}")
    .config("spark.sql.shuffle.partitions", "1")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "1g")
    .getOrCreate()
)
from aiports_data_warehouse_etl_spark.sources.txlog import (
    TxLogTable, TxConflict,
)
t = TxLogTable(spark, path)
K, B, D = {K}, {B}, {D}
for b in range(K):
    df = spark.createDataFrame(
        [(wid, b, i) for i in range(B)], "writer int, batch int, val int"
    )
    for _ in range(200):
        try:
            t.append(df)
            break
        except TxConflict:
            time.sleep(0.05)
    else:
        sys.exit(3)
ok = False
for _ in range(200):
    try:
        t.delete_where(f"writer = {{wid}} AND batch < {{D}}")
        ok = True
        break
    except TxConflict:
        time.sleep(0.05)
if not ok:
    sys.exit(4)
print("OK", wid)
"""


def test_multiprocess_writers_serial_equivalent(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(spark, path)
    t.append(
        spark.createDataFrame(
            [], "rid long, writer int, batch int, val int"
        )
    )
    t.add_identity_column("rid")

    n_procs, K, B, D = 4, 3, 5, 1
    script = _WRITER_CHILD.format(repo=REPO, K=K, B=B, D=D)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, path, str(w)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(n_procs)
    ]
    # while the writers run, land a CHECK constraint from the parent:
    # any child append staged before this commit must hit the
    # policy-conflict path (TxConflict) and retry from a fresh
    # snapshot with re-validation — the ADVICE r6 #2 rule under REAL
    # cross-process timing. Retried until it wins its own race.
    import time as _time

    from aiports_data_warehouse_etl_spark.sources.txlog import TxConflict

    _time.sleep(2.0)
    for _ in range(400):
        try:
            t.add_check("val_ok", "val >= 0")
            break
        except TxConflict:
            _time.sleep(0.05)
    else:
        raise AssertionError("add_check never landed under contention")
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"writer failed: {err[-3000:]}"
    assert "val_ok" in TxLogTable(spark, path)._snapshot()["constraints"]

    got = TxLogTable(spark, path).read()
    rows = got.collect()
    # serial equivalence: each writer's surviving slice is exactly its
    # batches >= D with B rows each, for every interleaving
    assert len(rows) == n_procs * (K - D) * B
    per = {}
    for r in rows:
        per.setdefault((r["writer"], r["batch"]), 0)
        per[(r["writer"], r["batch"])] += 1
    assert per == {
        (w, b): B for w in range(n_procs) for b in range(D, K)
    }, per
    # identity ids assigned under real contention stay globally unique
    rids = [r["rid"] for r in rows]
    assert len(set(rids)) == len(rids)
    assert all(r is not None for r in rids)
