"""SQL DML frontend for transaction-log tables.

``TxSql`` lets a user drive the full DML surface of ``TxLogTable``
with plain SQL strings — the statements the reference's users would
write against a warehouse, executed against the log-structured table
format with its ACID/time-travel/CDC machinery underneath:

    tx = TxSql(spark)
    tx.register("orders_t", table)
    tx.sql("UPDATE orders_t SET o_totalprice = o_totalprice * 1.1 "
           "WHERE o_orderstatus = 'O'")
    tx.sql("DELETE FROM orders_t WHERE o_orderkey % 10 = 0")
    tx.sql("INSERT INTO orders_t SELECT * FROM src_view")
    tx.sql("MERGE INTO orders_t AS t USING updates AS s "
           "ON t.o_orderkey = s.o_orderkey "
           "WHEN MATCHED AND t.o_orderstatus = 'F' THEN DELETE "
           "WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice "
           "WHEN NOT MATCHED THEN INSERT")
    df = tx.sql("SELECT count(*) AS n FROM orders_t")

Design: DML statements are PARSED here (a small recognizer over the
canonical ANSI forms — Spark's parser cannot target a path-based
Python table format) and ROUTED to the corresponding ``TxLogTable``
method, which owns the semantics (copy-on-write discipline, NULL
predicate rules, constraint validation, txn commits). Everything
inside an expression — predicates, SET right-hand sides, the SELECT
body — is passed through VERBATIM to Spark SQL, so the expression
dialect is exactly Spark's; this module never re-implements
expression evaluation. SELECT statements register each table's
snapshot as a temp view (optionally at an older version via
``FOR VERSION AS OF n`` / ``FOR TIMESTAMP AS OF <ns>``) and delegate
wholesale to ``spark.sql``.

Unsupported syntax is refused LOUDLY with the offending statement —
never silently misparsed (the recognizers anchor on the full
statement shape, not substring sniffing).

Reference parity: the reference exposes no SQL; this is part of the
extension surface (SURVEY.md §2 S5+) that makes the txlog format a
usable warehouse, not just an API.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from aiports_data_warehouse_etl_spark.sources.txlog import TxLogTable

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parentheses and string literals."""
    parts: list[str] = []
    depth = 0
    quote: str | None = None
    cur: list[str] = []
    for ch in text:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            cur.append(ch)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _parse_set_clause(text: str, stmt: str) -> dict[str, str]:
    """``a = expr, b = expr`` → {a: expr} (top-level commas only)."""
    out: dict[str, str] = {}
    for item in _split_top_level(text):
        m = re.match(rf"({_IDENT})\s*=\s*(.+)$", item, re.DOTALL)
        if not m:
            raise ValueError(
                f"TxSql: cannot parse SET assignment {item!r} in: {stmt}"
            )
        col = m.group(1)
        if col in out:
            raise ValueError(
                f"TxSql: column {col!r} assigned twice in: {stmt}"
            )
        out[col] = m.group(2).strip()
    if not out:
        raise ValueError(f"TxSql: empty SET clause in: {stmt}")
    return out


class TxSql:
    """SQL statement router over registered ``TxLogTable`` handles."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.tables: dict[str, TxLogTable] = {}

    def register(self, name: str, table: TxLogTable) -> None:
        self.tables[name] = table

    def _table(self, name: str, stmt: str) -> TxLogTable:
        t = self.tables.get(name)
        if t is None:
            raise ValueError(
                f"TxSql: unknown table {name!r} (registered: "
                f"{sorted(self.tables)}) in: {stmt}"
            )
        return t

    # -- statement router ------------------------------------------------

    def sql(self, statement: str):
        """Execute one statement. DML/maintenance returns the new
        commit version (int; VACUUM returns the reclaimed file list);
        SELECT and DESCRIBE HISTORY return a DataFrame."""
        stmt = statement.strip().rstrip(";").strip()
        head = stmt.split(None, 1)[0].upper() if stmt else ""
        if head == "UPDATE":
            return self._update(stmt)
        if head == "DELETE":
            return self._delete(stmt)
        if head == "INSERT":
            return self._insert(stmt)
        if head == "MERGE":
            return self._merge(stmt)
        if head in ("SELECT", "WITH"):
            return self._select(stmt)
        if head == "OPTIMIZE":
            return self._optimize(stmt)
        if head == "VACUUM":
            return self._vacuum(stmt)
        if head == "DESCRIBE":
            return self._describe(stmt)
        if head == "CREATE":
            return self._create(stmt)
        if head == "RESTORE":
            return self._restore(stmt)
        if head == "ALTER":
            return self._alter(stmt)
        raise ValueError(f"TxSql: unsupported statement: {stmt}")

    # -- DML ---------------------------------------------------------------

    def _update(self, stmt: str) -> int:
        m = re.match(
            rf"UPDATE\s+({_IDENT})\s+SET\s+(.+?)\s+WHERE\s+(.+)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                "TxSql: expected 'UPDATE <table> SET <col> = <expr>"
                f"[, ...] WHERE <predicate>', got: {stmt}"
            )
        name, set_text, pred = m.groups()
        return self._table(name, stmt).update_where(
            pred.strip(), _parse_set_clause(set_text, stmt)
        )

    def _delete(self, stmt: str) -> int:
        m = re.match(
            rf"DELETE\s+FROM\s+({_IDENT})\s+WHERE\s+(.+)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                "TxSql: expected 'DELETE FROM <table> WHERE "
                f"<predicate>', got: {stmt}"
            )
        name, pred = m.groups()
        return self._table(name, stmt).delete_where(pred.strip())

    def _insert(self, stmt: str) -> int:
        m = re.match(
            rf"INSERT\s+INTO\s+({_IDENT})\s+(.+)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                "TxSql: expected 'INSERT INTO <table> <SELECT ...|"
                f"VALUES ...>', got: {stmt}"
            )
        name, body = m.groups()
        t = self._table(name, stmt)
        body = body.strip()
        if body.upper().startswith("VALUES"):
            # VALUES rows adopt the table's column names positionally
            schema = t.read().schema
            df = self.spark.sql(f"SELECT * FROM ({body})").toDF(
                *[f.name for f in schema.fields]
            )
            df = df.select(
                *[df[f.name].cast(f.dataType) for f in schema.fields]
            )
        else:
            df = self._run_select(body)
        return t.append(df)

    def _merge(self, stmt: str) -> int:
        m = re.match(
            rf"MERGE\s+INTO\s+({_IDENT})(?:\s+AS\s+t)?\s+"
            rf"USING\s+({_IDENT}|\(.+?\))(?:\s+AS\s+s)?\s+"
            rf"ON\s+(.+?)\s+(WHEN\s+.+)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                "TxSql: expected 'MERGE INTO <table> [AS t] USING "
                "<view|(subquery)> [AS s] ON t.<k> = s.<k> [AND ...] "
                f"WHEN ...', got: {stmt}"
            )
        name, src_text, on_text, when_text = m.groups()
        t = self._table(name, stmt)
        # source: a registered Spark view/table name or a subquery
        src_sql = (
            src_text[1:-1] if src_text.startswith("(") else
            f"SELECT * FROM {src_text}"
        )
        source = self._run_select(src_sql)
        # ON: conjunction of t.<k> = s.<k> equalities → merge keys
        keys: list[str] = []
        for part in re.split(r"\s+AND\s+", on_text, flags=re.IGNORECASE):
            em = re.match(
                rf"^\s*t\.({_IDENT})\s*=\s*s\.({_IDENT})\s*$", part
            ) or re.match(
                rf"^\s*s\.({_IDENT})\s*=\s*t\.({_IDENT})\s*$", part
            )
            if not em or em.group(1) != em.group(2):
                raise ValueError(
                    "TxSql: MERGE ON must be a conjunction of "
                    f"t.<col> = s.<col> equalities, got: {part!r}"
                )
            keys.append(em.group(1))
        # WHEN clauses (each optional, standard shapes only)
        update_set = update_cond = delete_cond = insert_cond = None
        insert = False
        clause_re = re.compile(
            r"WHEN\s+(NOT\s+MATCHED|MATCHED)"
            r"(?:\s+AND\s+(.*?))?\s+THEN\s+"
            r"(DELETE|INSERT|UPDATE\s+SET\s+.*?)"
            r"(?=\s+WHEN\s+|$)",
            re.IGNORECASE | re.DOTALL,
        )
        for cm in clause_re.finditer(when_text):
            matched = cm.group(1).upper() == "MATCHED"
            cond = cm.group(2).strip() if cm.group(2) else None
            action = cm.group(3).strip()
            act_head = action.split(None, 1)[0].upper()
            if matched and act_head == "DELETE":
                if delete_cond is not None:
                    raise ValueError(
                        f"TxSql: duplicate DELETE clause: {stmt}"
                    )
                if update_set is not None:
                    # ANSI/Delta MATCHED clauses fire in WRITTEN order
                    # (first match wins) but the engine always
                    # evaluates DELETE before UPDATE — accepting
                    # 'UPDATE ... DELETE' order would silently delete
                    # rows the written order says to update. Loud
                    # refusal, same policy as the other unsupported
                    # shapes (ADVICE r6 #4).
                    raise ValueError(
                        "TxSql: WHEN MATCHED ... DELETE must be "
                        "written BEFORE the UPDATE clause (the engine "
                        "evaluates DELETE first; ANSI fires clauses "
                        f"in written order): {stmt}"
                    )
                delete_cond = cond or "TRUE"
            elif matched and act_head == "UPDATE":
                if update_set is not None:
                    raise ValueError(
                        f"TxSql: duplicate UPDATE clause in: {stmt}"
                    )
                update_set = _parse_set_clause(
                    re.sub(
                        r"^UPDATE\s+SET\s+", "", action,
                        flags=re.IGNORECASE,
                    ),
                    stmt,
                )
                update_cond = cond
            elif not matched and act_head == "INSERT":
                if action.upper() != "INSERT":
                    raise ValueError(
                        "TxSql: only whole-row 'THEN INSERT' is "
                        f"supported, got: {action!r}"
                    )
                insert = True
                insert_cond = cond
            else:
                raise ValueError(
                    f"TxSql: unsupported MERGE clause {action!r} for "
                    f"{'MATCHED' if matched else 'NOT MATCHED'} in: "
                    f"{stmt}"
                )
        leftover = clause_re.sub("", when_text).strip()
        if leftover:
            raise ValueError(
                f"TxSql: unparsed MERGE text {leftover!r} in: {stmt}"
            )
        if update_set is None and delete_cond is None and not insert:
            raise ValueError(f"TxSql: MERGE with no WHEN clause: {stmt}")
        return t.merge(
            source,
            keys=keys,
            update_set=update_set,
            update_condition=update_cond,
            delete_condition=delete_cond,
            insert=insert,
            insert_condition=insert_cond,
        )

    # -- maintenance ---------------------------------------------------------

    def _optimize(self, stmt: str) -> int:
        """``OPTIMIZE <table> [ZORDER BY (a, b[, ...])]`` →
        ``compact()`` / ``compact(zorder_by=...)``."""
        m = re.match(
            rf"OPTIMIZE\s+({_IDENT})"
            rf"(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?$",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                "TxSql: expected 'OPTIMIZE <table> [ZORDER BY "
                f"(col, ...)]', got: {stmt}"
            )
        name, zcols = m.groups()
        t = self._table(name, stmt)
        if zcols:
            cols = tuple(c.strip() for c in zcols.split(","))
            return t.compact(zorder_by=cols)
        return t.compact()

    def _vacuum(self, stmt: str) -> list[str]:
        """``VACUUM <table> [RETAIN <n> VERSIONS]`` → ``vacuum()``."""
        m = re.match(
            rf"VACUUM\s+({_IDENT})"
            rf"(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?$",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                "TxSql: expected 'VACUUM <table> [RETAIN <n> "
                f"VERSIONS]', got: {stmt}"
            )
        name, retain = m.groups()
        return self._table(name, stmt).vacuum(
            retain_versions=int(retain or 0)
        )

    def _describe(self, stmt: str) -> DataFrame:
        m = re.match(
            rf"DESCRIBE\s+HISTORY\s+({_IDENT})$", stmt, re.IGNORECASE
        )
        if not m:
            raise ValueError(
                f"TxSql: expected 'DESCRIBE HISTORY <table>', got: {stmt}"
            )
        return self._table(m.group(1), stmt).describe_history()

    def _restore(self, stmt: str) -> int:
        m = re.match(
            rf"RESTORE\s+({_IDENT})\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)$",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                "TxSql: expected 'RESTORE <table> TO VERSION AS OF "
                f"<n>', got: {stmt}"
            )
        name, version = m.groups()
        return self._table(name, stmt).restore(int(version))

    def _alter(self, stmt: str) -> int:
        m = re.match(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+RENAME\s+COLUMN\s+"
            rf"({_IDENT})\s+TO\s+({_IDENT})$",
            stmt,
            re.IGNORECASE,
        )
        if m:
            name, old, new = m.groups()
            return self._table(name, stmt).rename_column(old, new)
        m = re.match(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+COLUMN\s+"
            rf"({_IDENT})$",
            stmt,
            re.IGNORECASE,
        )
        if m:
            name, col = m.groups()
            return self._table(name, stmt).drop_column(col)
        m = re.match(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+CONSTRAINT\s+"
            rf"({_IDENT})\s+CHECK\s*\((.+)\)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            name, cname, check = m.groups()
            return self._table(name, stmt).add_check(
                cname, check.strip()
            )
        m = re.match(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+CONSTRAINT\s+"
            rf"({_IDENT})$",
            stmt,
            re.IGNORECASE,
        )
        if m:
            name, cname = m.groups()
            return self._table(name, stmt).drop_check(cname)
        m = re.match(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+"
            rf"({_IDENT})\s+SET\s+GENERATED\s+AS\s*\((.+)\)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            name, col, expr = m.groups()
            return self._table(name, stmt).add_generated_column(
                col, expr.strip()
            )
        m = re.match(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+"
            rf"({_IDENT})\s+SET\s+IDENTITY"
            rf"(?:\s*\(\s*START\s+(-?\d+)\s+STEP\s+(-?\d+)\s*\))?$",
            stmt,
            re.IGNORECASE,
        )
        if m:
            name, col, start, step = m.groups()
            return self._table(name, stmt).add_identity_column(
                col, start=int(start or 1), step=int(step or 1)
            )
        raise ValueError(
            "TxSql: supported ALTER forms: RENAME COLUMN <old> TO "
            "<new> | DROP COLUMN <col> | ADD CONSTRAINT <name> CHECK "
            "(<expr>) | DROP CONSTRAINT <name> | ALTER COLUMN <col> "
            "SET GENERATED AS (<expr>) | ALTER COLUMN <col> SET "
            f"IDENTITY [(START n STEP m)] — got: {stmt}"
        )

    def _create(self, stmt: str) -> int:
        """``CREATE TABLE <name> PATH '<dir>' AS <select>`` — creates
        and registers a new txlog table seeded by the query result."""
        m = re.match(
            rf"CREATE\s+TABLE\s+({_IDENT})\s+PATH\s+'([^']+)'\s+AS\s+(.+)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                "TxSql: expected \"CREATE TABLE <name> PATH '<dir>' AS "
                f'<select>", got: {stmt}'
            )
        name, path, select = m.groups()
        if name in self.tables:
            raise ValueError(
                f"TxSql: table {name!r} is already registered"
            )
        df = self._run_select(select.strip())
        t = TxLogTable(self.spark, path)
        v = t.append(df)
        self.tables[name] = t
        return v

    # -- SELECT --------------------------------------------------------------

    _ASOF_RE = re.compile(
        rf"\b({_IDENT})\s+FOR\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+(\d+)",
        re.IGNORECASE,
    )
    _CHANGES_RE = re.compile(
        rf"\bCHANGES\s*\(\s*({_IDENT})\s*,\s*(-?\d+)\s*,\s*(\d+)\s*\)",
        re.IGNORECASE,
    )

    def _run_select(self, sql: str) -> DataFrame:
        """Register each txlog table's snapshot as a temp view (time
        travel via 'FOR VERSION AS OF n' / 'FOR TIMESTAMP AS OF ns'
        suffixes rewritten to versioned views), then delegate to
        spark.sql — the expression dialect is exactly Spark's."""
        rewritten = sql
        # CHANGES(t, v0, v1): the change feed as a table-valued source
        for m in list(self._CHANGES_RE.finditer(rewritten)):
            name, v0, v1 = m.group(1), int(m.group(2)), int(m.group(3))
            if name not in self.tables:
                continue
            view = f"__txsql_{name}_changes_{v0}_{v1}".replace("-", "m")
            self.tables[name].changes(v0, v1).createOrReplaceTempView(
                view
            )
            rewritten = rewritten.replace(m.group(0), view)
        for m in list(self._ASOF_RE.finditer(sql)):
            name, kind, value = m.group(1), m.group(2).upper(), m.group(3)
            if name not in self.tables:
                continue
            view = f"__txsql_{name}_{kind.lower()}_{value}"
            t = self.tables[name]
            df = (
                t.read(version=int(value))
                if kind == "VERSION"
                else t.read(as_of_ts=int(value))
            )
            df.createOrReplaceTempView(view)
            rewritten = rewritten.replace(m.group(0), view)
        for name, t in self.tables.items():
            if re.search(rf"\b{name}\b", rewritten):
                t.read().createOrReplaceTempView(name)
        return self.spark.sql(rewritten)

    def _select(self, stmt: str) -> DataFrame:
        return self._run_select(stmt)
