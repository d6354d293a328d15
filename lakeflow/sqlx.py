"""SQL surface for the versioned-table layer (Delta/Iceberg SQL-extension
analog): the statements a lakehouse adds on top of ANSI SQL, dispatched onto
:class:`lakeflow.tables.TableCatalog` / :class:`VersionedTable`, with
everything else delegated verbatim to ``spark.sql``.

The reference drives its whole pipeline through SQL strings (DDL + MERGE in
/root/reference/src/silver/_silver_utils.py:121-186; Trino time travel in
/root/reference/experiments/trino_iceberg_example.sql:40-43). Spark SQL
alone cannot reach our manifest-backed tables, so this module adds the
minimal grammar that does:

    CREATE VERSIONED TABLE t [PARTITIONED BY (c1, c2)] AS SELECT ...
    CREATE VERSIONED TABLE t SHALLOW CLONE src [FOR VERSION AS OF <n>]
    INSERT INTO|OVERWRITE VERSIONED t SELECT ...
    SELECT ... FROM t ...                       -- latest snapshot
    SELECT ... FROM t FOR VERSION AS OF 3 ...   -- time travel
    SELECT ... FROM t FOR TIMESTAMP AS OF '2026-08-14T12:00:00+00:00' ...
    DESCRIBE HISTORY t | DESCRIBE DETAIL t | DESCRIBE FILES t
    ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS (c1, c2)
    ANALYZE TABLE t COMPUTE NDV (c1, c2) [WITH K <n>]
    ALTER TABLE t ADD COLUMN c <type> | DROP COLUMN c
    ALTER TABLE t ADD CONSTRAINT name CHECK (<expr>) | DROP CONSTRAINT name
    ALTER TABLE t SET MASK ON c AS (<expr>) | DROP MASK ON c
    ALTER TABLE t SET ROW FILTER name AS (<expr>) | DROP ROW FILTER name
    DESCRIBE POLICY t
    ALTER TABLE t CREATE TAG name [AS OF VERSION <n>] | DROP TAG name
    ALTER TABLE t CREATE BRANCH name [AS OF VERSION <n>] | DROP BRANCH name
    ALTER TABLE t FAST FORWARD BRANCH name
    SELECT ... FROM t FOR VERSION AS OF 'name' ...   -- tag OR branch ref
    OPTIMIZE t [ZORDER BY (c1, c2)]
    VACUUM t [RETAIN <n> SNAPSHOTS]
    ROLLBACK TABLE t TO VERSION <n>
    SEAL TABLE t | VERIFY TABLE t
    DELETE FROM VERSIONED t WHERE <cond> [USING MERGE ON READ]
    MERGE INTO VERSIONED t USING <src> ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
        [USING MERGE ON READ]
    UPDATE VERSIONED t SET c1 = <expr>, c2 = <expr> WHERE <cond> [USING MERGE ON READ]
    APPLY CHANGES INTO t FROM <view_or_select> KEYS (k1, k2)
        SEQUENCE BY <col> [OPS <op_col> DELETE WHEN '<val>']
    CREATE INCREMENTAL VIEW mv AS SELECT k1[, k2...], COUNT(*) AS c,
        SUM(col) AS s[, ...] FROM t GROUP BY k1[, k2...] [WITH SCALE <n>]
    CREATE INCREMENTAL [LEFT] JOIN VIEW mv AS
        SELECT * FROM l [LEFT] JOIN r USING (k1[, k2])
    REFRESH INCREMENTAL VIEW mv
    CREATE SCHEMA [IF NOT EXISTS] s | SHOW SCHEMAS | SHOW TABLES [IN s]
    BEGIN TRANSACTION ['msg'] | COMMIT | ROLLBACK | DESCRIBE CATALOG LOG
    PURGE SUBJECTS FROM t1, t2 WHERE <cond> [MATERIALIZE [EXPIRE HISTORY]]

Table names are ``t`` or ``schema.table`` (the reference's namespaced
layering, docker/init/lakehouse_init.sql — ``silver.processed_company``);
dotted references bind through a mangled temp-view alias because Spark temp
views cannot carry dots.

Deliberately a SMALL grammar, recognized by anchored regular expressions —
statement heads are unambiguous, so there is no parser to get subtly wrong,
and any unrecognized statement falls through to ``spark.sql`` untouched.
Time travel works by binding each ``name FOR VERSION AS OF k`` (and each
bare catalog-table reference) to a snapshot-pinned temp view before
delegation — the same snapshot-isolation mechanics ``register_view`` gives
the DataFrame API.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from lakeflow.tables import TableCatalog

_CLONE = re.compile(
    r"^\s*CREATE\s+VERSIONED\s+TABLE\s+([\w.]+)\s+SHALLOW\s+CLONE\s+([\w.]+)"
    r"(?:\s+FOR\s+VERSION\s+AS\s+OF\s+(\d+))?\s*$",
    re.IGNORECASE,
)
_CREATE = re.compile(
    r"^\s*CREATE\s+VERSIONED\s+TABLE\s+([\w.]+)"
    r"(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?\s+AS\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT = re.compile(
    r"^\s*INSERT\s+(INTO|OVERWRITE)\s+VERSIONED\s+([\w.]+)\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_HISTORY = re.compile(r"^\s*DESCRIBE\s+HISTORY\s+([\w.]+)\s*$", re.IGNORECASE)
_SCHEMA_HISTORY = re.compile(
    r"^\s*DESCRIBE\s+SCHEMA\s+HISTORY\s+([\w.]+)\s*$", re.IGNORECASE
)
_ANALYZE = re.compile(
    r"^\s*ANALYZE\s+TABLE\s+([\w.]+)\s+COMPUTE\s+STATISTICS"
    r"\s+FOR\s+COLUMNS\s*\(\s*([\w\s,]+?)\s*\)\s*$",
    re.IGNORECASE,
)
_ANALYZE_NDV = re.compile(
    r"^\s*ANALYZE\s+TABLE\s+([\w.]+)\s+COMPUTE\s+NDV"
    r"\s*\(\s*([\w\s,]+?)\s*\)(?:\s+WITH\s+K\s+(\d+))?\s*$",
    re.IGNORECASE,
)
_DETAIL = re.compile(
    r"^\s*DESCRIBE\s+DETAIL\s+([\w.]+)\s*$", re.IGNORECASE
)
_FILES = re.compile(
    r"^\s*DESCRIBE\s+FILES\s+([\w.]+)\s*$", re.IGNORECASE
)
_ADD_COLUMN = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w()<>, ]+?)\s*$",
    re.IGNORECASE,
)
_DROP_COLUMN = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMN\s+(\w+)\s*$",
    re.IGNORECASE,
)
_RENAME_COLUMN = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*$",
    re.IGNORECASE,
)
_ADD_GENERATED = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+GENERATED\s+COLUMN\s+(\w+)"
    r"\s+([\w()<>, ]+?)\s+AS\s*\((.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ADD_CONSTRAINT = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+CONSTRAINT\s+(\w+)"
    r"\s+CHECK\s*\((.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_CONSTRAINT = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*$",
    re.IGNORECASE,
)
_SET_MASK = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+MASK\s+ON\s+(\w+)"
    r"\s+AS\s*\((.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_MASK = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+MASK\s+ON\s+(\w+)\s*$",
    re.IGNORECASE,
)
_SET_ROW_FILTER = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+ROW\s+FILTER\s+(\w+)"
    r"\s+AS\s*\((.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_ROW_FILTER = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+ROW\s+FILTER\s+(\w+)\s*$",
    re.IGNORECASE,
)
_DESCRIBE_POLICY = re.compile(
    r"^\s*DESCRIBE\s+POLICY\s+([\w.]+)\s*$", re.IGNORECASE
)
_CREATE_TAG = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+CREATE\s+TAG\s+([\w.\-]+)"
    r"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*$",
    re.IGNORECASE,
)
_DROP_TAG = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+TAG\s+([\w.\-]+)\s*$",
    re.IGNORECASE,
)
_CREATE_BRANCH = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+CREATE\s+BRANCH\s+([\w.\-]+)"
    r"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*$",
    re.IGNORECASE,
)
_DROP_BRANCH = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+BRANCH\s+([\w.\-]+)\s*$",
    re.IGNORECASE,
)
_FAST_FORWARD = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+FAST\s+FORWARD\s+BRANCH\s+([\w.\-]+)\s*$",
    re.IGNORECASE,
)
_OPTIMIZE = re.compile(
    r"^\s*OPTIMIZE\s+([\w.]+)"
    r"(?:\s+ZORDER\s+BY\s*\(\s*([\w\s,]+?)\s*\))?\s*$",
    re.IGNORECASE,
)
_VACUUM = re.compile(
    r"^\s*VACUUM\s+([\w.]+)(?:\s+RETAIN\s+(\d+)\s+SNAPSHOTS)?\s*$", re.IGNORECASE
)
_ROLLBACK = re.compile(
    r"^\s*ROLLBACK\s+TABLE\s+([\w.]+)\s+TO\s+VERSION\s+(\d+)\s*$", re.IGNORECASE
)
_BEGIN_TXN = re.compile(
    r"^\s*BEGIN\s+TRANSACTION(?:\s+'([^']*)')?\s*$", re.IGNORECASE
)
_COMMIT_TXN = re.compile(r"^\s*COMMIT(?:\s+TRANSACTION)?\s*$", re.IGNORECASE)
_ROLLBACK_TXN = re.compile(
    r"^\s*ROLLBACK(?:\s+TRANSACTION)?\s*$", re.IGNORECASE
)
_CATALOG_LOG = re.compile(r"^\s*DESCRIBE\s+CATALOG\s+LOG\s*$", re.IGNORECASE)
_PURGE = re.compile(
    r"^\s*PURGE\s+SUBJECTS\s+FROM\s+([\w.\s,]+?)\s+WHERE\s+(.+?)"
    r"(\s+MATERIALIZE(?:\s+EXPIRE\s+HISTORY)?)?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SEAL = re.compile(r"^\s*SEAL\s+TABLE\s+([\w.]+)\s*$", re.IGNORECASE)
_VERIFY = re.compile(r"^\s*VERIFY\s+TABLE\s+([\w.]+)\s*$", re.IGNORECASE)
_UPDATE = re.compile(
    r"^\s*UPDATE\s+VERSIONED\s+([\w.]+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)"
    r"(\s+USING\s+MERGE\s+ON\s+READ)?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+VERSIONED\s+([\w.]+)\s+WHERE\s+(.+?)"
    r"(\s+USING\s+MERGE\s+ON\s+READ)?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE = re.compile(
    r"^\s*MERGE\s+INTO\s+VERSIONED\s+([\w.]+)\s+USING\s+(.+?)\s+ON\s+(.+?)\s+"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*"
    r"(\s+USING\s+MERGE\s+ON\s+READ)?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ON_EQ = re.compile(r"(?:\w+\.)?(\w+)\s*=\s*(?:\w+\.)?(\w+)")
_APPLY = re.compile(
    r"^\s*APPLY\s+CHANGES\s+INTO\s+([\w.]+)\s+FROM\s+(.+?)\s+"
    r"KEYS\s*\(([^)]+)\)\s+SEQUENCE\s+BY\s+(\w+)"
    r"(?:\s+OPS\s+(\w+)\s+DELETE\s+WHEN\s+'([^']+)')?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_MV = re.compile(
    r"^\s*CREATE\s+INCREMENTAL\s+VIEW\s+(\w+)\s+AS\s+"
    r"SELECT\s+(.+?)\s+FROM\s+([\w.]+)\s+GROUP\s+BY\s+([\w\s,]+?)"
    r"(?:\s+WITH\s+SCALE\s+(\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MV_COUNT = re.compile(r"^COUNT\(\*\)\s+AS\s+(\w+)$", re.IGNORECASE)
_MV_SUM = re.compile(r"^SUM\((\w+)\)\s+AS\s+(\w+)$", re.IGNORECASE)
_CREATE_MVJ = re.compile(
    r"^\s*CREATE\s+INCREMENTAL\s+(LEFT\s+)?JOIN\s+VIEW\s+(\w+)\s+AS\s+"
    r"SELECT\s+\*\s+FROM\s+([\w.]+)\s+(?:LEFT\s+)?JOIN\s+([\w.]+)\s+"
    r"USING\s*\(([\w\s,]+)\)\s*$",
    re.IGNORECASE,
)
_REFRESH_MV = re.compile(
    r"^\s*REFRESH\s+INCREMENTAL\s+VIEW\s+(\w+)\s*$", re.IGNORECASE
)
_CREATE_SCHEMA = re.compile(
    r"^\s*CREATE\s+SCHEMA\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*$",
    re.IGNORECASE,
)
_SHOW_SCHEMAS = re.compile(r"^\s*SHOW\s+SCHEMAS\s*$", re.IGNORECASE)
_SHOW_TABLES = re.compile(
    r"^\s*SHOW\s+TABLES(?:\s+IN\s+(\w+))?\s*$", re.IGNORECASE
)
_TIME_TRAVEL = re.compile(
    r"(?<![\w.])([\w.]+)\s+FOR\s+VERSION\s+AS\s+OF\s+(\d+)", re.IGNORECASE
)
_TS_TRAVEL = re.compile(
    r"(?<![\w.])([\w.]+)\s+FOR\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'", re.IGNORECASE
)
_TAG_TRAVEL = re.compile(
    r"(?<![\w.])([\w.]+)\s+FOR\s+VERSION\s+AS\s+OF\s+'([\w.\-]+)'",
    re.IGNORECASE,
)


class LakehouseSQL:
    """Execute lakehouse SQL against a :class:`TableCatalog`.

    ``execute`` returns a DataFrame for queries/DESCRIBE, and a small result
    dict for maintenance statements (what OPTIMIZE/VACUUM did).
    """

    def __init__(self, spark: SparkSession, catalog: TableCatalog) -> None:
        self.spark = spark
        self.catalog = catalog
        # Multi-table transaction state (BEGIN TRANSACTION ... COMMIT):
        # statements between the two stage through one CatalogTransaction
        # and become visible atomically at COMMIT (lakeflow/txn.py).
        self._txn = None
        self._catalog_ref = None

    @property
    def ref(self):
        """The catalog commit log (ref ``main``) transactions publish to;
        created lazily so non-transactional use pays nothing."""
        if self._catalog_ref is None:
            from lakeflow.txn import CatalogRef

            self._catalog_ref = CatalogRef(self.spark, self.catalog)
        return self._catalog_ref

    def execute(self, stmt: str):
        m = _BEGIN_TXN.match(stmt)
        if m:
            if self._txn is not None:
                raise ValueError("a transaction is already active")
            self._txn = self.ref.transaction(m.group(1))
            return {"transaction": "begun", "base_commit": self._txn.base_commit}
        if _COMMIT_TXN.match(stmt):
            if self._txn is None:
                raise ValueError("COMMIT without an active transaction")
            txn, self._txn = self._txn, None
            commit = txn.commit()
            return {"catalog_commit": commit, "tables": dict(txn.touched)}
        if _ROLLBACK_TXN.match(stmt):
            if self._txn is None:
                raise ValueError("ROLLBACK without an active transaction")
            txn, self._txn = self._txn, None
            return {"rolled_back": sorted(txn.touched)}
        if _CATALOG_LOG.match(stmt):
            return self.ref.log()
        m = _PURGE.match(stmt)
        if m:
            # Right-to-be-forgotten (txn.purge_subjects): one shared
            # predicate erased from every listed table in ONE catalog
            # commit; the optional MATERIALIZE clause runs the physical
            # phase immediately (EXPIRE HISTORY = full-compliance form,
            # closing the time-travel window over pre-purge files).
            if self._txn is not None:
                raise ValueError(
                    "PURGE SUBJECTS manages its own transaction; COMMIT or "
                    "ROLLBACK the active one first"
                )
            tables = [t.strip() for t in m.group(1).split(",")]
            cond = m.group(2).strip()
            commit = self.ref.purge_subjects(
                {t: cond for t in tables}, f"PURGE SUBJECTS WHERE {cond}"
            )
            out = {"purge_commit": commit, "tables": tables}
            if m.group(3):
                out["materialize_commit"] = self.ref.materialize_purge(
                    tables,
                    expire_history="EXPIRE" in m.group(3).upper(),
                )
            return out
        m = _CREATE_SCHEMA.match(stmt)
        if m:
            self.catalog.create_schema(m.group(1))
            return {"created_schema": m.group(1)}
        if _SHOW_SCHEMAS.match(stmt):
            return self.spark.createDataFrame(
                [(s,) for s in self.catalog.schemas()] or [],
                "schema_name string",
            )
        m = _SHOW_TABLES.match(stmt)
        if m:
            prefix = f"{m.group(1)}." if m.group(1) else ""
            names = [
                n for n in self.catalog.tables()
                if (n.startswith(prefix) if prefix else "." not in n)
            ]
            return self.spark.createDataFrame(
                [(n,) for n in names] or [], "table_name string"
            )
        m = _CLONE.match(stmt)
        if m:
            dst, src, v = m.group(1), m.group(2), m.group(3)
            t = self.catalog.load(src)
            version = int(v) if v else t.current_version()
            t.clone_to(self.catalog._path(dst), version=version)
            return {"cloned": dst, "from": src, "at_version": version}
        m = _CREATE.match(stmt)
        if m:
            name, parts, select = m.group(1), m.group(2), m.group(3)
            partition_by = (
                [c.strip() for c in parts.split(",")] if parts else None
            )
            if self._txn is not None:
                if name in self.catalog.tables():
                    raise ValueError(f"table {name!r} already exists")
                self._txn.write(
                    name, self._query(select), partition_by=partition_by
                )
                return {"created": name, "staged": True}
            self.catalog.create(
                name, self._query(select), partition_by=partition_by
            )
            return {"created": name}
        m = _INSERT.match(stmt)
        if m:
            mode = "overwrite" if m.group(1).upper() == "OVERWRITE" else "append"
            name, select = m.group(2), m.group(3)
            df = self._query(select)
            if self._txn is not None:
                self.catalog.load(name)  # fail on a missing table
                version = self._txn.write(name, df, mode=mode)
                return {
                    "inserted_into": name,
                    "version": version,
                    "mode": mode,
                    "staged": True,
                }
            version = self.catalog.load(name).commit(df, mode=mode)
            return {"inserted_into": name, "version": version, "mode": mode}
        m = _SCHEMA_HISTORY.match(stmt)
        if m:
            return self.catalog.load(m.group(1)).schema_changes()
        m = _HISTORY.match(stmt)
        if m:
            return self.catalog.load(m.group(1)).snapshots()
        m = _ANALYZE.match(stmt)
        if m:
            cols = [c.strip() for c in m.group(2).split(",")]
            v = self.catalog.load(m.group(1)).analyze(cols)
            return {"analyzed": m.group(1), "columns": cols, "version": v}
        m = _ANALYZE_NDV.match(stmt)
        if m:
            cols = [c.strip() for c in m.group(2).split(",")]
            k = int(m.group(3)) if m.group(3) else 256
            t = self.catalog.load(m.group(1))
            v = t.analyze_ndv(cols, k=k)
            return {
                "analyzed_ndv": m.group(1),
                "columns": cols,
                "k": k,
                "version": v,
                "estimates": {c: t.ndv_stats(c)["estimate"] for c in cols},
            }
        m = _DETAIL.match(stmt)
        if m:
            return self.catalog.load(m.group(1)).detail()
        m = _FILES.match(stmt)
        if m:
            return self.catalog.load(m.group(1)).files()
        m = _ADD_COLUMN.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.add_column(m.group(2), m.group(3))
            return {"altered": m.group(1), "added_column": m.group(2), "version": v}
        m = _DROP_COLUMN.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.drop_column(m.group(2))
            return {"altered": m.group(1), "dropped_column": m.group(2), "version": v}
        m = _ADD_GENERATED.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.set_generated(m.group(2), m.group(3), m.group(4))
            return {
                "altered": m.group(1),
                "generated_column": m.group(2),
                "version": v,
            }
        m = _RENAME_COLUMN.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.rename_column(m.group(2), m.group(3))
            return {
                "altered": m.group(1),
                "renamed_column": f"{m.group(2)}->{m.group(3)}",
                "version": v,
            }
        m = _ADD_CONSTRAINT.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.add_constraint(m.group(2), m.group(3).strip())
            return {"altered": m.group(1), "added_constraint": m.group(2), "version": v}
        m = _DROP_CONSTRAINT.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.drop_constraint(m.group(2))
            return {"altered": m.group(1), "dropped_constraint": m.group(2), "version": v}
        m = _SET_MASK.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.set_column_mask(m.group(2), m.group(3).strip())
            return {"altered": m.group(1), "set_mask": m.group(2), "version": v}
        m = _DROP_MASK.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.drop_column_mask(m.group(2))
            return {"altered": m.group(1), "dropped_mask": m.group(2), "version": v}
        m = _SET_ROW_FILTER.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.set_row_filter(m.group(2), m.group(3).strip())
            return {"altered": m.group(1), "set_row_filter": m.group(2), "version": v}
        m = _DROP_ROW_FILTER.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.drop_row_filter(m.group(2))
            return {
                "altered": m.group(1),
                "dropped_row_filter": m.group(2),
                "version": v,
            }
        m = _CREATE_TAG.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.create_tag(
                m.group(2), int(m.group(3)) if m.group(3) else None
            )
            return {"altered": m.group(1), "created_tag": m.group(2), "version": v}
        m = _DROP_TAG.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.drop_tag(m.group(2))
            return {"altered": m.group(1), "dropped_tag": m.group(2), "version": v}
        m = _CREATE_BRANCH.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            t.create_branch(m.group(2), int(m.group(3)) if m.group(3) else None)
            return {"altered": m.group(1), "created_branch": m.group(2)}
        m = _DROP_BRANCH.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            t.drop_branch(m.group(2))
            return {"altered": m.group(1), "dropped_branch": m.group(2)}
        m = _FAST_FORWARD.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            v = t.fast_forward(m.group(2))
            return {
                "altered": m.group(1),
                "fast_forwarded": m.group(2),
                "version": v,
            }
        m = _DESCRIBE_POLICY.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            rows = (
                [("mask", c, e) for c, e in sorted(t.masks().items())]
                + [
                    ("row_filter", n, e)
                    for n, e in sorted(t.row_filters().items())
                ]
                + [
                    ("constraint", n, e)
                    for n, e in sorted(t.constraints().items())
                ]
            )
            return self.spark.createDataFrame(
                rows, "kind string, name string, expr string"
            )
        m = _OPTIMIZE.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            before = t.current_version()
            if m.group(2):
                cols = [c.strip() for c in m.group(2).split(",")]
                after = t.optimize_zorder(cols)
                return {
                    "optimized": m.group(1),
                    "zordered_by": cols,
                    "compacted": after != before,
                }
            after = t.compact(small_dir_max_bytes=32 << 20)
            return {"optimized": m.group(1), "compacted": after != before}
        m = _VACUUM.match(stmt)
        if m:
            t = self.catalog.load(m.group(1))
            keep = int(m.group(2)) if m.group(2) else 1
            expired = t.expire_snapshots(keep_last=keep)
            orphans = t.remove_orphans()
            return {
                "vacuumed": m.group(1),
                "expired": expired,
                "orphans_removed": len(orphans),
            }
        m = _ROLLBACK.match(stmt)
        if m:
            v = self.catalog.load(m.group(1)).rollback(int(m.group(2)))
            return {"rolled_back": m.group(1), "new_version": v}
        m = _SEAL.match(stmt)
        if m:
            v = self.catalog.load(m.group(1)).seal()
            return {"sealed": m.group(1), "version": v}
        m = _VERIFY.match(stmt)
        if m:
            return self.catalog.load(m.group(1)).verify_integrity()
        m = _UPDATE.match(stmt)
        if m:
            name, sets, cond, mor = m.groups()
            set_exprs = {}
            for part in sets.split(","):
                col, expr = part.split("=", 1)
                set_exprs[col.strip()] = expr.strip()
            def do_update(t):
                return (
                    t.update_where_mor(cond, set_exprs)
                    if mor
                    else t.update_where(cond, set_exprs)
                )

            if self._txn is not None:
                v = self._txn.run(name, do_update)
                return {"updated": name, "version": v, "mor": bool(mor), "staged": True}
            v = do_update(self.catalog.load(name))
            return {"updated": name, "version": v, "mor": bool(mor)}
        m = _DELETE.match(stmt)
        if m:
            name, cond, mor = m.group(1), m.group(2), m.group(3)

            def do_delete(t):
                return t.delete_where_mor(cond) if mor else t.delete_where(cond)

            if self._txn is not None:
                v = self._txn.run(name, do_delete)
                return {"deleted_from": name, "version": v, "mor": bool(mor), "staged": True}
            v = do_delete(self.catalog.load(name))
            return {"deleted_from": name, "version": v, "mor": bool(mor)}
        m = _MERGE.match(stmt)
        if m:
            return self._merge_upsert(*m.groups())
        m = _APPLY.match(stmt)
        if m:
            return self._apply_changes(*m.groups())
        m = _CREATE_MVJ.match(stmt)
        if m:
            return self._create_mvj(*m.groups())
        m = _CREATE_MV.match(stmt)
        if m:
            return self._create_mv(*m.groups())
        m = _REFRESH_MV.match(stmt)
        if m:
            return self._refresh_mv(m.group(1))
        return self._query(stmt)

    # -- incremental materialized views ------------------------------------
    def _mv_spec_path(self, name: str) -> str:
        import os

        return os.path.join(self.catalog.root, f"_mv_{name}.json")

    def _load_mv(self, name: str):
        import json
        import os

        from lakeflow.views import (
            IncrementalAggView,
            IncrementalJoinView,
            IncrementalLeftJoinView,
        )

        path = self._mv_spec_path(name)
        if not os.path.exists(path):
            raise ValueError(f"unknown incremental view {name!r}")
        with open(path) as fh:
            spec = json.load(fh)
        if spec.get("kind") in ("join", "left_join"):
            cls = (
                IncrementalLeftJoinView
                if spec["kind"] == "left_join"
                else IncrementalJoinView
            )
            return cls(
                self.spark,
                self.catalog.load(spec["left"]),
                self.catalog.load(spec["right"]),
                on=spec["on"],
                path=os.path.join(self.catalog.root, f"_mvdata_{name}"),
            )
        return IncrementalAggView(
            self.spark,
            self.catalog.load(spec["base"]),
            keys=spec["keys"],
            sums={out: tuple(sv) for out, sv in spec["sums"].items()},
            path=os.path.join(self.catalog.root, f"_mvdata_{name}"),
            count_col=spec["count_col"],
        )

    def _create_mvj(
        self, outer: str | None, name: str, left: str, right: str, using: str
    ) -> dict:
        """Incremental JOIN view as a statement (views.py
        IncrementalJoinView / IncrementalLeftJoinView): ``CREATE
        INCREMENTAL [LEFT] JOIN VIEW v AS SELECT * FROM l [LEFT] JOIN r
        USING (k1[, k2])``. The state carries every column of both sides
        plus the Z-set multiplicity ``n``; REFRESH INCREMENTAL VIEW folds
        both bases' manifest diffs (the LEFT form derives null-extended
        rows at read). Project/aggregate over the registered temp view for
        narrower shapes — the join itself is the part worth
        incrementalizing."""
        import json

        keys = [k.strip() for k in using.split(",") if k.strip()]
        if not keys:
            raise ValueError("USING (...) needs at least one join key")
        with open(self._mv_spec_path(name), "w") as fh:
            json.dump(
                {
                    "kind": "left_join" if outer else "join",
                    "left": left,
                    "right": right,
                    "on": keys,
                },
                fh,
            )
        mv = self._load_mv(name)
        r = mv.refresh()
        mv.read().createOrReplaceTempView(name)
        return {"created_view": name, **r}

    def _create_mv(
        self, name: str, select_list: str, base: str, group_by: str, scale: str | None
    ) -> dict:
        """DLT's incremental materialized view as a statement: the SELECT
        list is restricted to the group keys plus COUNT(*)/SUM(col) aliases
        (the group-invertible aggregates lakeflow/views.py folds from
        manifest diffs); SUM values quantize at WITH SCALE (default 100 —
        cents). The spec persists beside the warehouse so REFRESH works
        from any later session; the first refresh runs at create time."""
        import json

        keys = [k.strip() for k in group_by.split(",")]
        items = [s.strip() for s in select_list.split(",")]
        lead, aggs = items[: len(keys)], items[len(keys):]
        if lead != keys:
            raise ValueError(
                f"SELECT must start with the GROUP BY keys {keys}, got {lead}"
            )
        count_col, sums = None, {}
        for item in aggs:
            mc = _MV_COUNT.match(item)
            if mc:
                count_col = mc.group(1)
                continue
            ms = _MV_SUM.match(item)
            if ms:
                sums[ms.group(2)] = (ms.group(1), int(scale or 100))
                continue
            raise ValueError(
                f"unsupported aggregate {item!r}: incremental views take "
                "COUNT(*) AS c and SUM(col) AS s only (MIN/MAX need the "
                "dirty-group tier via the Python API)"
            )
        if count_col is None:
            raise ValueError("incremental views require COUNT(*) AS <name>")
        with open(self._mv_spec_path(name), "w") as fh:
            json.dump(
                {"base": base, "keys": keys, "count_col": count_col,
                 "sums": sums},
                fh,
            )
        mv = self._load_mv(name)
        r = mv.refresh()
        # Queryable immediately after CREATE — not only after the first
        # explicit REFRESH (same registration _refresh_mv performs).
        mv.read().createOrReplaceTempView(name)
        return {"created_view": name, **r}

    def _refresh_mv(self, name: str) -> dict:
        mv = self._load_mv(name)
        r = mv.refresh()
        mv.read().createOrReplaceTempView(name)
        return {"refreshed_view": name, **r}

    def _merge_upsert(
        self, name: str, source: str, on_clause: str, mor: str | None = None
    ) -> dict:
        """The UPDATE SET * / INSERT * MERGE (the reference's SCD1 form,
        _silver_utils.py:157-186): keys parsed from the ON equalities, the
        whole statement dispatched to the same scd1_apply the DataFrame API
        uses — source rows replace matching target rows wholesale, new keys
        insert. With the USING MERGE ON READ suffix the same statement
        lands as one deletion vector + one appended dir (upsert_mor)
        instead of a state rewrite. Conditional-clause MERGE variants stay
        out of the grammar deliberately (use APPLY CHANGES or the
        DataFrame API)."""
        from lakeflow.operators.merge import _dedup_source, scd1_apply

        pairs = _ON_EQ.findall(on_clause)
        if not pairs or any(a != b for a, b in pairs):
            raise ValueError(
                f"MERGE ON clause must be key equalities (t.k = s.k): "
                f"{on_clause!r}"
            )
        keys = [a for a, _b in pairs]
        src = source.strip()
        feed = self._query(
            src[1:-1] if src.startswith("(") and src.endswith(")") else
            f"SELECT * FROM {src}"
        )
        t = self.catalog.load(name)
        if mor:
            version = t.upsert_mor(_dedup_source(feed, keys, None), keys)
            return {
                "merged_into": name, "version": version, "keys": keys,
                "mor": True,
            }
        state = scd1_apply(t.read(), feed, keys=keys)
        version = t.commit(state, mode="overwrite")
        return {"merged_into": name, "version": version, "keys": keys, "mor": False}

    def _apply_changes(
        self,
        name: str,
        source: str,
        keys_csv: str,
        seq_col: str,
        op_col: str | None,
        delete_op: str | None,
    ) -> dict:
        """DLT's ``APPLY CHANGES INTO`` as a batch statement: fold an ordered
        changefeed (latest sequence wins per key; delete rows remove) into
        the versioned table and commit one snapshot. ``FROM`` takes a view
        name or a parenthesized SELECT; without an OPS clause every feed row
        is an upsert."""
        from lakeflow.operators.merge import apply_changes

        src = source.strip()
        feed = self._query(
            src[1:-1] if src.startswith("(") and src.endswith(")") else
            f"SELECT * FROM {src}"
        )
        keys = [k.strip() for k in keys_csv.split(",")]
        if op_col is None:
            # No OPS clause: every feed row is an upsert; synthesize the
            # column apply_changes keys its delete test on.
            from pyspark.sql import functions as F

            feed = feed.withColumn("__op", F.lit("U"))
            op_col, delete_op = "__op", "__never"
        t = self.catalog.load(name)
        target = None if t.current_version() is None else t.read()
        state = apply_changes(
            target, feed, keys, seq_col, op_col=op_col, delete_op=delete_op
        )
        version = t.commit(state, mode="overwrite")
        return {"applied_into": name, "version": version}

    def _query(self, sql: str) -> DataFrame:
        """Bind versioned-table references, then delegate to spark.sql.

        ``name FOR VERSION AS OF k`` pins that snapshot under a unique view
        name; bare references to catalog tables bind their LATEST snapshot.
        Views are (re)bound per statement — each query sees a consistent
        snapshot, later commits need a new statement to become visible.
        """
        tables = set(self.catalog.tables())

        def pin(m: re.Match) -> str:
            name, version = m.group(1), int(m.group(2))
            if name not in tables:
                return m.group(0)
            view = f"__{self.catalog.view_name(name)}_v{version}"
            self.catalog.load(name).read(version=version).createOrReplaceTempView(
                view
            )
            return view

        def pin_ts(m: re.Match) -> str:
            name, ts = m.group(1), m.group(2)
            if name not in tables:
                return m.group(0)
            t = self.catalog.load(name)
            version = t.version_at(ts)
            view = f"__{self.catalog.view_name(name)}_v{version}"
            t.read(version=version).createOrReplaceTempView(view)
            return view

        def pin_tag(m: re.Match) -> str:
            # Resolves tags first, then branch heads (Iceberg lets VERSION
            # AS OF name either kind of ref).
            name, ref = m.group(1), m.group(2)
            if name not in tables:
                return m.group(0)
            t = self.catalog.load(name)
            version = t.tags().get(ref)
            if version is None:
                if ref in t.branches():
                    b = t.branch(ref)
                    view = f"__{self.catalog.view_name(name)}_b_{ref}".replace(
                        ".", "_"
                    ).replace("-", "_")
                    b.read().createOrReplaceTempView(view)
                    return view
                raise ValueError(f"no such tag {ref!r} on {name}")
            view = f"__{self.catalog.view_name(name)}_v{version}"
            t.read(version=version).createOrReplaceTempView(view)
            return view

        rewritten = _TS_TRAVEL.sub(
            pin_ts, _TIME_TRAVEL.sub(pin, _TAG_TRAVEL.sub(pin_tag, sql))
        )
        # Latest-snapshot binding for bare references. Dotted (schema.table)
        # names rewrite to their mangled view alias and must bind BEFORE
        # flat names (longest first, dot-aware boundaries) so a flat `t`
        # never captures the `t` inside `s.t`.
        for name in sorted(tables, key=len, reverse=True):
            pattern = rf"(?<![\w.]){re.escape(name)}(?![\w.])"
            if re.search(pattern, rewritten):
                view = self.catalog.register_view(name)
                if view != name:
                    rewritten = re.sub(pattern, view, rewritten)
        return self.spark.sql(rewritten)
