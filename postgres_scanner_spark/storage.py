"""Managed writable store — the storage/ DML surface, Spark-style.

Parity with reference src/storage/{postgres_insert,postgres_delete,
postgres_update,postgres_transaction}.cpp: CREATE TABLE / CTAS,
INSERT, DELETE, UPDATE, DROP, and transactions on an attached
database.

Spark has no in-place mutation, so mutation = rewrite, which is also
the only strategy that scales on immutable columnar storage:
  INSERT  → append new parquet files (no shuffle, no rewrite)
  DELETE  → anti-join rewrite into a new snapshot version
  UPDATE  → projection rewrite into a new snapshot version
Transactions are snapshot versioning: every table lives under
  {root}/{table}/v{N}/*.parquet
with a `_current` pointer file; begin/commit/rollback swap pointers
atomically — the same MVCC shape Postgres gives the reference, and
what a lakehouse table format does at 100 TB (append/rewrite + atomic
pointer swap means writers never block readers).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class ConstraintError(ValueError):
    """Raised when an INSERT violates a table constraint (reference:
    attach_constraints.test expects 'duplicate key' / 'not-null' /
    'check constraint' in the error text)."""


class ManagedStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        # marker so Catalog.attach recognizes an EMPTY store dir too
        marker = os.path.join(root, "_managed_store")
        if not os.path.exists(marker):
            open(marker, "w").close()
        self._txn: dict[str, int] | None = None  # table → staged version

    # ---- helpers -------------------------------------------------
    def _tdir(self, table: str) -> str:
        """Qualified names ('sales.orders') map to schema subdirs;
        unqualified names live in the default (root) namespace —
        reference: storage/postgres_schema_set.cpp exposes PG schemas
        as sub-namespaces of the attached catalog."""
        if "." in table:
            schema, _, name = table.partition(".")
            return os.path.join(self.root, schema, name)
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_current")

    def current_version(self, table: str) -> int:
        with open(self._pointer(table)) as fh:
            return int(fh.read().strip())

    def _set_version(self, table: str, v: int) -> None:
        tmp = self._pointer(table) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, self._pointer(table))  # atomic pointer swap

    def _vdir(self, table: str, v: int) -> str:
        return os.path.join(self._tdir(table), f"v{v}")

    def _read_version(self, table: str, v: int) -> DataFrame:
        return self.spark.read.parquet(self._vdir(table, v))

    def _write_new_version(self, table: str, df: DataFrame) -> int:
        # base on the *visible* version: inside a transaction, successive
        # DML statements must stack on each other's staged versions, and a
        # table created in-txn has no committed pointer yet
        v = self._visible_version(table) + 1
        df.write.mode("overwrite").parquet(self._vdir(table, v))
        if self._txn is not None:
            self._txn[table] = v
        else:
            self._set_version(table, v)
        return v

    def _visible_version(self, table: str) -> int:
        if self._txn is not None and table in self._txn:
            return self._txn[table]
        return self.current_version(table)

    # ---- catalog ops (reference: storage/postgres_table_set.cpp) --
    def tables(self) -> list[str]:
        """All tables, qualified ('schema.table') for non-default
        schemas (reference: postgres_table_set.cpp LoadEntries walks
        every schema)."""
        out = []
        for d in os.listdir(self.root):
            if os.path.isfile(os.path.join(self.root, d, "_current")):
                out.append(d)
            elif os.path.isfile(os.path.join(self.root, d, "_schema")):
                for t in os.listdir(os.path.join(self.root, d)):
                    if os.path.isfile(
                            os.path.join(self.root, d, t, "_current")):
                        out.append(f"{d}.{t}")
        return sorted(out)

    # ---- schemas (reference: storage/postgres_schema_set.cpp,
    #      test/sql/storage/attach_schemas.test)
    def create_schema(self, name: str, *, if_not_exists: bool = False) -> None:
        d = os.path.join(self.root, name)
        marker = os.path.join(d, "_schema")
        if os.path.exists(marker):
            if if_not_exists:
                return
            raise ValueError(f"schema {name!r} already exists")
        os.makedirs(d, exist_ok=True)
        open(marker, "w").close()

    def schemas(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, d, "_schema")))

    def drop_schema(self, name: str, *, cascade: bool = False,
                    if_exists: bool = False) -> None:
        d = os.path.join(self.root, name)
        if not os.path.isfile(os.path.join(d, "_schema")):
            if if_exists:
                return
            raise ValueError(f"no such schema {name!r}")
        leftover = [t for t in os.listdir(d) if t != "_schema"]
        if leftover and not cascade:
            raise ValueError(
                f"schema {name!r} not empty (use cascade): {leftover}")
        shutil.rmtree(d)

    # ---- views (reference: storage/postgres_catalog.cpp view entries,
    #      test/sql/storage/attach_views.test). A view is stored SQL
    #      text; resolution happens through the session catalog where
    #      the store's tables are registered as temp views.
    def _vpath(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.view.sql")

    def create_view(self, name: str, sql: str, *,
                    or_replace: bool = False) -> None:
        if os.path.exists(self._vpath(name)) and not or_replace:
            raise ValueError(f"view {name!r} already exists")
        with open(self._vpath(name), "w") as fh:
            fh.write(sql)

    def views(self) -> list[str]:
        return sorted(
            f[: -len(".view.sql")] for f in os.listdir(self.root)
            if f.endswith(".view.sql"))

    def view_sql(self, name: str) -> str:
        with open(self._vpath(name)) as fh:
            return fh.read()

    def drop_view(self, name: str, *, if_exists: bool = False) -> None:
        if not os.path.exists(self._vpath(name)):
            if if_exists:
                return
            raise ValueError(f"no such view {name!r}")
        os.remove(self._vpath(name))

    def scan_view(self, name: str, *, register: bool = True) -> DataFrame:
        """Evaluate a stored view. With register=True (standalone use)
        the store's tables are (re)registered under bare names so the
        view text resolves; Catalog callers pass register=False — they
        own the session's view namespace and registering here would
        clobber same-named views of OTHER attached databases and leak
        untracked names detach() never drops."""
        if register:
            for t in self.tables():
                self.scan(t).createOrReplaceTempView(t.replace(".", "_"))
                if "." not in t:
                    self.scan(t).createOrReplaceTempView(t)
        return self.spark.sql(self.view_sql(name))

    # ---- constraints & defaults (reference: postgres_table_set.cpp
    #      CreateTable constraint handling; attach_constraints.test,
    #      attach_defaults.test). Metadata lives in _meta.json beside
    #      the version dirs so it survives every snapshot rewrite.
    def _meta_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_meta.json")

    def table_meta(self, table: str) -> dict:
        p = self._meta_path(table)
        if not os.path.exists(p):
            return {}
        with open(p) as fh:
            return json.load(fh)

    def set_table_meta(self, table: str, meta: dict) -> None:
        tmp = self._meta_path(table) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._meta_path(table))

    def describe(self, table: str) -> list[dict]:
        """DESCRIBE/PRAGMA table_info shape (reference:
        attach_describe.test): column name, engine type, nullability
        (NO for NOT NULL / PK members), key flag, default expr."""
        meta = self.table_meta(table)
        not_null = set(meta.get("not_null", ()))
        pk_cols = set()
        for keycols in meta.get("keys", ()):
            pk_cols.update(keycols)
        defaults = meta.get("defaults", {})
        out = []
        for i, f in enumerate(self.scan(table).schema.fields):
            out.append({
                "cid": i,
                "column_name": f.name,
                "column_type": f.dataType.simpleString().upper(),
                "null": "NO" if f.name in not_null else "YES",
                "key": "PRI" if f.name in pk_cols else None,
                "default": defaults.get(f.name),
            })
        return out

    def create_table(self, table: str, df: DataFrame, *,
                     if_not_exists: bool = False,
                     or_replace: bool = False,
                     meta: dict | None = None) -> None:
        """CREATE TABLE AS (reference: postgres_insert.cpp AddCast/
        CreateTableAs path + postgres_table_set.cpp CreateTable).

        `meta` carries constraints/defaults:
          {"not_null": [col], "keys": [[cols], ...],  # PK+UNIQUE
           "checks": [sql_expr], "defaults": {col: sql_expr}}
        """
        if or_replace and (os.path.exists(self._pointer(table)) or (
                self._txn is not None and table in self._txn)):
            if self._txn is not None and os.path.exists(
                    self._pointer(table)):
                raise RuntimeError(
                    "CREATE OR REPLACE of a committed table inside a "
                    "transaction is not supported: the replace removes "
                    "the committed snapshot immediately and ROLLBACK "
                    "could not restore it")
            self.drop_table(table)
        if os.path.exists(self._pointer(table)) or (
                self._txn is not None and table in self._txn):
            if if_not_exists:
                return
            raise ValueError(f"table {table!r} already exists")
        if "." in table:
            schema = table.partition(".")[0]
            if not os.path.isfile(os.path.join(self.root, schema, "_schema")):
                if schema == "pg_temp":
                    # the temp namespace materializes on first use
                    # (reference: attach_temporary_table.test — PG
                    # creates pg_temp lazily per session)
                    self.create_schema("pg_temp", if_not_exists=True)
                else:
                    raise ValueError(f"no such schema {schema!r}")
        os.makedirs(self._tdir(table), exist_ok=True)
        if meta:
            self.set_table_meta(table, meta)
        df.write.mode("overwrite").parquet(self._vdir(table, 0))
        if self._txn is not None:
            # stage only: the _current pointer appears at commit(), so
            # rollback() can remove the directory without a trace
            # (reference: postgres_table_set.cpp CreateTable in-txn)
            self._txn[table] = 0
        else:
            self._set_version(table, 0)

    def drop_table(self, table: str, *, if_exists: bool = False) -> None:
        if not os.path.exists(self._tdir(table)):
            if if_exists:
                return
            raise ValueError(f"no such table {table!r}")
        if self._txn is not None and os.path.exists(self._pointer(table)):
            # a committed table's dir would be rmtree'd NOW — rollback
            # could not undo it; only tables created inside this txn
            # (no committed pointer yet) may be dropped transactionally
            raise RuntimeError(
                "DROP TABLE of a committed table inside a transaction "
                "is not supported (destructive DDL is immediate here)")
        if self._txn is not None:
            self._txn.pop(table, None)
        shutil.rmtree(self._tdir(table))

    def scan(self, table: str) -> DataFrame:
        return self._read_version(table, self._visible_version(table))

    # ---- DML (reference: storage/postgres_insert/delete/update) ---
    def _apply_defaults(self, table: str, df: DataFrame, cur: DataFrame,
                        columns: list[str] | None) -> DataFrame:
        """INSERT with an explicit column list: named columns come from
        the batch, missing columns get their DEFAULT expression (or
        NULL) — reference: attach_defaults.test."""
        if columns is None:
            return df.toDF(*cur.columns)
        seen: set[str] = set()
        for c in columns:
            if c in seen:
                raise ValueError(f'Duplicate column name "{c}"')
            if c not in cur.columns:
                raise ValueError(
                    f'table {table!r} does not have a column with '
                    f'name "{c}"')
            seen.add(c)
        df = df.toDF(*columns)
        defaults = self.table_meta(table).get("defaults", {})
        proj = [
            F.col(c) if c in seen
            else F.expr(defaults.get(c, "NULL")).alias(c)
            for c in cur.columns
        ]
        return df.select(*proj)

    def _enforce_constraints(self, table: str, batch: DataFrame,
                             cur: DataFrame) -> None:
        """Validate an insert batch against the table's declared
        constraints, fully distributed (reference delegates this to
        Postgres indexes — attach_constraints.test):

        - NOT NULL + CHECK: ONE aggregate pass over the batch (a
          single map-side-combined count per rule, no per-rule scan).
        - PRIMARY KEY / UNIQUE: duplicate detection inside the batch
          (groupBy the key) and against existing rows (semi-join on
          the key). At 100 TB the semi-join is the inherent price of
          uniqueness on columnar storage; the CREATE INDEX clustering
          rewrite keeps it pruned via row-group stats.
        """
        meta = self.table_meta(table)
        if not meta:
            return
        aggs = []
        labels = []
        for c in meta.get("not_null", ()):
            aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)))
            labels.append(f'not-null constraint violated: column "{c}"')
        for c, lim in meta.get("char_limits", {}).items():
            # PG length rule for char(n)/varchar(n): over-length is an
            # error UNLESS the excess is all spaces (then silently
            # truncated) — so the check measures the TRIMMED length
            # (reference: attach_types_char.test:30-33)
            tname = (f"character({lim['n']})" if lim.get("pad")
                     else f"character varying({lim['n']})")
            aggs.append(F.sum(F.when(
                F.length(F.rtrim(F.col(c))) > lim["n"], 1).otherwise(0)))
            labels.append(f"value too long for type {tname}")
        for expr in meta.get("checks", ()):
            cond = F.expr(expr)
            aggs.append(F.sum(F.when(cond | cond.isNull(), 0).otherwise(1)))
            labels.append(f"check constraint violated: CHECK ({expr})")
        if aggs:
            row = batch.agg(*aggs).collect()[0]
            for n, label in zip(row, labels):
                if n:
                    raise ConstraintError(label)
        # key comparison happens on the NORMALIZED values: bpchar
        # ignores trailing blanks in comparisons (PG rejects inserting
        # 'a ' next to 'a' in a CHAR PK), and stored rows are already
        # trimmed — comparing raw batch values against trimmed stored
        # ones would let post-trim duplicates through
        normed = self._apply_char_limits(table, batch)
        for keycols in meta.get("keys", ()):
            # SQL UNIQUE treats NULL keys as distinct — drop them first
            keyed = normed
            for c in keycols:
                keyed = keyed.filter(F.col(c).isNotNull())
            keyed = keyed.select(*keycols)
            dup_in_batch = (keyed.groupBy(*keycols).count()
                            .filter(F.col("count") > 1))
            if not dup_in_batch.isEmpty():
                raise ConstraintError(
                    f"duplicate key in insert batch on ({', '.join(keycols)})")
            if not keyed.join(cur, on=list(keycols), how="left_semi").isEmpty():
                raise ConstraintError(
                    f"duplicate key value violates unique constraint on "
                    f"({', '.join(keycols)})")

    def _apply_char_limits(self, table: str, df: DataFrame) -> DataFrame:
        """Normalize declared char(n)/varchar(n) columns AFTER the
        too-long check passed: char(n) stores trailing-space-trimmed
        (PG pads to n; the reference scan reads the value back
        blank-stripped — attach_types_char.test: 'hello     ' in a
        CHAR(10) reads as 'hello', LENGTH 5); varchar(n) keeps inner
        content but silently drops the all-space excess beyond n
        ('hello     ' in VARCHAR(10) stays LENGTH 10)."""
        lims = self.table_meta(table).get("char_limits", {})
        if not lims:
            return df
        proj = []
        for c in df.columns:
            lim = lims.get(c)
            if lim is None:
                proj.append(F.col(c))
            elif lim.get("pad"):
                proj.append(F.rtrim(F.col(c)).alias(c))
            else:
                proj.append(F.when(
                    F.length(F.col(c)) > lim["n"],
                    F.substring(F.col(c), 1, lim["n"])
                ).otherwise(F.col(c)).alias(c))
        return df.select(*proj)

    def insert(self, table: str, df: DataFrame,
               columns: list[str] | None = None) -> None:
        """Append-only insert: new files land in a new snapshot that
        unions prior data by reference (no rewrite of old files —
        at 100 TB an insert must never touch existing data)."""
        v = self._visible_version(table)
        cur = self._read_version(table, v)
        new_v = v + 1
        vdir = self._vdir(table, new_v)
        # cast every column to the table's schema before appending —
        # otherwise an INT32-typed literal lands next to INT64 files and
        # reads fail/mis-type depending on which footer Spark samples
        # (reference: postgres_insert.cpp AddCast)
        batch = self._apply_defaults(table, df, cur, columns).select([
            F.col(c).cast(cur.schema[c].dataType) for c in cur.columns
        ])
        # validate BEFORE the new snapshot dir exists so a rejected
        # insert leaves no trace on disk (length check precedes the
        # char normalization — truncation must never mask a genuine
        # over-length error)
        self._enforce_constraints(table, batch, cur)
        batch = self._apply_char_limits(table, batch)
        # copy prior files by hard link (cheap snapshot), append new part
        os.makedirs(vdir, exist_ok=True)
        src = self._vdir(table, v)
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                os.link(os.path.join(src, f), os.path.join(vdir, f))
        batch.write.mode("append").parquet(vdir)
        if self._txn is not None:
            self._txn[table] = new_v
        else:
            self._set_version(table, new_v)

    def delete(self, table: str, condition: str) -> int:
        """DELETE WHERE cond → keep anti-matching rows
        (reference: storage/postgres_delete.cpp uses ctid batches;
        rewrite is the columnar-native equivalent)."""
        cur = self.scan(table)
        if condition.strip().lower() in ("true", "1=1", "1 = 1"):
            # whole-table DELETE: a constant-true filter would fold the
            # plan to an empty relation and drop the observe node —
            # truncate explicitly instead
            n = cur.count()
            self._write_new_version(
                table, self.spark.createDataFrame([], cur.schema))
            return n
        cond = F.expr(condition)
        obs = Observation()
        # single pass: the rewrite action also observes the match count
        # (no separate .count() scan — at 100 TB that doubles every DML);
        # NULL-condition rows are kept, matching SQL DELETE semantics
        kept = (
            cur.observe(obs, F.sum(F.when(cond, 1).otherwise(0)).alias("n"))
            .filter(~cond | cond.isNull())
        )
        self._write_new_version(table, kept)
        return int(obs.get["n"] or 0)

    def update(self, table: str, condition: str,
               assignments: dict[str, str]) -> int:
        """UPDATE SET col=expr WHERE cond → projection rewrite
        (reference: storage/postgres_update.cpp). Declared constraints
        are enforced on the rewritten rows (Postgres enforces them on
        UPDATE exactly as on INSERT)."""
        cur = self.scan(table)
        cond = F.expr(condition)
        schema = cur.schema
        for c in assignments:
            if c not in cur.columns:
                raise ValueError(
                    f'table {table!r} does not have a column with '
                    f'name "{c}"')
        # updated expressions cast back to the column's declared type so a
        # rewrite can never change the table schema (postgres_insert.cpp
        # AddCast applies to UPDATE's row refeed as well)
        proj = [
            F.when(cond, F.expr(assignments[c]).cast(schema[c].dataType))
            .otherwise(F.col(c)).alias(c)
            if c in assignments else F.col(c)
            for c in cur.columns
        ]
        obs = Observation()
        out = cur.observe(
            obs, F.sum(F.when(cond, 1).otherwise(0)).alias("n")
        ).select(*proj)
        # constraints hold under UPDATE too: validate only the rows
        # the rewrite touches, against the untouched remainder — the
        # same checks insert() runs, keyed to the DELTA, not the table
        if self.table_meta(table):
            updated = cur.filter(cond).select(*proj)
            kept = cur.filter(~cond | cond.isNull())
            self._enforce_constraints(table, updated, kept)
            out = self._apply_char_limits(table, out)
        self._write_new_version(table, out)
        return int(obs.get["n"] or 0)


    def merge(self, table: str, source: DataFrame, on: list[str],
              update_all: bool = True,
              insert_all: bool = True) -> tuple[int, int]:
        """MERGE (upsert): `WHEN MATCHED THEN UPDATE SET *` /
        `WHEN NOT MATCHED THEN INSERT *` — the delta-style upsert the
        SQL-standard MERGE reduces to when the source carries full
        rows. One snapshot rewrite: unchanged rows are kept by
        anti-join, each matched TARGET row is updated in place to its
        source version (a target with duplicate keys keeps its
        cardinality — SQL MERGE updates every matching row, it never
        collapses them), unmatched source rows append. Errors on
        duplicate source keys (SQL MERGE's cardinality rule: a target
        row may match at most one source row; the target side has no
        such rule).

        Scale: the rewrite is one key-shuffled join; at 100 TB the
        kept side prunes to the key-range partitions the source
        actually touches (clustering index), so merge cost follows
        the DELTA's key spread, not table size. Returns
        (n_updated, n_inserted)."""
        cur = self.scan(table)
        schema = cur.schema
        missing = [c for c in cur.columns if c not in source.columns]
        if missing:
            raise ValueError(f"MERGE source lacks column(s) {missing}")
        # several passes read the source (stats, union): one
        # materialization
        src = source.select([F.col(c).cast(schema[c].dataType)
                             for c in cur.columns]).persist()
        try:
            # ONE stats job replaces the former three (dup-key check +
            # n_upd count + n_ins count): a streaming caller pays this
            # per micro-batch, so each merge was 4 Spark actions where
            # 2 suffice (r13; guide §2.6 — fewer serialized driver
            # round-trips, same answers). Per key:
            #   _scnt = source rows, _tcnt = matching target rows.
            # NULL-keyed source rows can never match a target row
            # (ON equality is not true for NULL = NULL), so they are
            # exempt from the cardinality rule and always insert;
            # groupBy collapses them into one all-NULL key row that a
            # key-equality join also never matches, keeping their
            # _tcnt NULL.
            nonnull = F.lit(True)
            for c in on:
                nonnull = nonnull & F.col(c).isNotNull()
            stats = (src.groupBy(*on).agg(F.count("*").alias("_scnt"))
                     .withColumn("_keyed", nonnull)
                     .join(cur.groupBy(*on).agg(
                         F.count("*").alias("_tcnt")), on, "left_outer")
                     .agg(
                         F.max(F.when(F.col("_keyed")
                                      & (F.col("_scnt") > 1), 1)
                               .otherwise(0)).alias("_dup"),
                         F.sum(F.when(F.col("_keyed")
                                      & F.col("_tcnt").isNotNull(),
                                      F.col("_tcnt")).otherwise(0))
                         .alias("_n_upd"),
                         F.sum(F.when(F.col("_keyed")
                                      & F.col("_tcnt").isNotNull(), 0)
                               .otherwise(F.col("_scnt")))
                         .alias("_n_ins")).collect()[0])
            if stats["_dup"]:
                raise ValueError(
                    "MERGE source has duplicate join keys — a target "
                    "row may match at most one source row")
            key_set = cur.select(*on).distinct()
            # one updated row PER MATCHING TARGET ROW: join the
            # target's key multiset (dups and all) to the unique-keyed
            # source, so a target holding k rows for a key yields k
            # updated rows, not 1 (SQL MERGE updates each match)
            matched = (cur.select(*on).join(src, on, "inner")
                       .select(*cur.columns))
            unmatched = src.join(key_set, on, "left_anti")
            n_upd = int(stats["_n_upd"] or 0) if update_all else 0
            n_ins = int(stats["_n_ins"] or 0) if insert_all else 0
            kept = (cur.join(src.select(*on).distinct(), on, "left_anti")
                    if update_all else cur)
            out = kept
            if update_all:
                out = out.unionByName(matched)
            if insert_all:
                out = out.unionByName(unmatched)
            if self.table_meta(table):
                delta = matched if update_all else \
                    self.spark.createDataFrame([], schema)
                if insert_all:
                    delta = delta.unionByName(unmatched)
                self._enforce_constraints(table, delta, kept)
            self._write_new_version(table, out)
        finally:
            src.unpersist()
        return n_upd, n_ins

    # ---- schema evolution (reference: storage/postgres_alter.cpp /
    #      attach_alter.test) — projection rewrite, the columnar-native
    #      ALTER strategy
    def add_column(self, table: str, name: str, expr: str = "NULL",
                   dtype: str | None = None) -> None:
        cur = self.scan(table)
        col = F.expr(expr)
        if dtype:
            col = col.cast(dtype)
        self._write_new_version(table, cur.withColumn(name, col))

    def rename_table(self, table: str, new: str) -> None:
        """ALTER TABLE .. RENAME TO (reference: attach_alter.test
        `ALTER TABLE s1.test RENAME TO test2`): a directory rename —
        versions, pointer, and constraint meta move together in one
        atomic POSIX rename, no data rewrite at any size. A
        schema-qualified source keeps its schema (PG semantics: RENAME
        cannot move between schemas)."""
        if self._txn is not None:
            raise NotImplementedError(
                "RENAME TO inside an open transaction is not supported")
        if "." in table and "." not in new:
            new = table.partition(".")[0] + "." + new
        src, dst = self._tdir(table), self._tdir(new)
        if not os.path.isdir(src):
            raise ValueError(f"table {table!r} does not exist")
        if os.path.exists(dst):
            raise ValueError(f"table {new!r} already exists")
        os.rename(src, dst)

    def rename_column(self, table: str, old: str, new: str) -> None:
        self._write_new_version(table,
                                self.scan(table).withColumnRenamed(old, new))

    def drop_column(self, table: str, name: str) -> None:
        self._write_new_version(table, self.scan(table).drop(name))

    # ---- CREATE INDEX (reference: storage/postgres_index.cpp /
    #      attach_create_index.test). Columnar stores have no B-trees;
    #      the distributed equivalent is clustering: rewrite sorted on
    #      the key so min/max row-group stats give index-like pruning.
    def create_index(self, table: str, column: str) -> None:
        self._write_new_version(
            table,
            self.scan(table).repartitionByRange(8, column)
            .sortWithinPartitions(column))

    # ---- time travel. Snapshot versioning gives historical reads
    #      for free (Postgres exposes MVCC snapshots the same way
    #      inside a transaction); every DML/DDL statement creates a
    #      new version dir until CHECKPOINT/VACUUM reclaims them.
    def scan_at(self, table: str, version: int) -> DataFrame:
        """Read a historical snapshot (time travel). Raises if the
        version was garbage-collected by CHECKPOINT/VACUUM."""
        vd = self._vdir(table, version)
        if not os.path.isdir(vd):
            raise ValueError(
                f"table {table!r} has no version {version} "
                f"(vacuumed or never existed)")
        return self._read_version(table, version)

    def history(self, table: str) -> list[dict]:
        """Retained versions, oldest first, with file stats."""
        out = []
        cur = self.current_version(table)
        for d in sorted(os.listdir(self._tdir(table))):
            if not d.startswith("v") or not d[1:].isdigit():
                continue
            v = int(d[1:])
            vd = self._vdir(table, v)
            files = [f for f in os.listdir(vd) if f.endswith(".parquet")]
            out.append({
                "version": v,
                "is_current": v == cur,
                "n_files": len(files),
                "bytes": sum(os.path.getsize(os.path.join(vd, f))
                             for f in files),
            })
        return out

    def vacuum(self, table: str | None = None) -> int:
        """Reclaim superseded snapshot versions WITHOUT rewriting the
        current one (PG parity: VACUUM frees dead tuples in place;
        CHECKPOINT additionally compacts). Returns dirs removed."""
        if self._txn is not None:
            raise RuntimeError("cannot VACUUM inside a transaction")
        removed = 0
        for t in ([table] if table else self.tables()):
            cur = self.current_version(t)
            for d in os.listdir(self._tdir(t)):
                if d.startswith("v") and d[1:].isdigit() \
                        and int(d[1:]) != cur:
                    shutil.rmtree(os.path.join(self._tdir(t), d),
                                  ignore_errors=True)
                    removed += 1
        return removed

    # ---- CHECKPOINT (reference: attach_checkpoint.test — forwards
    #      CHECKPOINT to the attached db). For a snapshot-versioned
    #      columnar store the equivalent maintenance op is compaction:
    #      rewrite the live snapshot into fresh files and garbage-
    #      collect superseded version dirs (deleted/updated rows stop
    #      occupying disk; hard-linked survivors are unaffected).
    def checkpoint(self, table: str | None = None) -> None:
        if self._txn is not None:
            raise RuntimeError("cannot CHECKPOINT inside a transaction")
        for t in ([table] if table else self.tables()):
            cur = self.current_version(t)
            df = self._read_version(t, cur)
            new_v = cur + 1
            df.write.mode("overwrite").parquet(self._vdir(t, new_v))
            self._set_version(t, new_v)
            for d in os.listdir(self._tdir(t)):
                if d.startswith("v") and d != f"v{new_v}":
                    shutil.rmtree(os.path.join(self._tdir(t), d),
                                  ignore_errors=True)

    # ---- transactions (reference: storage/postgres_transaction.cpp)
    def begin(self) -> None:
        if self._txn is not None:
            raise RuntimeError("transaction already open")
        self._txn = {}

    def commit(self) -> None:
        if self._txn is None:
            raise RuntimeError("no transaction")
        staged, self._txn = self._txn, None
        for table, v in staged.items():
            self._set_version(table, v)

    def rollback(self) -> None:
        if self._txn is None:
            raise RuntimeError("no transaction")
        staged, self._txn = self._txn, None
        for table, v in staged.items():
            if not os.path.exists(self._pointer(table)):
                # created inside this transaction, never committed —
                # remove the whole staged table directory
                shutil.rmtree(self._tdir(table), ignore_errors=True)
                continue
            # drop staged versions newer than the committed pointer
            cur = self.current_version(table)
            for cand in range(cur + 1, v + 1):
                vd = self._vdir(table, cand)
                if os.path.exists(vd):
                    shutil.rmtree(vd)
