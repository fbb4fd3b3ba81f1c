"""Sinks: parquet (fixtures) and JDBC (MySQL-family), plus the sink-side
DDL executor and the dump-ddl mode.

The reference hand-builds multi-row INSERTs inside page transactions
(/root/reference/cmd/root.go:362-465) with a 65535-placeholder clamp
(cmd/root.go:376). Spark's JDBC writer already batches via
addBatch/executeBatch (no placeholder explosion), keeps one transaction
per partition, and `truncate=true` reproduces truncate-before-load
(cmd/root.go:265-273) without dropping target DDL.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class DdlResult:
    executed: list[str] = field(default_factory=list)
    failed: list[tuple[str, str]] = field(default_factory=list)  # (sql, error)

    @property
    def failed_count(self) -> int:
        # mirrors the per-object failure counters the reference renders
        # (cmd/tablemeta.go:14,184; cmd/root.go:188-200)
        return len(self.failed)


class ParquetSink:
    """Fixture sink. `truncate`/overwrite semantics map to parquet
    overwrite; append maps to append."""

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.out_dir, f"{table}.parquet")

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(self.path(table))

    def align_to_target(self, df: DataFrame, table: str) -> DataFrame:
        """Superset-target column matching (cmd/root.go:364,435 — the
        reference always inserts BY COLUMN LIST so a target with extra
        columns works): project the source columns in target order and
        null-fill target-only columns. Raises when the target lacks a
        source column — that is a real schema conflict, not evolution."""
        from pyspark.sql import functions as F

        target = self.read(table).schema
        target_names = [f.name for f in target.fields]
        missing = [c for c in df.columns if c not in target_names]
        if missing:
            raise ValueError(f"target {table} lacks source columns {missing}")
        cols = [
            F.col(f.name) if f.name in df.columns else F.lit(None).cast(f.dataType).alias(f.name)
            for f in target.fields
        ]
        return df.select(*cols)

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        n_buckets: int = 32,
        mode: str = "overwrite",
    ) -> None:
        """Bucketed write: both sides of a recurring equi-join written
        with the same (cols, n_buckets) join WITHOUT a shuffle — the
        scan is already hash-partitioned on the join key. At 100 TB this
        converts every downstream fact-fact join on the bucket key from
        a full shuffle into a zipped scan. Requires a table catalog
        (saveAsTable); the in-memory session catalog works locally, a
        metastore persists it on a cluster."""
        (
            df.write.mode(mode)
            .option("path", self.path(table) + ".bucketed")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
            .format("parquet")
            .saveAsTable(table)
        )

    def read_bucketed(self, table: str) -> DataFrame:
        return self.spark.table(table)

    def write_partitioned(
        self,
        df: DataFrame,
        table: str,
        partition_cols: list[str],
        mode: str = "overwrite",
    ) -> None:
        """Hive-style partitioned layout (one directory per partition
        value): time/tenant filters on downstream reads become partition
        PRUNING — directories never opened — instead of row filters. The
        layout choice for any append-mostly 100 TB fact table."""
        df.write.mode(mode).partitionBy(*partition_cols).parquet(self.path(table))

    def write_zordered(
        self,
        df: DataFrame,
        table: str,
        x_col: str,
        y_col,
        n_files: int = 32,
        mode: str = "overwrite",
    ) -> None:
        """Z-order clustered layout (round 8): rows range-partitioned
        and sorted by the Morton interleave of two bucketed dimensions
        (ext/layout.zorder_key), so parquet row-group min/max footers
        prune on BOTH dimensions — the OPTIMIZE ZORDER BY of the lake
        formats, expressed with vanilla repartitionByRange +
        sortWithinPartitions. Measure the expected benefit FIRST with
        ext/layout.zorder_layout_audit (q198); the key column is
        dropped from the written files."""
        from .ext.layout import zorder_key

        keyed = zorder_key(df, x_col, y_col)
        (
            keyed.repartitionByRange(n_files, "zval")
            .sortWithinPartitions("zval")
            .drop("_bx", "_by", "zval")
            .write.mode(mode)
            .parquet(self.path(table))
        )

    def write_sized(
        self,
        df: DataFrame,
        table: str,
        target_mb: float = 128,
        mode: str = "overwrite",
    ) -> None:
        """Size-targeted output: repartition so each output file lands
        near `target_mb` — the guard against the small-files problem
        (a 100 TB table written from 20k tasks at default partitioning
        is 20k tiny files; every later scan pays per-file open cost and
        the NameNode/listing pays per-object cost). The partition count
        comes from Catalyst's sizeInBytes estimate of THIS plan — no
        extra pass over the data."""
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        n = max(1, -(-size // int(target_mb * 1024 * 1024)))
        df.repartition(n).write.mode(mode).parquet(self.path(table))

    def compact(self, table: str, target_mb: float = 128) -> None:
        """Rewrite an existing table's files at the target size — the
        maintenance pass after many small incremental appends. Reads
        then overwrites atomically via a temp suffix + rename (the
        read and the overwrite cannot share the same files)."""
        import shutil

        df = self.read(table)
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        n = max(1, -(-size // int(target_mb * 1024 * 1024)))
        tmp = self.path(table) + ".compact_tmp"
        df.repartition(n).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.path(table))
        os.rename(tmp, self.path(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))


class SqlScriptSink:
    """Dump-ddl mode (K6, flag -m at cmd/root.go:540): write every DDL to
    a .sql script, execute nothing (LogOutput, cmd/app.go:132-152)."""

    def __init__(self, path: str):
        self.path = path
        self._fh = None

    def __enter__(self):
        self._fh = open(self.path, "a", encoding="utf-8")
        return self

    def __exit__(self, *exc):
        if self._fh:
            self._fh.close()

    def execute(self, sql: str) -> None:
        assert self._fh is not None, "use as context manager"
        self._fh.write(sql.rstrip() + "\n")


class JdbcSink:
    """SQL-database sink, MySQL-family by default. Data path uses
    Spark's JDBC writer; DDL path needs a raw connection because
    Spark's writer can't express defaults, comments, indexes or FKs
    (SURVEY K4/K5) — we reuse the JVM's DriverManager through the
    gateway so no extra Python driver is required.

    dialect controls identifier quoting only: "mysql" backtick-quotes
    (the reference's target family, cmd/root.go:364), "ansi" passes
    lowercase names unquoted and lets the engine case-fold — which is
    what embedded Derby needs, and what the in-container e2e
    (tests/test_jdbc_derby.py) runs the whole write/DDL/read-back path
    against. MySQL itself stays untested in this container (no server);
    its quoting is covered by unit tests over the generated SQL."""

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        user: str,
        password: str,
        dialect: str = "mysql",
    ):
        self.spark = spark
        self.url = url
        self.user = user
        self.password = password
        self.dialect = dialect

    def _ident(self, name: str) -> str:
        if self.dialect == "mysql":
            return f"`{name.lower()}`"
        from .ddl import q_ansi  # reserved words get quoted (ADVICE r5)

        return q_ansi(name)

    def read(self, table: str) -> DataFrame:
        """Read the target table back (compare phase, EP2). Column names
        surface lowercased regardless of the engine's case-folding, so
        compare sees identical schemas on both sides (T6)."""
        df = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self._ident(table))
            .option("user", self.user)
            .option("password", self.password)
            .load()
        )
        return df.toDF(*[c.lower() for c in df.columns])

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append",
        truncate: bool = True,
        batchsize: int = 1000,
        num_partitions: int | None = None,
    ) -> None:
        """K1/K2/K3: batched load. `batchsize` maps the reference's
        batchRowSize (example.yml:15); `truncate` with overwrite keeps
        the target DDL (cmd/root.go:268)."""
        w = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self._ident(table))
            .option("user", self.user)
            .option("password", self.password)
            .option("batchsize", str(batchsize))
            .option("isolationLevel", "READ_COMMITTED")
        )
        if num_partitions:
            w = w.option("numPartitions", str(num_partitions))
        if mode == "overwrite" and truncate:
            w = w.option("truncate", "true")
        w.mode(mode).save()

    def execute_ddl(self, statements: list[str]) -> DdlResult:
        """K4/K5: run DDL on a raw JDBC connection via the JVM gateway;
        capture per-statement failures instead of aborting (matches the
        reference's count-and-continue, tablemeta.go:209-215)."""
        res = DdlResult()
        jvm = self.spark._jvm  # noqa: SLF001 — Py4J gateway access is the point
        conn = jvm.java.sql.DriverManager.getConnection(self.url, self.user, self.password)
        try:
            stmt = conn.createStatement()
            for sql in statements:
                try:
                    stmt.execute(sql)
                    res.executed.append(sql)
                except Exception as e:  # noqa: BLE001 — per-object error capture
                    res.failed.append((sql, str(e)))
            stmt.close()
        finally:
            conn.close()
        return res
