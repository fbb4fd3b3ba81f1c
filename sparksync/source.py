"""Partitioned sources: JDBC (Oracle) and parquet (fixtures).

The reference parallelizes reads by slicing each table into ROWNUM
windows of `pageSize` rows and running one goroutine per window
(/root/reference/cmd/root.go:308-340). Spark's native equivalents:

- parquet: the scan is already split by file/rowgroup
  (spark.sql.files.maxPartitionBytes); nothing to do.
- JDBC with a numeric key: partitionColumn/lowerBound/upperBound/
  numPartitions — each executor issues its own range query.
- JDBC without a usable key: explicit ROWNUM `predicates` built with the
  same ceil(count/pageSize) math (S4, cmd/root.go:320-322). ROWNUM
  windows are unordered across queries, so this is only exact on a
  quiesced source — same caveat the reference silently accepts
  (SURVEY section 7 "What's hard" #4).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Schema memo for load_table (round 15, guide §1.2 fixed costs):
# DataFrameReader.parquet() resolves the schema EAGERLY, which runs a
# 1-task footer-read job on every call — one to two such jobs per query
# per bench run, pure fixed cost. The memo holds METADATA only (a
# StructType, never data) and is keyed on (path, mtime_ns, size), so a
# rewritten file — the CLI tamper probe, a re-synced dest — re-infers.
# For a Spark-written table the path is a DIRECTORY whose mtime/size
# do not change when a part file is rewritten in place (ADVICE r15),
# so the key additionally folds in the newest part file's
# (name, mtime_ns, size) and the file count — an in-place part rewrite
# bumps that mtime and misses the memo. Any stat failure (remote path,
# racing writer) falls back to inference. The memo is bounded: one
# entry per (table path x file state) actually loaded, evicted
# oldest-first past _SCHEMA_MEMO_CAP so a long session scanning many
# snapshots cannot grow it without bound.
_SCHEMA_MEMO: dict = {}
_SCHEMA_MEMO_CAP = 256


def _memo_key(path: str):
    import os

    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    if os.path.isdir(path):
        parts = []
        for e in os.scandir(path):
            if e.is_file():
                es = e.stat()
                parts.append((es.st_mtime_ns, es.st_size, e.name))
        key = key + (len(parts), max(parts) if parts else None)
    return key


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Handles the events.ts TIMESTAMP(NANOS)
    column, which Spark 4 only reads as a raw long
    (spark.sql.legacy.parquet.nanosAsLong in session.py): convert
    ns -> us with integer division — ns-since-epoch exceeds double
    precision, so `div`, never `/`."""
    try:
        # Must hold in *any* caller-supplied session (the driver's harness
        # builds its own), not just our session.py builder. Runtime-settable
        # on PySpark 4.x; guarded for Sparks without the legacy knob.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    path = f"{sf_dir}/{name}.parquet"
    try:
        key = _memo_key(path)
    except OSError:
        key = None
    if key is not None and key in _SCHEMA_MEMO:
        df = spark.read.schema(_SCHEMA_MEMO[key]).parquet(path)
    else:
        df = spark.read.parquet(path)
        if key is not None:
            _SCHEMA_MEMO[key] = df.schema
            while len(_SCHEMA_MEMO) > _SCHEMA_MEMO_CAP:
                _SCHEMA_MEMO.pop(next(iter(_SCHEMA_MEMO)))
    if "ts" in df.columns and dict(df.dtypes).get("ts") == "bigint":
        # NTZ, not LTZ: the parquet column is TIMESTAMP(NANOS, adjusted=false)
        # i.e. a wall-clock value, and Spark reads the sibling MILLIS/MICROS
        # columns as TIMESTAMP_NTZ — keep the engine timezone-independent.
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " timestamp_ntz '1970-01-01 00:00:00')"
            ),
        )
    return df


@dataclass
class PagePlan:
    """The reference's per-table page list (`tableMap`, cmd/root.go:209-262)
    re-expressed: one (lo, hi) ROWNUM window per partition."""

    table: str
    row_count: int
    page_size: int

    @property
    def num_pages(self) -> int:
        # ceil(count/pageSize); an empty table still gets one page so the
        # zero-row probe runs and DDL is exercised (cmd/root.go:250-252).
        return max(1, math.ceil(self.row_count / self.page_size))

    def windows(self) -> list[tuple[int, int]]:
        """1-based inclusive (lo, hi) bounds per page (cmd/root.go:328-335)."""
        return [
            (i * self.page_size + 1, min((i + 1) * self.page_size, self.row_count))
            for i in range(self.num_pages)
        ]

    def rownum_predicates(self) -> list[str]:
        """Predicate strings for spark.read.jdbc(predicates=...) against a
        source exposing ROWNUM-style numbering."""
        return [f"rn >= {lo} and rn <= {hi}" for lo, hi in self.windows()]


def plan_pages(df_count: int, table: str, page_size: int = 100_000) -> PagePlan:
    return PagePlan(table=table, row_count=df_count, page_size=page_size)


class ParquetSource:
    """Fixture source; stands in for Oracle in every test."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def read(self, table: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, table)

    def read_sql(self, sql: str) -> DataFrame:
        """Table-as-SQL mode (-s, cmd/root.go:84-85): the user supplies a
        SELECT; on fixtures we register every table as a temp view first
        (schema-only — no scan until the plan executes)."""
        import os

        for f in os.listdir(self.sf_dir):
            if f.endswith(".parquet"):
                t = f[: -len(".parquet")]
                load_table(self.spark, self.sf_dir, t).createOrReplaceTempView(t)
        return self.spark.sql(sql)

    def probe_schema(self, table: str):
        """S8 zero-row probe (cmd/root.go:277-296): schema without data."""
        return self.read(table).limit(0).schema


class FileSource(ParquetSource):
    """Format-generic file source: same contract as ParquetSource for
    csv / json / parquet table directories (`<dir>/<table>.<ext>`).
    CSV and JSON carry no embedded schema, so each table's schema is
    either supplied explicitly (`schemas={table: ddl_string}`) or
    inferred with a one-time extra pass (samplingRatio=1.0 — schema
    drift between files of one table is a data bug we'd rather fail
    on than average over). The sync/compare/DDL pipeline downstream is
    format-blind — it sees DataFrames."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        fmt: str = "parquet",
        schemas: dict[str, str] | None = None,
    ):
        super().__init__(spark, sf_dir)
        self.fmt = fmt
        self.schemas = schemas or {}

    def read(self, table: str) -> DataFrame:
        if self.fmt == "parquet":
            return super().read(table)
        path = f"{self.sf_dir}/{table}.{self.fmt}"
        r = self.spark.read
        if table in self.schemas:
            r = r.schema(self.schemas[table])
        if self.fmt == "csv":
            r = r.option("header", "true")
            if table not in self.schemas:
                r = r.option("inferSchema", "true")
        return r.format(self.fmt).load(path)

    def list_tables(self, exclude: list[str] | None = None) -> list[str]:
        import os

        excl = {e.lower() for e in (exclude or [])}
        suffix = f".{self.fmt}"
        names = [
            f[: -len(suffix)]
            for f in sorted(os.listdir(self.sf_dir))
            if f.endswith(suffix)
        ]
        return [n for n in names if n.lower() not in excl]

    def read_sql(self, sql: str) -> DataFrame:
        for t in self.list_tables():
            self.read(t).createOrReplaceTempView(t)
        return self.spark.sql(sql)


class JdbcSource:
    """Oracle via spark.read.jdbc. Untested in this container (no Oracle,
    no JDBC driver jar) but the full partitioning logic is exercised via
    PagePlan unit tests."""

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        user: str,
        password: str,
        fetchsize: int = 10_000,
    ):
        self.spark = spark
        self.url = url
        self.props = {"user": user, "password": password, "fetchsize": str(fetchsize)}

    def _reader(self):
        r = self.spark.read.format("jdbc").option("url", self.url)
        for k, v in self.props.items():
            r = r.option(k, v)
        return r

    def list_tables(self, exclude: list[str] | None = None) -> list[str]:
        """S1 (fetchTableMap, cmd/root.go:209-262): the source schema's
        table list from the Oracle dictionary, minus the exclude set."""
        q = "select table_name from user_tables order by table_name"
        rows = self._reader().option("query", q).load().collect()
        ex = {e.upper() for e in (exclude or [])}
        return [r[0].lower() for r in rows if r[0].upper() not in ex]

    def count(self, table: str) -> int:
        """S4: pushed-down count(*) — one scalar row over JDBC."""
        q = f'select count(*) as cnt from "{table.upper()}"'
        return self._reader().option("query", q).load().collect()[0][0]

    def read(
        self,
        table: str,
        partition_column: str | None = None,
        page_size: int = 100_000,
        max_partitions: int = 256,
    ) -> DataFrame:
        """Partitioned read. Preference order (SURVEY section 4):
        1. numeric PK partitionColumn with min/max bounds,
        2. ROWNUM predicates sized by the reference's page math,
        3. single-partition scan for tiny tables."""
        n = self.count(table)
        plan = plan_pages(n, table, page_size)
        if plan.num_pages <= 1:
            return self._reader().option("dbtable", f'"{table.upper()}"').load()
        nparts = min(plan.num_pages, max_partitions)
        if partition_column:
            bounds = (
                self._reader()
                .option(
                    "query",
                    f'select min("{partition_column}") lo, max("{partition_column}") hi '
                    f'from "{table.upper()}"',
                )
                .load()
                .collect()[0]
            )
            return (
                self._reader()
                .option("dbtable", f'"{table.upper()}"')
                .option("partitionColumn", partition_column)
                .option("lowerBound", str(bounds[0]))
                .option("upperBound", str(bounds[1]))
                .option("numPartitions", str(nparts))
                .load()
            )
        # PK-less fallback: ROWNUM windows as explicit predicates; each
        # partition runs the reference's nested-ROWNUM page query shape
        # (cmd/root.go:336).
        inner = f'(select a.*, rownum rn from "{table.upper()}" a)'
        return self.spark.read.jdbc(
            url=self.url,
            table=inner,
            predicates=plan.rownum_predicates(),
            properties=self.props,
        )
