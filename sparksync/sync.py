"""Orchestration: the migration phases of the reference's EP1/EP3
(/root/reference/cmd/root.go:47-204) as Spark jobs.

Phases (startDataTransfer): plan -> DDL -> data -> objects -> report.
Inter-table parallelism uses a driver-side thread pool (the Spark
scheduler is thread-safe; this maps the reference's maxParallel
goroutine semaphore, cmd/root.go:95-101). Intra-table parallelism is
Spark partitioning — the reference's ROWNUM pages (source.py).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .catalog import FixtureCatalog
from .compare import CompareResult, compare_checksum, compare_counts
from .ddl import create_table_sql, drop_table_sql
from .sink import ParquetSink, SqlScriptSink
from .source import ParquetSource, plan_pages


@dataclass
class PhaseReport:
    """Per-phase begin/failed/elapsed rows, mirroring the summary table
    the reference renders (cmd/root.go:140-200, readme.md:127-132)."""

    phase: str
    tables: int = 0
    failed: int = 0
    elapsed_s: float = 0.0


@dataclass
class SyncReport:
    phases: list[PhaseReport] = field(default_factory=list)
    compare: list[CompareResult] = field(default_factory=list)

    def ok(self) -> bool:
        return all(p.failed == 0 for p in self.phases) and all(
            c.is_ok for c in self.compare
        )


class SyncJob:
    """parquet->parquet sync used by tests and bench; JDBC endpoints plug
    in by swapping source/sink (same orchestration)."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        out_dir: str,
        page_size: int = 100_000,
        max_parallel: int = 8,
        exclude: list[str] | None = None,
    ):
        self.spark = spark
        self.catalog = FixtureCatalog(spark, sf_dir)
        self.source = ParquetSource(spark, sf_dir)
        self.sink = ParquetSink(spark, out_dir)
        self.page_size = page_size
        self.max_parallel = max_parallel
        self.exclude = exclude or []

    def plan(self) -> list[str]:
        """Phase 1 (fetchTableMap, cmd/root.go:209-262)."""
        return self.catalog.list_tables(exclude=self.exclude)

    def ddl_phase(self, tables: list[str], script: SqlScriptSink | None = None) -> PhaseReport:
        """Phase 2 (TableCreate, tablemeta.go:52-188): synthesize DDL per
        table; in dump mode write to script, else (parquet sink) DDL is
        implicit in the parquet schema."""
        t0 = time.time()
        rep = PhaseReport(phase="create table", tables=len(tables))
        for t in tables:
            try:
                spec = self.catalog.table_spec(t)
                ddl = drop_table_sql(t) + "\n" + create_table_sql(spec)
                if script is not None:
                    script.execute(ddl)
            except Exception:  # noqa: BLE001 — count-and-continue like the reference
                rep.failed += 1
        rep.elapsed_s = time.time() - t0
        return rep

    def _sync_one(self, table: str) -> None:
        # no count() here: on parquet the scan is already split by
        # rowgroup; the page plan (plan_pages) only matters on the JDBC
        # path where source.py derives read predicates from it — an
        # extra count() per table would be a full second scan
        df = self.source.read(table)
        self.sink.write(df, table, mode="overwrite")

    def data_phase(self, tables: list[str]) -> PhaseReport:
        """Phase 3 (preMigData + runMigration, cmd/root.go:265-526):
        truncate-and-load per table, inter-table thread pool."""
        t0 = time.time()
        rep = PhaseReport(phase="data sync", tables=len(tables))
        with ThreadPoolExecutor(max_workers=self.max_parallel) as ex:
            futs = {ex.submit(self._sync_one, t): t for t in tables}
            for f in futs:
                try:
                    f.result()
                except Exception:  # noqa: BLE001
                    rep.failed += 1
        rep.elapsed_s = time.time() - t0
        return rep

    def compare_phase(self, tables: list[str], checksum: bool = False) -> list[CompareResult]:
        """EP2 (compareDb) over the synced pairs — count or checksum mode;
        results collected thread-safely (fixes the reference's race at
        compare.go:15,130)."""
        out: list[CompareResult] = []
        fn = compare_checksum if checksum else compare_counts

        def one(t: str) -> CompareResult:
            # count-and-continue like the reference's compareDb: a missing
            # or unreadable destination is a per-table failure, not a crash
            try:
                src = self.source.read(t)
            except Exception:  # noqa: BLE001
                return CompareResult(table=t, src_count=0, dst_count=0, dest_exists=False)
            try:
                return fn(src, self.sink.read(t), t)
            except Exception:  # noqa: BLE001
                return CompareResult(
                    table=t, src_count=src.count(), dst_count=0, dest_exists=False
                )

        with ThreadPoolExecutor(max_workers=self.max_parallel) as ex:
            for f in [ex.submit(one, t) for t in tables]:
                out.append(f.result())
        return out

    def run(self, checksum: bool = False, ddl_script: str | None = None) -> SyncReport:
        report = SyncReport()
        tables = self.plan()
        if ddl_script:
            with SqlScriptSink(ddl_script) as s:
                report.phases.append(self.ddl_phase(tables, s))
        else:
            report.phases.append(self.ddl_phase(tables))
        report.phases.append(self.data_phase(tables))
        report.compare = self.compare_phase(tables, checksum=checksum)
        return report
