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
from .ddl import (
    auto_increment_sql,
    clean_function_index_ddl,
    create_table_sql,
    create_view_sql,
    drop_table_sql,
    fk_sql,
    index_sql,
    table_comment_sql,
)
from .sink import ParquetSink, SqlScriptSink
from .source import ParquetSource, plan_pages


@dataclass
class PhaseReport:
    """Per-phase begin/failed/elapsed rows, mirroring the summary table
    the reference renders (cmd/root.go:140-200, readme.md:127-132);
    `errors` carries the per-object detail (K7, sink.DdlResult shape)."""

    phase: str
    tables: int = 0
    failed: int = 0
    elapsed_s: float = 0.0
    errors: list[str] = field(default_factory=list)


@dataclass
class SyncReport:
    phases: list[PhaseReport] = field(default_factory=list)
    compare: list[CompareResult] = field(default_factory=list)

    def ok(self) -> bool:
        return all(p.failed == 0 for p in self.phases) and all(
            c.is_ok for c in self.compare
        )


def render_report(report: "SyncReport") -> str:
    """The per-object-class summary table the reference renders at exit
    (cmd/root.go:140-200, readme.md:127-132), as text. Compare results
    render as the reference's TWO tables (cmd/compare.go:71-98): every
    table, then a failures-only table — on a thousand-table run the
    second is the one a human actually reads."""
    lines = [f"{'phase':>16} | {'objects':>7} | {'failed':>6} | {'elapsed_s':>9}"]
    lines.append("-" * len(lines[0]))
    for p in report.phases:
        lines.append(
            f"{p.phase:>16} | {p.tables:>7} | {p.failed:>6} | {p.elapsed_s:>9.3f}"
        )

    def compare_table(rows) -> list[str]:
        out = [f"{'table':>16} | {'src':>9} | {'dst':>9} | {'exists':>6} | ok"]
        for c in rows:
            out.append(
                f"{c.table:>16} | {c.src_count:>9} | {c.dst_count:>9} | "
                f"{str(c.dest_exists):>6} | {c.is_ok}"
            )
        return out

    if report.compare:
        lines.append("")
        lines.append("Table Compare Total Result")
        lines.extend(compare_table(report.compare))
        failed = [c for c in report.compare if not c.is_ok]
        lines.append("")
        lines.append("Table Compare Result (Only Not Ok Displayed)")
        lines.extend(compare_table(failed))
    lines.append("")
    lines.append(f"result: {'ok' if report.ok() else 'FAILED'}")
    return "\n".join(lines)


def write_report(report: "SyncReport", log_dir: str) -> str:
    """C4 per-run log dir (cmd/root.go:52-67): summary.txt + report.json
    under a fresh run_<n> directory; returns the directory path."""
    import json
    import os

    n = 0
    while True:
        run_dir = os.path.join(log_dir, f"run_{n:04d}")
        try:
            os.makedirs(run_dir)
            break
        except FileExistsError:
            n += 1
    with open(os.path.join(run_dir, "summary.txt"), "w", encoding="utf-8") as fh:
        fh.write(render_report(report) + "\n")
    payload = {
        "phases": [p.__dict__ for p in report.phases],
        "compare": [
            {
                "table": c.table,
                "src": c.src_count,
                "dst": c.dst_count,
                "dest_exists": c.dest_exists,
                "ok": c.is_ok,
            }
            for c in report.compare
        ],
        "ok": report.ok(),
    }
    with open(os.path.join(run_dir, "report.json"), "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=2)
    return run_dir


class SyncJob:
    """Sync orchestration over pluggable endpoints. Defaults to the
    parquet fixture pair (tests and bench); JDBC endpoints plug in via
    `source=`/`sink=` (cli.py builds JdbcSource/JdbcSink from `jdbc:`
    URLs). With a JDBC source there is no FixtureCatalog, so the table
    list comes from the source's dictionary scan (`list_tables`) or an
    explicit `tables=` list, and the DDL/objects phases — which need
    catalog metadata — are skipped (run() degrades to data + compare,
    the EP3-onlyData + EP2 shape)."""

    #: job-group tag, the analogue of the reference's `/* goapp */` session
    #: marker it kills on exit (cmd/app.go:213-243, S17/C3): every Spark job
    #: this SyncJob submits carries the group so cancel() can revoke them.
    JOB_GROUP = "sparksync"

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None,
        out_dir: str | None,
        page_size: int = 100_000,
        max_parallel: int = 8,
        exclude: list[str] | None = None,
        table_sql: dict[str, str] | None = None,
        dest_flavor: str = "mysql",
        source=None,
        sink=None,
        tables: list[str] | None = None,
    ):
        from .dialect import get_dialect

        self.spark = spark
        self.source = source if source is not None else ParquetSource(spark, sf_dir)
        self.sink = sink if sink is not None else ParquetSink(spark, out_dir)
        # catalog metadata (DDL/objects synthesis) only exists for the
        # fixture source; a JDBC source would need the Oracle dictionary
        # queries the reference issues (tablemeta.go) — out of scope here
        self.catalog = (
            FixtureCatalog(spark, sf_dir)
            if source is None and sf_dir is not None
            else None
        )
        self.page_size = page_size
        self.max_parallel = max_parallel
        self.exclude = exclude or []
        self._tables = tables
        self.dialect = get_dialect(dest_flavor)
        # table-as-SQL map (-s mode, cmd/root.go:84-85): table name ->
        # custom SELECT replacing the full-table read for that table
        self.table_sql = {k.upper(): v for k, v in (table_sql or {}).items()}

    def _tag_jobs(self, desc: str) -> None:
        """Job groups are per-thread; each pool worker tags its own."""
        self.spark.sparkContext.setJobGroup(self.JOB_GROUP, desc, interruptOnCancel=True)

    def cancel(self) -> None:
        """C3 graceful cancel: revoke every running job this sync
        submitted — the Spark analogue of the reference's tag-and-kill
        loop over v\\$session (cmd/app.go:213-243)."""
        self.spark.sparkContext.cancelJobGroup(self.JOB_GROUP)

    def _read_source(self, table: str):
        sql = self.table_sql.get(table.upper())
        if sql is not None:
            return self.source.read_sql(sql)
        return self.source.read(table)

    def plan(self) -> list[str]:
        """Phase 1 (fetchTableMap, cmd/root.go:209-262): explicit list,
        else catalog scan, else the source's own dictionary scan."""
        if self._tables is not None:
            ex = {e.upper() for e in self.exclude}
            return [t for t in self._tables if t.upper() not in ex]
        if self.catalog is not None:
            return self.catalog.list_tables(exclude=self.exclude)
        return self.source.list_tables(exclude=self.exclude)

    def ddl_phase(self, tables: list[str], script: SqlScriptSink | None = None) -> PhaseReport:
        """Phase 2 (TableCreate, tablemeta.go:52-188): synthesize DDL per
        table; in dump mode write to script, else (parquet sink) DDL is
        implicit in the parquet schema."""
        self._require_catalog("ddl_phase")
        t0 = time.time()
        rep = PhaseReport(phase="create table", tables=len(tables))
        for t in tables:
            try:
                spec = self.catalog.table_spec(t)
                dd = self.dialect.ddl_dialect
                drop = drop_table_sql(t, dialect=dd)
                create = create_table_sql(spec, dialect=dd)
                if script is not None:
                    script.execute(drop + "\n" + create)
                else:
                    # drop and create are SEPARATE JDBC statements (a
                    # concatenated pair is a syntax error on a real
                    # engine); a failed drop is expected on a fresh
                    # target — the ansi arm has no IF EXISTS — and must
                    # not mask or count against the create
                    self._execute_on_sink(drop, fatal=False)
                    self._execute_on_sink(create)
            except Exception as e:  # noqa: BLE001 — count-and-continue like the reference
                rep.failed += 1
                rep.errors.append(f"{t}: {type(e).__name__}: {e}"[:300])
        rep.elapsed_s = time.time() - t0
        return rep

    def _require_catalog(self, phase: str) -> None:
        if self.catalog is None:
            raise RuntimeError(
                f"{phase} needs catalog metadata, which the configured source "
                "does not expose (JDBC-source DDL synthesis would need the "
                "reference's Oracle dictionary queries); run data/compare "
                "phases instead"
            )

    def _execute_on_sink(self, ddl: str, fatal: bool = True) -> None:
        """K5: a DDL-capable sink (JdbcSink.execute_ddl) runs the
        statement on the target; the parquet sink has no DDL analogue —
        synthesis itself is the checked work there. The trailing ';' is
        script-file syntax — JDBC Statement.execute rejects it on real
        engines (Derby), so it is stripped here. fatal=False downgrades
        a failure to count-and-continue (expected drops/comments)."""
        execute = getattr(self.sink, "execute_ddl", None)
        if execute is None:
            return
        res = execute([ddl.strip().rstrip(";")])
        if res.failed and fatal:
            raise RuntimeError(res.failed[0][1])

    def _sync_one(self, table: str) -> None:
        # no count() here: on parquet the scan is already split by
        # rowgroup; the page plan (plan_pages) only matters on the JDBC
        # path where source.py derives read predicates from it — an
        # extra count() per table would be a full second scan
        self._tag_jobs(f"data sync {table}")
        df = self._read_source(table)
        self.sink.write(df, table, mode="overwrite")

    def data_phase(self, tables: list[str]) -> PhaseReport:
        """Phase 3 (preMigData + runMigration, cmd/root.go:265-526):
        truncate-and-load per table, inter-table thread pool."""
        t0 = time.time()
        rep = PhaseReport(phase="data sync", tables=len(tables))
        with ThreadPoolExecutor(max_workers=self.max_parallel) as ex:
            futs = {ex.submit(self._sync_one, t): t for t in tables}
            for f, t in futs.items():
                try:
                    f.result()
                except Exception as e:  # noqa: BLE001
                    rep.failed += 1
                    rep.errors.append(f"{t}: {type(e).__name__}: {e}"[:300])
        rep.elapsed_s = time.time() - t0
        return rep

    def synthesize_objects(self, tables: list[str]) -> list[tuple[str, str, str]]:
        """(object_class, object_name, ddl) for every post-data object, in
        the reference's EP1 execution order (cmd/root.go:146-175):
        IdxCreate -> SeqCreate -> FkCreate -> NormalIdx(function-index
        cleanup) -> CommentCreate -> ViewCreate. Deterministic: tables in
        input order, objects in catalog order."""
        import dataclasses

        cat = self.catalog
        d = self.dialect
        dd = d.ddl_dialect
        out: list[tuple[str, str, str]] = []
        for t in tables:
            for ix in cat.indexes(t):
                out.append(("index", ix.index_name, index_sql(ix, dialect=dd)))
        if d.supports_autoinc_rewrite:
            for t in tables:
                for body in cat.trigger_bodies(t):
                    for i, stmt in enumerate(
                        auto_increment_sql(t, body, dialect=dd)
                    ):
                        out.append(("sequence", f"{t}_autoinc_{i}", stmt))
        if d.supports_fk:
            for t in tables:
                for fk in cat.foreign_keys(t):
                    if fk.delete_rule and not d.supports_fk_cascade:
                        fk = dataclasses.replace(fk, delete_rule=None)
                    out.append(("fk", fk.constraint_name, fk_sql(fk, dialect=dd)))
        for t in tables:
            for raw in cat.function_index_ddls(t):
                cleaned = clean_function_index_ddl(raw)
                out.append(("function_index", t, cleaned))
        for t in tables:
            c = cat.table_comment(t)
            if c:
                out.append(("comment", t, table_comment_sql(t, c, dialect=dd)))
        # revalidate = the reference's `alter view X compile` before the
        # view-DDL fetch (tablemeta.go:402,414): invalid views become a
        # counted per-object failure instead of DDL that dies on the
        # target. The probe needs the source tables resolvable, so
        # register them first (schema-only, nothing scans).
        self._register_source_views(tables)
        for name, text in cat.views(revalidate=True).items():
            if name.startswith("__invalid__:"):
                out.append(("view", name.split(":", 1)[1], f"-- INVALID VIEW: {text}"))
            else:
                out.append(("view", name, create_view_sql(name, text, dialect=dd)))
        return out

    def _register_source_views(self, tables: list[str]) -> None:
        """Temp-view the source tables so view bodies analyze (the
        compile-analogue's resolution context). Registers the FULL
        source schema, not just the sync subset: Oracle's compile
        resolves against everything that exists at the source, so a
        view over an --exclude'd table is still valid. Schema-only."""
        import os

        names = set(tables)
        try:
            if hasattr(self.source, "sf_dir"):
                names |= {
                    f[: -len(".parquet")]
                    for f in os.listdir(self.source.sf_dir)
                    if f.endswith(".parquet")
                }
            elif hasattr(self.source, "list_tables"):
                names |= set(self.source.list_tables())
        except Exception:  # noqa: BLE001 — fall back to the sync subset
            pass
        for t in names:
            try:
                self.source.read(t).createOrReplaceTempView(t)
            except Exception:  # noqa: BLE001 — missing table: view probe will flag
                pass

    def objects_phase(
        self, tables: list[str], script: SqlScriptSink | None = None
    ) -> list[PhaseReport]:
        """Phase 4 (EP1 objects, cmd/root.go:146-175): one report row per
        object class, count-and-continue like the reference's per-object
        failure counters."""
        self._require_catalog("objects_phase")
        reports: dict[str, PhaseReport] = {}
        t0 = time.time()
        for cls, _name, stmt in self.synthesize_objects(tables):
            rep = reports.setdefault(cls, PhaseReport(phase=f"{cls} create"))
            rep.tables += 1
            if stmt.startswith("-- INVALID VIEW"):
                # failed the compile-analogue probe: counted failure,
                # never shipped to the target; scripts get the comment
                # as the audit trail
                rep.failed += 1
                if script is not None:
                    script.execute(stmt)
                continue
            try:
                if script is not None:
                    script.execute(stmt)
                else:
                    # DDL-capable sink (JdbcSink) executes each stmt;
                    # parquet sink has no physical analogue — synthesis
                    # itself is the checked work there
                    self._execute_on_sink(stmt)
            except Exception:  # noqa: BLE001
                rep.failed += 1
        for rep in reports.values():
            rep.elapsed_s = time.time() - t0
        return list(reports.values())

    def dump_code_objects(self, script: SqlScriptSink) -> PhaseReport:
        """S15 (tablemeta.go:446): PROCEDURE/FUNCTION/PACKAGE DDL goes to
        the script file only — the reference never executes code objects
        on the target, and neither do we."""
        t0 = time.time()
        rep = PhaseReport(phase="code_object dump")
        for otype, name, ddl in self.catalog.code_objects():
            rep.tables += 1
            try:
                script.execute(f"-- {otype} {name} (dump only, not executed)\n{ddl}")
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
            self._tag_jobs(f"compare {t}")
            try:
                src = self._read_source(t)
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
        # -s (table-as-SQL) runs skip the objects phase entirely — a custom
        # SELECT's result has no meaningful index/FK/trigger/view set to
        # carry over (cmd/root.go:145: `if selFromYml != true`). A
        # catalog-less (JDBC) source skips DDL+objects too: no metadata
        # to synthesize from — run() degrades to onlyData + compare.
        ddl = self.catalog is not None
        objects = ddl and not self.table_sql
        report = SyncReport()
        tables = self.plan()
        if ddl_script:
            with SqlScriptSink(ddl_script) as s:
                if ddl:
                    report.phases.append(self.ddl_phase(tables, s))
                report.phases.append(self.data_phase(tables))
                if objects:
                    report.phases.extend(self.objects_phase(tables, s))
        else:
            if ddl:
                report.phases.append(self.ddl_phase(tables))
            report.phases.append(self.data_phase(tables))
            if objects:
                report.phases.extend(self.objects_phase(tables))
        report.compare = self.compare_phase(tables, checksum=checksum)
        return report
