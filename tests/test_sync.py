"""End-to-end sync tests (SURVEY section 5 item 3): parquet source ->
engine -> parquet sink; count + checksum compare; empty-table
semantics; DDL dump; config parsing; fixture catalog."""

from __future__ import annotations

import os

from sparksync.catalog import FixtureCatalog
from sparksync.compare import compare_checksum, row_diff
from sparksync.config import load_config
from sparksync.sync import SyncJob

from .conftest import SF_SMOKE


def test_full_sync_roundtrip(spark, tmp_path):
    out = str(tmp_path / "out")
    job = SyncJob(spark, SF_SMOKE, out, max_parallel=4,
                  exclude=["lineitem", "events", "documents", "embeddings",
                           "orders", "part", "customer"])
    rep = job.run(checksum=True, ddl_script=str(tmp_path / "ddl.sql"))
    assert rep.ok(), [c.__dict__ for c in rep.compare]
    assert {c.table for c in rep.compare} == {"region", "nation", "supplier"}
    ddl = (tmp_path / "ddl.sql").read_text()
    assert "create table `region`" in ddl
    assert "`r_regionkey` int" in ddl  # avg_col_len<6 branch via int32


def test_checksum_detects_row_loss(spark, tmp_path):
    out = str(tmp_path / "out")
    job = SyncJob(spark, SF_SMOKE, out,
                  exclude=[t for t in FixtureCatalog(spark, SF_SMOKE).list_tables()
                           if t != "supplier"])
    job.data_phase(["supplier"])
    # tamper: drop a row from the sink copy
    tampered = job.sink.read("supplier").where("s_suppkey <> 3")
    tampered.write.mode("overwrite").parquet(str(tmp_path / "tampered"))
    bad = spark.read.parquet(str(tmp_path / "tampered"))
    res = compare_checksum(job.source.read("supplier"), bad, "supplier")
    assert not res.is_ok
    missing, extra = row_diff(job.source.read("supplier"), bad)
    assert missing.count() == 1 and extra.count() == 0


def test_empty_table_synced_and_created(spark, tmp_path):
    # FIXTURES.md: a synced empty table must still be created at the sink
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").limit(0).write.parquet(
        f"{src_dir}/region.parquet"
    )
    job = SyncJob(spark, src_dir, str(tmp_path / "out"))
    rep = job.run(checksum=True)
    assert rep.ok()
    assert job.sink.exists("region")
    assert job.sink.read("region").count() == 0


def test_config_parsing(tmp_path):
    yml = tmp_path / "cfg.yml"
    yml.write_text(
        "src:\n  host: o.example\n  port: 1521\n  username: scott\n"
        "  password: tiger\n  database: orcl\n"
        "dest:\n  host: m.example\n  port: 3306\n  username: root\n"
        "  password: pw\n  database: db\n"
        "pageSize: 50000\nmaxParallel: 10\nbatchRowSize: 500\n"
        "exclude:\n  - t1\n  - t2\n"
        "tables:\n  emp: select * from emp where id > 0\n"
    )
    cfg = load_config(str(yml))
    assert cfg.src.oracle_url() == "jdbc:oracle:thin:@//o.example:1521/orcl"
    assert "jdbc:mysql://m.example:3306/db" in cfg.dest.mysql_url()
    assert cfg.page_size == 50_000
    assert cfg.exclude == ["t1", "t2"]
    assert cfg.tables == {"EMP": "select * from emp where id > 0"}  # upper-cased keys
    assert cfg.clamped_batch == 500


def test_fixture_catalog(spark):
    cat = FixtureCatalog(spark, SF_SMOKE)
    tables = cat.list_tables(exclude=["events"])
    assert "region" in tables and "events" not in tables
    spec = cat.table_spec("customer")
    by_name = {c.name: c for c in spec.columns}
    assert by_name["c_custkey"].data_type == "NUMBER" and by_name["c_custkey"].avg_col_len >= 6
    assert by_name["c_acctbal"].precision == 12 and by_name["c_acctbal"].scale == 2
    # S5 ordered projection list through the Spark string-agg recipe
    cols = cat.ordered_column_list("region")
    assert cols == '"R_REGIONKEY","R_NAME"'
