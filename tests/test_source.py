"""Page-plan math (cmd/root.go:320-335) incl. the empty-table probe
semantics (cmd/root.go:250-252), plus a property test: pages cover each
row exactly once — SURVEY section 5 items 1 and 4."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sparksync.source import plan_pages


def test_page_math_basic():
    p = plan_pages(250_000, "t", 100_000)
    assert p.num_pages == 3
    assert p.windows() == [(1, 100_000), (100_001, 200_000), (200_001, 250_000)]
    assert p.rownum_predicates()[0] == "rn >= 1 and rn <= 100000"


def test_page_math_exact_multiple():
    p = plan_pages(200_000, "t", 100_000)
    assert p.num_pages == 2
    assert p.windows()[-1] == (100_001, 200_000)


def test_empty_table_still_gets_one_page():
    # the reference forces a `where 1=0` probe for empty tables so DDL
    # still runs (cmd/root.go:250-252); we keep one (empty) page
    p = plan_pages(0, "t", 100_000)
    assert p.num_pages == 1


@settings(deadline=None, max_examples=50)
@given(
    n=st.integers(min_value=0, max_value=1_000_000),
    page=st.integers(min_value=100, max_value=200_000),
)
def test_pages_cover_each_row_exactly_once(n, page):
    p = plan_pages(n, "t", page)
    covered = 0
    prev_hi = 0
    for lo, hi in p.windows():
        if n == 0:
            continue
        assert lo == prev_hi + 1
        assert hi >= lo or n == 0
        covered += hi - lo + 1
        prev_hi = hi
    if n > 0:
        assert covered == n
        assert prev_hi == n


def test_file_source_csv_and_json_sync(spark, tmp_path):
    """Format-generic file source: a CSV corpus (explicit schema) and a
    JSON corpus (self-describing) both sync end-to-end through the
    SAME pipeline with checksum-verified parity against the parquet
    original — the engine is format-blind past the scan."""
    from sparksync.compare import compare_checksum
    from sparksync.source import FileSource, load_table
    from sparksync.sync import SyncJob

    from .conftest import SF_SMOKE

    region = load_table(spark, SF_SMOKE, "region")
    csv_dir, json_dir = str(tmp_path / "csv_src"), str(tmp_path / "json_src")
    region.coalesce(1).write.option("header", "true").csv(csv_dir + "/region.csv")
    region.coalesce(1).write.json(json_dir + "/region.json")

    for fmt, d, schemas in (
        ("csv", csv_dir, {"region": "r_regionkey long, r_name string"}),
        ("json", json_dir, None),
    ):
        src = FileSource(spark, d, fmt=fmt, schemas=schemas)
        assert src.list_tables() == ["region"]
        out = str(tmp_path / f"out_{fmt}")
        job = SyncJob(spark, None, out, source=src)
        job.data_phase(job.plan())
        back = job.sink.read("region").select(*region.columns)
        for c, t in region.dtypes:
            back = back.withColumn(c, back[c].cast(t))
        r = compare_checksum(region, back, "region")
        assert r.is_ok, fmt
        # table-as-SQL works over non-parquet sources too
        n = src.read_sql("select count(*) as n from region").collect()[0]["n"]
        assert n == region.count()


def test_file_source_orc_sync(spark, tmp_path):
    """ORC rides the same format-generic path (self-describing schema,
    no schemas= needed) with checksum parity — nothing in FileSource is
    format-enumerated beyond the csv header/infer special case."""
    from sparksync.compare import compare_checksum
    from sparksync.source import FileSource, load_table
    from sparksync.sync import SyncJob

    from .conftest import SF_SMOKE

    nation = load_table(spark, SF_SMOKE, "nation")
    d = str(tmp_path / "orc_src")
    nation.coalesce(1).write.orc(d + "/nation.orc")
    src = FileSource(spark, d, fmt="orc")
    assert src.list_tables() == ["nation"]
    out = str(tmp_path / "out_orc")
    job = SyncJob(spark, None, out, source=src)
    job.data_phase(job.plan())
    back = job.sink.read("nation").select(*nation.columns)
    assert compare_checksum(nation, back, "nation").is_ok


def test_load_table_schema_memo_hits_and_invalidates(spark, tmp_path):
    """Round-15 fixed-cost trim: load_table memoizes the inferred
    parquet schema keyed on (path, mtime_ns, size) so repeat loads in
    one session skip the eager footer-read job. The memo must (a) hit
    on an unchanged file, (b) re-infer when the file is REPLACED —
    schema changes included (the CLI tamper/re-sync case)."""
    from sparksync import source
    from sparksync.source import _SCHEMA_MEMO, load_table

    d = str(tmp_path)
    spark.range(5).selectExpr("id AS a", "id * 2 AS b").coalesce(
        1
    ).write.parquet(d + "/t.parquet")
    before = dict(_SCHEMA_MEMO)
    df1 = load_table(spark, d, "t")
    key1 = source._memo_key(d + "/t.parquet")
    assert key1 in _SCHEMA_MEMO and key1 not in before
    # unchanged file: second load reuses the memo entry and reads the
    # same rows
    df2 = load_table(spark, d, "t")
    assert df2.schema == df1.schema
    assert sorted(r.a for r in df2.collect()) == [0, 1, 2, 3, 4]
    # replace the file with a DIFFERENT schema: the stat key changes,
    # so the memo must re-infer, not serve the stale schema
    import shutil
    import time

    shutil.rmtree(d + "/t.parquet")
    time.sleep(0.01)  # ensure a distinct mtime_ns on coarse filesystems
    spark.range(3).selectExpr(
        "cast(id AS string) AS c", "id AS a"
    ).coalesce(1).write.parquet(d + "/t.parquet")
    df3 = load_table(spark, d, "t")
    assert set(df3.columns) == {"c", "a"}
    assert df3.count() == 3


def test_load_table_schema_memo_sees_in_place_part_rewrite(spark, tmp_path):
    """ADVICE r16: for a Spark-written TABLE DIRECTORY, rewriting a
    part file's contents in place changes neither the directory's
    mtime nor its size — the memo key must fold in the newest part
    file's stat so the rewrite misses the memo and re-infers instead
    of silently serving a stale schema over spark.read.schema()."""
    import glob
    import os
    import time

    from sparksync import source
    from sparksync.source import load_table

    d = str(tmp_path)
    spark.range(4).selectExpr("id AS a").coalesce(1).write.parquet(
        d + "/t.parquet"
    )
    load_table(spark, d, "t")
    key1 = source._memo_key(d + "/t.parquet")
    assert key1 in source._SCHEMA_MEMO
    # rewrite the part file IN PLACE with a different schema, keeping
    # the directory entry itself untouched
    part = glob.glob(d + "/t.parquet/part-*.parquet")[0]
    dir_stat = os.stat(d + "/t.parquet")
    spark.range(2).selectExpr("cast(id AS string) AS z").coalesce(
        1
    ).write.parquet(d + "/tmp2.parquet")
    newpart = glob.glob(d + "/tmp2.parquet/part-*.parquet")[0]
    time.sleep(0.01)
    os.replace(newpart, part)
    for crc in glob.glob(d + "/t.parquet/.*.crc"):
        os.remove(crc)  # stale Hadoop local-FS checksums of the old bytes
    os.utime(
        d + "/t.parquet", ns=(dir_stat.st_atime_ns, dir_stat.st_mtime_ns)
    )
    key2 = source._memo_key(d + "/t.parquet")
    assert key2 != key1  # the part-file stat moved the key
    df = load_table(spark, d, "t")
    assert set(df.columns) == {"z"}
    assert df.count() == 2
