"""DDL synthesis golden tests: CREATE TABLE, index/PK/FK arms,
sequence-trigger auto-increment regex (R1), view rewrite (R2),
function-index cleanup (R3) — SURVEY section 5 item 1."""

from __future__ import annotations

from sparksync.ddl import (
    FkSpec,
    IndexSpec,
    auto_increment_sql,
    clean_function_index_ddl,
    create_table_sql,
    create_view_sql,
    drop_table_sql,
    fk_sql,
    index_sql,
    q_mysql,
    q_oracle,
    rewrite_view_text,
    table_comment_sql,
)
from sparksync.typemap import OracleColumn, TableSpec


def test_create_table_golden():
    spec = TableSpec(
        name="EMP",
        comment="employees",
        columns=[
            OracleColumn("ID", "NUMBER", scale=0, avg_col_len=7, nullable=False, ordinal=1),
            OracleColumn("NAME", "VARCHAR2", char_length=50, ordinal=2, comment="full name"),
            OracleColumn("SAL", "NUMBER", precision=10, scale=2, ordinal=3, default="(0)"),
            OracleColumn("HIRED", "DATE", ordinal=4, default="SYSDATE"),
        ],
    )
    assert create_table_sql(spec) == (
        "create table `emp` (\n"
        "  `id` bigint not null,\n"
        "  `name` varchar(50) comment 'full name',\n"
        "  `sal` decimal(10,2) default 0,\n"
        "  `hired` datetime default current_timestamp\n"
        ") comment='employees';"
    )
    assert drop_table_sql("EMP") == "drop table if exists `emp`;"


def test_index_arms():
    # the CASE arms of tablemeta.go:194
    assert (
        index_sql(IndexSpec("t", "pk_t", ["id"], constraint_type="P"))
        == "alter table `t` add primary key (`id`);"
    )
    assert (
        index_sql(IndexSpec("t", "uk_t", ["a", "b"], uniqueness="UNIQUE"))
        == "create unique index `uk_t` on `t` (`a`,`b`);"
    )
    assert (
        index_sql(IndexSpec("t", "ix_t", ["a"]))
        == "create index `ix_t` on `t` (`a`);"
    )


def test_fk():
    fk = FkSpec("child", "fk_c_p", ["pid"], "parent", ["id"], delete_rule="CASCADE")
    assert fk_sql(fk) == (
        "alter table `child` add constraint `fk_c_p` foreign key (`pid`) "
        "references `parent` (`id`) on delete cascade;"
    )


def test_auto_increment_regex():
    # real-shaped trigger bodies incl. INTO: spacing and SYS.DUAL
    # (tablemeta.go:239-251)
    body = "BEGIN\n  SELECT EMP_SEQ.NEXTVAL INTO:NEW.ID FROM SYS.DUAL;\nEND;"
    sqls = auto_increment_sql("EMP", body)
    assert sqls == [
        "create index `ids_emp_id_i` on `emp` (`id`);",
        "alter table `emp` modify `id` bigint auto_increment;",
    ]
    assert auto_increment_sql("EMP", "BEGIN :NEW.updated := SYSDATE; END;") == []


def test_view_rewrite():
    # tablemeta.go:417-427: upcase, comment guard, quote flip, NVL,
    # UNISTR
    text = 'select nvl("a", unistr(\'\\0030\')) -- note\nfrom "t"'
    out = rewrite_view_text(text)
    assert "IFNULL(`A`" in out
    assert "0" in out and "UNISTR" not in out
    assert "-- -- " in out
    assert create_view_sql("V1", "select 1 as x").startswith(
        "create or replace view `v1` as "
    )


def test_function_index_cleanup():
    ddl = 'CREATE INDEX "SCOTT"."FIDX" ON "T" (UPPER("NAME")) PCTFREE 10 STORAGE(...)'
    out = clean_function_index_ddl(ddl)
    assert "PCTFREE" not in out and '"' not in out
    assert out.endswith(";")


def test_quoting():
    assert q_mysql("a`b") == "`a``b`"
    assert q_oracle('a"b') == '"a""b"'


def test_table_comment():
    assert table_comment_sql("T", "it's") == "alter table `t` comment = 'it''s';"


def test_ansi_dialect_renderings():
    """Round-5 ANSI arms: bare-lowercase identifiers, SQL:2003 identity
    promotion, COMMENT ON — same builders as MySQL, dialect-switched."""
    from sparksync import ddl

    ix = ddl.IndexSpec("T", "IX_T", ["A", "B"], uniqueness="UNIQUE")
    assert ddl.index_sql(ix, "ansi") == "create unique index ix_t on t (a,b);"
    fk = ddl.FkSpec("Child", "FK_C", ["pid"], "Parent", ["id"], "CASCADE")
    assert ddl.fk_sql(fk, "ansi") == (
        "alter table child add constraint fk_c foreign key (pid)"
        " references parent (id) on delete cascade;"
    )
    assert ddl.table_comment_sql("T", "it's", "ansi") == (
        "comment on table t is 'it''s';"
    )
    body = "BEGIN SELECT s.NEXTVAL INTO :NEW.ID FROM SYS.DUAL; END;"
    assert ddl.detect_identity_column(body) == "id"
    assert ddl.auto_increment_sql("t", body, "ansi") == [
        "create index ids_t_id_i on t (id);",
        "alter table t alter column id set generated always as identity;",
    ]
    assert ddl.auto_increment_sql("t", "BEGIN null; END;", "ansi") == []


def test_ansi_reserved_word_quoting():
    """ADVICE r5: a reserved-word table/column name ('order', 'user')
    must render quoted in the ansi arm — bare-lowercase would be
    invalid DDL — while plain identifiers keep the unquoted
    case-folding fast path."""
    from sparksync import ddl

    assert ddl.q_ansi("lineitem") == "lineitem"
    assert ddl.q_ansi("ORDER") == '"ORDER"'
    assert ddl.q_ansi("user") == '"USER"'
    assert ddl.q_ansi("select") == '"SELECT"'
    assert ddl.q_ansi("weird name") == '"WEIRD NAME"'
    assert ddl.q_ansi("o_orderkey") == "o_orderkey"
    ix = ddl.IndexSpec("ORDER", "IX_O", ["USER"], uniqueness="UNIQUE")
    assert ddl.index_sql(ix, "ansi") == (
        'create unique index ix_o on "ORDER" ("USER");'
    )
