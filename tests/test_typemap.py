"""Exhaustive tests of the type switch (tablemeta.go:133-158), scale
clamp (tablemeta.go:74), nullability (93-98) and default normalization
(100-131) — SURVEY section 5 item 1."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from sparksync.typemap import OracleColumn, clamp_scale, map_column, map_type, normalize_default


@pytest.mark.parametrize(
    ("col", "mysql", "spark"),
    [
        (OracleColumn("c", "NUMBER", precision=12, scale=2), "decimal(12,2)", T.DecimalType(12, 2)),
        (OracleColumn("c", "NUMBER", precision=38, scale=10), "decimal(38,10)", T.DecimalType(38, 10)),
        # integer-ish NUMBER: stats decide width (tablemeta.go:140-143)
        (OracleColumn("c", "NUMBER", scale=0, avg_col_len=7), "bigint", T.LongType()),
        (OracleColumn("c", "NUMBER", scale=0, avg_col_len=4), "int", T.IntegerType()),
        # missing stats -> safe widening to bigint
        (OracleColumn("c", "NUMBER", scale=0), "bigint", T.LongType()),
        (OracleColumn("c", "VARCHAR2", char_length=25), "varchar(25)", T.StringType()),
        (OracleColumn("c", "NVARCHAR2", char_length=10), "varchar(10)", T.StringType()),
        (OracleColumn("c", "UROWID", char_length=18), "varchar(18)", T.StringType()),
        (OracleColumn("c", "CHAR", char_length=2), "char(2)", T.StringType()),
        (OracleColumn("c", "NCHAR", char_length=3), "char(3)", T.StringType()),
        (OracleColumn("c", "DATE"), "datetime", T.TimestampType()),
        (OracleColumn("c", "CLOB"), "longtext", T.StringType()),
        (OracleColumn("c", "NCLOB"), "longtext", T.StringType()),
        (OracleColumn("c", "LONG"), "longtext", T.StringType()),
        (OracleColumn("c", "BLOB"), "longblob", T.BinaryType()),
        (OracleColumn("c", "RAW"), "longblob", T.BinaryType()),
        (OracleColumn("c", "LONG RAW"), "longblob", T.BinaryType()),
        (OracleColumn("c", "TIMESTAMP(6)", scale=6), "datetime(6)", T.TimestampType()),
        (OracleColumn("c", "TIMESTAMP", scale=3), "datetime(3)", T.TimestampType()),
        (OracleColumn("c", "TIMESTAMPDTY"), "datetime(6)", T.TimestampType()),
        (OracleColumn("c", "FLOAT"), "double", T.DoubleType()),
        (OracleColumn("c", "BINARY_FLOAT"), "float", T.FloatType()),
        (OracleColumn("c", "BINARY_DOUBLE"), "double", T.DoubleType()),
        # unknown passthrough (tablemeta.go:156-157)
        (OracleColumn("c", "SDO_GEOMETRY"), "sdo_geometry", T.StringType()),
    ],
)
def test_type_switch(col, mysql, spark):
    m, s = map_type(col)
    assert m == mysql
    assert s == spark


def test_scale_clamp():
    # tablemeta.go:74: scale>30 -> least(precision,30)-1
    assert clamp_scale(38, 127) == 29
    assert clamp_scale(20, 31) == 19
    assert clamp_scale(12, 2) == 2
    assert clamp_scale(None, 40) == 29
    assert clamp_scale(12, None) is None


@pytest.mark.parametrize(
    ("dtype", "default", "scale", "clause"),
    [
        ("VARCHAR2", None, None, ""),
        ("VARCHAR2", "NULL", None, " default null"),
        # function defaults -> null (tablemeta.go:103-104)
        ("VARCHAR2", "SYS_GUID()", None, " default null"),
        ("VARCHAR2", "USER", None, " default null"),
        # string defaults keep quotes, strip parens (106)
        ("VARCHAR2", "'abc'", None, " default 'abc'"),
        ("VARCHAR2", "('abc')", None, " default 'abc'"),
        # inner spaces / nested parens still strip (ReplaceAll semantics)
        ("VARCHAR2", "( 'user' )", None, " default 'user'"),
        ("VARCHAR2", "(('x'))", None, " default 'x'"),
        # NUMBER: numeric extraction else null (109-117)
        ("NUMBER", "(42)", None, " default 42"),
        ("NUMBER", "3.14 ", None, " default 3.14"),
        ("NUMBER", "seq.nextval", None, " default null"),
        # SYSDATE/CURRENT_TIMESTAMP (118-125)
        ("DATE", "SYSDATE", None, " default current_timestamp"),
        ("TIMESTAMP(6)", "CURRENT_TIMESTAMP(6)", 6, " default current_timestamp(6)"),
        ("DATE", "CURRENT_TIMESTAMP", None, " default current_timestamp"),
        # passthrough (126-128)
        ("VARCHAR2", "whatever", None, " default whatever"),
    ],
)
def test_default_normalization(dtype, default, scale, clause):
    col = OracleColumn("c", dtype, default=default, scale=scale)
    assert normalize_default(col) == clause


def test_nullability_and_comment():
    c = map_column(OracleColumn("ID", "NUMBER", scale=0, avg_col_len=7, nullable=False))
    assert c.mysql_type.startswith("bigint not null")
    assert c.name == "id"  # lower-cased (cmd/root.go:300-303)
    c2 = map_column(OracleColumn("c", "VARCHAR2", char_length=5, comment="it's a test"))
    assert c2.comment_clause == " comment 'it''s a test'"
