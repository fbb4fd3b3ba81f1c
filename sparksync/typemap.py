"""Oracle -> (MySQL DDL type, Spark runtime type) mapping.

Pure functions reproducing the reference's type switch
(/root/reference/cmd/tablemeta.go:133-158), its nullability rendering
(tablemeta.go:93-98), its default-value normalization
(tablemeta.go:100-131) and the catalog-side scale clamp
(tablemeta.go:74: scale > 30 is rewritten to least(precision,30)-1).

The int-vs-bigint choice for scale-0 NUMBER columns is statistics-driven
in the reference (AVG_COL_LEN >= 6 -> bigint else int,
tablemeta.go:140-143); when stats are missing we default to bigint, the
safe widening.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

#: Oracle types whose scale-0 NUMBER handling depends on AVG_COL_LEN.
_CHAR_TYPES = {"CHAR", "NCHAR"}
_VARCHAR_TYPES = {"VARCHAR2", "NVARCHAR2", "UROWID"}
_TEXT_TYPES = {"CLOB", "NCLOB", "LONG"}
_BLOB_TYPES = {"BLOB", "RAW", "LONG RAW"}


@dataclass
class OracleColumn:
    """One row of the fabricated/real USER_TAB_COLUMNS join
    (tablemeta.go:74): everything the DDL generator needs."""

    name: str
    data_type: str  # upper-cased Oracle type name
    char_length: int | None = None
    precision: int | None = None
    scale: int | None = None
    nullable: bool = True
    default: str | None = None
    comment: str | None = None
    avg_col_len: int | None = None  # statistic driving int-vs-bigint
    ordinal: int = 0


@dataclass
class MappedColumn:
    name: str
    mysql_type: str
    spark_type: T.DataType
    nullable: bool = True
    default_clause: str = ""  # rendered '  default X' or ''
    comment_clause: str = ""  # rendered " comment '...'" or ''
    source_type: str = ""


def clamp_scale(precision: int | None, scale: int | None) -> int | None:
    """tablemeta.go:74 — Oracle allows scale up to 127 > precision; the
    reference SQL rewrites scale > 30 as least(precision,30)-1."""
    if scale is None:
        return None
    if scale > 30:
        p = precision if precision is not None else 38
        return min(p, 30) - 1
    return scale


def map_type(col: OracleColumn) -> tuple[str, T.DataType]:
    """The type switch of tablemeta.go:133-158, returning both the MySQL
    DDL type string and the Spark runtime type."""
    dt = col.data_type.upper().strip()
    scale = clamp_scale(col.precision, col.scale)

    if dt == "NUMBER":
        p = col.precision
        if p is not None and p > 0 and scale is not None and scale > 0:
            # tablemeta.go:138-139 -> decimal(p,s). Oracle permits
            # scale > precision (NUMBER(1,2) = values < 0.1 with 2 dp);
            # MySQL and Spark both require s <= p, so widen precision —
            # a pure widening, every source value still fits.
            p = max(p, scale)
            return f"decimal({p},{scale})", T.DecimalType(p, scale)
        # integer-ish NUMBER: stats decide width (tablemeta.go:140-143)
        if col.avg_col_len is not None and col.avg_col_len < 6:
            return "int", T.IntegerType()
        return "bigint", T.LongType()

    if dt in _VARCHAR_TYPES:
        n = col.char_length or 255
        return f"varchar({n})", T.StringType()  # tablemeta.go:145-146
    if dt in _CHAR_TYPES:
        n = col.char_length or 1
        return f"char({n})", T.StringType()  # tablemeta.go:147-148
    if dt == "DATE":
        # Oracle DATE carries a time part -> MySQL datetime
        return "datetime", T.TimestampType()  # tablemeta.go:149-150
    if dt in _TEXT_TYPES:
        return "longtext", T.StringType()  # tablemeta.go:151-152
    if dt in _BLOB_TYPES:
        return "longblob", T.BinaryType()  # tablemeta.go:153-154
    if dt == "FLOAT" or dt == "BINARY_DOUBLE":
        return "double", T.DoubleType()
    if dt == "BINARY_FLOAT":
        return "float", T.FloatType()
    if dt.startswith("TIMESTAMP") or dt == "TIMESTAMPDTY":
        # default branch passthrough in the reference
        # (tablemeta.go:156-157); MySQL spells it datetime(scale)
        s = col.scale if col.scale is not None else 6
        s = min(s, 6)
        return f"datetime({s})", T.TimestampType()
    if dt.startswith("INTERVAL"):
        return "varchar(64)", T.StringType()
    # reference passes unknown names through verbatim (tablemeta.go:156-157),
    # which can yield invalid MySQL DDL; we keep the passthrough but callers
    # may validate.
    return dt.lower(), T.StringType()


# the reference uses bare [\d.]+ (tablemeta.go:109-117), which would
# accept a lone '.' from e.g. 'seq.nextval'; we require at least one
# digit (SURVEY 1.4: validate instead of passing through junk)
_NUMERIC_DEFAULT_RE = re.compile(r"\d+(?:\.\d+)?|\.\d+")


def normalize_default(col: OracleColumn) -> str:
    """Default-value normalization, tablemeta.go:100-131.

    Returns the rendered ' default X' clause ('' when no default).
    """
    raw = col.default
    if raw is None:
        return ""
    v = raw.strip()
    if v == "" or v.upper() == "NULL":
        return " default null"
    up = v.upper()
    dt = col.data_type.upper()

    # function defaults the target can't evaluate -> default null
    # (tablemeta.go:103-104)
    if up.startswith("SYS_GUID") or up == "USER":
        return " default null"
    # string defaults: keep quotes, strip ALL surrounding parens and
    # whitespace — the reference strips every paren (ReplaceAll,
    # tablemeta.go:106), so "( 'user' )" must become 'user'
    s = v
    while s.startswith("(") and s.endswith(")"):
        s = s[1:-1].strip()
    if s.startswith("'"):
        return f" default {s}"
    # NUMBER defaults: regex-extract the numeric literal, else null
    # (tablemeta.go:109-117)
    if dt == "NUMBER" or dt.startswith("NUMBER"):
        m = _NUMERIC_DEFAULT_RE.search(v)
        if m:
            return f" default {m.group(0)}"
        return " default null"
    # SYSDATE / CURRENT_TIMESTAMP -> current_timestamp, with fractional
    # precision only for TIMESTAMP columns (tablemeta.go:118-125)
    if up.startswith("SYSDATE") or up.startswith("CURRENT_TIMESTAMP"):
        if dt.startswith("TIMESTAMP") and col.scale is not None:
            return f" default current_timestamp({min(col.scale, 6)})"
        return " default current_timestamp"
    # everything else passes through (tablemeta.go:126-128)
    return f" default {v}"


def map_column(col: OracleColumn) -> MappedColumn:
    mysql_type, spark_type = map_type(col)
    not_null = "" if col.nullable else " not null"  # tablemeta.go:93-98
    default = normalize_default(col)
    comment = ""
    if col.comment:
        esc = col.comment.replace("'", "''")
        comment = f" comment '{esc}'"  # tablemeta.go:160-165
    return MappedColumn(
        name=col.name.lower(),
        mysql_type=mysql_type + not_null + default,
        spark_type=spark_type,
        nullable=col.nullable,
        default_clause=default,
        comment_clause=comment,
        source_type=col.data_type,
    )


@dataclass
class TableSpec:
    """DDL-side schema of one table (StructType can't carry defaults or
    comments, so both representations live side by side — SURVEY 1.3)."""

    name: str
    columns: list[OracleColumn] = field(default_factory=list)
    comment: str | None = None

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(c.name.lower(), map_type(c)[1], c.nullable)
                for c in sorted(self.columns, key=lambda c: c.ordinal)
            ]
        )

    def mapped(self) -> list[MappedColumn]:
        return [map_column(c) for c in sorted(self.columns, key=lambda c: c.ordinal)]

