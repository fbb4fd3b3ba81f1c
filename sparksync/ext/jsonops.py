"""JSON extraction over the events.props CLOB column.

The reference treats CLOBs as opaque longtext (tablemeta.go:151-152);
the extension layer parses them: get_json_object for ad-hoc paths,
from_json for a declared schema (columnar, codegen'd — no Python)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def extract_k(df: DataFrame, props_col: str = "props") -> DataFrame:
    """events + a parsed `k` column."""
    return df.withColumn(
        "k", F.get_json_object(F.col(props_col), "$.k").cast("long")
    )


def props_struct(df: DataFrame, props_col: str = "props") -> DataFrame:
    """Schema-declared parse — the scale path (single pass, no per-path
    re-parse)."""
    return df.withColumn("props_s", F.from_json(F.col(props_col), PROPS_SCHEMA))


def k_stats_by_type(df: DataFrame) -> DataFrame:
    """Per-event-type stats of the JSON field."""
    return (
        extract_k(df)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
