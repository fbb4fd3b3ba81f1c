"""Z-order (Morton) data layout: multi-dimension clustering for
zone-map/row-group pruning.

Sorting a table by ONE column makes range predicates on that column
prunable and leaves every other dimension unprunable — the classic
100 TB pain: events laid out by time cannot skip on user, and vice
versa. Z-ordering interleaves the bits of two bucketed dimensions into
one sort key, so files cluster in 2-D tiles and a range predicate on
EITHER (or both) dimensions skips most files. Delta/Iceberg expose this
as OPTIMIZE ZORDER BY; vanilla Spark has no native operator, so this
module provides it as a composition of existing DataFrame ops — one
min/max broadcast + pure integer bit math (codegen-friendly, no UDF),
`repartitionByRange` + `sortWithinPartitions` for the write path, and a
MEASURED audit (the repo's measure-the-shortcut ethos) that prices the
layout decision from zone maps alone, before anything is rewritten.

Everything is exact integer arithmetic (bucket = scaled div, interleave
= shift/mask sums), so the keys and the audit replay bit-identically in
the DuckDB oracles (q197/q198).

Reference parity note: the reference (iverycd/OracleSync2MySQL) has no
layout optimizer — this is part of the LLM-pipeline extension surface
(SURVEY §2.7 X192/X193).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bucket resolution per dimension; 2*ZBITS key bits


def _interleave(bx: F.Column, by: F.Column, bits: int = ZBITS) -> F.Column:
    """Morton interleave: bit i of bx -> key bit 2i, bit i of by ->
    key bit 2i+1. A fixed sum of shift/mask terms — whole-stage codegen
    folds it into straight-line long arithmetic."""
    expr = F.lit(0).cast("long")
    for i in range(bits):
        expr = expr + (
            F.shiftleft(F.shiftright(bx, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        expr = expr + (
            F.shiftleft(F.shiftright(by, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return expr


def zorder_key(
    df: DataFrame,
    x_col,
    y_col,
    bits: int = ZBITS,
) -> DataFrame:
    """df + (_bx, _by, zval): each dimension equi-width-bucketed into
    2^bits cells over its observed [min, max] (one tiny agg broadcast;
    exact integer scaling — `(x - min) * 2^bits div (range + 1)`), then
    Morton-interleaved. Accepts column names or integer-valued Column
    expressions. Ranges above 2^46 would overflow the long scaling and
    raise loudly rather than wrap (pre-bucket such columns first).

    Scale shape: one one-row aggregate + a narrow map — the key costs
    nothing next to the write it orders."""
    xc = F.col(x_col) if isinstance(x_col, str) else x_col
    yc = F.col(y_col) if isinstance(y_col, str) else y_col
    base = df.withColumn("_zx", xc.cast("long")).withColumn(
        "_zy", yc.cast("long")
    )
    agg = base.agg(
        F.min("_zx").alias("_ux"), F.max("_zx").alias("_vx"),
        F.min("_zy").alias("_uy"), F.max("_zy").alias("_vy"),
    )
    # overflow guard folded into USED columns (a free-standing guard
    # column would be pruned by Catalyst and never fire). BOTH min
    # columns carry the full guard (ADVICE r8): round 8 guarded only
    # _ux, so a future caller selecting just _by would let a y-range
    # overflow silently wrap; now either bucket expression — and
    # therefore any consumer of _bx, _by, or zval — trips on any
    # overflowing dimension.
    over = ((F.col("_vx") - F.col("_ux")) > F.lit(1 << 46)) | (
        (F.col("_vy") - F.col("_uy")) > F.lit(1 << 46)
    )

    def _guarded(min_col: str) -> F.Column:
        return (
            F.when(
                over,
                F.raise_error(
                    "zorder_key: dimension range exceeds 2^46 - pre-bucket it"
                ).cast("long"),
            )
            .otherwise(F.col(min_col))
            .alias(min_col)
        )

    mm = agg.select(
        _guarded("_ux"), F.col("_vx"), _guarded("_uy"), F.col("_vy")
    )

    def bucket(col, u, v):
        return F.expr(
            f"(({col} - {u}) * {1 << bits}) div ({v} - {u} + 1)"
        ).cast("long")

    withb = base.crossJoin(F.broadcast(mm))
    bx = bucket("_zx", "_ux", "_vx")
    by = bucket("_zy", "_uy", "_vy")
    return (
        withb.withColumn("_bx", bx)
        .withColumn("_by", by)
        .withColumn("zval", _interleave(F.col("_bx"), F.col("_by"), bits))
        .drop("_zx", "_zy", "_ux", "_vx", "_uy", "_vy")
    )


def zorder_layout_audit(
    df: DataFrame,
    x_col: str,
    y_col,
    id_col: str,
    rows_per_file: int = 256,
    box_pct=(25, 35, 30, 50),
    bits: int = ZBITS,
) -> DataFrame:
    """Price the layout decision BEFORE rewriting 100 TB: lay the same
    rows into `rows_per_file` files under (a) a linear sort on x and
    (b) the z-order key, build each layout's zone maps, and report how
    many files a 2-D range predicate skips under each — the exact
    decision a row-group reader makes from footers. The predicate box
    is given as percents of each dimension's observed range
    (lo_x%, hi_x%, lo_y%, hi_y%), so the audit is scale-free.

    File assignment uses the exact two-phase global rank (never one
    giant sort task); everything downstream is per-file min/max + a
    one-pass overlap count over FILE-cardinality rows. All integer
    math -> the q198 oracle hash-matches the audit numbers.
    Output: (layout, n_files, files_scanned, rows_total, rows_scanned,
    skip_fraction), one row per layout."""
    from .features import global_rank

    yc = F.col(y_col) if isinstance(y_col, str) else y_col
    keyed = zorder_key(df, x_col, yc, bits).select(
        F.col(id_col).alias("_id"),
        F.col("_bx"),
        F.col("_by"),
        F.col("zval"),
    )
    lo_x, hi_x, lo_y, hi_y = box_pct
    # the box in bucket space: percents of [0, 2^bits)
    cells = 1 << bits

    def pct(p):
        return F.lit(cells * p // 100).cast("long")

    in_file_stats = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("_bx").alias("x_min"), F.max("_bx").alias("x_max"),
        F.min("_by").alias("y_min"), F.max("_by").alias("y_max"),
    ]

    def layout(name: str, order_cols) -> DataFrame:
        ranked = global_rank(keyed, order_cols, out_col="_rank")
        files = (
            ranked.withColumn(
                "_file", F.expr(f"(_rank - 1) div {rows_per_file}")
            )
            .groupBy("_file")
            .agg(*in_file_stats)
        )
        prunable = (
            (F.col("x_max") < pct(lo_x)) | (F.col("x_min") > pct(hi_x))
            | (F.col("y_max") < pct(lo_y)) | (F.col("y_min") > pct(hi_y))
        )
        return files.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum((~prunable).cast("long")).cast("long").alias("files_scanned"),
            F.sum("n_rows").cast("long").alias("rows_total"),
            F.sum(F.when(~prunable, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
        ).withColumn(
            "skip_fraction",
            (F.col("rows_total") - F.col("rows_scanned")).cast("double")
            / F.col("rows_total").cast("double"),
        )
    linear = layout("linear_x", [F.col("_bx"), F.col("_id")])
    zord = layout("zorder", [F.col("zval"), F.col("_id")])
    return linear.unionByName(zord)
