"""Per-group feature normalization for training pipelines: z-score and
min-max scaling of a numeric column within each group (source, language,
domain) — the step between raw quality signals and model-ready features.

Everything is computed from EXACT integer aggregates (count, sum,
sum-of-squares, min, max): one partial-aggregable groupBy over the
metric, the per-group stats joined back (Catalyst broadcasts the stats
side — groups are few), then a narrow map. No second raw-data pass, no
window over raw rows, no collect. The mean/variance doubles come from
single divisions of exact bigints and sqrt (correctly rounded per
IEEE-754), so results replay bit-identically in any engine — unlike
built-in stddev aggregates, whose Welford/merge order is
engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_by_group(
    df: DataFrame,
    group_col: str,
    metric_col: str,
) -> DataFrame:
    """df + `zscore` and `minmax` columns for an integer metric, both
    computed within the row's group.

    zscore uses the sample variance from exact sums,
    (ss - s^2/n) / (n-1); it is NULL when the group has fewer than two
    rows or zero variance (both guards replayable in plain SQL).
    minmax is (x - min) / (max - min), 0.0 for constant groups."""
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(metric_col).cast("long").alias("_s"),
        F.sum(F.col(metric_col) * F.col(metric_col)).cast("long").alias("_ss"),
        F.min(metric_col).cast("long").alias("_mn"),
        F.max(metric_col).cast("long").alias("_mx"),
    )
    x = F.col(metric_col).cast("double")
    n = F.col("_n").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    mn = F.col("_mn").cast("double")
    mx = F.col("_mx").cast("double")
    var_num = ss - (s * s) / n
    z = F.when(
        (F.col("_n") > 1) & (var_num > 0),
        (x - s / n) / F.sqrt(var_num / (n - F.lit(1.0))),
    ).otherwise(F.lit(None).cast("double"))
    mm = F.when(F.col("_mx") > F.col("_mn"), (x - mn) / (mx - mn)).otherwise(
        F.lit(0.0)
    )
    return (
        df.join(stats, group_col)
        .withColumn("zscore", z)
        .withColumn("minmax", mm)
        .drop("_n", "_s", "_ss", "_mn", "_mx")
    )
