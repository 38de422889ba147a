"""Exact group-wise quantiles — the calibration step of quality gating:
per-group (per-language, per-source) score thresholds like "keep the top
25% by length" need the group's actual quantiles, not a global guess.

Approximate sketches (t-digest, GK, percentile_approx) are the usual
scale answer but none is engine-portable — two implementations disagree
in the tails, exactly where gating thresholds live. This operator
computes EXACT type-1 (lower) quantiles with integer rank arithmetic:
the p-quantile of a group of n values is the value at sorted position
ceil(p*n), p expressed in basis points so the rank computation is pure
BIGINT (`(p_bp * n + 9999) div 10000`) and bit-identical on any engine.

Scale shape: ONE shuffle on the group key, one window pass (row_number +
count), then a per-row explode over the |ps| requested quantiles and a
rank-match filter — output is |groups| x |ps| rows. Exact quantiles
fundamentally cost a per-group sort; that is this plan's only shuffle,
and Spark's window sort spills gracefully. For quantiles of a GLOBAL
population at 10^10 rows, sample first or accept one range-partitioned
sort — per-group (the calibration shape: thousands of groups) the sort
parallelizes across groups.

No reference counterpart: Gobblin carries record counts only; quality
calibration belongs to the training-data family this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps_bp: list[int],
    out_col: str = "value",
) -> DataFrame:
    """Long-form exact quantiles: one row per (group, p_bp) with the
    group's type-1 p-quantile of ``value_col`` and the group size.

    ``ps_bp`` are basis points (2500 = p25, 5000 = median, 10000 = max).
    Ties and duplicate values are handled by rank arithmetic (row_number
    over (value, all-columns determinism is unnecessary: any row holding
    the ranked value yields the same value)). NULL values are excluded —
    quantiles of nothing are nothing."""
    for p in ps_bp:
        if not (0 < p <= 10000):
            raise ValueError(f"p_bp must be in (0, 10000], got {p}")
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col).asc())
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_cnt",
            F.count(F.lit(1)).over(
                Window.partitionBy(*group_cols).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    hit = ranked.select(
        *group_cols,
        F.col(value_col).alias(out_col),
        F.col("_cnt").cast("long").alias("n_values"),
        F.explode(F.array(*[F.lit(int(p)) for p in ps_bp])).alias("p_bp"),
        F.col("_rn"),
    ).filter(
        # ceil(p*n/10000) in pure BIGINT — identical on every engine
        F.col("_rn") == F.expr("(p_bp * n_values + 9999) div 10000")
    )
    return hit.select(*group_cols, "p_bp", out_col, "n_values")
