"""Distribution-comparison statistics: Mann-Whitney U and two-sample
Kolmogorov-Smirnov, computed from ALL-INTEGER sufficient statistics.

Both tests are rank statistics, and ranks depend only on the
distinct-value histogram — so the operators first aggregate to an
integer measurement grain (cents by default: price-like doubles with
two decimals map exactly onto a finite grid bounded by the price
RANGE, not the corpus size), then run their one ordering window over
the histogram. At 100 TB the histogram is still ~10^4-10^5 cells, so
the unpartitioned window is over a bounded relation — the same grain
contract CUSUM (timeseries.py) and the hybrid quantiles use.

The final statistics are single fixed-order double expressions over
exact integers (the regression.py doctrine): identical inputs and
identical IEEE operation sequences are bit-stable across engines, so
no rounding is applied (rounding would BREAK cross-engine equality —
DuckDB rounds via a double multiply, Spark via BigDecimal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# z-statistic pieces shared with the suite oracle (same literal text
# keeps the operation sequence identical on both engines)
MW_MEAN_DIFF = """
    CAST(u2 AS DOUBLE) / 2.0 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0
"""
MW_SIGMA = """
    sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
         * (CAST(n + 1 AS DOUBLE)
            - CAST(tsum AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))
"""


def _cents_histogram(
    df: DataFrame, value_col: str, is_group1: Column, scale: int
) -> DataFrame:
    """(cell, n1v, nv) histogram over the fixed-point grain."""
    vals = df.where(F.col(value_col).isNotNull()).select(
        F.round(F.col(value_col) * scale).cast("long").alias("c"),
        F.when(is_group1, 1).otherwise(0).alias("is1"),
    )
    return vals.groupBy("c").agg(
        F.sum("is1").alias("n1v"), F.count(F.lit(1)).alias("nv")
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    is_group1: Column,
    scale: int = 100,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) of group-1 vs the rest.

    Midranks never materialize: with the histogram sorted by cell,
    the midrank of cell c is cum(c) + (n(c)+1)/2, so twice the
    group-1 rank sum is 2*R1 = sum(n1(c) * (2*cum(c) + n(c) + 1)) —
    an integer. U = R1 - n1(n1+1)/2 follows, and the tie-corrected
    normal approximation z uses sum(t^3 - t) over cell counts, also
    an integer. One row out: (n1, n2, u_statistic, z_value).

    U is a multiple of 0.5 with magnitude <= n1*n2, exactly
    representable as a double far beyond any real corpus.
    """
    hist = _cents_histogram(df, value_col, is_group1, scale)
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn("cumn", F.coalesce(F.sum("nv").over(w), F.lit(0)))
    stats = cum.agg(
        F.sum("n1v").cast("long").alias("n1"),
        F.sum("nv").cast("long").alias("n"),
        F.sum(F.col("n1v") * (2 * F.col("cumn") + F.col("nv") + 1))
        .cast("long")
        .alias("r2"),
        F.sum(F.col("nv") * F.col("nv") * F.col("nv") - F.col("nv"))
        .cast("long")
        .alias("tsum"),
    )
    u = stats.select(
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        "n",
        "tsum",
        (F.col("r2") - F.col("n1") * (F.col("n1") + 1)).alias("u2"),
    )
    return u.select(
        "n1",
        "n2",
        F.expr("CAST(u2 AS DOUBLE) / 2.0").alias("u_statistic"),
        F.expr(f"({MW_MEAN_DIFF}) / ({MW_SIGMA})").alias("z_value"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    is_group1: Column,
    scale: int = 100,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D = sup |F1 - F2|.

    The sup is taken over integer cross-products — D_num =
    max |cum1*n2 - cum2*n1| — so the only floating-point operation is
    the final division D = D_num / (n1*n2). (Overflow bound:
    cum1*n2 <= n1*n2 must fit int64, i.e. both samples below ~3e9
    rows; past that, pre-aggregate or widen to decimal.) One row out:
    (n1, n2, d_stat).
    """
    hist = _cents_histogram(df, value_col, is_group1, scale).select(
        "c", "n1v", (F.col("nv") - F.col("n1v")).alias("n2v")
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        F.sum("n1v").over(w).alias("cum1"), F.sum("n2v").over(w).alias("cum2")
    )
    tot = cum.agg(
        F.max("cum1").cast("long").alias("n1"),
        F.max("cum2").cast("long").alias("n2"),
    )
    dnum = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")))
        .cast("long")
        .alias("dnum"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    return dnum.select(
        "n1",
        "n2",
        F.expr(
            "CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"
        ).alias("d_stat"),
    )


def rank_auc(
    df: DataFrame,
    score_col: str,
    is_positive: Column,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney identity: AUC =
    P(score_pos > score_neg) + P(tie)/2 = U1 / (n_pos * n_neg), with
    midranks handling ties — the standard rank form (no trapezoid
    sweep, no threshold grid; they coincide exactly for step ROCs).

    Same sufficient-statistic discipline as ``mann_whitney_u``: scores
    collapse to the fixed-point grain (``round(score * scale)``), twice
    the positive rank sum is the integer 2*R1 = sum(n1(c) * (2*cum(c)
    + n(c) + 1)), and AUC is ONE double division of exact integers:
    (2*R1 - n_pos*(n_pos+1)) / (2*n_pos*n_neg). The grain is part of
    the metric's definition here (1e-6 on sigmoid scores loses nothing
    — 6-dp-rounded scores map to distinct cells exactly), which is what
    makes the value bit-reproducible on any engine or partitioning.

    Scale: the histogram is one map-side-combined aggregate; the
    cumulative window orders score CELLS (<= scale+1 of them for
    scores in [0, 1]), never rows. One row out:
    (n_pos, n_neg, auc).
    """
    hist = _cents_histogram(df, score_col, is_positive, scale)
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn("cumn", F.coalesce(F.sum("nv").over(w), F.lit(0)))
    stats = cum.agg(
        F.sum("n1v").cast("long").alias("n1"),
        (F.sum("nv") - F.sum("n1v")).cast("long").alias("n2"),
        F.sum(F.col("n1v") * (2 * F.col("cumn") + F.col("nv") + 1))
        .cast("long")
        .alias("r2"),
    )
    # Degenerate-class guard (ADVICE r7): with a single class the
    # metric is undefined — Spark's non-ANSI divide yields NULL but
    # DuckDB's double division gives inf/NaN, so make NULL explicit
    # on both engines (the oracle carries the same CASE WHEN).
    return stats.select(
        F.col("n1").alias("n_pos"),
        F.col("n2").alias("n_neg"),
        F.expr(
            "CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(NULL AS DOUBLE) "
            "ELSE CAST(r2 - n1 * (n1 + 1) AS DOUBLE) "
            "/ CAST(2 * n1 * n2 AS DOUBLE) END"
        ).alias("auc"),
    )
