"""Per-group closed-form regression on exact integer sufficient
statistics.

Spark ships ``regr_slope``/``regr_intercept`` aggregates, but their
double accumulators are summation-order dependent — useless for a
cross-engine byte-stable result and risky for reproducible feature
engineering. This module computes the same closed forms from integer
sufficient statistics (counts and sums of pre-scaled int64 x, y),
which are EXACT under any aggregation order: one keyed shuffle with
map-side partial sums, then pure per-group arithmetic in the final
projection.

Generalizes the reference's per-season aggregate marts
(seasonal_metrics_agg.sql) from means to trend (slope/intercept per
entity) — the "is this customer's spend growing?" shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """OLS fit of y on x per group. ``x_col``/``y_col`` MUST already
    be integer (long) columns — scale fixed-point upstream (e.g.
    cents, epoch days); exactness is the caller's contract.

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept from the
    slope — both emitted as raw doubles computed by one fixed
    operation sequence over the exact integer statistics (bit-stable
    across engines without rounding), NULL when x is constant in the
    group (zero variance). Overflow bound: every
    intermediate (n*Sxy, Sx*Sy, …) must fit int64; with |x|<=2^20 and
    |y|<=2^31 that holds to ~2^12 rows per group — rescale x/y or
    pre-aggregate for wilder domains. The num/den casts to double are
    exact while |num|,|den| < 2^53, which keeps the rounded quotient
    bit-identical across engines.
    """
    x, y = F.col(x_col), F.col(y_col)
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    )
    num = F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        F.col("_sy").cast("double") - slope * F.col("_sx").cast("double")
    ) / F.col("n")
    # no ROUND: the sufficient statistics are exact integers, so the
    # closed-form expression — the same literal operation sequence on
    # both engines — is already bit-deterministic. (Rounding would
    # BREAK cross-engine equality at these magnitudes: DuckDB rounds
    # via a double multiply by 10^d, Spark via BigDecimal, and they
    # disagree once |v|*10^d exceeds 2^53.)
    return stats.select(
        group_col,
        "n",
        F.when(den != 0, slope).alias("slope"),
        F.when(den != 0, intercept).alias("intercept"),
    )


def mad_by_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "mad"
) -> DataFrame:
    """Median absolute deviation per group via a GROUPED_AGG pandas
    UDF — the vectorized-UDAF surface (SQL can nest
    ``median(abs(x - median(x)))`` only with a self-join; the Arrow
    grouped aggregate does it in one keyed pass). MAD is the robust
    dispersion gauge outlier pipelines prefer over stddev (a single
    wild value moves stddev arbitrarily, MAD not at all).

    Determinism: numpy's interpolated median over exact doubles —
    identical ordering and (a+b)/2 arithmetic on any engine (DuckDB's
    ``mad``/``median`` match bit-for-bit).

    Scale contract: a GROUPED_AGG UDF materializes each group's
    column in one Arrow batch — right for bounded groups (event
    types, languages, status codes). For unbounded/skewed groups use
    ``approx_percentile``-based dispersion instead; this operator is
    the exact twin.
    """
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: this module uses postponed annotation
    # evaluation, which pandas_udf's Series->scalar hint inference
    # can't resolve (same workaround as similarity.py's scalar UDFs)
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def _mad(v):
        # NULLs arrive as NaN — drop them like SQL aggregates do
        # (DuckDB's mad() skips NULLs; an all-NULL group yields NULL)
        a = v.dropna().to_numpy(dtype="float64")
        if a.size == 0:
            return None
        m = np.median(a)
        return float(np.median(np.abs(a - m)))

    # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg() — the count rides a second pandas agg
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def _n(v):
        return len(v)

    return df.groupBy(group_col).agg(
        _n(F.col(value_col)).alias("n"),
        _mad(F.col(value_col)).alias(out_col),
    )
