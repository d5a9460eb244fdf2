"""Exact interpolated quantiles at scale — without a global sort.

``F.percentile`` (used by the suite's ``exact_percentiles``) is exact
but sort-based: per aggregation group it buffers and orders every
value, which is fine per-group and a non-starter for a GLOBAL quantile
over 100TB. ``approx_percentile`` is single-pass and mergeable but
inexact. This module implements the classic hybrid that gets BOTH:

1. **Sketch bracket** (1 scan): a GK sketch (``approx_percentile``
   with accuracy ``a``) has a deterministic rank-error bound n/a, so
   the values at guard quantiles ``p ± 4/a`` bracket the true order
   statistics of rank ``floor((n-1)p)+1`` and ``+2`` with certainty
   for n > 2a/3 (see the in-code margin proof); smaller inputs rank
   in full — both regimes exact by construction.
2. **Band count** (1 scan): count rows strictly below each band's
   lower bound — the global rank offset of the band.
3. **Band refine** (1 scan): only rows inside a band (≤ 4n/a of them
   per quantile) are ranked with a window PARTITIONED BY BAND; global
   rank = offset + in-band rank selects the two bracketing order
   statistics exactly, and one fixed-order interpolation
   ``lo + (hi - lo) * f`` with ``f = (n-1)p - floor((n-1)p)`` yields
   the percentile_cont value bit-for-bit (lo/hi are exact data
   values; the expression text is mirrored by any oracle).

Scale shape: three scans, no global sort, no driver collect. Each
band holds at most 4n/a rows — pick ``accuracy`` so that fits one
task (a = 10^4 puts 4e8 rows per band at n = 10^12; a = 10^6 puts
4e6). The band window is partitioned per quantile band, so bands
rank in parallel and nothing unbounded lands in one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    ps: list[float],
    accuracy: int = 10_000,
    group_col: str | None = None,
) -> DataFrame:
    """Exact linear-interpolated quantiles (SQL ``percentile_cont``
    semantics) of ``value_col`` at each probability in ``ps``.
    Returns (p double, quantile double), one row per p — or, with
    ``group_col``, one row per (group, p) with the group column first.

    The grouped form is the scale story sort-based ``F.percentile``
    can't tell for UNBOUNDED groups: per-group state here is a GK
    sketch + counters, never the group's values, and the refine
    window partitions by (group, band) so a giant group still ranks
    only its ~4n_g/accuracy band rows. Group-cardinality contract:
    dimension-scale groups (statuses, languages, priorities) — the
    one-row-per-group stats/offsets relations are broadcast. For
    millions of groups drop the broadcast hints; the same plan then
    shuffles on the group key, which is the right trade there.

    Values must be non-null; ps must each lie in [0, 1].
    """
    for p in ps:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"exact_quantiles: p must be in [0,1], got {p}")
    v = F.col(value_col)
    # Guard width 4/a is provably sufficient for n > 2a/3 in BOTH GK
    # sketch regimes: approx mode (rank error <= n/a leaves a 3n/a >= 2
    # rank margin) and exact mode (the sketch's rank grid is
    # ceil(p*n), which sits up to 2 ranks off percentile_cont's
    # floor((n-1)p)+1 — the margin covers it). Smaller groups skip the
    # bracket entirely and rank in full (<= 2a/3 rows — bounded by the
    # accuracy knob, trivially cheap), because no literal guard can
    # cover a 2-rank miss when 4n/a < 2.
    guard = 4.0 / accuracy
    small_n = (2 * accuracy) // 3
    # unified path: the global form is one synthetic group. Joins on
    # the group key replace scalar crossJoins; with one group (or few)
    # the stats/offsets sides broadcast, so the plan degenerates to
    # the scalar-broadcast shape.
    synthetic = group_col is None
    g = "__g" if synthetic else group_col
    base = df.withColumn("__g", F.lit(0)) if synthetic else df
    # pass 1: count + deterministic sketch brackets per (group, p)
    stats = base.groupBy(g).agg(
        F.count(value_col).alias("__n"),
        *[
            F.percentile_approx(
                value_col, F.lit(max(0.0, p - guard)), F.lit(accuracy)
            ).alias(f"__blo_{i}")
            for i, p in enumerate(ps)
        ],
        *[
            F.percentile_approx(
                value_col, F.lit(min(1.0, p + guard)), F.lit(accuracy)
            ).alias(f"__bhi_{i}")
            for i, p in enumerate(ps)
        ],
    )
    with_stats = base.join(F.broadcast(stats), on=g)
    # pass 2: per (group, band) rank offset (strictly-below count),
    # plus each band's smallest value ABOVE it. The sketch bracket
    # guarantees the k_lo statistic is inside [blo, bhi], but k_hi =
    # k_lo + 1 can fall one rank past the band when the band collapses
    # to a single value (small n, or p at the tail): ranks are
    # contiguous over a value interval, so in that case the k_hi
    # statistic IS the next value above the band — captured here in
    # the same scan and coalesced in at the end.
    small = F.col("__n") <= small_n
    offsets = with_stats.groupBy(g).agg(
        *[
            F.sum((~small & (v < F.col(f"__blo_{i}"))).cast("long")).alias(
                f"__off_{i}"
            )
            for i in range(len(ps))
        ],
        *[
            F.min(F.when(~small & (v > F.col(f"__bhi_{i}")), v)).alias(
                f"__next_{i}"
            )
            for i in range(len(ps))
        ],
    )
    # pass 3: tag band membership (a row can sit in several bands when
    # ps are close — the exploded when-array keeps one tagged copy per
    # band), rank within each (group, band), select the two bracketing
    # order statistics
    band_tags = F.array(
        *[
            F.when(
                small | ((v >= F.col(f"__blo_{i}")) & (v <= F.col(f"__bhi_{i}"))),
                F.lit(i),
            )
            for i in range(len(ps))
        ]
    )
    tagged = (
        with_stats.select(
            F.col(g).alias("__gk"),
            v.alias("__v"),
            "__n",
            F.explode(band_tags).alias("__band"),
        )
        .filter(F.col("__band").isNotNull())
        .join(
            F.broadcast(offsets.withColumnRenamed(g, "__gk")), on="__gk"
        )
    )
    off = None
    nxt = None
    for i in range(len(ps)):
        c = F.col(f"__off_{i}")
        off = c if off is None else F.when(F.col("__band") == i, c).otherwise(off)
        x = F.col(f"__next_{i}")
        nxt = x if nxt is None else F.when(F.col("__band") == i, x).otherwise(nxt)
    # build per-row target ranks from n (all integer-exact: n-1 < 2^53)
    p_col = None
    for i, p in enumerate(ps):
        lit = F.lit(float(p))
        p_col = lit if p_col is None else F.when(F.col("__band") == i, lit).otherwise(p_col)
    kf = (F.col("__n") - 1).cast("double") * p_col
    k_lo = F.floor(kf).cast("long") + 1
    k_hi = F.least(k_lo + 1, F.col("__n"))
    frac = kf - F.floor(kf)
    w = Window.partitionBy("__gk", "__band").orderBy("__v")
    ranked = (
        tagged.withColumn("__off", off)
        .withColumn("__nxt", nxt)
        .withColumn("__p", p_col)
        .withColumn("__grank", F.row_number().over(w) + F.col("__off"))
        .withColumn("__klo", k_lo)
        .withColumn("__khi", k_hi)
        .withColumn("__f", frac)
        .filter((F.col("__grank") == F.col("__klo")) | (F.col("__grank") == F.col("__khi")))
    )
    sel = ranked.groupBy("__gk", "__band").agg(
        F.max("__p").alias("p"),
        F.max("__f").alias("__ff"),
        F.max(F.when(F.col("__grank") == F.col("__klo"), F.col("__v"))).alias("__lo"),
        F.max(F.when(F.col("__grank") == F.col("__khi"), F.col("__v"))).alias("__hi"),
        F.max("__nxt").alias("__nxt"),
    )
    # one fixed-order IEEE expression — mirror EXACTLY in any oracle.
    # __hi falls back to the band's next-above value when rank k_hi
    # sits one past the band (see offsets pass).
    hi = F.coalesce(F.col("__hi"), F.col("__nxt"))
    quant = (F.col("__lo") + (hi - F.col("__lo")) * F.col("__ff")).alias(
        "quantile"
    )
    if synthetic:
        return sel.select("p", quant)
    return sel.select(F.col("__gk").alias(group_col), "p", quant)
