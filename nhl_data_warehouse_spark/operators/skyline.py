"""2-D skyline (Pareto frontier) operator.

A point dominates another when it is no worse on both axes and
strictly better on at least one. For two dimensions the frontier has
an O(n log n) sweep: group to the per-cost best gain, then keep a
cost-sorted point iff its gain strictly exceeds the running max over
all strictly-cheaper costs. The quadratic NOT-EXISTS definition (the
oracle form) states the same set.

Scale notes: the sweep's one unpartitioned window runs on the
distinct-COST grain — a grid bounded by the domain's pricing/size
scheme, not by row count. If even that grain grew unboundedly, the
sweep shards by cost range and merges per-shard maxima (a 2-pass
associative max); the raw rows are never globally sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pareto_frontier_2d(
    df: DataFrame,
    cost_col: str,
    gain_col: str,
) -> DataFrame:
    """Undominated (minimize ``cost_col``, maximize ``gain_col``)
    points: one row per frontier point with ``n_rows`` source rows
    sitting exactly on it.

    Output columns: cost (source cost values), best_gain (long),
    n_rows (long).
    """
    # internal names: the caller's own columns may be called
    # cost/best_gain, which would make the join-back ambiguous
    best = df.groupBy(F.col(cost_col).alias("_sk_cost")).agg(
        F.max(gain_col).alias("_sk_gain")
    )
    w = Window.orderBy("_sk_cost").rowsBetween(Window.unboundedPreceding, -1)
    frontier = (
        best.withColumn("_m", F.max("_sk_gain").over(w))
        # strictly exceed every strictly-cheaper cost's best gain:
        # an equal gain at lower cost dominates; equal costs already
        # folded into the per-cost max
        .where(F.col("_sk_gain") > F.coalesce(F.col("_m"), F.lit(-(2**62))))
        .drop("_m")
    )
    return (
        df.join(
            F.broadcast(frontier),
            (df[cost_col] == frontier["_sk_cost"])
            & (df[gain_col] == frontier["_sk_gain"]),
        )
        .groupBy(
            frontier["_sk_cost"].alias("cost"),
            frontier["_sk_gain"].cast("long").alias("best_gain"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
