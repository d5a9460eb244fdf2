"""Ranking-quality evaluation: NDCG@k and MRR per query group.

The retrieval/eval companion to the classifier metrics in stats.py
(rank_auc, calibration): given rows scored by a ranker and a graded
relevance label, compute per-group NDCG@k and MRR with a fully
deterministic floating-point recipe, so the values hash-match a SQL
oracle bit-for-bit:

- the rank order carries a unique tie-break column (suite doctrine);
- discount weights are round(log2(rank+1), 6) — the 6-dp rounding
  absorbs libm last-ulp differences between engines (the suite's
  rounded-ln rule), and none of the small-integer log2 values sit
  near a 6-dp midpoint;
- DCG folds the <= k per-group terms LEFT-TO-RIGHT in rank order
  (F.aggregate over a rank-sorted array; the oracle uses DuckDB's
  ordered-aggregate SUM(x ORDER BY rank)) — identical IEEE op
  sequence on both engines;
- IDCG folds the same terms with relevance sorted descending; equal
  relevance values make within-tie order irrelevant.

Scale: the only shuffle is the rank window partitioned by the group
key; everything after operates on <= k rows per group collapsed to
one array — no further exchange, no row-scale window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ndcg_mrr_at_k(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tiebreak_col: str,
    relevance: Column,
    k: int = 10,
) -> DataFrame:
    """Per-group NDCG@k and MRR of the ``score_col``-descending
    ranking against a graded ``relevance`` column expression.

    Output: (group, n_ranked, ndcg, mrr) — ndcg NULL when the group
    has no relevant item in its ideal ranking (IDCG = 0), mrr NULL
    when no relevant item appears in the top k.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(tiebreak_col).asc()
    )
    ranked = (
        df.select(
            F.col(group_col),
            F.col(score_col),
            F.col(tiebreak_col),
            relevance.cast("double").alias("rel"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )
    g = ranked.groupBy(group_col).agg(
        F.sort_array(F.collect_list(F.struct("rnk", "rel"))).alias("items")
    )
    # per-element double ops are deterministic; the folds are ordered
    terms = F.transform(
        "items", lambda s: s["rel"] / F.round(F.log2(s["rnk"] + 1), 6)
    )
    dcg = F.aggregate(
        terms, F.lit(0.0), lambda acc, x: acc + x
    )
    rels_desc = F.reverse(
        F.array_sort(F.transform("items", lambda s: s["rel"]))
    )
    ideal_terms = F.transform(
        rels_desc, lambda x, i: x / F.round(F.log2(i + 2), 6)
    )
    idcg = F.aggregate(ideal_terms, F.lit(0.0), lambda acc, x: acc + x)
    first_rel = F.array_min(
        F.transform(
            F.filter("items", lambda s: s["rel"] > 0), lambda s: s["rnk"]
        )
    )
    return g.select(
        F.col(group_col),
        F.size("items").cast("long").alias("n_ranked"),
        F.when(idcg > 0, dcg / idcg).alias("ndcg"),
        F.when(
            first_rel.isNotNull(), F.lit(1.0) / first_rel
        ).alias("mrr"),
    )
