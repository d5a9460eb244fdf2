"""Mergeable frequency sketches with engine-portable determinism.

``approx_count_distinct`` / ``percentile_approx`` cover the HLL and
t-digest paths (suite queries ``approx_distinct_users`` /
``approx_value_percentiles``) but their estimates are engine-specific.
The count-min sketch here is different: its hash rows are md5-prefix
buckets, so the ENTIRE sketch — counters and estimates — is exact,
reproducible integer arithmetic in any engine that has md5. That's
what lets the driver hash-match a sketch, and what a 100 TB pipeline
wants anyway: CMS counters are a map-side-combinable groupBy
(4 x 256 cells per partition), merged by addition, never a shuffle of
raw tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# depth-4 hash family: salted md5, first 2 hex chars = 256 buckets/row
CMS_SALTS: list[str] = ["cms0", "cms1", "cms2", "cms3"]
CMS_BUCKET_HEX = 2


def _bucket(salt: str, col: F.Column | str) -> F.Column:
    return F.substring(F.md5(F.concat(F.lit(salt), F.col(col))), 1, CMS_BUCKET_HEX)


def countmin_counters(items: DataFrame, term_col: str = "term") -> DataFrame:
    """Build the CMS counter table (row_id, bucket, c) from one row
    per item occurrence. 4 x 256 counters regardless of input size —
    the partial aggregation collapses each partition to at most 1024
    rows before any shuffle."""
    occ = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_id"),
                        _bucket(salt, term_col).alias("bucket"),
                    )
                    for i, salt in enumerate(CMS_SALTS)
                ]
            )
        ).alias("rb")
    ).select("rb.row_id", "rb.bucket")
    return occ.groupBy("row_id", "bucket").agg(F.count(F.lit(1)).alias("c"))


def countmin_estimates(items: DataFrame, term_col: str = "term") -> DataFrame:
    """Point-query every distinct term against the sketch: estimate =
    min over hash rows of that row's bucket counter. Returns
    (term, true_count, cms_estimate) so over-estimates from bucket
    collisions are visible; CMS guarantees estimate >= true."""
    items = items.persist()  # counters + truth + probe all read it
    counters = countmin_counters(items, term_col)
    truth = items.groupBy(term_col).agg(F.count(F.lit(1)).alias("true_count"))
    probes = truth.select(
        term_col,
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_id"),
                        _bucket(salt, term_col).alias("bucket"),
                    )
                    for i, salt in enumerate(CMS_SALTS)
                ]
            )
        ).alias("rb"),
    ).select(term_col, "true_count", "rb.row_id", "rb.bucket")
    return (
        probes.join(F.broadcast(counters), on=["row_id", "bucket"])
        .groupBy(term_col, "true_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
