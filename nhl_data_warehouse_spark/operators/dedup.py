"""Deduplication operators for training-data pipelines.

Generalizes the reference's only dedup mechanism — md5 lineage keys +
anti-join (``copy_into_*.sql:6`` + ``games.sql:11-13``) — into the
family a 100TB corpus pipeline needs:

- exact dedup (hash group-by on content fingerprints)
- MinHash + LSH banding (shingle -> minhash signature -> band buckets
  -> bucket-join candidates) for near-duplicates at scale
- SimHash (bitwise parity sketch, hamming-bucket dedup)
- n-gram Jaccard verification for candidate pairs

Scale design: every operator is shuffle-bounded by design — shingling
is a narrow explode; minhash reduces per-doc (map-side partial min);
the only wide op is the band-key self-join, whose fan-out is governed
by band width (wider bands = fewer, higher-precision candidates).
Nothing ever compares all pairs. Hashes are md5-hex strings ordered
lexicographically (order-isomorphic to the 128-bit value), which keeps
every step expressible in portable SQL and identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized_text(col="text") -> F.Column:
    """Canonical text for fingerprinting: lowercase, punctuation
    stripped, whitespace collapsed and trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", normalize: bool = False
) -> DataFrame:
    """Exact duplicate groups by content hash: one row per distinct
    content with the representative (min id) and the duplicate count.
    Content equality via md5 fingerprint group-by — one shuffle keyed
    on a 32-char hash, never on the (potentially huge) text itself.
    """
    content = normalized_text(text_col) if normalize else F.col(text_col)
    return (
        df.select(F.col(id_col), F.md5(content).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _scale_out(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input is
    under-partitioned (e.g. one small parquet file): CPU-heavy
    per-row work (hashing, shingling) must not serialize onto a
    handful of tasks. No-op when the source already has enough
    partitions — at real scale the file layout provides them."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def char_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 12
) -> DataFrame:
    """Distinct character k-gram shingles per document (narrow op:
    generate positions -> substring -> explode -> local distinct)."""
    positions = F.sequence(F.lit(1), F.greatest(F.length(text_col) - (k - 1), F.lit(1)))
    return (
        _scale_out(df)
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.transform(positions, lambda i: F.substring(F.col(text_col), i, k))
                )
            ).alias("shingle"),
        )
        .filter(F.length("shingle") == k)
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", n_hashes: int = 8
) -> DataFrame:
    """MinHash signature per document: for hash function i,
    ``min(md5(i || '|' || shingle))``.

    Scale shape: md5 is the expensive step, so hash each DISTINCT
    shingle once into an (shingle -> h1..hn) dimension and join it
    back to the (doc, shingle) pairs — cost n_hashes x |vocabulary|
    instead of n_hashes x |occurrences| (crypto-hash work drops by the
    corpus's repetition factor). The signature is then one group-by
    with n plain mins; partial aggregation means the shuffle carries
    only (doc, n_hashes) values regardless of shingle count.
    """
    distinct_sh = shingles.select("shingle").distinct()
    hashed = distinct_sh.select(
        "shingle",
        *[
            F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))).alias(f"h{i}")
            for i in range(1, n_hashes + 1)
        ],
    )
    # vocabulary dim is small (distinct shingles x 8 hashes) —
    # broadcast so the pair side never shuffles
    joined = shingles.join(F.broadcast(hashed), on="shingle")
    return joined.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"mh{i}") for i in range(1, n_hashes + 1)]
    )


def minhash_band_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket key,
    self-join on (band index, bucket) — candidate pairs are docs
    agreeing on ALL minhashes of at least one band. Probability a pair
    with Jaccard s becomes a candidate: 1-(1-s^band_size)^n_bands.
    """
    n_bands = n_hashes // band_size
    bands = signatures.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat(
                                *[
                                    F.col(f"mh{b * band_size + j + 1}")
                                    for j in range(band_size)
                                ]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = bands.select(F.col(id_col).alias("a_id"), "band", "bucket")
    b = bands.select(F.col(id_col).alias("b_id"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    candidates: DataFrame | None = None,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for near-dup verification.

    Joins docs through shared shingles (never all pairs): intersection
    size by counting shared shingles, union by |A|+|B|-|A∩B|.
    ``candidates`` (e.g. from LSH banding) restricts the pair space;
    ``max_shingle_freq`` drops stop-shingles whose fan-out would
    dominate the join at scale (the standard frequency-cap trick —
    drops only pairs connected *solely* through ubiquitous shingles,
    which have low Jaccard anyway).
    """
    sh = shingles
    if max_shingle_freq is not None:
        freq_ok = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_shingle_freq)
            .select("shingle")
        )
        sh = sh.join(freq_ok, on="shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("a_id"), "shingle")
    b = sh.select(F.col(id_col).alias("b_id"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if candidates is not None:
        inter = inter.join(candidates, on=["a_id", "b_id"], how="left_semi")
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, on="a_id")
        .join(sb, on="b_id")
        .select(
            "a_id",
            "b_id",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """SimHash sketch: per token, bit b votes +1/-1 by the high bit of
    hex digit b of md5(token); the sketch sets bit b iff the weighted
    vote is positive. Near-dup docs differ in few bits (hamming), so
    grouping by the sketch (or bucketing on bit-bands) finds near-dups
    with ONE aggregation — no pairwise work at all.

    bits <= 32 (md5 hex length). Narrow explode (tokens x bits) then
    partial-aggregated group-by: shuffle carries (doc, bits) rows.
    """
    assert bits <= 32
    tokens = _scale_out(df).select(
        id_col, F.explode(F.split(text_col, " ")).alias("tok")
    ).filter(F.col("tok") != "")
    votes = tokens.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda b: F.struct(
                    b.alias("bit"),
                    # hex digits order '0'-'9' < 'a'-'f', so >= '8' is
                    # exactly the high-bit test (same set as the
                    # oracle's strpos('89abcdef', ch) > 0)
                    F.when(
                        F.md5("tok").substr(b + 1, F.lit(1)) >= "8",
                        F.lit(1),
                    )
                    .otherwise(F.lit(-1))
                    .alias("vote"),
                ),
            )
        ).alias("bv"),
    ).select(id_col, F.col("bv.bit").alias("bit"), F.col("bv.vote").alias("vote"))
    bit_sums = votes.groupBy(id_col, "bit").agg(F.sum("vote").alias("s"))
    # shiftleft via expr: the pyspark F.shiftleft wrapper only takes a
    # Python int for numBits, but the SQL function accepts a column
    bit_value = F.expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) ELSE CAST(0 AS BIGINT) END")
    return bit_sums.groupBy(id_col).agg(F.sum(bit_value).alias("simhash"))
