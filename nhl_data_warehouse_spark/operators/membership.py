"""Approximate-membership operators: a deterministic Bloom filter as
a (word, bits) bitmap RELATION.

The 100 TB ingestion problem this solves: before the exact
batch-vs-history anti-join (``write.incremental_insert``,
``operators/dedup.py``), a Bloom pre-filter built from the history's
fingerprints lets the overwhelming majority of definitely-new rows
skip the expensive keyed shuffle against the full history — the
standard lakehouse membership short-circuit. OSS Spark uses exactly
this shape internally for runtime bloom-filter join pruning
(``bloom_filter_agg`` / ``might_contain``), but those expressions are
not SQL/DataFrame-registrable in 4.1 and their bit layout is
engine-private; this relation form is engine-portable and
oracle-checkable bit for bit.

Design choices, each load-bearing at scale:

- **The filter is a relation, not a driver-side byte array.** m bits
  live as ``m/64`` rows of (word: long, bits: long) built with one
  map-side-combined ``bit_or`` aggregate. A 2^33-bit filter (1 GiB,
  ~3% FPR at 2e9 keys with k=3) is 134M rows — never collected,
  joined on ``word`` (AQE broadcasts it while it is small).
- **Deterministic hashing**: position i = int(8-hex window i of
  md5(key)) mod m. md5 is bit-identical in every engine, so the
  filter contents — and therefore every membership verdict,
  *including the false positives* — are exactly reproducible
  cross-engine. Data-dependent but NOT seed-dependent: no RNG.
- **No false negatives by construction**: a recorded key's k bits are
  all set, so probing the same key must hit all k — the exactness
  half of the contract a pre-filter needs (a miss may skip the exact
  join; a hit may not be trusted). The suite pins this boolean.

k <= 4 because one md5 yields four independent 8-hex windows (same
window layout as ``dedup._mh_window``); powers-of-two m keep the
DIV/% oracle SQL tidy (any m is integer-exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of the k bit positions for a key: md5 hex windows mod m."""
    assert 1 <= k <= 4, "one md5 digest carries four 8-hex windows"
    fp = F.md5(key.cast("string"))
    return F.array(
        *[
            F.conv(F.substring(fp, 1 + 8 * i, 8), 16, 10).cast("long") % m_bits
            for i in range(k)
        ]
    )


def _word_mask(pos_df: DataFrame, keep: list[str]) -> DataFrame:
    """(pos) -> (word = pos DIV 64, mask = 1L << pos % 64)."""
    return pos_df.select(
        *keep,
        F.expr("pos DIV 64").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias(
            "__mask"
        ),
    )


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Build the (word, bits) Bloom bitmap relation from a key column.

    One narrow map (md5 -> k positions -> (word, mask)) then one
    map-side-combined ``bit_or`` aggregate on word — the only shuffle,
    and it carries at most ``m_bits/64`` groups.
    """
    pos = keys.select(
        F.explode(_positions(F.col(key_col), m_bits, k)).alias("pos")
    )
    return (
        _word_mask(pos, keep=[])
        .groupBy("word")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_probe(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    id_col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Probe rows against a ``bloom_build`` relation.

    Returns one row per ``id_col`` with a ``bloom_member`` boolean:
    True iff ALL k positions hit set bits (maybe-seen; False is
    definitely-new). The probe explodes to k rows per key, left-joins
    the bitmap on ``word`` (broadcast while the filter is small;
    co-partitioned hash join at the 2^33-bit scale), and reduces with
    ``bool_and`` — raw payloads never join anything.
    """
    pos = probe.select(
        F.col(id_col),
        F.explode(_positions(F.col(key_col), m_bits, k)).alias("pos"),
    )
    return (
        _word_mask(pos, keep=[id_col])
        .join(bloom, on="word", how="left")
        .groupBy(id_col)
        .agg(
            F.bool_and(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("__mask")) != 0)
            ).alias("bloom_member")
        )
    )


def bloom_prefiltered_new_rows(
    batch: DataFrame,
    history: DataFrame,
    key_col: str,
    id_col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """The composition the bitmap exists for: batch-vs-history dedup
    where only the Bloom *maybe-seen* slice pays the exact anti-join.

    Returns exactly the rows of ``batch`` whose key is absent from
    ``history`` — provably the same set as the plain left-anti join,
    because the filter has no false negatives (a key present in
    history always probes as a member, so nothing real can leak
    through the definitely-new shortcut; false positives merely take
    the slow path and are then rejected exactly).

    Scale shape: the full batch pays one narrow probe (k hashed
    positions + a bitmap hash-join on ``word``); only the maybe-seen
    slice — true dups plus the filter's FPR — shuffles against the
    full history keys. At a 1% dup rate and 3% FPR, ~96% of a 100 TB
    batch never enters the expensive keyed shuffle, which is the
    entire cost of ``write.incremental_insert`` at that scale.

    Precondition: ``id_col`` must be UNIQUE within ``batch`` for the
    fast path — ``bloom_probe`` reduces per id, so duplicate ids
    would conflate their verdicts. Rows with a NULL ``id_col`` cannot
    ride the verdict join at all; they bypass the filter and pay the
    exact anti-join directly, so the equivalence claim holds for any
    input.
    """
    null_ids = batch.where(F.col(id_col).isNull())
    batch = batch.where(F.col(id_col).isNotNull())
    bloom = bloom_build(history.select(key_col), key_col, m_bits=m_bits, k=k)
    verdicts = bloom_probe(
        batch, bloom, key_col=key_col, id_col=id_col, m_bits=m_bits, k=k
    )
    flagged = batch.join(verdicts, on=id_col)
    definite_new = flagged.where(~F.col("bloom_member")).drop("bloom_member")
    maybe_seen = flagged.where(F.col("bloom_member")).drop("bloom_member")
    survivors = maybe_seen.unionByName(null_ids).join(
        history.select(key_col).distinct(), on=key_col, how="left_anti"
    )
    return definite_new.unionByName(survivors.select(*definite_new.columns))
