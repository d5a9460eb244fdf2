"""Round-7 operators: deterministic Bloom membership relation."""

from pyspark.sql import functions as F

from nhl_data_warehouse_spark.operators.membership import bloom_build, bloom_probe


class TestBloomMembership:
    def test_no_false_negatives_ever(self, spark):
        keys = spark.createDataFrame(
            [(f"key-{i}",) for i in range(200)], "k string"
        )
        bloom = bloom_build(keys, "k", m_bits=1024, k=3)
        probe = keys.withColumn("pid", F.monotonically_increasing_id())
        verdicts = bloom_probe(
            probe, bloom, key_col="k", id_col="pid", m_bits=1024, k=3
        )
        rows = verdicts.collect()
        assert len(rows) == 200
        # structural guarantee: every recorded key hits all its bits
        assert all(r.bloom_member for r in rows)

    def test_unseen_keys_mostly_miss_and_fpr_is_sane(self, spark):
        hist = spark.createDataFrame(
            [(f"key-{i}",) for i in range(100)], "k string"
        )
        # m = 4096, n*k = 300 set bits -> per-bit load ~0.07,
        # FPR ~ (0.07)^3 ~ 4e-4: essentially all unseen keys miss
        bloom = bloom_build(hist, "k", m_bits=4096, k=3)
        unseen = spark.createDataFrame(
            [(f"other-{i}",) for i in range(500)], "k string"
        ).withColumn("pid", F.monotonically_increasing_id())
        verdicts = bloom_probe(
            unseen, bloom, key_col="k", id_col="pid", m_bits=4096, k=3
        )
        n_fp = verdicts.where("bloom_member").count()
        assert n_fp <= 5  # e[fp] ~ 0.2; 5 is > 20 sigma

    def test_filter_is_deterministic_relation(self, spark):
        keys = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
        b1 = sorted(map(tuple, bloom_build(keys, "k", 256, 2).collect()))
        b2 = sorted(map(tuple, bloom_build(keys, "k", 256, 2).collect()))
        assert b1 == b2
        # word ids stay inside the bitmap
        assert all(0 <= w < 256 // 64 for w, _ in b1)
