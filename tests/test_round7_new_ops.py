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


class TestRankAuc:
    def test_matches_naive_pairwise(self, spark):
        from nhl_data_warehouse_spark.operators.stats import rank_auc

        rows = [
            (0.9, True), (0.8, True), (0.8, False), (0.7, True),
            (0.5, False), (0.5, False), (0.5, True), (0.2, False),
            (0.1, False), (0.9, False),
        ]
        df = spark.createDataFrame(rows, "s double, y boolean")
        (out,) = rank_auc(df, "s", F.col("y"), scale=100).collect()

        pos = [s for s, y in rows if y]
        neg = [s for s, y in rows if not y]
        wins = sum(
            1.0 if p > n else (0.5 if p == n else 0.0)
            for p in pos
            for n in neg
        )
        assert out.n_pos == len(pos) and out.n_neg == len(neg)
        assert out.auc == wins / (len(pos) * len(neg))

    def test_degenerate_and_perfect(self, spark):
        from nhl_data_warehouse_spark.operators.stats import rank_auc

        perfect = spark.createDataFrame(
            [(0.9, True), (0.8, True), (0.2, False)], "s double, y boolean"
        )
        assert rank_auc(perfect, "s", F.col("y")).first().auc == 1.0
        inverted = spark.createDataFrame(
            [(0.1, True), (0.9, False)], "s double, y boolean"
        )
        assert rank_auc(inverted, "s", F.col("y")).first().auc == 0.0
        all_tied = spark.createDataFrame(
            [(0.5, True), (0.5, False), (0.5, True)], "s double, y boolean"
        )
        assert all_tied and rank_auc(all_tied, "s", F.col("y")).first().auc == 0.5

    def test_single_class_input_is_explicit_null(self, spark):
        """ADVICE r7: with one class the metric is undefined — the
        guard must emit NULL (not inf/NaN, not an ANSI divide error)
        so Spark and the DuckDB oracle agree on degenerate inputs."""
        from nhl_data_warehouse_spark.operators.stats import rank_auc

        all_pos = spark.createDataFrame(
            [(0.9, True), (0.2, True)], "s double, y boolean"
        )
        row = rank_auc(all_pos, "s", F.col("y")).first()
        assert row.n_pos == 2 and row.n_neg == 0 and row.auc is None
        all_neg = spark.createDataFrame(
            [(0.9, False)], "s double, y boolean"
        )
        assert rank_auc(all_neg, "s", F.col("y")).first().auc is None


class TestBloomPrefilteredDedup:
    def test_equals_plain_anti_join_with_planted_dups(self, spark):
        from nhl_data_warehouse_spark.operators.membership import (
            bloom_prefiltered_new_rows,
        )

        history = spark.createDataFrame(
            [(i, f"doc-{i}") for i in range(50)], "hid long, k string"
        ).select("k")
        # batch: 10 true dups + 30 new keys
        batch = spark.createDataFrame(
            [(i, f"doc-{i}") for i in range(10)]
            + [(100 + i, f"new-{i}") for i in range(30)],
            "pid long, k string",
        )
        # tiny filter (128 bits, 50*2 set) to force real false positives
        out = bloom_prefiltered_new_rows(
            batch, history, key_col="k", id_col="pid", m_bits=128, k=2
        )
        expected = batch.join(history, on="k", how="left_anti")
        got = sorted(r.pid for r in out.collect())
        want = sorted(r.pid for r in expected.collect())
        assert got == want and len(want) == 30

    def test_null_ids_take_the_exact_path(self, spark):
        """ADVICE r7: NULL id rows can't ride the verdict join (inner
        join on id drops them) — they must bypass the filter into the
        exact anti-join so equivalence holds for any input."""
        from nhl_data_warehouse_spark.operators.membership import (
            bloom_prefiltered_new_rows,
        )

        history = spark.createDataFrame(
            [(f"doc-{i}",) for i in range(20)], "k string"
        )
        batch = spark.createDataFrame(
            [(1, "doc-3"), (2, "fresh-a"), (None, "doc-7"), (None, "fresh-b")],
            "pid long, k string",
        )
        out = bloom_prefiltered_new_rows(
            batch, history, key_col="k", id_col="pid", m_bits=128, k=2
        )
        got = sorted(
            ((r.pid, r.k) for r in out.collect()),
            key=lambda t: (t[0] is None, t[0] or 0, t[1]),
        )
        assert got == [(2, "fresh-a"), (None, "fresh-b")]
