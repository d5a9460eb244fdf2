"""Round-9 hardening: ADVICE r8 + VERDICT r8 items.

Covers: kendall_tau_b degenerate-input nc/nd coalesce (cross-engine
NULL-vs-0 divergence), the release_cached reclamation contract
(persisted intermediates must not outlive a query in a long-lived
session), gini_coefficient's value-domain guard, and
interval_overlap_join's auto-derived cell size.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestKendallDegenerate:
    def test_single_x_cell_yields_zero_counts_not_null(self, spark):
        """ADVICE r8: when every row lands in one x cell the x2>x1
        pair join is empty; Spark's global SUM gave nc=NULL/nd=NULL
        while the DuckDB oracle COALESCEd to 0. Both engines must now
        agree on nc=0, nd=0, tau_b=NULL."""
        from nhl_data_warehouse_spark.operators.stats import kendall_tau_b

        df = spark.createDataFrame(
            [(5, 0.1), (5, 0.3), (5, 0.7)], "x int, y double"
        )
        row = kendall_tau_b(df, "x", "y", x_scale=1, y_scale=100).first()
        assert row["nc"] == 0
        assert row["nd"] == 0
        assert row["tau_b"] is None  # all x tied -> denominator zero

    def test_single_y_cell_too(self, spark):
        from nhl_data_warehouse_spark.operators.stats import kendall_tau_b

        df = spark.createDataFrame(
            [(1, 0.5), (2, 0.5), (3, 0.5)], "x int, y double"
        )
        row = kendall_tau_b(df, "x", "y", x_scale=1, y_scale=100).first()
        assert row["nc"] == 0 and row["nd"] == 0
        assert row["tau_b"] is None


class TestCacheReclamation:
    def test_release_cached_drains_persisted_blocks(self, spark):
        """ADVICE r8: spearman/kendall/skew/suite queries persist()
        intermediates their lazy plans read twice; the caller contract
        (bench.py / tools/check_oracle.py) is release_cached(spark)
        after each query's final action. Pin that the contract actually
        drains BOTH catalog-cached plans and RDD-level blocks."""
        from nhl_data_warehouse_spark.operators.stats import spearman_rho
        from nhl_data_warehouse_spark.session import release_cached

        release_cached(spark)  # start clean
        df = spark.createDataFrame(
            [(i % 7, float(i % 11)) for i in range(200)], "x int, y double"
        )
        spearman_rho(df, "x", "y", x_scale=1, y_scale=100).collect()
        jsc = spark.sparkContext._jsc
        assert jsc.getPersistentRDDs().size() > 0, (
            "expected the joint histogram to be pinned after the action"
        )
        release_cached(spark)
        assert jsc.getPersistentRDDs().size() == 0


class TestGiniUnboundedDomain:
    def test_high_cardinality_matches_local_reference(self, spark):
        """VERDICT r8 item 4: gini's cumulative rank used an
        unpartitioned Window.orderBy over the value-cell histogram —
        bounded by the grain contract, but an unbounded domain would
        funnel through one task. Now a range-partitioned two-pass
        prefix sum; verify exactness on a 20k-distinct-value domain
        against the O(n log n) local formula."""
        import random

        from nhl_data_warehouse_spark.operators.stats import gini_coefficient

        rng = random.Random(9)
        vals = [round(rng.uniform(0, 10_000), 2) for _ in range(20_000)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        row = gini_coefficient(df, "v", scale=100).first()

        cents = sorted(round(v * 100) for v in vals)
        n = len(cents)
        s1 = sum(c * (2 * i + 2) for i, c in enumerate(cents))  # unique ranks
        # tie-midrank form: group equal cells
        from collections import Counter

        hist = sorted(Counter(cents).items())
        cum = 0
        s1 = 0
        for c, nv in hist:
            s1 += c * nv * (2 * cum + nv + 1)
            cum += nv
        expected = s1 / (n * sum(cents)) - (n + 1) / n
        assert row["n"] == n
        assert abs(row["gini"] - expected) < 1e-12

    def test_prefix_sum_matches_global_window(self, spark):
        """prefix_sum_cells == the exclusive global-window cumsum on
        an arbitrary histogram (values partitioning-independent)."""
        from nhl_data_warehouse_spark.operators.stats import prefix_sum_cells

        hist = spark.createDataFrame(
            [(c, (c * 7) % 13 + 1) for c in range(997)], "c long, nv long"
        )
        got = {
            r["c"]: r["cum"] for r in prefix_sum_cells(hist, "c", "nv").collect()
        }
        cum = 0
        for c in range(997):
            assert got[c] == cum
            cum += (c * 7) % 13 + 1

    def test_prefix_sum_monotone_on_hash_shuffled_input(self, spark):
        """Regression (caught by theil_sen's median at sf0.001): with
        two consumers of the range-partitioned frame, each execution
        re-ran repartitionByRange whose boundary sampling could
        differ, mis-aligning offsets with local cumsums. The bucket id
        is now a pure function of the cell VALUE — boundaries are
        exact percentiles of a deterministic 1/64 hash-sample of the
        cells, and the bucketed frame carries a LAZY persist (a pure
        perf hint; the eager pin is opt-in via pin_input) —
        deterministic across any number of re-executions. Pin the observable
        invariant: cum is strictly the exclusive prefix — monotone in
        c with cum[i+1] = cum[i] + nv[i] — on an input that arrives
        hash-shuffled across many partitions."""
        from nhl_data_warehouse_spark.operators.stats import prefix_sum_cells
        from nhl_data_warehouse_spark.session import release_cached

        hist = (
            spark.range(0, 20_000)
            .select((F.col("id") * 2654435761 % 37_000).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("nv"))
            .select(F.col("k").alias("c"), "nv")
        )
        rows = sorted(
            prefix_sum_cells(hist, "c", "nv").collect(), key=lambda r: r["c"]
        )
        cum = 0
        for r in rows:
            assert r["cum"] == cum, f"cum broken at c={r['c']}"
            cum += r["nv"]
        release_cached(spark)

    def test_no_datasized_unpartitioned_window(self, spark):
        """Plan shape: the only unpartitioned window left must be the
        one over per-bucket totals (≤ num_ranges rows); the
        data-sized window is partitioned by the value-derived _pid."""
        from nhl_data_warehouse_spark.operators.stats import gini_coefficient

        df = spark.range(1000).select((F.col("id") % 37).cast("double").alias("v"))
        plan = gini_coefficient(df, "v")._jdf.queryExecution().executedPlan().toString()
        # the local-cumsum window is keyed by the range-partition id
        assert "_pid" in plan


class TestAudioOddByteTruncation:
    def test_mid_sample_truncation_yields_stats_not_batch_failure(self, spark):
        """ADVICE r8: a WAV whose data chunk is cut MID-SAMPLE (odd
        byte length) made np.frombuffer raise and fail the whole Arrow
        batch. The trailing half-sample is now dropped; the item still
        yields stats over the complete samples, and the rest of the
        batch survives."""
        from nhl_data_warehouse_spark.operators.multimodal import (
            audio_pcm_stats,
            wav_payload,
        )

        good = wav_payload(100, sample_rate=8000, seed=3)
        # cut one byte off the end: data-chunk length header still
        # claims the full size, body delivers an odd count
        odd = good[:-1]
        media = spark.createDataFrame(
            [(1, good), (2, odd), (3, b"notawav")],
            "media_id long, payload binary",
        )
        rows = {r["media_id"]: r for r in audio_pcm_stats(media).collect()}
        assert rows[1]["n_samples"] == 100
        assert rows[2]["n_samples"] == 99  # half-sample dropped
        assert rows[2]["sample_rate"] == 8000
        assert rows[3]["n_samples"] is None  # non-WAV stays NULL


class TestIntervalCellAutoDerive:
    def _mk(self, spark, rows):
        df = spark.createDataFrame(rows, "id long, s long, e long")
        return df.select(
            "id",
            F.timestamp_micros(F.col("s") * 1_000_000).alias("st"),
            F.timestamp_micros(F.col("e") * 1_000_000).alias("en"),
        )

    def test_mixed_lengths_bounded_fanout_and_exact_pairs(self, spark):
        """VERDICT r8 item 6: a caller with 1-week intervals over the
        default 60-minute cells silently explodes each row into ~168
        cells. cell_minutes=None now derives the width from the p90 of
        observed lengths, so the week-long rows replicate into at most
        2 cells — and the pair set stays exactly the brute-force
        answer."""
        from nhl_data_warehouse_spark.operators.rangejoin import (
            derive_cell_minutes,
            interval_overlap_join,
        )

        week = 7 * 24 * 3600
        rows = []
        # 10 one-minute intervals scattered over a day
        for i in range(10):
            rows.append((i, i * 3600, i * 3600 + 60))
        # 10 one-week intervals, staggered
        for i in range(10):
            rows.append((100 + i, i * 12 * 3600, i * 12 * 3600 + week))
        df = self._mk(spark, rows)
        cell = derive_cell_minutes(df, df, "st", "en")
        # p90 of lengths is the week — so week-long intervals span
        # at most 2 cells (fan-out bounded by construction)
        assert cell * 60 >= week * 0.9
        got = {
            (min(r["a_id"], r["b_id"]), max(r["a_id"], r["b_id"]))
            for r in interval_overlap_join(
                df, df, "st", "en", cell_minutes=None
            ).collect()
            if r["a_id"] != r["b_id"]
        }
        # brute-force reference
        exp = set()
        for i, (ia, sa, ea) in enumerate(rows):
            for ib, sb, eb in rows[i + 1 :]:
                if sa <= eb and sb <= ea:
                    exp.add((min(ia, ib), max(ia, ib)))
        assert got == exp

    def test_degenerate_zero_length_intervals(self, spark):
        from nhl_data_warehouse_spark.operators.rangejoin import (
            derive_cell_minutes,
        )

        df = self._mk(spark, [(1, 100, 100), (2, 200, 200)])
        assert derive_cell_minutes(df, df, "st", "en") == 1  # floor 1 min


class TestExpectedCalibrationError:
    def test_hand_computed(self, spark):
        """Two bins, hand-checkable: bin 2 holds p=0.25 (y=1) and
        p=0.21 (y=0); bin 9 holds p=0.95 (y=1) twice."""
        from nhl_data_warehouse_spark.operators.stats import (
            expected_calibration_error,
        )

        df = spark.createDataFrame(
            [(0.25, True), (0.21, False), (0.95, True), (0.95, True)],
            "p double, y boolean",
        )
        row = expected_calibration_error(df, "p", "y", n_bins=10).first()
        # bin 2: acc 1/2, conf (0.25+0.21)/2=0.23, dev 0.27, w 0.5
        # bin 9: acc 1.0, conf 0.95, dev 0.05, w 0.5
        assert row["n_docs"] == 4
        assert abs(row["ece"] - (0.5 * 0.27 + 0.5 * 0.05)) < 1e-9
        assert abs(row["mce"] - 0.27) < 1e-9
        # brier = mean((p-y)^2)
        exp_brier = (0.75**2 + 0.21**2 + 0.05**2 + 0.05**2) / 4
        assert abs(row["brier"] - exp_brier) < 1e-9

    def test_perfectly_calibrated_bins(self, spark):
        from nhl_data_warehouse_spark.operators.stats import (
            expected_calibration_error,
        )

        # bin 5: conf = 0.5 exactly, acc = 0.5 -> ece = mce = 0
        df = spark.createDataFrame(
            [(0.5, True), (0.5, False)], "p double, y boolean"
        )
        row = expected_calibration_error(df, "p", "y").first()
        assert abs(row["ece"]) < 1e-12 and abs(row["mce"]) < 1e-12


class TestIsotonicCalibration:
    def test_pav_pools_adjacent_violators(self, spark):
        """Bins with rates [0.8, 0.2, 0.5] (equal weight 10) violate
        monotonicity: PAV pools all three to 0.5 (first two average
        to 0.5, then the pool extends since 0.5 == 0.5; classic PAV
        gives [0.5, 0.5, 0.5])."""
        from nhl_data_warehouse_spark.operators.stats import (
            isotonic_calibration_bins,
        )

        rows = []
        for b, rate in ((0, 0.8), (1, 0.2), (2, 0.5)):
            p = b / 10 + 0.05
            for i in range(10):
                rows.append((p, i < rate * 10))
        df = spark.createDataFrame(rows, "p double, y boolean")
        got = {
            r["bin"]: r
            for r in isotonic_calibration_bins(df, "p", "y").collect()
        }
        assert [got[b]["raw_rate"] for b in (0, 1, 2)] == [0.8, 0.2, 0.5]
        assert [got[b]["iso_rate"] for b in (0, 1, 2)] == [0.5, 0.5, 0.5]

    def test_already_monotone_is_identity_and_output_monotone(self, spark):
        from nhl_data_warehouse_spark.operators.stats import (
            isotonic_calibration_bins,
        )

        rows = []
        for b, rate in ((1, 0.1), (4, 0.4), (8, 0.9)):
            p = b / 10 + 0.05
            for i in range(10):
                rows.append((p, i < rate * 10))
        df = spark.createDataFrame(rows, "p double, y boolean")
        got = sorted(
            isotonic_calibration_bins(df, "p", "y").collect(),
            key=lambda r: r["bin"],
        )
        for r in got:
            assert abs(r["iso_rate"] - r["raw_rate"]) < 1e-12
        isos = [r["iso_rate"] for r in got]
        assert isos == sorted(isos)


class TestCusumPeak:
    def test_planted_level_shift(self, spark):
        """20 days at 100 then 20 days at 200: the CUSUM |peak| sits
        exactly at the changepoint (day 20), signed negative (first
        half below the global mean of 150)."""
        import datetime

        from nhl_data_warehouse_spark.operators.timeseries import cusum_peak

        d0 = datetime.date(2025, 1, 1)
        rows = [
            (d0 + datetime.timedelta(days=i), 100 if i < 20 else 200)
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "d date, x long")
        row = cusum_peak(df, "d", "x", cents_scale=1).first()
        assert row["n_days"] == 40
        assert row["peak_day"] == d0 + datetime.timedelta(days=19)
        # C_20 = 20*100 - 20*150 = -1000
        assert abs(row["peak_cusum"] - (-1000.0)) < 1e-9
        assert abs(row["mean_daily"] - 150.0) < 1e-12

    def test_grouped_matches_global_per_slice(self, spark):
        """grouped_cusum_peak == cusum_peak applied per slice, and its
        plan has no unpartitioned window."""
        import datetime

        from nhl_data_warehouse_spark.operators.timeseries import (
            cusum_peak,
            grouped_cusum_peak,
        )

        d0 = datetime.date(2025, 1, 1)
        rows = []
        for g, shift_day, lo, hi in (("a", 10, 50, 90), ("b", 25, 200, 120)):
            for i in range(40):
                rows.append(
                    (g, d0 + datetime.timedelta(days=i), lo if i < shift_day else hi)
                )
        df = spark.createDataFrame(rows, "g string, d date, x long")
        got = {
            r["g"]: r
            for r in grouped_cusum_peak(df, "g", "d", "x", cents_scale=1).collect()
        }
        for g in ("a", "b"):
            ref = cusum_peak(
                df.where(F.col("g") == g), "d", "x", cents_scale=1
            ).first()
            assert got[g]["peak_day"] == ref["peak_day"]
            assert got[g]["peak_cusum"] == ref["peak_cusum"]
            assert got[g]["mean_daily"] == ref["mean_daily"]
        plan = (
            grouped_cusum_peak(df, "g", "d", "x")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # every window partitions by the slice: no unpartitioned spec
        assert "windowspecdefinition(d#" not in plan

    def test_flat_series_peak_zero_earliest_day(self, spark):
        import datetime

        from nhl_data_warehouse_spark.operators.timeseries import cusum_peak

        d0 = datetime.date(2025, 1, 1)
        rows = [(d0 + datetime.timedelta(days=i), 7) for i in range(5)]
        df = spark.createDataFrame(rows, "d date, x long")
        row = cusum_peak(df, "d", "x", cents_scale=1).first()
        assert row["peak_cusum"] == 0.0
        assert row["peak_day"] == d0  # all-tied -> earliest day


class TestNoveltyCurve:
    def test_vocab_growth_and_redundant_batch(self, spark):
        """Batch 0 introduces grams; batch 1 = exact copies (novelty
        0); batch 2 = fresh text (novelty 1). Batches via id-range
        split with max_id=29, B=3 -> ids 0-9, 10-19, 20-29."""
        from nhl_data_warehouse_spark.operators.text import novelty_curve

        t_a = "a b c d e f g h"
        t_b = "p q r s t u v w"
        rows = (
            [(i, t_a) for i in range(10)]
            + [(10 + i, t_a) for i in range(10)]  # pure repeats
            + [(20 + i, t_b) for i in range(10)]  # all new
        )
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["batch"]: r
            for r in novelty_curve(df, n=5, n_batches=3).collect()
        }
        assert [got[b]["n_docs"] for b in (0, 1, 2)] == [10, 10, 10]
        # t_a has 8 tokens -> 4 distinct 5-grams; same for t_b
        assert got[0]["new_grams"] == 4 and got[0]["novelty_rate"] == 1.0
        assert got[1]["new_grams"] == 0 and got[1]["novelty_rate"] == 0.0
        assert got[2]["new_grams"] == 4 and got[2]["novelty_rate"] == 1.0
        assert [got[b]["cum_vocab"] for b in (0, 1, 2)] == [4, 4, 8]


class TestTheilSen:
    def test_exact_line_with_one_outlier(self, spark):
        """y = 5x + 100 over 31 days with one wrecked day: the
        pairwise-slope median stays 5 (OLS would move), intercept
        median stays 100."""
        import datetime

        from nhl_data_warehouse_spark.operators.timeseries import (
            theil_sen_trend,
        )

        d0 = datetime.date(2025, 3, 1)
        rows = [
            (d0 + datetime.timedelta(days=i), 100 + 5 * i) for i in range(31)
        ]
        rows[15] = (rows[15][0], 10_000_000)  # corrupted day
        base = int(rows[0][0].toordinal() - datetime.date(1970, 1, 1).toordinal())
        # shift values so intercept at epoch-day 0 is well-defined:
        # x = 100 + 5*(de - base) = (100 - 5*base) + 5*de
        df = spark.createDataFrame(rows, "d date, x long")
        row = theil_sen_trend(df, "d", "x").first()
        assert row["n_days"] == 31
        assert row["n_pairs"] == 31 * 30 // 2
        assert abs(row["slope_per_day"] - 5.0) < 1e-6
        assert abs(row["intercept"] - (100 - 5 * base)) < 1e-6


class TestHHI:
    def test_hand_computed_shares(self, spark):
        """One nation, two suppliers with 75/25 split: HHI =
        0.75^2 + 0.25^2 = 0.625; normalized = (0.625 - 0.5) / 0.5."""
        from nhl_data_warehouse_spark.suite.surface import (
            hhi_supplier_concentration,
        )
        import math

        # exercise the algebra through the operator-level expressions
        # on a crafted frame rather than the full query: 2 suppliers,
        # cents 7500 / 2500
        df = spark.createDataFrame(
            [("A", 1, 7500), ("A", 2, 2500)],
            "nation string, supp long, cents long",
        )
        agg = df.groupBy("nation").agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("cents").cast("long").alias("t"),
            F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
            .cast("decimal(38,0)")
            .alias("ssq"),
        )
        row = agg.select(
            F.expr(
                "CAST(ssq AS DOUBLE) / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE))"
            ).alias("hhi")
        ).first()
        assert math.isclose(row["hhi"], 0.625, rel_tol=0, abs_tol=1e-12)


class TestSourceMixEntropy:
    def test_uniform_and_skewed_mix(self, spark, tmp_path):
        """Uniform 2-source mix -> entropy ln(2), perplexity 2;
        single-source language -> entropy 0 (with the -0.0 guard),
        perplexity 1."""
        import math

        from nhl_data_warehouse_spark.suite.training import (
            source_mix_entropy_by_lang,
        )

        rows = (
            [(i, "t", "en", "web") for i in range(10)]
            + [(100 + i, "t", "en", "books") for i in range(10)]
            + [(200 + i, "t", "de", "web") for i in range(7)]
        )
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        sf = str(tmp_path / "sf")
        import os

        os.makedirs(sf, exist_ok=True)
        df.select("doc_id", "text", "lang", "source",
                  F.length("text").alias("n_chars")).write.parquet(
            os.path.join(sf, "documents.parquet")
        )
        got = {
            r["lang"]: r for r in source_mix_entropy_by_lang(spark, sf).collect()
        }
        en = got["en"]
        assert en["n_sources"] == 2 and en["n_docs"] == 20
        # terms use 6dp-rounded ln(0.5)
        exp_ent = -2 * (0.5 * round(math.log(0.5), 6))
        assert abs(en["source_entropy"] - exp_ent) < 1e-12
        assert abs(en["perplexity"] - round(math.exp(exp_ent), 6)) < 1e-12
        de = got["de"]
        assert de["source_entropy"] == 0.0  # not -0.0
        assert str(de["source_entropy"])[0] != "-"
        assert de["perplexity"] == 1.0


class TestSpanContamination:
    def test_planted_shared_span_union_coverage(self, spark):
        """Benchmark doc 0 and eval doc 1 share a 60-token verbatim
        run inside doc 1's 100 tokens: matched 50-grams are the 11
        windows of the run, their span union covers exactly the 60
        shared positions. Eval doc 3 shares nothing; doc 5 is shorter
        than 50 tokens and must not appear."""
        from nhl_data_warehouse_spark.operators.text import span_contamination

        shared = " ".join(f"s{i}" for i in range(60))
        bench_doc = "x0 x1 " + shared + " " + " ".join(
            f"b{i}" for i in range(20)
        )
        eval_doc = (
            " ".join(f"p{i}" for i in range(20))
            + " " + shared + " "
            + " ".join(f"q{i}" for i in range(20))
        )
        clean_doc = " ".join(f"c{i}" for i in range(80))
        short_doc = "too short"
        df = spark.createDataFrame(
            [(0, bench_doc), (1, eval_doc), (3, clean_doc), (5, short_doc)],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in span_contamination(df, n=50, benchmark_mod=2).collect()
        }
        assert set(rows) == {1, 3}
        r1 = rows[1]
        assert r1["n_tokens"] == 100
        assert r1["n_grams"] == 51
        assert r1["n_matched"] == 11  # 60-token run -> 11 50-gram windows
        assert r1["covered_tokens"] == 60  # union, not 11*50
        assert abs(r1["covered_frac"] - 0.6) < 1e-12
        assert r1["is_contaminated"] == 1
        assert rows[3]["n_matched"] == 0
        assert rows[3]["covered_tokens"] == 0
        assert rows[3]["is_contaminated"] == 0
