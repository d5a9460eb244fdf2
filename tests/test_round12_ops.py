"""Round-12 operator additions:

- ``paragraph_dedup_stats`` — the CCNet paragraph-hash step (VERDICT
  r11 item 4): property-tested against a pure-Python reference, plan
  pinned so paragraph text never rides a shuffle (occurrences collapse
  map-side to (id, md5, length) before the frequency join).
"""

import hashlib
from collections import Counter

from pyspark.sql import functions as F  # noqa: F401

from tests.conftest import *  # noqa: F401,F403  (spark fixture)


def _para_ref(docs, delim, min_chars=1):
    """Naive single-node reference: per-doc paragraph scorecard under
    corpus-frequency-over-all-occurrences semantics."""
    import re

    occ = []  # (doc_id, trimmed paragraph)
    for did, text in docs:
        for p in re.split(delim, text):
            p = p.strip()
            if len(p) >= min_chars:
                occ.append((did, p))
    freq = Counter(p for _, p in occ)
    out = {}
    for did, p in occ:
        r = out.setdefault(did, [0, 0, 0, 0])
        r[0] += 1
        r[2] += len(p)
        if freq[p] > 1:
            r[1] += 1
            r[3] += len(p)
    return {
        d: {
            "n_paras": r[0],
            "n_dup_paras": r[1],
            "chars_total": r[2],
            "chars_dup": r[3],
        }
        for d, r in out.items()
    }


class TestParagraphDedupStats:
    DOCS = [
        ("a", "intro text\n\nshared cookie banner\n\nunique body a"),
        ("b", "shared cookie banner\n\nunique body b\n\n\n\nx"),
        # same-doc repeat counts as duplicated (CCNet multiset rule)
        ("c", "repeat me\n\nrepeat me\n\nonly here"),
        ("d", "   \n\nshared cookie banner"),  # whitespace-only segment drops
        ("e", "no boundaries at all in this one"),
    ]

    def test_matches_naive_reference(self, spark):
        from nhl_data_warehouse_spark.operators.dedup import (
            paragraph_dedup_stats,
        )

        df = spark.createDataFrame(self.DOCS, "doc_id string, text string")
        got = {
            r["doc_id"]: {
                k: r[k]
                for k in ("n_paras", "n_dup_paras", "chars_total", "chars_dup")
            }
            for r in paragraph_dedup_stats(df).collect()
        }
        assert got == _para_ref(self.DOCS, "\n\n")
        # spot semantics: the same-doc repeat is flagged
        assert got["c"]["n_dup_paras"] == 2
        # doc with no qualifying paragraphs after trim-drop still has
        # its non-empty one
        assert got["d"]["n_paras"] == 1 and got["d"]["n_dup_paras"] == 1

    def test_min_chars_and_custom_delim(self, spark):
        from nhl_data_warehouse_spark.operators.dedup import (
            paragraph_dedup_stats,
        )

        docs = [("x", "aa SEP b SEP cc"), ("y", "aa SEP dd")]
        df = spark.createDataFrame(docs, "doc_id string, text string")
        got = {
            r["doc_id"]: r["n_paras"]
            for r in paragraph_dedup_stats(
                df, delim=" SEP ", min_chars=2
            ).collect()
        }
        # 'b' is below min_chars
        assert got == {"x": 2, "y": 2}
        dup = {
            r["doc_id"]: r["n_dup_paras"]
            for r in paragraph_dedup_stats(
                df, delim=" SEP ", min_chars=2
            ).collect()
        }
        assert dup == {"x": 1, "y": 1}  # 'aa' shared

    def test_property_random_corpora(self, spark):
        """Randomized corpora (seeded): Spark output == naive
        reference for every doc, across paragraph shapes with empty
        segments, repeats, and whitespace."""
        import random

        rng = random.Random(12)
        vocab = ["alpha", "beta", "gamma", "delta", " "]
        docs = []
        paras_pool = [
            " ".join(rng.choices(vocab, k=rng.randint(1, 6)))
            for _ in range(12)
        ]
        for i in range(40):
            n = rng.randint(1, 7)
            docs.append(
                (f"d{i}", "\n\n".join(rng.choice(paras_pool) for _ in range(n)))
            )
        from nhl_data_warehouse_spark.operators.dedup import (
            paragraph_dedup_stats,
        )

        df = spark.createDataFrame(docs, "doc_id string, text string")
        got = {
            r["doc_id"]: {
                k: r[k]
                for k in ("n_paras", "n_dup_paras", "chars_total", "chars_dup")
            }
            for r in paragraph_dedup_stats(df).collect()
        }
        assert got == _para_ref(docs, "\n\n")

    def test_no_exchange_carries_paragraph_text(self, spark):
        """Scale pin (the cdc_chunks contract): every Exchange input
        must be hash/length grain — no raw paragraph column ``_p`` may
        cross a shuffle; text collapses to md5 map-side."""
        from nhl_data_warehouse_spark.operators.dedup import (
            paragraph_dedup_stats,
        )

        df = spark.createDataFrame(self.DOCS, "doc_id string, text string")
        plan = (
            paragraph_dedup_stats(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        lines = plan.splitlines()
        for k, ln in enumerate(lines):
            if "Exchange" not in ln:
                continue
            # partitioning keys must never include the raw paragraph
            assert "_p#" not in ln, "shuffled BY paragraph text:\n" + ln
            child = lines[k + 1] if k + 1 < len(lines) else ""
            # the shuffle input must already be collapsed: its child
            # may CONSUME _p inside a map-side md5/length projection,
            # but may not BE the Generate that emits raw paragraphs,
            # nor re-alias anything to _p
            assert "Generate" not in child and "AS _p#" not in child, (
                "paragraph text crossed a shuffle:\n" + child
            )

    def test_md5_is_real_md5(self, spark):
        """The hash grain must be actual md5 of the trimmed paragraph
        (so the stats join cross-checks with external CCNet-style
        tooling), not some engine-local hash."""
        from nhl_data_warehouse_spark.operators.dedup import (
            paragraph_dedup_stats,
        )

        # one doc, one paragraph: chars_total must equal the trimmed
        # length that md5 was computed over
        df = spark.createDataFrame(
            [("z", "  hello world  ")], "doc_id string, text string"
        )
        row = paragraph_dedup_stats(df).collect()[0]
        assert row["chars_total"] == len("hello world")
        assert (
            hashlib.md5(b"hello world").hexdigest()
            == hashlib.md5("hello world".encode()).hexdigest()
        )


class TestClassifierGateReport:
    def test_gate_matches_reference(self, spark):
        """Youden threshold on a hand-built score/label set, then the
        per-group scorecard — checked against hand-computed keeps.
        Scores: positives at .9/.8/.7, negatives at .4/.3; J is
        maximized (tp=3, fp=0) at any cell in (.4, .7]; lowest-
        threshold tie-break picks 0.7."""
        from nhl_data_warehouse_spark.operators.stats import (
            classifier_gate_report,
        )
        from pyspark.sql import functions as F

        rows = [
            ("s1", 0.9, True, 10),
            ("s1", 0.8, True, 20),
            ("s2", 0.7, True, 30),
            ("s2", 0.4, False, 40),
            ("s2", 0.3, False, 50),
        ]
        df = spark.createDataFrame(
            rows, "src string, score double, good boolean, toks int"
        )
        got = {
            r["src"]: r
            for r in classifier_gate_report(
                df, "score", F.col("good"), "src", weight_col="toks"
            ).collect()
        }
        assert got["s1"]["n_kept"] == 2 and got["s1"]["weight_kept"] == 30
        assert got["s2"]["n_kept"] == 1 and got["s2"]["weight_kept"] == 30
        assert got["s2"]["weight_total"] == 120
        assert abs(got["s2"]["kept_frac"] - 1 / 3) < 1e-12

    def test_single_class_fails_open(self, spark):
        """NULL threshold (all labels one class) must keep everything
        — an undefined operating point fails OPEN for a report."""
        from nhl_data_warehouse_spark.operators.stats import (
            classifier_gate_report,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("s", 0.1, True, 5), ("s", 0.9, True, 7)],
            "src string, score double, good boolean, toks int",
        )
        row = classifier_gate_report(
            df, "score", F.col("good"), "src", weight_col="toks"
        ).collect()[0]
        assert row["n_kept"] == row["n_docs"] == 2
        assert row["weight_kept"] == row["weight_total"] == 12
        assert row["kept_frac"] == 1.0

    def test_threshold_is_broadcast_not_shuffled(self, spark):
        """Scale pin: the gate compare joins the one-row threshold via
        a broadcast (BroadcastNestedLoopJoin/BroadcastExchange), and
        no hash-partition Exchange sits between that join and the
        partial group aggregate — the gate adds no corpus shuffle."""
        from nhl_data_warehouse_spark.operators.stats import (
            classifier_gate_report,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("s1", 0.9, True, 1), ("s2", 0.2, False, 1)] * 10,
            "src string, score double, good boolean, toks int",
        )
        out = classifier_gate_report(
            df, "score", F.col("good"), "src", weight_col="toks"
        )
        out.collect()  # finalize AQE
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        lines = plan.splitlines()
        bcast = max(
            i for i, ln in enumerate(lines) if "Broadcast" in ln
        )
        partial = [
            i
            for i, ln in enumerate(lines)
            if "HashAggregate" in ln and "partial_count" in ln and i < bcast
        ]
        assert partial, "no partial group aggregate above the broadcast join"
        between = lines[max(partial) : bcast]
        assert not any("Exchange hashpartitioning" in ln for ln in between), (
            "gate added a corpus shuffle:\n" + "\n".join(between)
        )


class TestKcorePeel:
    @staticmethod
    def _ref(edges, k, rounds):
        """Naive single-node synchronous peel."""
        from collections import Counter

        e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        for _ in range(rounds):
            deg = Counter()
            for i, j in e:
                deg[i] += 1
                deg[j] += 1
            keep = {n for n, d in deg.items() if d >= k}
            e = {(i, j) for i, j in e if i in keep and j in keep}
        deg = Counter()
        for i, j in e:
            deg[i] += 1
            deg[j] += 1
        return dict(deg)

    EDGES = [
        # a 4-clique (survives k=3) with a pendant path hanging off
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"),  # peels off at k>=2 round by round
        ("x", "y"),  # isolated edge, gone at k=2 immediately
    ]

    def test_matches_naive_reference(self, spark):
        from nhl_data_warehouse_spark.operators.graph import kcore_peel

        df = spark.createDataFrame(self.EDGES, "a string, b string")
        for k in (2, 3):
            got = {
                r["node"]: r["core_degree"]
                for r in kcore_peel(df, k=k, rounds=4).collect()
            }
            assert got == self._ref(self.EDGES, k, 4), f"k={k}"
        # semantics spot-checks: the 3-core is exactly the clique
        got3 = {
            r["node"]
            for r in kcore_peel(df, k=3, rounds=4).collect()
        }
        assert got3 == {"a", "b", "c", "d"}

    def test_pendant_chain_needs_multiple_rounds(self, spark):
        """f peels in round 1 (deg 1), THEN e peels in round 2 — the
        synchronous multi-round semantics, not a one-shot filter."""
        from nhl_data_warehouse_spark.operators.graph import kcore_peel

        df = spark.createDataFrame(self.EDGES, "a string, b string")
        one_round = {
            r["node"] for r in kcore_peel(df, k=2, rounds=1).collect()
        }
        four_rounds = {
            r["node"] for r in kcore_peel(df, k=2, rounds=4).collect()
        }
        assert "e" in one_round and "e" not in four_rounds
        assert four_rounds == {"a", "b", "c", "d"}

    def test_randomized_vs_reference(self, spark):
        import random

        rng = random.Random(7)
        edges = [
            (f"n{rng.randint(0, 25)}", f"n{rng.randint(0, 25)}")
            for _ in range(80)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        from nhl_data_warehouse_spark.operators.graph import kcore_peel

        df = spark.createDataFrame(edges, "a string, b string")
        for k in (2, 3, 4):
            got = {
                r["node"]: r["core_degree"]
                for r in kcore_peel(df, k=k, rounds=5).collect()
            }
            assert got == self._ref(edges, k, 5), f"k={k}"


class TestBlockedEditDistance:
    def _ref(self, names, d):
        import itertools

        def lev(a, b):
            if len(a) < len(b):
                a, b = b, a
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        from collections import Counter

        cnt = Counter(names)
        out = set()
        for a, b in itertools.combinations(sorted(cnt), 2):
            e = lev(a, b)
            if e <= d:
                out.add((a, b, e, cnt[a], cnt[b]))
        return out

    NAMES = [
        "red widget", "red widget", "ted widget", "red gadget",
        "blue bolt", "blue bolts", "glue bolt",
        "a", "ab", "abcd",  # short strings across block boundaries
        "completely different string",
    ]

    def test_matches_allpairs_reference(self, spark):
        from nhl_data_warehouse_spark.operators.dedup import (
            length_blocked_edit_pairs,
        )

        df = spark.createDataFrame(
            [(n,) for n in self.NAMES], "name string"
        )
        for d in (1, 2, 3):
            got = {
                (r["name_a"], r["name_b"], r["edit_dist"],
                 r["n_recs_a"], r["n_recs_b"])
                for r in length_blocked_edit_pairs(
                    df, "name", max_dist=d
                ).collect()
            }
            assert got == self._ref(self.NAMES, d), f"d={d}"

    def test_blocking_is_complete_randomized(self, spark):
        """Random strings with lengths straddling block boundaries:
        the length-blocked join must find EXACTLY the all-pairs
        qualifying set (completeness is the whole point of emitting
        probe rows into the ±d window blocks)."""
        import random

        rng = random.Random(3)
        names = [
            "".join(rng.choices("abc", k=rng.randint(1, 12)))
            for _ in range(60)
        ]
        from nhl_data_warehouse_spark.operators.dedup import (
            length_blocked_edit_pairs,
        )

        df = spark.createDataFrame([(n,) for n in names], "name string")
        got = {
            (r["name_a"], r["name_b"], r["edit_dist"])
            for r in length_blocked_edit_pairs(
                df, "name", max_dist=2
            ).collect()
        }
        want = {(a, b, e) for a, b, e, _, _ in self._ref(names, 2)}
        assert got == want

    def test_no_duplicate_pairs(self, spark):
        from nhl_data_warehouse_spark.operators.dedup import (
            length_blocked_edit_pairs,
        )

        df = spark.createDataFrame(
            [(n,) for n in self.NAMES], "name string"
        )
        rows = length_blocked_edit_pairs(df, "name", max_dist=3).collect()
        pairs = [(r["name_a"], r["name_b"]) for r in rows]
        assert len(pairs) == len(set(pairs))


class TestTableChecksum:
    def test_order_and_partitioning_independent(self, spark):
        from nhl_data_warehouse_spark.plans.quality import table_checksum

        rows = [(1, "a"), (2, "b"), (3, None), (4, "d")]
        df1 = spark.createDataFrame(rows, "k int, v string").repartition(7)
        df2 = spark.createDataFrame(
            list(reversed(rows)), "k int, v string"
        ).coalesce(1)
        c1 = table_checksum(df1, ["k", "v"]).collect()[0]
        c2 = table_checksum(df2, ["k", "v"]).collect()[0]
        assert (c1["n_rows"], c1["checksum"]) == (c2["n_rows"], c2["checksum"])

    def test_detects_single_cell_change(self, spark):
        from nhl_data_warehouse_spark.plans.quality import table_checksum

        base = [(i, f"v{i}") for i in range(50)]
        mut = list(base)
        mut[17] = (17, "v17x")
        a = table_checksum(
            spark.createDataFrame(base, "k int, v string"), ["k", "v"]
        ).collect()[0]
        b = table_checksum(
            spark.createDataFrame(mut, "k int, v string"), ["k", "v"]
        ).collect()[0]
        assert a["n_rows"] == b["n_rows"] and a["checksum"] != b["checksum"]

    def test_null_position_not_confusable(self, spark):
        """("a", NULL) vs (NULL, "a") must checksum differently —
        the sentinel defeats concat_ws's null dropping."""
        from nhl_data_warehouse_spark.plans.quality import table_checksum

        a = table_checksum(
            spark.createDataFrame([("a", None)], "x string, y string"),
            ["x", "y"],
        ).collect()[0]["checksum"]
        b = table_checksum(
            spark.createDataFrame([(None, "a")], "x string, y string"),
            ["x", "y"],
        ).collect()[0]["checksum"]
        assert a != b

    def test_matches_python_reference(self, spark):
        import hashlib as hl

        from nhl_data_warehouse_spark.plans.quality import table_checksum

        rows = [(1, "a"), (2, None)]
        df = spark.createDataFrame(rows, "k int, v string")
        got = table_checksum(df, ["k", "v"]).collect()[0]
        total = 0
        for k, v in rows:
            canon = "\x1f".join(
                [str(k), v if v is not None else "\x00"]
            )
            total += int(hl.md5(canon.encode()).hexdigest()[:12], 16)
        assert got["checksum"] == total % 2305843009213693951


def test_edit_distance_plan_no_cartesian_and_name_grain(spark):
    """Scale pins for length_blocked_edit_pairs: the pair join must
    be a block-keyed equi-join (never CartesianProduct), and the
    distinct-name collapse (groupBy name) must sit BELOW the join —
    record multiplicity collapses map-side before any pairing."""
    from nhl_data_warehouse_spark.operators.dedup import (
        length_blocked_edit_pairs,
    )

    df = spark.createDataFrame(
        [(n,) for n in ["aaa", "aab", "bbb", "aaa", "cc"]], "name string"
    )
    out = length_blocked_edit_pairs(df, "name", max_dist=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    lines = plan.splitlines()
    join_at = min(
        i for i, ln in enumerate(lines) if "Join" in ln and "_blk" in ln
    )
    agg_below = [
        i
        for i, ln in enumerate(lines)
        if "HashAggregate" in ln and "_nm" in ln and i > join_at
    ]
    assert agg_below, "name-grain aggregate must feed the join from below"


def test_gate_fails_open_on_empty_score_histogram(spark):
    """All-NULL scores: the Youden sweep emits zero rows; the gate's
    min-aggregate restores the one-row threshold (NULL) and the
    report keeps every row instead of vanishing (code-review r12)."""
    from nhl_data_warehouse_spark.operators.stats import (
        classifier_gate_report,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("s", None, True, 5), ("s", None, False, 7)],
        "src string, score double, good boolean, toks int",
    )
    row = classifier_gate_report(
        df, "score", F.col("good"), "src", weight_col="toks"
    ).collect()[0]
    assert row["n_docs"] == row["n_kept"] == 2
    assert row["weight_kept"] == 12 and row["kept_frac"] == 1.0


def test_gate_null_score_rows_drop_under_real_threshold(spark):
    """With a defined operating point, an unscorable (NULL-score) row
    must NOT pass the score gate."""
    from nhl_data_warehouse_spark.operators.stats import (
        classifier_gate_report,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("s", 0.9, True, 1), ("s", 0.2, False, 1), ("s", None, True, 1)],
        "src string, score double, good boolean, toks int",
    )
    row = classifier_gate_report(
        df, "score", F.col("good"), "src", weight_col="toks"
    ).collect()[0]
    assert row["n_docs"] == 3 and row["n_kept"] == 1
