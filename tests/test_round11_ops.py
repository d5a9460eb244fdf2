"""Round-11 operator tests: Bloom-accelerated exact 13-gram substring
dedup (``text.bloom_span_dedup``, VERDICT r10 item 5).

The load-bearing claim is EXACTNESS THROUGH THE BLOOM: the filter has
no false negatives, so the matched-span set — and every output number —
must be identical to what a plain exact gram join produces. Pinned
against an independent pure-Python reference (not against another
Spark plan) on inputs with planted verbatim overlaps, near-miss
one-token edits, and short-doc edges.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)


def _ref_span_dedup(docs, n=13, history_mod=2, flag_pct=20):
    """Naive single-node reference: exact n-gram matching of odd-id
    docs against the distinct gram set of even-id docs."""
    toks = {
        did: [t for t in text.split(" ") if t != ""] for did, text in docs
    }

    def grams(did):
        a = toks[did]
        return [
            (i + 1, " ".join(a[i : i + n])) for i in range(len(a) - n + 1)
        ]

    hist = {
        g
        for did, _ in docs
        if did % history_mod == 0 and len(toks[did]) >= n
        for _, g in grams(did)
    }
    out = {}
    for did, _ in docs:
        if did % history_mod == 0 or len(toks[did]) < n:
            continue
        gs = grams(did)
        matched = [(i, g) for i, g in gs if g in hist]
        covered = set()
        for i, _ in matched:
            covered.update(range(i, i + n))
        nt = len(toks[did])
        cov = len(covered)
        out[did] = (
            nt,
            len(gs),
            len(matched),
            cov,
            cov / nt,
            int(cov * 100 >= nt * flag_pct),
        )
    return out


@pytest.fixture(scope="module")
def planted_docs():
    """History/batch docs with controlled overlap structure."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    assert len(shared.split()) == 13
    long_shared = " ".join(f"w{i}" for i in range(30))
    docs = [
        # history (even ids)
        (0, f"{shared} filler one two three"),
        (2, f"prefix tokens here {long_shared} suffix tokens"),
        (4, "completely unrelated history content " * 4),
        # batch (odd ids)
        (1, f"lead-in {shared} trail-out pad pad pad"),  # one planted 13-gram
        (3, f"{long_shared} and then novel stuff after it ok fine"),  # long overlap
        (5, "entirely novel batch text with no history overlap at all "
            "padded to pass thirteen tokens easily right here now"),
        # near miss: one token edited inside the shared window
        (7, shared.replace("eta", "EDITED") + " tail pad pad pad"),
        (9, "too short to gram"),  # < 13 tokens: excluded
        (11, shared),  # exactly 13 tokens, fully covered -> flagged
    ]
    return docs


class TestBloomSpanDedup:
    def test_matches_pure_python_reference(self, spark, planted_docs):
        from nhl_data_warehouse_spark.operators.text import bloom_span_dedup

        df = spark.createDataFrame(planted_docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["n_grams"],
                r["n_dup_grams"],
                r["covered_tokens"],
                r["dup_frac"],
                r["is_flagged"],
            )
            for r in bloom_span_dedup(df).collect()
        }
        want = _ref_span_dedup(planted_docs)
        assert got == want

    def test_full_overlap_flags_and_short_doc_excluded(
        self, spark, planted_docs
    ):
        from nhl_data_warehouse_spark.operators.text import bloom_span_dedup

        df = spark.createDataFrame(planted_docs, "doc_id long, text string")
        got = {r["doc_id"]: r for r in bloom_span_dedup(df).collect()}
        assert 9 not in got  # < 13 tokens
        assert got[11]["is_flagged"] == 1 and got[11]["covered_tokens"] == 13
        assert got[5]["n_dup_grams"] == 0 and got[5]["is_flagged"] == 0
        # the near-miss edit kills every window crossing the edited
        # token but windows before/after may still match — reference
        # equality (above) is the real pin; here pin just the flag
        assert got[1]["n_dup_grams"] == 1  # exactly the planted window

    def test_tiny_bloom_still_exact(self, spark, planted_docs):
        """Adversarially small filter (m_bits=64): FPR near saturated, so
        nearly every gram takes the verify path — results must be
        UNCHANGED, only the short-circuit rate degrades."""
        from nhl_data_warehouse_spark.operators.text import bloom_span_dedup

        df = spark.createDataFrame(planted_docs, "doc_id long, text string")
        a = sorted(
            map(tuple, bloom_span_dedup(df, m_bits=64, k=1).collect())
        )
        b = sorted(map(tuple, bloom_span_dedup(df).collect()))
        assert a == b

    def test_definitely_new_grams_skip_exact_verify(self, spark):
        """The scale claim: with ZERO overlap, the verify join input
        is empty — count the rows reaching the exact join via an
        accumulator-free probe: matched must be 0 while the bloom
        probe still ran (n_grams > 0)."""
        from nhl_data_warehouse_spark.operators.text import bloom_span_dedup

        docs = [
            (0, " ".join(f"h{i}" for i in range(20))),
            (1, " ".join(f"b{i}" for i in range(20))),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = bloom_span_dedup(df).collect()
        assert len(rows) == 1
        assert rows[0]["n_grams"] == 8
        assert rows[0]["n_dup_grams"] == 0
