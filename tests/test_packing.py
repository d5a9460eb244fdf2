"""Packing operators vs naive single-node references.

``token_spans``'s two-level prefix sum and ``pack_next_fit``'s
per-group Arrow scan must both reproduce what a trivial sequential
loop computes — including empty docs, oversized docs, and sparse /
non-dense id spaces (the bucketing must not assume dense ids).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from nhl_data_warehouse_spark.operators.packing import pack_next_fit, token_spans

weights = st.integers(min_value=0, max_value=40)
ids = st.integers(min_value=0, max_value=5000)


def _naive_spans(rows, block_size):
    # rows: [(doc_id, w)] — concat in doc_id order, chunk into blocks
    out, off = {}, 0
    for doc_id, w in sorted(rows):
        first = off // block_size
        last = (off + max(w, 1) - 1) // block_size
        out[doc_id] = (w, off, first, last, last - first + 1)
        off += w
    return out


@settings(max_examples=8, deadline=None)
@given(
    rows=st.dictionaries(ids, weights, min_size=1, max_size=12).map(
        lambda d: list(d.items())
    ),
    block=st.sampled_from([4, 16, 64]),
    bucket=st.sampled_from([1, 7, 1024]),
)
def test_token_spans_matches_naive(spark, rows, block, bucket):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.first_block, r.last_block, r.n_blocks)
        for r in token_spans(df, block_size=block, bucket_width=bucket).collect()
    }
    assert got == _naive_spans(rows, block)


def _naive_next_fit(items, budget):
    # items: [(id, w)] in order; returns {id: bin}
    out, cur, fill = {}, 0, 0
    for i, (item, w) in enumerate(sorted(items)):
        if i == 0:
            fill = w
        elif fill + w <= budget:
            fill += w
        else:
            cur, fill = cur + 1, w
        out[item] = cur
    return out


@settings(max_examples=6, deadline=None)
@given(
    rows=st.dictionaries(ids, weights, min_size=1, max_size=12).map(
        lambda d: list(d.items())
    ),
    block=st.sampled_from([4, 16, 64]),
    bucket=st.sampled_from([1, 7, 1024]),
)
def test_block_segments_tile_exactly(spark, rows, block, bucket):
    from nhl_data_warehouse_spark.operators.packing import block_segments

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    segs = block_segments(
        df, block_size=block, bucket_width=bucket
    ).collect()
    total = sum(w for _, w in rows)
    # every block except the last holds exactly `block` tokens; the
    # last holds the remainder; per-doc segment sums rebuild the doc
    by_block, by_doc = {}, {}
    for r in segs:
        assert r.n_seg_tokens > 0 and r.seg_start >= 0
        by_block[r.block_id] = by_block.get(r.block_id, 0) + r.n_seg_tokens
        by_doc[r.doc_id] = by_doc.get(r.doc_id, 0) + r.n_seg_tokens
    assert sum(by_block.values()) == total
    if total:
        last = max(by_block)
        for b, n in by_block.items():
            assert n == (block if b != last else total - block * last)
    weights_by_id = dict(rows)
    for d, n in by_doc.items():
        assert n == weights_by_id[d]
    # zero-weight docs contribute nothing
    assert all(weights_by_id[d] > 0 for d in by_doc)


@settings(max_examples=8, deadline=None)
@given(
    groups=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.dictionaries(ids, st.integers(0, 30), min_size=1, max_size=10).map(
            lambda d: list(d.items())
        ),
        min_size=1,
        max_size=3,
    ),
    budget=st.sampled_from([1, 10, 50]),
)
def test_pack_next_fit_matches_naive(spark, groups, budget):
    rows = [(g, i, w) for g, items in groups.items() for i, w in items]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = pack_next_fit(df, budget=budget).collect()
    got = {(r.group_key, r.item_id): r.bin for r in out}
    want = {
        (g, i): b
        for g, items in groups.items()
        for i, b in _naive_next_fit(items, budget).items()
    }
    assert got == want


def test_pack_next_fit_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [("s", 1, 5), ("s", 2, 999), ("s", 3, 5)],
        "source string, doc_id long, n_tokens long",
    )
    got = {r.item_id: r.bin for r in pack_next_fit(df, budget=10).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


class TestChunkDocuments:
    def test_overlap_and_tail(self, spark):
        from nhl_data_warehouse_spark.operators.packing import chunk_documents

        text10 = " ".join(f"t{i}" for i in range(10))
        df = spark.createDataFrame(
            [(1, text10), (2, "a b"), (3, ""), (4, "solo")],
            "doc_id long, text string",
        )
        got = {}
        for r in chunk_documents(df, chunk_size=4, overlap=2).collect():
            got.setdefault(r.doc_id, []).append(r)
        # doc 1: stride 2 over 10 tokens -> ceil((10-2)/2)=4 chunks;
        # starts 0,2,4,6; last chunk holds t6..t9 (no lost tail)
        c1 = sorted(got[1], key=lambda r: r.chunk_index)
        assert [r.start_token for r in c1] == [0, 2, 4, 6]
        assert [r.n_chunk_tokens for r in c1] == [4, 4, 4, 4]
        assert c1[0].chunk_text == "t0 t1 t2 t3"
        assert c1[-1].chunk_text == "t6 t7 t8 t9"
        # short doc: single whole-doc chunk; empty doc: no chunks
        assert [(r.start_token, r.n_chunk_tokens, r.chunk_text) for r in got[2]] == [
            (0, 2, "a b")
        ]
        assert 3 not in got
        assert got[4][0].chunk_text == "solo"

    def test_every_token_covered(self, spark):
        from nhl_data_warehouse_spark.operators.packing import chunk_documents

        n = 23
        df = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(n)))], "doc_id long, text string"
        )
        rows = chunk_documents(df, chunk_size=5, overlap=1).collect()
        covered = set()
        for r in rows:
            covered.update(range(r.start_token, r.start_token + r.n_chunk_tokens))
        assert covered == set(range(n))
