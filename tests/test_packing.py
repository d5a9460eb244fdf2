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
