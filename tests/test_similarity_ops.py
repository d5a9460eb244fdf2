"""Unit tests for the similarity operators on crafted vectors: exact
top-k ordering, LSH bucket agreement, near-dup pair detection, IVF
assignment determinism and probe pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nhl_data_warehouse_spark.operators import similarity

DIM = 8


def _vecs(spark):
    # vec 0 is the query; 1 orthogonal; 2 a near-copy of 0; 3 opposite.
    # With n_centroids=2 the centroids are 0 and 1 (near-copy stays a
    # plain member so cell pruning is observable).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _qv():
    return F.array(*[F.lit(v) for v in [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]])


def test_cosine_topk_order_and_ties(spark):
    out = similarity.cosine_topk(_vecs(spark), _qv(), k=3).collect()
    assert [r.vec_id for r in out] == [0, 2, 1]
    assert out[0].cosine == pytest.approx(1.0)
    assert out[1].cosine > 0.99


def test_near_dup_pairs_find_the_copy(spark):
    pairs = similarity.embedding_near_dup_pairs(
        _vecs(spark), n_planes=4, dim=DIM, threshold=0.9
    ).collect()
    assert [(p.a_id, p.b_id) for p in pairs] == [(0, 2)]
    assert pairs[0].cosine > 0.99


def test_knn_join_ranks_bucket_mates(spark):
    # vecs 0 and 2 are near-copies (same bucket under any plane set);
    # each must list the other as its rank-1 neighbor; ranks start at 1
    # and never exceed k
    out = similarity.knn_join_bucketed(_vecs(spark), n_planes=4, dim=DIM, k=2)
    rows = out.collect()
    by_a = {}
    for r in rows:
        by_a.setdefault(r.a_id, []).append(r)
    for nbrs in by_a.values():
        nbrs.sort(key=lambda r: r.rank)
    assert by_a[0][0].b_id == 2 and by_a[0][0].rank == 1
    assert by_a[2][0].b_id == 0 and by_a[2][0].cosine > 0.99
    assert all(1 <= r.rank <= 2 for r in rows)


def test_group_centroids_exact_means(spark):
    df = spark.createDataFrame(
        [
            ("a", [1.0, 2.0]),
            ("a", [3.0, 6.0]),
            ("b", [10.0, 0.0]),
        ],
        "lang string, embedding array<double>",
    )
    out = {
        (r.lang, r.pos): (r.centroid, r.n_vectors)
        for r in similarity.group_centroids(df, "lang").collect()
    }
    assert out[("a", 0)] == (2.0, 2) and out[("a", 1)] == (4.0, 2)
    assert out[("b", 0)] == (10.0, 1) and out[("b", 1)] == (0.0, 1)


def test_hard_negatives_exclude_positives(spark):
    # vec 2 is a near-copy of 0 (cosine ~1, same bucket): it must NOT
    # appear among 0's hard negatives under threshold 0.9, and every
    # emitted pair sits strictly below the threshold
    out = similarity.hard_negative_pairs(
        _vecs(spark), n_planes=4, dim=DIM, pos_threshold=0.9, k=3
    ).collect()
    assert all(r.cosine < 0.9 for r in out)
    assert not any(r.a_id == 0 and r.b_id == 2 for r in out)


def test_semantic_dedup_drops_near_copy_keeps_lowest_id(spark):
    # vec 2 is a near-copy of vec 0 and shares its cell; SemDeDup must
    # drop the HIGHER id (2) and keep 0; orthogonal/opposite survive
    kept = similarity.semantic_dedup(
        _vecs(spark), n_centroids=2, threshold=0.9
    ).collect()
    kept_ids = sorted(r.vec_id for r in kept)
    assert kept_ids == [0, 1, 3]
    cells = {r.vec_id: r.cell_id for r in kept}
    assert cells[0] == 0 and cells[1] == 1


def test_semantic_dedup_threshold_one_keeps_everything(spark):
    # nothing reaches cosine >= 1.0 except exact clones (there are none
    # after rounding except self-pairs, which the a<b filter excludes)
    kept = similarity.semantic_dedup(_vecs(spark), n_centroids=2, threshold=1.0)
    assert kept.count() == 4


def test_ivf_assignment_deterministic_and_self(spark):
    # centroids = vecs 0,1; every vector lands in exactly one cell;
    # centroid vectors choose themselves (cosine 1, tie -> lower id)
    assigned = similarity.ivf_assign(_vecs(spark), n_centroids=2)
    rows = {r.vec_id: r.cell_id for r in assigned.collect()}
    assert rows[0] == 0 and rows[1] == 1
    assert set(rows) == {0, 1, 2, 3}
    again = {r.vec_id: r.cell_id for r in similarity.ivf_assign(_vecs(spark), n_centroids=2).collect()}
    assert rows == again


def test_ivf_topk_prunes_to_query_cell(spark):
    out = similarity.ivf_topk(_vecs(spark), _qv(), query_id=0, n_centroids=2, k=10)
    got = [r.vec_id for r in out.collect()]
    # cell 0 holds the query and its near-copy; the orthogonal centroid
    # vector 1 and the opposite vector 3 (closer to cell 1's 0-cosine
    # than cell 0's -1) are pruned without multi-probe
    assert got == [0, 2]


def test_lsh_bucket_is_narrow_plan(spark):
    plan = (
        similarity.lsh_hyperplane_buckets(_vecs(spark), n_planes=4, dim=DIM)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure projection: no shuffle at any scale


class TestPQEncode:
    def test_codebook_vectors_encode_to_themselves(self, spark):
        from nhl_data_warehouse_spark.operators.similarity import pq_encode

        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = pq_encode(df, dim=8, m=2, n_codes=4)
        rows_out = out.collect()
        # every vector gets exactly m rows
        per_vec = {}
        for r in rows_out:
            per_vec.setdefault(r.vec_id, []).append(r)
        assert all(len(v) == 2 for v in per_vec.values())
        # a codebook seed vector is distance-0 from its own code
        for r in rows_out:
            if r.vec_id < 4:
                assert r.code == r.vec_id and float(r.dist) == 0.0
            else:
                assert 0 <= r.code < 4 and float(r.dist) >= 0.0

    def test_matches_naive_argmin(self, spark):
        from nhl_data_warehouse_spark.operators.similarity import pq_encode

        import random

        rng = random.Random(13)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(12)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            (r.vec_id, r.subspace): r.code
            for r in pq_encode(df, dim=6, m=3, n_codes=4).collect()
        }
        import numpy as np

        vecs = {i: np.array(v, dtype=np.float32).astype(np.float64) for i, v in rows}
        for i, _ in rows:
            for s in range(3):
                sub = vecs[i][s * 2 : s * 2 + 2]
                dists = [
                    (round(float(np.sum((sub - vecs[c][s * 2 : s * 2 + 2]) ** 2)), 6), c)
                    for c in range(4)
                ]
                assert got[(i, s)] == min(dists)[1]

    def test_ivfpq_query_vector_ranks_first_at_zero(self, spark):
        from nhl_data_warehouse_spark.operators.similarity import ivfpq_topk

        import random

        rng = random.Random(3)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = ivfpq_topk(df, query_id=0, n_centroids=4, dim=8, m=2, n_codes=4, k=5).collect()
        # vec 0 is a codebook seed: its codes reconstruct it exactly, so
        # its asymmetric distance to itself is 0 and it ranks first
        assert out[0].vec_id == 0 and float(out[0].adc_dist) == 0.0
        dists = [float(r.adc_dist) for r in out]
        assert dists == sorted(dists)


class TestKMeansLloydStep:
    def test_means_match_python_reference(self, spark):
        # centroids = vecs 0,1; vec 2 joins cell 0 (near-copy of 0),
        # vec 3 joins cell 1 (farther from 0's cell? verify by hand
        # below against a plain python Lloyd step)
        out = similarity.kmeans_lloyd_step(_vecs(spark), n_centroids=2).collect()
        rows = [(0, [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
                (1, [0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0]),
                (2, [0.99, 0.01, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
                (3, [-1.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0])]
        cents = {c: v for c, v in rows[:2]}

        def sqd(a, b):
            return round(sum((x - y) ** 2 for x, y in zip(a, b)), 6)

        assign = {}
        for vid, v in rows:
            assign[vid] = min(cents, key=lambda c: (sqd(v, cents[c]), c))
        expected = {}
        for c in cents:
            members = [v for vid, v in rows if assign[vid] == c]
            for d in range(DIM):
                expected[(c, d)] = (
                    len(members),
                    round(sum(m[d] for m in members) / len(members), 6),
                )
        got = {(r.cell_id, r.dim): (r.n_members, float(r.centroid_val)) for r in out}
        assert got.keys() == expected.keys()
        for k in expected:
            assert got[k][0] == expected[k][0]
            assert got[k][1] == pytest.approx(expected[k][1], abs=1e-6)

    def test_rerun_bit_identical(self, spark):
        a = sorted(map(tuple, similarity.kmeans_lloyd_step(_vecs(spark), 2).collect()))
        b = sorted(map(tuple, similarity.kmeans_lloyd_step(_vecs(spark), 2).collect()))
        assert a == b


class TestInt8Quantize:
    def test_codes_and_degenerate_vector(self, spark):
        from nhl_data_warehouse_spark.operators.similarity import (
            quantize_embeddings_int8,
        )

        df = spark.createDataFrame(
            [(1, [0.0, 1.0, 2.0]), (2, [5.0, 5.0, 5.0])],
            "vec_id long, embedding array<float>",
        )
        got = {r.vec_id: r for r in quantize_embeddings_int8(df).collect()}
        # affine map: 0 -> -128, mid -> floor(127.5)-128 = -1, max -> 127
        assert got[1].q_codes == "-128,-1,127"
        assert (got[1].vmin, got[1].vmax, got[1].dim) == (0.0, 2.0, 3)
        # constant vector: scale undefined -> all zeros, params preserved
        assert got[2].q_codes == "0,0,0"
        assert got[2].vmin == got[2].vmax == 5.0


class TestRecallDials:
    def test_multiprobe_recovers_cross_bucket_neighbor(self, spark):
        from pyspark.sql import functions as F

        from nhl_data_warehouse_spark.operators.similarity import (
            ann_bucketed_topk,
            ann_multiprobe_topk,
            lsh_hyperplane_buckets,
        )

        df = spark.createDataFrame(
            [(i, [float(i == j or i + 8 == j) for j in range(64)]) for i in range(40)],
            "vec_id long, embedding array<float>",
        )
        q = F.array(*[F.lit(1.0 if j in (0, 8) else 0.0) for j in range(64)])
        single = {r.vec_id for r in ann_bucketed_topk(df, q, k=40, dim=64).collect()}
        multi = {
            r.vec_id
            for r in ann_multiprobe_topk(df, q, k=40, dim=64, max_flips=1).collect()
        }
        # multi-probe candidates are a superset: every single-bucket hit
        # plus the 1-bit-flip buckets' vectors
        assert single <= multi
        buckets = {r.vec_id: r.bucket for r in lsh_hyperplane_buckets(df, dim=64).collect()}
        # and multi-probe saw at least as many distinct buckets
        assert len({buckets[v] for v in multi}) >= len({buckets[v] for v in single})

    def test_nprobe2_is_superset_of_nprobe1(self, spark):
        from nhl_data_warehouse_spark.operators.similarity import ivf_topk
        from nhl_data_warehouse_spark.suite.registry import load

        (emb,) = load(spark, "/root/testdata/sf0.001", "embeddings")
        from nhl_data_warehouse_spark.suite.training import _query_vec

        q = _query_vec(spark, "/root/testdata/sf0.001")
        # k larger than the corpus: results ARE the candidate sets, so
        # widening the probe can only add candidates, never lose them
        big = emb.count() + 1
        one = {r.vec_id for r in ivf_topk(emb, q, k=big, nprobe=1).collect()}
        two = {r.vec_id for r in ivf_topk(emb, q, k=big, nprobe=2).collect()}
        assert one <= two and len(two) > len(one)
