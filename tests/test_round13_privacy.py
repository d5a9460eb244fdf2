"""Round-13 privacy/governance tests: Laplace-mechanism count release
(seeded draw vs a hashlib reference, scale law across epsilon) and the
k-anonymity audit (vs a pure-Python equivalence-class reference,
threshold monotonicity, NULL quasi-identifier classes)."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)


def _laplace_ref(key: str, b: float, salt: str = "dp-v1") -> float:
    h = hashlib.md5(f"{salt}|{key}".encode()).hexdigest()
    kk = int(h[:8], 16)
    u = (kk + 0.5) / 4294967296.0
    x = b * math.log(2.0 * u) if u < 0.5 else -b * math.log(2.0 * (1.0 - u))
    # mirror SQL ROUND HALF_UP at 6dp closely enough for assertion
    return x


def test_dp_laplace_counts_vs_reference(spark):
    from nhl_data_warehouse_spark.operators.privacy import dp_laplace_counts

    rng = random.Random(47)
    rows = [(f"g{rng.randint(0, 9)}",) for _ in range(3000)]
    df = spark.createDataFrame(rows, "g string")
    out = {
        r["g"]: r
        for r in dp_laplace_counts(df, ["g"], epsilon=1.0).collect()
    }
    truth = Counter(g for g, in rows)
    assert set(out) == set(truth)
    for g, r in out.items():
        assert r["true_count"] == truth[g]
        ref = _laplace_ref(g, 1.0)
        assert math.isclose(r["noise"], ref, rel_tol=0, abs_tol=1e-6), g
        assert r["noisy_count"] == r["true_count"] + r["noise"]
        assert r["epsilon"] == 1.0
    # the draw is a function of the key: a re-run is bit-identical
    again = {
        r["g"]: r["noise"]
        for r in dp_laplace_counts(df, ["g"], epsilon=1.0).collect()
    }
    assert again == {g: r["noise"] for g, r in out.items()}


def test_dp_laplace_scale_law_and_magnitude(spark):
    from nhl_data_warehouse_spark.operators.privacy import dp_laplace_counts

    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(400) for _ in range(3)], "g string"
    )
    n1 = {
        r["g"]: r["noise"]
        for r in dp_laplace_counts(df, ["g"], epsilon=1.0).collect()
    }
    n4 = {
        r["g"]: r["noise"]
        for r in dp_laplace_counts(df, ["g"], epsilon=4.0).collect()
    }
    # same uniform draw, scale b=1/eps: noise shrinks ~4x (up to the
    # independent 6dp rounding of each arm)
    for g in n1:
        assert abs(n4[g] - n1[g] / 4.0) < 1e-5, g
    # Laplace(1): mean |noise| is b = 1 (loose 3-sigma-ish band over
    # 400 draws), and signs are roughly balanced
    mean_abs = sum(abs(v) for v in n1.values()) / len(n1)
    assert 0.7 < mean_abs < 1.3
    neg = sum(1 for v in n1.values() if v < 0)
    assert 120 < neg < 280


def _kanon_ref(
    rows: list[tuple], ks: tuple[int, ...]
) -> dict[int, tuple[int, int, int, int]]:
    sizes = Counter(rows)
    out = {}
    for k in ks:
        below = {c: s for c, s in sizes.items() if s < k}
        out[k] = (
            len(sizes),
            sum(sizes.values()),
            len(below),
            sum(below.values()),
        )
    return out


def test_k_anonymity_audit_vs_reference(spark):
    from nhl_data_warehouse_spark.operators.privacy import k_anonymity_audit

    rng = random.Random(53)
    rows = [
        (rng.randint(0, 8), f"s{rng.randint(0, 3)}", rng.randint(0, 5))
        for _ in range(2500)
    ] + [(99, "rare", i) for i in range(7)]  # 7 singleton classes
    df = spark.createDataFrame(rows, "a int, b string, c int")
    ks = (2, 5, 10, 25)
    out = {
        r["k"]: r
        for r in k_anonymity_audit(df, ["a", "b", "c"], ks=ks).collect()
    }
    ref = _kanon_ref(rows, ks)
    prev_below = -1
    for k in ks:
        nc, nr, ncb, nrb = ref[k]
        r = out[k]
        assert (r["n_classes"], r["n_rows"]) == (nc, nr)
        assert (r["n_classes_below"], r["n_rows_below"]) == (ncb, nrb)
        assert r["frac_rows_below"] == nrb / nr
        assert r["n_rows_below"] >= prev_below  # monotone in k
        prev_below = r["n_rows_below"]
    # the planted singletons are sub-2-anonymous
    assert out[2]["n_classes_below"] >= 7


def test_k_anonymity_null_quasi_values_form_a_class(spark):
    from nhl_data_warehouse_spark.operators.privacy import k_anonymity_audit

    rows = [(None, "x")] * 6 + [(1, "x")] * 3 + [(2, None)]
    df = spark.createDataFrame(rows, "a int, b string")
    out = {
        r["k"]: r for r in k_anonymity_audit(df, ["a", "b"], ks=(5,)).collect()
    }
    r = out[5]
    # classes: (NULL,x)=6, (1,x)=3, (2,NULL)=1 -> below-5 rows = 4
    assert r["n_classes"] == 3 and r["n_rows"] == 10
    assert r["n_classes_below"] == 2 and r["n_rows_below"] == 4
