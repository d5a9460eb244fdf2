"""Queries against the REAL driver testdata parquet.

Round-1 lesson (VERDICT W2): pytest stayed green while two operators
hard-errored against the driver's parquet, because no test read the
actual files — the fixtures were all synthetic DataFrames. These tests
read ``/root/testdata/sf0.001`` through the same ``registry.load``
path the driver exercises, so encoding drift in the testdata (ns
longs vs TIMESTAMP_NTZ vs TIMESTAMP) breaks CI before it breaks the
driver.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata not present at {SF_DIR}"
)


def test_load_normalizes_timestamp_ntz(spark):
    from nhl_data_warehouse_spark.suite.registry import load

    events, orders, lineitem = load(spark, SF_DIR, "events", "orders", "lineitem")
    assert dict(events.dtypes)["ts"] == "timestamp"
    assert dict(orders.dtypes)["o_orderdate"] == "timestamp"
    assert dict(lineitem.dtypes)["l_shipdate"] == "timestamp"


def test_range_join_pairs_runs_on_driver_parquet(spark):
    """W2 regression: unix_micros over the driver-shaped ts column."""
    from nhl_data_warehouse_spark.operators.rangejoin import range_join_pairs
    from nhl_data_warehouse_spark.suite.registry import load

    (events,) = load(spark, SF_DIR, "events")
    out = range_join_pairs(events, key="user_id", gap_minutes=5)
    assert out.columns == ["user_id", "a_id", "b_id", "gap_seconds"]
    assert out.count() >= 0  # forces full execution


def test_sessionize_runs_on_driver_parquet(spark):
    from nhl_data_warehouse_spark.operators.sessions import sessionize_batch
    from nhl_data_warehouse_spark.suite.registry import load

    (events,) = load(spark, SF_DIR, "events")
    out = sessionize_batch(events, gap_minutes=30)
    rows = out.limit(5).collect()
    assert {"user_id", "session_id", "n_events"} <= set(out.columns)
    assert all(r.n_events >= 1 for r in rows)


def test_every_registered_query_builds_a_plan(spark):
    """Analysis-time smoke over the full registry at sf0.001: building
    the DataFrame catches schema/type errors (the class of failure the
    driver hit) without paying full execution for all 122 queries."""
    from nhl_data_warehouse_spark.suite import REGISTRY

    failures = {}
    for name, spec in REGISTRY.items():
        try:
            df = spec.fn(spark, SF_DIR)
            df.schema  # forces analysis
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"
    assert not failures, failures


def test_driver_window_composition():
    """The external driver checks the first ~50 registered queries;
    round 6's priority list is (a) every query without a HASH-green
    driver CORRECTNESS row in rounds 1-5 — the 8 round-5 spillovers
    plus the 3 sketch queries whose earlier rows were the weaker
    rows-only kind before their round-6 tolerance-band reshape — and
    (b) the round-6 additions, so no already-green query may occupy a
    priority slot ahead of one still waiting for its verdict — an
    accidental import reorder silently forfeits driver verdicts.
    Derived from CORRECTNESS_r0{1..5}.json exactly like COVERAGE.md's
    driver-verdict history."""
    import json
    from pathlib import Path

    from nhl_data_warehouse_spark.suite import _PRIORITY, REGISTRY

    repo = Path(__file__).resolve().parents[1]
    green = set()
    for n in range(1, 6):
        p = repo / f"CORRECTNESS_r0{n}.json"
        if not p.exists():
            continue
        for name, row in json.loads(p.read_text()).items():
            if (
                row.get("hash_match")
                and row.get("rows_match")
                and row.get("schema_match")
            ):
                green.add(name)
    not_green = [n for n in REGISTRY if n not in green]
    assert sorted(_PRIORITY) == sorted(not_green), (
        "priority list must be exactly the not-yet-hash-green set; "
        f"missing={sorted(set(not_green) - set(_PRIORITY))} "
        f"extra={sorted(set(_PRIORITY) - set(not_green))}"
    )
    assert list(REGISTRY)[: len(_PRIORITY)] == _PRIORITY
    # the window must lead with the round-5 spillover + reshaped
    # sketches, in slots 1-11 exactly
    assert list(REGISTRY)[:11] == [
        "fim_split_documents",
        "length_bucket_padding",
        "cusum_revenue_drift",
        "grouped_hybrid_quantiles",
        "sql_udf_price_tiers",
        "collated_segment_counts",
        "schema_evolution_read",
        "lateral_topk_orders",
        "approx_distinct_users",
        "approx_value_percentiles",
        "hll_sketch_merge_rollup",
    ]
    # and the whole backlog must fit the ~50-query window
    assert len(_PRIORITY) <= 50, len(_PRIORITY)


def test_no_toplevel_array_or_map_in_oracle_less_schemas(spark):
    """Driver-harness insurance (VERDICT r3 item 6): the driver's
    pandas canonicalization sorts cells through ``Categorical``, which
    cannot hash list/dict cells — a top-level ArrayType/MapType column
    in an ORACLE-LESS query crashes even the rows-only check
    (CORRECTNESS_r03's approx_value_percentiles err). Oracle-bearing
    queries are exercised hash-strict by tools/check_oracle.py, so any
    array column that survives there is one the driver's text-form
    normalization handles; the rows-only queries get no such cover and
    must stay scalar at the edge."""
    from pyspark.sql.types import ArrayType, MapType

    from nhl_data_warehouse_spark.suite import REGISTRY

    offenders = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is not None:
            continue
        df = spec.fn(spark, SF_DIR)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_no_decimal_in_final_schemas(spark):
    """W1 regression: the driver floats oracle DECIMAL/HUGEINT cells,
    so any DecimalType column in a final query schema can never
    hash-match. Keep decimals internal, double/bigint at the edge."""
    from pyspark.sql.types import DecimalType

    from nhl_data_warehouse_spark.suite import REGISTRY

    offenders = {}
    for name, spec in REGISTRY.items():
        df = spec.fn(spark, SF_DIR)
        bad = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_load_normalizes_round1_nanos_long_format(spark, tmp_path):
    """Round 1 shipped events.ts as TIMESTAMP(NANOS), which Spark reads
    as a ns long under nanosAsLong; the loader must keep handling that
    shape if the driver reverts its generator."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nhl_data_warehouse_spark.suite.registry import load

    d = tmp_path / "sfns"
    d.mkdir()
    ts_ns = [1_700_000_000_000_000_000 + i * 61_000_000_000 for i in range(6)]
    table = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array(ts_ns, pa.timestamp("ns")),
            "user_id": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
            "event_type": pa.array(["click"] * 6),
            "value": pa.array([float(i) for i in range(6)]),
            "props": pa.array(['{"k": 1}'] * 6),
        }
    )
    pq.write_table(table, d / "events.parquet", use_deprecated_int96_timestamps=False)

    (events,) = load(spark, str(d), "events")
    assert dict(events.dtypes)["ts"] == "timestamp"
    # ns truncates to µs exactly; gap between consecutive events is 61s
    from nhl_data_warehouse_spark.operators.rangejoin import range_join_pairs

    pairs = range_join_pairs(events, key="user_id", gap_minutes=5).collect()
    # within each user: 3 events 61s apart -> pairs (0,1),(1,2),(0,2)
    assert len(pairs) == 6
    assert all(abs(r.gap_seconds) <= 300 for r in pairs)
