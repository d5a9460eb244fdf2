"""Self-check harness mirroring the external driver's correctness gate.

For every suite query: run the Spark DataFrame AND the DuckDB oracle
on the same parquet tables, then compare row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted
by their stringified tuple). Exits non-zero on any mismatch.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    """Normalize a cell for cross-engine comparison.

    Mirrors the external driver (VERDICT r1 §W1): no
    ``Decimal.normalize()`` smoothing — a Decimal reaching the final
    projection stringifies with its trailing zeros and can never match
    the driver's floated oracle cell, which is why the loop below
    HARD-FAILS on any DECIMAL/HUGEINT output column on either side
    instead of trying to coerce its way to a match. Note repr() keeps
    the -0.0/0.0 distinction, exactly like the driver — queries must
    normalize negative zero themselves (the ``+ 0.0`` convention).
    """
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return [tuple(_norm(r[i]) for i in order) for r in rows]


def frame_signature(columns: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    cols_sorted = sorted(columns)
    lines = sorted("\x1f".join(r) for r in norm_rows(columns, rows))
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return len(rows), cols_sorted, digest


RISKY_DUCK_TYPES = ("DECIMAL", "HUGEINT", "UHUGEINT")


def risky_spark_cols(sdf) -> list[str]:
    return [c for c, t in sdf.dtypes if t.startswith("decimal")]


def risky_duck_cols(con, sql: str) -> list[str]:
    """Columns whose DuckDB output type is DECIMAL/HUGEINT."""
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    return [c for c, t, *_ in desc if any(t.startswith(r) for r in RISKY_DUCK_TYPES)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from nhl_data_warehouse_spark.session import get_spark
    from nhl_data_warehouse_spark.suite import REGISTRY

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.names or list(REGISTRY)
    failures = []
    for name in names:
        # reclaim the previous query's persisted intermediates and
        # localCheckpoint blocks (LSH bands, capped shingles, oriented
        # edges, ...) — without this the 130+ collect()s accumulate
        # heap state and late queries slow down several-fold, the
        # exact long-running-driver failure bench.py guards against
        from nhl_data_warehouse_spark.session import release_cached

        release_cached(spark)
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            s_cols = sdf.columns
            s_risky = risky_spark_cols(sdf)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {str(e)[:300]}")
            continue
        if s_risky:
            # driver-unsafe regardless of values — Spark Decimals keep
            # their trailing zeros while the driver floats the oracle's
            failures.append(name)
            print(f"FAIL  {name}: spark output has DECIMAL columns {s_risky}")
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle — rows-only)")
            continue
        try:
            d_risky = risky_duck_cols(con, spec.oracle)
            rel = con.execute(spec.oracle)
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {str(e)[:300]}")
            continue
        if d_risky:
            failures.append(name)
            print(f"FAIL  {name}: oracle output has DECIMAL/HUGEINT columns {d_risky}")
            continue
        sn, sc, sh = frame_signature(s_cols, s_rows)
        dn, dc, dh = frame_signature(d_cols, d_rows)
        status = "ok" if (sn, sc, sh) == (dn, dc, dh) else "FAIL"
        dt = time.time() - t0
        print(f"{status:5s} {name}: spark {sn} rows, duckdb {dn} rows  [{dt:.1f}s]")
        if status == "FAIL":
            failures.append(name)
            if sc != dc:
                print(f"      cols spark={sc} duckdb={dc}")
            elif sn != dn:
                print(f"      row counts differ: {sn} vs {dn}")
            else:
                s_set = set(norm_rows(s_cols, s_rows))
                d_set = set(norm_rows(d_cols, d_rows))
                only_s = list(s_set - d_set)[:3]
                only_d = list(d_set - s_set)[:3]
                print(f"      only-spark sample: {only_s}")
                print(f"      only-duckdb sample: {only_d}")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
