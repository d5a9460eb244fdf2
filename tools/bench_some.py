"""Targeted micro-bench: time a subset of registry queries with the
exact bench.py methodology (noop sink, release_cached between queries)
but repeated R times per query, reporting each pass and the min.

Usage: python tools/bench_some.py [-r N] [--explain DIR] name [name...]

--explain DIR additionally writes `.explain("formatted")` for each
query to DIR/<name>.txt (the plans/r13 before/after artifacts).
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-r", "--repeats", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, help="dir to write explain('formatted') per query")
    args = ap.parse_args()

    from nhl_data_warehouse_spark.session import get_spark, release_cached
    from nhl_data_warehouse_spark.suite import REGISTRY

    spark = get_spark(app_name="bench_some")
    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(f"{args.sf}/region.parquet").selectExpr(
        "sum(cast(r_regionkey as decimal(18,2)))"
    ).write.format("noop").mode("overwrite").save()
    spark.range(10).toPandas()

    out: dict[str, dict] = {}
    for name in args.names:
        spec = REGISTRY[name]
        runs = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            df = spec.fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            if args.explain and i == 0:
                os.makedirs(args.explain, exist_ok=True)
                with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            release_cached(spark)
            del df
            gc.collect()
        out[name] = {"runs": runs, "min": min(runs)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total_min": round(sum(v["min"] for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
