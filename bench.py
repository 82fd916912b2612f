"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": "<dir>"}

Each query is executed to completion with the noop sink (full plan
runs, nothing is shipped to the driver), so timings measure engine
work, not result transfer. A warmup no-op absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_crypto_market_data_pipeline_spark.plans import BENCH_KEYS, QUERIES
from real_time_crypto_market_data_pipeline_spark.session import get_spark


def run_to_completion(df) -> int:
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    # warmup: JVM classloading + codegen paths
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in BENCH_KEYS:
        t0 = time.perf_counter()
        run_to_completion(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
