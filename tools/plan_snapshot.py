"""Dump `.explain("formatted")` plans into plans/r21/ (optimization
round before/after evidence). Usage:
python tools/plan_snapshot.py before|after [sf_dir] [query ...]
Default queries = BENCH_KEYS, captured at the bench SF so the
exchange/AQE shapes match what the driver times."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from real_time_crypto_market_data_pipeline_spark.plans import BENCH_KEYS, QUERIES  # noqa: E402
from real_time_crypto_market_data_pipeline_spark.session import get_spark  # noqa: E402


if __name__ == "__main__":
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or list(BENCH_KEYS)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "plans", "r21")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_snapshot")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        plan = (QUERIES[name](spark, sf_dir)._jdf.queryExecution()
                .explainString(mode))
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({tag})\n{plan}")
        print(f"wrote {path} ({plan.count('Exchange')} Exchange nodes)")
    spark.stop()
