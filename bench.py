"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line: {"metric": "headline_total", "value": N,
"unit": "sec", "queries": {name: sec, ...}, "sf": "<dir>"}. Each query
runs to completion with the noop sink. Warm-up is two-stage: every
query once at the smallest SF (classloading + codegen compile), then
one untimed run at the TARGET SF (HotSpot C2 needs hot loops on real
volume; without this the first timed run sat up to 1.8x steady state).
Reported = min of N timed runs ($SPARK_GRAFT_BENCH_RUNS, default 3);
ALL runs + per-query medians + loadavg snapshots go to the mirror
file only ($SPARK_GRAFT_BENCH_OUT, default BENCH_LOCAL_latest.json -
round-stamped copies are explicit opt-in), because the full record's
runs arrays grew past the driver's captured tail twice (r05/r06).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_crypto_market_data_pipeline_spark.plans import (
    BENCH_EXTRA_KEYS,
    BENCH_KEYS,
    QUERIES,
)
from real_time_crypto_market_data_pipeline_spark.session import get_spark


def run_to_completion(df) -> int:
    df.write.mode("overwrite").format("noop").save()
    return 0


def load_snapshot() -> dict:
    """Machine-load evidence (loadavg + runnable-task count) per run:
    makes the environment-vs-regression call (r5's 1.23x noise scare)
    evidence-based."""
    snap: dict = {}
    try:
        snap["loadavg"] = list(os.getloadavg())
    except OSError:
        pass
    running = 0
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(stat) as f:
                # field 3 (after the parenthesized comm) is the state
                running += f.read().rsplit(")", 1)[1].split()[0] == "R"
        except OSError:
            continue
    snap["procs_running"] = running
    return snap


def main(keys=None, metric="headline_total", extra_keys=None) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    # headline set pinned to the round-1 baseline queries (comparable
    # totals); extra_keys are measured but kept out of the total
    keys = keys if keys is not None else BENCH_KEYS
    extra_keys = extra_keys if extra_keys is not None else BENCH_EXTRA_KEYS
    spark = get_spark("bench")
    # warm every query at the smallest SF first: steady-state, not
    # first-call classloading + codegen compilation (~1-3 s/query)
    for name in [*keys, *extra_keys]:
        run_to_completion(QUERIES[name](spark, warm_dir))

    n_runs_env = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    load_start = load_snapshot()

    def time_keys(names, n_runs=n_runs_env) -> tuple[dict[str, float], dict[str, list]]:
        timings: dict[str, float] = {}
        runs: dict[str, list] = {}
        for name in names:
            # label jobs: UI/event logs map back to the timed query
            spark.sparkContext.setJobDescription(f"bench:{name}")
            # one untimed run at the target SF: C2-compile the hot
            # loops on real data volume before the clock starts
            spark.catalog.clearCache()
            run_to_completion(QUERIES[name](spark, sf_dir))
            samples = []
            for _ in range(n_runs):
                # r20 VERDICT: CacheManager plan-matched identical runs
                # onto the previous run's persisted blocks, making
                # min-of-N partially warm-cache. Outside the clock.
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                run_to_completion(QUERIES[name](spark, sf_dir))
                samples.append(round(time.perf_counter() - t0, 3))
            timings[name] = min(samples)
            runs[name] = samples
        spark.sparkContext.setJobDescription(None)
        return timings, runs

    timings, runs = time_keys(keys)
    extra, extra_runs = time_keys(extra_keys)

    def median(xs):
        s = sorted(xs)
        mid = len(s) // 2
        return round((s[mid] + s[~mid]) / 2, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": metric,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": {k: median(v) for k, v in runs.items()},
        "runs": runs,
        "sf": sf_dir,
        "method": (
            "warm@sf0.001 + 1 untimed target-SF run/query; queries=min "
            f"of {n_runs_env} timed, all runs recorded; session cache "
            "cleared before every run (r21: honest cold-cache timing)"
        ),
        "load_start": load_start,
        "load_end": load_snapshot(),
    }
    if metric == "headline_total":  # r16 ADVICE: caveat precedes the mirror write
        out["note"] = ("headline set r1-pinned except one sanctioned "
                       "swap (r15): q_dedup_jaccard -> q_dedup_jaccard_pruned")
    if extra:
        out["extra_queries"] = extra
        out["extra_runs"] = extra_runs
    # stop Spark BEFORE printing so the headline JSON is the very last
    # stdout line; full record to the mirror file only, stdout gets the
    # COMPACT line (the full line outgrew the driver's tail in r5+r6)
    spark.stop()
    # --tpch defaults to its own file: never clobber the headline mirror
    local_copy = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL_latest.json"
                 if metric == "headline_total" else f"BENCH_LOCAL_{metric}.json")
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), local_copy)
        with open(path, "w") as f:
            f.write(json.dumps(out) + "\n")
    except OSError:
        pass
    compact = {"metric": metric, "value": total, "unit": "sec",
               "queries": timings, "sf": sf_dir}
    if metric == "headline_total":
        compact["note"] = out["note"]
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--tpch":
        # the full 22-query TPC-H shape suite (see SCALING.md table)
        tpch = sorted(
            (k for k in QUERIES if k.startswith("q_tpch_q")),
            key=lambda k: int(k.rsplit("q", 1)[1]),
        )
        main(keys=tpch, metric="tpch_total", extra_keys=[])
    else:
        main()
