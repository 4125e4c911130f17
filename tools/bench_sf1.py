#!/usr/bin/env python
"""sf1 scaling record (r11, verdict item 7): time a 10-entry
data-dominated subset at sf1 (derived via tools/make_sf1.py — 6 M
lineitem / 50 k documents) so core-count ratios measure PARALLEL
work, not the fixed per-query overhead that dominates sf0.1. Same
methodology as bench.py (one warmup, median of $SPARK_GRAFT_BENCH_REPS
noop-sink runs, cache cleared between runs, both drift canaries),
same env contract ($SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS). Writes
BENCH_SF1_c{cpus}.json next to the repo root; does NOT touch the
driver's bench.py contract.

Usage: python tools/make_sf1.py /tmp/spark_graft_sf1 && \
       SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python tools/bench_sf1.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from enriched_crime_incident_data_pipeline_spark import get_spark, registry

# data-dominated subset: the heavy operator families (scan+agg, joins,
# text/LSH map chains, embedding kernel, window, streaming fold)
SUBSET = [
    "flagship_enriched_report",
    "tpch_q1",
    "tpch_q9",
    "dd4_simhash",
    "dd5_ngram_jaccard",
    "dd26_shingle_sensitivity",
    "dd7_embed_blocked",
    "tfidf_top_terms",
    "ta6_winnow",
    "st7_stream_corpus_ingest",
]
DRIFT_QUERY = "tpch_q6"
DRIFT_QUERY2 = "sk3_cms"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="bench_sf1")
    qs = registry.spark_queries()

    def run_once(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    drift: list[float] = []
    drift2: list[float] = []
    med: dict[str, float] = {}
    mins: dict[str, float] = {}
    t_all = time.time()
    for name in SUBSET:
        run_once(name)  # warmup
        samples = [run_once(name) for _ in range(reps)]
        med[name] = round(statistics.median(samples), 3)
        mins[name] = round(min(samples), 3)
        drift.append(round(run_once(DRIFT_QUERY), 3))
        drift2.append(round(run_once(DRIFT_QUERY2), 3))
    payload = {
        "metric": "sf1_subset_total_wall",
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "reps": reps,
        "stat": "median",
        "queries": med,
        "queries_min": mins,
        "sf": 1.0,
        "host": {
            "cpus": os.cpu_count(),
            "cpus_conf": cpus,
            "bench_wall_sec": round(time.time() - t_all, 1),
            "drift_query": DRIFT_QUERY,
            "drift_series": drift,
            "drift_query2": DRIFT_QUERY2,
            "drift_series2": drift2,
        },
    }
    line = json.dumps(payload)
    print(line)
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"BENCH_SF1_c{cpus}.json",
        ),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
