#!/usr/bin/env python
"""SCALING.md sweep: time the representative query subset at one or
more SF dirs (median of N reps after one warmup, noop sink — the
same steady-state protocol as bench.py) and print one JSON line per
(sf_dir, query).

Usage:
  python tools/scaling_sweep.py /tmp/spark_graft_sf1 [query ...]

Defaults to the SCALING.md subset. For sf1, first run
``python tools/make_sf1.py``.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from enriched_crime_incident_data_pipeline_spark import get_spark, registry

SUBSET = [
    "tpch_q1",
    "tpch_q5",
    "tpch_q21",
    "flagship_enriched_report",
    "dd1_exact_dedup",
    "dd5_ngram_jaccard",
    "tp1_pack",
    "w3_window_max",
    "tfidf_top_terms",
    "ss3_ivf_topk",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    names = sys.argv[2:] or SUBSET
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark(app_name="scaling_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.spark_queries()
    out = {}
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        samples = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
        out[name] = round(statistics.median(samples), 3)
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "query": name,
                    "median": out[name],
                    "min": round(min(samples), 3),
                    "reps": reps,
                }
            ),
            flush=True,
        )
    print(json.dumps({"sf_dir": sf_dir, "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
