#!/usr/bin/env python
"""One-shot wall-clock audit of every registry query NOT in bench.py
HEADLINE/LONGTAIL, at sf0.1.  Feeds the BENCH_EXCLUDED map (r10
verdict item 2): each exclusion cites a measured time instead of a
guess, and anything over the ~1 s longtail bar gets flagged for
wiring instead of excluding.

Single-shot timings (no warmup reps) are fine here: the decision is a
threshold (>~1.5 s => wire), not a round-over-round delta.

Writes tools/bench_audit.json: {name: sec, ...} sorted desc.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from enriched_crime_incident_data_pipeline_spark import get_spark, registry  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_audit")
    qs = registry.spark_queries()
    wired = set(bench.HEADLINE) | set(bench.LONGTAIL)
    targets = sorted(set(qs) - wired)
    # JVM/codegen warmup on a cheap wired query so the first audited
    # entry doesn't absorb the session's compile cost
    qs["tpch_q6"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out: dict[str, float] = {}
    for i, name in enumerate(targets):
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
        except Exception as e:  # record, keep auditing
            out[name] = -1.0
            print(f"ERROR {name}: {e}", file=sys.stderr)
        spark.catalog.clearCache()
        if (i + 1) % 20 == 0:
            print(f"{i + 1}/{len(targets)} done", file=sys.stderr)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_audit.json")
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "timings": ranked}, f, indent=1)
    over = {k: v for k, v in ranked.items() if v >= 1.5}
    print(json.dumps({"n": len(out), "over_1.5s": over}))


if __name__ == "__main__":
    main()
