"""Interleaved same-session A/B harness (r10/r11 measurement
protocol): variants alternate inside ONE Spark session so host drift
hits both equally; each run constructs the query fresh and clears
caches; the noop sink materializes every column (guide §1.4).

Usage from an experiment script:

    from tools.ab_util import ab
    med = ab(spark, {"old": build_old, "new": build_new}, reps=5)
"""

from __future__ import annotations

import statistics
import time


def _run_once(spark, build) -> float:
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt


def ab(spark, variants: dict, reps: int = 5, warmup: bool = True) -> dict:
    """``variants``: name -> zero-arg callable returning a DataFrame.
    Returns name -> {"median", "min", "samples"}; prints a table."""
    names = list(variants)
    samples: dict[str, list[float]] = {n: [] for n in names}
    if warmup:
        for n in names:
            _run_once(spark, variants[n])
    for _ in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"ab:{n}")
            samples[n].append(_run_once(spark, variants[n]))
            spark.sparkContext.setJobDescription(None)
    out = {}
    for n in names:
        s = samples[n]
        out[n] = {
            "median": round(statistics.median(s), 3),
            "min": round(min(s), 3),
            "samples": [round(x, 3) for x in s],
        }
        print(f"{n}: median={out[n]['median']} min={out[n]['min']} {out[n]['samples']}")
    return out
