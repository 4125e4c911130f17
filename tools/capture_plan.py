#!/usr/bin/env python
"""Write .explain('formatted') of registry queries to
plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<tag>.txt (default r10)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from enriched_crime_incident_data_pipeline_spark import get_spark, registry

def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_plan")
    qs = registry.spark_queries()
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(p)
        print(f"wrote {name}_{tag}.txt ({len(p)} bytes)")

if __name__ == "__main__":
    main()
