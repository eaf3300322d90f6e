"""Dump explain('formatted') for named queries into plans/r17/ with a
suffix (_before/_after) — the optimization-round plan-evidence files.
Usage: PYTHONPATH=<tree> python scripts/dump_r17_plans.py SUFFIX q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1) — plans at bench scale."""
import os, sys

sys.path.insert(0, os.environ.get("PYTHONPATH", "."))
from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.caching import release_cached
from esgi_4iabd2_sparkstreaming_groupe13_spark.plans.queries import QUERIES
from esgi_4iabd2_sparkstreaming_groupe13_spark.session import get_spark

suffix = sys.argv[1]
names = set(sys.argv[2:])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = "/root/repo/plans/r17"
spark = get_spark(app_name=f"dump_r17_{suffix}")
for spec in QUERIES:
    if spec.name not in names:
        continue
    df = spec.fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(f"{out_dir}/{spec.name}_{suffix}.txt", "w") as f:
        f.write(plan)
    release_cached()
    print("dumped", spec.name)
spark.stop()
