# r18 A/B harness: deterministic jobs/stages/tasks per query per AQE-conf
# variant (old|pf|pfr), plus min-of-3 walls — the evidence behind
# OPTIMIZATION_r18.md §1. Usage: python scripts/mb_aqe_tasks.py pfr <query...>
"""Deterministic A/B evidence: jobs/stages/tasks per query per conf variant.
Usage: prof_tasks.py <variant: old|pf|pfr> <query substrings...>"""
import os, sys, time, json

variant = sys.argv[1]
names = sys.argv[2:]
conf = {
    "old": ("true", "false"),
    "pf": ("false", "false"),
    "pfr": ("false", "true"),
}[variant]
os.environ["SPARK_GRAFT_AQE_PARALLELISM_FIRST"] = conf[0]
os.environ["SPARK_GRAFT_AQE_CACHED_REPLAN"] = conf[1]
sys.path.insert(0, "/root/repo")

from hazelcast_jet_contrib_spark import get_spark
from hazelcast_jet_contrib_spark.registry import QUERIES

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"
spark = get_spark(app_name=f"prof_{variant}")
sc = spark.sparkContext
spark.read.parquet(f"{SF}/region.parquet").collect()

out = {}
for name in sorted(QUERIES):
    if not any(f in name for f in names):
        continue
    fn = QUERIES[name]
    try:
        fn(spark, WARM).collect()
    except Exception:
        pass
    spark.catalog.clearCache()
    walls = []
    counts = None
    for rep in range(3):
        group = f"{name}-{rep}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, SF).collect()
        walls.append(round(time.perf_counter() - t0, 3))
        sc.setJobGroup(None, None)
        st = sc.statusTracker()
        jids = st.getJobIdsForGroup(group)
        stage_ids = set()
        for j in jids:
            ji = st.getJobInfo(j)
            if ji:
                stage_ids.update(ji.stageIds)
        ntasks = 0
        nstages = 0
        for s in stage_ids:
            si = st.getStageInfo(s)
            if si:
                ntasks += si.numTasks
                nstages += 1
        counts = {"jobs": len(jids), "stages": nstages, "tasks": ntasks}
        spark.catalog.clearCache()
        sc._jvm.System.gc()
    out[name] = {"wall_min": min(walls), "walls": walls, **counts}
print(json.dumps({"variant": variant, "queries": out}))
spark.stop()
