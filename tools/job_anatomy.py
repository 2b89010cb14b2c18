"""Per-job description/duration dump for one invocation of a registered entry."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
name = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
from geoscan_fraud_spark import get_spark
import geoscan_fraud_spark.harness_geo, geoscan_fraud_spark.harness_ext, geoscan_fraud_spark.harness_pipeline  # noqa
from geoscan_fraud_spark.harness import QUERIES
spark = get_spark(app_name="anatomy"); spark.sparkContext.setLogLevel("ERROR")
jsc = spark.sparkContext._jsc.sc()
def maxjob():
    jsc.listenerBus().waitUntilEmpty()
    jl = jsc.statusStore().jobsList(None)
    return jl.apply(0).jobId() if jl.size() > 0 else -1
# warm run (amortized one-offs), then profiled run
QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
b = maxjob()
QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
a = maxjob()
jl = jsc.statusStore().jobsList(None)
rows = []
for i in range(jl.size()):
    j = jl.apply(i)
    if b < j.jobId() <= a:
        dur = (j.completionTime().get().getTime() - j.submissionTime().get().getTime())/1000.0 if j.completionTime().isDefined() else -1
        desc = j.description().get() if j.description().isDefined() else j.name()
        rows.append((j.jobId(), dur, j.numTasks(), str(desc)[:90]))
for r in sorted(rows):
    print(f"{r[0]:6d} {r[1]:7.3f}s {r[2]:4d}t  {r[3]}")
from collections import Counter
agg = {}
for _, d, _, desc in rows:
    k = desc.split(" at ")[0][:60]
    t, c = agg.get(k, (0.0, 0)); agg[k] = (t + d, c + 1)
print("--- by description ---")
for k, (t, c) in sorted(agg.items(), key=lambda x: -x[1][0]):
    print(f"{c:3d}x {t:7.3f}s  {k}")
