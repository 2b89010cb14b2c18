"""Min-of-N timing + steady-state job counts for registered entries."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    args = sys.argv[1:]
    runs = 4
    if "--runs" in args:
        i = args.index("--runs"); runs = int(args[i+1]); del args[i:i+2]
    names = args
    from geoscan_fraud_spark import get_spark
    import geoscan_fraud_spark.harness_geo  # noqa
    import geoscan_fraud_spark.harness_ext  # noqa
    import geoscan_fraud_spark.harness_pipeline  # noqa
    from geoscan_fraud_spark.harness import QUERIES
    spark = get_spark(app_name="time-jobs"); spark.sparkContext.setLogLevel("ERROR")
    jsc = spark.sparkContext._jsc.sc()
    def maxjob():
        jsc.listenerBus().waitUntilEmpty()
        jl = jsc.statusStore().jobsList(None)
        return jl.apply(0).jobId() if jl.size() > 0 else -1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    best, jobs = {}, {}
    for r in range(runs + 1):
        for n in names:
            b = maxjob(); t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0; a = maxjob()
            if r:
                best[n] = min(best.get(n, 1e9), dt); jobs[n] = a - b
    for n in names:
        print(f"{n:34s} {best[n]:7.3f}s  jobs={jobs[n]}  load={os.getloadavg()[0]:.2f}")

if __name__ == "__main__":
    main()
