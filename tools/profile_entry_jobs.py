"""Per-job anatomy of any benched entry (guide §1: measure first).

Runs one full invocation of a registered (or benched-only) entry —
DataFrame construction side effects included — forces it through the
noop sink, and prints every Spark job submitted: id, callsite name,
duration, task count, plus a histogram by callsite. For the lifecycle /
streaming composites the job-count floor dominates wall time at fixture
scale, so the callsite histogram is the optimization map.

Usage: python tools/profile_entry_jobs.py ENTRY [sf_dir] [--repeat N]
"""

from __future__ import annotations

import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeat = 1
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    from geoscan_fraud_spark import get_spark
    import geoscan_fraud_spark.harness_geo  # noqa: F401
    import geoscan_fraud_spark.harness_ext  # noqa: F401
    import geoscan_fraud_spark.harness_pipeline  # noqa: F401
    from geoscan_fraud_spark.harness import QUERIES

    spark = get_spark(app_name=f"job-profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")

    fn = QUERIES.get(name)
    if fn is None:
        import geoscan_fraud_spark.harness as h
        import geoscan_fraud_spark.harness_pipeline as hp

        fn = getattr(h, name, None) or getattr(hp, name, None)
    if fn is None:
        raise SystemExit(f"unknown entry {name!r}")

    jsc = spark.sparkContext._jsc.sc()

    def jobs_after(first_job: int):
        jsc.listenerBus().waitUntilEmpty()
        jl = jsc.statusStore().jobsList(None)
        rows = []
        for i in range(jl.size()):
            j = jl.apply(i)
            if j.jobId() < first_job:
                continue
            dur = None
            try:
                if j.completionTime().isDefined() and j.submissionTime().isDefined():
                    dur = (
                        j.completionTime().get().getTime()
                        - j.submissionTime().get().getTime()
                    ) / 1000.0
            except Exception:
                pass
            label = j.name()
            try:
                if j.description().isDefined():
                    label = j.description().get()
            except Exception:
                pass
            rows.append((j.jobId(), label, dur, j.numTasks()))
        rows.sort()
        return rows

    def next_job_id() -> int:
        jsc.listenerBus().waitUntilEmpty()
        jl = jsc.statusStore().jobsList(None)
        return jl.apply(0).jobId() + 1 if jl.size() > 0 else 0

    for r in range(repeat):
        first = next_job_id()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        rows = jobs_after(first)
        print(f"\n=== {name} run {r}: {len(rows)} jobs, wall {wall:.2f}s ===")
        agg: dict[str, list[float]] = collections.defaultdict(lambda: [0, 0.0])
        for jid, jname, dur, ntasks in rows:
            short = jname.split("\n")[0][:110]
            print(
                f"{jid:5d}  {dur if dur is not None else -1:7.3f}s  "
                f"{ntasks:4d}t  {short}"
            )
            a = agg[short]
            a[0] += 1
            a[1] += dur or 0.0
        print("\n--- histogram by callsite (count, total s) ---")
        for jname, (cnt, tot) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
            print(f"{cnt:4d}x  {tot:8.3f}s  {jname}")


if __name__ == "__main__":
    main()
