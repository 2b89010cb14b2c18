"""Min-of-N noop-forced timings for selected bench entries (guide §1).

A faster loop than the full bench for optimization iterations: same
forcing (noop sink), same per-query-minimum methodology, but only the
named entries. Accepts registered entry names plus the bench-only extras
defined in bench.py (resolved via its module-level construction).

Usage: python tools/time_entries.py ENTRY [ENTRY...] [--runs N] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 4
    sf_dir = "/root/testdata/sf0.1"
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    from geoscan_fraud_spark import get_spark
    import geoscan_fraud_spark.harness_geo  # noqa: F401
    import geoscan_fraud_spark.harness_ext  # noqa: F401
    import geoscan_fraud_spark.harness_pipeline  # noqa: F401
    from geoscan_fraud_spark.harness import QUERIES

    spark = get_spark(app_name="time-entries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    import geoscan_fraud_spark.harness as h
    import geoscan_fraud_spark.harness_pipeline as hp

    def resolve(name):
        fn = QUERIES.get(name)
        if fn is None:
            fn = getattr(h, name, None) or getattr(hp, name, None)
        if fn is None:
            raise SystemExit(f"unknown entry {name!r}")
        return fn

    fns = {n: resolve(n) for n in names}
    mins: dict[str, float] = {}
    for r in range(runs + 1):
        for n, fn in fns.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if r > 0:  # first pass is the discarded warm-up
                mins[n] = min(mins.get(n, dt), dt)
    for n in names:
        print(f"{n:40s} {mins[n]:8.3f}")


if __name__ == "__main__":
    main()
