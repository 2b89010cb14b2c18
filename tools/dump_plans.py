"""Dump .explain('formatted') for declared queries to a directory.

Usage:
    python tools/dump_plans.py OUTDIR [sf_dir] [name ...]

Writes OUTDIR/<name>.txt for each declared query (default: all 50).
Used to produce the plans/r12/<query>_before.txt / _after.txt artifacts:
run once from a worktree at the round-start commit (before) and once at
HEAD (after), then rename accordingly.

Lifecycle/composite entries build their persisted fixtures as a side
effect of constructing the returned DataFrame; the dump therefore runs
real Spark jobs for those entries, but the captured text is the final
served query's plan — the recurring cost at scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from geoscan_fraud_spark import get_spark
    import geoscan_fraud_spark.harness_geo  # noqa: F401
    import geoscan_fraud_spark.harness_ext  # noqa: F401
    import geoscan_fraud_spark.harness_pipeline  # noqa: F401
    from geoscan_fraud_spark.harness import QUERIES

    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    targets = names or sorted(QUERIES)
    for name in targets:
        fn = QUERIES.get(name)
        if fn is None:
            # benched-but-unregistered entries live in harness modules
            import geoscan_fraud_spark.harness as h
            import geoscan_fraud_spark.harness_pipeline as hp

            fn = getattr(h, name, None) or getattr(hp, name, None)
        if fn is None:
            print(f"SKIP {name}: not found", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"plan-dump: {name}")
        try:
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # keep going; record the failure
            plan = f"ERROR building {name}: {exc!r}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}")


if __name__ == "__main__":
    main()
