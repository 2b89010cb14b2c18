"""Print plan summaries for the headline queries — the scale audit.

Usage: python tools/audit_plans.py [sf_dir] [query ...]
Add -v to dump the full formatted plan of each query.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from geoscan_fraud_spark.plans.audit import formatted_plan, plan_summary, scan_read_schemas


def main():
    args = [a for a in sys.argv[1:] if a != "-v"]
    verbose = "-v" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e
    from geoscan_fraud_spark import get_spark

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        if name.startswith("geoscan_"):  # model fits execute eagerly; skip
            continue
        df = fn(spark, sf_dir)
        s = plan_summary(df)
        flags = []
        if s["sortmerge_joins"]:
            flags.append(f"SMJ x{s['sortmerge_joins']}")
        if s["python_eval"]:
            flags.append(f"py x{s['python_eval']}")
        wide_scans = [sch for sch in scan_read_schemas(df) if sch.count(",") >= 6]
        if wide_scans:
            flags.append(f"wide-scan x{len(wide_scans)}")
        print(
            f"{name:28s} bc={s['broadcast_joins']} smj={s['sortmerge_joins']} "
            f"xchg={s['shuffles']} sorts={s['row_sorts']} "
            f"py={s['python_eval']} pushed={s['pushed_filters']}"
            + ("   <== " + ", ".join(flags) if flags else "")
        )
        if verbose:
            print(formatted_plan(df))


if __name__ == "__main__":
    main()
