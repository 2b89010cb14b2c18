"""Per-job anatomy of the streaming ingest/serve entries (guide §1).

Runs ONE fresh cycle of the benched streaming entry (ingest by default,
pass `serve` for the prepared_stream_query shape) and prints every Spark
job the cycle submitted: id, callsite name, duration, task count. The
job-count floor — not data volume — dominates these entries at fixture
scale, so the histogram of callsites is the optimization map: each
distinct callsite is an eager action inside the per-batch machinery.

Usage: python tools/profile_stream_jobs.py [ingest|serve] [sf_dir]
"""

from __future__ import annotations

import collections
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "ingest"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from geoscan_fraud_spark import get_spark
    from geoscan_fraud_spark.operators.text import fit_unigram_lm
    from geoscan_fraud_spark.sources.io import load_fixture
    from geoscan_fraud_spark.streaming.scoring import (
        prepared_ingest_sink,
        prepared_serving_sink,
    )

    spark = get_spark(app_name="stream-job-profile")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_fixture(spark, sf_dir, "documents").select("doc_id", "text")
    src = tempfile.mkdtemp(prefix="profile_src_")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/half=0")
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/half=1")
    schema = docs.schema
    lm, oov = fit_unigram_lm(docs)
    lm = lm.localCheckpoint(eager=True)

    work = tempfile.mkdtemp(prefix="profile_work_")
    if mode == "serve":
        # seed the empty text index exactly like the registered entry does
        # (prepared_stream_query in harness_pipeline.py): the sink's
        # per-batch text_index_append expects an existing generation root
        from geoscan_fraud_spark.operators.retrieval import text_index_write

        text_index_write(docs.limit(0), f"{work}/tidx", n_buckets=32)
        sink = prepared_serving_sink(
            f"{work}/idx",
            f"{work}/out",
            text_index_path=f"{work}/tidx",
            num_hashes=48,
            bands=12,
            threshold=0.5,
            normalize_signatures=True,
            lm=lm,
            oov_logp=oov,
            max_nll=12.0,
        )
    else:
        sink = prepared_ingest_sink(
            f"{work}/idx",
            f"{work}/out",
            num_hashes=48,
            bands=12,
            threshold=0.5,
            normalize_signatures=True,
            lm=lm,
            oov_logp=oov,
            max_nll=12.0,
        )

    jsc = spark.sparkContext._jsc.sc()
    jsc.listenerBus().waitUntilEmpty()
    store = jsc.statusStore()
    jl = store.jobsList(None)
    first_job = jl.apply(0).jobId() + 1 if jl.size() > 0 else 0

    import time

    t0 = time.perf_counter()
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/half=*")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    wall = time.perf_counter() - t0

    jsc.listenerBus().waitUntilEmpty()
    jl = store.jobsList(None)
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
        rows.append((j.jobId(), j.name(), dur, j.numTasks()))
    rows.sort()
    print(f"\n=== {mode}: {len(rows)} jobs, wall {wall:.2f}s ===")
    agg: dict[str, list[float]] = collections.defaultdict(lambda: [0, 0.0])
    for jid, name, dur, ntasks in rows:
        short = name.split("\n")[0][:100]
        print(f"{jid:5d}  {dur if dur is not None else -1:7.3f}s  {ntasks:4d}t  {short}")
        a = agg[short]
        a[0] += 1
        a[1] += dur or 0.0
    print("\n--- histogram by callsite ---")
    for name, (cnt, tot) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"{cnt:4d}x  {tot:8.3f}s  {name}")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
