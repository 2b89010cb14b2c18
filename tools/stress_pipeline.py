"""Empirical scale validation for the LLM-pipeline headline family
(VERDICT r08 #5): measure wall-time-vs-rows curves instead of only
arguing the plan shapes.

The corpus is the sf documents/embeddings fixture concatenated k times
with REMAPPED ids and PER-COPY-PERTURBED content (every token gets a
copy suffix; embeddings get a per-copy affine nudge), so copy i is
neither an exact nor a near duplicate of copy j — the workload is k
independent shards of the same distribution, i.e. linear by
construction. Whether the RUNTIME stays linear is what this measures:
the log-log slope across the scale ladder is fitted per op and anything
super-linear (slope > the flag threshold, default 1.35 — generous
because single-run local timings are noisy and every op carries a
fixed per-job scheduling floor that makes small scales look cheap) is
flagged loudly and in the JSON.

Ops covered (the VERDICT list):
  dedup_minhash_xxhash64   - banded MinHash near-dup end-to-end
  remove_repeated_spans    - one-shot ExactSubstr-style span removal
  text_index_append        - BM25 serving-index ingest (batch-only work)
  text_index_query         - bucket-pruned BM25 serving read
  text_index_compact       - MVCC generation publish (fold + df rebuild
                             + stats recompute + atomic pointer flip);
                             works over seed + batch, so the recorded
                             batch-rows slope is conservative (a fixed
                             seed offset only flattens it)
  ivf_index_append         - ANN serving-index ingest (map-only assign)
  ivf_index_query          - probe-pruned ANN serving read
  ivf_index_compact        - MVCC generation publish for the lists
  prepared_serving_sink    - the whole gate->dedup->store->serve batch

Usage:
  python tools/stress_pipeline.py [sf_dir] [scales] [out_json]
  python tools/stress_pipeline.py /root/testdata/sf0.1 1,2,4 BENCH_scale.json

Writes one JSON object (also printed): per op, the row counts, seconds,
fitted slope, and a superlinear flag.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

FLAG_SLOPE = 1.35


def scaled_docs(spark, sf_dir: str, k: int):
    """k near-independent copies of the documents fixture: ids remapped
    by a copy offset, every token suffixed with the copy index (kills
    cross-copy shingle/gram/term overlap while keeping each copy's
    internal statistics — including its planted repeats — intact)."""
    from pyspark.sql import functions as F

    from geoscan_fraud_spark.sources.io import load_fixture

    base = load_fixture(spark, sf_dir, "documents").select("doc_id", "text")
    parts = []
    for i in range(k):
        tagged = F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda w: F.concat(w, F.lit(f"~{i}")),
            ),
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                tagged.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scaled_emb(spark, sf_dir: str, k: int):
    from pyspark.sql import functions as F

    from geoscan_fraud_spark.sources.io import load_fixture

    base = load_fixture(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    parts = []
    for i in range(k):
        nudged = F.transform(
            F.col("embedding"),
            lambda x: x * F.lit(1.0 + 0.003 * i) + F.lit(0.01 * i),
        )
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                nudged.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def fit_slope(rows: list[int], secs: list[float]) -> float:
    """Least-squares slope of log(sec) vs log(rows). Requires >= 2
    distinct row counts — a slope over one point is undefined."""
    xs = [math.log(r) for r in rows]
    ys = [math.log(max(s, 1e-6)) for s in secs]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        raise ValueError(
            f"cannot fit a scaling slope over {sorted(set(rows))} — the "
            f"ladder needs at least two distinct scales"
        )
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scales = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1, 2, 4]
    )
    if len(set(scales)) < 2:
        # fail BEFORE minutes of measurement, not after (the slope fit
        # needs two distinct rungs)
        raise SystemExit(
            f"scale ladder {scales} has fewer than two distinct rungs — "
            f"pass e.g. 1,2,4"
        )
    out_json = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql import functions as F

    from geoscan_fraud_spark import get_spark
    from geoscan_fraud_spark.operators import dedup as dd
    from geoscan_fraud_spark.operators.retrieval import (
        text_index_append,
        text_index_compact,
        text_index_query,
        text_index_write,
    )
    from geoscan_fraud_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_compact,
        ivf_index_query,
        ivf_index_write,
    )
    from geoscan_fraud_spark.operators.spans import remove_repeated_spans
    from geoscan_fraud_spark.sources.io import load_fixture
    from geoscan_fraud_spark.streaming.scoring import prepared_serving_sink

    spark = get_spark(app_name="pipeline-stress")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM / parquet footers so scale-1 isn't paying cold costs
    load_fixture(spark, sf_dir, "documents").count()
    load_fixture(spark, sf_dir, "embeddings").count()

    results: dict[str, dict] = {}

    warmup = False

    def record(op: str, rows: int, sec: float):
        if warmup:
            print(f"  {op}: warm-up {sec:.2f}s (discarded)", flush=True)
            return
        r = results.setdefault(op, {"rows": [], "secs": []})
        r["rows"].append(rows)
        r["secs"].append(round(sec, 3))
        print(f"  {op}: {rows:,} rows -> {sec:.2f}s", flush=True)

    work = tempfile.mkdtemp(prefix="stress_pipeline_")
    try:
        # seed relations for the index paths: scale-1 content with ids
        # disjoint from every scaled batch (negative range)
        seed_docs = load_fixture(spark, sf_dir, "documents").select(
            (F.col("doc_id") - 50_000_000).alias("doc_id"), "text"
        )
        seed_emb = load_fixture(spark, sf_dir, "embeddings").select(
            (F.col("vec_id") - 50_000_000).alias("vec_id"), "embedding"
        )
        queries = [
            ("q1", "spark~0 join~0 window~0"),
            ("q2", "hash~0 merge~0 batch~0"),
            ("q3", "vector~1 stream~1 scan~1"),
            ("q4", "customer~0 table~0 value~0"),
            ("q5", "filter~1 sort~1 group~1"),
        ]

        # discarded warm-up ladder rung: the first execution of each op
        # pays JVM JIT + codegen + shuffle-service spin-up; without this
        # the smallest scale looks artificially slow and the fitted
        # slope is biased DOWN (a sub-linear mirage). Same pattern as
        # bench.py's discarded warm-up serial pass.
        for k in [None] + list(scales):
            warmup = k is None
            if warmup:
                k = scales[0]
                print(f"warm-up x{k} (discarded):", flush=True)
            else:
                print(f"scale x{k}:", flush=True)
            tag = "warm" if warmup else str(k)
            docs = scaled_docs(spark, sf_dir, k).persist()
            n_docs = docs.count()
            emb = scaled_emb(spark, sf_dir, k).persist()
            n_emb = emb.count()

            record(
                "dedup_minhash_xxhash64",
                n_docs,
                timed(
                    lambda: dd.minhash_dedup(
                        docs, threshold=0.5, n=3, num_hashes=48, bands=12
                    ).count()
                ),
            )
            record(
                "remove_repeated_spans",
                n_docs,
                timed(
                    lambda: remove_repeated_spans(docs, min_len=10)
                    .agg(F.sum("removed_tokens"))
                    .first()
                ),
            )

            tidx = f"{work}/text_idx_x{tag}"
            text_index_write(seed_docs, tidx, n_buckets=32)
            record(
                "text_index_append",
                n_docs,
                timed(lambda: text_index_append(docs, tidx)),
            )
            record(
                "text_index_query",
                n_docs,
                timed(
                    lambda: text_index_query(spark, tidx, queries, k=10).count()
                ),
            )
            record(
                "text_index_compact",
                n_docs,
                timed(lambda: text_index_compact(spark, tidx)),
            )

            aidx = f"{work}/ivf_idx_x{tag}"
            ivf_index_write(seed_emb, aidx, n_centroids=16, seed=42)
            record(
                "ivf_index_append",
                n_emb,
                timed(lambda: ivf_index_append(emb, aidx)),
            )
            record(
                "ivf_index_compact",
                n_emb,
                timed(lambda: ivf_index_compact(spark, aidx)),
            )
            qset = emb.limit(50)
            record(
                "ivf_index_query",
                n_emb,
                timed(
                    lambda: ivf_index_query(qset, aidx, k=10, nprobe=4).count()
                ),
            )

            sidx = f"{work}/serve_x{tag}"
            text_index_write(seed_docs, f"{sidx}/bm25", n_buckets=32)
            sink = prepared_serving_sink(
                f"{sidx}/store",
                f"{sidx}/out",
                text_index_path=f"{sidx}/bm25",
            )
            record(
                "prepared_serving_sink",
                n_docs,
                timed(lambda: sink(docs, 0)),
            )

            docs.unpersist()
            emb.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    flagged = []
    for op, r in results.items():
        slope = fit_slope(r["rows"], r["secs"])
        r["slope"] = round(slope, 3)
        r["superlinear"] = slope > FLAG_SLOPE
        if r["superlinear"]:
            flagged.append(op)

    payload = {
        "sf_dir": sf_dir,
        "scales": scales,
        "flag_slope": FLAG_SLOPE,
        "flagged": flagged,
        "ops": results,
    }
    line = json.dumps(payload)
    print(line)
    if out_json:
        with open(out_json, "w") as f:
            f.write(line + "\n")
    if flagged:
        print(f"SUPER-LINEAR: {flagged}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
