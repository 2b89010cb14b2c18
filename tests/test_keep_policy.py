"""minhash_dedup representative policy (keep=min_id/longest/score)."""
import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.dedup import minhash_dedup


def _corpus(spark):
    base = " ".join(f"w{i}" for i in range(30))
    longer = base + " extra tail words here"
    other = " ".join(f"z{i}" for i in range(25))
    rows = [
        (1, base, 0.2),
        (2, longer, 0.9),   # near-dup of 1, longer and higher-scored
        (3, other, 0.5),    # distinct
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, q double")


def test_keep_min_id_default(spark):
    kept = sorted(
        r["doc_id"]
        for r in minhash_dedup(_corpus(spark), threshold=0.5).collect()
    )
    assert kept == [1, 3]


@pytest.mark.parametrize("precollapse", [True, False])
def test_keep_longest(spark, precollapse):
    kept = sorted(
        r["doc_id"]
        for r in minhash_dedup(
            _corpus(spark),
            threshold=0.5,
            keep="longest",
            precollapse_exact=precollapse,
        ).collect()
    )
    assert kept == [2, 3]  # the longer near-dup wins its cluster


def test_keep_score(spark):
    kept = sorted(
        r["doc_id"]
        for r in minhash_dedup(
            _corpus(spark), threshold=0.5, keep="score", keep_score_col="q"
        ).collect()
    )
    assert kept == [2, 3]  # q=0.9 beats q=0.2


def test_keep_score_requires_col(spark):
    with pytest.raises(ValueError, match="keep_score_col"):
        minhash_dedup(_corpus(spark), threshold=0.5, keep="score").collect()


def test_keep_longest_with_exact_copies(spark):
    """Exact copies pre-collapse to min id; the policy then arbitrates
    between distinct texts — the copy group is represented either way."""
    base = " ".join(f"w{i}" for i in range(30))
    longer = base + " extra tail words"
    rows = [
        (1, base), (2, base),          # exact copies
        (3, longer),                   # longer near-dup
        (4, "unrelated " * 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in minhash_dedup(df, threshold=0.5, keep="longest").collect()
    )
    assert kept == [3, 4]


def test_semantic_dedup_keep_score(spark):
    """semantic_dedup keep='score': the higher-scored member of a
    semantic cluster survives instead of the min id."""
    from geoscan_fraud_spark.operators.similarity import semantic_dedup

    import numpy as np

    rng = np.random.RandomState(5)
    v = [float(x) for x in rng.randn(8)]
    near = [x * 1.000001 for x in v]
    other = [float(x) for x in rng.randn(8)]
    df = spark.createDataFrame(
        [(1, v, 0.1), (2, near, 0.9), (3, other, 0.5)],
        "vec_id long, embedding array<double>, q double",
    )
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            df, threshold=0.98, n_clusters=2, keep="score", keep_score_col="q"
        ).collect()
    )
    assert kept == [2, 3]
    with pytest.raises(ValueError, match="longest"):
        semantic_dedup(df, keep="longest")


def test_pipeline_dedup_keep_passthrough(spark):
    from geoscan_fraud_spark.operators.pipelines import prepare_training_corpus

    base = " ".join(f"w{i}" for i in range(30))
    longer = base + " extra tail words here"
    other = " ".join(f"z{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(1, base), (2, longer), (3, other)], "doc_id long, text string"
    )
    out = prepare_training_corpus(docs, dedup_threshold=0.5, dedup_keep="longest")
    kept = sorted(r["doc_id"] for r in out["corpus"].collect())
    assert kept == [2, 3]


def test_merge_weighted_samples_equals_global(spark):
    """Per-batch top-k samples (keys kept) merge into EXACTLY the global
    sample — the mergeable-sketch property for A-ES sampling."""
    from geoscan_fraud_spark.operators.sampling import (
        merge_weighted_samples,
        weighted_sample,
    )

    rows = [(i, 0.5 + (i * 41 % 89) / 7.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    direct = sorted(r["doc_id"] for r in weighted_sample(df, "w", 30).collect())
    batches = [
        weighted_sample(
            df.filter(F.col("doc_id") % 3 == b), "w", 30, keep_key=True
        )
        for b in range(3)
    ]
    merged = sorted(
        r["doc_id"] for r in merge_weighted_samples(batches, 30).collect()
    )
    assert merged == direct
    assert "__aes_key" not in merge_weighted_samples(batches, 30).columns


def test_keep_ties_break_by_min_id(spark):
    a = " ".join(f"w{i}" for i in range(30))
    b = a.replace("w29", "v29")  # same length, near-dup
    df = spark.createDataFrame(
        [(5, a), (9, b)], "doc_id long, text string"
    )
    kept = [
        r["doc_id"]
        for r in minhash_dedup(df, threshold=0.5, keep="longest").collect()
    ]
    assert kept == [5]


def test_countmin_profile_bounds_and_merge(spark):
    """Count-min estimates are never under the true count, over by at
    most the standard bound, and per-batch sketches merge into exactly
    the global sketch."""
    from geoscan_fraud_spark.operators.profiling import (
        countmin_estimate,
        countmin_profile,
        merge_countmin,
    )

    import random

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(200)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(200)
    ]
    # plant a heavy hitter
    rows += [(1000 + i, "heavy heavy heavy common") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    truth = {}
    for _, t in rows:
        for w in t.split():
            truth[w] = truth.get(w, 0) + 1
    n_total = sum(truth.values())

    sk = countmin_profile(df, width=2048)
    probe = ["heavy", "common", "tok0", "tok199", "absent_token"]
    est = {r["token"]: r["est"] for r in countmin_estimate(sk, probe, width=2048).collect()}
    for t in probe:
        true = truth.get(t, 0)
        assert est[t] >= true, t                      # never under
        assert est[t] <= true + 4 * n_total / 2048, t  # loose CM bound

    halves = [
        countmin_profile(df.filter(F.col("doc_id") % 2 == b), width=2048)
        for b in (0, 1)
    ]
    merged = {
        (r["row"], r["col"]): r["c"] for r in merge_countmin(halves).collect()
    }
    direct = {(r["row"], r["col"]): r["c"] for r in sk.collect()}
    assert merged == direct


def test_bpe_ids_round_trip_to_text(spark):
    """text -> segment -> ids -> ids_to_text reconstructs the
    (lowercased, space-normalized) input exactly; UNK ids decode to the
    unk token."""
    from geoscan_fraud_spark.operators.bpe import (
        bpe_segment,
        build_vocab,
        ids_to_text,
        tokens_to_ids,
        train_bpe,
        word_counts,
    )

    docs = spark.createDataFrame(
        [
            (0, "Low lower lowest  tide"),
            (1, "the wide river runs wider"),
        ],
        "doc_id long, text string",
    )
    merges = train_bpe(word_counts(docs), num_merges=15)
    seg = bpe_segment(docs, merges)
    vocab = build_vocab(seg)
    ids = tokens_to_ids(seg, vocab)
    back = {r["doc_id"]: r["text"] for r in ids_to_text(ids, vocab).collect()}
    assert back[0] == "low lower lowest tide"
    assert back[1] == "the wide river runs wider"

    # an UNK id decodes visibly
    mangled = ids.withColumn(
        "token_ids", F.concat(F.col("token_ids"), F.array(F.lit(0)))
    )
    out = {r["doc_id"]: r["text"] for r in ids_to_text(mangled, vocab).collect()}
    assert out[0].endswith("<unk>")
