"""Distributed BPE training/segmentation + text normalization."""

import collections

import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.bpe import (
    END,
    bpe_segment,
    train_bpe,
    word_counts,
)
from geoscan_fraud_spark.operators.text import normalize_text
from geoscan_fraud_spark.sources.io import load_fixture


# ---------------------------------------------------------------------------
# python reference implementation (Sennrich et al. 2016, verbatim recipe)
# ---------------------------------------------------------------------------


def _ref_train(word_weights, num_merges, min_freq=2):
    vocab = {
        tuple(list(w) + [END]): c for w, c in word_weights.items()
    }
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, ties broken lexicographically — mirrors train_bpe
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_train_matches_python_reference_exactly(spark):
    corpus = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider new new",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"])
    wc = word_counts(df)
    got = train_bpe(wc, num_merges=12)
    weights = {r["word"]: r["weight"] for r in wc.collect()}
    expect = _ref_train(weights, 12)
    assert got == expect
    assert len(got) >= 8  # the corpus supports a real merge sequence


def test_overlapping_pair_merges_leftmost_first(spark):
    df = spark.createDataFrame([(0, "aaa aaa aaa")], ["doc_id", "text"])
    merges = train_bpe(word_counts(df), num_merges=2, min_freq=2)
    # round 1 merges (a,a); leftmost-first gives 'aaa' -> [aa, a, </w>],
    # whose pairs {(aa,a), (a,</w>)} tie at 3 and the lexicographic
    # tiebreak picks (a,</w>). A rightmost apply would instead yield
    # [a, aa, </w>] and pick (a,aa) — so this pins the apply order.
    assert merges[0] == ("a", "a")
    assert merges[1] == ("a", END)


def test_segment_reproduces_training_state(spark):
    corpus = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider new new",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"])
    wc = word_counts(df)
    merges = train_bpe(wc, num_merges=10)

    # final training segmentation via the python reference
    weights = {r["word"]: r["weight"] for r in wc.collect()}
    vocab = {w: list(w) + [END] for w in weights}
    for a, b in merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out

    seg = bpe_segment(df, merges)
    for row in seg.collect():
        text = corpus[row["doc_id"]]
        expect = [s for w in text.split() for s in vocab[w]]
        assert row["tokens"] == expect
        assert row["n_tokens"] == len(expect)


def test_segment_roundtrips_words(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents").limit(20)
    wc = word_counts(docs)
    merges = train_bpe(wc, num_merges=30)
    out = bpe_segment(docs, merges).join(
        docs.select("doc_id", "text"), "doc_id"
    )
    for row in out.collect():
        rebuilt = "".join(row["tokens"]).replace(END, " ").strip()
        assert rebuilt == " ".join(row["text"].lower().split())


def test_segment_plan_is_map_only(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents")
    plan = (
        bpe_segment(docs, [("a", "b")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# normalize_text
# ---------------------------------------------------------------------------


def test_normalize_text_chain(spark):
    df = spark.createDataFrame(
        [(0, "  Héllo   Wörld\t42 "), (1, "Ça va TRÈS bien 123")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in normalize_text(
            df, strip_accents=True, mask_digits=True
        ).collect()
    }
    assert out[0] == "hello world 00"
    assert out[1] == "ca va tres bien 000"


def test_normalize_text_is_shuffle_free(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents")
    plan = (
        normalize_text(docs, strip_accents=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_normalize_then_dedup_collapses_case_variants(spark):
    df = spark.createDataFrame(
        [(0, "Foo  Bar"), (1, "foo bar"), (2, "other text")],
        ["doc_id", "text"],
    )
    from geoscan_fraud_spark.operators.dedup import exact_dedup

    kept = exact_dedup(normalize_text(df), ["text"]).select("doc_id")
    assert sorted(r[0] for r in kept.collect()) == [0, 2]


@pytest.mark.parametrize("seed", [11, 37, 91])
def test_train_matches_reference_on_random_corpus(spark, seed):
    import random

    rng = random.Random(seed)
    alphabet = "abcdefgh"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        for _ in range(30)
    ]
    docs = [
        " ".join(rng.choice(words) for _ in range(rng.randint(3, 15)))
        for _ in range(20)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    wc = word_counts(df)
    got = train_bpe(wc, num_merges=8)
    weights = {r["word"]: r["weight"] for r in wc.collect()}
    assert got == _ref_train(weights, 8)


# ---------------------------------------------------------------------------
# vocab + token ids
# ---------------------------------------------------------------------------


def test_vocab_ids_deterministic_and_dense(spark):
    from geoscan_fraud_spark.operators.bpe import build_vocab

    seg = spark.createDataFrame(
        [(0, ["b", "a", "a"]), (1, ["c", "a", "b"])],
        "doc_id long, tokens array<string>",
    )
    vocab = {r["token"]: r["token_id"] for r in build_vocab(seg).collect()}
    # freq desc, token asc: a(3)=1, b(2)=2, c(1)=3 — dense from 1, 0 free for UNK
    assert vocab == {"a": 1, "b": 2, "c": 3}


def test_tokens_to_ids_roundtrip_and_unk(spark, sf_dir):
    from geoscan_fraud_spark.operators.bpe import (
        UNK_ID,
        build_vocab,
        bpe_segment,
        tokens_to_ids,
        train_bpe,
        word_counts,
    )

    fixture = load_fixture(spark, sf_dir, "documents").limit(30)
    oov_doc = spark.createDataFrame(
        [(900_000, "zzqqxx zzqqxx")], "doc_id long, text string"
    )
    docs = fixture.select("doc_id", "text").unionByName(oov_doc)
    train_docs = fixture.filter(F.col("doc_id") % 5 != 0)
    merges = train_bpe(word_counts(train_docs), num_merges=15)
    seg = bpe_segment(docs, merges)
    vocab = build_vocab(bpe_segment(train_docs, merges))
    ids = tokens_to_ids(seg, vocab)

    v = {r["token"]: r["token_id"] for r in vocab.collect()}
    inv = {i: t for t, i in v.items()}
    seg_rows = {r["doc_id"]: r["tokens"] for r in seg.collect()}
    for row in ids.collect():
        toks = seg_rows[row["doc_id"]]
        assert len(row["token_ids"]) == len(toks)  # order-preserving, lossless length
        for tid, tok in zip(row["token_ids"], toks):
            if tid == UNK_ID:
                assert tok not in v  # only true OOV maps to UNK
            else:
                assert inv[tid] == tok
    # held-out docs genuinely exercise the UNK path on this fixture
    flat = [t for r in ids.collect() for t in r["token_ids"]]
    assert UNK_ID in flat


def test_tokens_to_ids_plan_broadcasts_vocab(spark, sf_dir):
    from geoscan_fraud_spark.operators.bpe import (
        build_vocab,
        bpe_segment,
        tokens_to_ids,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    seg = bpe_segment(docs, [("a", "b")])
    vocab = build_vocab(bpe_segment(docs.limit(10), [("a", "b")]))
    plan = (
        tokens_to_ids(seg, vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_segment_caps_pathological_words(spark):
    """A megabyte 'word' (base64 blob) must not pin a core: it is
    pre-split into max_word_chars chunks, and normal words still encode
    through the standard path."""
    import time

    from geoscan_fraud_spark.operators.bpe import bpe_segment

    blob = "ab" * 100_000  # 200k chars, highly mergeable
    df = spark.createDataFrame(
        [(0, f"hello {blob} world")], ["doc_id", "text"]
    )
    merges = [("a", "b"), ("ab", "ab")]
    t0 = time.perf_counter()
    row = bpe_segment(df, merges, max_word_chars=64).first()
    assert time.perf_counter() - t0 < 30
    toks = row["tokens"]
    # chunk boundaries add at most len/cap extra tokens; content survives
    rebuilt = "".join(toks).replace("</w>", " ").strip().split()
    assert rebuilt == ["hello", blob, "world"]
