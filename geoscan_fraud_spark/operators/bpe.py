"""Distributed BPE tokenizer training — learn a byte-pair-encoding merge
list from a corpus, then segment/count tokens with it.

Beyond-reference operator (SURVEY §2.10 "training-batch assembly"
family): the engine's token counting so far used a fixed BPE-ish regex
(`operators/text.py::TOKEN_PATTERN`); this module learns the merges from
the corpus itself (Sennrich et al. 2016), the way real LLM tokenizers
are built.

Scale shape — the key observation is that BPE training never needs the
corpus after one aggregation:

1. `word_counts` — ONE corpus-sized shuffle (explode + groupBy word).
   Everything after operates on the weighted DISTINCT-WORD relation,
   which is bounded by vocabulary (10^7-10^8 rows for web corpora), not
   corpus size.
2. `train_bpe` — each merge round is: adjacent-pair count over the word
   relation (one small shuffle; partial aggregation collapses map-side),
   take the argmax (driver-side single row — the same eager-scalar
   pattern as the tf-idf N), apply the merge to every word's symbol
   array with a native `F.aggregate` left fold (map-only, codegen'd —
   no Python in the loop). The symbol state is localCheckpoint-ed per
   round, exactly like `connected_components`, so the plan does not
   grow with the merge count.
3. `bpe_segment` — scoring is the one place Python runs: a classic
   rank-priority BPE encoder inside `mapInPandas` (Arrow-batched, with
   a per-batch word cache so repeated words encode once). Map-only; the
   corpus never shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: end-of-word marker (a multi-char string no single char can equal)
END = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, weight): whitespace-token frequencies — the ONE corpus-sized
    aggregation BPE training needs; all merge rounds run on its output."""
    w = F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    out = df.select(w).filter(F.col("word") != "")
    if lowercase:
        out = out.select(F.lower(F.col("word")).alias("word"))
    return out.groupBy("word").agg(F.count(F.lit(1)).alias("weight"))


def _initial_symbols(word_col):
    """word -> [c1, c2, ..., cn, END]."""
    chars = F.filter(F.split(word_col, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(END)))


def _adjacent_pairs(syms_col):
    """array<struct<a,b>> of adjacent symbol pairs (empty for size<2)."""
    n = F.size(syms_col)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                syms_col[i].alias("a"), syms_col[i + 1].alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _apply_merge(syms_col, a: str, b: str):
    """Left-to-right greedy merge of adjacent (a, b) -> a||b, as a native
    left fold: acc = (out, prev) where prev buffers the last unemitted
    symbol ('' = none; real symbols are never empty). 'aaa' under (a,a)
    becomes [aa, a] — leftmost-first, the classic BPE apply order."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit("").alias("prev")
    )

    def step(acc, s):
        hit = (acc["prev"] == F.lit(a)) & (s == F.lit(b))
        out = F.when(
            hit, F.concat(acc["out"], F.array(F.lit(a + b)))
        ).otherwise(
            F.when(
                acc["prev"] != "", F.concat(acc["out"], F.array(acc["prev"]))
            ).otherwise(acc["out"])
        )
        prev = F.when(hit, F.lit("")).otherwise(s)
        return F.struct(out.alias("out"), prev.alias("prev"))

    def finish(acc):
        return F.when(
            acc["prev"] != "", F.concat(acc["out"], F.array(acc["prev"]))
        ).otherwise(acc["out"])

    return F.aggregate(syms_col, init, step, finish)


def train_bpe(
    words: DataFrame,
    num_merges: int = 100,
    min_freq: int = 2,
    word_col: str = "word",
    weight_col: str = "weight",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a (word, weight) relation
    (from `word_counts`). Returns the ordered merge list.

    Deterministic: the best pair each round is (max summed weight, then
    lexicographic (a, b)). Stops early when no pair reaches ``min_freq``.
    Eager by nature (each round's argmax gates the next); every round is
    one vocabulary-sized pair-count shuffle + one map-only fold, with the
    symbol state checkpointed so lineage stays flat across hundreds of
    rounds."""
    state = words.select(
        _initial_symbols(F.col(word_col)).alias("syms"),
        F.col(weight_col).cast("long").alias("w"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = (
            state.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "w")
            .groupBy("p.a", "p.b")
            .agg(F.sum("w").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .first()
        )
        if best is None or best["cnt"] < min_freq:
            break
        a, b = best["a"], best["b"]
        merges.append((a, b))
        state = state.select(
            _apply_merge(F.col("syms"), a, b).alias("syms"), "w"
        ).localCheckpoint(eager=True)
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int], end: bool = True
) -> list[str]:
    """Classic rank-priority BPE encode: repeatedly merge the lowest-rank
    adjacent pair, applying each left-to-right (matches `_apply_merge`'s
    training order, so encoding a training word reproduces its final
    training segmentation). ``end=False`` omits the END marker — used
    for the non-final chunks of an over-length word."""
    syms = list(word) + ([END] if end else [])
    while len(syms) > 1:
        best_rank, a, b = None, None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, a, b = r, syms[i], syms[i + 1]
        if best_rank is None:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    max_word_chars: int = 256,
) -> DataFrame:
    """(id, tokens array<string>, n_tokens): segment each document with a
    learned merge list. Arrow-batched `mapInPandas` (the tokenizer-apply
    step is the legitimate Python hot path — a rank-dict lookup loop no
    column algebra expresses); per-batch word cache so each distinct word
    in a batch encodes once. Map-only: zero shuffles.

    ``max_word_chars``: the encoder is O(len^2) per word in the worst
    case, and a web corpus WILL contain megabyte "words" (base64 blobs,
    minified JS) that would pin an executor core for hours — longer words
    are pre-split into ``max_word_chars`` chunks, each encoded
    independently (the same guard production tokenizers apply via their
    pre-tokenization regex). Words at or under the cap — all natural
    language — are unaffected."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            toks: list[str] = []
            for w in text.split():
                if lowercase:
                    w = w.lower()
                got = cache.get(w)
                if got is None:
                    if len(w) > max_word_chars:
                        starts = range(0, len(w), max_word_chars)
                        last = len(w) - (len(w) - 1) % max_word_chars - 1
                        got = [
                            s
                            for i in starts
                            for s in _encode_word(
                                w[i : i + max_word_chars], ranks, end=(i == last)
                            )
                        ]
                    else:
                        got = _encode_word(w, ranks)
                    cache[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": toks.map(len),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


#: reserved id for out-of-vocabulary tokens in `tokens_to_ids`
UNK_ID = 0


def build_vocab(segmented: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """(token, token_id) from a `bpe_segment` output: ids are dense ints
    starting at 1 (0 is reserved for UNK), assigned by descending corpus
    frequency with the token string as tiebreaker — deterministic across
    runs and partitionings.

    The explode + count is the same two-phase aggregate as
    `word_counts`; the id assignment is one window over the
    vocabulary-sized count table (a single-partition sort of the VOCAB,
    not the corpus — acceptable because a token vocabulary is bounded;
    the corpus never enters the window)."""
    counts = (
        segmented.select(F.explode(F.col(tokens_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return counts.select(
        "token", F.row_number().over(w).alias("token_id")
    )


def tokens_to_ids(
    segmented: DataFrame,
    vocab: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, token_ids array<int>): map each document's token sequence to
    vocabulary ids, order-preserving; tokens absent from ``vocab`` get
    ``UNK_ID`` (0).

    The text -> ids tail of the tokenizer pipeline (whose output feeds
    `pack_documents` budgets and model training). Plan: posexplode ->
    BROADCAST vocab join (vocabulary-sized right side; the corpus never
    shuffles for it) -> one groupBy(id) reassembling the sequence via
    sorted (pos, id) structs — a single corpus shuffle, same shape as
    `perplexity_score`."""
    tok = segmented.select(
        F.col(id_col), F.posexplode(F.col(tokens_col)).alias("pos", "token")
    )
    mapped = tok.join(F.broadcast(vocab), "token", "left_outer").select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(UNK_ID)).alias("tid"),
    )
    return (
        mapped.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"],
            ).alias("token_ids")
        )
    )


def ids_to_text(
    encoded: DataFrame,
    vocab: DataFrame,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    unk_token: str = "<unk>",
) -> DataFrame:
    """(id, text): decode `tokens_to_ids` output back to text — the
    inverse tail of the tokenizer pipeline (inspect a packed batch,
    audit what a model actually trains on).

    BPE symbols concatenate back losslessly because the END marker
    (``</w>``) survives inside the tokens: joining every symbol and
    replacing the marker with a space reconstructs the word sequence
    exactly (up to `bpe_segment`'s own lowercase/whitespace
    normalization — pinned by the round-trip test). ``UNK_ID`` decodes
    as ``unk_token``. Same plan shape as `tokens_to_ids`: posexplode ->
    broadcast vocab join -> one per-doc reassembly shuffle."""
    tok = encoded.select(
        F.col(id_col), F.posexplode(F.col(ids_col)).alias("pos", "token_id")
    )
    mapped = tok.join(F.broadcast(vocab), "token_id", "left_outer").select(
        id_col,
        "pos",
        F.coalesce(F.col("token"), F.lit(unk_token)).alias("tok"),
    )
    return mapped.groupBy(id_col).agg(
        F.trim(
            F.regexp_replace(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                ),
                F.lit("\\Q" + END + "\\E"),
                F.lit(" "),
            )
        ).alias("text")
    )
