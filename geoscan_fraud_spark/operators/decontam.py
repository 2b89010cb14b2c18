"""Train/test decontamination — remove corpus documents that overlap a
held-out benchmark set by shared word n-grams (the standard LLM
training-data hygiene step; n-gram collision against eval sets is the
canonical published recipe).

100 TB shape: the benchmark side is SMALL (eval suites are thousands of
documents, not billions) — its distinct gram-hash set is broadcast, so
the corpus-side probe is a map-only LEFT SEMI against a broadcast hash
relation: no shuffle touches the 100 TB side until hits are aggregated,
and that aggregation carries only (doc_id, gram_hash) pairs that actually
matched — in a clean corpus, almost nothing. Grams travel as xxhash64
longs, never strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.dedup import word_shingles


def _gram_hashes(df: DataFrame, text_col: str, n: int):
    """Distinct word-n-gram xxhash64 longs per row, as array<bigint>."""
    return F.transform(word_shingles(F.col(text_col), n), lambda g: F.xxhash64(g))


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_hits): distinct benchmark n-grams each corpus doc shares.

    Docs with zero hits are absent — at scale the result is tiny (hits
    are the exception). The benchmark grams relation is deduped then
    broadcast; the probe is a broadcast LEFT SEMI per exploded gram.
    """
    bench_grams = (
        benchmark.select(F.explode(_gram_hashes(benchmark, text_col, n)).alias("gram"))
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(_gram_hashes(corpus, text_col, n)).alias("gram")
    )
    hits = corpus_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
    return hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus minus documents sharing >= ``min_hits`` distinct word
    n-grams with the benchmark — via anti-join on `contamination_hits`,
    so clean documents stream through untouched (no row of the clean
    corpus is ever shuffled; the anti-join's build side is the tiny hit
    list)."""
    flagged = (
        contamination_hits(corpus, benchmark, n, text_col, id_col)
        .filter(F.col("n_hits") >= min_hits)
        .select(id_col)
    )
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")
