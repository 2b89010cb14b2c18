"""End-to-end training-corpus preparation — the composition the
individual §2.10 operators exist for, packaged as one auditable call.

Stage order follows the standard large-corpus recipe (quality gates are
cheap and map-only, so they run FIRST and shrink everything after;
near-dup is the most expensive stage, so it sees only survivors;
decontamination runs after dedup so a benchmark hit removed once stays
removed; split assignment is map-only and last):

    0. (optional) signature normalization — every signal runs over a
       `normalize_text` shadow column; output text stays raw
    1. quality filter  (annotate_filter_reasons — keeps the audit trail;
       optionally + a unigram-LM perplexity gate trained on a trusted
       reference corpus)
    2. exact + near dedup (minhash_dedup, guard defaults on)
    3. benchmark decontamination (broadcast n-gram probe)
    4. (optional) ExactSubstr span removal — repeated token spans that
       survived DOC-level dedup (cross-page boilerplate) deleted in
       place, first occurrence kept; emptied docs drop
    5. deterministic train/val/test split (map-only salted hash)

Laziness: the returned DataFrames materialize when acted on, and the
stage report is itself a DataFrame (one count aggregate per stage,
unioned) so a caller pays for counting only if it asks. The only
build-time jobs are `minhash_dedup`'s lineage-cut checkpoints (shared
by every configuration); the optional LM gate fits in lazy mode
(`fit_unigram_lm(lazy=True)`) and adds zero build-time jobs — pinned
by a statusTracker test. At 100 TB each stage's scale story is its
operator's — this module adds no shuffle of its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.dedup import minhash_dedup
from geoscan_fraud_spark.operators.decontam import decontaminate
from geoscan_fraud_spark.operators.packing import assign_splits
from geoscan_fraud_spark.operators.text import (
    annotate_filter_reasons,
    fit_unigram_lm,
    normalize_text,
    perplexity_score,
    repetition_stats,
    token_stats,
)


def default_quality_rules(
    min_tokens: int = 8,
    max_tokens: int = 100_000,
    max_dup_3gram: float = 0.5,
    max_top_2gram: float = 0.3,
) -> dict:
    """The Gopher-flavored default gate: length band + repetition caps.
    Column names reference the `token_stats` + `repetition_stats` join
    (`_annotated_stats`). Override freely — rules are just named boolean
    pass-Columns."""
    return {
        "too_short": F.col("n_tokens") >= min_tokens,
        "too_long": F.col("n_tokens") <= max_tokens,
        "dup_3grams": F.col("dup_frac_3") <= max_dup_3gram,
        "top_2gram": F.col("top_frac_2") <= max_top_2gram,
    }


def _annotated_stats(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """docs + token/repetition stat columns (two map-only operators
    joined on id — the join is the price of keeping each operator's
    output contract; both sides are stat columns, not text)."""
    stats = token_stats(docs, text_col, id_col).select(id_col, "n_tokens")
    reps = repetition_stats(docs, text_col, id_col, ns=(2, 3))
    return docs.join(stats, id_col).join(reps, id_col)


def prepare_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_rules: dict | None = None,
    dedup_threshold: float = 0.8,
    dedup_num_hashes: int = 64,
    dedup_bands: int = 16,
    dedup_keep: str = "min_id",
    dedup_keep_score_col: str | None = None,
    decontam_n: int = 8,
    split_weights: dict[str, float] | None = None,
    split_salt: str = "split-v1",
    normalize_signatures: bool = False,
    url_col: str | None = None,
    domain_blocklist=None,
    lm_reference: DataFrame | None = None,
    max_nll: float | None = None,
    quality_model=None,
    min_p_good: float | None = None,
    span_min_len: int | None = None,
    span_min_count: int = 1,
    benchmark_emb: DataFrame | None = None,
    emb_col: str | None = None,
    semantic_threshold: float = 0.95,
    bench_emb_col: str | None = None,
    lang_model=None,
    allowed_langs: list[str] | None = None,
    min_p_lang: float | None = None,
) -> dict[str, DataFrame]:
    """Run the full preparation recipe; returns a dict of DataFrames:

    - ``annotated``: every input doc + stat columns + ``reject_reason``
      (NULL = passed the quality gate) — the audit surface;
    - ``corpus``: the cleaned documents (original columns + ``split``);
    - ``report``: (stage, n_docs) counts per stage boundary — one count
      aggregate per stage, materialized only when acted on.

    ``benchmark=None`` skips decontamination.

    ``normalize_signatures=True`` runs every SIGNAL (stats, dedup
    shingles, decontamination grams, LM scoring) over a
    `normalize_text`-canonicalized shadow column, so 'Foo  Bar' and
    'foo bar' deduplicate against each other — while the OUTPUT corpus
    keeps the original text untouched (the CCNet convention: normalize
    for decisions, never for data).

    ``lm_reference`` + ``max_nll`` add the perplexity gate: a unigram LM
    is trained on the (trusted) reference corpus and every document's
    mean NLL joins the audit columns; docs with ``nll > max_nll`` are
    rejected alongside the Gopher rules. The fit runs in lazy mode
    (`fit_unigram_lm(lazy=True)` — totals fold in as a broadcast
    one-row relation), so constructing the pipeline triggers NO job;
    everything materializes when the returned DataFrames are acted on.

    ``url_col`` + ``domain_blocklist`` prepend the C4-style provenance
    stage (`operators/web.filter_blocked_domains`, subdomain-aware):
    blocklisted-domain docs drop BEFORE any text heuristic runs — the
    cheapest rejection is the one that never reads the text. Blocked
    docs appear in the audit surface with ``reject_reason='domain'``
    and in the report as the ``provenance_passed`` stage.

    ``dedup_keep`` / ``dedup_keep_score_col`` pass through to
    `minhash_dedup`'s representative policy ('min_id' | 'longest' |
    'score'); a score column must be present on ``docs`` itself (the
    audit-only columns this pipeline derives are not visible to the
    dedup stage).

    ``quality_model`` + ``min_p_good`` add the learned gate: a fitted
    `operators/quality_model.fit_quality_classifier` pipeline scores
    every document (map-only after the feature joins) and ``p_good``
    joins the audit columns; docs below the bound reject as
    ``"quality_model"``. The classifier sees the same (optionally
    normalized) text as every other signal.

    ``span_min_len`` adds the substring-level pass (Lee et al. 2021,
    `operators/spans.remove_repeated_spans` with keep='first'): token
    spans of at least that length repeated ``span_min_count+1`` or more
    times across the decontaminated corpus are deleted in place; docs
    emptied entirely drop (reported as the ``after_spans`` stage). The
    pass runs on the RAW text — exact-substring semantics want real
    bytes, not the normalized decision shadow. Only documents a span
    was actually removed from are rewritten (with the span operator's
    single-space joins); untouched documents keep their original bytes.
    ``benchmark_emb`` + ``emb_col`` add the semantic decontamination
    stage (`operators/decontam.semantic_decontaminate`) right after the
    n-gram probe: documents whose ``emb_col`` embedding is within
    ``semantic_threshold`` cosine of ANY benchmark embedding drop — the
    paraphrase-level complement of the n-gram stage (a rewritten eval
    question shares no 8-gram but still lands next to the original in
    embedding space). ``docs`` must carry the embedding column; the
    benchmark embeddings fold into one broadcast row, so the stage is
    map-only on the corpus (reported as ``after_semantic_decontam``).

    ``lang_model`` (a fitted `operators/lang_model.LangModel`) annotates
    every document with ``lang`` + ``p_lang`` (map-only scoring);
    ``allowed_langs`` turns that into the CCNet-style language gate —
    docs classified outside the list reject as ``"language"``, and
    ``min_p_lang`` additionally rejects low-confidence calls. The
    classifier sees the same (optionally normalized) text as every other
    signal.
    """
    if (url_col is None) != (domain_blocklist is None):
        raise ValueError("pass url_col and domain_blocklist together")
    if (benchmark_emb is None) != (emb_col is None):
        raise ValueError("pass benchmark_emb and emb_col together")
    if emb_col is not None and emb_col not in docs.columns:
        raise ValueError(
            f"emb_col {emb_col!r} is not a column of docs: {docs.columns}"
        )
    if (allowed_langs is not None or min_p_lang is not None) and lang_model is None:
        raise ValueError(
            "allowed_langs / min_p_lang require a fitted lang_model"
        )
    if lang_model is not None:
        # the gate joins lang/p_lang onto the audit surface — a docs
        # column with either name would become ambiguous (the reserved-
        # name convention, as normalize_signatures' __sig_text check)
        for c in ("lang", "p_lang"):
            if c in docs.columns:
                raise ValueError(
                    f"docs already has a {c!r} column — it is reserved "
                    "by the lang_model gate; rename it"
                )
    blocked_ids = None
    survivors = docs
    if url_col is not None:
        from geoscan_fraud_spark.operators.web import filter_blocked_domains

        blocked_ids = filter_blocked_domains(
            docs, domain_blocklist, url_col, id_col, invert=True
        ).select(id_col)
        survivors = filter_blocked_domains(
            docs, domain_blocklist, url_col, id_col
        )

    sig_col = text_col
    base = docs
    if normalize_signatures:
        sig_col = "__sig_text"
        # reserved-name convention (matches asof_join/interval_join):
        # never silently overwrite a caller column
        for name, rel in (
            ("docs", docs),
            ("benchmark", benchmark),
            ("lm_reference", lm_reference),
        ):
            if rel is not None and sig_col in rel.columns:
                raise ValueError(
                    f"{name} already has a {sig_col!r} column — it is "
                    f"reserved by normalize_signatures=True; rename it"
                )
        base = normalize_text(
            docs, text_col, out_col=sig_col, strip_accents=True
        )

    annotated = _annotated_stats(base, sig_col, id_col)
    rules = dict(quality_rules or default_quality_rules())
    if lm_reference is not None:
        ref = (
            normalize_text(lm_reference, text_col, strip_accents=True)
            if normalize_signatures
            else lm_reference
        )
        lm, oov = fit_unigram_lm(ref, text_col, lazy=True)
        nll = perplexity_score(base, lm, oov, sig_col, id_col).select(
            id_col, "nll"
        )
        annotated = annotated.join(nll, id_col)
        if max_nll is not None:
            rules["lm_nll"] = F.col("nll") <= max_nll
    if quality_model is not None:
        from geoscan_fraud_spark.operators.quality_model import score_quality

        pg = score_quality(base, quality_model, sig_col, id_col)
        annotated = annotated.join(pg, id_col)
        if min_p_good is not None:
            rules["quality_model"] = F.col("p_good") >= min_p_good
    if lang_model is not None:
        from geoscan_fraud_spark.operators.lang_model import score_lang

        lg = score_lang(base, lang_model, sig_col, id_col)
        annotated = annotated.join(lg, id_col)
        if allowed_langs is not None:
            rules["language"] = F.col("lang").isin(list(allowed_langs))
        if min_p_lang is not None:
            rules["lang_confidence"] = F.col("p_lang") >= min_p_lang
    annotated = annotate_filter_reasons(annotated, rules)
    if blocked_ids is not None:
        # provenance rejection takes precedence over every text rule in
        # the audit surface (it fired first in the pipeline)
        b = blocked_ids.withColumn("__blocked", F.lit(True))
        annotated = (
            annotated.join(b, id_col, "left_outer")
            .withColumn(
                "reject_reason",
                F.when(F.col("__blocked"), F.lit("domain")).otherwise(
                    F.col("reject_reason")
                ),
            )
            .drop("__blocked")
        )
    passed = annotated.filter(F.col("reject_reason").isNull()).select(
        *docs.columns, *([sig_col] if normalize_signatures else [])
    )

    deduped = minhash_dedup(
        passed,
        text_col=sig_col,
        id_col=id_col,
        num_hashes=dedup_num_hashes,
        bands=dedup_bands,
        threshold=dedup_threshold,
        keep=dedup_keep,
        keep_score_col=dedup_keep_score_col,
    )

    if benchmark is not None:
        bench_sig = (
            normalize_text(
                benchmark, text_col, out_col=sig_col, strip_accents=True
            )
            if normalize_signatures
            else benchmark
        )
        clean = decontaminate(
            deduped, bench_sig, n=decontam_n, text_col=sig_col, id_col=id_col
        )
    else:
        clean = deduped
    if normalize_signatures:
        clean = clean.drop(sig_col)
    decontaminated = clean

    semantic_clean = None
    if benchmark_emb is not None:
        from geoscan_fraud_spark.operators.decontam import (
            semantic_decontaminate,
        )

        clean = semantic_decontaminate(
            clean,
            benchmark_emb,
            threshold=semantic_threshold,
            emb_col=emb_col,
            id_col=id_col,
            bench_emb_col=bench_emb_col,
        )
        semantic_clean = clean

    if span_min_len is not None:
        # substring-level pass AFTER doc-level dedup (the Lee et al.
        # combination): repeated >= span_min_len token spans surviving
        # the near-dup stage (boilerplate shared by otherwise-distinct
        # pages) are deleted in place, first occurrence kept; docs whose
        # every token was a repeat drop out. Runs on the REAL text
        # (exact-substring semantics want raw bytes, not the normalized
        # decision shadow). Note the rewrite re-joins surviving tokens
        # with single spaces (remove_repeated_spans' documented
        # normalization).
        from geoscan_fraud_spark.operators.spans import remove_repeated_spans

        rewritten = remove_repeated_spans(
            clean.select(id_col, text_col),
            text_col=text_col,
            id_col=id_col,
            min_len=span_min_len,
            min_count=span_min_count,
            keep="first",
        )
        # only docs a span was actually removed from take the rewritten
        # text — untouched docs keep their original bytes (the span
        # operator re-joins tokens with single spaces, and flattening
        # EVERY doc's whitespace corpus-wide would destroy paragraph
        # structure downstream consumers rely on)
        changed = rewritten.filter(F.col("removed_tokens") > 0)
        emptied = changed.filter(
            F.length(F.trim(F.col(text_col))) == 0
        ).select(id_col)
        clean = (
            clean.join(emptied, id_col, "left_anti")
            .join(
                changed.select(
                    id_col, F.col(text_col).alias("__span_text")
                ),
                id_col,
                "left_outer",
            )
            .withColumn(
                text_col, F.coalesce(F.col("__span_text"), F.col(text_col))
            )
            .drop("__span_text")
        )

    corpus = assign_splits(
        clean, weights=split_weights, id_col=id_col, salt=split_salt
    )

    def _count(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"), F.count(F.lit(1)).alias("n_docs")
        )

    report = _count("input", docs)
    if blocked_ids is not None:
        report = report.unionByName(_count("provenance_passed", survivors))
    report = (
        report.unionByName(_count("quality_passed", passed))
        .unionByName(_count("after_dedup", deduped))
        .unionByName(_count("after_decontam", decontaminated))
    )
    if semantic_clean is not None:
        report = report.unionByName(
            _count("after_semantic_decontam", semantic_clean)
        )
    if span_min_len is not None:
        report = report.unionByName(_count("after_spans", clean))
    return {"annotated": annotated, "corpus": corpus, "report": report}
