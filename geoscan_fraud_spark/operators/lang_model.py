"""Trainable fastText-style language classifier — the learned sibling of
the heuristic `operators/text.lang_id` gate.

Production pipelines identify language with a linear classifier over
hashed character n-grams (the fastText langid recipe: Joulin et al. 2016,
arXiv:1607.01759 — "Bag of Tricks for Efficient Text Classification");
the marker-word heuristic covers the bootstrap case, this module covers
the trained case. Spark-first shape:

* character n-grams are a NATIVE expression (lowercase + `substr` over a
  `sequence` of positions — no Python, no tokenizer dependency), so
  feature extraction is whole-stage-codegen'd;
* hashing-trick counts via MLlib `HashingTF` (JVM-side, fixed 2^18
  buckets) feed a multinomial `LogisticRegression`;
* scoring is map-only: the fitted coefficients ride the plan, the corpus
  never shuffles — same contract as `quality_model.score_quality`.

The n-gram recipe (sizes, bucket count, lowercasing) is FIXED module-wide
like `quality_model.FEATURE_COLS`: a persisted model only scores
correctly if extraction at inference matches extraction at fit, so the
recipe is code, not a parameter.

Reference lineage: the per-user model registry shape
(`02_geofraud_fraud.py:220-238`) — train once, score distributed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: character n-gram sizes — FIXED: persisted models depend on them
LANG_NGRAM_SIZES = (1, 2, 3)
#: hashing-trick bucket count — FIXED for the same reason
LANG_NUM_FEATURES = 1 << 18

_GRAMS_COL = "__lang_grams"
_LABEL_COL = "__lang_label"


def char_ngrams(text_col: Column) -> Column:
    """array<string> of lowercase character n-grams (sizes
    `LANG_NGRAM_SIZES`) — the fastText feature set as one native
    expression. Documents shorter than a size contribute no grams of
    that size.

    Built with `zip_with` over shifted copies of the char array — the
    same construction (and for the same reason) as `dedup.word_grams`:
    the obvious `transform(sequence(...), i -> substr(txt, i, n))`
    inlines the lowercase/trim into the lambda, so Catalyst re-evaluates
    the full normalization per POSITION — O(L²) per document on the
    map-only scoring hot path."""
    chars = F.filter(
        F.split(F.lower(F.trim(text_col)), ""), lambda c: c != ""
    )

    def grams_of_size(n: int) -> Column:
        g = chars
        for j in range(1, n):
            shifted = F.slice(
                chars, j + 1, F.greatest(F.size(chars) - j, F.lit(0))
            )
            g = F.zip_with(g, shifted, lambda x, y: F.concat(x, y))
        if n > 1:
            # zip_with pads the shorter side with null -> null tail grams
            g = F.filter(g, lambda x: x.isNotNull())
        return g

    return F.concat(*[grams_of_size(n) for n in LANG_NGRAM_SIZES])


class LangModel:
    """Fitted classifier: MLlib PipelineModel (HashingTF + multinomial
    LR) + the ordered label vocabulary. Persists library-free at the
    metadata level (labels as JSON beside the MLlib pipeline dir)."""

    def __init__(self, pipeline_model, labels: list[str]):
        self.pipeline_model = pipeline_model
        self.labels = list(labels)

    def save(self, path: str) -> None:
        # label metadata is written with local-filesystem IO (the repo's
        # model-persistence convention, `geoscan.GeoscanModel.save`);
        # refuse remote URIs rather than split-braining the artifact
        # (MLlib would write the pipeline remotely while labels.json
        # landed in a bogus local dir)
        if "://" in path:
            raise ValueError(
                "LangModel.save/load use local-filesystem metadata IO; "
                f"pass a local path, got {path!r}"
            )
        self.pipeline_model.write().overwrite().save(
            os.path.join(path, "pipeline")
        )
        meta_dir = os.path.join(path, "metadata")
        os.makedirs(meta_dir, exist_ok=True)
        from geoscan_fraud_spark.sources.io import atomic_write_json

        atomic_write_json(
            os.path.join(meta_dir, "labels.json"),
            {
                "class": "LangModel",
                "labels": self.labels,
                "ngram_sizes": list(LANG_NGRAM_SIZES),
                "num_features": LANG_NUM_FEATURES,
            },
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LangModel":
        from pyspark.ml import PipelineModel

        if "://" in path:
            raise ValueError(
                "LangModel.save/load use local-filesystem metadata IO; "
                f"pass a local path, got {path!r}"
            )
        with open(os.path.join(path, "metadata", "labels.json")) as f:
            meta = json.load(f)
        if tuple(meta["ngram_sizes"]) != LANG_NGRAM_SIZES or (
            meta["num_features"] != LANG_NUM_FEATURES
        ):
            raise ValueError(
                "persisted model was trained with a different n-gram "
                f"recipe ({meta['ngram_sizes']}/{meta['num_features']} vs "
                f"{list(LANG_NGRAM_SIZES)}/{LANG_NUM_FEATURES}) — "
                "score it with the matching code version"
            )
        pm = PipelineModel.load(os.path.join(path, "pipeline"))
        return cls(pm, meta["labels"])


def fit_lang_classifier(
    labeled: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    reg_param: float = 1e-4,
    max_iter: int = 100,
) -> LangModel:
    """Train from (text, language-label) rows. Labels are ordered
    alphabetically (deterministic across runs and partitionings — unlike
    `StringIndexer`'s frequency order, which reshuffles indices when the
    corpus mix drifts). Distributed fit; the labeled set is typically
    thousands of rows, but nothing here requires it to be."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    # NULL-labeled rows carry no supervision — drop them up front (they
    # would otherwise reach LogisticRegression as NULL labels and crash
    # the fit with an opaque executor error)
    labeled = labeled.filter(F.col(label_col).isNotNull())
    labels = sorted(
        r[0]
        for r in labeled.select(label_col).distinct().collect()
        if r[0] is not None
    )
    if len(labels) < 2:
        raise ValueError(
            f"need at least 2 distinct languages to train, got {labels}"
        )
    idx = F.element_at(
        F.create_map(
            *[
                lit
                for i, lang in enumerate(labels)
                for lit in (F.lit(lang), F.lit(float(i)))
            ]
        ),
        F.col(label_col),
    )
    feats = labeled.select(
        F.col(id_col),
        char_ngrams(F.col(text_col)).alias(_GRAMS_COL),
        idx.alias(_LABEL_COL),
    )
    pipe = Pipeline(
        stages=[
            HashingTF(
                inputCol=_GRAMS_COL,
                outputCol="features",
                numFeatures=LANG_NUM_FEATURES,
            ),
            LogisticRegression(
                featuresCol="features",
                labelCol=_LABEL_COL,
                family="multinomial",
                regParam=reg_param,
                maxIter=max_iter,
            ),
        ]
    )
    return LangModel(pipe.fit(feats), labels)


def score_lang(
    df: DataFrame,
    model: LangModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, lang, p_lang): predicted language + its probability for every
    document. Map-only: native n-gram extraction -> JVM HashingTF ->
    per-row linear algebra; the corpus never shuffles. Probability ties
    break toward the alphabetically-first label (first max wins)."""
    from pyspark.ml.functions import vector_to_array

    feats = df.select(
        F.col(id_col), char_ngrams(F.col(text_col)).alias(_GRAMS_COL)
    )
    scored = model.pipeline_model.transform(feats)
    probs = vector_to_array(F.col("probability"))
    pred = F.array_position(probs, F.array_max(probs)).cast("int")
    label_arr = F.array(*[F.lit(lang) for lang in model.labels])
    return scored.select(
        id_col,
        F.element_at(label_arr, pred).alias("lang"),
        F.round(F.array_max(probs), 6).alias("p_lang"),
    )
