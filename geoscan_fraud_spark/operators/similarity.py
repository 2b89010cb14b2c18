"""Approximate-nearest-neighbor search over embedding columns.

Beyond-reference operators (SURVEY §2.10). Two paths:

* `brute_force_topk` — exact baseline: broadcast the (small) query set,
  map-side cosine against every corpus vector, per-query top-k via window
  rank. At 100 TB the corpus side streams through executors once with NO
  shuffle of the corpus — the only shuffle is the final per-query top-k,
  whose input is corpus_rows x n_queries but collapses map-side if you
  pre-aggregate with the same window; for large query sets use `ivf_topk`.
* `ivf_topk` — scale path: coarse-quantize the corpus with seeded KMeans
  (inverted file), probe only the closest `nprobe` centroids per query —
  the same bucket-then-verify shape as the geo engine's cell join.

Cosines are computed with deterministic left-fold accumulation
(`cosine_expr`) so results are oracle-matchable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.dedup import cosine_expr


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, vec_id, sim, rank): exact cosine top-k per query.

    Ranking key is (rounded sim desc, vec_id asc) — fully deterministic,
    ties broken by id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(emb_col).alias("c_emb"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("sim", F.round(cosine_expr(F.col("q_emb"), F.col("c_emb")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: seeded KMeans coarse quantizer + probe-nearest-lists.

    Returns (query_id, vec_id, sim, rank). Approximate: recall depends on
    nprobe/n_centroids (tested against the brute-force baseline).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(emb_col).alias("c_emb"))
    cvec = c.withColumn("features", array_to_vector(F.transform("c_emb", lambda x: x.cast("double"))))
    km = KMeans(k=n_centroids, seed=seed, featuresCol="features", predictionCol="list_id")
    model = km.fit(cvec)
    assigned = model.transform(cvec).select("vec_id", "c_emb", "list_id")

    centroids = [
        (i, [float(v) for v in ctr]) for i, ctr in enumerate(model.clusterCenters())
    ]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(centroids, ["list_id", "centroid"])

    q = queries.select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"))
    probes = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("c_sim", cosine_expr(F.col("q_emb"), F.col("centroid")))
        .withColumn(
            "c_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("list_id"))
            ),
        )
        .filter(F.col("c_rank") <= nprobe)
        .select("query_id", "q_emb", "list_id")
    )
    scored = (
        probes.join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("sim", F.round(cosine_expr(F.col("q_emb"), F.col("c_emb")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )
