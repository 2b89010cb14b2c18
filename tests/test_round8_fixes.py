"""Round-8 pins.

1. Value pins for the four entries folded out of the driver registry in
   the r08 rotation (slots fund `bm25_search` / `token_shards` /
   `rrf_fusion` / `html_extract`): each folded query keeps an
   independent python/pandas/numpy oracle here, per the fold convention
   (COVERAGE.md "Registry rotation candidates").
2. The `ref_csv_unclustered` digest golden's provenance: the digest row
   the registry pins is re-derived here from the underlying 1,727-row
   unclustered set, and shown partition-invariant.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.sources.io import load_fixture


def test_j1_join_single_key_matches_pandas(spark, sf_dir):
    """Folded r08: j1_join_single_key left the driver registry (slot
    funds bm25_search); the three-table join aggregate stays pinned
    against a pandas merge."""
    from geoscan_fraud_spark.harness import j1_join_single_key

    got = {
        r["n_name"]: (r["order_cnt"], round(r["total_price"], 2))
        for r in j1_join_single_key(spark, sf_dir).collect()
    }
    o = load_fixture(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").toPandas()
    c = load_fixture(spark, sf_dir, "customer").select("c_custkey", "c_nationkey").toPandas()
    n = load_fixture(spark, sf_dir, "nation").select("n_nationkey", "n_name").toPandas()
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    exp = m.groupby("n_name")["o_totalprice"].agg(["count", "sum"])
    assert len(got) == len(exp) > 0
    for name, row in exp.iterrows():
        cnt, total = got[name]
        assert cnt == int(row["count"])
        assert total == pytest.approx(row["sum"], abs=1e-4)


def test_a8_percentiles_matches_numpy(spark, sf_dir):
    """Folded r08: a8_percentiles left the driver registry (slot funds
    token_shards); exact interpolated percentiles stay pinned against
    numpy's linear interpolation."""
    import numpy as np

    from geoscan_fraud_spark.harness import a8_percentiles

    got = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p90"])
        for r in a8_percentiles(spark, sf_dir).collect()
    }
    li = load_fixture(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity").toPandas()
    assert len(got) > 0
    for flag, grp in li.groupby("l_returnflag"):
        exp = tuple(
            round(float(np.percentile(grp["l_quantity"], p, method="linear")), 4)
            for p in (25, 50, 90)
        )
        assert got[flag] == pytest.approx(exp, abs=1e-9)


def test_ngram_jaccard_pairs_matches_python(spark, sf_dir):
    """Folded r08: ngram_jaccard_pairs left the driver registry (slot
    funds html_extract); the intersect/union arithmetic stays pinned
    against python set algebra (and stays load-bearing inside the
    still-registered dedup_minhash verify stage)."""
    from geoscan_fraud_spark.harness_pipeline import ngram_jaccard_pairs

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in load_fixture(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    exp = {
        (i, i + 1): len(docs[i] & docs[i + 1]) / len(docs[i] | docs[i + 1])
        for i in docs
        if i + 1 in docs
    }
    assert len(got) == len(exp) > 0
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_text_token_stats_matches_python(spark, sf_dir):
    """Folded r08: text_token_stats left the driver registry (slot funds
    rrf_fusion); the full stat row — whitespace tokens, TOKEN_PATTERN
    regex tokens, distinct count, mean token length — stays pinned
    against a python oracle."""
    from geoscan_fraud_spark.harness_pipeline import text_token_stats
    from geoscan_fraud_spark.operators.text import TOKEN_PATTERN

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_regex_tokens"],
            r["n_distinct_tokens"],
            r["avg_token_len"],
        )
        for r in text_token_stats(spark, sf_dir).collect()
    }
    rows = load_fixture(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(got) == len(rows) > 0
    from decimal import ROUND_HALF_UP, Decimal

    pat = re.compile(TOKEN_PATTERN)
    for r in rows:
        tok = re.split(r"\s+", r["text"].strip())
        # Spark's round() is HALF_UP over the double's exact decimal
        # expansion (not python's banker's rounding)
        mean = Decimal(sum(len(t) for t in tok) / len(tok))
        exp = (
            len(tok),
            len(pat.findall(r["text"])),
            len(set(tok)),
            float(mean.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)),
        )
        g = got[r["doc_id"]]
        assert g[:3] == exp[:3]
        assert g[3] == pytest.approx(exp[3], abs=1e-9)


def test_ref_csv_digest_matches_row_level_golden(spark):
    """The r08 `ref_csv_unclustered` registry entry pins a one-row digest
    (count, users, DECIMAL sums, xor of row xxhash64). Re-derive that
    digest here from the row-level unclustered set and assert the pinned
    literals, plus partition-invariance of the xor digest (the property
    that makes it a safe distributed pin)."""
    from geoscan_fraud_spark.operators.geoscan import Geoscan
    from geoscan_fraud_spark.sources.io import TRANSACTIONS_SCHEMA, read_csv

    df = read_csv(
        spark, "/root/reference/data/transactions.csv", TRANSACTIONS_SCHEMA
    )
    model = Geoscan().setEpsilon(200.0).setMinPts(20).fit(df)

    def digest(frame):
        un = (
            model.transform(frame)
            .filter(F.col("cluster").isNull())
            .select("user", "latitude", "longitude", "amount")
        )
        return un.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(user, latitude, longitude, amount))").alias("d"),
            F.sum(F.col("amount").cast("decimal(12,2)")).cast("double").alias("amt"),
        ).collect()[0]

    base = digest(df)
    assert base["n"] == 1727
    assert base["d"] == 6127697113465282967
    assert base["amt"] == pytest.approx(177071.68, abs=1e-9)
    # partition-invariance: same digest from a different physical layout
    again = digest(df.repartition(17))
    assert (again["n"], again["d"]) == (base["n"], base["d"])
